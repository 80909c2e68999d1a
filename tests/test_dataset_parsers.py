"""Dataset parser tests against on-disk fixture trees (all three layouts)."""

import numpy as np
import pytest
from PIL import Image

from demo2_tpu.data.datasets import MSVR310, RGBNT100, RGBNT201


def _save(path, shape=(64, 32)):
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.random.default_rng(0).integers(0, 255, (*shape, 3), np.uint8)
    Image.fromarray(arr.astype(np.uint8)).save(path, quality=90)


@pytest.fixture(scope="module")
def rgbnt201_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("d201")
    base = root / "RGBNT201"
    names = [
        ("000001_cam1_0.jpg", 1, 0),
        ("000001_cam2_0.jpg", 1, 1),
        ("000002_cam1_0.jpg", 2, 0),
        ("000007_cam3_1.jpg", 7, 2),
    ]
    for split in ("train_171", "test"):
        for name, _, _ in names:
            for mod in ("RGB", "NI", "TI"):
                _save(base / split / mod / name)
    return str(root), names


def test_rgbnt201_parser(rgbnt201_root):
    root, names = rgbnt201_root
    ds = RGBNT201(root=root)
    assert ds.num_train_pids == 3  # relabeled 0..2
    assert len(ds.train) == len(names)
    # relabel: pids contiguous from 0
    pids = sorted({s[1] for s in ds.train})
    assert pids == [0, 1, 2]
    cams = sorted({s[2] for s in ds.train})
    assert cams == [0, 1, 2]
    # tri-modal path triple per sample
    paths = ds.train[0][0]
    assert len(paths) == 3 and "RGB" in paths[0] and "NI" in paths[1]
    # query/gallery from test/, unrelabeled pids
    assert {s[1] for s in ds.query} == {1, 2, 7}


@pytest.fixture(scope="module")
def rgbnt100_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("d100")
    base = root / "RGBNT100" / "rgbir"
    samples = ["0001_c1_0.jpg", "0001_c2_0.jpg", "0002_c3_0.jpg", "0777_c4_0.jpg"]
    for split in ("bounding_box_train", "query", "bounding_box_test"):
        for name in samples:
            _save(base / split / name, shape=(128, 768))
    return str(root)


def test_rgbnt100_parser(rgbnt100_root):
    ds = RGBNT100(root=rgbnt100_root)
    # pid 777 > 600 filtered out
    assert ds.num_train_pids == 2
    assert all(isinstance(s[0], str) for s in ds.train)  # wide-strip path
    cams = sorted({s[2] for s in ds.train})
    assert cams == [0, 1, 2]  # 1..8 -> 0..7


@pytest.fixture(scope="module")
def msvr310_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("d310")
    base = root / "MSVR310"
    # name layout: camid = name[11], sceneid = name[6:9]
    entries = [("0001", "0001_s001_v2_0.jpg"), ("0001", "0001_s002_v3_1.jpg"),
               ("0002", "0002_s001_v5_0.jpg")]
    for split in ("train", "query3", "gallery3"):
        for vid, name in entries:
            for mod in ("vis", "ni", "th"):
                _save(base / split / vid / mod / name)
    return str(root)


def test_msvr310_parser(msvr310_root):
    ds = MSVR310(root=msvr310_root)
    assert ds.num_train_pids == 2
    sample = next(s for s in ds.train if "s001_v2" in s[0][0])
    _, pid, camid, sceneid = sample
    assert camid == 2 and sceneid == 1
    paths = sample[0]
    assert "vis" in paths[0] and "ni" in paths[1] and "th" in paths[2]


def test_full_pipeline_on_rgbnt100_files(rgbnt100_root):
    """File-backed pipeline end-to-end (exercises the native loader when
    available, incl. wide-strip cropping)."""
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.data import make_dataloader

    cfg = get_cfg_defaults()
    cfg.DATASETS.NAMES = "RGBNT100"
    cfg.DATASETS.ROOT_DIR = rgbnt100_root
    cfg.INPUT.SIZE_TRAIN = (32, 16)
    cfg.INPUT.SIZE_TEST = (32, 16)
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.DATALOADER.NUM_INSTANCE = 2
    cfg.TEST.IMS_PER_BATCH = 4
    cfg.DATALOADER.NUM_WORKERS = 2
    train_pipe, sampler, val_pipe, num_query, nc, cams, views = make_dataloader(cfg)
    batch = next(train_pipe.iter_batches(sampler.epoch_indices(0), seed=0))
    assert batch.images.shape == (4, 3, 32, 16, 3)
    assert np.isfinite(batch.images).all()
    vb = next(val_pipe.iter_batches(np.arange(len(val_pipe.samples)),
                                    drop_last=False, pad_last=True))
    assert vb.images.shape[0] == 4


# ---------------------------------------------------------------------------
# Lineage parsers (market1501 / dukemtmc / msmt17 / MSVWild863) — cross-
# checked sample-for-sample against the direct-imported reference parsers on
# the same fixture tree (reference: market1501.py, dukemtmcreid.py,
# msmt17.py, MSVWild863.py).
# ---------------------------------------------------------------------------


def _ref_triples(ds):
    """Reference samples as comparable (path(s), pid, camid) triples."""
    return sorted((str(s[0]), s[1], s[2]) for s in ds)


def _our_triples(ds):
    return sorted((str(s[0]), s[1], s[2]) for s in ds)


@pytest.fixture(scope="module")
def market_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mkt")
    base = root / "market1501"
    names = ["0001_c1s1_000151_00.jpg", "0001_c2s1_000176_00.jpg",
             "0007_c3s1_000201_00.jpg", "-1_c1s1_000000_00.jpg"]
    for split in ("bounding_box_train", "query", "bounding_box_test"):
        for n in names:
            _save(base / split / n)
    return str(root)


def test_market1501_vs_reference(market_root):
    from ref_loader import load_ref
    from demo2_tpu.data.datasets import Market1501

    ref_mod = load_ref("data.datasets.market1501")
    ref = ref_mod.Market1501(root=market_root, verbose=False)
    ours = Market1501(root=market_root)
    assert _our_triples(ours.train) == _ref_triples(ref.train)
    assert _our_triples(ours.query) == _ref_triples(ref.query)
    assert _our_triples(ours.gallery) == _ref_triples(ref.gallery)
    assert ours.num_train_pids == ref.num_train_pids == 2  # junk -1 dropped


def test_dukemtmc_vs_reference(market_root, tmp_path_factory):
    from ref_loader import load_ref
    from demo2_tpu.data.datasets import DukeMTMCreID

    root = tmp_path_factory.mktemp("duke")
    base = root / "dukemtmcreid"
    names = ["0001_c1_f0000151.jpg", "0001_c8_f0000176.jpg", "0042_c2_f0000201.jpg"]
    for split in ("bounding_box_train", "query", "bounding_box_test"):
        for n in names:
            _save(base / split / n)
    ref_mod = load_ref("data.datasets.dukemtmcreid")
    ref = ref_mod.DukeMTMCreID(root=str(root), verbose=False)
    ours = DukeMTMCreID(root=str(root))
    assert _our_triples(ours.train) == _ref_triples(ref.train)
    assert _our_triples(ours.query) == _ref_triples(ref.query)


def test_msmt17_vs_reference(tmp_path_factory):
    from ref_loader import load_ref
    from demo2_tpu.data.datasets import MSMT17

    root = tmp_path_factory.mktemp("msmt")
    base = root / "MSMT17"
    rels = ["0000/0000_013_01_0303morning_0015.jpg",
            "0000/0000_026_05_0303morning_0033.jpg",
            "0001/0001_004_12_0303afternoon_0110.jpg"]
    for sub in ("train", "test"):
        for r in rels:
            _save(base / sub / r)
    for lst in ("list_train", "list_val", "list_query", "list_gallery"):
        with open(base / f"{lst}.txt", "w") as fh:
            for i, r in enumerate(rels):
                fh.write(f"{r} {int(r[:4])}\n")
    ref_mod = load_ref("data.datasets.msmt17")
    ref = ref_mod.MSMT17(root=str(root), verbose=False)
    ours = MSMT17(root=str(root))
    assert _our_triples(ours.train) == _ref_triples(ref.train)
    assert _our_triples(ours.query) == _ref_triples(ref.query)
    assert _our_triples(ours.gallery) == _ref_triples(ref.gallery)


def test_msvwild863_vs_reference(tmp_path_factory):
    from ref_loader import load_ref
    from demo2_tpu.data.datasets import MSVWild863

    root = tmp_path_factory.mktemp("wild")
    base = root / "MSVWild863"
    names = ["000001_cam1_0.jpg", "000001_cam3_1.jpg", "000005_cam2_0.jpg"]
    for split in ("train", "query", "test"):
        for mod in ("vis", "ni", "th"):
            for n in names:
                _save(base / split / mod / n)
    ref_mod = load_ref("data.datasets.MSVWild863")
    ref = ref_mod.MSVWild863(root=str(root), verbose=False)
    ours = MSVWild863(root=str(root))
    assert _our_triples(ours.train) == _ref_triples(ref.train)
    assert _our_triples(ours.query) == _ref_triples(ref.query)
    # tri-modal path triples in vis/ni/th order
    assert ["vis" in ours.train[0][0][0], "ni" in ours.train[0][0][1],
            "th" in ours.train[0][0][2]] == [True, True, True]
