"""Data pipeline tests: PK sampler structure, transforms, loader batches."""

import numpy as np
from PIL import Image

from demo2_tpu.data.datasets import SyntheticTriModal
from demo2_tpu.data.loader import TriModalDataPipe, make_dataloader, read_image
from demo2_tpu.data.sampler import RandomIdentitySampler
from demo2_tpu.data.transforms import EvalTransform, TrainTransform, random_erasing


def test_pk_sampler_structure():
    ds = SyntheticTriModal(num_pids=6, imgs_per_pid=8)
    sampler = RandomIdentitySampler(ds.train, batch_size=8, num_instances=4, seed=3)
    idxs = sampler.epoch_indices(0)
    assert len(idxs) % 8 == 0
    # Every batch must be P x K: 2 pids x 4 instances.
    for b in range(len(idxs) // 8):
        batch = idxs[b * 8 : (b + 1) * 8]
        pids = [ds.train[i][1] for i in batch]
        uniq, counts = np.unique(pids, return_counts=True)
        assert len(uniq) == 2
        assert all(c == 4 for c in counts)


def test_pk_sampler_deterministic():
    ds = SyntheticTriModal(num_pids=4, imgs_per_pid=6)
    s = RandomIdentitySampler(ds.train, 8, 4, seed=7)
    np.testing.assert_array_equal(s.epoch_indices(5), s.epoch_indices(5))
    assert not np.array_equal(s.epoch_indices(5), s.epoch_indices(6))


def test_train_transform_shape_and_determinism():
    tf = TrainTransform(size=(64, 32))
    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (100, 50, 3), np.uint8).astype(np.uint8))
    a = tf(img, np.random.default_rng(42))
    b = tf(img, np.random.default_rng(42))
    assert a.shape == (64, 32, 3)
    np.testing.assert_array_equal(a, b)
    c = tf(img, np.random.default_rng(43))
    assert not np.array_equal(a, c)


def test_eval_transform_normalization():
    tf = EvalTransform(size=(64, 32))
    img = Image.fromarray(np.full((64, 32, 3), 255, np.uint8))
    out = tf(img)
    # (1.0 - 0.5) / 0.5 = 1.0 for white pixels.
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_random_erasing_probability_zero_is_identity():
    arr = np.random.default_rng(0).normal(size=(32, 16, 3)).astype(np.float32)
    out = random_erasing(arr.copy(), np.random.default_rng(1), probability=0.0)
    np.testing.assert_array_equal(out, arr)


def test_wide_strip_crop(tmp_path):
    """RGBNT100 layout: one 768x128 image -> 3 modality strips (bases.py:9-27)."""
    wide = np.zeros((128, 768, 3), np.uint8)
    wide[:, 0:256] = 10     # RGB strip
    wide[:, 256:512] = 120  # NIR strip
    wide[:, 512:768] = 240  # TIR strip
    p = tmp_path / "0001_c1.jpg"
    Image.fromarray(wide).save(p, quality=95)
    imgs = read_image(str(p))
    assert len(imgs) == 3
    means = [np.asarray(im).mean() for im in imgs]
    assert means[0] < 30 and 100 < means[1] < 140 and means[2] > 220


def test_make_dataloader_synthetic(tiny_cfg):
    train_pipe, sampler, val_pipe, num_query, num_classes, cam_num, view_num = (
        make_dataloader(tiny_cfg)
    )
    assert num_classes == 8 and cam_num == 4
    order = sampler.epoch_indices(0)
    batch = next(train_pipe.iter_batches(order, seed=0))
    h, w = tiny_cfg.INPUT.SIZE_TRAIN
    assert batch.images.shape == (8, 3, h, w, 3)
    assert batch.pids.shape == (8,)
    # PK structure: 4 pids x 2 instances.
    uniq, counts = np.unique(batch.pids, return_counts=True)
    assert len(uniq) == 4 and all(c == 2 for c in counts)
    # Val loader pads the last partial batch.
    batches = list(val_pipe.iter_batches(np.arange(len(val_pipe.samples)),
                                         drop_last=False, pad_last=True))
    assert all(b.images.shape[0] == tiny_cfg.TEST.IMS_PER_BATCH for b in batches)
    assert sum(b.valid for b in batches) == len(val_pipe.samples)


def test_eval_pipe_native_matches_pil(tmp_path):
    """Native eval decode (bilinear, dataloader.cpp) vs the PIL EvalTransform
    path: same batches within fixed-point rounding (VERDICT r2 item 6)."""
    from demo2_tpu.data.native import build_native, native_available

    if build_native() is None or not native_available():
        import pytest

        pytest.skip("native loader could not be built")
    rng = np.random.default_rng(0)
    samples = []
    for i in range(5):
        paths = []
        for m in range(3):
            arr = rng.integers(0, 255, (90 + 7 * i, 50 + 3 * m, 3), np.uint8)
            p = tmp_path / f"s{i}_m{m}.jpg"
            Image.fromarray(arr.astype(np.uint8)).save(p, quality=95)
            paths.append(str(p))
        samples.append((tuple(paths), i, 0, 0))
    tf = EvalTransform(size=(64, 32))
    pipe_nat = TriModalDataPipe(samples, None, tf, 5, num_workers=2)
    assert pipe_nat.use_native, "eval pipe should pick the native path"
    pipe_pil = TriModalDataPipe(samples, None, tf, 5, num_workers=2, use_native=False)
    b_nat = next(pipe_nat.iter_batches(np.arange(5), drop_last=False))
    b_pil = next(pipe_pil.iter_batches(np.arange(5), drop_last=False))
    # std = 0.5 -> one u8 level = 2/255 in normalized units; JPEG decode may
    # differ by ~2 levels between decoders plus resize rounding.
    assert np.max(np.abs(b_nat.images - b_pil.images)) < 8 * 2 / 255
    assert np.mean(np.abs(b_nat.images - b_pil.images)) < 1.5 * 2 / 255
    np.testing.assert_array_equal(b_nat.pids, b_pil.pids)


def test_native_decode_off_forces_pil(tiny_cfg):
    """DATALOADER.NATIVE_DECODE=off pins the PIL-exact decode path even when
    libd2tloader is present (ADVICE r3: bit-level eval parity opt-out)."""
    cfg = tiny_cfg
    cfg.DATALOADER.NATIVE_DECODE = "off"
    train_pipe, _, val_pipe, *_ = make_dataloader(cfg)
    assert not train_pipe.use_native
    assert not val_pipe.use_native


def test_native_decode_on_fails_clearly(tiny_cfg):
    """NATIVE_DECODE=on errors up front when it cannot work: RuntimeError if
    libd2tloader is missing, ValueError for non-JPEG (in-memory Synthetic)
    samples — never a confusing failure deep inside the C++ loader."""
    import pytest

    from demo2_tpu.data.native import native_available

    cfg = tiny_cfg
    cfg.DATALOADER.NATIVE_DECODE = "on"
    if native_available():
        with pytest.raises(ValueError, match="JPEG"):
            make_dataloader(cfg)
    else:
        with pytest.raises(RuntimeError, match="libd2tloader"):
            make_dataloader(cfg)


def test_native_decode_yaml_bool_coercion(tiny_cfg, tmp_path):
    """YAML 1.1 parses unquoted on/off as booleans; the loader must honor
    the intent (reviewed round 4: bool False silently fell through to auto,
    giving users the native decode they opted out of)."""
    from demo2_tpu.config.yaml_loader import merge_yaml_file

    f = tmp_path / "cfg.yml"
    f.write_text("DATALOADER:\n  NATIVE_DECODE: off\n")
    merge_yaml_file(tiny_cfg, str(f))
    train_pipe, _, val_pipe, *_ = make_dataloader(tiny_cfg)
    assert not train_pipe.use_native and not val_pipe.use_native


def test_native_decode_rejects_garbage(tiny_cfg):
    import pytest

    tiny_cfg.DATALOADER.NATIVE_DECODE = "always"
    with pytest.raises(ValueError, match="auto\\|on\\|off"):
        make_dataloader(tiny_cfg)


def test_softmax_sampler_sequential(tiny_cfg):
    """DATALOADER.SAMPLER='softmax' mirrors the reference's plain DataLoader
    (no sampler, no shuffle => sequential order, make_dataloader.py:234-239);
    the PK structure must be gone."""
    import copy

    from demo2_tpu.data.sampler import SequentialSampler

    cfg = copy.deepcopy(tiny_cfg)
    cfg.DATALOADER.SAMPLER = "softmax"
    _, sampler, *_ = make_dataloader(cfg)
    assert isinstance(sampler, SequentialSampler)
    order = sampler.epoch_indices(0)
    np.testing.assert_array_equal(order, np.arange(len(order)))
    assert len(order) % cfg.SOLVER.IMS_PER_BATCH == 0  # drop-last tail
    np.testing.assert_array_equal(order, sampler.epoch_indices(3))

    cfg.DATALOADER.SAMPLER = "nonsense"
    import pytest

    with pytest.raises(ValueError, match="SAMPLER"):
        make_dataloader(cfg)
