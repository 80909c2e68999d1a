"""Native C++ data-loader: decode correctness, transform parity, throughput."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from demo2_tpu.data.native import (
    INTERP_CUBIC,
    TransformParams,
    build_native,
    eval_params,
    get_lib,
    load_batch_native,
    native_available,
    sample_train_params,
)

pytestmark = pytest.mark.skipif(
    build_native() is None or not native_available(),
    reason="native loader could not be built",
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = rng.integers(0, 255, (100, 60, 3), np.uint8).astype(np.uint8)
        p = d / f"img_{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    # one wide-strip image
    wide = np.zeros((128, 768, 3), np.uint8)
    wide[:, :256] = 30
    wide[:, 256:512] = 130
    wide[:, 512:] = 230
    wp = d / "wide_0001_c1.jpg"
    Image.fromarray(wide).save(wp, quality=95)
    return paths, str(wp)


def test_decode_matches_pil(jpegs):
    import ctypes

    paths, _ = jpegs
    lib = get_lib()
    buf = np.zeros(100 * 60 * 3, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.d2t_decode_jpeg(
        paths[0].encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size, ctypes.byref(h), ctypes.byref(w),
    )
    assert rc == 0 and (h.value, w.value) == (100, 60)
    ref = np.asarray(Image.open(paths[0]).convert("RGB"))
    ours = buf.reshape(100, 60, 3)
    # Different IDCT implementations may differ by a couple of levels.
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 2.0


def test_cubic_resize_close_to_pil_bicubic(jpegs):
    paths, _ = jpegs
    out = load_batch_native(
        paths[:1], [eval_params(interp=INTERP_CUBIC)], 64, 32,
        (0.5,) * 3, (0.5,) * 3, num_threads=1,
    )
    ref = Image.open(paths[0]).convert("RGB").resize((32, 64), Image.BICUBIC)
    ref = (np.asarray(ref, np.float32) / 255.0 - 0.5) / 0.5
    # Filters differ slightly (antialiased cubic vs PIL bicubic); images must
    # agree closely in the aggregate.
    assert np.mean(np.abs(out[0] - ref)) < 0.06


@pytest.mark.parametrize("size", [(64, 32), (256, 128)])
def test_eval_resize_matches_pil_bilinear(jpegs, size):
    """eval_params() default = torchvision Resize's bilinear (the reference's
    eval transform, make_dataloader.py:198-202): parity with PIL within
    fixed-point rounding, both down- and up-scaling the 100x60 sources."""
    oh, ow = size
    paths, _ = jpegs
    out = load_batch_native(
        paths[:4], [eval_params() for _ in range(4)], oh, ow,
        (0.5,) * 3, (0.5,) * 3, num_threads=2,
    )
    for i in range(4):
        ref = Image.open(paths[i]).convert("RGB").resize((ow, oh), Image.BILINEAR)
        ref = (np.asarray(ref, np.float32) / 255.0 - 0.5) / 0.5
        # PIL runs the same separable triangle convolution in uint8 fixed
        # point; allow a few levels of rounding per pass (std = 0.5 -> one
        # u8 level = 2/255 in normalized units).
        assert np.max(np.abs(out[i] - ref)) < 6.0 * 2.0 / 255.0
        assert np.mean(np.abs(out[i] - ref)) < 1.0 * 2.0 / 255.0


def test_wide_strip_crop(jpegs):
    _, wide = jpegs
    strips = [(0, 0, 256, 128), (256, 0, 512, 128), (512, 0, 768, 128)]
    params = [eval_params(st) for st in strips]
    out = load_batch_native([wide] * 3, params, 64, 32, (0.0,) * 3, (1.0,) * 3, 2)
    means = out.mean(axis=(1, 2, 3)) * 255
    assert means[0] < 40 and 110 < means[1] < 150 and means[2] > 215


def test_flip_and_erase(jpegs):
    paths, _ = jpegs
    p_plain = eval_params()
    p_flip = eval_params()
    p_flip.flip = 1
    out = load_batch_native(
        [paths[0]] * 2, [p_plain, p_flip], 64, 32, (0.5,) * 3, (0.5,) * 3, 1
    )
    np.testing.assert_allclose(out[0], out[1][:, ::-1], atol=1e-5)

    p_er = eval_params()
    p_er.erase = 1
    p_er.erase_top, p_er.erase_left, p_er.erase_h, p_er.erase_w = 4, 4, 8, 8
    p_er.noise_seed = 123
    out2 = load_batch_native([paths[0]], [p_er], 64, 32, (0.5,) * 3, (0.5,) * 3, 1)
    # The erased rect differs from the plain image; elsewhere identical.
    assert not np.allclose(out2[0][4:12, 4:12], out[0][4:12, 4:12])
    np.testing.assert_allclose(out2[0][20:, 20:], out[0][20:, 20:], atol=1e-5)


def test_param_sampling_consumes_same_stream():
    """Native param sampling mirrors TrainTransform's draw order."""
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    p = sample_train_params(rng1, (64, 32))
    # Python path draws: flip, crop_top, crop_left, erase gate, [attempts].
    flip = rng2.random() < 0.5
    top = int(rng2.integers(0, 21))
    left = int(rng2.integers(0, 21))
    assert bool(p.flip) == flip
    assert p.crop_top == top and p.crop_left == left


def test_batch_throughput_smoke(jpegs):
    paths, _ = jpegs
    batch_paths = paths * 16  # 96 images
    rng = np.random.default_rng(0)
    params = [sample_train_params(rng, (256, 128)) for _ in batch_paths]
    t0 = time.perf_counter()
    out = load_batch_native(batch_paths, params, 256, 128, (0.5,) * 3, (0.5,) * 3, 4)
    dt = time.perf_counter() - t0
    assert out.shape == (96, 256, 128, 3)
    assert np.isfinite(out).all()
    # Pathology check only (a broken thread pool serializes to <1/s); wall
    # clock on this shared 1-core host swings >4x when other jobs run, so
    # retry once before failing and keep the bound loose.
    if len(batch_paths) / dt <= 5:
        t0 = time.perf_counter()
        out = load_batch_native(
            batch_paths, params, 256, 128, (0.5,) * 3, (0.5,) * 3, 4
        )
        dt = time.perf_counter() - t0
    assert len(batch_paths) / dt > 5


def test_train_geometry_parity_all_modalities(jpegs):
    """Native vs PIL TRAIN pipes must draw IDENTICAL flip/crop geometry for
    every modality (review round 4: a shared per-sample rng desynchronized
    the streams after modality 1).  With erase disabled the two paths agree
    to resize/JPEG tolerance on all 3 modalities; a geometry mismatch (a
    flip or a 10px crop shift) would blow the bound by orders of magnitude.
    """
    from demo2_tpu.data.loader import TriModalDataPipe
    from demo2_tpu.data.transforms import TrainTransform

    paths, _wide = jpegs
    samples = [
        ((paths[0], paths[1], paths[2]), 0, 0, 0),
        ((paths[3], paths[4], paths[5]), 1, 1, 0),
    ]
    tf = TrainTransform(size=(64, 32), re_prob=0.0)  # geometry only
    nat = TriModalDataPipe(samples, None, tf, 2, num_workers=2)
    assert nat.use_native
    pil = TriModalDataPipe(samples, None, tf, 2, num_workers=2, use_native=False)
    b_nat = next(nat.iter_batches(np.arange(2), seed=7))
    b_pil = next(pil.iter_batches(np.arange(2), seed=7))
    for m in range(3):
        diff = np.abs(b_nat.images[:, m] - b_pil.images[:, m])
        assert diff.mean() < 0.03, f"modality {m}: mean {diff.mean()}"
        assert diff.max() < 0.5, f"modality {m}: max {diff.max()}"
