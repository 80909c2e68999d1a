"""Grad-CAM parity tests (reference: visualize/GradCAM.py:17-31).

Checks the functional-JAX CAM pipeline: the zero-valued `patch_perturb`
probe input must not change model outputs, and the CAM maps must follow
Grad-CAM semantics (class-conditional, ReLU'd, normalized per map).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demo2_tpu.config import get_cfg_defaults
from demo2_tpu.models import make_model
from demo2_tpu.visualize import gradcam, save_gradcam_overlays


@pytest.fixture(scope="module")
def tiny():
    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.USE_DGAF = True
    cfg.MODEL.DGAF_VERSION = "v3"
    cfg.INPUT.SIZE_TRAIN = (32, 16)
    cfg.INPUT.SIZE_TEST = (32, 16)
    cfg.MODEL.STRIDE_SIZE = (16, 16)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.USE_FLASH_ATTENTION = False
    cfg.TPU.BACKBONE_DEPTH = 2
    cfg.TPU.BACKBONE_WIDTH = 64
    cfg.TPU.BACKBONE_HEADS = 2
    cfg.freeze()
    num_classes, camera_num = 8, 4
    model = make_model(cfg, num_classes, camera_num)
    b = 4
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (b, 3, 32, 16, 3), jnp.float32)
    cams = jnp.zeros((b,), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng, "gumbel": rng},
        images, cams, None, None, train=False,
    )
    return cfg, model, variables, images, cams


def test_perturb_probe_is_transparent(tiny):
    cfg, model, variables, images, cams = tiny
    out_plain = model.apply(variables, images, cams, None, None, train=False)
    gh, gw = model.patch_grid
    zeros = jnp.zeros((3, images.shape[0], gh * gw, model.feat_dim), jnp.float32)
    out_probe = model.apply(
        variables, images, cams, None, None, train=False, patch_perturb=zeros
    )
    np.testing.assert_array_equal(
        np.asarray(out_plain["embedding"]), np.asarray(out_probe["embedding"])
    )
    for name in out_plain["branches"]:
        np.testing.assert_array_equal(
            np.asarray(out_plain["branches"][name][0]),
            np.asarray(out_probe["branches"][name][0]),
        )
    assert out_probe["patches"].shape == zeros.shape
    assert "patches" not in out_plain


@pytest.mark.slow
def test_gradcam_shape_range_and_class_conditionality(tiny):
    cfg, model, variables, images, cams = tiny
    maps = gradcam(model, variables, images, cams)
    gh, gw = model.patch_grid
    assert maps.shape == (3, images.shape[0], gh, gw)
    assert np.isfinite(maps).all()
    assert maps.min() >= 0.0 and maps.max() <= 1.0 + 1e-6

    # Class-conditional: pinning a different class must change the maps.
    alt = gradcam(
        model, variables, images, cams,
        class_idx=jnp.full((images.shape[0],), 7, jnp.int32),
    )
    base = gradcam(
        model, variables, images, cams,
        class_idx=jnp.full((images.shape[0],), 0, jnp.int32),
    )
    assert not np.allclose(alt, base)


def test_gradcam_overlay_dump(tiny, tmp_path):
    cfg, model, variables, images, cams = tiny
    maps = gradcam(model, variables, images, cams)
    paths = save_gradcam_overlays(
        maps[:, :2], np.asarray(images[:2]), str(tmp_path), prefix="t"
    )
    assert len(paths) == 6  # 3 modalities x 2 samples
    import os

    for p in paths:
        assert os.path.getsize(p) > 100
