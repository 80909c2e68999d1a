"""Full-scale checkpoint conversion round-trips (VERDICT r2 item 7).

The module-level parity suite (test_reference_parity.py) runs full widths at
32x16 inputs; shape/stride/pos-embed bugs specific to the REAL deployment
scale (256x128 -> 16x8 grid, ViT-B/CLIP dimensions, square-224 checkpoint
grids resized at load) would only have surfaced on hardware.  These tests
exercise that path on the actual reference modules:

  * pos-embed resize: our numpy mirror vs the reference's
    F.interpolate(mode='bilinear') (clip/model.py:708-724,
    backbones/vit_pytorch.py:468-483) — exact.
  * a full-size randomized CLIP visual tower (width 768, 12 layers, 512-d
    proj) with a square 14x14 checkpoint grid, loaded through
    converters.convert_clip_visual(sd, 16, 8), forward parity at 256x128
    against the reference tower carrying the reference's own resized
    embedding (make_model_clipreid.py:174-188 load path).
  * the full DeMo assembly (ImageNet-ViT backbone, real 768-wide ViT-B) at
    256x128 through ref_convert.convert_demo — eval-forward parity.

All are slow (minutes on the 1-core CPU host): marked for the nightly lane.
"""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import load_ref

from test_reference_parity import (
    _build_ref_demo,
    _tpu_cfg,
    _tri_modal_inputs,
    allclose,
    graft,
    randomize,
    torch_sd,
)

RNG = jax.random.PRNGKey(0)

pytestmark = pytest.mark.slow


def test_pos_embed_resize_matches_reference_exactly():
    """Our torch-bilinear mirror vs the reference's resize_pos_embed on the
    real 14x14 -> 16x8 CLIP grid (and the vit_pytorch variant)."""
    from demo2_tpu.utils.converters import resize_pos_embed_grid

    ref_clip = load_ref("modeling.clip.model")
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(1 + 14 * 14, 768)).astype(np.float32)
    target = torch.zeros(1 + 16 * 8, 768)
    ref = ref_clip.resize_pos_embed(torch.from_numpy(pos), target, 16, 8).numpy()
    ours = np.asarray(resize_pos_embed_grid(pos, 16, 8, "bilinear"))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)

    ref_vit = load_ref("modeling.backbones.vit_pytorch")
    pos_b = rng.normal(size=(1, 1 + 14 * 14, 768)).astype(np.float32)
    tgt_b = torch.zeros(1, 1 + 16 * 8, 768)
    ref_b = ref_vit.resize_pos_embed(torch.from_numpy(pos_b), tgt_b, 16, 8).numpy()
    ours_b = np.asarray(resize_pos_embed_grid(pos_b[0], 16, 8, "bilinear"))[None]
    np.testing.assert_allclose(ours_b, ref_b, rtol=1e-6, atol=1e-6)


def test_clip_full_scale_resize_forward_parity():
    """Square-grid ViT-B CLIP checkpoint -> 16x8 model, forward at 256x128."""
    from demo2_tpu.models.clip_vit import CLIPVisionTransformer
    from demo2_tpu.utils.converters import convert_clip_visual

    ref_clip = load_ref("modeling.clip.model")
    cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(PROMPT=False, ADAPTER=False)
    )
    width, layers, heads, out = 768, 12, 12, 512
    # the "checkpoint": a square-224 tower (14x14 grid), randomized
    tm224 = randomize(
        ref_clip.VisionTransformer(14, 14, 16, 16, width, layers, heads, out, cfg).eval(),
        seed=40,
    )
    sd224 = torch_sd(tm224)

    # reference load path: same weights into a 16x8 tower, pos embed resized
    # by the REFERENCE's own function (make_model_clipreid.py:174-188 uses
    # clip.build_model -> resize_pos_embed)
    tm = ref_clip.VisionTransformer(16, 8, 16, 16, width, layers, heads, out, cfg).eval()
    with torch.no_grad():
        own = tm.state_dict()
        for k, v in sd224.items():
            t = torch.from_numpy(v)
            if k == "positional_embedding":
                t = ref_clip.resize_pos_embed(t, own[k], 16, 8)
            own[k].copy_(t)

    rng = np.random.default_rng(41)
    b = 2
    imgs = rng.normal(size=(b, 256, 128, 3)).astype(np.float32) * 0.3
    cv = rng.normal(size=(b, 1, width)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = tm(torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                 torch.from_numpy(cv)).numpy()

    jm = CLIPVisionTransformer(h_resolution=16, w_resolution=8, width=width,
                               layers=layers, heads=heads, output_dim=out)
    variables = jm.init(RNG, jnp.asarray(imgs), jnp.asarray(cv[:, 0]))
    params = convert_clip_visual(sd224, 16, 8)
    variables = graft(variables, params)
    ours = jm.apply(variables, jnp.asarray(imgs), jnp.asarray(cv[:, 0]))
    allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_demo_full_scale_convert_parity():
    """Full DeMo (real ViT-B widths) at 256x128 through convert_demo."""
    from demo2_tpu.models import make_model
    from demo2_tpu.utils.ref_convert import convert_demo

    num_classes, camera_num, b = 7, 4, 2
    cfg = _tpu_cfg(USE_SDTPS=True, USE_DGAF=True, DGAF_VERSION="v3", DIRECT=1)
    cfg.INPUT.SIZE_TRAIN = (256, 128)
    cfg.INPUT.SIZE_TEST = (256, 128)
    cfg.freeze()
    tm = _build_ref_demo(cfg, num_classes, camera_num, seed=42)
    imgs, cams, t_in = _tri_modal_inputs(43, b, 256, 128, camera_num)
    with torch.no_grad():
        ref_feat = tm(t_in, cam_label=torch.from_numpy(cams)).numpy()

    jm = make_model(cfg, num_classes, camera_num)
    variables = jm.init(RNG, jnp.asarray(imgs), jnp.asarray(cams), train=False)
    params, stats = convert_demo(torch_sd(tm), cfg)
    variables = graft(variables, params, stats, require_full_params=True,
                      allow_missing_in_model=True)
    out = jm.apply(variables, jnp.asarray(imgs), jnp.asarray(cams), train=False)
    allclose(out["embedding"], ref_feat, rtol=2e-3, atol=2e-3)
