"""Model assembly tests: every config branch builds, runs, and has the
expected output shapes (the reference's config space silently breaks —
SURVEY §4; these are the jit-compile tests it lacked)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demo2_tpu.models import make_model


def _run(cfg, num_class=6, camera_num=4, batch=4, train=True, return_pattern=3):
    cfg = cfg.clone() if hasattr(cfg, "clone") else cfg
    model = make_model(cfg, num_class=num_class, camera_num=camera_num)
    h, w = cfg.INPUT.SIZE_TRAIN
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (batch, 3, h, w, 3)) * 0.1
    cams = jnp.zeros((batch,), jnp.int32)
    views = jnp.zeros((batch,), jnp.int32)
    rngs = {"params": rng, "dropout": rng, "gumbel": rng}
    variables = model.init(rngs, imgs, cams, views, train=False)
    out, _ = model.apply(
        variables, imgs, cams, views, train=train,
        return_pattern=return_pattern,
        rngs={"dropout": rng, "gumbel": rng},
        mutable=["batch_stats"],
    )
    return out, num_class


def test_baseline_branch(tiny_cfg):
    out, nc = _run(tiny_cfg)
    assert set(out["branches"]) == {"ori"}
    logits, feat = out["branches"]["ori"]
    assert logits.shape == (4, nc)
    assert feat.shape == (4, 3 * 512)
    assert out["embedding"].shape == (4, 3 * 512)


def test_baseline_per_modality_heads(tiny_cfg):
    tiny_cfg.MODEL.DIRECT = 0
    out, nc = _run(tiny_cfg)
    assert set(out["branches"]) == {"ori_r", "ori_n", "ori_t"}
    assert out["branches"]["ori_r"][1].shape == (4, 512)


def test_sdtps_only(tiny_cfg):
    tiny_cfg.MODEL.USE_SDTPS = True
    out, _ = _run(tiny_cfg)
    assert set(out["branches"]) == {"sdtps"}
    assert out["embedding"].shape == (4, 3 * 512)


def test_sdtps_global_local(tiny_cfg):
    tiny_cfg.MODEL.USE_SDTPS = True
    tiny_cfg.MODEL.GLOBAL_LOCAL = True
    out, _ = _run(tiny_cfg)
    assert out["embedding"].shape == (4, 3 * 512)


def test_dgaf_only_v3(tiny_cfg):
    tiny_cfg.MODEL.USE_DGAF = True
    out, _ = _run(tiny_cfg)
    assert set(out["branches"]) == {"dgaf"}
    assert out["embedding"].shape == (4, 3 * 512)


def test_dgaf_only_v1(tiny_cfg):
    tiny_cfg.MODEL.USE_DGAF = True
    tiny_cfg.MODEL.DGAF_VERSION = "v1"
    out, _ = _run(tiny_cfg)
    assert out["embedding"].shape == (4, 3 * 512)


def test_sdtps_dgaf_v3(tiny_cfg):
    tiny_cfg.MODEL.USE_SDTPS = True
    tiny_cfg.MODEL.USE_DGAF = True
    out, _ = _run(tiny_cfg)
    assert set(out["branches"]) == {"dgaf"}
    assert out["embedding"].shape == (4, 3 * 512)


def test_sdtps_dgaf_v1_requires_global_local(tiny_cfg):
    tiny_cfg.MODEL.USE_SDTPS = True
    tiny_cfg.MODEL.USE_DGAF = True
    tiny_cfg.MODEL.DGAF_VERSION = "v1"
    with pytest.raises(ValueError):
        _run(tiny_cfg)
    tiny_cfg.MODEL.GLOBAL_LOCAL = True
    out, _ = _run(tiny_cfg)
    assert out["embedding"].shape == (4, 3 * 512)


def test_frca_only(tiny_cfg):
    tiny_cfg.MODEL.USE_FRCA = True
    out, _ = _run(tiny_cfg)
    assert set(out["branches"]) == {"frca"}
    assert out["embedding"].shape == (4, 3 * 512)


def test_frca_dgaf_cross_attn_6way(tiny_cfg):
    tiny_cfg.MODEL.USE_FRCA = True
    tiny_cfg.MODEL.USE_DGAF = True
    tiny_cfg.MODEL.FRCA_USE_CROSS_ATTN = True
    out, _ = _run(tiny_cfg)
    assert out["embedding"].shape == (4, 6 * 512)


def test_use_frca_false_disables_sdtps(tiny_cfg):
    # Tri-state: USE_FRCA=False must NOT fall back to SDTPS (reference fix
    # noted at make_model.py:442,484).
    tiny_cfg.MODEL.USE_FRCA = False
    tiny_cfg.MODEL.USE_SDTPS = True
    tiny_cfg.MODEL.USE_DGAF = False
    out, _ = _run(tiny_cfg)
    assert set(out["branches"]) == {"ori"}


def test_hdm_atm_moe_branch(tiny_cfg):
    tiny_cfg.MODEL.HDM = True
    tiny_cfg.MODEL.ATM = True
    tiny_cfg.MODEL.HEAD = 8
    out, _ = _run(tiny_cfg)
    assert "moe" in out["branches"] and "ori" in out["branches"]
    assert out["branches"]["moe"][1].shape == (4, 7 * 512)
    # return_pattern=3 -> [moe, ori]
    assert out["embedding"].shape == (4, 10 * 512)
    out1, _ = _run(tiny_cfg, return_pattern=1)
    assert out1["embedding"].shape == (4, 3 * 512)
    out2, _ = _run(tiny_cfg, return_pattern=2)
    assert out2["embedding"].shape == (4, 7 * 512)


def test_parallel_arch(tiny_cfg):
    tiny_cfg.MODEL.ARCH = "DeMo_Parallel"
    tiny_cfg.MODEL.USE_SDTPS = True
    tiny_cfg.MODEL.USE_DGAF = True
    out, nc = _run(tiny_cfg)
    assert len(out["branches"]) == 9
    assert out["embedding"].shape == (4, 9 * 512)


def test_legacy_full_stack(tiny_cfg):
    tiny_cfg.MODEL.ARCH = "DeMoBeiyong"
    tiny_cfg.MODEL.USE_SACR = True
    tiny_cfg.MODEL.USE_LIF = True
    tiny_cfg.MODEL.USE_SDTPS = True
    tiny_cfg.MODEL.USE_DGAF = True
    out, _ = _run(tiny_cfg)
    assert "dgaf" in out["branches"]
    assert "lif" in out["aux_loss"]
    assert out["embedding"].shape == (4, 3 * 512)


def test_legacy_multimodal_sacr(tiny_cfg):
    tiny_cfg.MODEL.ARCH = "DeMoBeiyong"
    tiny_cfg.MODEL.USE_MULTIMODAL_SACR = True
    out, _ = _run(tiny_cfg)
    assert out["embedding"].shape == (4, 3 * 512)


def test_missing_modality_mask_zeroes_input(tiny_cfg):
    cfg = tiny_cfg
    model = make_model(cfg, num_class=6, camera_num=4)
    h, w = cfg.INPUT.SIZE_TRAIN
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (2, 3, h, w, 3))
    cams = jnp.zeros((2,), jnp.int32)
    variables = model.init({"params": rng}, imgs, cams, train=False)
    full = model.apply(variables, imgs, cams, train=False)["embedding"]
    # Missing-TIR via mask == zeroed TIR images.
    mask = jnp.asarray([1.0, 1.0, 0.0])
    masked = model.apply(
        variables, imgs, cams, None, mask, train=False
    )["embedding"]
    zeroed = imgs.at[:, 2].set(0.0)
    ref = model.apply(variables, zeroed, cams, train=False)["embedding"]
    np.testing.assert_allclose(np.asarray(masked), np.asarray(ref), rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(full), np.asarray(masked))


def test_adapter_flag_adds_params(tiny_cfg):
    tiny_cfg.MODEL.ADAPTER = True
    out, _ = _run(tiny_cfg)
    assert out["embedding"].shape == (4, 3 * 512)


def test_prompt_path_runs(tiny_cfg):
    tiny_cfg.MODEL.PROMPT = True
    out, _ = _run(tiny_cfg)
    assert out["embedding"].shape == (4, 3 * 512)


def test_prompt_adapter_combined(tiny_cfg):
    tiny_cfg.MODEL.PROMPT = True
    tiny_cfg.MODEL.ADAPTER = True
    out, _ = _run(tiny_cfg)
    assert out["embedding"].shape == (4, 3 * 512)


def test_imagenet_vit_backbone(tiny_cfg):
    # ImageNet ViT path: 768-d features, SIE added to all tokens.
    tiny_cfg.MODEL.TRANSFORMER_TYPE = "vit_base_patch16_224"
    tiny_cfg.TPU.BACKBONE_WIDTH = -1  # width override is CLIP-only
    tiny_cfg.TPU.BACKBONE_HEADS = -1
    out, nc = _run(tiny_cfg, batch=2)
    assert out["branches"]["ori"][1].shape == (2, 3 * 768)
    assert out["embedding"].shape == (2, 3 * 768)


def test_swin_alias_backbone(tiny_cfg):
    # 'swin_small_patch16_224' is the reference's mislabeled plain-ViT-384
    # stub (vit_pytorch.py:524-535, absent from __factory_T_type); here it
    # runs: Trans at width 384 -> 3*384 embedding.
    tiny_cfg.MODEL.TRANSFORMER_TYPE = "swin_small_patch16_224"
    tiny_cfg.TPU.BACKBONE_WIDTH = -1
    tiny_cfg.TPU.BACKBONE_HEADS = -1
    tiny_cfg.TPU.BACKBONE_DEPTH = 2  # tiny depth for CPU
    out, _ = _run(tiny_cfg, batch=2)
    assert out["embedding"].shape == (2, 3 * 384)


def test_deit_small_backbone(tiny_cfg):
    # deit_small_patch16_224 (vit_pytorch.py:512-523): the reference
    # registers it but its make_model feat-dim dispatch assumes 768-d and
    # breaks; here it runs — Trans at width 384 -> 3*384 embedding.
    tiny_cfg.MODEL.TRANSFORMER_TYPE = "deit_small_patch16_224"
    tiny_cfg.TPU.BACKBONE_WIDTH = -1
    tiny_cfg.TPU.BACKBONE_HEADS = -1
    tiny_cfg.TPU.BACKBONE_DEPTH = 2  # tiny depth for CPU
    out, _ = _run(tiny_cfg, batch=2)
    assert out["embedding"].shape == (2, 3 * 384)


def test_remat_backbone_trains(tiny_cfg):
    """TPU.REMAT_BACKBONE must work in TRAIN mode: `deterministic` drives
    Python control flow (drop-path / fused-kernel gating) inside the blocks,
    so it must be a remat static arg (review round 4: nn.remat without
    static_argnums raised TracerBoolConversionError for every config with
    DROP_PATH > 0)."""
    tiny_cfg.TPU.REMAT_BACKBONE = True
    tiny_cfg.MODEL.DROP_PATH = 0.1
    out, _ = _run(tiny_cfg, batch=2, train=True)
    assert np.isfinite(np.asarray(out["embedding"])).all()


def test_remat_backbone_trains_imagenet_vit(tiny_cfg):
    tiny_cfg.MODEL.TRANSFORMER_TYPE = "vit_base_patch16_224"
    tiny_cfg.TPU.REMAT_BACKBONE = True
    tiny_cfg.MODEL.DROP_PATH = 0.1
    tiny_cfg.TPU.BACKBONE_DEPTH = 2
    tiny_cfg.TPU.BACKBONE_WIDTH = -1  # width override is CLIP-only
    tiny_cfg.TPU.BACKBONE_HEADS = -1
    out, _ = _run(tiny_cfg, batch=2, train=True)
    assert np.isfinite(np.asarray(out["embedding"])).all()


def test_nondivisible_stride_patch_grid(tiny_cfg):
    """SIZE=(252,124), STRIDE=(12,12): the conv emits (H-16)//s+1 patches
    per side (reference make_model_clipreid.py:81) — h//s would overcount
    and break the positional embedding (review round 4)."""
    tiny_cfg.INPUT.SIZE_TRAIN = (252, 124)
    tiny_cfg.INPUT.SIZE_TEST = (252, 124)
    tiny_cfg.MODEL.STRIDE_SIZE = (12, 12)
    tiny_cfg.MODEL.USE_SACR = True  # exercises the (gh, gw) reshape path
    out, _ = _run(tiny_cfg, batch=2, train=False)
    assert np.isfinite(np.asarray(out["embedding"])).all()
