"""Forward parity against the ACTUAL reference code (direct-file import).

Each test builds the reference torch module (randomized weights), converts
its state dict via demo2_tpu.utils.ref_convert, grafts it into the JAX
module, and asserts forward equality in eval mode (fp32, rtol ~1e-4).

This retires the hand-written torch twins as the oracle of record
(VERDICT round 1, item 2): the oracle here IS the reference.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import flax

from ref_loader import load_ref

from demo2_tpu.utils import ref_convert as rc

RNG = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def torch_sd(mod):
    return {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()}


def randomize(mod, seed=0):
    """Randomize a torch module's weights so parity is non-trivial."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in mod.state_dict().items():
            if p.dtype not in (torch.float32, torch.float64):
                continue
            if name.endswith("running_var"):
                p.copy_(0.5 + torch.rand(p.shape, generator=g))
            elif name.endswith(("running_mean",)):
                p.copy_(0.1 * torch.randn(p.shape, generator=g))
            elif "bottleneck" in name and name.endswith(".bias"):
                # BNNeck biases are frozen at zero in the reference
                # (make_model.py:644-646); keep that invariant.
                p.zero_()
            else:
                p.copy_(0.2 * torch.randn(p.shape, generator=g))
    return mod


# graft moved into the package (demo2_tpu.utils.ref_convert) so the CLI
# torch-checkpoint loading path shares the strict shape-checked grafting the
# parity suite uses; re-exported here for the other test modules.
from demo2_tpu.utils.ref_convert import graft  # noqa: E402


def allclose(a, b, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=rtol, atol=atol
    )


def rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


# ---------------------------------------------------------------------------
# SDTPS
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shared", [False, True])
def test_sdtps_parity(shared):
    from demo2_tpu.models.sdtps import MultiModalSDTPS

    ref_mod = load_ref("modeling.sdtps")
    c, b, n = 32, 4, 12
    tm = randomize(
        ref_mod.MultiModalSDTPS(
            embed_dim=c, num_patches=n, sparse_ratio=0.5,
            cross_attn_type="attention", share_cross_attn_weights=shared,
        ).eval(),
        seed=1,
    )
    rng = np.random.default_rng(0)
    patches = rand(rng, 3, b, n, c)
    globals_ = rand(rng, 3, b, c)

    with torch.no_grad():
        outs = tm(*(torch.from_numpy(patches[i]) for i in range(3)),
                  *(torch.from_numpy(globals_[i]) for i in range(3)))
    ref_enhanced = np.stack([o.numpy() for o in outs[:3]])
    ref_masks = np.stack([o.numpy() for o in outs[3:]])

    jm = MultiModalSDTPS(embed_dim=c, sparse_ratio=0.5,
                         share_cross_attn_weights=shared)
    variables = jm.init(RNG, jnp.asarray(patches), jnp.asarray(globals_))
    params, _ = rc.convert_sdtps(torch_sd(tm), shared=shared)
    variables = graft(variables, params)
    enhanced, mask = jm.apply(variables, jnp.asarray(patches), jnp.asarray(globals_))
    allclose(mask, ref_masks)
    allclose(enhanced, ref_enhanced)


# ---------------------------------------------------------------------------
# DGAF family
# ---------------------------------------------------------------------------

def _ref_dgaf():
    return load_ref("modeling.dual_gated_fusion")


def test_dgaf_v1_parity():
    from demo2_tpu.models.dgaf import DualGatedPostFusion

    c, b = 24, 5
    tm = randomize(_ref_dgaf().DualGatedPostFusion(feat_dim=c).eval(), seed=2)
    rng = np.random.default_rng(1)
    h = rand(rng, 3, b, c)
    with torch.no_grad():
        ref = tm(*(torch.from_numpy(h[i]) for i in range(3))).numpy()

    jm = DualGatedPostFusion(feat_dim=c)
    variables = jm.init(RNG, jnp.asarray(h))
    params, _ = rc.convert_dgaf_v1(torch_sd(tm))
    variables = graft(variables, params)
    allclose(jm.apply(variables, jnp.asarray(h)), ref)


def test_dgaf_v3_parity():
    from demo2_tpu.models.dgaf import DualGatedAdaptiveFusionV3

    c, b, k = 32, 4, 9
    tm = randomize(_ref_dgaf().DualGatedAdaptiveFusionV3(feat_dim=c, num_heads=4).eval(), seed=3)
    rng = np.random.default_rng(2)
    tokens = rand(rng, 3, b, k, c)
    with torch.no_grad():
        ref = tm(*(torch.from_numpy(tokens[i]) for i in range(3))).numpy()

    jm = DualGatedAdaptiveFusionV3(feat_dim=c, num_heads=4)
    variables = jm.init(RNG, jnp.asarray(tokens))
    params, _ = rc.convert_dgaf_v3(torch_sd(tm))
    variables = graft(variables, params)
    allclose(jm.apply(variables, jnp.asarray(tokens)), ref)


def test_dgaf_v4_parity():
    from demo2_tpu.models.dgaf import DualGatedAdaptiveFusionV4

    c, b = 24, 5
    tm = randomize(_ref_dgaf().DualGatedAdaptiveFusionV4(feat_dim=c).eval(), seed=4)
    rng = np.random.default_rng(3)
    h = rand(rng, 3, b, c)
    with torch.no_grad():
        refs = tm(*(torch.from_numpy(h[i]) for i in range(3)))
    ref = np.stack([r.numpy() for r in refs])

    jm = DualGatedAdaptiveFusionV4(feat_dim=c)
    variables = jm.init(RNG, jnp.asarray(h))
    params, _ = rc.convert_dgaf_v4(torch_sd(tm))
    variables = graft(variables, params)
    allclose(jm.apply(variables, jnp.asarray(h)), ref)


def test_dgaf_v3multi_parity():
    from demo2_tpu.models.dgaf import DualGatedAdaptiveFusionV3Multi

    c, b, k, m = 32, 3, 7, 6
    tm = randomize(
        _ref_dgaf().DualGatedAdaptiveFusionV3Multi(
            feat_dim=c, num_modalities=m, num_heads=4
        ).eval(),
        seed=5,
    )
    rng = np.random.default_rng(4)
    tokens = rand(rng, m, b, k, c)
    with torch.no_grad():
        ref = tm([torch.from_numpy(tokens[i]) for i in range(m)]).numpy()

    jm = DualGatedAdaptiveFusionV3Multi(feat_dim=c, num_modalities=m, num_heads=4)
    variables = jm.init(RNG, jnp.asarray(tokens))
    params, _ = rc.convert_dgaf_v3multi(torch_sd(tm), m)
    variables = graft(variables, params)
    allclose(jm.apply(variables, jnp.asarray(tokens)), ref)


def test_dgaf_v2_parity():
    from demo2_tpu.models.dgaf import DualGatedAdaptiveFusionV2

    c, b, n = 32, 4, 10
    tm = randomize(
        _ref_dgaf().DualGatedAdaptiveFusionV2(
            feat_dim=c, use_cross_modal_attn=True, num_heads=4
        ).eval(),
        seed=6,
    )
    rng = np.random.default_rng(5)
    h = rand(rng, 3, b, c)
    tokens = rand(rng, 3, b, n, c)
    with torch.no_grad():
        refs = tm(
            *(torch.from_numpy(h[i]) for i in range(3)),
            *(torch.from_numpy(tokens[i]) for i in range(3)),
        )
    ref = np.stack([r.numpy() for r in refs])

    jm = DualGatedAdaptiveFusionV2(feat_dim=c, num_heads=4)
    variables = jm.init(RNG, jnp.asarray(h), jnp.asarray(tokens))
    params, _ = rc.convert_dgaf_v2(torch_sd(tm))
    variables = graft(variables, params)
    allclose(jm.apply(variables, jnp.asarray(h), jnp.asarray(tokens)), ref)


# ---------------------------------------------------------------------------
# SACR family
# ---------------------------------------------------------------------------

def test_sacr_parity():
    from demo2_tpu.models.sacr import SACR

    c, b, gh, gw = 16, 2, 4, 2
    tm = randomize(
        load_ref("modeling.sacr").SACR(
            token_dim=c, height=gh, width=gw, dilation_rates=[2, 3, 4]
        ).eval(),
        seed=7,
    )
    rng = np.random.default_rng(6)
    tokens = rand(rng, 3, b, gh * gw, c)
    with torch.no_grad():
        ref = np.stack(
            [tm(torch.from_numpy(tokens[i])).numpy() for i in range(3)]
        )

    jm = SACR(token_dim=c, height=gh, width=gw)
    variables = jm.init(RNG, jnp.asarray(tokens))
    params, stats = rc.convert_sacr(torch_sd(tm))
    variables = graft(variables, params, stats)
    allclose(jm.apply(variables, jnp.asarray(tokens)), ref, rtol=1e-4, atol=1e-4)


def test_multimodal_sacr_parity():
    from demo2_tpu.models.sacr import MultiModalSACR

    c, b, gh, gw = 16, 2, 4, 2
    ref_mod = load_ref("modeling.multimodal_sacr")
    tm = randomize(
        ref_mod.MultiModalSACR(
            token_dim=c, height=gh, width=gw, dilation_rates=[2, 3, 4]
        ).eval(),
        seed=8,
    )
    rng = np.random.default_rng(7)
    tokens = rand(rng, 3, b, gh * gw, c)
    with torch.no_grad():
        refs = tm(*(torch.from_numpy(tokens[i]) for i in range(3)))
    ref = np.stack([r.numpy() for r in refs])

    jm = MultiModalSACR(token_dim=c, height=gh, width=gw)
    variables = jm.init(RNG, jnp.asarray(tokens))
    params, stats = rc.convert_multimodal_sacr(torch_sd(tm))
    variables = graft(variables, params, stats)
    allclose(jm.apply(variables, jnp.asarray(tokens)), ref, rtol=1e-4, atol=1e-4)


def test_multimodal_sacr_v2_parity():
    from demo2_tpu.models.sacr import MultiModalSACRv2

    c, b, gh, gw = 16, 2, 4, 2
    ref_mod = load_ref("modeling.multimodal_sacr")
    tm = randomize(
        ref_mod.MultiModalSACRv2(
            token_dim=c, height=gh, width=gw, dilation_rates=[2, 3, 4]
        ).eval(),
        seed=9,
    )
    rng = np.random.default_rng(8)
    tokens = rand(rng, 3, b, gh * gw, c)
    with torch.no_grad():
        refs = tm(*(torch.from_numpy(tokens[i]) for i in range(3)))
    ref = np.stack([r.numpy() for r in refs])

    jm = MultiModalSACRv2(token_dim=c, height=gh, width=gw)
    variables = jm.init(RNG, jnp.asarray(tokens))
    params, stats = rc.convert_multimodal_sacr_v2(torch_sd(tm))
    variables = graft(variables, params, stats)
    allclose(jm.apply(variables, jnp.asarray(tokens)), ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# LIF / FRCA
# ---------------------------------------------------------------------------

def test_lif_predictor_parity():
    from demo2_tpu.models.lif import TrimodalLIF

    b, h, w = 2, 32, 16
    tm = randomize(load_ref("modeling.trimodal_lif").TrimodalLIF().eval(), seed=10)
    rng = np.random.default_rng(9)
    imgs = rand(rng, b, 3, h, w, 3)  # (B, modality, H, W, chan)
    with torch.no_grad():
        refs = tm.predict_quality(
            *(torch.from_numpy(imgs[:, i].transpose(0, 3, 1, 2)) for i in range(3))
        )
    ref = np.stack([r.numpy().transpose(0, 2, 3, 1) for r in refs])

    jm = TrimodalLIF()
    variables = jm.init(RNG, jnp.asarray(imgs))
    params, stats = rc.convert_lif(torch_sd(tm))
    variables = graft(variables, params, stats, require_full_params=False)
    allclose(jm.apply(variables, jnp.asarray(imgs)), ref, rtol=1e-4, atol=1e-4)


def test_frca_parity():
    from demo2_tpu.models.frca import FourierResidualChannelAttention

    c, b, h, w = 16, 2, 4, 2
    tm = randomize(
        load_ref("modeling.FRCA").FourierResidualChannelAttention(
            channels=c, negative_slope=0.1, up_scale=1
        ).eval(),
        seed=11,
    )
    rng = np.random.default_rng(10)
    x = rand(rng, b, h, w, c)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    jm = FourierResidualChannelAttention(channels=c)
    variables = jm.init(RNG, jnp.asarray(x))
    params, _ = rc.convert_frca(torch_sd(tm))
    variables = graft(variables, params)
    allclose(jm.apply(variables, jnp.asarray(x)), ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# HDM + ATMoE (GeneralFusion)
# ---------------------------------------------------------------------------

def _general_fusion_cfg(hdm=True, atm=True):
    import types

    cfg = types.SimpleNamespace()
    cfg.MODEL = types.SimpleNamespace(HDM=hdm, ATM=atm)
    return cfg


@pytest.mark.parametrize("use_atm,c", [(False, 64), (True, 64), (False, 128)])
def test_general_fusion_parity(use_atm, c):
    """c=128 runs 2 attention heads — it pins the PER-HEAD logit scale
    (nn.MultiheadAttention's head_dim**-0.5), which c=64 (1 head) cannot
    distinguish from feat_dim**-0.5 (review round 4)."""
    from demo2_tpu.models.hdm_atmoe import GeneralFusion

    b, n, head = 3, 6, 4
    ref_mod = load_ref("modeling.moe.AttnMOE")
    tm = randomize(
        ref_mod.GeneralFusion(
            feat_dim=c, num_experts=7, head=head, reg_weight=0, dropout=0.1,
            cfg=_general_fusion_cfg(atm=use_atm),
        ).eval(),
        seed=12,
    )
    rng = np.random.default_rng(11)
    patches = rand(rng, 3, b, n, c)
    globals_ = rand(rng, 3, b, c)
    with torch.no_grad():
        ref = tm(
            *(torch.from_numpy(patches[i]) for i in range(3)),
            *(torch.from_numpy(globals_[i]) for i in range(3)),
        ).numpy()

    jm = GeneralFusion(feat_dim=c, use_atm=use_atm, head=head)
    variables = jm.init(RNG, jnp.asarray(patches), jnp.asarray(globals_))
    params, stats = rc.convert_general_fusion(torch_sd(tm), head=head, use_atm=use_atm)
    variables = graft(variables, params, stats)
    out = jm.apply(variables, jnp.asarray(patches), jnp.asarray(globals_))
    allclose(out, ref, rtol=2e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Full model assemblies (ImageNet-ViT backbone; make_model.py:450-962)
# ---------------------------------------------------------------------------

def _tpu_cfg(**model_overrides):
    from demo2_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "vit_base_patch16_224"
    cfg.INPUT.SIZE_TRAIN = (32, 16)
    cfg.INPUT.SIZE_TEST = (32, 16)
    cfg.MODEL.STRIDE_SIZE = (16, 16)
    cfg.MODEL.SIE_CAMERA = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.USE_FLASH_ATTENTION = False
    for k, v in model_overrides.items():
        setattr(cfg.MODEL, k, v)
    return cfg


def _build_ref_demo(cfg, num_classes, camera_num, arch="DeMo", seed=20):
    """Construct the reference model directly against OUR config object
    (knob names mirror the reference yacs tree by design)."""
    ref_vit = load_ref("modeling.backbones.vit_pytorch")
    ref_vit.Trans.load_param = lambda self, path: None  # no pretrain on disk
    ref_mm = load_ref("modeling.make_model")
    factory = getattr(ref_mm, "__factory_T_type")
    cls = {"DeMo": ref_mm.DeMo, "DeMo_Parallel": ref_mm.DeMo_Parallel,
           "DeMoBeiyong": ref_mm.DeMoBeiyong}[arch]
    tm = cls(num_classes, cfg, camera_num, 0, factory)
    return randomize(tm, seed=seed).eval()


def _tri_modal_inputs(seed, b, h, w, camera_num):
    rng = np.random.default_rng(seed)
    imgs = rand(rng, b, 3, h, w, 3)
    cams = rng.integers(0, camera_num, b)
    t_in = {
        "RGB": torch.from_numpy(imgs[:, 0].transpose(0, 3, 1, 2)),
        "NI": torch.from_numpy(imgs[:, 1].transpose(0, 3, 1, 2)),
        "TI": torch.from_numpy(imgs[:, 2].transpose(0, 3, 1, 2)),
    }
    return imgs, cams, t_in


DEMO_CONFIGS = {
    "baseline_direct": dict(USE_SDTPS=False, USE_DGAF=False, DIRECT=1),
    "baseline_permod": dict(USE_SDTPS=False, USE_DGAF=False, DIRECT=0),
    "sdtps_only": dict(USE_SDTPS=True, USE_DGAF=False, DIRECT=1, GLOBAL_LOCAL=True),
    "dgaf_v3_only": dict(USE_SDTPS=False, USE_DGAF=True, DGAF_VERSION="v3", DIRECT=1),
    "sdtps_dgaf_v3": dict(USE_SDTPS=True, USE_DGAF=True, DGAF_VERSION="v3", DIRECT=1),
    "sdtps_dgaf_v1": dict(USE_SDTPS=True, USE_DGAF=True, DGAF_VERSION="v1",
                          DIRECT=1, GLOBAL_LOCAL=True),
    "frca_only": dict(USE_FRCA=True, USE_SDTPS=False, USE_DGAF=False, DIRECT=1,
                      GLOBAL_LOCAL=True),
    "frca_dgaf_cross": dict(USE_FRCA=True, USE_SDTPS=False, USE_DGAF=True,
                            DGAF_VERSION="v3", FRCA_USE_CROSS_ATTN=True, DIRECT=1),
}


@pytest.mark.parametrize("name", sorted(DEMO_CONFIGS))
@pytest.mark.slow
def test_demo_full_model_parity(name):
    """Eval-mode embedding + head logits of the full DeMo vs the reference."""
    from demo2_tpu.models import make_model

    num_classes, camera_num, b = 7, 4, 2
    cfg = _tpu_cfg(**DEMO_CONFIGS[name])
    cfg.freeze()
    tm = _build_ref_demo(cfg, num_classes, camera_num, seed=21)
    h, w = cfg.INPUT.SIZE_TRAIN
    imgs, cams, t_in = _tri_modal_inputs(13, b, h, w, camera_num)

    with torch.no_grad():
        ref_feat = tm(t_in, cam_label=torch.from_numpy(cams)).numpy()

    jm = make_model(cfg, num_classes, camera_num)
    variables = jm.init(
        RNG, jnp.asarray(imgs), jnp.asarray(cams), train=False
    )
    sd = torch_sd(tm)
    from demo2_tpu.utils.ref_convert import convert_demo

    params, stats = convert_demo(sd, cfg)
    variables = graft(variables, params, stats, require_full_params=True,
                      allow_missing_in_model=True)
    out = jm.apply(variables, jnp.asarray(imgs), jnp.asarray(cams), train=False)
    allclose(out["embedding"], ref_feat, rtol=5e-4, atol=5e-4)

    # Head logits: apply the reference's eval-mode heads manually.
    head_by_branch = {
        "ori": ("bottleneck", "classifier"),
        "sdtps": ("bottleneck_sdtps", "classifier_sdtps"),
        "frca": ("bottleneck_frca", "classifier_frca"),
        "dgaf": ("bottleneck_dgaf", "classifier_dgaf"),
    }
    for branch, (logits, feat) in out["branches"].items():
        if branch not in head_by_branch:
            continue
        bneck = getattr(tm, head_by_branch[branch][0])
        clf = getattr(tm, head_by_branch[branch][1])
        with torch.no_grad():
            ref_logits = clf(bneck(torch.from_numpy(np.asarray(feat)))).numpy()
        allclose(logits, ref_logits, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_demo_parallel_full_model_parity():
    from demo2_tpu.models import make_model
    from demo2_tpu.utils.ref_convert import convert_demo_parallel

    num_classes, camera_num, b = 7, 4, 2
    cfg = _tpu_cfg(USE_SDTPS=True, USE_DGAF=True, DGAF_VERSION="v3")
    cfg.MODEL.ARCH = "DeMo_Parallel"
    cfg.freeze()
    tm = _build_ref_demo(cfg, num_classes, camera_num, arch="DeMo_Parallel", seed=22)
    h, w = cfg.INPUT.SIZE_TRAIN
    imgs, cams, t_in = _tri_modal_inputs(14, b, h, w, camera_num)

    with torch.no_grad():
        ref_feat = tm(t_in, cam_label=torch.from_numpy(cams)).numpy()

    jm = make_model(cfg, num_classes, camera_num)
    variables = jm.init(RNG, jnp.asarray(imgs), jnp.asarray(cams), train=False)
    params, stats = convert_demo_parallel(torch_sd(tm), cfg)
    variables = graft(variables, params, stats, require_full_params=True,
                      allow_missing_in_model=True)
    out = jm.apply(variables, jnp.asarray(imgs), jnp.asarray(cams), train=False)
    allclose(out["embedding"], ref_feat, rtol=5e-4, atol=5e-4)


LEGACY_CONFIGS = {
    "legacy_sacr_sdtps_dgaf": dict(
        USE_SACR=True, USE_SDTPS=True, USE_DGAF=True, DGAF_VERSION="v3", DIRECT=1
    ),
    "legacy_mmsacr_lif_sdtps": dict(
        USE_MULTIMODAL_SACR=True, USE_LIF=True, USE_SDTPS=True, USE_DGAF=False,
        DIRECT=1, GLOBAL_LOCAL=True
    ),
}


@pytest.mark.parametrize("name", sorted(LEGACY_CONFIGS))
@pytest.mark.slow
def test_demo_legacy_full_model_parity(name):
    """DeMoBeiyong cascade (make_model.py:23-439) vs our DeMoLegacy."""
    from demo2_tpu.models import make_model
    from demo2_tpu.utils.ref_convert import convert_demo

    num_classes, camera_num, b = 7, 4, 2
    cfg = _tpu_cfg(**LEGACY_CONFIGS[name])
    cfg.MODEL.ARCH = "DeMoBeiyong"
    cfg.freeze()
    tm = _build_ref_demo(cfg, num_classes, camera_num, arch="DeMoBeiyong", seed=23)
    h, w = cfg.INPUT.SIZE_TRAIN
    imgs, cams, t_in = _tri_modal_inputs(15, b, h, w, camera_num)

    with torch.no_grad():
        ref_feat = tm(t_in, cam_label=torch.from_numpy(cams)).numpy()

    jm = make_model(cfg, num_classes, camera_num)
    variables = jm.init(RNG, jnp.asarray(imgs), jnp.asarray(cams), train=False)
    params, stats = convert_demo(torch_sd(tm), cfg)
    variables = graft(variables, params, stats, require_full_params=True,
                      allow_missing_in_model=True)
    out = jm.apply(variables, jnp.asarray(imgs), jnp.asarray(cams), train=False)
    allclose(out["embedding"], ref_feat, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# CLIP visual tower (modeling/clip/model.py:418-484)
# ---------------------------------------------------------------------------

def test_clip_visual_parity():
    import types

    from demo2_tpu.models.clip_vit import CLIPVisionTransformer
    from demo2_tpu.utils.converters import convert_clip_visual

    ref_clip = load_ref("modeling.clip.model")
    cfg = types.SimpleNamespace(MODEL=types.SimpleNamespace(PROMPT=False, ADAPTER=False))
    width, layers, heads, out, b = 64, 2, 2, 32, 2
    gh, gw = 2, 1
    tm = randomize(
        ref_clip.VisionTransformer(gh, gw, 16, 16, width, layers, heads, out, cfg).eval(),
        seed=30,
    )
    rng = np.random.default_rng(16)
    imgs = rand(rng, b, 32, 16, 3)
    cv = rand(rng, b, 1, width)
    with torch.no_grad():
        ref = tm(torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                 torch.from_numpy(cv)).numpy()

    jm = CLIPVisionTransformer(h_resolution=gh, w_resolution=gw, width=width,
                               layers=layers, heads=heads, output_dim=out)
    variables = jm.init(RNG, jnp.asarray(imgs), jnp.asarray(cv[:, 0]))
    params = convert_clip_visual(torch_sd(tm), gh, gw)
    variables = graft(variables, {"params": params}["params"])
    outp = jm.apply(variables, jnp.asarray(imgs), jnp.asarray(cv[:, 0]))
    allclose(outp, ref, rtol=5e-4, atol=5e-4)


def test_demo_missing_modality_parity():
    """TEST.MISS zeroing (make_model.py:718-724) vs our in-graph mask."""
    from demo2_tpu.models import make_model
    from demo2_tpu.utils.ref_convert import convert_demo
    from demo2_tpu.engine.eval import MISS_MASKS

    num_classes, camera_num, b = 7, 4, 2
    cfg = _tpu_cfg(USE_SDTPS=True, USE_DGAF=True, DGAF_VERSION="v3", DIRECT=1)
    cfg.TEST.MISS = "nt"
    cfg.freeze()
    tm = _build_ref_demo(cfg, num_classes, camera_num, seed=24)
    h, w = cfg.INPUT.SIZE_TRAIN
    imgs, cams, t_in = _tri_modal_inputs(17, b, h, w, camera_num)

    with torch.no_grad():
        ref_feat = tm(t_in, cam_label=torch.from_numpy(cams)).numpy()

    jm = make_model(cfg, num_classes, camera_num)
    variables = jm.init(RNG, jnp.asarray(imgs), jnp.asarray(cams), train=False)
    params, stats = convert_demo(torch_sd(tm), cfg)
    variables = graft(variables, params, stats, require_full_params=True,
                      allow_missing_in_model=True)
    out = jm.apply(
        variables, jnp.asarray(imgs), jnp.asarray(cams),
        modality_mask=jnp.asarray(MISS_MASKS["nt"]), train=False,
    )
    allclose(out["embedding"], ref_feat, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_torch_pth_checkpoint_load(tmp_path):
    """Migration path: a reference ``torch.save(model.state_dict())`` file
    loads through ref_convert.load_reference_checkpoint (the branch
    tools/test.py takes for TEST.WEIGHT=*.pth) with forward parity."""
    from demo2_tpu.models import make_model
    from demo2_tpu.utils.ref_convert import load_reference_checkpoint

    num_classes, camera_num, b = 7, 4, 2
    cfg = _tpu_cfg(**DEMO_CONFIGS["sdtps_dgaf_v3"])
    cfg.freeze()
    tm = _build_ref_demo(cfg, num_classes, camera_num, seed=33)
    p = tmp_path / "ref_demo.pth"
    torch.save(tm.state_dict(), str(p))

    h, w = cfg.INPUT.SIZE_TRAIN
    imgs, cams, t_in = _tri_modal_inputs(5, b, h, w, camera_num)
    with torch.no_grad():
        ref_feat = tm(t_in, cam_label=torch.from_numpy(cams)).numpy()

    jm = make_model(cfg, num_classes, camera_num)
    variables = jm.init(RNG, jnp.asarray(imgs), jnp.asarray(cams), train=False)

    class _State:
        def __init__(self, params, batch_stats):
            self.params, self.batch_stats = params, batch_stats

        def replace(self, **kw):
            return _State(kw.get("params", self.params),
                          kw.get("batch_stats", self.batch_stats))

    state = load_reference_checkpoint(
        _State(variables["params"], variables.get("batch_stats", {})),
        str(p), cfg,
    )
    out = jm.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(imgs), jnp.asarray(cams), train=False,
    )
    allclose(out["embedding"], ref_feat, rtol=5e-4, atol=5e-4)
