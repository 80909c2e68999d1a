"""Parity for the SDTPS "complete"/"fixed" variant against the DIRECT-
imported reference module (modeling/sdtps_complete.py — byte-identical to
modeling/sdtps_fixed.py, verified in test_variant_files_identical)."""

import filecmp

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ref_loader import load_ref

from demo2_tpu.models.sdtps_variants import SDTPSComplete

M, B, N, C, H = 3, 2, 12, 16, 4
RNG = jax.random.PRNGKey(0)

# (reference attr, m, g) — stacked index [m, g] scores modality m's patches
# with guide g's global (sdtps_complete.py:419-516 wiring).
ATTN_MAP = [
    ("rgb_self_attn", 0, 0), ("rgb_cross_nir", 0, 1), ("rgb_cross_tir", 0, 2),
    ("nir_self_attn", 1, 1), ("nir_cross_rgb", 1, 0), ("nir_cross_tir", 1, 2),
    ("tir_self_attn", 2, 2), ("tir_cross_rgb", 2, 0), ("tir_cross_nir", 2, 1),
]


def test_variant_files_identical():
    assert filecmp.cmp(
        "/root/reference/modeling/sdtps_fixed.py",
        "/root/reference/modeling/sdtps_complete.py",
        shallow=False,
    ), "reference variant files diverged; SDTPSComplete may need a split"


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    patches = rng.normal(size=(M, B, N, C)).astype(np.float32)
    globals_ = rng.normal(size=(M, B, C)).astype(np.float32)
    return patches, globals_


def _copy_ref_weights(ref, params):
    """Pack the reference's 9 CrossModalAttention modules into the stacked
    (3, 3, ...) parameter tensors."""
    P = jax.tree_util.tree_map(np.array, dict(params))
    with torch.no_grad():
        for attr, m, g in ATTN_MAP:
            mod = getattr(ref, attr)
            P["q_proj_kernel"][m, g] = mod.q_proj.weight.numpy().T
            P["q_proj_bias"][m, g] = mod.q_proj.bias.numpy()
            P["k_proj_kernel"][m, g] = mod.k_proj.weight.numpy().T
            P["k_proj_bias"][m, g] = mod.k_proj.bias.numpy()
            P["gate_scale"][m, g] = mod.gate_scale.numpy().reshape(-1)
            P["gate_bias"][m, g] = mod.gate_bias.numpy().reshape(-1)
    return P


def test_forward_parity(data):
    patches, globals_ = data
    ref_mod = load_ref("modeling.sdtps_complete")
    torch.manual_seed(0)
    ref = ref_mod.MultiModalSDTPS(
        embed_dim=C, sparse_ratio=0.6, cross_attn_type="attention",
        cross_attn_heads=H,
    ).eval()
    # Randomize the gate affines away from their constant init so the
    # parity check actually exercises the per-head gating.
    with torch.no_grad():
        for attr, _, _ in ATTN_MAP:
            mod = getattr(ref, attr)
            mod.gate_scale.uniform_(0.2, 1.2)
            mod.gate_bias.uniform_(-0.5, 0.5)
    with torch.no_grad():
        want = ref(*[torch.from_numpy(patches[i]) for i in range(3)],
                   *[torch.from_numpy(globals_[i]) for i in range(3)])

    mod = SDTPSComplete(embed_dim=C, num_heads=H, sparse_ratio=0.6)
    vars_ = mod.init({"params": RNG}, jnp.asarray(patches), jnp.asarray(globals_))
    params = _copy_ref_weights(ref, vars_["params"])
    enhanced, mask = mod.apply(
        {"params": params}, jnp.asarray(patches), jnp.asarray(globals_)
    )
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(enhanced[i]), want[i].numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(mask[i]), want[3 + i].numpy(), rtol=1e-4, atol=1e-5
        )
    # hard top-k keeps exactly ceil(N * ratio) tokens per row
    assert int(np.asarray(mask[0]).sum(-1)[0]) == int(np.ceil(N * 0.6))


def test_cosine_only_parity(data):
    patches, globals_ = data
    ref_mod = load_ref("modeling.sdtps_complete")
    ref = ref_mod.MultiModalSDTPS(
        embed_dim=C, sparse_ratio=0.5, cross_attn_type="cosine"
    ).eval()
    with torch.no_grad():
        want = ref(*[torch.from_numpy(patches[i]) for i in range(3)],
                   *[torch.from_numpy(globals_[i]) for i in range(3)])
    mod = SDTPSComplete(embed_dim=C, sparse_ratio=0.5, use_cross_attn=False)
    vars_ = mod.init({"params": RNG}, jnp.asarray(patches), jnp.asarray(globals_))
    enhanced, mask = mod.apply(vars_, jnp.asarray(patches), jnp.asarray(globals_))
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(mask[i]), want[3 + i].numpy(), rtol=1e-4, atol=1e-5
        )


def test_gumbel_ste_value_and_grad(data):
    """STE forward VALUE equals the hard top-k mask (hard + soft - detach
    == hard, sdtps_complete.py:277-281); gradients flow through the soft
    softmax to the projections."""
    patches, globals_ = data
    mod = SDTPSComplete(embed_dim=C, num_heads=H, sparse_ratio=0.5,
                        use_gumbel=True, gumbel_tau=1.0)
    vars_ = mod.init({"params": RNG}, jnp.asarray(patches), jnp.asarray(globals_))

    def run(p, det):
        return mod.apply(
            {"params": p}, jnp.asarray(patches), jnp.asarray(globals_),
            deterministic=det, rngs={} if det else {"gumbel": jax.random.PRNGKey(7)},
        )

    _, mask_train = run(vars_["params"], False)
    _, mask_eval = run(vars_["params"], True)
    np.testing.assert_allclose(np.asarray(mask_train), np.asarray(mask_eval))

    def loss(p):
        enhanced, _ = run(p, False)
        return jnp.sum(enhanced**2)

    g = jax.grad(loss)(vars_["params"])
    assert float(jnp.abs(g["q_proj_kernel"]).max()) > 0


def test_variant_reachable_from_config():
    """MODEL.SDTPS_VARIANT='complete' swaps the module inside the full DeMo
    assembly (same call signature, shape-preserving)."""
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.models import make_model

    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.SDTPS_VARIANT = "complete"
    cfg.MODEL.SDTPS_CROSS_ATTN_TYPE = "attention"
    cfg.TPU.BACKBONE_DEPTH = 1
    cfg.TPU.BACKBONE_WIDTH = 32
    cfg.TPU.BACKBONE_HEADS = 2
    cfg.INPUT.SIZE_TRAIN = (32, 16)
    cfg.INPUT.SIZE_TEST = (32, 16)
    cfg.freeze()
    model = make_model(cfg, num_class=4, camera_num=2)
    imgs = jnp.zeros((2, 3, 32, 16, 3))
    cams = jnp.zeros((2,), jnp.int32)
    views = jnp.zeros((2,), jnp.int32)
    vars_ = model.init(
        {"params": RNG, "dropout": RNG, "gumbel": RNG}, imgs, cams, views,
        train=False,
    )
    out = model.apply(vars_, imgs, cams, views, train=False)
    assert np.isfinite(np.asarray(out["embedding"])).all()
