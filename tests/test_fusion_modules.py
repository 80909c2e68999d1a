"""Behavioral tests for the fusion modules (shapes, invariants, numerics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demo2_tpu.models.dgaf import (
    DualGatedAdaptiveFusionV3,
    DualGatedAdaptiveFusionV4,
    DualGatedPostFusion,
    compute_entropy,
)
from demo2_tpu.models.frca import FourierResidualChannelAttention
from demo2_tpu.models.hdm_atmoe import ATMoE, HDM, GeneralFusion
from demo2_tpu.models.lif import TrimodalLIF, lif_loss, lif_reweight
from demo2_tpu.models.sacr import SACR, MultiModalSACR
from demo2_tpu.models.sdtps import MultiModalSDTPS

RNG = jax.random.PRNGKey(0)


def _tokens(m=3, b=4, n=16, c=32, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (m, b, n, c))


def _globals(m=3, b=4, c=32, seed=1):
    return jax.random.normal(jax.random.PRNGKey(seed), (m, b, c))


def test_sdtps_soft_mask_properties():
    mod = MultiModalSDTPS(embed_dim=32, sparse_ratio=0.5)
    p, g = _tokens(), _globals()
    vars_ = mod.init({"params": RNG}, p, g)
    enh, mask = mod.apply(vars_, p, g)
    assert enh.shape == p.shape and mask.shape == p.shape[:3]
    assert float(mask.min()) >= 0.0 and float(mask.max()) <= 1.0
    # Quantile threshold at 1-ratio: about half the tokens above 0.5.
    frac = float((mask > 0.5).mean())
    assert 0.3 < frac < 0.7
    np.testing.assert_allclose(np.asarray(enh), np.asarray(p * mask[..., None]), rtol=1e-6)


def test_sdtps_hard_topk_exact_count():
    mod = MultiModalSDTPS(embed_dim=32, sparse_ratio=0.5, use_soft_masking=False)
    p, g = _tokens(n=16), _globals()
    vars_ = mod.init({"params": RNG}, p, g)
    _, mask = mod.apply(vars_, p, g)
    counts = np.asarray(mask.sum(axis=-1))
    np.testing.assert_array_equal(counts, 8.0)  # ceil(16 * 0.5)


def test_sdtps_gumbel_ste_forward_is_hard():
    mod = MultiModalSDTPS(
        embed_dim=32, sparse_ratio=0.5, use_soft_masking=False, use_gumbel=True
    )
    p, g = _tokens(), _globals()
    vars_ = mod.init({"params": RNG, "gumbel": RNG}, p, g)
    _, mask = mod.apply(
        vars_, p, g, deterministic=False, rngs={"gumbel": RNG, "dropout": RNG}
    )
    # STE: forward values are exactly 0/1.
    np.testing.assert_array_equal(
        np.asarray(jnp.sort(jnp.unique(jnp.round(mask, 5)))), [0.0, 1.0]
    )


def test_sdtps_cosine_mode_has_no_attention_params():
    mod = MultiModalSDTPS(embed_dim=32, use_cross_attn=False)
    p, g = _tokens(), _globals()
    vars_ = mod.init({"params": RNG}, p, g)
    assert "q_proj_kernel" not in vars_["params"]


def test_sdtps_shared_weights_param_shape():
    mod = MultiModalSDTPS(embed_dim=32, share_cross_attn_weights=True)
    p, g = _tokens(), _globals()
    vars_ = mod.init({"params": RNG}, p, g)
    assert vars_["params"]["q_proj_kernel"].shape == (3, 1, 32, 32)


def test_entropy_matches_definition():
    x = np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32)
    f = np.abs(x) + 1e-8
    p = f / f.sum(-1, keepdims=True)
    ref = -(p * np.log(p + 1e-8)).sum(-1)
    np.testing.assert_allclose(np.asarray(compute_entropy(jnp.asarray(x))), ref, rtol=1e-5)


def test_dgaf_v1_v3_v4_shapes():
    h = _globals(c=32)
    v1 = DualGatedPostFusion(feat_dim=32)
    out1 = v1.apply(v1.init(RNG, h), h)
    assert out1.shape == (4, 96)

    toks = _tokens(c=32)
    v3 = DualGatedAdaptiveFusionV3(feat_dim=32)
    out3 = v3.apply(v3.init(RNG, toks), toks)
    assert out3.shape == (4, 96)

    v4 = DualGatedAdaptiveFusionV4(feat_dim=32)
    out4 = v4.apply(v4.init(RNG, h), h)
    assert out4.shape == (3, 4, 32)


def test_dgaf_alpha_is_sigmoid_bounded():
    h = _globals(c=32)
    v1 = DualGatedPostFusion(feat_dim=32, init_alpha=0.5)
    vars_ = v1.init(RNG, h)
    alpha = float(jax.nn.sigmoid(vars_["params"]["core"]["alpha"]))
    np.testing.assert_allclose(alpha, jax.nn.sigmoid(0.5), rtol=1e-6)


def test_hdm_set_masking_matches_explicit_subsets():
    """HDM's masked single attention == per-subset attention."""
    m, b, n, c = 3, 2, 5, 64
    p_, g_ = _tokens(m, b, n, c), _globals(m, b, c)
    hdm = HDM(feat_dim=c)
    vars_ = hdm.init({"params": RNG}, p_, g_)
    out = hdm.apply(vars_, p_, g_)
    assert out.shape == (7, b, c)

    # Independent check for set 0 ({R}): run torch-free manual attention over
    # only the R segment with the same weights.
    P = vars_["params"]
    full_r = jnp.concatenate([g_[0][:, None], p_[0]], axis=1)  # (B, n+1, C)
    tok = P["set_tokens"][0]
    wq, wk, wv = jnp.split(P["in_proj_kernel"][0], 3, axis=-1)
    bq, bk, bv = jnp.split(P["in_proj_bias"][0], 3)
    h = c // 64
    d = c // h
    q = (tok @ wq + bq).reshape(h, d)
    k = (full_r @ wk + bk).reshape(b, n + 1, h, d)
    v = (full_r @ wv + bv).reshape(b, n + 1, h, d)
    logits = jnp.einsum("hd,blhd->bhl", q, k) * (d ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhl,blhd->bhd", probs, v).reshape(b, c)
    o = o @ P["out_proj_kernel"][0] + P["out_proj_bias"][0]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(o), rtol=1e-4, atol=1e-5)


def test_atmoe_output_shape_and_gate_effect():
    feats = jax.random.normal(RNG, (7, 4, 96))
    moe = ATMoE(feat_dim=96, head=8)
    vars_ = moe.init({"params": RNG}, feats)
    out, _ = moe.apply(vars_, feats, use_running_average=False, mutable=["batch_stats"])
    assert out.shape == (4, 7 * 96)


def test_general_fusion_hdm_only_concat():
    p, g = _tokens(c=64), _globals(c=64)
    gf = GeneralFusion(feat_dim=64, use_hdm=True, use_atm=False)
    vars_ = gf.init({"params": RNG}, p, g)
    out = gf.apply(vars_, p, g)
    assert out.shape == (4, 7 * 64)


def test_sacr_preserves_shape():
    toks = _tokens(m=3, b=2, n=8, c=16)
    sacr = SACR(token_dim=16, height=4, width=2)
    vars_ = sacr.init(RNG, toks)
    out = sacr.apply(vars_, toks)
    assert out.shape == toks.shape


def test_multimodal_sacr_cross_modal_mixing():
    toks = _tokens(m=3, b=2, n=8, c=16)
    mm = MultiModalSACR(token_dim=16, height=4, width=2)
    vars_ = mm.init(RNG, toks)
    out = mm.apply(vars_, toks)
    assert out.shape == toks.shape
    # Perturbing modality 2 must change modality 0's output (cross-modal).
    toks2 = toks.at[2].add(1.0)
    out2 = mm.apply(vars_, toks2)
    assert float(jnp.max(jnp.abs(out2[0] - out[0]))) > 1e-6


def test_lif_quality_and_reweight():
    images = jax.random.uniform(RNG, (2, 3, 32, 16, 3))
    lif = TrimodalLIF()
    vars_ = lif.init(RNG, images)
    qmaps, _ = lif.apply(vars_, images, False, mutable=["batch_stats"])
    assert qmaps.shape == (3, 2, 4, 2, 1)  # H/8, W/8
    loss = lif_loss(qmaps, images)
    assert np.isfinite(float(loss)) and float(loss) >= 0
    patches = _tokens(m=3, b=2, n=8, c=16)
    out = lif_reweight(patches, qmaps, (4, 2), temperature=4.0)
    assert out.shape == patches.shape
    # Weights softmax over modality: sum over m of (weight * 1) == 1.
    ones = jnp.ones_like(patches)
    w = lif_reweight(ones, qmaps, (4, 2), temperature=4.0)
    np.testing.assert_allclose(np.asarray(w.sum(axis=0)), 1.0, rtol=1e-5)


def test_frca_shape_and_fp32_fft():
    x = jax.random.normal(RNG, (2, 4, 2, 16), jnp.float32)
    frca = FourierResidualChannelAttention(channels=16)
    vars_ = frca.init(RNG, x)
    out = frca.apply(vars_, x)
    assert out.shape == x.shape
    # bf16 module config still works (FFT forced to fp32 internally).
    frca_bf = FourierResidualChannelAttention(channels=16, dtype=jnp.bfloat16)
    out_bf = frca_bf.apply(vars_, x.astype(jnp.bfloat16))
    assert np.all(np.isfinite(np.asarray(out_bf, np.float32)))


def test_dgaf_v2_shapes_and_cross_attn_effect():
    from demo2_tpu.models.dgaf import DualGatedAdaptiveFusionV2

    h = _globals(c=32)
    toks = _tokens(c=32)
    v2 = DualGatedAdaptiveFusionV2(feat_dim=32)
    vars_ = v2.init(RNG, h, toks)
    out = v2.apply(vars_, h, toks)
    assert out.shape == (3, 4, 32)
    # Without tokens the cross-attn enhancement is skipped.
    out_no = v2.apply(vars_, h, None)
    assert out_no.shape == (3, 4, 32)
    assert float(jnp.max(jnp.abs(out - out_no))) > 1e-6
