"""Fully-fused attention sub-block Pallas kernel (forward).

Fuses LN1 -> qkv GEMM -> multi-head attention -> out-projection -> residual
for the CLIP/ViT block into ONE kernel: the (B, S, 3C) qkv tensor, the LN
output and the attention output never touch HBM (~1 ms/layer of traffic on
v5e at batch 64).  Weights ride constant-index BlockSpecs so Mosaic keeps
them VMEM-resident across grid steps; each grid step processes a block of
BB whole samples, with the qkv/out projections done as one (BB*S, C) GEMM
and attention per sample/head as 2-D MXU matmuls.

The backward pass reuses the UNFUSED implementation via jax.vjp (which
itself uses the packed-attention Pallas kernel), so gradients are identical
to the unfused path; only forward HBM traffic is saved.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed_attention import packed_self_attention

_NEG_INF = -1e30


def _reference_impl(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads, scale):
    """Unfused XLA implementation (also the backward-pass recipe)."""
    f32 = jnp.float32
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    t = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)) * ln_scale + ln_bias
    t = t.astype(x.dtype)
    qkv = t @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    o = packed_self_attention(qkv, num_heads, scale)
    return x + o @ wout.astype(x.dtype) + bout.astype(x.dtype)


def _fwd_kernel(
    x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, o_ref,
    attn_scratch,
    *, num_heads, head_dim, s_valid, scale,
):
    f32 = jnp.float32
    bb, s_pad, c = x_ref.shape
    d = head_dim
    x = x_ref[...].reshape(bb * s_pad, c)
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    t = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)) * lns_ref[...] + lnb_ref[...]
    qkv = (
        jnp.dot(t.astype(x.dtype), wqkv_ref[...], preferred_element_type=f32)
        + bqkv_ref[...]
    ).astype(x.dtype)  # (BB*S, 3C)

    # Per-sample, per-head attention; heads sliced from the packed layout.
    # Outputs land in a VMEM scratch (sliced REF writes; .at[].set on values
    # would lower to an unsupported scatter).
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    kmask = key_ids < s_valid
    for j in range(bb):
        blk = qkv[j * s_pad : (j + 1) * s_pad]  # (S, 3C)
        for i in range(num_heads):
            qh = blk[:, i * d : (i + 1) * d].astype(f32)
            kh = blk[:, c + i * d : c + (i + 1) * d].astype(f32)
            vh = blk[:, 2 * c + i * d : 2 * c + (i + 1) * d].astype(f32)
            sc = jnp.dot(qh * scale, kh.T, preferred_element_type=f32)
            sc = jnp.where(kmask, sc, _NEG_INF)
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp(sc - m)
            p = jnp.where(kmask, p, 0.0)
            p = p / (jnp.sum(p, axis=-1, keepdims=True) + 1e-30)
            ov = jnp.dot(p, vh, preferred_element_type=f32).astype(x.dtype)
            attn_scratch[j * s_pad : (j + 1) * s_pad, i * d : (i + 1) * d] = ov

    y = (
        jnp.dot(attn_scratch[...], wout_ref[...], preferred_element_type=f32)
        + bout_ref[...]
    ).astype(x.dtype)
    o_ref[...] = (x + y).reshape(bb, s_pad, c)


def _choose_bb(b: int) -> int:
    for bb in (4, 2, 1):
        if b % bb == 0:
            return bb
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads, scale):
    return _fused_fwd_impl(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
                           num_heads, scale)


def _fused_fwd_impl(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads, scale, interpret=False):
    b, s, c = x.shape
    d = c // num_heads
    s_pad = -(-s // 8) * 8
    if s_pad != s:
        x_in = jnp.pad(x, [(0, 0), (0, s_pad - s), (0, 0)])
    else:
        x_in = x
    bb = _choose_bb(b)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, num_heads=num_heads, head_dim=d, s_valid=s, scale=scale
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, s_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const((c,)),
            const((c,)),
            const((c, 3 * c)),
            const((3 * c,)),
            const((c, c)),
            const((c,)),
        ],
        out_specs=pl.BlockSpec(
            (bb, s_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((bb * s_pad, c), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s_pad * c * (4 * c) + 4 * b * num_heads * s_pad * s_pad * d,
            bytes_accessed=2 * b * s_pad * c * x.dtype.itemsize,
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
        interpret=interpret,
    )(
        x_in,
        ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
        wqkv.astype(x.dtype),
        bqkv.astype(jnp.float32),
        wout.astype(x.dtype),
        bout.astype(jnp.float32),
    )
    return out[:, :s]


def _fused_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads, scale):
    out = _fused_fwd_impl(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
                          num_heads, scale)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wout, bout)


def _fused_bwd(num_heads, scale, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wout, bout = res
    _, vjp = jax.vjp(
        lambda *a: _reference_impl(*a, num_heads, scale),
        x, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention_block(
    x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, *, num_heads: int, scale: float
):
    """x + out_proj(MHA(LN(x))) in one kernel on TPU; XLA elsewhere."""
    if jax.default_backend() not in ("tpu", "axon"):
        return _reference_impl(
            x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads, scale
        )
    return _fused(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads, scale)


# ---------------------------------------------------------------------------
# Fused MLP sub-block: LN2 -> fc1 -> QuickGELU -> fc2 -> (+adapter) -> residual
# ---------------------------------------------------------------------------


def _mlp_reference_impl(x, ln_scale, ln_bias, w1, b1, w2, b2):
    f32 = jnp.float32
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    t = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)) * ln_scale + ln_bias
    t = t.astype(x.dtype)
    h = t @ w1.astype(x.dtype) + b1.astype(x.dtype)
    g = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)
    return x + g @ w2.astype(x.dtype) + b2.astype(x.dtype)


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    f32 = jnp.float32
    x = x_ref[...]
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    t = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)) * lns_ref[...] + lnb_ref[...]
    h = jnp.dot(t.astype(x.dtype), w1_ref[...], preferred_element_type=f32) + b1_ref[...]
    g = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)
    y = jnp.dot(g, w2_ref[...], preferred_element_type=f32) + b2_ref[...]
    o_ref[...] = (xf + y).astype(o_ref.dtype)


def fused_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2, block_rows: int = 512,
                    interpret: bool = False):
    """x + fc2(qgelu(fc1(LN(x)))) in one kernel; the (M, 4C) hidden stays in
    VMEM.  Forward/inference only (rows are flattened tokens, so any leading
    shape works).  Falls back to XLA off-TPU."""
    if jax.default_backend() not in ("tpu", "axon") and not interpret:
        return _mlp_reference_impl(x, ln_scale, ln_bias, w1, b1, w2, b2)
    orig_shape = x.shape
    c = orig_shape[-1]
    f = w1.shape[-1]
    xm = x.reshape(-1, c)
    m = xm.shape[0]
    bm = block_rows
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        xm = jnp.pad(xm, [(0, m_pad - m), (0, 0)])
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _mlp_kernel,
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const((c,)), const((c,)), const((c, f)), const((f,)),
            const((f, c)), const((c,)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * c * f,
            bytes_accessed=2 * m_pad * c * x.dtype.itemsize,
            transcendentals=m_pad * f,
        ),
        interpret=interpret,
    )(
        xm,
        ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
        w1.astype(x.dtype),
        b1.astype(jnp.float32),
        w2.astype(x.dtype),
        b2.astype(jnp.float32),
    )
    return out[:m].reshape(orig_shape)
