"""Packed-qkv fused self-attention Pallas kernel (zero-relayout path).

The backbone's MHA was dominated by layout churn: moving (B, S, H, D)
activations to head-major and back cost ~0.7 ms per relayout on v5e — more
than the attention math itself at 129 tokens.  This kernel consumes the qkv
projection's NATIVE packed layout (B, S, 3C) and produces the out-projection's
native input (B, S, C); per-head (S, D) tiles are sliced inside VMEM (64-lane
slices lower fine in Mosaic), so no HBM relayout exists anywhere in the
attention path.

Grid is (batch,); each program holds one (S_pad, 3C) block (~630 KB bf16) and
loops the 12 heads with 2-D MXU matmuls, fp32 softmax.  Padded key columns
are masked; padded query rows yield zeros (NaN-safe for the backward).

The custom VJP recomputes probabilities and writes packed d(qkv) — same
zero-relayout property in the backward pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _probs(qh, kh, scale, s_valid):
    s = jnp.dot(qh * scale, kh.T, preferred_element_type=jnp.float32)
    key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = key_ids < s_valid
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(mask, p, 0.0)
    return p / (jnp.sum(p, axis=-1, keepdims=True) + 1e-30)


def _fwd_kernel(qkv_ref, o_ref, *, num_heads, head_dim, s_valid, scale):
    c = num_heads * head_dim
    d = head_dim
    blk = qkv_ref[0]  # (S_pad, 3C)
    for i in range(num_heads):
        qh = blk[:, i * d : (i + 1) * d].astype(jnp.float32)
        kh = blk[:, c + i * d : c + (i + 1) * d].astype(jnp.float32)
        vh = blk[:, 2 * c + i * d : 2 * c + (i + 1) * d].astype(jnp.float32)
        p = _probs(qh, kh, scale, s_valid)
        o_ref[0, :, i * d : (i + 1) * d] = jnp.dot(
            p, vh, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, num_heads, head_dim, s_valid, scale):
    c = num_heads * head_dim
    d = head_dim
    blk = qkv_ref[0]
    for i in range(num_heads):
        qh = blk[:, i * d : (i + 1) * d].astype(jnp.float32)
        kh = blk[:, c + i * d : c + (i + 1) * d].astype(jnp.float32)
        vh = blk[:, 2 * c + i * d : 2 * c + (i + 1) * d].astype(jnp.float32)
        doh = do_ref[0, :, i * d : (i + 1) * d].astype(jnp.float32)
        p = _probs(qh, kh, scale, s_valid)
        dv = jnp.dot(p.T, doh, preferred_element_type=jnp.float32)
        dp = jnp.dot(doh, vh.T, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.dot(ds, kh, preferred_element_type=jnp.float32) * scale
        dk = jnp.dot(ds.T, qh, preferred_element_type=jnp.float32) * scale
        dqkv_ref[0, :, i * d : (i + 1) * d] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, c + i * d : c + (i + 1) * d] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * c + i * d : 2 * c + (i + 1) * d] = dv.astype(dqkv_ref.dtype)


def _pad_s(x, s_pad):
    s = x.shape[1]
    if s == s_pad:
        return x
    return jnp.pad(x, [(0, 0), (0, s_pad - s), (0, 0)])


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _packed(qkv, num_heads, scale):
    return _packed_fwd_impl(qkv, num_heads, scale)


def _packed_fwd_impl(qkv, num_heads, scale, interpret=False):
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    s_pad = -(-s // 8) * 8
    qkvp = _pad_s(qkv, s_pad)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, num_heads=num_heads, head_dim=d, s_valid=s, scale=scale
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s_pad, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, s_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, c), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s_pad * s_pad * d,
            bytes_accessed=(c3 + c) * b * s_pad * qkv.dtype.itemsize,
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qkvp)
    return out[:, :s]


def _packed_fwd(qkv, num_heads, scale):
    return _packed_fwd_impl(qkv, num_heads, scale), qkv


def _packed_bwd(num_heads, scale, qkv, g, interpret=False):
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    s_pad = -(-s // 8) * 8
    qkvp = _pad_s(qkv, s_pad)
    gp = _pad_s(g, s_pad)
    dqkv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, num_heads=num_heads, head_dim=d, s_valid=s, scale=scale
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s_pad, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, s_pad, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, c3), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * s_pad * s_pad * d,
            bytes_accessed=2 * (c3 + c) * b * s_pad * qkv.dtype.itemsize,
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qkvp, gp)
    return (dqkv[:, :s],)


_packed.defvjp(_packed_fwd, _packed_bwd)


def packed_self_attention(qkv: jnp.ndarray, num_heads: int, scale: float) -> jnp.ndarray:
    """Self-attention on packed (B, S, 3C) qkv -> (B, S, C).

    Head layout matches `reshape(B, S, H, D)` of each C-slice — i.e. the
    standard packed in_proj layout, so converted torch weights work as-is.
    Falls back to the XLA einsum path off-TPU.
    """
    b, s, c3 = qkv.shape
    c = c3 // 3
    if jax.default_backend() not in ("tpu", "axon"):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = c // num_heads
        q = q.reshape(b, s, num_heads, d)
        k = k.reshape(b, s, num_heads, d)
        v = v.reshape(b, s, num_heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, s, c)
    return _packed(qkv, num_heads, scale)
