"""Fused attention Pallas kernel for the ViT backbone hot path.

The backbone attends over short sequences (129 tokens per modality stream,
reference hot loop: modeling/clip/model.py:446-484), so a whole (S, S) score
matrix fits comfortably in VMEM.  The win over the XLA einsum path is purely
HBM traffic: probabilities never round-trip to HBM.  Grid is (batch, heads);
each program computes one head's softmax(q k^T) v entirely on-chip, with the
softmax in fp32.

A custom VJP recomputes the probabilities in the backward kernel
(flash-attention style) instead of saving them, trading FLOPs for HBM.

Layout: (B, S, H, D).  S is padded to a multiple of 8 by the wrapper; padded
key columns are masked inside the kernel, padded query rows produce zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _pad_seq(x, s_pad):
    s = x.shape[1]
    if s == s_pad:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, s_pad - s)
    return jnp.pad(x, pad)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, s_valid: int, scale: float):
    q = q_ref[0, :, 0, :].astype(jnp.float32) * scale  # (S, D)
    k = k_ref[0, :, 0, :].astype(jnp.float32)
    v = v_ref[0, :, 0, :].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (S, S)
    s_pad = q.shape[0]
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    mask = key_ids < s_valid
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(mask, p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
    p = p / denom
    o_ref[0, :, 0, :] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, s_valid, scale):
    q = q_ref[0, :, 0, :].astype(jnp.float32)
    k = k_ref[0, :, 0, :].astype(jnp.float32)
    v = v_ref[0, :, 0, :].astype(jnp.float32)
    do = do_ref[0, :, 0, :].astype(jnp.float32)
    s = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
    s_pad = q.shape[0]
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    mask = key_ids < s_valid
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(mask, p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
    p = p / denom
    dv = jnp.dot(p.T, do, preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * scale
    dq_ref[0, :, 0, :] = dq.astype(dq_ref.dtype)
    dk_ref[0, :, 0, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, :, 0, :] = dv.astype(dv_ref.dtype)


def _spec(s_pad, d):
    return pl.BlockSpec(
        (1, s_pad, 1, d), lambda b, h: (b, 0, h, 0), memory_space=pltpu.VMEM
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale)


def _flash_fwd_impl(q, k, v, scale):
    b, s, h, d = q.shape
    s_pad = -(-s // 8) * 8
    qp, kp, vp = (_pad_seq(x, s_pad) for x in (q, k, v))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, s_valid=s, scale=scale),
        grid=(b, h),
        in_specs=[_spec(s_pad, d)] * 3,
        out_specs=_spec(s_pad, d),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, h, d), q.dtype),
    )(qp, kp, vp)
    return out[:, :s]


def _flash_fwd(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    q, k, v = res
    b, s, h, d = q.shape
    s_pad = -(-s // 8) * 8
    qp, kp, vp, gp = (_pad_seq(x, s_pad) for x in (q, k, v, g))
    shape = jax.ShapeDtypeStruct((b, s_pad, h, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, s_valid=s, scale=scale),
        grid=(b, h),
        in_specs=[_spec(s_pad, d)] * 4,
        out_specs=[_spec(s_pad, d)] * 3,
        out_shape=[shape, shape, shape],
    )(qp, kp, vp, gp)
    return dq[:, :s], dk[:, :s], dv[:, :s]


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, *, scale: float):
    """Fused attention on (B, S, H, D); falls back to XLA off-TPU."""
    if jax.default_backend() not in ("tpu", "axon"):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return _flash(q, k, v, scale)
