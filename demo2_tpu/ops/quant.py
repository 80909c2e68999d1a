"""Int8-forward matmul with a bf16 backward (the sub-bf16 experiment).

Measured basis (tools/bench_int8gemm.py, docs/PERF.md round 3): the MXU's
int8 mode runs the model-shape GEMMs ~1.35x faster than bf16 PROVIDED the
requantization uses a precomputed scale — a dynamic max-abs pass erases the
gain.  This op quantizes the forward product only:

  * weights: per-output-channel scale from the CURRENT parameter values
    (one (K,N)->(N,) reduction per step — cheap, and exact for training
    where weights change every step);
  * activations: per-tensor scale.  ``static_act_scale`` uses a calibrated
    constant (fast path, matches "int8-static" in the bench); None falls
    back to a dynamic max-abs (the measured-slow path, kept for
    calibration runs).

Backward is untouched bf16: dx = g @ W^T and dW = x^T @ g use the ORIGINAL
unquantized tensors, so only forward activations see quantization noise —
the standard int8-forward training recipe; gradient int8 is known-unstable
and was ruled out by arithmetic anyway (PERF.md: even all-int8 fwd+bwd
cannot reach the 5x bar on this chip).

No reference counterpart: the reference trains fp16-AMP CUDA
(engine/processor.py:60-67); this is TPU-specific headroom exploration.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp


def _quant_per_channel(w: jnp.ndarray):
    """(K, N) -> int8 with per-output-channel scales (N,)."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s


@jax.custom_vjp
def int8_dense(x: jnp.ndarray, w: jnp.ndarray, act_scale: jnp.ndarray):
    """x: (..., K) activations; w: (K, N) weights; act_scale: () f32 scalar
    (pass 0.0 for dynamic per-tensor quantization)."""
    return _int8_dense_fwd(x, w, act_scale)[0]


def _int8_dense_fwd(x, w, act_scale):
    # act_scale == 0.0 selects the dynamic path (traced value -> lax.cond
    # would force both; a where on the scalar is enough and free).
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    dyn = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
    s = jnp.where(act_scale > 0, act_scale, dyn)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    wq, sw = _quant_per_channel(w)
    y32 = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = (y32.astype(jnp.float32) * (s * sw)).astype(x.dtype)
    y = y.reshape(*x.shape[:-1], w.shape[-1])
    return y, (x, w)


def _int8_dense_bwd(res, g):
    x, w = res
    k = x.shape[-1]
    g2 = g.reshape(-1, g.shape[-1])
    x2 = x.reshape(-1, k)
    dx = jax.lax.dot_general(
        g2, w.astype(g2.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=g2.dtype,
    ).reshape(x.shape)
    dw = jax.lax.dot_general(
        x2, g2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    return dx, dw, jnp.zeros((), jnp.float32)


int8_dense.defvjp(_int8_dense_fwd, _int8_dense_bwd)
