"""Normalization layers with PyTorch-compatible semantics.

The reference relies on torch BatchNorm1d/2d in BNNecks (reference:
modeling/make_model.py:640-664), ATMoE experts (modeling/moe/AttnMOE.py:16,30)
and conv stacks (modeling/sacr.py, modeling/trimodal_lif.py).  Flax's
`nn.BatchNorm` differs from torch in two ways that matter for weight-porting
parity: torch updates the running variance with the *unbiased* batch variance,
and uses momentum 0.1 in the torch convention (new = (1-m)*old + m*batch).
This module reproduces torch exactly; statistics are accumulated in fp32.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class TorchBatchNorm(nn.Module):
    """BatchNorm over the last (feature) axis, torch semantics.

    Works for (B, C) inputs (BatchNorm1d) and (B, H, W, C) inputs
    (BatchNorm2d in NHWC layout).  Normalization uses the biased batch
    variance; running-var updates use the unbiased variance, matching torch.
    """

    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: Optional[Any] = None
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        dtype = self.dtype or x.dtype

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            # Centered form: E[(x-mean)^2].  The E[x^2]-E[x]^2 form can go
            # NEGATIVE under fused f32 reductions when |mean| >> std (the
            # hazard the LayerNorm below documents), NaN-ing rsqrt and
            # poisoning the running stats.
            var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
            n = 1
            for a in reduce_axes:
                n *= x.shape[a]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", self.scale_init, (features,), jnp.float32)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (features,), jnp.float32)
            y = y + bias
        return y.astype(dtype)


class BNNeck(nn.Module):
    """BNNeck: BatchNorm1d with a permanently-zero (frozen) bias.

    The reference freezes the BN bias at its zero init
    (`bottleneck.bias.requires_grad_(False)`, reference:
    modeling/make_model.py:644-646), which is equivalent to a bias-free BN.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        return TorchBatchNorm(use_bias=False, name="bn")(x, use_running_average)


class GroupNorm(nn.Module):
    """GroupNorm over (B, H, W, C), torch semantics (per-sample stats)."""

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y.reshape(b, h, w, c)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return ((y * scale) + bias).astype(x.dtype)


def choose_gn_groups(channels: int) -> int:
    """Largest group count <= 32 dividing C (reference: modeling/FRCA.py:26-31)."""
    for g in (32, 16, 8, 4, 2, 1):
        if channels % g == 0:
            return g
    return 1


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics (CLIP casts up; reference:
    clip/model.py:152-160).

    The reductions accumulate in fp32 via the reduction dtype WITHOUT
    materializing an fp32 copy of the activation — for bf16 inputs the
    normalize arithmetic stays in bf16 (f32 per-row scalars broadcast in),
    which is the standard mixed-precision LN and saves the 2x HBM traffic of
    fp32 intermediates on the training path.  For fp32 inputs the math is
    numerically equivalent to the previous full-fp32 form within 1 ulp (the
    d*(rstd*scale)+bias regrouping changes fp32 rounding; parity suite holds).
    """

    epsilon: float = 1e-5
    # Route the backward pass through the fused Pallas kernel (one HBM pass
    # producing dx + dscale + dbias, stats recomputed in-VMEM) instead of
    # XLA's two-fusion chain.  Perf experiment flag (TPU.PALLAS_LN_BWD);
    # the forward is the SAME jnp graph either way, only grads differ by
    # f32-accumulation rounding.
    pallas_bwd: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        if self.pallas_bwd:
            return layernorm_pallas_bwd(x, scale, bias, epsilon=self.epsilon)
        return _layernorm_fwd_expr(x, scale, bias, self.epsilon)


def _layernorm_fwd_expr(x, scale, bias, epsilon):
    """The LN forward expression shared by both backward routes."""
    dtype = x.dtype
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    d = x - mean.astype(dtype)
    # Centered two-pass variance (non-negative by construction — the
    # E[x^2]-E[x]^2 form can go negative under fused reductions and NaN
    # the rsqrt; see the SDTPS z-score incident).
    var = jnp.mean(jnp.square(d), axis=-1, keepdims=True, dtype=jnp.float32)
    rstd = jax.lax.rsqrt(var + epsilon)
    y = d * (rstd.astype(dtype) * scale.astype(dtype)) + bias.astype(dtype)
    return y


# --- Fused Pallas LayerNorm backward ------------------------------------
#
# Profiler round 4 (reports/trace_breakdown3.json): XLA lowers the unfused
# ln_2 backward as TWO separate fusions per layer — a multiply_reduce for
# (dscale, dbias) and an add_add for dx — each re-reading the (192,129,768)
# bf16 dy/xhat operands from HBM at ~372 GB/s (12 x 0.102 + 12 x 0.111 =
# 2.56 ms/step).  This kernel produces all three cotangents in ONE pass over
# (x, dy), recomputing mean/rstd from the x block already resident in VMEM
# (flash-attention-style recompute; residuals are just x and scale).  The
# (1, C) f32 dscale/dbias partial sums accumulate across the sequential
# TPU grid, same pattern as packed_attention._packed_bwd_saved_db.

_LN_BLOCK_ROWS = 256


def _ln_bwd_kernel(x_ref, dy_ref, g_ref, dx_ref, dg_ref, db_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)    # (R, C)
    dyf = dy_ref[...].astype(jnp.float32)  # (R, C)
    g = g_ref[...].astype(jnp.float32)     # (1, C)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    # Zero-padded tail rows stay exactly zero: dyf = 0 -> dyg/m1/m2 = 0 ->
    # dx = 0, and their dg/db contributions vanish (xf = 0 rows give
    # var = 0, rstd = 1/sqrt(eps) finite — no NaN).
    dyg = dyf * g
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dyg - m1 - xhat * m2)).astype(dx_ref.dtype)

    dg_blk = jnp.sum(dyf * xhat, axis=0, keepdims=True)  # (1, C)
    db_blk = jnp.sum(dyf, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dg_ref[...] += dg_blk
    db_ref[...] += db_blk


def _ln_bwd_call(x2, dy2, scale, eps, interpret):
    r, c = x2.shape
    rb = _LN_BLOCK_ROWS
    r_pad = -(-r // rb) * rb
    if r_pad != r:
        x2 = jnp.pad(x2, ((0, r_pad - r), (0, 0)))
        dy2 = jnp.pad(dy2, ((0, r_pad - r), (0, 0)))
    dx2, dg, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(r_pad // rb,),
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, c), dy2.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * r_pad * c,
            bytes_accessed=3 * r_pad * c * x2.dtype.itemsize,
            transcendentals=r_pad,
        ),
        interpret=interpret,
    )(x2, dy2, scale.reshape(1, c))
    return dx2[:r], dg[0], db[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_pallas(x, scale, bias, epsilon):
    return _layernorm_fwd_expr(x, scale, bias, epsilon)


def _ln_pallas_fwd(x, scale, bias, epsilon):
    return _layernorm_fwd_expr(x, scale, bias, epsilon), (x, scale)


def _ln_pallas_bwd(epsilon, res, dy):
    x, scale = res
    c = x.shape[-1]
    backend = jax.default_backend()
    interpret = backend not in ("tpu", "axon")
    if interpret and backend != "cpu":
        # ADVICE r4: on a non-TPU accelerator (e.g. GPU) this perf-only flag
        # would silently run the kernel INTERPRETED — warn loudly; CPU stays
        # quiet because that is the intentional test path.
        import warnings

        warnings.warn(
            f"TPU.PALLAS_LN_BWD requested on backend {backend!r}: the Mosaic "
            "kernel runs in interpret mode there (orders of magnitude "
            "slower). Disable the flag off-TPU.",
            RuntimeWarning,
            stacklevel=2,
        )
    dx2, dg, db = _ln_bwd_call(
        x.reshape(-1, c), dy.reshape(-1, c), scale, epsilon, interpret
    )
    return dx2.reshape(x.shape), dg, db


_ln_pallas.defvjp(_ln_pallas_fwd, _ln_pallas_bwd)


def layernorm_pallas_bwd(x, scale, bias, *, epsilon: float = 1e-5):
    """LayerNorm whose forward is the standard jnp graph (XLA fuses it as
    usual) and whose backward is the fused one-pass Pallas kernel above.
    Gradients match the autodiff chain to f32-accumulation rounding
    (tests/test_pallas_kernels.py::test_ln_pallas_bwd_matches_autodiff)."""
    return _ln_pallas(x, scale, bias, epsilon)
