"""Fully-fused attention sub-block Pallas kernel (training-capable).

Fuses LN1 -> qkv GEMM -> multi-head attention -> out-projection -> residual
for the CLIP/ViT block into ONE kernel: the LN output and every attention
intermediate stay in VMEM.  Weights ride constant-index BlockSpecs so Mosaic
keeps them VMEM-resident across grid steps; each grid step processes BB whole
samples, with the qkv/out projections done as one (BB*S, C) GEMM and the
per-head attention as sample-batched 3-D `dot_general`s (same structure as
ops/packed_attention.py).

For training, the kernel additionally emits the packed qkv and the attention
output as residuals, so the custom VJP's backward needs no forward
recomputation: it is the standard chain (out-proj grads, the packed-attention
Pallas backward, qkv-projection grads, LayerNorm backward) — gradients are
exactly those of the unfused path.

The fused MLP sub-block (LN2+fc1+QuickGELU+fc2+residual) remains
inference-only: its training backward needs the (M, 4C) hidden either saved
(HBM write that cancels the fusion win) or recomputed (costs more than it
saves) — measured on v5e, the unfused MLP already runs at its GEMM roofline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed_attention import packed_self_attention

_NEG_INF = -1e30


def _layernorm_f32(x, scale, bias, eps=1e-5):
    f32 = jnp.float32
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)) * scale + bias


def _reference_impl(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads, scale):
    """Unfused XLA implementation (off-TPU fallback; same math)."""
    t = _layernorm_f32(x, ln_scale, ln_bias).astype(x.dtype)
    qkv = t @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    o = packed_self_attention(qkv, num_heads, scale)
    return x + o @ wout.astype(x.dtype) + bout.astype(x.dtype)


def _fwd_kernel_core(
    x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    o_ref, qkv_ref, attn_ref, p_ref,
    *, num_heads, head_dim, s_valid, scale,
):
    """qkv_ref/attn_ref/p_ref are None in inference mode — their writes are
    residuals only the training backward reads (~237 MB/layer of dead
    stores otherwise)."""
    f32 = jnp.float32
    bb, s_pad, c = x_ref.shape
    d = head_dim
    x = x_ref[...].reshape(bb * s_pad, c)
    t = _layernorm_f32(x, lns_ref[...], lnb_ref[...])
    qkv = (
        jnp.dot(t.astype(x.dtype), wqkv_ref[...], preferred_element_type=f32)
        + bqkv_ref[...]
    ).astype(x.dtype)
    qkv3 = qkv.reshape(bb, s_pad, 3 * c)
    if qkv_ref is not None:
        qkv_ref[...] = qkv3

    # Heads ride the dot_general batch dim (concat along the leading axis —
    # see packed_attention._stack_heads): 12x2 tiny matmuls -> 2 batched.
    from .packed_attention import _stack_heads

    qh = _stack_heads(qkv3, 0, num_heads, d)  # (H*BB, S, D)
    kh = _stack_heads(qkv3, c, num_heads, d)
    vh = _stack_heads(qkv3, 2 * c, num_heads, d)
    key_ids = jax.lax.broadcasted_iota(
        jnp.int32, (num_heads * bb, s_pad, s_pad), 2
    )
    kmask = key_ids < s_valid
    s = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )
    s = jnp.where(kmask, s * scale, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    pu = jnp.exp(s - m)
    denom = jnp.sum(pu, axis=-1, keepdims=True) + 1e-30
    pb = (pu / denom).astype(x.dtype)
    if p_ref is not None:
        # Normalized probs saved for the backward: skips the QK recompute
        # matmul and the exp/max/sum there.  Layout is the program-private
        # head-concat (H*bb rows per program, head-major) — the bwd kernel
        # reads it back with the same bb, so it never needs translating.
        p_ref[...] = pb
    ov = jax.lax.dot_general(
        pb, vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
    )
    attn = jnp.concatenate(
        [ov[i * bb : (i + 1) * bb] for i in range(num_heads)], axis=-1
    ).astype(x.dtype)
    if attn_ref is not None:
        attn_ref[...] = attn

    y = (
        jnp.dot(
            attn.reshape(bb * s_pad, c), wout_ref[...],
            preferred_element_type=f32,
        )
        + bout_ref[...]
    ).astype(x.dtype)
    o_ref[...] = (x + y).reshape(bb, s_pad, c)


def _fwd_kernel(
    x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    o_ref, qkv_ref, attn_ref, p_ref, **kw,
):
    _fwd_kernel_core(
        x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
        o_ref, qkv_ref, attn_ref, p_ref, **kw,
    )


def _fwd_kernel_infer(
    x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    o_ref, **kw,
):
    _fwd_kernel_core(
        x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
        o_ref, None, None, None, **kw,
    )


# bb policy MUST be the single shared one: the forward saves probs in a
# program-private head-concat row layout (H*bb rows per program) that
# packed_attention._packed_bwd_saved re-reads with ITS bb choice. Two
# divergent policies silently corrupt gradients (e.g. b=12: (8,2,1) picks 2,
# (8,4,2,1) picks 4). See tests/test_pallas_kernels.py (b=12 grad test).
from .packed_attention import _choose_bb


def _fused_fwd_impl(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads,
                    scale, interpret=False):
    b, s, c = x.shape
    d = c // num_heads
    s_pad = -(-s // 8) * 8
    x_in = jnp.pad(x, [(0, 0), (0, s_pad - s), (0, 0)]) if s_pad != s else x
    # bb MUST match _packed_bwd_padded's choice: the saved-probs tensor uses
    # a program-private head-concat row layout (H*bb rows per program).
    bb = _choose_bb(b, 8)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    blk = lambda ch: pl.BlockSpec(
        (bb, s_pad, ch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    pblk = pl.BlockSpec(
        (num_heads * bb, s_pad, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out, qkv, attn, probs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, num_heads=num_heads, head_dim=d, s_valid=s, scale=scale
        ),
        grid=(b // bb,),
        in_specs=[
            blk(c), const((c,)), const((c,)), const((c, 3 * c)),
            const((3 * c,)), const((c, c)), const((c,)),
        ],
        out_specs=(blk(c), blk(3 * c), blk(c), pblk),
        out_shape=(
            jax.ShapeDtypeStruct((b, s_pad, c), x.dtype),
            jax.ShapeDtypeStruct((b, s_pad, 3 * c), x.dtype),
            jax.ShapeDtypeStruct((b, s_pad, c), x.dtype),
            jax.ShapeDtypeStruct((num_heads * b, s_pad, s_pad), x.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s_pad * c * (4 * c) + 4 * b * num_heads * s_pad * s_pad * d,
            bytes_accessed=6 * b * s_pad * c * x.dtype.itemsize,
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
        # The head-batched attention intermediates need more than the 16 MiB
        # default scoped-VMEM budget at bb=8 (v5e has 128 MiB VMEM).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
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
    # out feeds the outer (unpadded) graph; qkv/attn/x_in/probs stay PADDED
    # for the backward — all pad/slice round-trips there are dead copies
    # (zero cotangent rows stay zero through every op; see _fused_bwd).
    return out[:, :s], qkv, attn, x_in, probs


def _fused_infer_impl(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads,
                      scale, interpret=False):
    """Inference-only: emits just the block output (no residual stores)."""
    b, s, c = x.shape
    d = c // num_heads
    s_pad = -(-s // 8) * 8
    x_in = jnp.pad(x, [(0, 0), (0, s_pad - s), (0, 0)]) if s_pad != s else x
    bb = _choose_bb(b, 8)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    blk = lambda ch: pl.BlockSpec(
        (bb, s_pad, ch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel_infer, num_heads=num_heads, head_dim=d, s_valid=s,
            scale=scale,
        ),
        grid=(b // bb,),
        in_specs=[
            blk(c), const((c,)), const((c,)), const((c, 3 * c)),
            const((3 * c,)), const((c, c)), const((c,)),
        ],
        out_specs=blk(c),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s_pad * c * (4 * c) + 4 * b * num_heads * s_pad * s_pad * d,
            bytes_accessed=2 * b * s_pad * c * x.dtype.itemsize,
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads, scale):
    # Primal-only call = inference: skip the residual stores entirely.
    return _fused_infer_impl(
        x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads, scale
    )


def _fused_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads, scale):
    out, qkv_p, attn_p, x_p, probs = _fused_fwd_impl(
        x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, num_heads, scale
    )
    return out, (x_p, qkv_p, attn_p, probs, ln_scale, ln_bias, wqkv, wout)


def _fused_bwd(num_heads, scale, res, g):
    """Exact chain-rule backward from saved residuals (no fwd recompute).

    Mirrors XLA's backward of the unfused path: out-proj grads, the
    packed-attention Pallas backward, qkv-projection grads, LN backward.

    Everything runs at the PADDED length: the incoming cotangent g is
    zero-padded once, and zero rows then stay zero through every op (do
    rows via the GEMM, dqkv query rows via dp=0 in the kernel, dqkv key
    rows via masked probs, LN backward via dt=0), so the padded rows
    contribute exactly nothing to any dW — no per-tensor pad/slice
    round-trips (they measured ~0.45 ms/layer).
    """
    x_p, qkv_p, attn_p, probs, ln_scale, ln_bias, wqkv, wout = res
    f32 = jnp.float32
    b, s_pad, c = x_p.shape
    s = g.shape[1]
    gp = jnp.pad(g, [(0, 0), (0, s_pad - s), (0, 0)]) if s_pad != s else g
    gm = gp.reshape(-1, c)

    # residual + out-projection (attn_p padded rows are garbage, but they
    # meet gp's zero rows in the row-contraction -> no contribution)
    do = gp @ wout.astype(g.dtype).T  # (B, S_pad, C), zero padded rows
    dwout = jnp.einsum(
        "mc,md->cd", attn_p.reshape(-1, c), gm, preferred_element_type=f32
    )
    dbout = jnp.sum(gm.astype(f32), axis=0)

    # t is recomputed from x via LN — one fused elementwise pass in XLA;
    # xhat/rstd are reused by the LayerNorm backward below.
    xf = x_p.astype(f32).reshape(-1, c)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (xf - mean) * rstd
    t = (xhat * ln_scale + ln_bias).astype(x_p.dtype)

    # attention core: the Pallas backward on TPU consumes the probs SAVED by
    # the forward kernel (no QK recompute, no exp); XLA autodiff elsewhere.
    # NOTE: a variant that also fuses the qkv-projection backward into the
    # kernel (_packed_bwd_fused_dw — dqkv never hits HBM, dW accumulated
    # across the grid) measures 561 vs 591 img/s: the in-kernel dW GEMMs
    # serialize against the attention matmuls, while XLA overlaps the
    # separate contractions — same failure mode as the fused-MLP residual
    # write (docs/PERF.md).  Kept + interpret-tested for the record.
    if jax.default_backend() in ("tpu", "axon"):
        from .packed_attention import _packed_bwd_saved_db

        # The kernel also accumulates db_qkv in-kernel: XLA lowered the
        # standalone sum as a convert_reduce_fusion RE-READING the 120 MB
        # dqkv from HBM (0.162 ms x 12 layers, trace_breakdown2.json).
        dqkv, dbqkv = _packed_bwd_saved_db(num_heads, scale, qkv_p, probs, do)
        dqkv_m = dqkv.reshape(-1, 3 * c)
        dt = (dqkv_m @ wqkv.astype(dqkv.dtype).T).reshape(b, s_pad, c)
        dwqkv = jnp.einsum("mc,md->cd", t, dqkv_m, preferred_element_type=f32)
    else:
        _, attn_vjp = jax.vjp(
            lambda q: packed_self_attention(q[:, :s], num_heads, scale), qkv_p
        )
        (dqkv,) = attn_vjp(do[:, :s])
        dqkv_m = dqkv.reshape(-1, 3 * c)
        dt = (dqkv_m @ wqkv.astype(dqkv.dtype).T).reshape(b, s_pad, c)
        dwqkv = jnp.einsum("mc,md->cd", t, dqkv_m, preferred_element_type=f32)
        dbqkv = jnp.sum(dqkv_m.astype(f32), axis=0)

    # LayerNorm backward (dt zero rows -> dx_ln zero rows)
    dtf = dt.astype(f32).reshape(-1, c)
    dscale = jnp.sum(dtf * xhat, axis=0)
    dbias = jnp.sum(dtf, axis=0)
    dxhat = dtf * ln_scale
    dx_ln = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    dx = g + dx_ln.reshape(b, s_pad, c)[:, :s].astype(g.dtype)
    return dx, dscale, dbias, dwqkv, dbqkv, dwout, dbout


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
# Fused MLP sub-block: LN2 -> fc1 -> QuickGELU -> fc2 -> residual (inference)
# ---------------------------------------------------------------------------


def _mlp_reference_impl(x, ln_scale, ln_bias, w1, b1, w2, b2):
    t = _layernorm_f32(x, ln_scale, ln_bias).astype(x.dtype)
    h = t @ w1.astype(x.dtype) + b1.astype(x.dtype)
    g = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)
    return x + g @ w2.astype(x.dtype) + b2.astype(x.dtype)


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, h_ref):
    f32 = jnp.float32
    x = x_ref[...]
    t = _layernorm_f32(x, lns_ref[...], lnb_ref[...])
    h = jnp.dot(t.astype(x.dtype), w1_ref[...], preferred_element_type=f32) + b1_ref[...]
    h_ref[...] = h.astype(h_ref.dtype)
    g = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)
    y = jnp.dot(g, w2_ref[...], preferred_element_type=f32) + b2_ref[...]
    o_ref[...] = (x.astype(f32) + y).astype(o_ref.dtype)


def _fused_mlp_fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, block_rows,
                        interpret):
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
    out, h = pl.pallas_call(
        _mlp_kernel,
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const((c,)), const((c,)), const((c, f)), const((f,)),
            const((f, c)), const((c,)),
        ],
        out_specs=(
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, c), x.dtype),
            jax.ShapeDtypeStruct((m_pad, f), x.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * c * f,
            bytes_accessed=2 * m_pad * c * x.dtype.itemsize,
            transcendentals=m_pad * f,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
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
    return out[:m].reshape(orig_shape), h[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, block_rows, interpret):
    out, _ = _fused_mlp_fwd_impl(
        x, ln_scale, ln_bias, w1, b1, w2, b2, block_rows, interpret
    )
    return out


def _fused_mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, block_rows, interpret):
    out, h = _fused_mlp_fwd_impl(
        x, ln_scale, ln_bias, w1, b1, w2, b2, block_rows, interpret
    )
    return out, (x, h, ln_scale, ln_bias, w1, w2)


def _fused_mlp_bwd(block_rows, interpret, res, g_out):
    """Exact chain backward; the ONLY saved tensor beyond x is the (M, 4C)
    pre-GELU hidden (compute dtype).  LN(x) and the GELU terms are recomputed
    elementwise (XLA fuses them into the GEMM epilogues); the GEMM chain is
    the standard 4-matmul MLP backward.
    """
    x, h, ln_scale, ln_bias, w1, w2 = res
    f32 = jnp.float32
    orig_shape = x.shape
    c = orig_shape[-1]
    dy = g_out.reshape(-1, c)
    m = dy.shape[0]

    hf = h.astype(f32)
    sig = jax.nn.sigmoid(1.702 * hf)
    gelu = (hf * sig).astype(x.dtype)               # (M, F)
    dgelu = sig * (1.0 + 1.702 * hf * (1.0 - sig))  # d qgelu / dh

    # fc2 backward
    dg = (dy @ w2.astype(dy.dtype).T).astype(f32)   # (M, F)
    dw2 = jnp.einsum("mf,mc->fc", gelu, dy, preferred_element_type=f32)
    db2 = jnp.sum(dy.astype(f32), axis=0)

    # GELU backward
    dh = (dg * dgelu).astype(x.dtype)               # (M, F)

    # fc1 backward (t recomputed from x via LN — one fused elementwise pass)
    xf = x.astype(f32).reshape(-1, c)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (xf - mean) * rstd
    t = (xhat * ln_scale + ln_bias).astype(x.dtype)
    dw1 = jnp.einsum("mc,mf->cf", t, dh, preferred_element_type=f32)
    db1 = jnp.sum(dh.astype(f32), axis=0)
    dt = dh @ w1.astype(dh.dtype).T                 # (M, C)

    # LayerNorm backward
    dtf = dt.astype(f32)
    dscale = jnp.sum(dtf * xhat, axis=0)
    dbias = jnp.sum(dtf, axis=0)
    dxhat = dtf * ln_scale
    dx_ln = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    dx = g_out + dx_ln.reshape(orig_shape).astype(g_out.dtype)
    return dx, dscale, dbias, dw1, db1, dw2, db2


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp_block(x, ln_scale, ln_bias, w1, b1, w2, b2, block_rows: int = 512,
                    interpret: bool = False):
    """x + fc2(qgelu(fc1(LN(x)))) in one kernel; the (M, 4C) hidden stays in
    VMEM during the forward and is the only extra residual saved for the
    backward (training-capable custom VJP — gradients are exactly those of
    the unfused chain).  Rows are flattened tokens, so any leading shape
    works.  Falls back to XLA off-TPU."""
    if jax.default_backend() not in ("tpu", "axon") and not interpret:
        return _mlp_reference_impl(x, ln_scale, ln_bias, w1, b1, w2, b2)
    return _fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, block_rows, interpret)
