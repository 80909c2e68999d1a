"""Packed-qkv fused self-attention Pallas kernel (zero-relayout path).

The backbone's MHA was dominated by layout churn: moving (B, S, H, D)
activations to head-major and back cost ~0.7 ms per relayout on v5e — more
than the attention math itself at 129 tokens.  This kernel consumes the qkv
projection's NATIVE packed layout (B, S, 3C) and produces the out-projection's
native input (B, S, C); per-head (S, D) tiles are sliced inside VMEM (64-lane
slices lower fine in Mosaic), so no HBM relayout exists anywhere in the
attention path.

Grid is (B / BB,): each program holds BB whole samples and runs every head
as ONE batched 3-D `dot_general` over the sample axis — at 129 tokens a
single-sample (S, D) matmul starves the 128x128 MXU and per-program overhead
dominates (measured ~6 us/program on v5e); batching samples into the matmul
batch dim cut the kernel from ~1.2 ms to ~0.2 ms per layer at batch 192.

Padded key columns are masked; padded query rows yield zeros (NaN-safe for
the backward).  The custom VJP recomputes probabilities and writes packed
d(qkv) — same zero-relayout, sample-batched structure in the backward pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _unnorm_probs(qh, kh, scale, kmask):
    """qh, kh: (BB, S, D) bf16 -> (unnormalized probs f32, row-sum f32).

    bf16 operands feed the MXU directly with an fp32 accumulator; the softmax
    itself stays fp32.  Masked columns get -inf BEFORE exp, so exp underflows
    to exactly 0 and no second masking pass is needed; normalization is
    deferred to after the PV matmul (divides (BB,S,D) instead of (BB,S,S)).
    """
    s = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = jnp.where(kmask, s * scale, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p, jnp.sum(p, axis=-1, keepdims=True) + 1e-30


def _fwd_kernel(qkv_ref, o_ref, *, num_heads, head_dim, s_valid, scale):
    c = num_heads * head_dim
    d = head_dim
    f32 = jnp.float32
    blk = qkv_ref[...]  # (BB, S_pad, 3C)
    bb, s_pad, _ = blk.shape
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (bb, s_pad, s_pad), 2)
    kmask = key_ids < s_valid
    for i in range(num_heads):
        qh = blk[:, :, i * d : (i + 1) * d]
        kh = blk[:, :, c + i * d : c + (i + 1) * d]
        vh = blk[:, :, 2 * c + i * d : 2 * c + (i + 1) * d]
        p, denom = _unnorm_probs(qh, kh, scale, kmask)
        # p in the compute dtype for the PV matmul — the same rounding the
        # XLA fallback applies (p.astype(v.dtype)); fp32 MXU would run at
        # 1/8 rate for no parity gain.
        o = jax.lax.dot_general(
            p.astype(blk.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        o_ref[:, :, i * d : (i + 1) * d] = (o / denom).astype(o_ref.dtype)


def _stack_heads(t, base, num_heads, head_dim):
    """(BB, S, C)-slices -> (H*BB, S, D) via concat along the BATCH axis.

    This is the one head-batching form this Mosaic toolchain lowers (4-D
    transposes, multi-batch dot_general and (BB,H,S,D)->(BB*H,S,D) shape
    casts all fail): 64-lane slices moved to lane offset 0 and stacked on
    the leading dim.  It turns num_heads x 5 tiny matmuls into 5 batched
    ones — per-matmul overhead (~2 us each) dominated the per-head loop.
    """
    d = head_dim
    return jnp.concatenate(
        [t[:, :, base + i * d : base + (i + 1) * d] for i in range(num_heads)],
        axis=0,
    )


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, num_heads, head_dim, s_valid, scale):
    c = num_heads * head_dim
    d = head_dim
    h = num_heads
    f32 = jnp.float32
    blk = qkv_ref[...]
    bb, s_pad, _ = blk.shape
    qh = _stack_heads(blk, 0, h, d)  # (H*BB, S, D)
    kh = _stack_heads(blk, c, h, d)
    vh = _stack_heads(blk, 2 * c, h, d)
    doh = _stack_heads(do_ref[...], 0, h, d)

    key_ids = jax.lax.broadcasted_iota(jnp.int32, (h * bb, s_pad, s_pad), 2)
    kmask = key_ids < s_valid
    batch01 = lambda a, b, ca, cb: jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))), preferred_element_type=f32
    )
    pu, denom = _unnorm_probs(qh, kh, scale, kmask)
    p = pu / denom
    pb = p.astype(blk.dtype)
    # dv[b] = p[b]^T @ do[b]; dp[b] = do[b] @ v[b]^T
    dv = batch01(pb, doh, 1, 1)  # (H*BB, S_k, D)
    dp = batch01(doh, vh, 2, 2)  # (H*BB, S_q, S_k)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = ds.astype(blk.dtype)
    dq = batch01(dsb, kh, 2, 1) * scale  # (H*BB, S_q, D)
    dk = batch01(dsb, qh, 1, 1) * scale  # (H*BB, S_k, D)
    for i in range(h):
        s0, s1 = i * bb, (i + 1) * bb
        dqkv_ref[:, :, i * d : (i + 1) * d] = dq[s0:s1].astype(dqkv_ref.dtype)
        dqkv_ref[:, :, c + i * d : c + (i + 1) * d] = dk[s0:s1].astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * c + i * d : 2 * c + (i + 1) * d] = dv[s0:s1].astype(
            dqkv_ref.dtype
        )


def _pad_s(x, s_pad):
    s = x.shape[1]
    if s == s_pad:
        return x
    return jnp.pad(x, [(0, 0), (0, s_pad - s), (0, 0)])


def _choose_bb(b: int, limit: int) -> int:
    for bb in (8, 4, 2, 1):
        if bb <= limit and b % bb == 0:
            return bb
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _packed(qkv, num_heads, scale):
    return _packed_fwd_impl(qkv, num_heads, scale)


def _packed_fwd_impl(qkv, num_heads, scale, interpret=False):
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    s_pad = -(-s // 8) * 8
    qkvp = _pad_s(qkv, s_pad)
    bb = _choose_bb(b, 8)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, num_heads=num_heads, head_dim=d, s_valid=s, scale=scale
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, s_pad, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (bb, s_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
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


def _packed_bwd_padded(num_heads, scale, qkvp, gp, s_valid, interpret=False):
    """Backward on ALREADY-padded (B, S_pad, .) tensors; returns padded dqkv.

    Padded rows of the result are exactly zero provided gp's padded rows are
    zero (dp=0 kills dq; masked probs kill dk/dv), so callers can feed the
    padded dqkv straight into dW contractions with no slice.
    """
    b, s_pad, c3 = qkvp.shape
    c = c3 // 3
    d = c // num_heads
    s = s_valid
    # bb=8 halves the program count (per-program overhead dominates the tiny
    # per-head matmuls); needs the raised scoped-VMEM budget — the working
    # set is (4 + 4/3) * bb * S * C * 2 bytes doubled under pipeline
    # buffering, ~16 KiB over the 16 MiB default at bb=8 (v5e has 128 MiB).
    bb = _choose_bb(b, 8)
    dqkv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, num_heads=num_heads, head_dim=d, s_valid=s, scale=scale
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, s_pad, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, s_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, s_pad, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, c3), qkvp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * s_pad * s_pad * d,
            bytes_accessed=2 * (c3 + c) * b * s_pad * qkvp.dtype.itemsize,
            transcendentals=b * num_heads * s_pad * s_pad,
        ),
        # Head-batching makes the f32 (H*BB, S, S) intermediates ~7 MB each;
        # bb=8 runs ~1 MB past the 64 MiB scoped budget (v5e VMEM is 128 MiB).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(qkvp, gp)
    return dqkv


def _packed_bwd(num_heads, scale, qkv, g, interpret=False):
    b, s, c3 = qkv.shape
    s_pad = -(-s // 8) * 8
    dqkv = _packed_bwd_padded(
        num_heads, scale, _pad_s(qkv, s_pad), _pad_s(g, s_pad), s,
        interpret=interpret,
    )
    return (dqkv[:, :s],)


def _bwd_saved_kernel(qkv_ref, p_ref, do_ref, dqkv_ref, *, num_heads, head_dim,
                      scale):
    """Backward from SAVED normalized probs: no QK recompute, no exp."""
    c = num_heads * head_dim
    d = head_dim
    h = num_heads
    f32 = jnp.float32
    blk = qkv_ref[...]
    bb, s_pad, _ = blk.shape
    kh = _stack_heads(blk, c, h, d)
    vh = _stack_heads(blk, 2 * c, h, d)
    doh = _stack_heads(do_ref[...], 0, h, d)
    pb = p_ref[...]  # (H*BB, S, S), already normalized, head-concat layout
    p = pb.astype(f32)

    batch01 = lambda a, b, ca, cb: jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))), preferred_element_type=f32
    )
    dv = batch01(pb, doh, 1, 1)  # (H*BB, S_k, D)
    dp = batch01(doh, vh, 2, 2)  # (H*BB, S_q, S_k)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = ds.astype(blk.dtype)
    dq = batch01(dsb, kh, 2, 1) * scale
    dk = batch01(dsb, _stack_heads(blk, 0, h, d), 1, 1) * scale
    for i in range(h):
        s0, s1 = i * bb, (i + 1) * bb
        dqkv_ref[:, :, i * d : (i + 1) * d] = dq[s0:s1].astype(dqkv_ref.dtype)
        dqkv_ref[:, :, c + i * d : c + (i + 1) * d] = dk[s0:s1].astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * c + i * d : 2 * c + (i + 1) * d] = dv[s0:s1].astype(
            dqkv_ref.dtype
        )


def _bwd_saved_db_kernel(qkv_ref, p_ref, do_ref, dqkv_ref, db_ref, *,
                         num_heads, head_dim, scale):
    """_bwd_saved_kernel + in-kernel qkv-bias-grad accumulation.

    The profiler trace (reports/trace_breakdown2.json) showed XLA lowering
    db_qkv = sum(dqkv, axis=(0,1)) as a standalone convert_reduce_fusion
    that RE-READS the full (B, S_pad, 3C) dqkv cotangent from HBM —
    0.162 ms x 12 layers = 1.95 ms/step of pure bandwidth at flagship
    shapes.  dq/dk/dv are already live in VMEM here, so the column sums
    are a few VPU reduces; the partial sums accumulate into a revisited
    f32 (3H, D) output block across the sequential grid (reshaped to
    (3C,) by the caller).  Values match XLA's reduce operand exactly
    (summing the bf16-rounded dqkv in f32); only the accumulation order
    differs.  The dW/dt GEMMs deliberately STAY in XLA — fusing them
    in-kernel was measured-rejected (_packed_bwd_fused_dw, docs/PERF.md).
    """
    c = num_heads * head_dim
    d = head_dim
    h = num_heads
    f32 = jnp.float32
    blk = qkv_ref[...]
    bb, s_pad, _ = blk.shape
    kh = _stack_heads(blk, c, h, d)
    vh = _stack_heads(blk, 2 * c, h, d)
    doh = _stack_heads(do_ref[...], 0, h, d)
    pb = p_ref[...]
    p = pb.astype(f32)

    batch01 = lambda a, b, ca, cb: jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))), preferred_element_type=f32
    )
    dv = batch01(pb, doh, 1, 1)  # (H*BB, S_k, D)
    dp = batch01(doh, vh, 2, 2)  # (H*BB, S_q, S_k)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = ds.astype(blk.dtype)
    dq = batch01(dsb, kh, 2, 1) * scale
    dk = batch01(dsb, _stack_heads(blk, 0, h, d), 1, 1) * scale
    out_dt = dqkv_ref.dtype
    for i in range(h):
        s0, s1 = i * bb, (i + 1) * bb
        dqkv_ref[:, :, i * d : (i + 1) * d] = dq[s0:s1].astype(out_dt)
        dqkv_ref[:, :, c + i * d : c + (i + 1) * d] = dk[s0:s1].astype(out_dt)
        dqkv_ref[:, :, 2 * c + i * d : 2 * c + (i + 1) * d] = dv[s0:s1].astype(
            out_dt
        )

    # Per-head column sums in the dqkv section order (q heads, k heads,
    # v heads) -> (3H, D).  Round-trip through the output dtype first so
    # the summed values are bit-identical to XLA's reduce over dqkv.
    db_parts = [
        t.astype(out_dt).astype(f32).reshape(h, bb, s_pad, d).sum(axis=(1, 2))
        for t in (dq, dk, dv)
    ]  # 3 x (H, D)
    db_blk = jnp.concatenate(db_parts, axis=0)  # (3H, D)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        db_ref[...] = jnp.zeros_like(db_ref)

    db_ref[...] += db_blk


def _packed_bwd_saved_db(num_heads, scale, qkvp, probs, gp, interpret=False):
    """_packed_bwd_saved that ALSO returns db_qkv = sum(dqkv, axis=(0,1)).

    Returns (dqkv (B, S_pad, 3C), db (3C,) f32).  Padded-row zeroing is
    inherited from _packed_bwd_saved (zero gp rows / masked probs make all
    padded dqkv rows zero), so the sums over S_pad equal sums over valid S.
    """
    b, s_pad, c3 = qkvp.shape
    c = c3 // 3
    d = c // num_heads
    h = num_heads
    bb = _choose_bb(b, 8)
    dqkv, db = pl.pallas_call(
        functools.partial(
            _bwd_saved_db_kernel, num_heads=num_heads, head_dim=d, scale=scale
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, s_pad, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_heads * bb, s_pad, s_pad),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((bb, s_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (bb, s_pad, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((3 * h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s_pad, c3), qkvp.dtype),
            jax.ShapeDtypeStruct((3 * h, d), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * num_heads * s_pad * s_pad * d,
            bytes_accessed=(
                2 * (c3 + c) * b * s_pad + num_heads * b * s_pad * s_pad
            )
            * qkvp.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(qkvp, probs, gp)
    # (3H, D) row-major == the (3C,) packed-qkv bias layout.
    return dqkv, db.reshape(c3)


def _bwd_fused_dw_kernel(
    qkv_ref, p_ref, do_ref, t_ref, wqkv_ref,
    dt_ref, dwqkv_ref, dbqkv_ref,
    *, num_heads, head_dim, scale,
):
    """Saved-probs attention backward FUSED with the qkv-projection backward.

    dqkv stays in VMEM (never hits HBM): the kernel immediately contracts it
    into dW_qkv / db_qkv (f32 accumulators revisited across the sequential
    TPU grid) and projects dt = dqkv @ W_qkv^T for the LayerNorm backward
    outside.  Saves the (B, S, 3C) dqkv round-trip (~340 MB of HBM traffic
    per layer at flagship shapes).
    """
    c = num_heads * head_dim
    d = head_dim
    h = num_heads
    f32 = jnp.float32
    blk = qkv_ref[...]
    bb, s_pad, _ = blk.shape
    kh = _stack_heads(blk, c, h, d)
    vh = _stack_heads(blk, 2 * c, h, d)
    doh = _stack_heads(do_ref[...], 0, h, d)
    pb = p_ref[...]
    p = pb.astype(f32)

    batch01 = lambda a, b, ca, cb: jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))), preferred_element_type=f32
    )
    dv = batch01(pb, doh, 1, 1)
    dp = batch01(doh, vh, 2, 2)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = ds.astype(blk.dtype)
    dq = batch01(dsb, kh, 2, 1) * scale
    dk = batch01(dsb, _stack_heads(blk, 0, h, d), 1, 1) * scale

    # Assemble dqkv in VMEM only.
    parts = []
    for tensor in (dq, dk, dv):
        parts.extend(
            tensor[i * bb : (i + 1) * bb].astype(blk.dtype) for i in range(h)
        )
    # concat head slices back to (bb, s_pad, 3C): order q heads, k heads, v heads
    dqkv = jnp.concatenate(parts, axis=-1)

    m = bb * s_pad
    dqkv_m = dqkv.reshape(m, 3 * c)
    t = t_ref[...].reshape(m, c)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)

    dwqkv_ref[...] += jax.lax.dot_general(
        t, dqkv_m, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    dbqkv_ref[...] += jnp.sum(dqkv_m.astype(f32), axis=0, keepdims=True)
    dt = jax.lax.dot_general(
        dqkv_m, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    dt_ref[...] = dt.reshape(bb, s_pad, c).astype(dt_ref.dtype)


def _packed_bwd_fused_dw(num_heads, scale, qkvp, probs, do, t, wqkv,
                         interpret=False):
    """Returns (dt, dwqkv, dbqkv) with dqkv kept entirely in VMEM.

    `do` is the attention-output cotangent (zero padded rows), `t` the LN
    output (the qkv projection's input), `wqkv` the packed (C, 3C)
    projection kernel.  Padded-row zeroing as in _packed_bwd_saved — zero
    do rows make every padded dqkv row zero, so dW sees nothing.
    """
    b, s_pad, c3 = qkvp.shape
    c = c3 // 3
    d = c // num_heads
    bb = _choose_bb(b, 8)
    dt, dwqkv, dbqkv = pl.pallas_call(
        functools.partial(
            _bwd_fused_dw_kernel, num_heads=num_heads, head_dim=d, scale=scale
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, s_pad, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_heads * bb, s_pad, s_pad),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((bb, s_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, s_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, s_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, s_pad, c), qkvp.dtype),
            jax.ShapeDtypeStruct((c, c3), jnp.float32),
            jax.ShapeDtypeStruct((1, c3), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(8 * b * num_heads * s_pad * s_pad * d
                   + 4 * b * s_pad * c * 3 * c),
            bytes_accessed=(
                (c3 + 3 * c) * b * s_pad + num_heads * b * s_pad * s_pad
            )
            * qkvp.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkvp, probs, do, t, wqkv.astype(qkvp.dtype))
    return dt, dwqkv, dbqkv[0]


def _packed_bwd_saved(num_heads, scale, qkvp, probs, gp, interpret=False):
    """Backward on padded tensors with saved probs (from the fused fwd).

    `probs` layout matches the fused forward's program-private head-concat
    (H*bb rows per program, same bb policy) — both sides use _choose_bb(b, 8)
    so the block row mapping is identical.  Padded-row zeroing follows the
    same argument as _packed_bwd_padded: zero gp rows give dp=0 -> ds=0 ->
    dq=0; saved probs have masked (zero) padded-key columns -> dk=dv=0.
    """
    b, s_pad, c3 = qkvp.shape
    c = c3 // 3
    d = c // num_heads
    bb = _choose_bb(b, 8)
    dqkv = pl.pallas_call(
        functools.partial(
            _bwd_saved_kernel, num_heads=num_heads, head_dim=d, scale=scale
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, s_pad, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_heads * bb, s_pad, s_pad),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((bb, s_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, s_pad, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, c3), qkvp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * num_heads * s_pad * s_pad * d,
            bytes_accessed=(
                2 * (c3 + c) * b * s_pad + num_heads * b * s_pad * s_pad
            )
            * qkvp.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(qkvp, probs, gp)
    return dqkv


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
