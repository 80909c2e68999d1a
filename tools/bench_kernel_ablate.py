import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, C, H = 192, 136, 768, 12
DT = jnp.bfloat16
REP = 48
_NEG_INF = -1e30

def timeit(label, fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {(best-0.0239)/REP*1000:.3f} ms/iter", flush=True)

def make_kernel(mode, heads, bb=8):
    def kern(qkv_ref, o_ref):
        f32 = jnp.float32
        blk = qkv_ref[...]
        d = C // H
        key_ids = jax.lax.broadcasted_iota(jnp.int32, (bb, S, S), 2)
        kmask = key_ids < 129
        for i in range(heads):
            qh = blk[:, :, i*d:(i+1)*d]
            kh = blk[:, :, C+i*d:C+(i+1)*d]
            vh = blk[:, :, 2*C+i*d:2*C+(i+1)*d]
            if mode == "slice_only":
                o_ref[:, :, i*d:(i+1)*d] = (qh + kh + vh).astype(o_ref.dtype)
                continue
            s = jax.lax.dot_general(qh, kh, (((2,),(2,)),((0,),(0,))), preferred_element_type=f32)
            if mode == "scores_only":
                o_ref[:, :, i*d:(i+1)*d] = s[:, :, :d].astype(o_ref.dtype)
                continue
            if mode == "no_softmax":
                p = s * 0.01
                den = 1.0
            else:
                s = jnp.where(kmask, s * 0.125, _NEG_INF)
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                den = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
            o = jax.lax.dot_general(p.astype(blk.dtype), vh, (((2,),(1,)),((0,),(0,))), preferred_element_type=f32)
            o_ref[:, :, i*d:(i+1)*d] = (o / den).astype(o_ref.dtype)

    def call(qkv):
        return pl.pallas_call(
            kern,
            grid=(B // bb,),
            in_specs=[pl.BlockSpec((bb, S, 3*C), lambda i: (i,0,0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bb, S, C), lambda i: (i,0,0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, S, C), DT),
        )(qkv)

    @jax.jit
    def chain(qkv):
        def body(i, qkv):
            o = call(qkv)
            return jnp.concatenate([o, o, o], axis=-1)
        return jax.lax.fori_loop(0, REP, body, qkv)
    return chain

qkv0 = jnp.asarray(np.random.randn(B, S, 3*C) * 0.05, DT)
timeit("full h=12", make_kernel("full", 12), qkv0)
timeit("full h=4", make_kernel("full", 4), qkv0)
timeit("no_softmax h=12", make_kernel("no_softmax", 12), qkv0)
timeit("scores_only h=12", make_kernel("scores_only", 12), qkv0)
timeit("slice_only h=12", make_kernel("slice_only", 12), qkv0)
