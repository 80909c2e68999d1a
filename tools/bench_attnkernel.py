"""Isolate packed attention kernel cost at different BB, vs XLA attention."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time, functools
import jax, jax.numpy as jnp
import numpy as np
import demo2_tpu.ops.packed_attention as pa

B, S, C, H = 192, 129, 768, 12
DT = jnp.bfloat16
REP = 48

def timeit(label, fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {(best - 0.0239)/REP*1000:.3f} ms/iter (raw {best*1000:.1f} ms)", flush=True)

qkv0 = jnp.asarray(np.random.randn(B, S, 3 * C) * 0.05, DT)
scale = (C // H) ** -0.5

def make_chain(bb):
    def chain(qkv):
        def body(i, qkv):
            orig = pa._choose_bb
            o = pa._packed_fwd_impl(qkv, H, scale)
            return jnp.concatenate([o, o, o], axis=-1)
        return jax.lax.fori_loop(0, REP, body, qkv)
    return jax.jit(chain)

# monkeypatch bb
for bb in (8,):
    pa._choose_bb = lambda b, limit, _bb=bb: _bb
    timeit(f"pallas fwd bb={bb} (+concat)", make_chain(bb), qkv0)

def xla_attn(qkv):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    d = C // H
    q = q.reshape(B, S, H, d); k = k.reshape(B, S, H, d); v = v.reshape(B, S, H, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, C)

@jax.jit
def xla_chain(qkv):
    def body(i, qkv):
        o = xla_attn(qkv)
        return jnp.concatenate([o, o, o], axis=-1)
    return jax.lax.fori_loop(0, REP, body, qkv)

timeit("xla attn (+concat)", xla_chain, qkv0)

@jax.jit
def concat_only(qkv):
    def body(i, qkv):
        o = qkv[..., :C] * 1.0000001
        return jnp.concatenate([o, o, o], axis=-1)
    return jax.lax.fori_loop(0, REP, body, qkv)

timeit("concat-only", concat_only, qkv0)
