"""Sub-bf16 matmul experiment: can int8 (or fp8) beat the bf16 GEMM ceiling?

VERDICT r2 #3: the "5x is roofline-infeasible at bf16" claim (docs/PERF.md)
needs a MEASURED sub-bf16 data point.  This measures MXU throughput at the
model's hot GEMM shapes (ViT-B MLP + qkv/proj at tri-modal batch 64:
M = 64*3*129) for:
  - bf16 x bf16 -> f32 (the production path)
  - int8 x int8 -> int32 (v5e MXU has a 2x int8 mode on paper)
  - f8e4m3 x f8e4m3 (attempted; may be unsupported on this chip gen)
plus the end-to-end quantize-dequantize cost (dynamic per-tensor scaling)
that a real int8 forward pass would pay.

Timing: chained in-graph fori_loop with a data dependency (tunnel-safe,
docs/PERF.md methodology), one host readback.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

ITERS = 30


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    return dt


def chain_matmul(dtype, acc_dtype, m, k, n, scale: bool = False):
    """Returns jitted fn running ITERS dependent matmuls in-graph."""

    @jax.jit
    def run(x, w):
        def body(i, carry):
            xc = carry
            y = jax.lax.dot_general(
                xc.astype(dtype), w.astype(dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            if scale:
                # dynamic per-tensor dequant + requant of the next input
                y = y.astype(jnp.float32) * (1.0 / 127.0)
            # fold output back into an (m,k) input with a cheap slice/pad to
            # keep the dependency chain alive without extra big GEMMs
            red = jnp.sum(y, dtype=jnp.float32) * 1e-30
            return (x + red).astype(x.dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)

    return run


def bench_case(name, dtype, acc, m, k, n, xint=False):
    key = jax.random.PRNGKey(0)
    if xint:
        x = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        w = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
    else:
        x = (jax.random.normal(key, (m, k), jnp.float32) * 0.1).astype(dtype)
        w = (jax.random.normal(key, (k, n), jnp.float32) * 0.1).astype(dtype)
    try:
        fn = chain_matmul(dtype, acc, m, k, n)
        dt = timed(fn, x, w)
        flops = 2 * m * k * n
        print(f"{name:28s} {dt*1e3:8.3f} ms/matmul  {flops/dt/1e12:8.1f} TOP/s")
        return dt
    except Exception as e:
        print(f"{name:28s} UNSUPPORTED: {type(e).__name__}: {str(e)[:120]}")
        return None


def main():
    # ViT-B MLP GEMM at tri-modal flagship batch: (B*3*S, 768) x (768, 3072)
    m = 64 * 3 * 129
    cases = [
        ("bf16->f32  mlp_up", jnp.bfloat16, jnp.float32, m, 768, 3072, False),
        ("int8->int32 mlp_up", jnp.int8, jnp.int32, m, 768, 3072, True),
        ("f8e4m3->f32 mlp_up", jnp.float8_e4m3fn, jnp.float32, m, 768, 3072, False),
        ("bf16->f32  mlp_down", jnp.bfloat16, jnp.float32, m, 3072, 768, False),
        ("int8->int32 mlp_down", jnp.int8, jnp.int32, m, 3072, 768, True),
        ("bf16->f32  qkv", jnp.bfloat16, jnp.float32, m, 768, 2304, False),
        ("int8->int32 qkv", jnp.int8, jnp.int32, m, 768, 2304, True),
    ]
    res = {}
    for name, dt_, acc, mm, kk, nn, xint in cases:
        res[name] = bench_case(name, dt_, acc, mm, kk, nn, xint)

    # Quantize-dequantize overhead: what a dynamic-int8 forward layer pays.
    x = jax.random.normal(jax.random.PRNGKey(1), (m, 3072), jnp.bfloat16)

    @jax.jit
    def qdq(x):
        def body(i, c):
            s = jnp.max(jnp.abs(c.astype(jnp.float32))) / 127.0
            q = jnp.clip(jnp.round(c.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
            d = q.astype(jnp.float32) * s
            return (d * (1.0 + 1e-30 * jnp.sum(d))).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, ITERS, body, x)

    dt = timed(qdq, x)
    print(f"{'quant+dequant (m,3072)':28s} {dt*1e3:8.3f} ms/op")


if __name__ == "__main__":
    main()
