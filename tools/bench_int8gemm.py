"""Sub-bf16 matmul experiment: can int8 (or fp8) beat the bf16 GEMM ceiling?

VERDICT r2 #3: the "5x is roofline-infeasible at bf16" claim (docs/PERF.md)
needs a MEASURED sub-bf16 data point.  This measures MXU throughput at the
model's hot GEMM shapes (ViT-B MLP up/down + qkv/proj at tri-modal batch 64:
M = 64*3*129 = 24768) for:
  - bf16 x bf16 (the production path)
  - int8 x int8 -> int32 with a realistic dynamic requant between layers
    (v5e-class MXUs advertise a 2x int8 mode)
  - int8 "raw" (mask-cast between layers; isolates the MXU rate from the
    requant elementwise cost)
  - f8e4m3 / f8e5m2 (expected unsupported on this chip generation)

Timing: pair-chained matmuls with a NATURAL data dependency (each output
feeds the next input after an elementwise cast) — the bench_gemm.py pattern.
The first version of this tool chained via sum(y)*1e-30 and XLA
algebraically rewrote sum(dot(x,w)) into two row/col reductions, reporting
an impossible 30 PFLOP/s; outputs must flow THROUGH the next GEMM.
"""

from __future__ import annotations

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def _time(chain, args, iters):
    # Readback must be a DEVICE-SIDE slice: np.asarray(out) would drag the
    # full (m,k) array over the remote tunnel and dominate the measurement.
    out = chain(*args)
    _ = np.asarray(out[:1, :1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(*args)
        _ = np.asarray(out[:1, :1])
        best = min(best, time.perf_counter() - t0)
    return best / (2 * iters)  # seconds per single matmul


def probe_bf16(m, k, n, iters=50):
    x0 = jnp.asarray(np.random.randn(m, k) * 0.05, jnp.bfloat16)
    w1 = jnp.asarray(np.random.randn(k, n) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(np.random.randn(n, k) * 0.05, jnp.bfloat16)

    @jax.jit
    def chain(x, w1, w2):
        for _ in range(iters):
            y = jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)
            x = jnp.dot(y, w2, preferred_element_type=jnp.bfloat16)
        return x

    dt = _time(chain, (x0, w1, w2), iters)
    fl = 2 * m * k * n
    print(f"bf16        ({m},{k})x({k},{n}): {fl/dt/1e12:7.1f} TFLOP/s "
          f"({dt*1e3:.3f} ms/mm)", flush=True)
    return dt


def probe_int8(m, k, n, iters=50, requant="dynamic"):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-127, 127, (n, k)), jnp.int8)

    @jax.jit
    def chain(x, w1, w2):
        def step(xq, w):
            y = jax.lax.dot_general(
                xq, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if requant == "dynamic":
                # per-tensor dynamic requant: the cost a real dynamic-int8
                # forward layer pays between GEMMs
                s = 127.0 / (jnp.max(jnp.abs(y)).astype(jnp.float32) + 1.0)
                return jnp.clip(jnp.round(y.astype(jnp.float32) * s),
                                -127, 127).astype(jnp.int8)
            if requant == "static":
                # calibrated per-tensor scale (no max-reduction pass): the
                # cost a static-quant forward layer pays
                return jnp.clip(jnp.round(y.astype(jnp.float32) * 7.8e-5),
                                -127, 127).astype(jnp.int8)
            # raw: cheap mask-cast, isolates the MXU rate
            return (y & 127).astype(jnp.int8)

        for _ in range(iters):
            y = step(x, w1)
            x = step(y, w2)
        return x

    dt = _time(chain, (x0, w1, w2), iters)
    fl = 2 * m * k * n
    print(f"int8-{requant:7s}({m},{k})x({k},{n}): {fl/dt/1e12:7.1f} TOP/s "
          f"({dt*1e3:.3f} ms/mm)", flush=True)
    return dt


def probe_fp8(m, k, n, iters=50, dtype_name="float8_e4m3fn"):
    try:
        f8 = getattr(jnp, dtype_name)
        x0 = jnp.asarray(np.random.randn(m, k) * 0.05, f8)
        w1 = jnp.asarray(np.random.randn(k, n) * 0.05, f8)
        w2 = jnp.asarray(np.random.randn(n, k) * 0.05, f8)

        @jax.jit
        def chain(x, w1, w2):
            for _ in range(iters):
                y = jax.lax.dot_general(
                    x, w1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                x = y.astype(f8)
                y2 = jax.lax.dot_general(
                    x, w2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                x = y2.astype(f8)
            return x

        dt = _time(chain, (x0, w1, w2), iters)
        fl = 2 * m * k * n
        print(f"{dtype_name:11s}({m},{k})x({k},{n}): {fl/dt/1e12:7.1f} TFLOP/s "
              f"({dt*1e3:.3f} ms/mm)", flush=True)
        return dt
    except Exception as e:
        print(f"{dtype_name:11s}({m},{k})x({k},{n}): UNSUPPORTED "
              f"{type(e).__name__}: {str(e)[:100]}", flush=True)
        return None


def probe_int4(m, k, n, iters=50):
    try:
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.integers(-7, 7, (m, k)), jnp.int4)
        w1 = jnp.asarray(rng.integers(-7, 7, (k, n)), jnp.int4)
        w2 = jnp.asarray(rng.integers(-7, 7, (n, k)), jnp.int4)

        @jax.jit
        def chain(x, w1, w2):
            def step(xq, w):
                y = jax.lax.dot_general(
                    xq, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return (y & 7).astype(jnp.int4)

            for _ in range(iters):
                y = step(x, w1)
                x = step(y, w2)
            return x

        dt = _time(chain, (x0, w1, w2), iters)
        fl = 2 * m * k * n
        print(f"int4-raw   ({m},{k})x({k},{n}): {fl/dt/1e12:7.1f} TOP/s "
              f"({dt*1e3:.3f} ms/mm)", flush=True)
        return dt
    except Exception as e:
        print(f"int4-raw   ({m},{k})x({k},{n}): UNSUPPORTED "
              f"{type(e).__name__}: {str(e)[:100]}", flush=True)
        return None


def main():
    m = 64 * 3 * 129  # flagship tri-modal batch, S=129
    for (k, n) in [(768, 3072), (768, 2304), (768, 768)]:
        probe_bf16(m, k, n)
        probe_int8(m, k, n, requant="raw")
        probe_int8(m, k, n, requant="static")
        probe_int8(m, k, n, requant="dynamic")
        probe_int4(m, k, n)
        probe_fp8(m, k, n)
        probe_fp8(m, k, n, dtype_name="float8_e5m2")
        print()


if __name__ == "__main__":
    main()
