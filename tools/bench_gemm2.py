import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
import numpy as np

def probe(m, k, n, iters=100, acc=jnp.bfloat16):
    x0 = jnp.asarray(np.random.randn(m, k) * 0.05, jnp.bfloat16)
    w1 = jnp.asarray(np.random.randn(k, n) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(np.random.randn(n, k) * 0.05, jnp.bfloat16)

    @jax.jit
    def chain(x, w1, w2):
        def body(i, x):
            y = jnp.dot(x, w1, preferred_element_type=acc).astype(jnp.bfloat16)
            return jnp.dot(y, w2, preferred_element_type=acc).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, x)

    out = chain(x0, w1, w2)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(x0, w1, w2)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    fl = 2 * m * k * n * 2 * iters
    print(f"({m},{k})x({k},{n}) acc={acc.__name__}: {fl/best/1e12:.1f} TFLOP/s ({best/iters/2*1e3:.3f} ms/mm)", flush=True)

probe(24768, 768, 2304)
probe(24768, 768, 3072)
probe(24768, 768, 768)
probe(24768, 768, 2304, acc=jnp.float32)
probe(8192, 8192, 8192, iters=20)
probe(8192, 8192, 8192, iters=20, acc=jnp.float32)
