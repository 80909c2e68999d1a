import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
import numpy as np

def probe(m, k, n, iters=50, dtype=jnp.bfloat16):
    """Chain x@w1 (m,k)x(k,n) then x@w2 (m,n)x(n,k); natural dependency."""
    x0 = jnp.asarray(np.random.randn(m, k) * 0.05, dtype)
    w1 = jnp.asarray(np.random.randn(k, n) * 0.05, dtype)
    w2 = jnp.asarray(np.random.randn(n, k) * 0.05, dtype)

    @jax.jit
    def chain(x, w1, w2):
        for _ in range(iters):
            y = jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)
            x = jnp.dot(y, w2, preferred_element_type=jnp.bfloat16)
        return x

    out = chain(x0, w1, w2)
    _ = np.asarray(out[:1, :1])  # warm the readback path too
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(x0, w1, w2)
        _ = np.asarray(out[:1, :1])
        best = min(best, time.perf_counter() - t0)
    fl = 2 * m * k * n * 2 * iters
    print(f"({m},{k})x({k},{n}) pair-chain: {fl/best/1e12:.1f} TFLOP/s ({best/iters/2*1e3:.2f} ms/mm)", flush=True)

probe(24768, 768, 3072)
probe(24768, 768, 2304)
probe(24768, 768, 768)
probe(4096, 4096, 4096, iters=25)
probe(8192, 8192, 8192, iters=10)
