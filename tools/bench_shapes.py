"""Does the (B, 129, C) 3-D layout tax GEMMs vs flat (B*S, C)?"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
import numpy as np

REP = 24
def timeit(label, fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best/REP*1000:.3f} ms/layer", flush=True)

def chain(shape, k, n):
    x0 = jnp.asarray(np.random.randn(*shape, k) * 0.05, jnp.bfloat16)
    w = jnp.asarray(np.random.randn(k, n) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(np.random.randn(n, k) * 0.05, jnp.bfloat16)
    @jax.jit
    def f(x, w, w2):
        def body(i, x):
            y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
            return jnp.dot(y, w2, preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, REP, body, x)
    timeit(f"shape={shape} ({k}->{n}->{k})", f, x0, w, w2)

chain((24768,), 768, 2304)
chain((192, 129), 768, 2304)
chain((192, 136), 768, 2304)
chain((192, 128), 768, 2304)
chain((24768,), 768, 3072)
chain((192, 129), 768, 3072)
