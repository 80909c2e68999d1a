"""Sub-block microbench: attention-only vs MLP-only fwd+bwd per layer."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from demo2_tpu.ops.attention import MultiHeadAttention
from demo2_tpu.ops.norm import LayerNorm
from demo2_tpu.models.clip_vit import CLIPMlp
from flax import linen as nn

B, S, C, H = 192, 129, 768, 12
DT = jnp.bfloat16
LAYERS = 12

class AttnSub(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = LayerNorm(name="ln_1")(x)
        y = MultiHeadAttention(num_heads=H, dtype=DT, implementation="pallas", name="attn")(y)
        return x + y

class MlpSub(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = LayerNorm(name="ln_2")(x)
        y = CLIPMlp(C, dtype=DT, name="mlp")(y)
        return x + y

def bench(mod, name):
    x0 = jnp.asarray(np.random.randn(B, S, C) * 0.05, DT)
    vs = mod.init(jax.random.PRNGKey(0), x0)

    def fwd(p, x):
        for _ in range(LAYERS):
            x = mod.apply({"params": p}, x)
        return x

    fwd_j = jax.jit(fwd)
    fb_j = jax.jit(lambda p, x: jax.value_and_grad(
        lambda pp, xx: jnp.sum(fwd(pp, xx).astype(jnp.float32) ** 2) * 1e-6)(p, x))

    def timeit(label, fn, *args, iters=20):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{name} {label}: {best/LAYERS*1000:.3f} ms/layer", flush=True)
        return best

    t_f = timeit("fwd", fwd_j, vs["params"], x0)
    t_fb = timeit("fwd+bwd", fb_j, vs["params"], x0)
    print(f"{name} bwd: {(t_fb-t_f)/LAYERS*1000:.3f} ms/layer", flush=True)

bench(AttnSub(), "attn[pallas]")
bench(MlpSub(), "mlp")
