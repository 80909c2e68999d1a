"""12-block backbone-stack bench: in-model attention cost via variants.

One chain update per 12-block stack (like the real model), so per-iteration
chain overhead is amortized.  Variants: pallas attention, xla attention,
no attention (MLP-only blocks).
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from flax import linen as nn
from demo2_tpu.models.clip_vit import ResidualAttentionBlock, CLIPMlp
from demo2_tpu.ops.norm import LayerNorm

B, S, C = 192, 129, 768
K = 12
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, S, C), jnp.float32).astype(jnp.bfloat16)


class Stack(nn.Module):
    impl: str = "pallas"
    use_attn: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(12):
            if self.use_attn:
                x = ResidualAttentionBlock(
                    width=C, heads=12, dtype=jnp.bfloat16,
                    attn_implementation=self.impl, name=f"b{i}",
                )(x, None, True)
            else:
                y = LayerNorm(name=f"ln{i}")(x)
                x = x + CLIPMlp(width=C, dtype=jnp.bfloat16, name=f"m{i}")(y)
        return x


def bench(name, mod):
    params = mod.init(rng, x)

    @jax.jit
    def many_f(params, x0):
        def body(i, carry):
            acc, xx = carry
            out = mod.apply(params, xx)
            s = jnp.sum(out.astype(jnp.float32) ** 2)
            return acc + s, xx + (s * 1e-30).astype(xx.dtype)
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), x0))
        return acc

    acc = many_f(params, x); _ = float(acc)
    t0 = time.perf_counter(); acc = many_f(params, x); _ = float(acc)
    t_f = (time.perf_counter() - t0) / K * 1000

    @jax.jit
    def many_fb(params, x0):
        def body(i, carry):
            acc, xx = carry
            def loss(xx_):
                return jnp.sum(mod.apply(params, xx_).astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss)(xx)
            return acc + l, xx + (l * 1e-30).astype(xx.dtype) + (g * 1e-30).astype(xx.dtype)
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), x0))
        return acc

    acc = many_fb(params, x); _ = float(acc)
    t0 = time.perf_counter(); acc = many_fb(params, x); _ = float(acc)
    t_fb = (time.perf_counter() - t0) / K * 1000
    print(f"{name}: fwd {t_f:.2f} ms  fwd+bwd(d_in) {t_fb:.2f} ms", flush=True)


bench("stack12-pallas", Stack(impl="pallas"))
bench("stack12-xla", Stack(impl="xla"))
bench("stack12-noattn", Stack(use_attn=False))
