"""Per-piece fwd / fwd+bwd timing of one CLIP ViT block at flagship shapes
(192, 129, 768) bf16, with in-graph chains.  Finds where backward exceeds
2x forward."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from flax import linen as nn
from demo2_tpu.models.clip_vit import ResidualAttentionBlock
from demo2_tpu.ops.norm import LayerNorm
from demo2_tpu.ops.packed_attention import packed_self_attention

B, S, C = 192, 129, 768
K = 30
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, S, C), jnp.float32).astype(jnp.bfloat16)


def chain(name, mod_apply, params, x0):
    @jax.jit
    def many(params, x0):
        def body(i, carry):
            acc, xx = carry
            out = mod_apply(params, xx)
            s = jnp.sum(out.astype(jnp.float32) ** 2)
            return acc + s, xx + (s * 1e-30).astype(xx.dtype)
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), x0))
        return acc

    acc = many(params, x0); _ = float(acc)
    t0 = time.perf_counter(); acc = many(params, x0); _ = float(acc)
    t_f = (time.perf_counter() - t0) / K * 1000

    @jax.jit
    def many_fb(params, x0):
        def body(i, carry):
            acc, xx = carry
            def loss(xx_):
                return jnp.sum(mod_apply(params, xx_).astype(jnp.float32) ** 2)
            l, g = jax.value_and_grad(loss)(xx)
            return acc + l, xx + (l * 1e-30).astype(xx.dtype) + (g * 1e-30).astype(xx.dtype)

        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), x0))
        return acc

    acc = many_fb(params, x0); _ = float(acc)
    t0 = time.perf_counter(); acc = many_fb(params, x0); _ = float(acc)
    t_fb = (time.perf_counter() - t0) / K * 1000
    print(f"{name}: fwd {t_f:.3f} ms  fwd+bwd {t_fb:.3f} ms  ratio {t_fb/t_f:.2f}",
          flush=True)


# whole block (as used in training: pallas attention, no fused inference path)
blk = ResidualAttentionBlock(width=C, heads=12, dtype=jnp.bfloat16,
                             attn_implementation="pallas")
bp = blk.init(rng, x, None, True)
chain("block", lambda p, xx: blk.apply(p, xx, None, True), bp, x)

# LayerNorm alone
ln = LayerNorm()
lp = ln.init(rng, x)
chain("layernorm", lambda p, xx: ln.apply(p, xx), lp, x)

# packed attention alone (qkv precomputed)
qkv = jax.random.normal(rng, (B, S, 3 * C), jnp.float32).astype(jnp.bfloat16)
chain("packed_attn", lambda p, xx: packed_self_attention(xx, 12, 64 ** -0.5),
      {}, qkv)

# dense qkv GEMM alone
dense = nn.Dense(3 * C, dtype=jnp.bfloat16, param_dtype=jnp.float32)
dp = dense.init(rng, x)
chain("qkv_gemm", lambda p, xx: dense.apply(p, xx), dp, x)

# MLP (fc1+gelu+fc2)
from demo2_tpu.models.clip_vit import CLIPMlp
mlp = CLIPMlp(width=C, dtype=jnp.bfloat16)
mp = mlp.init(rng, x)
chain("mlp", lambda p, xx: mlp.apply(p, xx), mp, x)
