"""Micro-bench HDM/ATMoE variants on TPU with an IN-GRAPH dependency chain.

Independent repeated dispatches pay the remote tunnel's full round-trip
(~140 ms each) on this backend — a Python-loop micro-bench measures the
tunnel, not the op (docs/PERF.md).  Here K iterations run inside one jit
via lax.fori_loop with a runtime data dependency between iterations.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from demo2_tpu.models.hdm_atmoe import HDM, ATMoE, GeneralFusion

B, N, C = 64, 128, 512
K = 30
rng = jax.random.PRNGKey(0)
patches = jax.random.normal(rng, (3, B, N, C), jnp.float32).astype(jnp.bfloat16)
globals_ = jax.random.normal(rng, (3, B, C), jnp.float32).astype(jnp.bfloat16)


def chain_bench(name, apply_fn, *args):
    """args[0] is perturbed each iteration by the previous scalar output."""

    @jax.jit
    def many(*args):
        def body(i, carry):
            acc, x0 = carry
            out = apply_fn(x0, *args[1:])
            s = jnp.sum(out.astype(jnp.float32) ** 2)
            return acc + s, x0 + (s * 1e-30).astype(x0.dtype)

        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), args[0]))
        return acc

    acc = many(*args)
    _ = float(acc)  # warm
    t0 = time.perf_counter()
    acc = many(*args)
    _ = float(acc)
    dt = (time.perf_counter() - t0) / K
    print(f"{name}: {dt*1e3:.3f} ms/iter", flush=True)


# HDM forward
hdm = HDM(feat_dim=C, dropout=0.0, dtype=jnp.bfloat16)
hdm_p = hdm.init(rng, patches, globals_, True)
chain_bench("HDM fwd", lambda pt, p, gl: hdm.apply(p, pt, gl, True),
            patches, hdm_p, globals_)


def hdm_fwdbwd(pt, p, gl):
    def loss(pt):
        return jnp.sum(hdm.apply(p, pt, gl, True).astype(jnp.float32) ** 2)
    l, g = jax.value_and_grad(loss)(pt)
    return l + jnp.sum(g.astype(jnp.float32) ** 2)


@jax.jit
def many_fb(pt):
    def body(i, carry):
        acc, x0 = carry
        s = hdm_fwdbwd(x0, hdm_p, globals_)
        return acc + s, x0 + (s * 1e-30).astype(x0.dtype)
    acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), pt))
    return acc

acc = many_fb(patches); _ = float(acc)
t0 = time.perf_counter(); acc = many_fb(patches); _ = float(acc)
print(f"HDM fwd+bwd(d_in): {(time.perf_counter()-t0)/K*1e3:.3f} ms/iter", flush=True)

# GeneralFusion (HDM+ATMoE, HEAD=4) forward
gf = GeneralFusion(feat_dim=C, use_hdm=True, use_atm=True, head=4, dtype=jnp.bfloat16)
gf_p = gf.init({"params": rng, "dropout": rng}, patches, globals_,
               deterministic=True, use_running_average=True)
chain_bench(
    "GeneralFusion fwd",
    lambda pt, p, gl: gf.apply(p, pt, gl, deterministic=True, use_running_average=True),
    patches, gf_p, globals_,
)
