"""int8-forward dense op (ops/quant.py): quantization accuracy + exact
bf16/f32 backward (the custom VJP must be the UNQUANTIZED matmul grads)."""

import jax
import jax.numpy as jnp
import numpy as np

from demo2_tpu.ops.quant import int8_dense


def test_int8_dense_forward_close_and_backward_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 48)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.normal(size=(48, 24)) * 0.1, jnp.float32)
    zero = jnp.zeros((), jnp.float32)

    y = int8_dense(x, w, zero)
    y_ref = x @ w
    # per-tensor act + per-channel weight int8: ~1% relative error budget
    assert float(jnp.max(jnp.abs(y - y_ref))) < 0.05 * float(jnp.max(jnp.abs(y_ref))) + 0.02

    def loss_q(x, w):
        return jnp.sum(jnp.sin(int8_dense(x, w, zero)))

    def loss_f(x, w):
        return jnp.sum(jnp.sin(x @ w))

    gq = jax.grad(loss_q, argnums=(0, 1))(x, w)
    gf = jax.grad(loss_f, argnums=(0, 1))(x, w)
    # backward uses the unquantized tensors: the only difference vs the f32
    # grads is the cotangent coming through sin'(quantized y) vs sin'(y).
    for a, b in zip(gq, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.08)


def test_int8_dense_static_scale_path():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 32)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 8)) * 0.1, jnp.float32)
    # static scale chosen == the dynamic one -> identical results
    s = jnp.asarray(float(jnp.max(jnp.abs(x))) / 127.0, jnp.float32)
    y_dyn = int8_dense(x, w, jnp.zeros((), jnp.float32))
    y_sta = int8_dense(x, w, s)
    np.testing.assert_allclose(np.asarray(y_dyn), np.asarray(y_sta), atol=1e-6)


def test_int8_dense_batched_shapes():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(16, 12)) * 0.1, jnp.float32)
    y = int8_dense(x, w, jnp.zeros((), jnp.float32))
    assert y.shape == (2, 5, 12) and y.dtype == jnp.bfloat16


def test_clip_mlp_int8_same_params_and_close_output():
    """TPU.INT8_MLP keeps the exact Dense param tree (checkpoints stay
    compatible) and approximates the fp forward within int8 noise."""
    import flax
    from demo2_tpu.models.clip_vit import CLIPMlp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 32)), jnp.float32)
    m_off = CLIPMlp(32)
    m_int8 = CLIPMlp(32, int8_fwd="dynamic")
    v = m_off.init(jax.random.PRNGKey(0), x)
    v8 = m_int8.init(jax.random.PRNGKey(0), x)
    t_off = set(flax.traverse_util.flatten_dict(v["params"]))
    t_int8 = set(flax.traverse_util.flatten_dict(v8["params"]))
    assert t_off == t_int8
    y = m_off.apply(v, x)
    y8 = m_int8.apply(v, x)
    err = float(jnp.max(jnp.abs(y - y8)))
    ref = float(jnp.max(jnp.abs(y)))
    assert err < 0.05 * ref + 0.05, (err, ref)
    # grads flow through the custom VJP to both kernels
    g = jax.grad(lambda p: jnp.sum(jnp.square(m_int8.apply({"params": p}, x))))(
        v["params"]
    )
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)
