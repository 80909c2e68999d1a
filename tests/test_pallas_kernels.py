"""Pallas kernel correctness on CPU via interpret mode."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from demo2_tpu.ops.packed_attention import (
    _packed_bwd,
    _packed_fwd_impl,
)


def _xla_ref(qkv, h, scale):
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // h
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, h, d)
    k = k.reshape(b, s, h, d)
    v = v.reshape(b, s, h, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, s, c)


def test_packed_attention_fwd_interpret():
    b, s, h, d = 2, 13, 4, 16  # s not multiple of 8 -> exercises padding
    c = h * d
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, s, 3 * c), jnp.float32)
    scale = d ** -0.5
    out = _packed_fwd_impl(qkv, h, scale, interpret=True)
    ref = _xla_ref(qkv, h, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_packed_attention_bwd_interpret():
    b, s, h, d = 2, 11, 2, 8
    c = h * d
    scale = d ** -0.5
    qkv = jax.random.normal(jax.random.PRNGKey(1), (b, s, 3 * c), jnp.float32)

    def loss_ref(qkv):
        return jnp.sum(_xla_ref(qkv, h, scale) ** 2)

    g_ref = jax.grad(loss_ref)(qkv)
    # Cotangent of sum-of-squares: 2 * out.
    out = _packed_fwd_impl(qkv, h, scale, interpret=True)
    (g_kernel,) = _packed_bwd(h, scale, qkv, 2 * out, interpret=True)
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )


def test_fused_attention_block_interpret():
    from demo2_tpu.ops.fused_block import _fused_fwd_impl, _reference_impl

    b, s, c, h = 4, 11, 32, 4
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, s, c), jnp.float32)
    lns = jnp.ones((c,), jnp.float32) * 1.1
    lnb = jnp.ones((c,), jnp.float32) * 0.05
    wqkv = jax.random.normal(jax.random.fold_in(rng, 1), (c, 3 * c)) * 0.1
    bqkv = jax.random.normal(jax.random.fold_in(rng, 2), (3 * c,)) * 0.1
    wout = jax.random.normal(jax.random.fold_in(rng, 3), (c, c)) * 0.1
    bout = jax.random.normal(jax.random.fold_in(rng, 4), (c,)) * 0.1
    scale = (c // h) ** -0.5
    out, qkv_p, attn_p, x_p, probs = _fused_fwd_impl(
        x, lns, lnb, wqkv, bqkv, wout, bout, h, scale, interpret=True
    )
    ref = _reference_impl(x, lns, lnb, wqkv, bqkv, wout, bout, h, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("b", [4, 12])
def test_fused_attention_block_grad_matches_unfused(b):
    """The custom-VJP backward (saved-residual chain) must equal XLA's
    gradient of the unfused reference implementation.

    b=12 regression-tests the bb-policy split: the forward's saved-probs
    layout (H*bb rows per program) must be read back with the SAME bb by
    _packed_bwd_saved — fused_block's old private _choose_bb picked bb=2
    for b=12 while packed_attention picked 4, silently corrupting grads.
    """
    from demo2_tpu.ops.fused_block import (
        _fused_fwd_impl, _fused_bwd, _reference_impl,
    )

    s, c, h = 11, 32, 4
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (b, s, c), jnp.float32)
    lns = jnp.ones((c,), jnp.float32) * 1.1
    lnb = jnp.ones((c,), jnp.float32) * 0.05
    wqkv = jax.random.normal(jax.random.fold_in(rng, 1), (c, 3 * c)) * 0.1
    bqkv = jax.random.normal(jax.random.fold_in(rng, 2), (3 * c,)) * 0.1
    wout = jax.random.normal(jax.random.fold_in(rng, 3), (c, c)) * 0.1
    bout = jax.random.normal(jax.random.fold_in(rng, 4), (c,)) * 0.1
    scale = (c // h) ** -0.5
    g = jax.random.normal(jax.random.fold_in(rng, 5), (b, s, c)) * 0.3

    out, qkv_p, attn_p, x_p, probs = _fused_fwd_impl(
        x, lns, lnb, wqkv, bqkv, wout, bout, h, scale, interpret=True
    )
    # Residuals stay PADDED (s=11 -> s_pad=16); the backward must still
    # produce grads identical to the unfused chain on the valid rows.
    grads = _fused_bwd(
        h, scale, (x_p, qkv_p, attn_p, probs, lns, lnb, wqkv, wout), g
    )

    ref_out, vjp = jax.vjp(
        lambda *a: _reference_impl(*a, h, scale),
        x, lns, lnb, wqkv, bqkv, wout, bout,
    )
    ref_grads = vjp(g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-4, atol=1e-4)
    for got, want, nm in zip(
        grads, ref_grads, ("dx", "dscale", "dbias", "dwqkv", "dbqkv", "dwout", "dbout")
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4, err_msg=nm
        )


def test_packed_bwd_saved_matches_recompute():
    """The saved-probs backward kernel must equal the recompute backward."""
    from demo2_tpu.ops.packed_attention import (
        _packed_bwd_padded,
        _packed_bwd_saved,
    )
    from demo2_tpu.ops.fused_block import _fused_fwd_impl

    b, s, c, h = 8, 11, 32, 4
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (b, s, c), jnp.float32)
    lns = jnp.ones((c,), jnp.float32)
    lnb = jnp.zeros((c,), jnp.float32)
    wqkv = jax.random.normal(jax.random.fold_in(rng, 1), (c, 3 * c)) * 0.1
    bqkv = jnp.zeros((3 * c,))
    wout = jnp.eye(c)
    bout = jnp.zeros((c,))
    scale = (c // h) ** -0.5
    out, qkv_p, attn_p, x_p, probs = _fused_fwd_impl(
        x, lns, lnb, wqkv, bqkv, wout, bout, h, scale, interpret=True
    )
    s_pad = qkv_p.shape[1]
    g = jax.random.normal(jax.random.fold_in(rng, 2), (b, s, c)) * 0.3
    gp = jnp.pad(g, [(0, 0), (0, s_pad - s), (0, 0)])
    d_saved = _packed_bwd_saved(h, scale, qkv_p, probs, gp, interpret=True)
    d_rec = _packed_bwd_padded(h, scale, qkv_p, gp, s, interpret=True)
    np.testing.assert_allclose(
        np.asarray(d_saved), np.asarray(d_rec), rtol=1e-4, atol=1e-4
    )
    # padded rows must be exactly zero (consumed unsliced by dW einsums)
    assert not np.any(np.asarray(d_saved)[:, s:])


def test_packed_bwd_saved_db_matches_xla_reduce():
    """The db-emitting saved-probs backward must return the same dqkv as
    _packed_bwd_saved plus db == sum(dqkv, axis=(0,1)) in the packed-qkv
    bias layout, with accumulation exercised across >1 grid program."""
    from demo2_tpu.ops.packed_attention import (
        _packed_bwd_saved,
        _packed_bwd_saved_db,
    )
    from demo2_tpu.ops.fused_block import _fused_fwd_impl

    b, s, c, h = 16, 11, 32, 4  # b=16 -> 2 grid programs
    rng = jax.random.PRNGKey(11)
    x = jax.random.normal(rng, (b, s, c), jnp.float32)
    lns = jnp.ones((c,), jnp.float32) * 1.05
    lnb = jnp.zeros((c,), jnp.float32)
    wqkv = jax.random.normal(jax.random.fold_in(rng, 1), (c, 3 * c)) * 0.1
    bqkv = jnp.zeros((3 * c,))
    wout = jnp.eye(c)
    bout = jnp.zeros((c,))
    scale = (c // h) ** -0.5
    out, qkv_p, attn_p, x_p, probs = _fused_fwd_impl(
        x, lns, lnb, wqkv, bqkv, wout, bout, h, scale, interpret=True
    )
    s_pad = qkv_p.shape[1]
    g = jax.random.normal(jax.random.fold_in(rng, 2), (b, s, c)) * 0.3
    gp = jnp.pad(g, [(0, 0), (0, s_pad - s), (0, 0)])

    want_dqkv = _packed_bwd_saved(h, scale, qkv_p, probs, gp, interpret=True)
    want_db = jnp.sum(want_dqkv.reshape(-1, 3 * c).astype(jnp.float32), axis=0)

    dqkv, db = _packed_bwd_saved_db(h, scale, qkv_p, probs, gp, interpret=True)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(want_dqkv))
    assert db.shape == (3 * c,) and db.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(db), np.asarray(want_db), rtol=1e-5, atol=1e-5
    )


def test_packed_bwd_fused_dw_matches_separate():
    """The fused-dW backward (dqkv kept in VMEM, dW accumulated across the
    grid) must equal the separate kernel + XLA contraction path."""
    from demo2_tpu.ops.packed_attention import (
        _packed_bwd_fused_dw,
        _packed_bwd_saved,
    )
    from demo2_tpu.ops.fused_block import _fused_fwd_impl

    b, s, c, h = 16, 11, 32, 4  # b=16 -> 2 grid programs exercise accumulation
    rng = jax.random.PRNGKey(4)
    x = jax.random.normal(rng, (b, s, c), jnp.float32)
    lns = jnp.ones((c,), jnp.float32) * 1.05
    lnb = jnp.zeros((c,), jnp.float32)
    wqkv = jax.random.normal(jax.random.fold_in(rng, 1), (c, 3 * c)) * 0.1
    bqkv = jnp.zeros((3 * c,))
    wout = jnp.eye(c)
    bout = jnp.zeros((c,))
    scale = (c // h) ** -0.5
    out, qkv_p, attn_p, x_p, probs = _fused_fwd_impl(
        x, lns, lnb, wqkv, bqkv, wout, bout, h, scale, interpret=True
    )
    s_pad = qkv_p.shape[1]
    g = jax.random.normal(jax.random.fold_in(rng, 2), (b, s, c)) * 0.3
    gp = jnp.pad(g, [(0, 0), (0, s_pad - s), (0, 0)])

    # reference: separate kernel + XLA contractions
    dqkv = _packed_bwd_saved(h, scale, qkv_p, probs, gp, interpret=True)
    xf = x_p.astype(jnp.float32).reshape(-1, c)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    t = (xhat * lns + lnb).astype(x_p.dtype)
    dqkv_m = dqkv.reshape(-1, 3 * c)
    want_dt = (dqkv_m @ wqkv.T).reshape(b, s_pad, c)
    want_dw = jnp.einsum("mc,md->cd", t, dqkv_m)
    want_db = jnp.sum(dqkv_m, axis=0)

    dt, dw, db = _packed_bwd_fused_dw(
        h, scale, qkv_p, probs, gp, t.reshape(b, s_pad, c), wqkv, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dt), np.asarray(want_dt), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(want_dw), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(want_db), rtol=1e-4, atol=1e-4)


def test_fused_mlp_block_interpret():
    from demo2_tpu.ops.fused_block import _mlp_reference_impl, fused_mlp_block

    b, s, c, f = 2, 9, 32, 128
    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, (b, s, c), jnp.float32)
    lns = jnp.ones((c,)) * 0.9
    lnb = jnp.ones((c,)) * -0.02
    w1 = jax.random.normal(jax.random.fold_in(rng, 1), (c, f)) * 0.1
    b1 = jax.random.normal(jax.random.fold_in(rng, 2), (f,)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(rng, 3), (f, c)) * 0.1
    b2 = jax.random.normal(jax.random.fold_in(rng, 4), (c,)) * 0.1
    out = fused_mlp_block(x, lns, lnb, w1, b1, w2, b2, block_rows=8, interpret=True)
    ref = _mlp_reference_impl(x, lns, lnb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fused_mlp_block_grad_matches_unfused():
    """The MLP custom-VJP (pre-GELU hidden as sole residual) must equal
    XLA's gradient of the unfused reference implementation."""
    from demo2_tpu.ops.fused_block import _mlp_reference_impl, fused_mlp_block

    b, s, c, f = 2, 9, 32, 128
    rng = jax.random.PRNGKey(6)
    x = jax.random.normal(rng, (b, s, c), jnp.float32)
    lns = jnp.ones((c,)) * 0.9
    lnb = jnp.ones((c,)) * -0.02
    w1 = jax.random.normal(jax.random.fold_in(rng, 1), (c, f)) * 0.1
    b1 = jax.random.normal(jax.random.fold_in(rng, 2), (f,)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(rng, 3), (f, c)) * 0.1
    b2 = jax.random.normal(jax.random.fold_in(rng, 4), (c,)) * 0.1
    g = jax.random.normal(jax.random.fold_in(rng, 5), (b, s, c)) * 0.3

    out, vjp = jax.vjp(
        lambda *a: fused_mlp_block(*a, block_rows=8, interpret=True),
        x, lns, lnb, w1, b1, w2, b2,
    )
    grads = vjp(g)
    ref_out, ref_vjp = jax.vjp(
        lambda *a: _mlp_reference_impl(*a), x, lns, lnb, w1, b1, w2, b2
    )
    ref_grads = ref_vjp(g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-4, atol=1e-4)
    for got, want, nm in zip(
        grads, ref_grads, ("dx", "dscale", "dbias", "dw1", "db1", "dw2", "db2")
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4, err_msg=nm
        )


def test_ln_pallas_bwd_matches_autodiff():
    """layernorm_pallas_bwd: forward bit-identical to the plain LN graph;
    the fused Pallas backward matches autodiff of that graph (f32
    accumulation rounding only).  Covers the padded-tail-rows case
    (rows not a multiple of the 256-row kernel block)."""
    from demo2_tpu.ops.norm import _layernorm_fwd_expr, layernorm_pallas_bwd

    rng = jax.random.PRNGKey(11)
    for shape, dt, tol in (
        ((5, 129, 768), jnp.bfloat16, 2e-2),  # flagship ln_2 shape family
        ((300, 384), jnp.float32, 1e-5),      # non-multiple-of-block rows
    ):
        c = shape[-1]
        k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(rng, c), 4)
        x = (jax.random.normal(k1, shape, jnp.float32) * 2 + 0.3).astype(dt)
        g = jax.random.normal(k2, (c,), jnp.float32) * 0.5 + 1.0
        b = jax.random.normal(k3, (c,), jnp.float32) * 0.1
        dy = jax.random.normal(k4, shape, jnp.float32).astype(dt)

        y_ref = _layernorm_fwd_expr(x, g, b, 1e-5)
        y_pal = layernorm_pallas_bwd(x, g, b, epsilon=1e-5)
        assert (np.asarray(y_ref) == np.asarray(y_pal)).all()

        def loss(fn):
            return lambda *a: jnp.sum(
                fn(*a).astype(jnp.float32) * dy.astype(jnp.float32)
            )

        ref = jax.grad(loss(lambda *a: _layernorm_fwd_expr(*a, 1e-5)),
                       argnums=(0, 1, 2))(x, g, b)
        pal = jax.grad(loss(lambda *a: layernorm_pallas_bwd(*a, epsilon=1e-5)),
                       argnums=(0, 1, 2))(x, g, b)
        # Elementwise comparison against an fp32 oracle (ADVICE r4: a
        # global-max-normalized error masks large relative errors on small
        # entries).  The bf16 reductions have real cancellation noise on
        # near-zero entries — for the AUTODIFF chain too — so the atol is
        # the measured autodiff-vs-oracle floor, not an arbitrary constant:
        # the kernel must be as close to the true gradient as autodiff is.
        oracle = jax.grad(
            loss(lambda *a: _layernorm_fwd_expr(*a, 1e-5)), argnums=(0, 1, 2)
        )(x.astype(jnp.float32), g, b)
        for got, want, oracle_out, nm in zip(pal, ref, oracle,
                                             ("dx", "dscale", "dbias")):
            got = np.asarray(got, np.float32)
            want = np.asarray(want, np.float32)
            exact = np.asarray(oracle_out, np.float32)
            floor = np.abs(want - exact).max()  # autodiff's own bf16 noise
            # +1e-5 absolute: f32 reduction-order rounding (tree vs
            # sequential) over ~300 rows on near-zero reduction outputs.
            np.testing.assert_allclose(
                got, exact, rtol=tol, atol=4.0 * floor + 1e-5,
                err_msg=f"{nm} {shape} (autodiff noise floor {floor:.2e})",
            )
