"""Solver tests: schedule parity with the reference WarmupMultiStepLR."""

import bisect

import jax.numpy as jnp
import numpy as np

from demo2_tpu.config import get_cfg_defaults
from demo2_tpu.solver import make_lr_schedule, warmup_linear_lr, warmup_multistep_lr


def _reference_lr(base_lr, milestones, gamma, wf, wi, method, epoch):
    """Direct transcription of the reference formula (lr_scheduler.py:43-56)."""
    factor = 1.0
    if epoch < wi:
        if method == "constant":
            factor = wf
        else:
            alpha = epoch / wi
            factor = wf * (1 - alpha) + alpha
    return base_lr * factor * gamma ** bisect.bisect_right(sorted(milestones), epoch)


def test_warmup_multistep_matches_reference_formula():
    lr_at = warmup_multistep_lr(3.5e-4, (40, 70), 0.1, 0.01, 10, "linear")
    for epoch in range(0, 120):
        ref = _reference_lr(3.5e-4, (40, 70), 0.1, 0.01, 10, "linear", epoch)
        np.testing.assert_allclose(lr_at(epoch), ref, rtol=1e-12)


def test_warmup_constant():
    lr_at = warmup_multistep_lr(0.01, (5,), 0.1, 0.5, 3, "constant")
    assert lr_at(0) == 0.01 * 0.5
    assert lr_at(2) == 0.01 * 0.5
    assert lr_at(3) == 0.01
    assert lr_at(6) == 0.01 * 0.1


def test_step_schedule_epoch_granularity():
    cfg = get_cfg_defaults()
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.STEPS = (4,)
    schedule = make_lr_schedule(cfg, steps_per_epoch=10)
    lr_at = warmup_multistep_lr(1e-3, (4,), cfg.SOLVER.GAMMA,
                                cfg.SOLVER.WARMUP_FACTOR, 2, "linear")
    # step s belongs to epoch 1 + s // 10 (scheduler.step(epoch) at start).
    for step in (0, 5, 10, 19, 20, 45, 100):
        expected = lr_at(1 + step // 10)
        np.testing.assert_allclose(float(schedule(jnp.asarray(step))), expected, rtol=1e-6)


def test_warmup_linear_endpoints():
    lr_at = warmup_linear_lr(1e-3, max_epochs=50, warmup_iters=0)
    np.testing.assert_allclose(lr_at(1), 1e-3)
    np.testing.assert_allclose(lr_at(50), 0.0, atol=1e-12)
    assert lr_at(25) < lr_at(10)


def test_bf16_moments_trajectory_close():
    """TPU.BF16_MOMENTS stores Adam's first moment in bf16; short-horizon
    training must track the fp32-state trajectory closely (and the moment
    buffers must actually be bf16)."""
    import jax
    import optax
    from demo2_tpu.solver.optim import make_optimizer

    def run(bf16):
        cfg = get_cfg_defaults()
        cfg.SOLVER.OPTIMIZER_NAME = "Adam"
        cfg.SOLVER.BASE_LR = 1e-3
        cfg.SOLVER.WARMUP_ITERS = 0
        cfg.TPU.BF16_MOMENTS = bf16
        cfg.freeze()
        params = {
            "w": jnp.ones((16, 16), jnp.float32) * 0.5,
            "bias": jnp.zeros((16,), jnp.float32),
        }
        tx, _, _ = make_optimizer(cfg, params, steps_per_epoch=10)
        opt = tx.init(params)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 16))

        @jax.jit
        def step(params, opt):
            def loss(p):
                y = x @ p["w"] + p["bias"]
                return jnp.mean(jnp.square(y - 1.0))

            l, g = jax.value_and_grad(loss)(params)
            up, opt = tx.update(g, opt, params)
            return jax.tree_util.tree_map(lambda a, u: a + u, params, up), opt, l

        for _ in range(30):
            params, opt, l = step(params, opt)
        return params, opt, float(l)

    p32, _, l32 = run(False)
    pbf, opt_bf, lbf = run(True)
    mus = [
        leaf
        for leaf in jax.tree_util.tree_leaves(opt_bf)
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.bfloat16
    ]
    assert mus, "no bf16 moment buffers found with TPU.BF16_MOMENTS"
    np.testing.assert_allclose(l32, lbf, rtol=2e-2, atol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(p32), jax.tree_util.tree_leaves(pbf)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_bf16_second_moment_trajectory_close():
    """TPU.BF16_SECOND_MOMENT stores Adam's nu in bf16 as well
    (solver/optim.py::scale_by_adam_mixed); trajectories must stay close to
    the full-fp32 state, mu AND nu buffers must actually be bf16, and the
    flag must refuse to run without BF16_MOMENTS."""
    import jax
    import pytest
    from demo2_tpu.solver.optim import make_optimizer

    def run(mode):
        cfg = get_cfg_defaults()
        cfg.SOLVER.OPTIMIZER_NAME = "Adam"
        cfg.SOLVER.BASE_LR = 1e-3
        cfg.SOLVER.WARMUP_ITERS = 0
        cfg.TPU.BF16_MOMENTS = mode >= 1
        cfg.TPU.BF16_SECOND_MOMENT = mode == 2
        cfg.freeze()
        params = {
            "w": jnp.ones((16, 16), jnp.float32) * 0.5,
            "bias": jnp.zeros((16,), jnp.float32),
        }
        tx, _, _ = make_optimizer(cfg, params, steps_per_epoch=10)
        opt = tx.init(params)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 16))

        @jax.jit
        def step(params, opt):
            def loss(p):
                y = x @ p["w"] + p["bias"]
                return jnp.mean(jnp.square(y - 1.0))

            l, g = jax.value_and_grad(loss)(params)
            up, opt = tx.update(g, opt, params)
            return jax.tree_util.tree_map(lambda a, u: a + u, params, up), opt, l

        for _ in range(30):
            params, opt, l = step(params, opt)
        return params, opt, float(l)

    p32, _, l32 = run(0)
    pnu, opt_nu, lnu = run(2)
    n_bf16 = sum(
        1
        for leaf in jax.tree_util.tree_leaves(opt_nu)
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.bfloat16
    )
    assert n_bf16 == 4, f"expected mu+nu x 2 leaves in bf16, got {n_bf16}"
    np.testing.assert_allclose(l32, lnu, rtol=3e-2, atol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(p32), jax.tree_util.tree_leaves(pnu)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=8e-3)

    cfg = get_cfg_defaults()
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.TPU.BF16_SECOND_MOMENT = True  # without BF16_MOMENTS
    cfg.freeze()
    params = {"w": jnp.zeros((2, 2), jnp.float32)}
    with pytest.raises(ValueError, match="BF16_SECOND_MOMENT"):
        make_optimizer(cfg, params, steps_per_epoch=10)


def test_scale_by_adam_mixed_fp32_matches_optax():
    """With fp32 storage, scale_by_adam_mixed must reproduce
    optax.scale_by_adam step-for-step (same rule, only storage dtype knobs)."""
    import jax
    import optax
    from demo2_tpu.solver.optim import scale_by_adam_mixed

    params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)), jnp.float32)}
    g = {"w": jnp.asarray(np.random.default_rng(1).normal(size=(8, 8)), jnp.float32)}
    tx_a = scale_by_adam_mixed()
    tx_b = optax.scale_by_adam()
    sa, sb = tx_a.init(params), tx_b.init(params)
    for i in range(5):
        gi = jax.tree_util.tree_map(lambda x: x * (0.5 + 0.1 * i), g)
        ua, sa = tx_a.update(gi, sa, params)
        ub, sb = tx_b.update(gi, sb, params)
        np.testing.assert_allclose(
            np.asarray(ua["w"]), np.asarray(ub["w"]), rtol=1e-5, atol=1e-6
        )


def test_timm_cosine_schedule_golden_vs_reference():
    """timm_cosine_lr matches the reference's dormant CosineLRScheduler
    epoch-for-epoch, including the seeded LR noise, under the exact recipe of
    the commented-out factory path (scheduler_factory.py:21-48)."""
    import torch

    from ref_loader import load_ref
    from demo2_tpu.solver.optim import timm_cosine_lr

    ref_mod = load_ref("solver.cosine_lr")
    base_lr, epochs, warmup = 3.5e-4, 24, 5
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    ref = ref_mod.CosineLRScheduler(
        opt, t_initial=epochs, lr_min=0.001 * base_lr, t_mul=1.0,
        decay_rate=0.1, warmup_lr_init=0.1 * base_lr, warmup_t=warmup,
        cycle_limit=1, t_in_epochs=True, noise_range_t=(0, epochs),
        noise_pct=0.67, noise_std=1.0, noise_seed=42,
    )
    ours = timm_cosine_lr(
        base_lr, t_initial=epochs, lr_min=0.001 * base_lr, decay_rate=0.1,
        warmup_t=warmup, warmup_lr_init=0.1 * base_lr, cycle_limit=1,
        noise_range_t=(0, epochs),
    )
    for epoch in range(epochs + 4):
        ref.step(epoch)
        want = opt.param_groups[0]["lr"]
        got = ours(epoch)
        assert abs(got - want) < 1e-12, (epoch, got, want)


def test_cosine_schedule_reachable_from_config():
    """TPU.ENABLE_COSINE_SCHEDULE routes make_lr_schedule to the cosine rule
    (default stays warmup-multistep, mirroring the reference factory)."""
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.solver.optim import make_lr_schedule

    cfg = get_cfg_defaults()
    cfg.SOLVER.MAX_EPOCHS = 10
    cfg.freeze()
    default = make_lr_schedule(cfg, steps_per_epoch=10)

    cfg2 = get_cfg_defaults()
    cfg2.SOLVER.MAX_EPOCHS = 10
    cfg2.TPU.ENABLE_COSINE_SCHEDULE = True
    cfg2.freeze()
    cosine = make_lr_schedule(cfg2, steps_per_epoch=10)
    # warmup epochs 1..4 differ: multistep uses warmup_factor blending to
    # BASE_LR, cosine ramps from 0.1*BASE_LR with per-epoch noise.
    assert default(0) != cosine(0) or default(50) != cosine(50)


def test_cosine_noise_numpy_fallback(monkeypatch):
    """Torch-free deployments (ADVICE r3): the cosine schedule's LR-noise
    branch falls back to a numpy N(0,1) draw — same rejection semantics
    (|noise| < pct), deterministic per epoch, not the torch bit stream."""
    import builtins

    from demo2_tpu.solver.optim import timm_cosine_lr

    real_import = builtins.__import__

    def no_torch(name, *a, **k):
        if name == "torch":
            raise ImportError("torch disabled for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    lr_at = timm_cosine_lr(
        1e-3, t_initial=10, lr_min=1e-6, warmup_t=0, noise_range_t=(0, 10),
        noise_pct=0.67,
    )
    vals = [lr_at(t) for t in range(10)]
    assert vals == [lr_at(t) for t in range(10)]  # per-t deterministic
    # |noise| < pct bound: lr in (base*(1-pct), base*(1+pct)) around the
    # noiseless cosine value.
    monkeypatch.setattr(builtins, "__import__", real_import)
    clean = timm_cosine_lr(1e-3, t_initial=10, lr_min=1e-6, warmup_t=0)
    for t, v in enumerate(vals):
        c = clean(t)
        assert abs(v - c) < 0.67 * c + 1e-12


def test_adamw_respects_bias_decay_override():
    """AdamW must use the same bias -> WEIGHT_DECAY_BIAS grouping as
    Adam/SGD (reference builds param groups BEFORE picking the optimizer,
    make_optimizer.py:11-13; review round 4: AdamW decayed everything)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.solver.optim import make_optimizer

    cfg = get_cfg_defaults()
    cfg.SOLVER.OPTIMIZER_NAME = "AdamW"
    cfg.SOLVER.WEIGHT_DECAY = 0.1
    cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}}
    tx, _, _ = make_optimizer(cfg, params, steps_per_epoch=10)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    # Zero grads: the only update source is decoupled weight decay.
    assert float(jnp.abs(updates["dense"]["kernel"]).max()) > 0.0
    np.testing.assert_allclose(np.asarray(updates["dense"]["bias"]), 0.0)
