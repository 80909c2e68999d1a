"""Optimizer + LR schedule factory (optax).

Reference: solver/make_optimizer.py:4-28 (per-param weight-decay override for
bias keys, optional 2x classifier LR, SGD/Adam/AdamW), solver/lr_scheduler.py
(WarmupMultiStepLR :14-73, WarmupLinearLR :76-157), scheduler_factory.py:7-17
(always returns the warmup-multistep scheduler, stepped once per EPOCH at
engine/processor.py:54 with `scheduler.step(epoch)`, epoch starting at 1).

Torch-parity notes:
  * Adam/SGD weight decay is L2-added-to-gradient (not decoupled), so the
    decay transform runs BEFORE the moment updates; AdamW is decoupled;
  * the schedule is epoch-granular: lr(step) = lr_at_epoch(1 + step //
    steps_per_epoch), matching the reference's step(epoch)-at-epoch-start.
"""

from __future__ import annotations

import bisect
import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from ..config.defaults import Config


def warmup_multistep_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 0.01,
    warmup_iters: int = 10,
    warmup_method: str = "linear",
) -> Callable[[int], float]:
    """lr(epoch) per WarmupMultiStepLR.get_lr (lr_scheduler.py:43-56)."""
    ms = sorted(milestones)

    def lr_at(epoch: int) -> float:
        wf = 1.0
        if epoch < warmup_iters:
            if warmup_method == "constant":
                wf = warmup_factor
            else:
                alpha = epoch / warmup_iters
                wf = warmup_factor * (1 - alpha) + alpha
        return base_lr * wf * gamma ** bisect.bisect_right(ms, epoch)

    return lr_at


def warmup_linear_lr(
    base_lr: float,
    max_epochs: int,
    warmup_factor: float = 0.01,
    warmup_iters: int = 0,
    warmup_method: str = "linear",
    min_lr: float = 0.0,
) -> Callable[[int], float]:
    """lr(epoch) per WarmupLinearLR (lr_scheduler.py:76-157)."""

    def lr_at(epoch: int) -> float:
        wf = 1.0
        if epoch < warmup_iters:
            if warmup_method == "constant":
                wf = warmup_factor
            else:
                alpha = epoch / float(warmup_iters)
                wf = warmup_factor * (1 - alpha) + alpha
        if epoch <= warmup_iters:
            decay = 1.0
        else:
            eff = max_epochs - warmup_iters
            if eff <= 1:
                decay = 0.0
            else:
                decay = max(1.0 - (epoch - warmup_iters - 1) / float(eff - 1), 0.0)
        return max(min_lr, base_lr * wf * decay)

    return lr_at


def timm_cosine_lr(
    base_lr: float,
    t_initial: int,
    lr_min: float = 0.0,
    decay_rate: float = 1.0,
    warmup_t: int = 0,
    warmup_lr_init: float = 0.0,
    cycle_limit: int = 0,
    noise_range_t=None,
    noise_pct: float = 0.67,
    noise_seed: int = 42,
) -> Callable[[int], float]:
    """lr(epoch) per the timm CosineLRScheduler the reference keeps for its
    commented-out factory path (solver/cosine_lr.py:67-94 with t_mul=1,
    warmup_prefix=False; noise: solver/scheduler.py:87-105, normal type with
    the resample-within-pct loop on a per-t seeded generator).

    The noise branch prefers torch (bit-parity with the reference's timm
    generator, golden-tested) but falls back to a numpy N(0,1) draw when
    torch is absent — the package stays torch-free on every path (same
    convention as utils/converters.py).
    """

    def lr_at(t: int) -> float:
        if warmup_t and t < warmup_t:
            lr = warmup_lr_init + t * (base_lr - warmup_lr_init) / warmup_t
        else:
            i = t // t_initial
            t_curr = t - t_initial * i
            gamma = decay_rate**i
            if cycle_limit == 0 or i < cycle_limit:
                lr = lr_min * gamma + 0.5 * (base_lr * gamma - lr_min * gamma) * (
                    1 + math.cos(math.pi * t_curr / t_initial)
                )
            else:
                lr = lr_min
        if noise_range_t is not None and noise_range_t[0] <= t < noise_range_t[1]:
            try:
                # torch.Generator+randn for bit-parity with the reference's
                # timm scheduler when torch is present (golden-tested).
                import torch

                g = torch.Generator()
                g.manual_seed(noise_seed + t)

                def draw():
                    return torch.randn(1, generator=g).item()
            except ImportError:
                # Torch-free deployments: same per-t-seeded N(0,1) +
                # rejection loop via numpy.  The noise VALUES differ from
                # torch's (different bit stream) — it's a stochastic LR
                # perturbation knob, not a reproducibility surface.
                import numpy as _np

                g = _np.random.default_rng(noise_seed + t)

                def draw():
                    return float(g.standard_normal())

            while True:
                noise = draw()
                if abs(noise) < noise_pct:
                    break
            lr = lr + lr * noise
        return lr

    return lr_at


def make_lr_schedule(cfg: Config, steps_per_epoch: int) -> Callable[[Any], Any]:
    """Step-indexed schedule delegating to the epoch-granular rule.

    The reference's `create_scheduler` ALWAYS returns WarmupMultiStepLR
    regardless of SOLVER.LR_SCHEDULER (scheduler_factory.py:7-17; the cosine
    block is commented out) — mirrored by default.  Setting
    ``TPU.ENABLE_COSINE_SCHEDULE`` makes SOLVER.LR_SCHEDULER='cosine'
    functional with the exact recipe of that commented block
    (scheduler_factory.py:21-48: lr_min=0.001*base, warmup_lr_init=0.1*base,
    decay_rate=0.1, cycle_limit=1, seeded LR noise over all epochs).
    """
    if cfg.TPU.ENABLE_COSINE_SCHEDULE and cfg.SOLVER.LR_SCHEDULER == "cosine":
        lr_at = timm_cosine_lr(
            cfg.SOLVER.BASE_LR,
            t_initial=cfg.SOLVER.MAX_EPOCHS,
            lr_min=0.001 * cfg.SOLVER.BASE_LR,
            decay_rate=0.1,
            warmup_t=cfg.SOLVER.WARMUP_ITERS,
            warmup_lr_init=0.1 * cfg.SOLVER.BASE_LR,
            cycle_limit=1,
            noise_range_t=(0, cfg.SOLVER.MAX_EPOCHS),
        )
    else:
        lr_at = warmup_multistep_lr(
            cfg.SOLVER.BASE_LR,
            cfg.SOLVER.STEPS,
            cfg.SOLVER.GAMMA,
            cfg.SOLVER.WARMUP_FACTOR,
            cfg.SOLVER.WARMUP_ITERS,
            cfg.SOLVER.WARMUP_METHOD,
        )
    # Precompute a dense epoch->lr table so the schedule works on traced steps.
    max_epochs = cfg.SOLVER.MAX_EPOCHS + 2
    host_table = [float(jnp.float32(lr_at(e))) for e in range(max_epochs)]
    table = jnp.asarray(host_table, jnp.float32)

    def schedule(step):
        if not isinstance(step, jax.core.Tracer):
            # Host fast path: logging calls pass a concrete Python int; a jnp
            # lookup here would be a device dispatch (a full round trip on the
            # remote-execution tunnel, ~140 ms — measured in do_train, see
            # docs/PERF.md round 3).  Values match `table` exactly (both fp32).
            e = min(1 + int(step) // steps_per_epoch, max_epochs - 1)
            return host_table[e]
        epoch = jnp.minimum(1 + step // steps_per_epoch, max_epochs - 1)
        return table[epoch]

    return schedule


def scale_by_adam_mixed(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=None,
    nu_dtype=None,
) -> optax.GradientTransformation:
    """scale_by_adam with independently chosen moment STORAGE dtypes.

    optax only exposes ``mu_dtype``; this adds ``nu_dtype`` so the second
    moment can live in bf16 too (the last measured optimizer-HBM headroom,
    docs/NEXT.md).  All arithmetic runs in fp32 — moments are cast up on
    read and down on write, so only storage precision changes.  Update rule
    is Adam with bias correction, identical to optax.scale_by_adam
    (reference optimizer: solver/make_optimizer.py:4-28, torch.optim.Adam).

    bf16 nu risk (why this is a flag, not the default): with b2=0.999 the
    per-step increment (1-b2)*g^2 is ~2^-10 of nu, right at bf16's 8-bit
    mantissa resolution, so nu can freeze for stationary gradients.  Gated
    by the same trajectory-closeness test as the first moment
    (tests/test_solver.py).
    """

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params
        )
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        mu = jax.tree_util.tree_map(
            lambda g, m: (
                b1 * m.astype(jnp.float32) + (1.0 - b1) * g.astype(jnp.float32)
            ).astype(m.dtype),
            updates,
            state.mu,
        )
        nu = jax.tree_util.tree_map(
            lambda g, v: (
                b2 * v.astype(jnp.float32)
                + (1.0 - b2) * jnp.square(g.astype(jnp.float32))
            ).astype(v.dtype),
            updates,
            state.nu,
        )
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree_util.tree_map(
            lambda m, v: (
                (m.astype(jnp.float32) / c1)
                / (jnp.sqrt(v.astype(jnp.float32) / c2) + eps)
            ).astype(m.dtype if mu_dtype is None else jnp.float32),
            mu,
            nu,
        )
        return new_updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _key_str(k) -> str:
    return str(getattr(k, "key", getattr(k, "name", k))).lower()


def _is_bias(path) -> bool:
    return any("bias" in _key_str(k) for k in path[-1:])


def make_optimizer(cfg: Config, params, steps_per_epoch: int):
    """Build the optax chain for model params (+ the center-loss SGD).

    Mirrors make_optimizer.py: bias keys use WEIGHT_DECAY_BIAS, classifier
    keys optionally get 2x LR (LARGE_FC_LR), optimizer selected by
    SOLVER.OPTIMIZER_NAME.
    """
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
    name = cfg.SOLVER.OPTIMIZER_NAME

    bias_mask = jax.tree_util.tree_map_with_path(lambda p, _: _is_bias(p), params)
    nonbias_mask = jax.tree_util.tree_map(lambda b: not b, bias_mask)

    def classifier_scale():
        if not cfg.SOLVER.LARGE_FC_LR:
            return optax.identity()
        cls_mask = jax.tree_util.tree_map_with_path(
            lambda p, _: any("classifier" in _key_str(k) for k in p), params
        )
        return optax.masked(optax.scale(2.0), cls_mask)

    # TPU knobs: bf16 moment STORAGE (arithmetic stays fp32) — OFF by
    # default for exact reference parity (full-fp32 Adam state).
    mu_dtype = jnp.bfloat16 if cfg.TPU.BF16_MOMENTS else None
    nu_dtype = jnp.bfloat16 if cfg.TPU.BF16_SECOND_MOMENT else None
    if nu_dtype is not None and mu_dtype is None:
        raise ValueError("TPU.BF16_SECOND_MOMENT requires TPU.BF16_MOMENTS")

    def adam_core():
        if nu_dtype is not None:
            return scale_by_adam_mixed(mu_dtype=mu_dtype, nu_dtype=nu_dtype)
        return optax.scale_by_adam(mu_dtype=mu_dtype)

    if name == "AdamW":
        # Decoupled decay, SAME per-param grouping as Adam/SGD: the
        # reference builds bias -> WEIGHT_DECAY_BIAS groups BEFORE choosing
        # the optimizer (make_optimizer.py:11-13), so torch AdamW decays
        # biases at wd_bias, not wd (review round 4).
        tx = optax.chain(
            adam_core(),
            optax.masked(optax.add_decayed_weights(wd), nonbias_mask),
            optax.masked(optax.add_decayed_weights(wd_bias), bias_mask),
            classifier_scale(),
            optax.scale_by_schedule(lambda s: -schedule(s)),
        )
    elif name == "Adam":
        tx = optax.chain(
            optax.masked(optax.add_decayed_weights(wd), nonbias_mask),
            optax.masked(optax.add_decayed_weights(wd_bias), bias_mask),
            adam_core(),
            classifier_scale(),
            optax.scale_by_schedule(lambda s: -schedule(s)),
        )
    elif name == "SGD":
        tx = optax.chain(
            optax.masked(optax.add_decayed_weights(wd), nonbias_mask),
            optax.masked(optax.add_decayed_weights(wd_bias), bias_mask),
            optax.trace(decay=cfg.SOLVER.MOMENTUM),
            classifier_scale(),
            optax.scale_by_schedule(lambda s: -schedule(s)),
        )
    else:
        raise ValueError(f"Unsupported optimizer: {name}")

    if cfg.MODEL.FROZEN:
        # `mark_only_lora_as_trainable` equivalent (reference: clip/LoRA.py
        # :307-316, meta_arch.py:61-62): zero updates for backbone params
        # except the adapters.  NOTE the reference function literally
        # exempts params named 'adapter' (the MambaPro FFN adapters) — so
        # FROZEN+ADAPTER trains adapters there; 'lora' is our extension on
        # top (the reference never instantiates its LoRA layers).
        def _frozen(path, _):
            keys = [_key_str(k) for k in path]
            in_backbone = len(keys) >= 2 and keys[0] == "backbone" and keys[1] == "base"
            exempt = any(("lora" in k) or ("adapter" in k) for k in keys)
            return in_backbone and not exempt

        frozen_mask = jax.tree_util.tree_map_with_path(_frozen, params)
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_mask))

    center_tx = optax.sgd(cfg.SOLVER.CENTER_LR)
    return tx, center_tx, schedule
