"""Training engine: jitted data-parallel train step + epoch loop.

Reference: engine/processor.py `do_train` (:12-189) — epoch loop, AMP
autocast, the variable-length output protocol (:67-101), SDTPS branch
weighting (:86-87), per-iter meters, eval every EVAL_PERIOD with pattern
1/2/3 for moe configs (:145-156), best-mAP checkpointing (:157-168).

TPU-first redesign:
  * one jitted `train_step` under a data-parallel mesh (pjit semantics):
    batch sharded over 'data', params replicated, gradient all-reduce by XLA
    over ICI; BatchNorm batch statistics are GLOBAL-batch (jnp reductions
    over the sharded axis lower to psum);
  * bf16 compute replaces fp16 AMP + GradScaler — no loss scaling needed;
  * the loss walks the model's named-branch dict instead of positional
    tuples; the reference's "first pair x SDTPS_LOSS_WEIGHT" rule is kept
    (losses.branch_weights);
  * donated state buffers keep HBM flat.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config.defaults import Config
from ..losses.losses import branch_weights, center_loss, make_loss_fn
from ..parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from .state import TrainState

logger = logging.getLogger("DeMo")


def build_train_step(cfg: Config, model, tx, center_tx, mesh=None, donate: bool = True,
                     scan_steps: int = 0, device_cache=None):
    """Jitted data-parallel train step.

    With ``scan_steps=K > 0`` the returned function consumes K stacked
    microbatches ``(K, B, ...)`` and runs K optimizer steps in ONE dispatch
    via `lax.scan` — amortizing the per-dispatch overhead of the remote
    execution tunnel (~1-3 ms, docs/PERF.md) that a Python-loop driver pays
    per step. Metrics are averaged over the K steps.

    With ``device_cache`` (data/device_cache.DeviceCache) the step takes
    ``(state, cache_images, cache_pids, cache_camids, cache_viewids, idx,
    rng)``: it gathers the batch from the HBM-resident uint8 cache and runs
    the random augmentations in-graph, so the only per-step host->device
    transfer is the (B,) int32 index vector.  Cache arrays are jit ARGUMENTS
    (a closure would embed ~400 MB as HLO literals and break remote compile,
    docs/PERF.md).
    """
    loss_fn_branch = make_loss_fn(cfg, model.num_classes)
    use_center = "center" in cfg.MODEL.METRIC_LOSS_TYPE
    center_w = cfg.SOLVER.CENTER_LOSS_WEIGHT
    lif_w = cfg.MODEL.LIF_LOSS_WEIGHT

    def train_step(state: TrainState, images, pids, camids, viewids, rng):
        rng_drop, rng_gumbel = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_of(params, centers):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                camids,
                viewids,
                None,
                train=True,
                rngs={"dropout": rng_drop, "gumbel": rng_gumbel},
                mutable=["batch_stats"],
            )
            branches = out["branches"]
            weights = branch_weights(cfg, branches.keys())
            total = 0.0
            first_logits = None
            for name, (logits, feat) in branches.items():
                if first_logits is None:
                    first_logits = logits
                total = total + weights[name] * loss_fn_branch(logits, feat, pids)
            for aux_name, aux_val in out["aux_loss"].items():
                w = lif_w if aux_name == "lif" else 1.0
                total = total + w * aux_val
            if use_center and centers is not None:
                # Center loss on the first branch's feature (dormant by
                # default; reference: make_loss.py:15-16, processor.py:106-110).
                # The reference hardcodes feat_dim=2048 centers (make_loss.py
                # :15); compare over min(dims) so narrower backbones
                # (osnet 512, deit_small 384) don't crash the broadcast.
                first_feat = next(iter(branches.values()))[1]
                cdim = min(centers.shape[-1], first_feat.shape[-1])
                total = total + center_w * center_loss(
                    centers[:, :cdim], first_feat[..., :cdim], pids
                )
            acc = jnp.mean((jnp.argmax(first_logits, -1) == pids).astype(jnp.float32))
            return total, (mutated["batch_stats"], acc)

        if use_center and state.centers is not None:
            (loss, (new_bs, acc)), (grads, cgrads) = jax.value_and_grad(
                loss_of, argnums=(0, 1), has_aux=True
            )(state.params, state.centers)
            # Reference rescales center grads by 1/CENTER_LOSS_WEIGHT
            # (processor.py:106-110).
            cgrads = jax.tree_util.tree_map(lambda g: g / center_w, cgrads)
            cupdates, new_copt = center_tx.update(cgrads, state.center_opt_state)
            new_centers = jax.tree_util.tree_map(
                lambda p, u: p + u, state.centers, cupdates
            )
        else:
            (loss, (new_bs, acc)), grads = jax.value_and_grad(loss_of, has_aux=True)(
                state.params, state.centers
            )
            new_centers, new_copt = state.centers, state.center_opt_state

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            centers=new_centers,
            center_opt_state=new_copt,
        )
        metrics = {"loss": loss, "acc": acc}
        return new_state, metrics

    if device_cache is not None:
        from ..data.device_cache import augment_batch

        dc = device_cache
        take = functools.partial(jnp.take, axis=0, mode="clip")
        # Images enter the model through dtype-casting flax modules, so
        # pre-casting to the compute dtype is bit-identical — and halves the
        # pipelined carry's HBM traffic on the bf16 path.  Resolution MUST
        # match the model's own rule (models/demo.py::_dtype_of), not a
        # second ad-hoc mapping.
        from ..models.demo import _dtype_of

        cdtype = _dtype_of(cfg)

        def _augment(cimg, idx, step, rng):
            key = jax.random.fold_in(jax.random.fold_in(rng, step), 0xA06)
            # idx is passed THROUGH so the sample gather fuses with the row
            # gather (short gather rows; see apply_augment) — gathering the
            # whole samples here first costs a 2.3 GB/step cache slice.
            out = augment_batch(
                cimg, key, dc.size, dc.mean, dc.std,
                dc.flip_prob, dc.padding, dc.re_prob, idx=idx,
            )
            return out if cdtype == jnp.float32 else out.astype(cdtype)

        def train_step_cached(state, cimg, cpid, ccam, cview, idx, rng):
            images = _augment(cimg, idx, state.step, rng)
            return train_step(
                state, images, take(cpid, idx), take(ccam, idx), take(cview, idx), rng
            )

        if scan_steps and scan_steps > 0 and not getattr(
            cfg.TPU, "PIPELINED_AUGMENT", False
        ):
            # Round-3 layout (A/B baseline): augment serially inside each
            # scan iteration, directly in front of the model step.
            def train_scan_cached(state, cimg, cpid, ccam, cview, idx_k, rng):
                def body(carry, idx):
                    return train_step_cached(carry, cimg, cpid, ccam, cview, idx, rng)

                state, metrics = jax.lax.scan(body, state, idx_k, length=scan_steps)
                return state, jax.tree_util.tree_map(jnp.mean, metrics)

            fn, idx_rank2 = train_scan_cached, True
        elif scan_steps and scan_steps > 0:
            # Software-pipelined augmentation: iteration i's scan body
            # augments batch i+1 while the model step consumes the images
            # carried from iteration i-1 — the VPU-bound gather/flip/crop/
            # erase overlaps the MXU-bound fwd/bwd instead of serializing in
            # front of it (the measured ~6% in-graph augment cost,
            # docs/PERF.md).  The per-step key stream is UNCHANGED
            # (fold_in(rng, step) at the step that consumes the batch), so
            # the training trajectory is bit-identical to the per-step path
            # (tests/test_device_cache.py scan-vs-loop).
            def train_scan_cached(state, cimg, cpid, ccam, cview, idx_k, rng):
                imgs0 = _augment(cimg, idx_k[0], state.step, rng)

                def body(carry, xs):
                    st, imgs = carry
                    idx_cur, idx_nxt = xs
                    imgs_nxt = _augment(cimg, idx_nxt, st.step + 1, rng)
                    new_st, metrics = train_step(
                        st, imgs, take(cpid, idx_cur), take(ccam, idx_cur),
                        take(cview, idx_cur), rng,
                    )
                    return (new_st, imgs_nxt), metrics

                # Last iteration's prefetch target: its own batch (the extra
                # augment result leaves in the discarded final carry).
                idx_nxt_k = jnp.concatenate([idx_k[1:], idx_k[-1:]], axis=0)
                (state, _), metrics = jax.lax.scan(
                    body, (state, imgs0), (idx_k, idx_nxt_k), length=scan_steps
                )
                return state, jax.tree_util.tree_map(jnp.mean, metrics)

            fn, idx_rank2 = train_scan_cached, True
        else:
            fn, idx_rank2 = train_step_cached, False

        if mesh is not None:
            repl = replicated_sharding(mesh)
            ish = (
                NamedSharding(mesh, P(None, "data")) if idx_rank2
                else batch_sharding(mesh)
            )
            return jax.jit(
                fn,
                in_shardings=(repl, repl, repl, repl, repl, ish, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,) if donate else (),
            )
        return jax.jit(fn, donate_argnums=(0,) if donate else ())

    if scan_steps and scan_steps > 0:

        def train_scan(state: TrainState, images, pids, camids, viewids, rng):
            def body(carry, xs):
                im, pid, cam, view = xs
                new_state, metrics = train_step(carry, im, pid, cam, view, rng)
                return new_state, metrics

            state, metrics = jax.lax.scan(
                body, state, (images, pids, camids, viewids), length=scan_steps
            )
            return state, jax.tree_util.tree_map(jnp.mean, metrics)

        if mesh is not None:
            repl = replicated_sharding(mesh)
            ksh = NamedSharding(mesh, P(None, "data"))
            return jax.jit(
                train_scan,
                in_shardings=(repl, ksh, ksh, ksh, ksh, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,) if donate else (),
            )
        return jax.jit(train_scan, donate_argnums=(0,) if donate else ())

    if mesh is not None:
        repl = replicated_sharding(mesh)
        bsh = batch_sharding(mesh)
        return jax.jit(
            train_step,
            in_shardings=(repl, bsh, bsh, bsh, bsh, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def device_prefetch(batch_iter, mesh, depth: int = 2):
    """Overlap host->device transfer with compute.

    Wraps a host batch iterator; each batch's arrays are device_put with the
    batch sharding ahead of use (the reference's pinned-memory + worker
    overlap, data side of processor.py:59-64).
    """
    import collections

    from ..parallel.mesh import batch_sharding

    sh = batch_sharding(mesh) if mesh is not None else None

    def put(b):
        dev = lambda x: jax.device_put(x, sh) if sh is not None else jnp.asarray(x)
        return (
            dev(b.images), dev(b.pids), dev(b.camids), dev(b.viewids), b,
        )

    queue = collections.deque()
    for b in batch_iter:
        queue.append(put(b))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def do_train(
    cfg: Config,
    model,
    state: TrainState,
    tx,
    center_tx,
    train_pipe,
    sampler,
    val_pipe,
    num_query: int,
    schedule=None,
    mesh=None,
    writer=None,
    checkpoint_dir: Optional[str] = None,
):
    """Epoch loop (reference: processor.py:12-189)."""
    from .eval import build_eval_step, run_eval
    from ..utils.checkpoint import save_checkpoint

    epochs = cfg.SOLVER.MAX_EPOCHS
    log_period = cfg.SOLVER.LOG_PERIOD
    eval_period = cfg.SOLVER.EVAL_PERIOD
    ckpt_period = cfg.SOLVER.CHECKPOINT_PERIOD  # periodic save + resume — the
    # reference defines this knob but never implements it (SURVEY §5)

    if mesh is None:
        mesh = make_mesh(cfg.TPU.NUM_DEVICES)
    use_cache = cfg.TPU.DATA_CACHE == "device"
    train_cache = val_cache = None
    if use_cache:
        from ..data.device_cache import build_device_cache

        train_cache = build_device_cache(train_pipe, mesh, train=True)
        logger.info("device cache: decoded %d train samples once in %.1fs",
                    len(train_pipe.samples), train_cache.decode_seconds)
        if val_pipe is not None:
            val_cache = build_device_cache(val_pipe, mesh, train=False)
            logger.info("device cache: decoded %d val samples once in %.1fs",
                        len(val_pipe.samples), val_cache.decode_seconds)
    train_step = build_train_step(
        cfg, model, tx, center_tx, mesh, donate=cfg.TPU.DONATE_STATE,
        device_cache=train_cache,
    )
    eval_step = build_eval_step(cfg, model, mesh, device_cache=val_cache)
    rng = jax.random.PRNGKey(cfg.SOLVER.SEED)

    use_moe_eval = cfg.MODEL.HDM or cfg.MODEL.ATM or cfg.MODEL.USE_SDTPS
    best = {"mAP": 0.0, "Rank-1": 0.0, "Rank-5": 0.0, "Rank-10": 0.0}

    # Resume: steps already taken determine the starting epoch.
    steps_per_epoch = max(1, len(sampler) // train_pipe.batch_size)
    start_epoch = 1 + int(state.step) // steps_per_epoch

    # One input path for single- and multi-host: every process computes the
    # same global PK order from the shared (seed, epoch) and feeds exactly
    # its addressable devices' rows (parallel/multihost.py; the reference's
    # sampler_ddp.py:117-201 strided slice, driven by the sharding itself).
    from ..parallel.multihost import HostShardedBatches, is_primary

    train_batches = HostShardedBatches(train_pipe, mesh)
    primary = is_primary()

    from ..parallel.multihost import iter_index_batches

    def _epoch_steps(order, epoch):
        """Yield per-step (state_updater) inputs for either input path."""
        if use_cache:
            for idx_g, _ in iter_index_batches(mesh, order, train_pipe.batch_size):
                yield (
                    state_holder[0], train_cache.images, train_cache.pids,
                    train_cache.camids, train_cache.viewids, idx_g, rng,
                )
        else:
            for gb in train_batches.iter_batches(order, seed=epoch):
                yield (
                    state_holder[0], gb.images, gb.pids, gb.camids, gb.viewids, rng,
                )

    state_holder = [state]

    # Chunked dispatch for the device-cache path: LOG_PERIOD optimizer steps
    # per dispatch via the `scan_steps` train step — ONE (K, B) int32 index
    # transfer and ONE dispatch per K steps, with the metric readback
    # deferred one chunk so logging never stalls the pipeline.  On the
    # remote-execution tunnel, per-step index device_puts + the blocking
    # every-LOG_PERIOD loss readback cost ~35 ms/step (450 vs 599 img/s,
    # docs/PERF.md round 3).  Multi-process keeps per-step dispatch (no
    # tunnel there; index feeding is local).
    chunk = log_period if (use_cache and jax.process_count() == 1) else 0
    train_step_k = (
        build_train_step(
            cfg, model, tx, center_tx, mesh, donate=cfg.TPU.DONATE_STATE,
            scan_steps=chunk, device_cache=train_cache,
        )
        if chunk > 1 else None
    )

    # Epoch tails (steps % chunk) get their own scan-step executable so the
    # tail never falls back to per-step dispatch (each per-step call pays an
    # index device_put + dispatch on the tunnel; the tail size is constant
    # across epochs, so this is ONE extra compile, persistent-cached).
    tail_fns: Dict[int, Any] = {}

    def _scan_fn(k):
        if k == chunk:
            return train_step_k
        if k not in tail_fns:
            tail_fns[k] = build_train_step(
                cfg, model, tx, center_tx, mesh, donate=cfg.TPU.DONATE_STATE,
                scan_steps=k, device_cache=train_cache,
            )
        return tail_fns[k]

    def _run_epoch_chunked(state, order, epoch, async_log):
        bs = train_pipe.batch_size
        steps = len(order) // bs
        idx_all = np.asarray(order[: steps * bs], np.int32).reshape(steps, bs)
        cargs = (train_cache.images, train_cache.pids, train_cache.camids,
                 train_cache.viewids)
        step0 = int(state.step)  # one readback per epoch
        losses, accs = [], []

        def flush(it, gstep, m):
            # Runs on the async-writer thread: the readback blocks on tunnel
            # RTT there, not on the dispatch thread.  ONE device_get for the
            # whole metrics dict — each float(jax.Array) is a separate
            # transfer holding the client lock, and this closure used four.
            if not primary:
                return
            m = jax.device_get(m)
            lr = float(schedule(gstep)) if schedule else 0.0
            logger.info(
                "Epoch[%d] Iteration[%d] Loss: %.3f, Acc: %.3f, Base Lr: %.2e",
                epoch, it, float(m["loss"]), float(m["acc"]), lr,
            )
            if writer is not None:
                writer.add_scalar("Train/Loss", float(m["loss"]), gstep)
                writer.add_scalar("Train/Acc", float(m["acc"]), gstep)
                writer.add_scalar("Train/LR", lr, gstep)

        n_done = 0
        while n_done < steps:
            k = min(chunk, steps - n_done)
            if k > 1:
                idx_k = jnp.asarray(idx_all[n_done : n_done + k])
                state, metrics = _scan_fn(k)(state, *cargs, idx_k, rng)
            else:  # single-step tail
                state, metrics = train_step(
                    state, *cargs, jnp.asarray(idx_all[n_done]), rng
                )
            n_done += k
            # Kick off the device->host DMA for the tiny metrics now, so
            # the async flush's device_get finds the values already on
            # their way instead of issuing a blocking transfer that
            # contends with the next chunk's dispatch for the client.
            for v in metrics.values():
                try:
                    v.copy_to_host_async()
                except AttributeError:
                    break
            async_log.submit(
                functools.partial(flush, n_done, step0 + n_done, metrics)
            )
            losses.append(metrics["loss"])
            accs.append(metrics["acc"])
        return state, losses, accs, steps

    # All per-iteration logging (device-array readback + TB/JSONL writes)
    # runs on a background thread in the chunked path, so the dispatch loop
    # never blocks on tunnel RTTs (docs/PERF.md round 3: the residual
    # do_train-vs-bench gap was exactly this host work).
    from ..utils.metrics_log import AsyncWriter

    async_log = AsyncWriter() if chunk > 1 else None

    for epoch in range(start_epoch, epochs + 1):
        t0 = time.time()
        losses, accs, n_iter = [], [], 0
        order = sampler.epoch_indices(epoch)
        if chunk > 1:
            state, losses, accs, n_iter = _run_epoch_chunked(
                state, order, epoch, async_log
            )
            state_holder[0] = state
        else:
            for args in _epoch_steps(order, epoch):
                state, metrics = train_step(*args)
                state_holder[0] = state
                losses.append(metrics["loss"])
                accs.append(metrics["acc"])
                n_iter += 1
                if n_iter % log_period == 0 and primary:
                    lr = float(schedule(int(state.step))) if schedule else 0.0
                    logger.info(
                        "Epoch[%d] Iteration[%d] Loss: %.3f, Acc: %.3f, Base Lr: %.2e",
                        epoch, n_iter,
                        float(jnp.mean(jnp.stack(losses[-log_period:]))),
                        float(jnp.mean(jnp.stack(accs[-log_period:]))), lr,
                    )
                    if writer is not None:
                        step = int(state.step)
                        writer.add_scalar("Train/Loss", float(metrics["loss"]), step)
                        writer.add_scalar("Train/Acc", float(metrics["acc"]), step)
                        writer.add_scalar("Train/LR", lr, step)
        if n_iter:
            jax.block_until_ready(state.params)
            dt = (time.time() - t0) / n_iter
            if async_log is not None:
                async_log.flush()  # drain iteration lines; keeps log order
            if primary:
                logger.info(
                    "Epoch %d done. Time per batch: %.3f[s] Speed: %.1f[samples/s]",
                    epoch, dt, train_pipe.batch_size / dt,
                )

        # Checkpoint saves run on EVERY process: orbax's save performs
        # global barriers (primary-only would deadlock rank 0; review r4).
        # `mAP >= best` below is computed from the replicated eval output,
        # so all hosts take the best-save branch consistently.
        if checkpoint_dir and ckpt_period and epoch % ckpt_period == 0:
            save_checkpoint(checkpoint_dir, state, step=int(state.step))

        if epoch % eval_period == 0 and val_pipe is not None:
            patterns = (1, 2, 3) if use_moe_eval and (cfg.MODEL.HDM or cfg.MODEL.ATM) else (3,)
            for pat in patterns[:-1]:
                run_eval(cfg, eval_step, state, val_pipe, num_query,
                         return_pattern=pat, mesh=mesh, device_cache=val_cache)
            cmc, mAP = run_eval(
                cfg, eval_step, state, val_pipe, num_query,
                return_pattern=patterns[-1], mesh=mesh, device_cache=val_cache,
            )
            if primary:
                logger.info("Validation Results - Epoch: %d", epoch)
                logger.info("mAP: %.1f%%", mAP * 100)
                for r in (1, 5, 10):
                    logger.info("CMC curve, Rank-%d: %.1f%%", r, cmc[r - 1] * 100)
            if mAP >= best["mAP"]:
                best.update(
                    {"mAP": mAP, "Rank-1": cmc[0], "Rank-5": cmc[4] if len(cmc) > 4 else 0.0,
                     "Rank-10": cmc[9] if len(cmc) > 9 else 0.0}
                )
                if checkpoint_dir:
                    # Best-mAP checkpoint in its own dir so periodic saves
                    # can't evict it (reference keeps best-only, :157-168).
                    save_checkpoint(checkpoint_dir + "_best", state,
                                    step=int(state.step))
            if writer is not None and primary:
                writer.add_scalar("Val/mAP", mAP, epoch)
                writer.add_scalar("Val/Rank-1", float(cmc[0]), epoch)
                writer.add_scalar("Val_Best/mAP", best["mAP"], epoch)
            if primary:
                logger.info("Best mAP: %.1f%%", best["mAP"] * 100)
    if async_log is not None:
        async_log.close()
    return state, best
