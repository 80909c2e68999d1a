"""End-to-end quality cross-check: train the ACTUAL torch reference model and
the JAX model from the SAME initial weights on the SAME SyntheticHard batches
with matched hyperparameters, then compare final mAP (reference evaluator,
`utils/metrics.py::R1_mAP_eval`, for both feature sets).

This is the asset-free derisking of the <=0.2 mAP parity budget (VERDICT
round 1, item 3): it exercises the full training stack — loss weighting
(engine/processor.py:80-98), optimizer/schedule (solver/make_optimizer.py,
solver/scheduler_factory.py), batch-hard triplet, BNNeck heads — not just
eval-mode forwards.

Differences that remain by design: dropout/Gumbel RNG streams (framework-
specific) and fp32 reduction order, so the assertion is a tolerance band on
final mAP, not bitwise trajectory equality.

Run: PYTHONPATH=/root/repo python tools/crosscheck_reference.py
Writes reports/crosscheck.json; numbers land in docs/PARITY.md.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import torch

from ref_loader import load_ref
from test_reference_parity import graft, randomize, torch_sd

from demo2_tpu.config import get_cfg_defaults
from demo2_tpu.data import make_dataloader
from demo2_tpu.engine import create_train_state
from demo2_tpu.engine.eval import build_eval_step
from demo2_tpu.engine.train import build_train_step
from demo2_tpu.models import make_model
from demo2_tpu.utils.ref_convert import convert_demo

EPOCHS = 12

# Per-arch training horizon: the mAP band is asserted AT SATURATION, where
# run-to-run variance is small (~0.9+ mAP on SyntheticHardBig).  The 9-head
# DeMoParallel takes 18 loss-pair gradients per step and saturates by ~12
# epochs; the single-branch arches need ~2-3x longer (measured: demo at 24
# epochs sits mid-transition with mAP variance >0.1, at 36 it is saturated
# and inside the band).
ARCH_EPOCHS = {"demo": 36, "legacy": 24, "parallel": 12, "frca": 36}

from tools.arch_knobs import ARCH_KNOBS  # noqa: E402  (shared w/ quality_gate)


def build_cfg(arch: str = "demo", int8_mlp: str = "off"):
    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "vit_base_patch16_224"
    cfg.INPUT.SIZE_TRAIN = (32, 16)
    cfg.INPUT.SIZE_TEST = (32, 16)
    cfg.MODEL.STRIDE_SIZE = (16, 16)
    cfg.MODEL.SIE_CAMERA = True
    cfg.MODEL.USE_SDTPS = True
    cfg.MODEL.USE_DGAF = True
    cfg.MODEL.DGAF_VERSION = "v3"
    cfg.MODEL.DIRECT = 1
    cfg.MODEL.ID_LOSS_WEIGHT = 0.25
    cfg.MODEL.TRIPLET_LOSS_WEIGHT = 1.0
    for k, v in ARCH_KNOBS[arch].items():
        setattr(cfg.MODEL, k, v)
    cfg.SOLVER.OPTIMIZER_NAME = "Adam"
    cfg.SOLVER.BASE_LR = 3.5e-4
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.STEPS = (100,)
    cfg.SOLVER.MAX_EPOCHS = EPOCHS
    cfg.SOLVER.IMS_PER_BATCH = 16
    cfg.DATALOADER.NUM_INSTANCE = 2
    cfg.TEST.IMS_PER_BATCH = 16
    # ALL arches run on the larger eval split (48 queries/288 gallery):
    # round 2's small split (24/96) left toy-scale mAP noisy enough that
    # FRCA couldn't hold the band at all (VERDICT r2 item 5) and the other
    # arches compared at mAP~0.09; on the big split both frameworks train
    # to ~0.9+ mAP, a far stronger equivalence signal with lower variance.
    cfg.DATASETS.NAMES = "SyntheticHardBig"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.USE_FLASH_ATTENTION = False
    # Sub-bf16 quality gate: train the JAX side with the int8-forward MLP
    # against the fp32 torch reference and report the mAP delta (the
    # reference has no quantized mode — asymmetry is the point).
    cfg.TPU.INT8_MLP = int8_mlp
    cfg.freeze()
    return cfg


def render_data(cfg):
    """Pre-render every train batch (per epoch, deterministic sampler) and
    the full val split as numpy, so torch and JAX consume IDENTICAL pixels."""
    tp, sampler, vp, num_query, nc, cams, views = make_dataloader(cfg)
    train = []
    for ep in range(EPOCHS):
        train.append(list(tp.iter_batches(sampler.epoch_indices(ep), seed=ep)))
    order = np.arange(len(vp.samples))
    val = list(vp.iter_batches(order, drop_last=False, pad_last=True))
    return train, val, num_query, nc, cams


def torch_inputs(batch):
    im = torch.from_numpy(np.asarray(batch.images))  # (B, 3, H, W, 3)
    return {
        "RGB": im[:, 0].permute(0, 3, 1, 2).contiguous(),
        "NI": im[:, 1].permute(0, 3, 1, 2).contiguous(),
        "TI": im[:, 2].permute(0, 3, 1, 2).contiguous(),
    }


def train_torch(cfg, tm, train_batches, num_classes):
    """Mirror engine/processor.py:33-110 (no AMP on CPU)."""
    sl = load_ref("layers.softmax_loss")
    _orig_init = sl.CrossEntropyLabelSmooth.__init__

    def _cpu_init(self, num_classes, epsilon=0.1, use_gpu=True):
        _orig_init(self, num_classes, epsilon, use_gpu=False)  # no CUDA here

    sl.CrossEntropyLabelSmooth.__init__ = _cpu_init
    ml = load_ref("layers.make_loss")
    loss_fn, center_criterion = ml.make_loss(cfg, num_classes)
    mo = load_ref("solver.make_optimizer")
    sf = load_ref("solver.scheduler_factory")
    optimizer, _ = mo.make_optimizer(cfg, tm, center_criterion)
    scheduler = sf.create_scheduler(cfg, optimizer)
    has_sdtps = cfg.MODEL.USE_SDTPS
    tm.train()
    losses = []
    for epoch in range(1, EPOCHS + 1):
        scheduler.step(epoch)
        ep_loss = 0.0
        for batch in train_batches[epoch - 1]:
            optimizer.zero_grad()
            target = torch.from_numpy(np.asarray(batch.pids)).long()
            tcam = torch.from_numpy(np.asarray(batch.camids)).long()
            tview = torch.from_numpy(np.asarray(batch.viewids)).long()
            output = tm(torch_inputs(batch), label=target, cam_label=tcam,
                        view_label=tview)
            loss = 0.0
            lif_loss = None
            if cfg.MODEL.USE_LIF:
                # LIF loss is always last and weighted separately
                # (engine/processor.py:75-79, 100-101).
                lif_loss = output[-1]
                output = output[:-1]
            if len(output) % 2 == 1:
                index = len(output) - 1
                for i in range(0, index, 2):
                    lt = loss_fn(score=output[i], feat=output[i + 1],
                                 target=target, target_cam=tcam)
                    if has_sdtps and i == 0:
                        lt = lt * cfg.MODEL.SDTPS_LOSS_WEIGHT
                    loss = loss + lt
                loss = loss + output[-1]
            else:
                for i in range(0, len(output), 2):
                    lt = loss_fn(score=output[i], feat=output[i + 1],
                                 target=target, target_cam=tcam)
                    if has_sdtps and i == 0:
                        lt = lt * cfg.MODEL.SDTPS_LOSS_WEIGHT
                    loss = loss + lt
            if lif_loss is not None:
                loss = loss + cfg.MODEL.LIF_LOSS_WEIGHT * lif_loss
            loss.backward()
            optimizer.step()
            ep_loss += float(loss.detach())
        losses.append(ep_loss / max(len(train_batches[epoch - 1]), 1))
        print(f"[torch] epoch {epoch}: loss {losses[-1]:.4f}", flush=True)
    return losses


def eval_torch(cfg, tm, val_batches, num_query):
    um = load_ref("utils.metrics")
    evaluator = um.R1_mAP_eval(num_query, max_rank=10,
                               feat_norm=cfg.TEST.FEAT_NORM)
    evaluator.reset()
    tm.eval()
    with torch.no_grad():
        for batch in val_batches:
            v = batch.valid
            tcam = torch.from_numpy(np.asarray(batch.camids)).long()
            feat = tm(torch_inputs(batch), cam_label=tcam)
            evaluator.update(
                (feat[:v], torch.from_numpy(np.asarray(batch.pids[:v])),
                 torch.from_numpy(np.asarray(batch.camids[:v])),
                 [f"img_{i}" for i in range(v)])
            )
    cmc, mAP, *_ = evaluator.compute()
    return float(mAP), float(cmc[0])


def eval_jax_feats(cfg, model, state, val_batches, num_query):
    """Extract JAX embeddings but score them with the REFERENCE evaluator so
    the metric implementation is identical for both frameworks."""
    um = load_ref("utils.metrics")
    evaluator = um.R1_mAP_eval(num_query, max_rank=10,
                               feat_norm=cfg.TEST.FEAT_NORM)
    evaluator.reset()
    eval_step = build_eval_step(cfg, model, mesh=None)
    for batch in val_batches:
        feat = eval_step(
            state.params, state.batch_stats, jnp.asarray(batch.images),
            jnp.asarray(batch.camids), jnp.asarray(batch.viewids), None, 3,
        )
        v = batch.valid
        evaluator.update(
            (torch.from_numpy(np.asarray(feat[:v])),
             torch.from_numpy(np.asarray(batch.pids[:v])),
             torch.from_numpy(np.asarray(batch.camids[:v])),
             [f"img_{i}" for i in range(v)])
        )
    cmc, mAP, *_ = evaluator.compute()
    return float(mAP), float(cmc[0])


def train_jax(cfg, model, state, tx, center_tx, train_batches):
    step = build_train_step(cfg, model, tx, center_tx, mesh=None, donate=False)
    rng = jax.random.PRNGKey(42)
    losses = []
    for epoch in range(1, EPOCHS + 1):
        ep_loss, n = 0.0, 0
        for batch in train_batches[epoch - 1]:
            state, metrics = step(
                state, jnp.asarray(batch.images), jnp.asarray(batch.pids),
                jnp.asarray(batch.camids), jnp.asarray(batch.viewids), rng,
            )
            ep_loss += float(metrics["loss"])
            n += 1
        losses.append(ep_loss / max(n, 1))
        print(f"[jax]   epoch {epoch}: loss {losses[-1]:.4f}", flush=True)
    return state, losses


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="demo", choices=sorted(ARCH_KNOBS))
    ap.add_argument("--epochs", default=0, type=int,
                    help="override the default horizon (12)")
    ap.add_argument("--int8-mlp", default="off",
                    choices=("off", "dynamic", "static"),
                    help="run the JAX side with TPU.INT8_MLP (quality gate "
                         "for the sub-bf16 experiment)")
    args = ap.parse_args()
    global EPOCHS
    EPOCHS = args.epochs or ARCH_EPOCHS.get(args.arch, EPOCHS)

    t0 = time.time()
    cfg = build_cfg(args.arch, int8_mlp=args.int8_mlp)
    train_batches, val_batches, num_query, num_classes, camera_num = render_data(cfg)
    steps_per_epoch = len(train_batches[0])
    print(f"arch={args.arch}: {steps_per_epoch} steps/epoch x {EPOCHS} epochs, "
          f"{num_query} query", flush=True)

    # Reference model, randomized init; the SAME weights seed the JAX model.
    ref_vit = load_ref("modeling.backbones.vit_pytorch")
    ref_vit.Trans.load_param = lambda self, path: None
    ref_mm = load_ref("modeling.make_model")
    factory = getattr(ref_mm, "__factory_T_type")
    ref_cls = getattr(ref_mm, cfg.MODEL.ARCH if cfg.MODEL.ARCH != "DeMo" else "DeMo")
    tm = ref_cls(num_classes, cfg, camera_num, 0, factory)
    randomize(tm, seed=33)
    sd0 = torch_sd(tm)

    model = make_model(cfg, num_classes, camera_num)
    sample = train_batches[0][0]
    state, tx, center_tx, _ = create_train_state(
        cfg, model, jax.random.PRNGKey(0), sample, steps_per_epoch
    )
    if cfg.MODEL.ARCH == "DeMo_Parallel":
        from demo2_tpu.utils.ref_convert import convert_demo_parallel

        params, stats = convert_demo_parallel(sd0, cfg)
    else:
        params, stats = convert_demo(sd0, cfg)
    variables = graft(
        {"params": state.params, "batch_stats": state.batch_stats},
        params, stats, require_full_params=True, allow_missing_in_model=True,
    )
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])

    mAP0_jax, r1_0 = eval_jax_feats(cfg, model, state, val_batches, num_query)
    print(f"untrained: jax mAP {mAP0_jax:.4f}", flush=True)

    state, jax_losses = train_jax(cfg, model, state, tx, center_tx, train_batches)
    mAP_jax, r1_jax = eval_jax_feats(cfg, model, state, val_batches, num_query)
    print(f"[jax]   final mAP {mAP_jax:.4f} R1 {r1_jax:.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    torch_losses = train_torch(cfg, tm, train_batches, num_classes)
    mAP_ref, r1_ref = eval_torch(cfg, tm, val_batches, num_query)
    print(f"[torch] final mAP {mAP_ref:.4f} R1 {r1_ref:.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    report = {
        "config": f"{args.arch}: {cfg.MODEL.ARCH} tiny (32x16, ViT-B width, "
                  f"{cfg.DATASETS.NAMES})",
        "epochs": EPOCHS,
        "untrained_mAP_jax": mAP0_jax,
        "final_mAP_jax": mAP_jax,
        "final_mAP_torch_reference": mAP_ref,
        "final_R1_jax": r1_jax,
        "final_R1_torch_reference": r1_ref,
        "jax_epoch_losses": jax_losses,
        "torch_epoch_losses": torch_losses,
        "mAP_gap": mAP_jax - mAP_ref,
    }
    out = pathlib.Path(__file__).resolve().parent.parent / "reports"
    out.mkdir(exist_ok=True)
    fname = "crosscheck.json" if args.arch == "demo" else f"crosscheck_{args.arch}.json"
    if args.int8_mlp != "off":
        report["config"] += f" + TPU.INT8_MLP={args.int8_mlp}"
        fname = f"crosscheck_int8_{args.int8_mlp}.json"
    (out / fname).write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))

    assert all(np.isfinite(jax_losses)), "JAX training produced non-finite loss"
    # Loss tracking is asserted over the EARLY epochs, where identical-init
    # identical-batch dynamics genuinely track.  Late in training the
    # batch-hard mining makes this toy system chaotic: tiny fp32
    # reduction-order differences flip hard-example choices and the
    # trajectories decorrelate — measured: the TORCH REFERENCE against
    # ITSELF varies ~0.35 in epoch-24 loss across identical-seed runs
    # (2.159 vs 2.51), and the jax-torch offset flips sign between the
    # 24- and 36-epoch runs.  Final loss is reported, not asserted.
    n_track = min(8, len(jax_losses))
    early_gap = float(
        np.mean(np.abs(np.array(jax_losses[:n_track]) -
                       np.array(torch_losses[:n_track])))
    )
    assert early_gap < 0.1, (
        f"early loss trajectories diverged: mean |jax-torch| over first "
        f"{n_track} epochs = {early_gap:.4f}"
    )
    # Quality parity: the +-0.05 mAP band at the (per-arch) saturation
    # horizon, where run-to-run variance is small — plus a learning bar on
    # both frameworks.
    assert mAP_jax > mAP0_jax + 0.015, "JAX model failed to learn"
    assert mAP_ref > mAP0_jax + 0.015, "reference model failed to learn"
    assert abs(mAP_jax - mAP_ref) < 0.05, (
        f"mAP band exceeded: jax {mAP_jax:.4f} vs torch {mAP_ref:.4f}"
    )
    print("CROSSCHECK PASS", flush=True)


if __name__ == "__main__":
    main()
