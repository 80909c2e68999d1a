"""The four architecture families' MODEL-knob deltas, shared by the
quality tools (tools/crosscheck_reference.py, tools/quality_gate.py).

Each entry is applied on top of the flagship recipe (SDTPS + DGAF v3
single-branch DeMo, config/presets.py::apply_flagship).  Reference
anchors: modeling/make_model.py (DeMo / DeMo_Parallel / DeMoBeiyong
assembly) and the FRCA bridge dispatch (modeling/meta_arch.py).
"""

ARCH_KNOBS = {
    # flagship: SDTPS + DGAF v3 single-branch
    "demo": dict(),
    # 9-head parallel arch with the EXACT-reference engine loss weighting
    # (only pair 0 x SDTPS_LOSS_WEIGHT — MODEL.PARALLEL_LOSS_PARITY)
    "parallel": dict(ARCH="DeMo_Parallel", PARALLEL_LOSS_PARITY=True),
    # legacy cascade (SACR -> LIF -> SDTPS -> DGAF) incl. the aux LIF loss
    "legacy": dict(ARCH="DeMoBeiyong", USE_SACR=True, USE_LIF=True),
    # FRCA-only token selector (tri-state USE_FRCA=True, no SDTPS weighting)
    "frca": dict(USE_FRCA=True, USE_SDTPS=False, USE_DGAF=False),
}

# Per-arch hardware quality-gate operating points, pinned from the
# 2026-08-19 TPU tuning ladders (docs/PARITY.md "hardware quality gate"
# section records the evidence per row).  The four families learn the
# SyntheticHard task at very different rates, so a single id_weight
# cannot put all of them inside the discriminative band:
#   * legacy's SACR->LIF cascade is the strongest learner — it saturates
#     (mAP 0.998+) at the flagship's 0.14 and still at 0.10; 0.06 gives
#     a clean climb to 0.45.
#   * frca (token selector with NO SDTPS/DGAF fusion, random-init
#     backbone) is the weakest — at the full 3.5e-4 peak LR it collapses
#     after warmup at EVERY id_weight (0.90 -> 0.25 flat at 0.25), and
#     at 0.14 it cannot extract the signal at all (flat ~0.05 at either
#     LR); 1.5e-4 peak LR is stable, and the id_weight is raised until
#     the arch learns without saturating.
# `base_lr: None` means the flagship recipe's peak LR.
GATE_POINTS = {
    "demo": dict(id_weight=0.14, base_lr=None),
    # parallel re-pinned on round-5 hardware (2026-08-20): the 9-head arch
    # saturates at the flagship's 0.14 (best 0.9946, over the 0.97 band
    # ceiling) and never learns at 0.10 (flat 0.06-0.11 over 8 epochs);
    # 0.12 climbs cleanly to 0.898 (reports/quality_gate_parallel.json).
    "parallel": dict(id_weight=0.12, base_lr=None),
    "legacy": dict(id_weight=0.06, base_lr=None),
    "frca": dict(id_weight=0.18, base_lr=1.5e-4),
}
