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
