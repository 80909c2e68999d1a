"""Ablation recipe library: every reference scripts/*.sh has a JSON twin.

The reference ships 15 shell ablation suites launching 4 configs on 4 GPUs
in parallel (e.g. scripts/run_ablation_4arch_rgbnt201.sh:1-50).  Here each
suite is a runner recipe under scripts/ablations/<name>.json consumed by
tools/run_experiments.py (sequential — one TPU chip admits one client).

This test dry-runs every experiment: the config preset must load and the
opts must merge into a frozen config without error, and the resulting
config must build a model object.
"""

import json
from pathlib import Path

import pytest

RECIPES = sorted(Path(__file__).resolve().parent.parent.joinpath(
    "scripts/ablations").glob("*.json"))

REFERENCE_SUITES = [
    "ablation_experiments", "dgaf_experiments", "optimization_experiments",
    "run_ablation", "run_ablation_4arch_12exp", "run_ablation_4arch_rgbnt201",
    "run_ablation_cross_attention", "run_ablation_cross_attention_201",
    "run_ablation_frca_201", "run_ablation_parallel_201",
    "run_ablation_vehicle", "sdtps_dgaf_ablation", "sdtps_dgaf_combo_search",
    "sdtps_dgaf_continue", "sdtps_dgaf_full_ablation",
]


def test_every_reference_suite_has_a_recipe():
    names = {p.stem for p in RECIPES}
    missing = set(REFERENCE_SUITES) - names
    assert not missing, f"missing ablation recipes: {sorted(missing)}"


@pytest.mark.parametrize("recipe", RECIPES, ids=lambda p: p.stem)
def test_recipe_configs_load_and_build(recipe):
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.models import make_model

    root = recipe.parent.parent.parent
    exps = json.loads(recipe.read_text())
    assert exps, f"{recipe.stem}: empty recipe"
    seen = set()
    for name, config, opts in exps:
        assert name not in seen, f"duplicate experiment name {name}"
        seen.add(name)
        cfg = get_cfg_defaults()
        cfg.merge_from_file(str(root / config))
        cfg.merge_from_list(list(opts))
        cfg.freeze()
        model = make_model(cfg, num_class=10, camera_num=4)
        assert model is not None
