"""Replay to just before the NaN step and pickle (state, batch) for fast
iteration on the failure."""
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from ref_loader import load_ref
from test_reference_parity import graft, randomize, torch_sd

from crosscheck_reference import build_cfg, render_data
from demo2_tpu.engine import create_train_state
from demo2_tpu.engine.train import build_train_step
from demo2_tpu.models import make_model
from demo2_tpu.utils.ref_convert import convert_demo

cfg = build_cfg()
train_batches, _, _, num_classes, camera_num = render_data(cfg)

ref_vit = load_ref("modeling.backbones.vit_pytorch")
ref_vit.Trans.load_param = lambda self, path: None
ref_mm = load_ref("modeling.make_model")
factory = getattr(ref_mm, "__factory_T_type")
tm = ref_mm.DeMo(num_classes, cfg, camera_num, 0, factory)
randomize(tm, seed=33)
sd0 = torch_sd(tm)

model = make_model(cfg, num_classes, camera_num)
sample = train_batches[0][0]
state, tx, center_tx, _ = create_train_state(
    cfg, model, jax.random.PRNGKey(0), sample, len(train_batches[0])
)
params, stats = convert_demo(sd0, cfg)
variables = graft(
    {"params": state.params, "batch_stats": state.batch_stats},
    params, stats, require_full_params=True, allow_missing_in_model=True,
)
state = state.replace(params=variables["params"],
                      batch_stats=variables["batch_stats"])

step = build_train_step(cfg, model, tx, center_tx, mesh=None, donate=False)
rng = jax.random.PRNGKey(42)

replay = [(1, i) for i in range(5)] + [(2, i) for i in range(5)] + [(3, 0), (3, 1), (3, 2)]
for ep, i in replay:
    batch = train_batches[ep - 1][i]
    state, metrics = step(
        state, jnp.asarray(batch.images), jnp.asarray(batch.pids),
        jnp.asarray(batch.camids), jnp.asarray(batch.viewids), rng,
    )
    print(f"replay e{ep} s{i}: loss {float(metrics['loss']):.4f}", flush=True)

bad = train_batches[2][3]
blob = {
    "params": jax.tree_util.tree_map(np.asarray, state.params),
    "batch_stats": jax.tree_util.tree_map(np.asarray, state.batch_stats),
    "step": int(state.step),
    "images": np.asarray(bad.images),
    "pids": np.asarray(bad.pids),
    "camids": np.asarray(bad.camids),
    "viewids": np.asarray(bad.viewids),
    "num_classes": num_classes,
    "camera_num": camera_num,
}
with open("/tmp/nan_state.pkl", "wb") as f:
    pickle.dump(blob, f)
print("saved /tmp/nan_state.pkl", flush=True)
