from .state import TrainState, create_train_state
from .train import build_train_step, do_train
from .eval import build_eval_step, run_eval, do_inference
