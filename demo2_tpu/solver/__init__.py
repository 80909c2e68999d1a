from .optim import make_optimizer, warmup_multistep_lr, warmup_linear_lr, make_lr_schedule
