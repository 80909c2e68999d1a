from .losses import (
    cross_entropy_label_smooth,
    softmax_cross_entropy,
    batch_hard_triplet_loss,
    euclidean_dist,
    CenterLossState,
    center_loss,
    make_loss_fn,
)
from . import metric_learning
