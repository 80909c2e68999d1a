from .loader import make_dataloader, TriModalDataPipe, Batch
from .datasets import DATASET_REGISTRY, SyntheticTriModal
from .sampler import RandomIdentitySampler
