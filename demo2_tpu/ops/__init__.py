from .activations import quick_gelu
from .norm import TorchBatchNorm, BNNeck
from .attention import MultiHeadAttention, attention_core
