"""Linear layers with torch-compatible default initializers.

Torch `nn.Linear` initializes kernel ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) and
bias the same; several reference modules rely on these defaults (gate MLPs,
projections).  Modules that apply custom inits (classifier std=0.001, kaiming
fan_out; reference: modeling/meta_arch.py:8-29) get dedicated initializers.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

# U(-1/sqrt(fan_in), 1/sqrt(fan_in)); variance_scaling(1/3,'fan_in','uniform')
# draws from U(+-sqrt(3*scale/fan_in)) = U(+-1/sqrt(fan_in)).
torch_linear_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
torch_linear_bias_init = nn.initializers.zeros

# Classifier heads use normal(std=0.001), no bias (reference: meta_arch.py:24-29).
classifier_kernel_init = nn.initializers.normal(stddev=0.001)

# weights_init_kaiming for Linear: kaiming_normal fan_out (reference: meta_arch.py:10-12).
kaiming_fanout_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

xavier_uniform_init = nn.initializers.xavier_uniform()


class TorchLinear(nn.Module):
    features: int
    use_bias: bool = True
    kernel_init: Any = torch_linear_kernel_init
    bias_init: Any = torch_linear_bias_init
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype or x.dtype,
            param_dtype=jnp.float32,
        )(x)
