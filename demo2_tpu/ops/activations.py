"""Activation functions.

QuickGELU matches the CLIP/DeMo definition x * sigmoid(1.702 x)
(reference: modeling/clip/model.py:163-165, modeling/moe/AttnMOE.py:5-7).
"""

import jax
import jax.numpy as jnp


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)
