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
    # Overlapping-patch grids (non-default strides) need not divide the
    # image — pool over the cropped divisible region (visualization only).
    hh, ww = (h // gh) * gh, (w // gw) * gw
    sal = sal[:, :, :hh, :ww].reshape(
        m, b, gh, hh // gh, gw, ww // gw
    ).mean(axis=(3, 5))
    lo = sal.min(axis=(2, 3), keepdims=True)
    hi = sal.max(axis=(2, 3), keepdims=True)
    return np.asarray((sal - lo) / (hi - lo + 1e-8))


def gradcam(
    model,
    variables,
    images: jnp.ndarray,  # (B, 3, H, W, 3)
    cam_label: Optional[jnp.ndarray],
    view_label: Optional[jnp.ndarray] = None,
    branch: Optional[str] = None,
    class_idx: Optional[jnp.ndarray] = None,  # (B,) target classes
) -> np.ndarray:
    """True Grad-CAM over the backbone patch-token activations.

    Parity target: reference `visualize/GradCAM.py:17-31` — pytorch_grad_cam's
    GradCAM with `target_layers=[model.BACKBONE.base]` and the token->grid
    `reshape_transform`.  Semantics reproduced exactly:

      * A = target-layer activations = backbone patch tokens (3, B, N, C);
      * g = d(target)/dA via a zero-valued `patch_perturb` probe input
        (no hooks needed — the functional-JAX equivalent of a module hook);
      * channel weights w_c = mean over the spatial (token) axis of g;
      * cam = ReLU(sum_c w_c * A_c), min-max normalized per map.

    `targets=None` in pytorch_grad_cam picks each sample's argmax class of
    the model output; matched here (on the chosen branch's logits) unless
    `class_idx` pins the classes.  Returns (3, B, gh, gw) float in [0, 1].
    """
    gh, gw = model.patch_grid
    b = images.shape[0]
    feat_c = model.feat_dim
    zeros = jnp.zeros((3, b, gh * gw, feat_c), jnp.float32)

    def run(pp):
        return model.apply(
            variables, images, cam_label, view_label, None,
            train=False, patch_perturb=pp,
        )

    # One forward total: when class_idx is None the per-sample argmax class
    # is picked from the SAME primal forward that value_and_grad runs (the
    # argmax indices carry no gradient, so this matches pytorch_grad_cam's
    # targets=None semantics without a second full forward).
    def target(pp):
        out = run(pp)
        bname = branch if branch is not None else next(iter(out["branches"]))
        logits = out["branches"][bname][0]  # (B, num_classes)
        idx = (
            jnp.argmax(jax.lax.stop_gradient(logits), axis=-1)
            if class_idx is None
            else class_idx
        )
        picked = jnp.take_along_axis(logits, idx[:, None], axis=-1)
        return jnp.sum(picked), out["patches"]

    (_, acts), grads = jax.value_and_grad(target, has_aux=True)(zeros)
    acts = acts.astype(jnp.float32)  # (3, B, N, C)
    w = jnp.mean(grads, axis=2)  # (3, B, C) — GAP of gradients
    cam = jax.nn.relu(jnp.einsum("mbc,mbnc->mbn", w, acts))  # (3, B, N)
    cam = cam.reshape(3, b, gh, gw)
    lo = cam.min(axis=(2, 3), keepdims=True)
    hi = cam.max(axis=(2, 3), keepdims=True)
    return np.asarray((cam - lo) / (hi - lo + 1e-8))


def save_gradcam_overlays(
    cams: np.ndarray,  # (3, B, gh, gw)
    images: np.ndarray,  # (B, 3, H, W, 3) in [0, 1] or normalized
    out_dir: str,
    prefix: str = "cam",
) -> list:
    """Reference `show_cam`/`show_cam_on_image` equivalent: upsample each CAM
    to the image size, apply a jet-like colormap, alpha-blend, save PNGs
    (one per modality per sample).  Returns written paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    m, b, gh, gw = cams.shape
    _, _, h, w, _ = images.shape
    names = ("RGB", "NI", "TI")
    paths = []
    for mi in range(m):
        for bi in range(b):
            cam = cams[mi, bi]
            # Ceil-repeat then crop: exact (h, w) even when the grid does
            # not divide the image (overlapping-patch strides).
            ry, rx = -(-h // gh), -(-w // gw)
            cam_up = np.repeat(np.repeat(cam, ry, 0), rx, 1)[:h, :w]
            heat = _jet(cam_up)  # (H, W, 3)
            img = images[bi, mi].astype(np.float32)
            img = (img - img.min()) / (img.max() - img.min() + 1e-8)
            overlay = np.clip(0.5 * img + 0.5 * heat, 0.0, 1.0)
            path = os.path.join(out_dir, f"{prefix}_{names[mi]}_{bi}.png")
            _write_png(path, (overlay * 255).astype(np.uint8))
            paths.append(path)
    return paths


def _jet(x: np.ndarray) -> np.ndarray:
    """Minimal jet colormap for (H, W) in [0,1] -> (H, W, 3)."""
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return np.stack([r, g, b], axis=-1)


def _write_png(path: str, rgb: np.ndarray) -> None:
    """PNG writer with a PIL fallback to pure-zlib encoding."""
    try:
        from PIL import Image

        Image.fromarray(rgb).save(path)
    except Exception:
        import struct
        import zlib

        h, w, _ = rgb.shape
        raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(h))

        def chunk(tag, data):
            c = tag + data
            return struct.pack(">I", len(data)) + c + struct.pack(
                ">I", zlib.crc32(c)
            )

        with open(path, "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\n")
            f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
            f.write(chunk(b"IDAT", zlib.compress(raw)))
            f.write(chunk(b"IEND", b""))


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
