"""PyTorch -> JAX weight converters for the pretrained backbones.

Reference load paths: CLIP jit-archive/state-dict -> build_model with
bicubic pos-embed resize to the 16x8 grid (modeling/make_model_clipreid.py:
174-188, clip/model.py:647-725); ImageNet ViT .pth with bilinear pos-embed
resize (modeling/backbones/vit_pytorch.py:440-484).

Torch Linear weights are (out, in) — transposed into flax (in, out) kernels;
conv weights (O, I, H, W) become flax (H, W, I, O).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _t(w):  # torch linear weight -> flax kernel
    return jnp.asarray(np.asarray(w)).T


def _conv(w):  # (O, I, H, W) -> (H, W, I, O)
    return jnp.asarray(np.asarray(w)).transpose(2, 3, 1, 0)


def _arr(w):
    return jnp.asarray(np.asarray(w))


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a .pth/.pt file (plain state dict or torch.jit archive)."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _interp_axis_torch_bilinear(arr: np.ndarray, new_n: int, axis: int) -> np.ndarray:
    """Exact numpy mirror of F.interpolate(mode='bilinear',
    align_corners=False) along one axis: source index (o+0.5)*n/new_n - 0.5
    clamped at 0, two-tap linear blend, NO antialiasing when minifying —
    torch's default, and therefore the reference's."""
    n = arr.shape[axis]
    if new_n == n:
        return arr
    src = np.maximum((np.arange(new_n) + 0.5) * (n / new_n) - 0.5, 0.0)
    x0 = np.minimum(np.floor(src).astype(np.int64), n - 1)
    frac = (src - x0).astype(arr.dtype)
    x1 = np.minimum(x0 + 1, n - 1)
    a = np.take(arr, x0, axis=axis)
    b = np.take(arr, x1, axis=axis)
    shape = [1] * arr.ndim
    shape[axis] = new_n
    f = frac.reshape(shape)
    return a * (1 - f) + b * f


def resize_pos_embed_grid(pos: np.ndarray, new_h: int, new_w: int, method: str):
    """Resize the grid part of a (1+N, C) positional embedding.

    Both reference loaders interpolate with torch's un-antialiased bilinear
    (clip/model.py:708-724 and backbones/vit_pytorch.py:468-483, both
    ``F.interpolate(mode='bilinear')``), so that is what every ``method``
    maps to here — bit-parity with the reference matters more than filter
    aesthetics.  The ``method`` argument is kept for call-site documentation.
    """
    del method
    pos = np.asarray(pos)
    tok, grid = pos[:1], pos[1:]
    if grid.shape[0] == new_h * new_w:  # already on the target grid
        return jnp.asarray(pos)
    gs_old = int(round(float(np.sqrt(grid.shape[0]))))
    grid = grid.reshape(gs_old, gs_old, -1)
    resized = _interp_axis_torch_bilinear(
        _interp_axis_torch_bilinear(grid, new_h, 0), new_w, 1
    )
    return jnp.concatenate(
        [jnp.asarray(tok), jnp.asarray(resized.reshape(new_h * new_w, -1))], 0
    )


def convert_clip_visual(sd: Dict[str, np.ndarray], new_h: int, new_w: int) -> Dict:
    """CLIP visual tower state dict -> CLIPVisionTransformer flax params."""
    pfx = "visual." if any(k.startswith("visual.") for k in sd) else ""
    g = lambda k: sd[pfx + k]
    params: Dict[str, Any] = {
        "conv1": {"kernel": _conv(g("conv1.weight"))},
        "class_embedding": _arr(g("class_embedding")),
        "positional_embedding": resize_pos_embed_grid(
            np.asarray(g("positional_embedding")), new_h, new_w, "bicubic"
        ),
        "ln_pre": {"scale": _arr(g("ln_pre.weight")), "bias": _arr(g("ln_pre.bias"))},
        "ln_post": {"scale": _arr(g("ln_post.weight")), "bias": _arr(g("ln_post.bias"))},
        "proj": _arr(g("proj")),
    }
    i = 0
    while f"{pfx}transformer.resblocks.{i}.attn.in_proj_weight" in sd:
        blk = f"transformer.resblocks.{i}."
        params[f"resblocks_{i}"] = {
            "attn": {
                "in_proj_kernel": _t(g(blk + "attn.in_proj_weight")),
                "in_proj_bias": _arr(g(blk + "attn.in_proj_bias")),
                "out_proj": {
                    "kernel": _t(g(blk + "attn.out_proj.weight")),
                    "bias": _arr(g(blk + "attn.out_proj.bias")),
                },
            },
            "ln_1": {"scale": _arr(g(blk + "ln_1.weight")), "bias": _arr(g(blk + "ln_1.bias"))},
            "ln_2": {"scale": _arr(g(blk + "ln_2.weight")), "bias": _arr(g(blk + "ln_2.bias"))},
            "mlp": {
                "c_fc": {"kernel": _t(g(blk + "mlp.c_fc.weight")), "bias": _arr(g(blk + "mlp.c_fc.bias"))},
                "c_proj": {"kernel": _t(g(blk + "mlp.c_proj.weight")), "bias": _arr(g(blk + "mlp.c_proj.bias"))},
            },
        }
        i += 1
    return params


def convert_clip_text(sd: Dict[str, np.ndarray]) -> Dict:
    """CLIP text-side state dict -> CLIPTextTransformer flax params.

    Reference keys (modeling/clip/model.py:533-544): token_embedding.weight,
    positional_embedding, transformer.resblocks.N.*, ln_final, text_projection.
    """
    g = lambda k: sd[k]
    params: Dict[str, Any] = {
        "token_embedding": _arr(g("token_embedding.weight")),
        "positional_embedding": _arr(g("positional_embedding")),
        "ln_final": {
            "scale": _arr(g("ln_final.weight")),
            "bias": _arr(g("ln_final.bias")),
        },
        "text_projection": _arr(g("text_projection")),
    }
    i = 0
    while f"transformer.resblocks.{i}.attn.in_proj_weight" in sd:
        blk = f"transformer.resblocks.{i}."
        params[f"resblocks_{i}"] = {
            "attn": {
                "in_proj_kernel": _t(g(blk + "attn.in_proj_weight")),
                "in_proj_bias": _arr(g(blk + "attn.in_proj_bias")),
                "out_proj": {
                    "kernel": _t(g(blk + "attn.out_proj.weight")),
                    "bias": _arr(g(blk + "attn.out_proj.bias")),
                },
            },
            "ln_1": {"scale": _arr(g(blk + "ln_1.weight")), "bias": _arr(g(blk + "ln_1.bias"))},
            "ln_2": {"scale": _arr(g(blk + "ln_2.weight")), "bias": _arr(g(blk + "ln_2.bias"))},
            "mlp_c_fc": {
                "kernel": _t(g(blk + "mlp.c_fc.weight")),
                "bias": _arr(g(blk + "mlp.c_fc.bias")),
            },
            "mlp_c_proj": {
                "kernel": _t(g(blk + "mlp.c_proj.weight")),
                "bias": _arr(g(blk + "mlp.c_proj.bias")),
            },
        }
        i += 1
    return params


def convert_imagenet_vit(sd: Dict[str, np.ndarray], new_h: int, new_w: int) -> Dict:
    """timm/TransReID ViT state dict -> ImageNetViT flax params."""
    params: Dict[str, Any] = {}
    if "patch_embed.proj.weight" in sd:
        params["patch_embed_proj"] = {
            "kernel": _conv(sd["patch_embed.proj.weight"]),
            "bias": _arr(sd["patch_embed.proj.bias"]),
        }
    params["cls_token"] = _arr(sd["cls_token"])
    pos = np.asarray(sd["pos_embed"])[0]
    params["pos_embed"] = resize_pos_embed_grid(pos, new_h, new_w, "bilinear")[None]
    if "norm.weight" in sd:
        params["norm"] = {"scale": _arr(sd["norm.weight"]), "bias": _arr(sd["norm.bias"])}
    i = 0
    while f"blocks.{i}.attn.qkv.weight" in sd:
        blk = f"blocks.{i}."
        p = {
            "norm1": {"scale": _arr(sd[blk + "norm1.weight"]), "bias": _arr(sd[blk + "norm1.bias"])},
            "norm2": {"scale": _arr(sd[blk + "norm2.weight"]), "bias": _arr(sd[blk + "norm2.bias"])},
            "attn": {
                "qkv": {"kernel": _t(sd[blk + "attn.qkv.weight"])},
                "proj": {"kernel": _t(sd[blk + "attn.proj.weight"]), "bias": _arr(sd[blk + "attn.proj.bias"])},
            },
            "mlp": {
                "fc1": {"kernel": _t(sd[blk + "mlp.fc1.weight"]), "bias": _arr(sd[blk + "mlp.fc1.bias"])},
                "fc2": {"kernel": _t(sd[blk + "mlp.fc2.weight"]), "bias": _arr(sd[blk + "mlp.fc2.bias"])},
            },
        }
        if blk + "attn.qkv.bias" in sd:
            p["attn"]["qkv"]["bias"] = _arr(sd[blk + "attn.qkv.bias"])
        params[f"blocks_{i}"] = p
        i += 1
    return params


def merge_pretrained_backbone(params: Dict, backbone_params: Dict) -> Dict:
    """Graft converted backbone weights into a full model param tree.

    The backbone lives at params['backbone']['base'] (PIFE submodule).
    Only keys present in `backbone_params` are replaced.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    new = flax.traverse_util.flatten_dict({"backbone": {"base": backbone_params}})
    unmatched = []
    for k, v in new.items():
        if k in flat:
            if flat[k].shape != v.shape:
                raise ValueError(f"shape mismatch for {k}: {flat[k].shape} vs {v.shape}")
            flat[k] = v.astype(flat[k].dtype)
        else:
            unmatched.append("/".join(map(str, k)))
    if unmatched:
        # Name drift must be LOUD — a silently-dropped tensor leaves those
        # layers at random init (torch load_state_dict reports the same way).
        import logging

        logging.getLogger("DeMo").warning(
            "merge_pretrained_backbone: %d converted tensors matched no "
            "model param and were DROPPED (first: %s)",
            len(unmatched), ", ".join(unmatched[:5]),
        )
    return flax.traverse_util.unflatten_dict(flat)
