"""Golden parity: torch CLIP-style visual tower -> our flax backbone.

Builds a minimal torch twin of the CLIP visual tower (fresh implementation,
matching clip/model.py:418-484 semantics), converts its weights with
`convert_clip_visual`, and compares outputs elementwise.
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from demo2_tpu.models.clip_vit import CLIPVisionTransformer
from demo2_tpu.utils.converters import convert_clip_visual


class _TorchQuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _TorchBlock(nn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(width, heads)
        self.ln_1 = nn.LayerNorm(width)
        self.mlp = nn.Sequential(
            collections.OrderedDict(
                [
                    ("c_fc", nn.Linear(width, width * 4)),
                    ("gelu", _TorchQuickGELU()),
                    ("c_proj", nn.Linear(width * 4, width)),
                ]
            )
        )
        self.ln_2 = nn.LayerNorm(width)

    def forward(self, x):  # x: (S, B, C)
        x = x + self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x), need_weights=False)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


class _TorchCLIPVisual(nn.Module):
    def __init__(self, gh, gw, width=64, layers=2, heads=2, out_dim=32, patch=4):
        super().__init__()
        self.gh, self.gw = gh, gw
        self.conv1 = nn.Conv2d(3, width, kernel_size=patch, stride=patch, bias=False)
        scale = width ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        self.positional_embedding = nn.Parameter(scale * torch.randn(gh * gw + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [_TorchBlock(width, heads) for _ in range(layers)]
        )
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, out_dim))

    def forward(self, x, cv_emb=None):
        x = self.conv1(x)  # (B, C, gh, gw)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding[None, None, :].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1)
        if cv_emb is not None:
            x = torch.cat([(x[:, :1] + cv_emb[:, None, :]), x[:, 1:]], dim=1)
        x = x + self.positional_embedding[None]
        x = self.ln_pre(x)
        x = x.permute(1, 0, 2)
        for blk in self.transformer.resblocks:
            x = blk(x)
        x = x.permute(1, 0, 2)
        return self.ln_post(x) @ self.proj


def test_clip_visual_conversion_parity():
    torch.manual_seed(0)
    gh, gw = 4, 2
    tmodel = _TorchCLIPVisual(gh, gw).eval()
    x = np.random.default_rng(0).normal(size=(2, 3, 16, 8)).astype(np.float32)
    cv = np.random.default_rng(1).normal(size=(2, 64)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), torch.from_numpy(cv)).numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    # The dict-level converter resizes from a square source grid; this twin's
    # grid is already (gh x gw), so map the weights manually here (the resize
    # path is covered by test_convert_clip_visual_mapper_shapes).
    from demo2_tpu.utils import converters as C

    params = {
        "conv1": {"kernel": C._conv(sd["conv1.weight"])},
        "class_embedding": C._arr(sd["class_embedding"]),
        "positional_embedding": C._arr(sd["positional_embedding"]),
        "ln_pre": {"scale": C._arr(sd["ln_pre.weight"]), "bias": C._arr(sd["ln_pre.bias"])},
        "ln_post": {"scale": C._arr(sd["ln_post.weight"]), "bias": C._arr(sd["ln_post.bias"])},
        "proj": C._arr(sd["proj"]),
    }
    for i in range(2):
        b = f"transformer.resblocks.{i}."
        params[f"resblocks_{i}"] = {
            "attn": {
                "in_proj_kernel": C._t(sd[b + "attn.in_proj_weight"]),
                "in_proj_bias": C._arr(sd[b + "attn.in_proj_bias"]),
                "out_proj": {
                    "kernel": C._t(sd[b + "attn.out_proj.weight"]),
                    "bias": C._arr(sd[b + "attn.out_proj.bias"]),
                },
            },
            "ln_1": {"scale": C._arr(sd[b + "ln_1.weight"]), "bias": C._arr(sd[b + "ln_1.bias"])},
            "ln_2": {"scale": C._arr(sd[b + "ln_2.weight"]), "bias": C._arr(sd[b + "ln_2.bias"])},
            "mlp": {
                "c_fc": {"kernel": C._t(sd[b + "mlp.c_fc.weight"]), "bias": C._arr(sd[b + "mlp.c_fc.bias"])},
                "c_proj": {"kernel": C._t(sd[b + "mlp.c_proj.weight"]), "bias": C._arr(sd[b + "mlp.c_proj.bias"])},
            },
        }

    fmodel = CLIPVisionTransformer(
        h_resolution=gh, w_resolution=gw, patch_size=4, stride_size=4,
        width=64, layers=2, heads=2, output_dim=32,
    )
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    out = fmodel.apply({"params": params}, x_nhwc, jnp.asarray(cv))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_convert_clip_visual_mapper_shapes():
    """The dict-level converter maps every key with the right shapes."""
    torch.manual_seed(1)
    tmodel = _TorchCLIPVisual(3, 3, patch=4).eval()  # square 3x3 grid source
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_clip_visual(sd, 4, 2)  # resize 3x3 -> 4x2
    assert params["positional_embedding"].shape == (4 * 2 + 1, 64)
    assert params["conv1"]["kernel"].shape == (4, 4, 3, 64)
    assert params["resblocks_0"]["attn"]["in_proj_kernel"].shape == (64, 192)
