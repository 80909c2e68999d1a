"""Golden parity: torch timm-style ViT block -> our ImageNetViT block."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from demo2_tpu.models.vit import ViTBlock


class _TorchViTBlock(nn.Module):
    """Fresh twin of the timm Block semantics (vit_pytorch.py:173-190)."""

    def __init__(self, dim, heads, qkv_bias=True):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, dim * 4)
        self.fc2 = nn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        b, n, c = x.shape
        h = self.heads
        d = c // h
        y = self.norm1(x)
        qkv = self.qkv(y).reshape(b, n, 3, h, d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * d ** -0.5
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.proj(y)
        y = self.norm2(x)
        y = self.fc2(torch.nn.functional.gelu(self.fc1(y)))
        return x + y


def test_vit_block_parity():
    torch.manual_seed(0)
    dim, heads = 64, 4
    tblk = _TorchViTBlock(dim, heads).eval()
    x = np.random.default_rng(0).normal(size=(2, 9, dim)).astype(np.float32)
    with torch.no_grad():
        ref = tblk(torch.from_numpy(x)).numpy()

    sd = {k: v.numpy() for k, v in tblk.state_dict().items()}
    params = {
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        "attn": {
            "qkv": {"kernel": sd["qkv.weight"].T, "bias": sd["qkv.bias"]},
            "proj": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
        },
        "mlp": {
            "fc1": {"kernel": sd["fc1.weight"].T, "bias": sd["fc1.bias"]},
            "fc2": {"kernel": sd["fc2.weight"].T, "bias": sd["fc2.bias"]},
        },
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    blk = ViTBlock(num_heads=heads)
    out = blk.apply({"params": params}, jnp.asarray(x), True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
