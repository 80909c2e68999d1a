"""Golden parity: SACR atrous pyramid + ECA channel attention vs torch twin
(reference: modeling/sacr.py:27-119)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from demo2_tpu.models.sacr import SACR, eca_kernel_size


class _TorchSACR(nn.Module):
    def __init__(self, c, h, w, rates=(2, 3, 4)):
        super().__init__()
        self.h, self.w = h, w
        self.conv1x1 = nn.Sequential(
            nn.Conv2d(c, c, 1, bias=False), nn.BatchNorm2d(c), nn.ReLU()
        )
        self.atrous = nn.ModuleList(
            [
                nn.Sequential(
                    nn.Conv2d(c, c, 3, padding=r, dilation=r, bias=False),
                    nn.BatchNorm2d(c),
                    nn.ReLU(),
                )
                for r in rates
            ]
        )
        self.fusion = nn.Sequential(
            nn.Conv2d(c * (1 + len(rates)), c, 1, bias=False),
            nn.BatchNorm2d(c),
            nn.ReLU(),
        )
        k = eca_kernel_size(c)
        self.channel_attn = nn.Conv1d(1, 1, kernel_size=k, padding=k // 2, bias=False)

    def forward(self, tokens):  # (B, N, C)
        b, n, c = tokens.shape
        x = tokens.permute(0, 2, 1).view(b, c, self.h, self.w)
        feats = [self.conv1x1(x)] + [m(x) for m in self.atrous]
        f = self.fusion(torch.cat(feats, dim=1))
        attn = f.mean(dim=[2, 3]).view(b, 1, c)
        attn = torch.sigmoid(self.channel_attn(attn)).view(b, c, 1, 1)
        out = f * attn
        return out.view(b, c, n).permute(0, 2, 1)


def test_sacr_matches_torch_twin():
    torch.manual_seed(0)
    c, h, w, b = 16, 4, 2, 2
    twin = _TorchSACR(c, h, w).eval()
    tokens = np.random.default_rng(0).normal(size=(3, b, h * w, c)).astype(np.float32)
    with torch.no_grad():
        ref = np.stack([twin(torch.from_numpy(tokens[m])).numpy() for m in range(3)])

    sacr = SACR(token_dim=c, height=h, width=w)
    vars_ = sacr.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
    sd = {k_: v.numpy() for k_, v in twin.state_dict().items()}

    def convbn(prefix, kernel_hwio):
        return {
            "conv": {"kernel": kernel_hwio},
            "bn": {"scale": sd[f"{prefix}.1.weight"], "bias": sd[f"{prefix}.1.bias"]},
        }

    def oihw_to_hwio(wt):
        return np.transpose(wt, (2, 3, 1, 0))

    params = {
        "core": {
            "conv1x1": convbn("conv1x1", oihw_to_hwio(sd["conv1x1.0.weight"])),
            "fusion": convbn("fusion", oihw_to_hwio(sd["fusion.0.weight"])),
            "channel_attn": {"kernel": np.transpose(sd["channel_attn.weight"], (2, 1, 0))},
        }
    }
    for i in range(3):
        params["core"][f"atrous_{i}"] = convbn(
            f"atrous.{i}", oihw_to_hwio(sd[f"atrous.{i}.0.weight"])
        )
    params = jax.tree_util.tree_map(jnp.asarray, params)

    bs = vars_["batch_stats"]  # fresh stats: mean 0, var 1 == torch eval BN
    out = sacr.apply(
        {"params": params, "batch_stats": bs}, jnp.asarray(tokens), True
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
