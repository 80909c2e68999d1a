"""Golden parity for the MambaPro PROMPT path vs a torch twin.

The twin transcribes forward_with_prompt semantics (reference:
clip/model.py:297-339): per block, append [slot0, slot1, slot2] prompt
tokens (own-modality at its slot, cross-modality transferred), run the
block, strip 3k tokens, propagate their mean as last_prompt.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from demo2_tpu.models.clip_vit import ResidualAttentionBlock


class _TorchPromptBlock(nn.Module):
    def __init__(self, c, heads, k):
        super().__init__()
        self.k = k
        self.attn = nn.MultiheadAttention(c, heads)
        self.ln_1 = nn.LayerNorm(c)
        self.ln_2 = nn.LayerNorm(c)
        self.c_fc = nn.Linear(c, 4 * c)
        self.c_proj = nn.Linear(4 * c, c)
        self.prompts = nn.Parameter(torch.zeros(3, k, c))
        def adapter():
            return nn.Sequential(nn.Linear(c, c // 2), nn.Identity(), nn.Linear(c // 2, c))
        self.ad = nn.ModuleList([adapter() for _ in range(3)])  # r, n, t
        self.ad_transfer = adapter()

    @staticmethod
    def _qgelu(x):
        return x * torch.sigmoid(1.702 * x)

    def _ffn_adapter(self, ad, x):
        return ad[2](self._qgelu(ad[0](x)))

    def forward(self, x, modality, last_prompt):
        # x: (S, B, C); last_prompt: (k, B, C) or None
        b = x.shape[1]
        transferred = [
            (self.prompts[i][:, None, :] + self._ffn_adapter(self.ad[i], self.prompts[i])[:, None, :]).expand(-1, b, -1)
            for i in range(3)
        ]
        if last_prompt is None:
            own = self.prompts[modality][:, None, :].expand(-1, b, -1)
        else:
            own = last_prompt + self._ffn_adapter(self.ad_transfer, last_prompt) + \
                self.prompts[modality][:, None, :]
        slots = [transferred[i] if i != modality else own for i in range(3)]
        x = torch.cat([x] + slots, dim=0)
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        x = x + self.c_proj(self._qgelu(self.c_fc(self.ln_2(x))))
        k = self.k
        prompt_current = (x[-3 * k : -2 * k] + x[-2 * k : -k] + x[-k:]) / 3
        return x[: -3 * k], prompt_current


def test_prompt_block_matches_torch_twin():
    torch.manual_seed(0)
    c, heads, k, b, s = 32, 4, 2, 2, 5
    tblk = _TorchPromptBlock(c, heads, k).eval()
    with torch.no_grad():
        tblk.prompts.normal_(0, 0.2)

    x = np.random.default_rng(0).normal(size=(3, b, s, c)).astype(np.float32) * 0.5
    # torch twin: run per modality, two chained blocks sharing weights.
    with torch.no_grad():
        ref_out, ref_prompts = [], []
        for m in range(3):
            xm = torch.from_numpy(x[m]).permute(1, 0, 2)  # (S, B, C)
            o1, p1 = tblk(xm, m, None)
            o2, _ = tblk(o1, m, p1)
            ref_out.append(o2.permute(1, 0, 2).numpy())
    ref = np.stack(ref_out)  # (3, B, S, C)

    # Our block with the twin's weights, stacked modality-major rows.
    sd = {kk: v.numpy() for kk, v in tblk.state_dict().items()}
    def adp(prefix):
        return {
            "down": {"kernel": sd[f"{prefix}.0.weight"].T, "bias": sd[f"{prefix}.0.bias"]},
            "up": {"kernel": sd[f"{prefix}.2.weight"].T, "bias": sd[f"{prefix}.2.bias"]},
        }
    params = {
        "adapter_prompts": sd["prompts"],
        "adapter_r": adp("ad.0"),
        "adapter_n": adp("ad.1"),
        "adapter_t": adp("ad.2"),
        "adapter_transfer": adp("ad_transfer"),
        "ln_1": {"scale": sd["ln_1.weight"], "bias": sd["ln_1.bias"]},
        "ln_2": {"scale": sd["ln_2.weight"], "bias": sd["ln_2.bias"]},
        "attn": {
            "in_proj_kernel": sd["attn.in_proj_weight"].T,
            "in_proj_bias": sd["attn.in_proj_bias"],
            "out_proj": {"kernel": sd["attn.out_proj.weight"].T,
                         "bias": sd["attn.out_proj.bias"]},
        },
        "mlp": {
            "c_fc": {"kernel": sd["c_fc.weight"].T, "bias": sd["c_fc.bias"]},
            "c_proj": {"kernel": sd["c_proj.weight"].T, "bias": sd["c_proj.bias"]},
        },
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)

    blk = ResidualAttentionBlock(width=c, heads=heads, use_prompt=True, prompt_k=k)
    xs = jnp.asarray(x.reshape(3 * b, s, c))  # modality-major rows
    o1, p1 = blk.apply({"params": params}, xs)
    o2, _ = blk.apply({"params": params}, o1, p1)
    ours = np.asarray(o2).reshape(3, b, s, c)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
