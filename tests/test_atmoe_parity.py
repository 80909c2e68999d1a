"""Golden parity: ATMoE dense expert mix vs a torch twin of MoM
(reference: modeling/moe/AttnMOE.py:50-121)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from demo2_tpu.models.hdm_atmoe import ATMoE


class _TorchMoM(nn.Module):
    def __init__(self, c, num_experts, head):
        super().__init__()
        self.head = head
        self.d = c // head
        self.c = c
        self.experts = nn.ModuleList(
            [nn.ModuleList([nn.Linear(self.d, self.d) for _ in range(num_experts)])
             for _ in range(head)]
        )
        self.expert_bns = nn.ModuleList(
            [nn.ModuleList([nn.BatchNorm1d(self.d) for _ in range(num_experts)])
             for _ in range(head)]
        )
        self.linear_re = nn.Linear(7 * c, c)
        self.re_bn = nn.BatchNorm1d(c)
        self.q_ = nn.Linear(c, c, bias=False)
        self.k_ = nn.Linear(c, c, bias=False)

    @staticmethod
    def _qgelu(x):
        return x * torch.sigmoid(1.702 * x)

    def forward(self, feats):  # feats: list of 7 (B, C)
        b = feats[0].shape[0]
        chunks = [torch.chunk(f, self.head, dim=-1) for f in feats]  # [7][head]
        query = torch.cat(feats, dim=-1)
        x = self.re_bn(self._qgelu(self.linear_re(query)))
        q = self.q_(x).reshape(b, 1, self.head, self.d).permute(0, 2, 1, 3)
        key = torch.stack(feats, dim=1)  # (B, 7, C)
        k = self.k_(key).reshape(b, 7, self.head, self.d).permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)) * self.d ** -0.5
        gates = attn.softmax(dim=-1)  # (B, head, 1, 7)
        outs = []
        for h in range(self.head):
            eo = [self.expert_bns[h][s](self._qgelu(self.experts[h][s](chunks[s][h])))
                  for s in range(7)]
            eo = torch.stack(eo, dim=1)  # (B, 7, d)
            eo = eo * gates[:, h].squeeze(1).unsqueeze(2)
            outs.append(eo)
        out = torch.cat(outs, dim=-1)  # (B, 7, head*d)
        return out.flatten(start_dim=1)


def test_atmoe_matches_torch_twin():
    torch.manual_seed(0)
    c, head, b = 24, 4, 6
    d = c // head
    twin = _TorchMoM(c, 7, head).eval()
    feats = np.random.default_rng(0).normal(size=(7, b, c)).astype(np.float32)
    with torch.no_grad():
        ref = twin([torch.from_numpy(feats[i]) for i in range(7)]).numpy()

    moe = ATMoE(feat_dim=c, head=head)
    vars_ = moe.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(feats))
    # Port twin weights into the stacked layout.
    sd = {k_: v.numpy() for k_, v in twin.state_dict().items()}
    ek = np.zeros((head, 7, d, d), np.float32)
    eb = np.zeros((head, 7, d), np.float32)
    bn_scale = np.zeros((7, head, d), np.float32)
    bn_bias = np.zeros((7, head, d), np.float32)
    for h in range(head):
        for s in range(7):
            ek[h, s] = sd[f"experts.{h}.{s}.weight"].T
            eb[h, s] = sd[f"experts.{h}.{s}.bias"]
            bn_scale[s, h] = sd[f"expert_bns.{h}.{s}.weight"]
            bn_bias[s, h] = sd[f"expert_bns.{h}.{s}.bias"]
    params = {
        "expert_kernel": ek,
        "expert_bias": eb,
        "linear_re_fc": {"Dense_0": {"kernel": sd["linear_re.weight"].T,
                                     "bias": sd["linear_re.bias"]}},
        "gate_q": {"Dense_0": {"kernel": sd["q_.weight"].T}},
        "gate_k": {"Dense_0": {"kernel": sd["k_.weight"].T}},
        "linear_re_bn": {"scale": sd["re_bn.weight"], "bias": sd["re_bn.bias"]},
        # Flat BN over (7*head*d) channels == per-(expert, head) BatchNorm1d.
        "expert_bn": {"scale": bn_scale.reshape(-1), "bias": bn_bias.reshape(-1)},
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = {
        "linear_re_bn": {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))},
        "expert_bn": {"mean": jnp.zeros((7 * c,)), "var": jnp.ones((7 * c,))},
    }
    # torch eval-mode BN uses running stats (mean 0, var 1 fresh) == ours.
    out = moe.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(feats),
        use_running_average=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
