"""Golden parity for the scientific core: SDTPS scoring/masking and DGAF V1
against freshly-written torch twins of the reference math
(modeling/sdtps.py:19-279, modeling/dual_gated_fusion.py:406-555)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from demo2_tpu.models.dgaf import DualGatedPostFusion
from demo2_tpu.models.sdtps import MultiModalSDTPS

RNG = jax.random.PRNGKey(0)


def _torch_sdtps_scores(patches, globals_, wq, bq, wk, bk, tau=0.3):
    """Twin of CrossModalAttention: softmax(qk^T/sqrt(C) + cos/tau)."""
    m, b, n, c = patches.shape
    scores = np.zeros((m, m, b, n), np.float32)
    for mi in range(m):
        for g in range(m):
            p = torch.from_numpy(patches[mi])
            gl = torch.from_numpy(globals_[g])[:, None, :]
            pn = F.normalize(p, dim=-1)
            gn = F.normalize(gl, dim=-1)
            cos = torch.einsum("bnc,boc->bn", pn, gn)
            q = gl @ torch.from_numpy(wq[mi, g]) + torch.from_numpy(bq[mi, g])
            k = p @ torch.from_numpy(wk[mi, g]) + torch.from_numpy(bk[mi, g])
            logits = (q @ k.transpose(-2, -1)).squeeze(1) * c ** -0.5 + cos / tau
            scores[mi, g] = logits.softmax(dim=-1).numpy()
    return scores


def _torch_zscore_sigmoid(s):
    t = torch.from_numpy(s)
    mean = t.mean(dim=-1, keepdim=True)
    std = t.std(dim=-1, keepdim=True) + 1e-5  # unbiased, as torch default
    return torch.sigmoid((t - mean) / std).numpy()


def test_sdtps_score_and_mask_parity():
    m, b, n, c = 3, 2, 12, 16
    rng = np.random.default_rng(0)
    patches = rng.normal(size=(m, b, n, c)).astype(np.float32)
    globals_ = rng.normal(size=(m, b, c)).astype(np.float32)

    mod = MultiModalSDTPS(embed_dim=c, sparse_ratio=0.5, use_adaptive_weights=False)
    vars_ = mod.init({"params": RNG}, jnp.asarray(patches), jnp.asarray(globals_))
    P = vars_["params"]
    wq, bq = np.asarray(P["q_proj_kernel"]), np.asarray(P["q_proj_bias"])
    wk, bk = np.asarray(P["k_proj_kernel"]), np.asarray(P["k_proj_bias"])

    # Reference pipeline in torch: scores -> guide reorder -> z-score ->
    # mean combine -> quantile threshold -> sigmoid soft mask.
    scores = _torch_sdtps_scores(patches, globals_, wq, bq, wk, bk)
    order = ((0, 1, 2), (1, 0, 2), (2, 0, 1))
    combined = np.zeros((m, b, n), np.float32)
    for mi in range(m):
        norm = [_torch_zscore_sigmoid(scores[mi, g]) for g in order[mi]]
        combined[mi] = np.mean(norm, axis=0)
    thr = torch.quantile(torch.from_numpy(combined), 0.5, dim=-1, keepdim=True)
    ref_mask = torch.sigmoid((torch.from_numpy(combined) - thr) / 0.3).numpy()

    _, mask = mod.apply(vars_, jnp.asarray(patches), jnp.asarray(globals_))
    np.testing.assert_allclose(np.asarray(mask), ref_mask, rtol=1e-4, atol=1e-5)


class _TorchDGAFv1(nn.Module):
    """Twin of DualGatedPostFusion (dual_gated_fusion.py:406-555)."""

    def __init__(self, c, tau=1.0, init_alpha=0.5):
        super().__init__()
        self.tau = tau
        self.entropy_proj = nn.Linear(c, c)
        self.gate_fc0 = nn.Linear(3 * c, c)
        self.gate_ln = nn.LayerNorm(c)
        self.gate_fc1 = nn.Linear(c, 3)
        self._alpha = nn.Parameter(torch.tensor(init_alpha))
        self.enh_fc = nn.Linear(c, c)
        self.enh_ln = nn.LayerNorm(c)

    @staticmethod
    def entropy(f):
        fa = torch.abs(f) + 1e-8
        p = fa / fa.sum(dim=-1, keepdim=True)
        return -(p * torch.log(p + 1e-8)).sum(-1)

    def forward(self, hr, hn, ht):
        H = [self.entropy(h) for h in (hr, hn, ht)]
        z = [self.entropy_proj(h).mean(-1) for h in (hr, hn, ht)]
        score = torch.stack(
            [zi * torch.exp(-Hi / self.tau) for zi, Hi in zip(z, H)], dim=-1
        )
        ew = F.softmax(score, dim=-1)
        h_ent = ew[:, 0:1] * hr + ew[:, 1:2] * hn + ew[:, 2:3] * ht
        gates = torch.sigmoid(
            self.gate_fc1(F.relu(self.gate_ln(self.gate_fc0(torch.cat([hr, hn, ht], -1)))))
        )
        h_imp = gates[:, 0:1] * hr + gates[:, 1:2] * hn + gates[:, 2:3] * ht
        alpha = torch.sigmoid(self._alpha)
        fused = alpha * h_ent + (1 - alpha) * h_imp
        enh = self.enh_ln(self.enh_fc(fused))
        return torch.cat([hr + enh, hn + enh, ht + enh], dim=-1)


def test_dgaf_v1_parity():
    c, b = 16, 4
    rng = np.random.default_rng(1)
    h = rng.normal(size=(3, b, c)).astype(np.float32)

    mod = DualGatedPostFusion(feat_dim=c)
    vars_ = mod.init(RNG, jnp.asarray(h))
    P = vars_["params"]

    t = _TorchDGAFv1(c).eval()
    with torch.no_grad():
        t.entropy_proj.weight.copy_(torch.from_numpy(np.asarray(P["core"]["entropy_proj"]["Dense_0"]["kernel"]).T))
        t.entropy_proj.bias.copy_(torch.from_numpy(np.asarray(P["core"]["entropy_proj"]["Dense_0"]["bias"])))
        t.gate_fc0.weight.copy_(torch.from_numpy(np.asarray(P["core"]["gate_fc0"]["Dense_0"]["kernel"]).T))
        t.gate_fc0.bias.copy_(torch.from_numpy(np.asarray(P["core"]["gate_fc0"]["Dense_0"]["bias"])))
        t.gate_ln.weight.copy_(torch.from_numpy(np.asarray(P["core"]["gate_ln"]["scale"])))
        t.gate_ln.bias.copy_(torch.from_numpy(np.asarray(P["core"]["gate_ln"]["bias"])))
        t.gate_fc1.weight.copy_(torch.from_numpy(np.asarray(P["core"]["gate_fc1"]["Dense_0"]["kernel"]).T))
        t.gate_fc1.bias.copy_(torch.from_numpy(np.asarray(P["core"]["gate_fc1"]["Dense_0"]["bias"])))
        t._alpha.copy_(torch.from_numpy(np.asarray(P["core"]["alpha"])))
        t.enh_fc.weight.copy_(torch.from_numpy(np.asarray(P["modal_enhance"]["fc"]["Dense_0"]["kernel"]).T))
        t.enh_fc.bias.copy_(torch.from_numpy(np.asarray(P["modal_enhance"]["fc"]["Dense_0"]["bias"])))
        t.enh_ln.weight.copy_(torch.from_numpy(np.asarray(P["modal_enhance"]["ln"]["scale"])))
        t.enh_ln.bias.copy_(torch.from_numpy(np.asarray(P["modal_enhance"]["ln"]["bias"])))
        ref = t(*(torch.from_numpy(h[i]) for i in range(3))).numpy()

    out = mod.apply(vars_, jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
