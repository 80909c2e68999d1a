"""Golden parity tests for core ops against PyTorch (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from demo2_tpu.ops.activations import quick_gelu
from demo2_tpu.ops.attention import MultiHeadAttention
from demo2_tpu.ops.norm import LayerNorm, TorchBatchNorm


def test_quick_gelu_matches_torch():
    x = np.random.default_rng(0).normal(size=(4, 7)).astype(np.float32)
    t = torch.from_numpy(x)
    ref = (t * torch.sigmoid(1.702 * t)).numpy()
    np.testing.assert_allclose(
        np.asarray(quick_gelu(jnp.asarray(x))), ref, rtol=1e-5, atol=1e-6
    )


def test_batchnorm_matches_torch_train_and_eval():
    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(16, 8)).astype(np.float32)
    x2 = rng.normal(size=(16, 8)).astype(np.float32)

    tbn = torch.nn.BatchNorm1d(8)
    tbn.train()
    t_out1 = tbn(torch.from_numpy(x1)).detach().numpy()
    t_out2 = tbn(torch.from_numpy(x2)).detach().numpy()
    tbn.eval()
    t_eval = tbn(torch.from_numpy(x1)).detach().numpy()

    bn = TorchBatchNorm()
    vars0 = bn.init(jax.random.PRNGKey(0), jnp.asarray(x1), use_running_average=False)
    out1, mut = bn.apply(
        vars0, jnp.asarray(x1), use_running_average=False, mutable=["batch_stats"]
    )
    vars1 = {**vars0, **mut}
    out2, mut2 = bn.apply(
        vars1, jnp.asarray(x2), use_running_average=False, mutable=["batch_stats"]
    )
    vars2 = {**vars1, **mut2}
    ev = bn.apply(vars2, jnp.asarray(x1), use_running_average=True)

    np.testing.assert_allclose(np.asarray(out1), t_out1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2), t_out2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ev), t_eval, rtol=1e-4, atol=1e-5)


def test_layernorm_matches_torch():
    x = np.random.default_rng(2).normal(size=(3, 5, 16)).astype(np.float32)
    t_ln = torch.nn.LayerNorm(16)
    ref = t_ln(torch.from_numpy(x)).detach().numpy()
    ln = LayerNorm()
    out = ln.apply(ln.init(jax.random.PRNGKey(0), jnp.asarray(x)), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("cross", [False, True])
def test_mha_matches_torch(cross):
    """Our packed-qkv MHA must match torch nn.MultiheadAttention exactly."""
    rng = np.random.default_rng(3)
    B, Sq, Sk, C, H = 2, 5, 7, 32, 4
    q = rng.normal(size=(B, Sq, C)).astype(np.float32)
    kv = q if not cross else rng.normal(size=(B, Sk, C)).astype(np.float32)

    tmha = torch.nn.MultiheadAttention(C, H, batch_first=True)
    tmha.eval()
    with torch.no_grad():
        ref, _ = tmha(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv))
    ref = ref.numpy()

    mha = MultiHeadAttention(num_heads=H)
    variables = mha.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(kv))
    # Port torch weights into our layout.
    params = {
        "in_proj_kernel": jnp.asarray(tmha.in_proj_weight.detach().numpy().T),
        "in_proj_bias": jnp.asarray(tmha.in_proj_bias.detach().numpy()),
        "out_proj": {
            "kernel": jnp.asarray(tmha.out_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(tmha.out_proj.bias.detach().numpy()),
        },
    }
    out = mha.apply({"params": params}, jnp.asarray(q), jnp.asarray(kv))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_mha_mask_bias_restricts_attention():
    """Masked softmax over the full set == attention over the subset."""
    rng = np.random.default_rng(4)
    B, S, C, H = 2, 6, 16, 2
    x = rng.normal(size=(B, S, C)).astype(np.float32)
    mha = MultiHeadAttention(num_heads=H)
    variables = mha.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # Restrict queries to the first 3 keys via the mask...
    bias = jnp.where(jnp.arange(S)[None, None, None, :] < 3, 0.0, -1e30)
    masked = mha.apply(variables, jnp.asarray(x), mask_bias=bias)
    # ...must equal attending over the sliced key set.
    sliced = mha.apply(variables, jnp.asarray(x), jnp.asarray(x[:, :3]))
    np.testing.assert_allclose(np.asarray(masked), np.asarray(sliced), rtol=1e-5, atol=1e-6)
