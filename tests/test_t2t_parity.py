"""T2T-ViT backbone parity against the DIRECT-imported reference
(modeling/backbones/t2t.py + token_transformer.py + transformer_block.py).

The reference's T2T_module.forward hardcodes the 256x128 grid reshapes
(t2t.py:98-106), so the full-trunk parity test runs at the real input size
with a tiny depth/width; the tokens-to-token stage quirks (input-dim softmax
scale, V-skip) are covered by the same comparison.

Note the reference cannot RUN these backbones end-to-end: its
build_transformer never constructs t2t names (meta_arch.py:51-87), so the
working assembly test at the bottom is capability beyond the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ref_loader import load_ref

from demo2_tpu.models.t2t import T2TViT, sinusoid_encoding

RNG = jax.random.PRNGKey(0)


def _ln(dst, mod):
    dst["scale"] = mod.weight.detach().numpy()
    dst["bias"] = mod.bias.detach().numpy()


def _dense(dst, mod):
    dst["kernel"] = mod.weight.detach().numpy().T
    if mod.bias is not None:
        dst["bias"] = mod.bias.detach().numpy()


def _copy_token_transformer(dst, mod):
    _ln(dst["norm1"], mod.norm1)
    _dense(dst["qkv"], mod.attn.qkv)
    _dense(dst["proj"], mod.attn.proj)
    _ln(dst["norm2"], mod.norm2)
    _dense(dst["mlp"]["fc1"], mod.mlp.fc1)
    _dense(dst["mlp"]["fc2"], mod.mlp.fc2)


def _copy_block(dst, mod):
    _ln(dst["norm1"], mod.norm1)
    _dense(dst["attn"]["qkv"], mod.attn.qkv)
    _dense(dst["attn"]["proj"], mod.attn.proj)
    _ln(dst["norm2"], mod.norm2)
    _dense(dst["mlp"]["fc1"], mod.mlp.fc1)
    _dense(dst["mlp"]["fc2"], mod.mlp.fc2)


def test_sinusoid_table_parity():
    ref_tb = load_ref("modeling.backbones.transformer_block")
    want = ref_tb.get_sinusoid_encoding(129, 48).numpy()
    got = sinusoid_encoding(129, 48)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_t2t_trunk_parity():
    ref_t2t = load_ref("modeling.backbones.t2t")
    torch.manual_seed(0)
    depth, dim, heads, tdim = 2, 48, 2, 16
    ref = ref_t2t.T2T_ViT(
        img_size=(256, 128), tokens_type="transformer", embed_dim=dim,
        depth=depth, num_heads=heads, mlp_ratio=3.0, qkv_bias=False,
        token_dim=tdim, drop_path_rate=0.0, camera=0, view=0,
    ).eval()

    model = T2TViT(
        img_size=(256, 128), embed_dim=dim, depth=depth, num_heads=heads,
        mlp_ratio=3.0, qkv_bias=False, token_dim=tdim, drop_path_rate=0.0,
    )
    x = np.random.RandomState(1).rand(1, 256, 128, 3).astype(np.float32)
    vars_ = model.init({"params": RNG}, jnp.asarray(x))
    P = jax.tree_util.tree_map(np.array, dict(vars_["params"]))

    t2t = ref.tokens_to_token
    _copy_token_transformer(P["tokens_to_token"]["attention1"], t2t.attention1)
    _copy_token_transformer(P["tokens_to_token"]["attention2"], t2t.attention2)
    _dense(P["tokens_to_token"]["project"], t2t.project)
    P["cls_token"] = ref.cls_token.detach().numpy()
    for i in range(depth):
        _copy_block(P[f"blocks_{i}"], ref.blocks[i])
    _ln(P["norm"], ref.norm)

    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0].numpy()
    got = np.asarray(model.apply({"params": P}, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 129, dim)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_t2t_backbone_in_full_assembly():
    """t2t_vit_t_14 actually runs inside DeMo (which the reference cannot:
    meta_arch.py:51-87 never constructs it)."""
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.models import make_model

    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "t2t_vit_t_14"
    cfg.TPU.BACKBONE_DEPTH = 1
    cfg.TPU.BACKBONE_WIDTH = 32
    cfg.TPU.BACKBONE_HEADS = 2
    cfg.INPUT.SIZE_TRAIN = (64, 32)
    cfg.INPUT.SIZE_TEST = (64, 32)
    cfg.freeze()
    model = make_model(cfg, num_class=4, camera_num=2)
    imgs = jnp.zeros((2, 3, 64, 32, 3))
    cams = jnp.zeros((2,), jnp.int32)
    views = jnp.zeros((2,), jnp.int32)
    vars_ = model.init(
        {"params": RNG, "dropout": RNG, "gumbel": RNG}, imgs, cams, views,
        train=False,
    )
    out = model.apply(vars_, imgs, cams, views, train=False)
    assert out["embedding"].shape == (2, 3 * 32)
    assert np.isfinite(np.asarray(out["embedding"])).all()
