"""ResNet-50 backbone parity against the DIRECT-imported reference
(modeling/backbones/basic_cnn_params/resnet.py) plus a full-assembly run.

The reference cannot construct ANY CNN backbone (meta_arch.py:51-87), so
the assembly test is capability beyond it — the parity check pins the trunk
math (convs, BN running stats, last_stride) to the reference's own module.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ref_loader import load_ref

from demo2_tpu.models.resnet import ResNet, resnet_tokens

RNG = jax.random.PRNGKey(0)


def _copy_convbn(dst, conv, bn, stats):
    dst["conv"]["kernel"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    dst["bn"]["scale"] = bn.weight.detach().numpy()
    dst["bn"]["bias"] = bn.bias.detach().numpy()
    stats["bn"]["mean"] = bn.running_mean.numpy()
    stats["bn"]["var"] = bn.running_var.numpy()


@pytest.mark.slow
def test_resnet50_featuremap_parity():
    ref_mod = load_ref("modeling.backbones.basic_cnn_params.resnet")
    torch.manual_seed(0)
    ref = ref_mod.ResNet(
        num_classes=10, loss="softmax", block=ref_mod.Bottleneck,
        layers=[3, 4, 6, 3], last_stride=1, pretrained=False,
    ).eval()
    # Randomize BN running stats away from (0, 1) so the eval-mode
    # normalization is actually exercised.
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    model = ResNet(layers=(3, 4, 6, 3), last_stride=1)
    x = np.random.RandomState(1).rand(1, 64, 32, 3).astype(np.float32)
    vars_ = model.init({"params": RNG}, jnp.asarray(x), train=False)
    P = jax.tree_util.tree_map(np.array, dict(vars_["params"]))
    S = jax.tree_util.tree_map(np.array, dict(vars_["batch_stats"]))

    _copy_convbn(P["stem"], ref.conv1, ref.bn1, S["stem"])
    for li, layer in enumerate([ref.layer1, ref.layer2, ref.layer3, ref.layer4]):
        for bi, block in enumerate(layer):
            d, s = P[f"layer{li + 1}_{bi}"], S[f"layer{li + 1}_{bi}"]
            _copy_convbn(d["cb1"], block.conv1, block.bn1, s["cb1"])
            _copy_convbn(d["cb2"], block.conv2, block.bn2, s["cb2"])
            _copy_convbn(d["cb3"], block.conv3, block.bn3, s["cb3"])
            if block.downsample is not None:
                _copy_convbn(
                    d["down"], block.downsample[0], block.downsample[1], s["down"]
                )

    with torch.no_grad():
        want = ref.featuremaps(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        model.apply(
            {"params": P, "batch_stats": S}, jnp.asarray(x), train=False
        )
    ).transpose(0, 3, 1, 2)  # NHWC -> NCHW for comparison
    assert got.shape == want.shape == (1, 2048, 4, 2)  # last_stride=1: /16
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    g, t = resnet_tokens(jnp.asarray(got.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(g)[0], want.mean(axis=(2, 3))[0], rtol=1e-3, atol=1e-4
    )  # GAP == AdaptiveAvgPool2d((1,1)); fp32 accumulation order differs


@pytest.mark.slow
def test_resnet_backbone_in_full_assembly():
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.models import make_model

    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "resnet50"
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
    assert out["embedding"].shape == (2, 3 * 2048)
    assert np.isfinite(np.asarray(out["embedding"])).all()


@pytest.mark.slow
def test_resnet50_ibn_a_featuremap_parity():
    """IBN-a variant vs the direct-imported reference resnet_ibn_a module
    (split InstanceNorm/BatchNorm bn1 in layers 1-3; the reference hardcodes
    layer4 stride 2, mirrored here with last_stride=2)."""
    ref_mod = load_ref("modeling.backbones.basic_cnn_params.resnet_ibn_a")
    torch.manual_seed(0)
    ref = ref_mod.ResNet(
        num_classes=10, loss="softmax", block=ref_mod.Bottleneck,
        layers=[3, 4, 6, 3], scale=64, fc_dims=None,
    ).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
            if isinstance(m, torch.nn.InstanceNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)

    model = ResNet(layers=(3, 4, 6, 3), last_stride=2, ibn=True)
    x = np.random.RandomState(2).rand(1, 64, 32, 3).astype(np.float32)
    vars_ = model.init({"params": RNG}, jnp.asarray(x), train=False)
    P = jax.tree_util.tree_map(np.array, dict(vars_["params"]))
    S = jax.tree_util.tree_map(np.array, dict(vars_["batch_stats"]))

    def copy_cb1(d, s, block):
        d["conv"]["kernel"] = block.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
        if hasattr(block.bn1, "IN"):  # IBN split
            d["in"]["scale"] = block.bn1.IN.weight.detach().numpy()
            d["in"]["bias"] = block.bn1.IN.bias.detach().numpy()
            d["bn"]["scale"] = block.bn1.BN.weight.detach().numpy()
            d["bn"]["bias"] = block.bn1.BN.bias.detach().numpy()
            s["bn"]["mean"] = block.bn1.BN.running_mean.numpy()
            s["bn"]["var"] = block.bn1.BN.running_var.numpy()
        else:
            d["bn"]["scale"] = block.bn1.weight.detach().numpy()
            d["bn"]["bias"] = block.bn1.bias.detach().numpy()
            s["bn"]["mean"] = block.bn1.running_mean.numpy()
            s["bn"]["var"] = block.bn1.running_var.numpy()

    _copy_convbn(P["stem"], ref.conv1, ref.bn1, S["stem"])
    for li, layer in enumerate([ref.layer1, ref.layer2, ref.layer3, ref.layer4]):
        for bi, block in enumerate(layer):
            d, s = P[f"layer{li + 1}_{bi}"], S[f"layer{li + 1}_{bi}"]
            copy_cb1(d["cb1"], s["cb1"], block)
            _copy_convbn(d["cb2"], block.conv2, block.bn2, s["cb2"])
            _copy_convbn(d["cb3"], block.conv3, block.bn3, s["cb3"])
            if block.downsample is not None:
                _copy_convbn(
                    d["down"], block.downsample[0], block.downsample[1], s["down"]
                )

    with torch.no_grad():
        want = ref.featuremaps(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        model.apply({"params": P, "batch_stats": S}, jnp.asarray(x), train=False)
    ).transpose(0, 3, 1, 2)
    assert got.shape == want.shape == (1, 2048, 2, 1)  # last_stride=2: /32
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_resnet50_ibn_b_featuremap_parity():
    """IBN-b variant vs the direct-imported reference resnet_ibn_b module:
    affine-IN stem (resnet_ibn_b.py:142) + affine IN after the residual add
    in the LAST block of layers 1-2 (:185-191, :105-108); layer4 stride 2."""
    ref_mod = load_ref("modeling.backbones.basic_cnn_params.resnet_ibn_b")
    torch.manual_seed(0)
    ref = ref_mod.ResNet(
        block=ref_mod.Bottleneck, layers=[3, 4, 6, 3], num_classes=10,
        loss="softmax", fc_dims=None,
    ).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
            if isinstance(m, torch.nn.InstanceNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)

    model = ResNet(layers=(3, 4, 6, 3), last_stride=2, ibn="b")
    x = np.random.RandomState(4).rand(1, 64, 32, 3).astype(np.float32)
    vars_ = model.init({"params": RNG}, jnp.asarray(x), train=False)
    P = jax.tree_util.tree_map(np.array, dict(vars_["params"]))
    S = jax.tree_util.tree_map(np.array, dict(vars_["batch_stats"]))

    # Stem: conv + affine InstanceNorm (no running stats).
    P["stem"]["conv"]["kernel"] = (
        ref.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    )
    P["stem"]["in"]["scale"] = ref.bn1.weight.detach().numpy()
    P["stem"]["in"]["bias"] = ref.bn1.bias.detach().numpy()
    for li, layer in enumerate([ref.layer1, ref.layer2, ref.layer3, ref.layer4]):
        for bi, block in enumerate(layer):
            d, s = P[f"layer{li + 1}_{bi}"], S[f"layer{li + 1}_{bi}"]
            _copy_convbn(d["cb1"], block.conv1, block.bn1, s["cb1"])
            _copy_convbn(d["cb2"], block.conv2, block.bn2, s["cb2"])
            _copy_convbn(d["cb3"], block.conv3, block.bn3, s["cb3"])
            if block.downsample is not None:
                _copy_convbn(
                    d["down"], block.downsample[0], block.downsample[1], s["down"]
                )
            if block.IN is not None:  # post-add IN on the layer's last block
                d["in_out"]["scale"] = block.IN.weight.detach().numpy()
                d["in_out"]["bias"] = block.IN.bias.detach().numpy()

    with torch.no_grad():
        want = ref.featuremaps(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        model.apply({"params": P, "batch_stats": S}, jnp.asarray(x), train=False)
    ).transpose(0, 3, 1, 2)
    assert got.shape == want.shape == (1, 2048, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_resnet_ibn_in_full_assembly():
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.models import make_model

    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "resnet50_ibn_a"
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
    assert out["embedding"].shape == (2, 3 * 2048)
    assert np.isfinite(np.asarray(out["embedding"])).all()
