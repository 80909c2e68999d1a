"""OSNet backbone parity against the DIRECT-imported reference
(modeling/backbones/basic_cnn_params/osnet.py), plus a full-assembly run.

Parity runs the x0_25 width for CPU speed; the structure (shared channel
gate across the four streams, depthwise light convs, stage transitions) is
width-independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ref_loader import load_ref

from demo2_tpu.models.osnet import OSNet
from demo2_tpu.models.resnet import resnet_tokens

RNG = jax.random.PRNGKey(0)


def _conv(dst, mod):
    dst["kernel"] = mod.weight.detach().numpy().transpose(2, 3, 1, 0)
    if mod.bias is not None:
        dst["bias"] = mod.bias.detach().numpy()


def _bn(dst, stats, mod):
    dst["scale"] = mod.weight.detach().numpy()
    dst["bias"] = mod.bias.detach().numpy()
    stats["mean"] = mod.running_mean.numpy()
    stats["var"] = mod.running_var.numpy()


def _convbn(d, s, conv, bn):
    _conv(d["conv"], conv)
    _bn(d["bn"], s["bn"], bn)


def _light(d, s, mod):
    _conv(d["conv1"], mod.conv1)
    # torch depthwise weight (C, 1, 3, 3) -> flax (3, 3, 1, C)
    d["conv2"]["kernel"] = mod.conv2.weight.detach().numpy().transpose(2, 3, 1, 0)
    _bn(d["bn"], s["bn"], mod.bn)


def _osblock(d, s, blk):
    _convbn(d["conv1"], s["conv1"], blk.conv1.conv, blk.conv1.bn)
    _light(d["conv2a_0"], s["conv2a_0"], blk.conv2a)
    for i, m in enumerate(blk.conv2b):
        _light(d[f"conv2b_{i}"], s[f"conv2b_{i}"], m)
    for i, m in enumerate(blk.conv2c):
        _light(d[f"conv2c_{i}"], s[f"conv2c_{i}"], m)
    for i, m in enumerate(blk.conv2d):
        _light(d[f"conv2d_{i}"], s[f"conv2d_{i}"], m)
    _conv(d["gate"]["fc1"], blk.gate.fc1)
    _conv(d["gate"]["fc2"], blk.gate.fc2)
    _convbn(d["conv3"], s["conv3"], blk.conv3.conv, blk.conv3.bn)
    if blk.downsample is not None:
        _convbn(d["downsample"], s["downsample"], blk.downsample.conv,
                blk.downsample.bn)


@pytest.mark.slow
def test_osnet_featuremap_parity():
    ref_mod = load_ref("modeling.backbones.basic_cnn_params.osnet")
    torch.manual_seed(0)
    chans = [16, 64, 96, 128]  # x0_25 (osnet.py:567-581)
    ref = ref_mod.OSNet(
        num_classes=10, blocks=[ref_mod.OSBlock] * 3, layers=[2, 2, 2],
        channels=chans, loss="softmax",
    ).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    model = OSNet(layers=(2, 2, 2), channels=tuple(chans))
    x = np.random.RandomState(3).rand(1, 64, 32, 3).astype(np.float32)
    vars_ = model.init({"params": RNG}, jnp.asarray(x), train=False)
    P = jax.tree_util.tree_map(np.array, dict(vars_["params"]))
    S = jax.tree_util.tree_map(np.array, dict(vars_["batch_stats"]))

    _convbn(P["conv1"], S["conv1"], ref.conv1.conv, ref.conv1.bn)
    for stage, seq in enumerate([ref.conv2, ref.conv3, ref.conv4]):
        blocks = [m for m in seq if isinstance(m, ref_mod.OSBlock)]
        for j, blk in enumerate(blocks):
            _osblock(P[f"conv{stage + 2}_{j}"], S[f"conv{stage + 2}_{j}"], blk)
        if stage < 2:  # transition Sequential(Conv1x1, AvgPool)
            trans = seq[-1][0]
            _convbn(P[f"transition{stage + 2}"], S[f"transition{stage + 2}"],
                    trans.conv, trans.bn)
    _convbn(P["conv5"], S["conv5"], ref.conv5.conv, ref.conv5.bn)

    with torch.no_grad():
        want = ref.featuremaps(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        model.apply({"params": P, "batch_stats": S}, jnp.asarray(x), train=False)
    ).transpose(0, 3, 1, 2)
    assert got.shape == want.shape == (1, 128, 4, 2)  # 16-stride map
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    g, _ = resnet_tokens(jnp.asarray(got.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(g)[0], want.mean(axis=(2, 3))[0], rtol=1e-3, atol=1e-4
    )


def _osblock_ain(d, s, blk, ref_mod):
    """osnet_ain blocks: LightConvStream-wrapped streams; OSBlockINin drops
    conv3's BN and applies affine IN pre-residual (osnet_ain.py:271-304)."""
    _convbn(d["conv1"], s["conv1"], blk.conv1.conv, blk.conv1.bn)
    for si in range(4):
        stream = blk.conv2[si].layers
        for ci, m in enumerate(stream):
            key = f"conv2{'abcd'[si]}_{ci}"
            _light(d[key], s[key], m)
    _conv(d["gate"]["fc1"], blk.gate.fc1)
    _conv(d["gate"]["fc2"], blk.gate.fc2)
    if isinstance(blk, ref_mod.OSBlockINin):
        d["conv3"]["kernel"] = (
            blk.conv3.conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        )
        d["in3"]["scale"] = blk.IN.weight.detach().numpy()
        d["in3"]["bias"] = blk.IN.bias.detach().numpy()
    else:
        _convbn(d["conv3"], s["conv3"], blk.conv3.conv, blk.conv3.bn)
    if blk.downsample is not None:
        _convbn(d["downsample"], s["downsample"], blk.downsample.conv,
                blk.downsample.bn)


@pytest.mark.slow
def test_osnet_ain_featuremap_parity():
    """osnet_ain vs the direct-imported reference (osnet_ain.py): affine-IN
    conv1 stem + the per-(stage, block) OSBlockINin/OSBlock mix of
    osnet_ain_x1_0 (:536-544), run at x0_25 width for CPU speed."""
    from demo2_tpu.models.osnet import OSNET_AIN_VARIANTS

    ref_mod = load_ref("modeling.backbones.basic_cnn_params.osnet_ain")
    torch.manual_seed(0)
    chans = [16, 64, 96, 128]
    ref = ref_mod.OSNet(
        num_classes=10,
        blocks=[
            [ref_mod.OSBlockINin, ref_mod.OSBlockINin],
            [ref_mod.OSBlock, ref_mod.OSBlockINin],
            [ref_mod.OSBlockINin, ref_mod.OSBlock],
        ],
        layers=[2, 2, 2], channels=chans, conv1_IN=True, loss="softmax",
    ).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
            if isinstance(m, torch.nn.InstanceNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)

    model = OSNet(
        layers=(2, 2, 2), channels=tuple(chans),
        block_variants=OSNET_AIN_VARIANTS, conv1_in=True,
    )
    x = np.random.RandomState(5).rand(1, 64, 32, 3).astype(np.float32)
    vars_ = model.init({"params": RNG}, jnp.asarray(x), train=False)
    P = jax.tree_util.tree_map(np.array, dict(vars_["params"]))
    S = jax.tree_util.tree_map(np.array, dict(vars_["batch_stats"]))

    # conv1: ConvLayer with IN=True -> affine InstanceNorm, no running stats.
    _conv(P["conv1"]["conv"], ref.conv1.conv)
    P["conv1"]["in"]["scale"] = ref.conv1.bn.weight.detach().numpy()
    P["conv1"]["in"]["bias"] = ref.conv1.bn.bias.detach().numpy()
    # ain keeps transitions OUTSIDE the stage Sequentials (pool2/pool3).
    for stage, seq in enumerate([ref.conv2, ref.conv3, ref.conv4]):
        for j, blk in enumerate(seq):
            _osblock_ain(
                P[f"conv{stage + 2}_{j}"], S[f"conv{stage + 2}_{j}"], blk, ref_mod
            )
    for stage, pool in enumerate([ref.pool2, ref.pool3]):
        _convbn(P[f"transition{stage + 2}"], S[f"transition{stage + 2}"],
                pool[0].conv, pool[0].bn)
    _convbn(P["conv5"], S["conv5"], ref.conv5.conv, ref.conv5.bn)

    with torch.no_grad():
        want = ref.featuremaps(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        model.apply({"params": P, "batch_stats": S}, jnp.asarray(x), train=False)
    ).transpose(0, 3, 1, 2)
    assert got.shape == want.shape == (1, 128, 4, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_osnet_ain_in_full_assembly():
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.models import make_model

    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "osnet_ain_x0_5"
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
    assert out["embedding"].shape == (2, 3 * 256)
    assert np.isfinite(np.asarray(out["embedding"])).all()


@pytest.mark.slow
def test_osnet_in_full_assembly():
    from demo2_tpu.config import get_cfg_defaults
    from demo2_tpu.models import make_model

    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "osnet_x0_25"
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
    assert out["embedding"].shape == (2, 3 * 128)
    assert np.isfinite(np.asarray(out["embedding"])).all()
