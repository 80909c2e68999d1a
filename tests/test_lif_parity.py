"""Golden parity: LIF self-supervised quality targets vs torch functional
(reference: modeling/trimodal_lif.py:78-128)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from demo2_tpu.models.lif import nir_quality, rgb_quality, tir_quality


def _t(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _n(x_nchw):
    return np.transpose(x_nchw.numpy(), (0, 2, 3, 1))


def test_rgb_quality_luminance():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, 32, 16, 3)).astype(np.float32)
    t = _t(img)
    lum = 0.299 * t[:, 0:1] + 0.587 * t[:, 1:2] + 0.114 * t[:, 2:3]
    ref = F.interpolate(lum, size=(4, 2), mode="bilinear", align_corners=False)
    out = rgb_quality(jnp.asarray(img), (4, 2))
    np.testing.assert_allclose(np.asarray(out), _n(ref), rtol=1e-4, atol=1e-5)


def test_nir_quality_laplacian_variance():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(2, 32, 16, 3)).astype(np.float32)
    t = _t(img).mean(dim=1, keepdim=True)
    kern = torch.tensor([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=torch.float32).view(1, 1, 3, 3)
    lap = F.conv2d(t, kern, padding=1)
    k = 15
    pad = k // 2
    lm = F.avg_pool2d(lap, k, stride=1, padding=pad)
    lms = F.avg_pool2d(lap ** 2, k, stride=1, padding=pad)
    var = torch.clamp(lms - lm ** 2, min=0)
    ref = F.interpolate(var, size=(4, 2), mode="bilinear", align_corners=False)
    ref = ref / (ref.amax(dim=[2, 3], keepdim=True) + 1e-6)
    out = nir_quality(jnp.asarray(img), (4, 2))
    np.testing.assert_allclose(np.asarray(out), _n(ref), rtol=1e-3, atol=1e-5)


def test_tir_quality_local_std():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(2, 32, 16, 3)).astype(np.float32)
    t = _t(img).mean(dim=1, keepdim=True)
    k = 15
    pad = k // 2
    lm = F.avg_pool2d(t, k, stride=1, padding=pad)
    lms = F.avg_pool2d(t ** 2, k, stride=1, padding=pad)
    std = torch.sqrt(torch.clamp(lms - lm ** 2, min=0) + 1e-6)
    ref = F.interpolate(std, size=(4, 2), mode="bilinear", align_corners=False)
    ref = ref / (ref.amax(dim=[2, 3], keepdim=True) + 1e-6)
    out = tir_quality(jnp.asarray(img), (4, 2))
    np.testing.assert_allclose(np.asarray(out), _n(ref), rtol=1e-3, atol=1e-5)
