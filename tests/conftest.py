"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; shardings are validated on a
virtual CPU mesh per the driver contract.  NOTE: the environment's
sitecustomize imports jax before pytest starts, so JAX_PLATFORMS env vars are
too late here — the platform is forced via jax.config instead (works as long
as no backend has been initialized yet).
"""

import os

# DEMO2_TEST_TPU=1 keeps the real TPU backend so tests/test_tpu_kernels.py
# can validate the Pallas kernels on hardware; everything else in the suite
# assumes the 8-device CPU mesh and should not run in that mode.
_USE_TPU = os.environ.get("DEMO2_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    if _USE_TPU:
        assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    else:
        assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices()


@pytest.fixture()
def tiny_cfg():
    from demo2_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.MODEL.TRANSFORMER_TYPE = "ViT-B-16"
    cfg.INPUT.SIZE_TRAIN = (32, 16)
    cfg.INPUT.SIZE_TEST = (32, 16)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.USE_FLASH_ATTENTION = False
    cfg.TPU.BACKBONE_DEPTH = 2
    cfg.TPU.BACKBONE_WIDTH = 64
    cfg.TPU.BACKBONE_HEADS = 2
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.DATALOADER.NUM_INSTANCE = 2
    cfg.TEST.IMS_PER_BATCH = 8
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.DATASETS.NAMES = "Synthetic"
    return cfg
