"""Test harness: force CPU backend with an 8-device virtual mesh.

Multi-chip sharding is validated on a simulated mesh per the standard JAX
recipe (xla_force_host_platform_device_count); the real-TPU path is exercised
by bench.py / __graft_entry__.py instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize force-registers the axon TPU platform and
# overrides JAX_PLATFORMS; updating the config after import wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 oracles in unit tests; pipeline itself is f32

import numpy as np
import pytest


@pytest.fixture(scope="session")
def ref_root():
    return "/root/reference"


@pytest.fixture(scope="session")
def kitti_calib(ref_root):
    from vo_tpu.io import kitti

    return kitti.load_stereo_calib(os.path.join(ref_root, "kitti", "00"))


@pytest.fixture(scope="session")
def gt_poses(ref_root):
    from vo_tpu.io import kitti

    return kitti.read_poses(os.path.join(ref_root, "kitti", "poses", "00.txt"))


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
