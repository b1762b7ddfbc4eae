"""Shared test fixtures.

Mirrors the reference test strategy (``tests/conftest.py``): a session-scoped
synthetic toy dataset + composed configs with overrides. Tests run on a
virtual 8-device CPU mesh so multi-chip sharding is exercised without TPUs.
"""

import os

# Must be set before jax import: virtual 8-device CPU mesh for sharding tests.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO_ROOT, "configs")


@pytest.fixture(autouse=True)
def seed_everything():
    np.random.seed(12345)


@pytest.fixture(autouse=True)
def logs_dir(monkeypatch, tmp_path):
    monkeypatch.setenv("LOGS_DIR", str(tmp_path / "logs"))


def make_default_hydra_cfg(overrides=None):
    """Compose the default config with overrides (reference conftest.py:21-27)."""
    from myria3d_tpu.utils.config import compose

    return compose(CONFIG_DIR, "config.yaml", overrides or [])


@pytest.fixture(scope="session")
def toy_las_path(tmp_path_factory):
    """A synthetic 110 m x 110 m classified LAS tile (replaces the reference's
    committed 100mx100m toy LAS, which is a missing large blob)."""
    from myria3d_tpu.pctl.dataset.toy_dataset import write_synthetic_toy_las

    d = tmp_path_factory.mktemp("toy_src")
    path = str(d / "862000_6652000.classified_toy_dataset.100mx100m.las")
    write_synthetic_toy_las(path)
    return path


@pytest.fixture(scope="session")
def toy_dataset_hdf5_path(tmp_path_factory, toy_las_path):
    """Session-scoped toy HDF5 dataset built from the synthetic LAS."""
    from myria3d_tpu.pctl.dataset.toy_dataset import make_toy_dataset_from_test_file

    d = tmp_path_factory.mktemp("toy_hdf5")
    hdf5_path = str(d / "toy_dataset.hdf5")
    return make_toy_dataset_from_test_file(hdf5_path, toy_las_path)
