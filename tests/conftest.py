"""Shared test fixtures.

Mirrors the reference test strategy (``tests/conftest.py``): a session-scoped
synthetic toy dataset + composed configs with overrides. Tests run on a
virtual 8-device CPU mesh so multi-chip sharding is exercised without TPUs.
"""

import os
import subprocess
import sys

# Tests run on a virtual 8-device CPU mesh by default (fast compiles, no
# dependency on the tunneled TPU; multi-chip sharding exercised without
# TPUs). Set MYRIA3D_TEST_TPU=1 to run on the real chip instead.
if not os.environ.get("MYRIA3D_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        )

# Persistent XLA compilation cache: full-network compiles are ~30-40s, so
# cache them across test runs (and across CPU-mesh subprocesses below).
_COMP_CACHE = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402  (after cache/platform env vars)

jax.config.update("jax_compilation_cache_dir", _COMP_CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
if not os.environ.get("MYRIA3D_TEST_TPU"):
    # sitecustomize imports jax (axon TPU) before conftest runs, so the env
    # var alone is too late — override the already-captured config value.
    jax.config.update("jax_platforms", "cpu")

CPU_MESH_ENV = {
    "JAX_PLATFORMS": "cpu",
    "PYTHONPATH": "",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def run_in_cpu_mesh_subprocess(code: str, n_devices: int = 8) -> str:
    """Run python ``code`` in a subprocess with an N-device virtual CPU mesh."""
    env = {**os.environ, **CPU_MESH_ENV}
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root
    result = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=600,
    )
    if result.returncode != 0:
        raise AssertionError(
            f"CPU-mesh subprocess failed:\nSTDOUT:\n{result.stdout}\nSTDERR:\n{result.stderr}"
        )
    return result.stdout

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
