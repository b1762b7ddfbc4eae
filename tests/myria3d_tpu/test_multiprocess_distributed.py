"""Real multi-process data-parallel training (jax.distributed, 2 CPU procs).

The reference trains 2 nodes x 3 GPUs via Lightning DDP
(``configs/experiment/RandLaNet_base_run_FR-2x3GPUs.yaml:13-18``). The mesh
code path for that regime — per-process input shards through
``jax.make_array_from_process_local_data`` (``parallel/mesh.py``), a GSPMD
train step over a mesh spanning processes, and the *collective* checkpoint
write (every process calls ``save_checkpoint``; orbax barriers internally
and only the primary host touches the filesystem) — is exercised here with
two real OS processes over the distributed runtime, and the result is
asserted equal to the same computation on a single-process 2-device mesh.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

B, N, D_IN, C = 4, 256, 9, 7

_WORKER = r"""
import json, sys
pid, nproc, port, out_json, ckpt_dir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
)
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc
import numpy as np
import jax.numpy as jnp
from myria3d_tpu.models.criterion import CrossEntropyLoss
from myria3d_tpu.models.model import Model
from myria3d_tpu.parallel.mesh import (
    make_mesh, replicate_to_mesh, shard_batch, sharded_train_step,
)

B, N, D_IN, C = 4, 256, 9, 7
model = Model(
    neural_net_class_name="RandLANet",
    neural_net_hparams=dict(
        num_features=D_IN, num_classes=C, num_neighbors=8,
        decimation=4, return_logits=True,
    ),
    lr=0.01,
    criterion=CrossEntropyLoss(ignore_index=65),
)
rng_np = np.random.default_rng(0)
batch = {
    "x": rng_np.uniform(0, 1, (B, N, D_IN)).astype(np.float32),
    "pos": rng_np.uniform(-1, 1, (B, N, 3)).astype(np.float32),
    "y": rng_np.integers(0, C, (B, N)).astype(np.int32),
    "mask": np.ones((B, N), bool),
}
mesh = make_mesh()
assert mesh.devices.size == nproc  # one local CPU device per process
state = model.init_state(jax.random.PRNGKey(0), batch)
state = replicate_to_mesh(state, mesh)
step = sharded_train_step(model, mesh, sync_bn=True)

per = B // nproc
local = {k: v[pid * per:(pid + 1) * per] for k, v in batch.items()}
losses = []
rng = jax.random.PRNGKey(1)
for i in range(3):
    arrays = shard_batch(local, mesh)  # make_array_from_process_local_data
    state, loss, logits = step(
        state, arrays["x"], arrays["pos"], arrays["y"], arrays["mask"], rng
    )
    losses.append(float(np.asarray(loss)))  # replicated scalar

# Collective checkpoint write: EVERY process calls save (orbax coordinates;
# the primary host does the filesystem writes).
model.raw_hparams = {
    "neural_net_class_name": "RandLANet",
    "neural_net_hparams": dict(
        num_features=D_IN, num_classes=C, num_neighbors=8,
        decimation=4, return_logits=True,
    ),
    "lr": 0.01,
}
model.save_checkpoint(ckpt_dir, state, save_opt_state=False)

checksum = float(sum(
    np.abs(np.asarray(l)).sum() for l in jax.tree_util.tree_leaves(state.params)
))
with open(out_json, "w") as f:
    json.dump({"pid": pid, "losses": losses, "checksum": checksum}, f)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(
    not os.environ.get("MYRIA3D_E2E_TESTS"),
    reason="multi-process distributed test is opt-in: set MYRIA3D_E2E_TESTS=1",
)
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    ckpt_dir = str(tmp_path / "mp_ckpt")
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": os.environ.get("PYTHONPATH", "") + os.pathsep + repo_root,
    }
    env.pop("XLA_FLAGS", None)  # one real local CPU device per process
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port),
             str(tmp_path / f"out{pid}.json"), ckpt_dir],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    reports = [
        json.loads((tmp_path / f"out{pid}.json").read_text())
        for pid in range(2)
    ]
    # replicated results agree bit-for-bit across processes
    assert reports[0]["losses"] == reports[1]["losses"]
    assert reports[0]["checksum"] == reports[1]["checksum"]

    # single-process 2-device reference: same global batch, same seeds
    import jax

    from myria3d_tpu.models.criterion import CrossEntropyLoss
    from myria3d_tpu.models.model import Model
    from myria3d_tpu.parallel.mesh import (
        make_mesh, replicate_to_mesh, shard_batch, sharded_train_step,
    )

    model = Model(
        neural_net_class_name="RandLANet",
        neural_net_hparams=dict(
            num_features=D_IN, num_classes=C, num_neighbors=8,
            decimation=4, return_logits=True,
        ),
        lr=0.01,
        criterion=CrossEntropyLoss(ignore_index=65),
    )
    rng_np = np.random.default_rng(0)
    batch = {
        "x": rng_np.uniform(0, 1, (B, N, D_IN)).astype(np.float32),
        "pos": rng_np.uniform(-1, 1, (B, N, 3)).astype(np.float32),
        "y": rng_np.integers(0, C, (B, N)).astype(np.int32),
        "mask": np.ones((B, N), bool),
    }
    mesh = make_mesh(2)
    state = model.init_state(jax.random.PRNGKey(0), batch)
    state = replicate_to_mesh(state, mesh)
    step = sharded_train_step(model, mesh, sync_bn=True)
    rng = jax.random.PRNGKey(1)
    ref_losses = []
    for _ in range(3):
        arrays = shard_batch(batch, mesh)
        state, loss, _ = step(
            state, arrays["x"], arrays["pos"], arrays["y"], arrays["mask"], rng
        )
        ref_losses.append(float(np.asarray(loss)))
    # Cross-topology parity is fp-exactness-limited: the 2-process mesh
    # reduces across Gloo with different fusion/reduction order than the
    # single-process mesh (measured drift ~2.4e-4 on the loss after 3
    # steps). The cross-PROCESS assertion above stays bit-exact.
    np.testing.assert_allclose(reports[0]["losses"], ref_losses, rtol=2e-3)
    ref_checksum = float(sum(
        np.abs(np.asarray(l)).sum()
        for l in jax.tree_util.tree_leaves(state.params)
    ))
    np.testing.assert_allclose(
        reports[0]["checksum"], ref_checksum, rtol=1e-3
    )

    # the collectively-written checkpoint loads in a plain single process
    loaded_model, loaded_state = Model.load_from_checkpoint(ckpt_dir)
    loaded_checksum = float(sum(
        np.abs(np.asarray(l)).sum()
        for l in jax.tree_util.tree_leaves(loaded_state.params)
    ))
    np.testing.assert_allclose(
        loaded_checksum, reports[0]["checksum"], rtol=1e-6
    )
