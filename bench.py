"""Benchmark: predict-path device throughput on the flagship RandLA-Net.

Metric matches BASELINE.json ("Mpts/sec/chip on 1 km² Lidar HD predict"):
full-cloud points segmented per second through the device inference path —
jitted forward on GridSampled/padded subtile batches + on-device k=10
kNN-interpolation of logits back to every raw point (the reference does this
interpolation on CPU, ``myria3d/models/model.py:87-98``).

Shapes mirror production Lidar HD numbers: ~50 m subtiles of ~30 k raw
points GridSampled(0.25 m) to ~12.5 k (SURVEY.md §6), padded to
N=12 288 sampled / M=32 768 full-cloud slots.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 5 Mpts/s v5e-8 north star scaled to one chip
(0.625 Mpts/s/chip).
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np


def main() -> None:
    from __graft_entry__ import _flagship_model

    B = 16         # subtiles per batch
    N = 12_288     # padded sampled points per subtile (~12.5k after grid sampling)
    M = 32_768     # padded full-cloud points per subtile (~30k raw)
    TRUE_FULL = 30_000  # actual raw points represented per subtile

    model = _flagship_model()
    rng = np.random.default_rng(0)
    x = np.asarray(rng.uniform(0, 1, (B, N, 9)), np.float32)
    pos = np.asarray(rng.uniform(-25, 25, (B, N, 3)), np.float32)
    mask = np.ones((B, N), bool)
    full_pos = np.asarray(rng.uniform(-25, 25, (B, M, 3)), np.float32)
    full_mask = np.zeros((B, M), bool)
    full_mask[:, :TRUE_FULL] = True

    batch = {
        "x": jax.numpy.asarray(x),
        "pos": jax.numpy.asarray(pos),
        "y": jax.numpy.zeros((B, N), jax.numpy.int32),
        "mask": jax.numpy.asarray(mask),
    }
    state = model.init_state(jax.random.PRNGKey(0), batch)
    # NOTE: the step reduces its (B, M, C) logits to one scalar on device and
    # the loop device_gets it every iteration — on the tunneled axon backend
    # block_until_ready alone can report bogus sub-ms timings.
    interp = model.build_interp_step()
    step = jax.jit(lambda *a: interp(*a).sum())
    key = jax.random.PRNGKey(1)

    args = (
        state, batch["x"], batch["pos"], batch["mask"],
        jax.numpy.asarray(pos), jax.numpy.asarray(full_pos),
        jax.numpy.asarray(full_mask), key,
    )
    jax.device_get(step(*args))  # warmup/compile

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = jax.device_get(step(*args))
    dt = time.perf_counter() - t0
    assert np.isfinite(out)

    full_pts_per_s = n_iters * B * TRUE_FULL / dt
    mpts = full_pts_per_s / 1e6
    baseline_per_chip = 5.0 / 8.0  # v5e-8 north star, per chip
    print(json.dumps({
        "metric": "predict_device_throughput",
        "value": round(mpts, 3),
        "unit": "Mpts/s/chip",
        "vs_baseline": round(mpts / baseline_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
