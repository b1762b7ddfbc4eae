"""Benchmark: predict-path device throughput on the flagship RandLA-Net.

Metric matches BASELINE.json ("Mpts/sec/chip on 1 km² Lidar HD predict"):
full-cloud points segmented per second through the production device
inference path — jitted forward + on-device k=10 kNN interpolation of
logits back to every raw point (the reference did this on CPU,
``myria3d/models/model.py:87-98``).

Data mirrors production Lidar HD: per 50 m subtile, ~30k raw points
GridSampled(0.25 m) on the host (the real pctl transform, native C++ when
available) to ~12k sampled points, padded to N=12 288 / M=32 768.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 5 Mpts/s v5e-8 north star scaled to one chip
(0.625 Mpts/s/chip).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _pointnet2_model():
    from myria3d_tpu.models.criterion import CrossEntropyLoss
    from myria3d_tpu.models.model import Model

    return Model(
        neural_net_class_name="PointNet2",
        neural_net_hparams=dict(
            num_features=9, num_classes=7, return_logits=True,
        ),
        lr=0.001,
        criterion=CrossEntropyLoss(ignore_index=65),
    )


def main() -> None:
    from __graft_entry__ import _flagship_model
    from myria3d_tpu.pctl.transforms.transforms import CopyFullPos, GridSampling

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--model", choices=("randlanet", "pointnet2"), default="randlanet",
        help="zoo entry to benchmark (driver metric = default randlanet)",
    )
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument(
        "--dtype", choices=("float32", "bfloat16"), default=None,
        help="forward compute dtype (predict.compute_dtype analog; default "
        "= the model's f32)",
    )
    args_cli = ap.parse_args()

    smoke = bool(os.environ.get("MYRIA3D_BENCH_SMOKE"))
    B = 48         # subtiles per batch (measured sweep: 16/32/48 ->
                   # 2.71/2.78/2.87 Mpts/s — larger batches amortize the
                   # fixed per-dispatch cost; production predict batches
                   # are a config knob, datamodule.batch_size)
    N = 12_288     # padded sampled points per subtile
    M = 32_768     # padded full-cloud points per subtile
    TRUE_FULL = 30_000  # raw points per subtile (~10 pulses/m² x 50 m²)
    if smoke:      # loop-logic validation on CPU (not a benchmark)
        B, N, M, TRUE_FULL = 2, 512, 1024, 900
    if args_cli.model == "pointnet2" and not smoke:
        B = 16     # PointNet++ grouped (B, M, K, C) tensors are wider than
                   # the LFA's; B=48 HBM-overflows at the 12k bucket
    if args_cli.batch_size:
        B = args_cli.batch_size

    rng = np.random.default_rng(0)
    x = np.zeros((B, N, 9), np.float32)
    pos = np.zeros((B, N, 3), np.float32)
    mask = np.zeros((B, N), bool)
    full_pos = np.zeros((B, M, 3), np.float32)
    full_mask = np.zeros((B, M), bool)

    gs = GridSampling(0.25)
    for b in range(B):
        raw = np.stack(
            [rng.uniform(0, 50, TRUE_FULL), rng.uniform(0, 50, TRUE_FULL),
             rng.uniform(0, 10, TRUE_FULL)], axis=1,
        ).astype(np.float32)
        sample = {"pos": raw, "x": rng.uniform(0, 1, (TRUE_FULL, 9)).astype(np.float32)}
        sample = CopyFullPos()(sample)
        sample = gs(sample)
        ns = min(sample["pos"].shape[0], N)
        # production predict cook ends with SortPointsByX
        # (predict.sorted_window default): x-sorted sampled + full clouds
        order_s = np.argsort(sample["pos"][:ns, 0], kind="stable")
        order_f = np.argsort(raw[:, 0], kind="stable")
        pos[b, :ns] = sample["pos"][:ns][order_s]
        x[b, :ns] = sample["x"][:ns][order_s]
        mask[b, :ns] = True
        full_pos[b, :TRUE_FULL] = raw[order_f]
        full_mask[b, :TRUE_FULL] = True

    model = (
        _pointnet2_model() if args_cli.model == "pointnet2"
        else _flagship_model()
    )
    # windowed kNN over the x-sorted clouds built above (the production
    # predict default, configs/predict/default.yaml sorted_window)
    if not smoke:
        model.set_sorted_window(4608)
    if args_cli.dtype:
        model.set_compute_dtype(args_cli.dtype)
    batch = {
        "x": jnp.asarray(x), "pos": jnp.asarray(pos),
        "y": jnp.zeros((B, N), jnp.int32), "mask": jnp.asarray(mask),
    }
    state = model.init_state(jax.random.PRNGKey(0), batch)
    # NOTE: the step reduces its (B, M, C) logits to one scalar on device and
    # the loop device_gets it every iteration — on the tunneled axon backend
    # block_until_ready alone can report bogus sub-ms timings.
    interp = model.build_interp_step()
    # f32 accumulate: the step ships f16 logits (wire format), whose sum
    # overflows f16 at B*M scale
    step = jax.jit(lambda *a: interp(*a).astype(jnp.float32).sum())
    args = (
        state, batch["x"], batch["pos"], batch["mask"], batch["pos"],
        jnp.asarray(full_pos), jnp.asarray(full_mask),
        jax.random.PRNGKey(1),
    )
    out = jax.device_get(step(*args))  # warmup/compile
    assert np.isfinite(out)
    # The production predict loop pipelines device steps with a depth-2
    # pending queue (myria3d_tpu/predict.py), so the bench loop does the
    # same: dispatch step i+1 before fetching step i's scalar. Every result
    # is still fetched (on the tunneled axon backend block_until_ready
    # alone can report bogus sub-ms timings).
    # Absorb the tunneled backend's first-executable slow path: the first
    # timed loop of a fresh process measures 25-200x high (one-time runtime
    # warm-up amortized over it), steady state arrives after ~10 fetches.
    pending = step(*args)
    for _ in range(12):
        nxt = step(*args)
        out = jax.device_get(pending)
        pending = nxt

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        nxt = step(*args)
        out = jax.device_get(pending)
        pending = nxt
    dt = time.perf_counter() - t0
    out = jax.device_get(pending)
    assert np.isfinite(out)

    full_pts_per_s = n_iters * B * TRUE_FULL / dt
    mpts = full_pts_per_s / 1e6
    baseline_per_chip = 5.0 / 8.0  # v5e-8 north star, per chip
    suffix = "" if args_cli.model == "randlanet" else f"_{args_cli.model}"
    if args_cli.dtype == "bfloat16":
        suffix += "_bf16"
    print(json.dumps({
        "metric": f"predict_device_throughput{suffix}",
        "value": round(mpts, 3),
        "unit": "Mpts/s/chip",
        "vs_baseline": round(mpts / baseline_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
