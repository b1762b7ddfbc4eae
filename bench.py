"""Benchmark: predict-path device throughput on the flagship RandLA-Net.

Metric matches BASELINE.json ("Mpts/sec/chip on 1 km² Lidar HD predict"):
full-cloud points segmented per second through the production device
inference path — jitted forward + on-device k=10 kNN interpolation of
logits back to every raw point (the reference did this on CPU,
``myria3d/models/model.py:87-98``).

Data mirrors production Lidar HD: per 50 m subtile, ~30k raw points
GridSampled(0.25 m) on the host (the real pctl transform, native C++ when
available) to ~12k sampled points, padded to N=12 288 / M=32 768.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu"}.
vs_baseline is against the 5 Mpts/s v5e-8 north star scaled to one chip
(0.625 Mpts/s/chip).

``--train`` benchmarks the TRAIN step instead (fwd + bwd + adam through
the shipped default path: sorted windowed kNN + fused train-mode LFA +
MXU scatter-add gather VJPs), reporting sampled points consumed per
second per chip. The reference publishes no train throughput (BASELINE.md);
vs_baseline uses the same 0.625 Mpts/s/chip share for comparability.

``mfu`` anchors the points/s number to the chip: XLA-counted FLOPs from
``compiled.cost_analysis()`` divided by (step time x chip peak). Two
honesty caveats, both making it a LOWER bound: Pallas kernels are opaque
custom calls (their FLOPs are uncounted), and the model's matmuls run in
f32 (peak used is the bf16 MXU peak). The companion
``hbm_bw_util`` (bytes-accessed / time / peak HBM bandwidth) is reported
the same way.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# chip peaks for MFU/bandwidth anchoring (public specs)
_CHIP_PEAKS = {
    # device_kind substring: (dense bf16 FLOP/s, HBM bytes/s)
    "v5 lite": (197e12, 819e9),   # v5e
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6": (918e12, 1640e9),       # v6e (Trillium)
}


def _chip_peak():
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in _CHIP_PEAKS.items():
        if key in kind:
            return peaks
    return (197e12, 819e9)  # default to v5e


def _cost_analysis(compiled):
    """(flops, bytes_accessed) from the compiled executable, or None on
    backends that don't expose cost analysis (e.g. some remote tunnels)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return None


def _timed_loop(step, args, n_iters=10, warmup=12):
    """Pipelined timing loop with a fetch per iteration (tunnel-safe)."""
    pending = step(*args)
    for _ in range(warmup):
        nxt = step(*args)
        out = jax.device_get(pending)
        pending = nxt
    t0 = time.perf_counter()
    for _ in range(n_iters):
        nxt = step(*args)
        out = jax.device_get(pending)
        pending = nxt
    dt = (time.perf_counter() - t0) / n_iters
    out = jax.device_get(pending)
    assert np.all(np.isfinite(out))
    return dt


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


def bench_train(args_cli) -> None:
    """Train-step throughput + MFU through the shipped default train path
    (``configs/model/randla_net_model.yaml``: ``sort_inputs: true,
    knn_window: 4608``, ``fused_train_lfa: auto`` — windowed kNN + MXU
    scatter-add gather VJPs, with the fused train-mode LFA kernel
    engaging at the default B=16 per its measured ≥16 crossover;
    docs/perf_notes.md round 5)."""
    from __graft_entry__ import _flagship_model

    smoke = bool(os.environ.get("MYRIA3D_BENCH_SMOKE"))
    B = args_cli.batch_size or (2 if smoke else 16)
    N = 512 if smoke else 12_288

    model = _flagship_model()
    if not smoke:
        model.neural_net_hparams.update(sort_inputs=True, knn_window=4608)
        model._rebuild_net()
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.uniform(0, 1, (B, N, 9)).astype(np.float32)),
        "pos": jnp.asarray(rng.uniform(-25, 25, (B, N, 3)).astype(np.float32)),
        "y": jnp.asarray(rng.integers(0, 7, (B, N)).astype(np.int32)),
        "mask": jnp.ones((B, N), bool),
    }
    state = model.init_state(jax.random.PRNGKey(0), batch)
    inner = model.build_train_step()

    # The loop fetches (loss, updated-param checksum) each iteration
    # (tunnel-safe). The checksum is LOAD-BEARING: a wrapper returning
    # only the loss lets XLA dead-code-eliminate the whole backward +
    # optimizer update (the loss depends on the forward alone) and the
    # "train step" silently measures forward-only. Reducing every updated
    # param leaf keeps every gradient live for ~2 MFLOP of extra work.
    def step(state, x, pos, y, mask, rng):
        new_state, loss, _ = inner(state, x, pos, y, mask, rng)
        chk = sum(
            jnp.sum(leaf)
            for leaf in jax.tree_util.tree_leaves(new_state.params)
        )
        return loss, chk

    jitted = jax.jit(step)
    args = (state, batch["x"], batch["pos"], batch["y"], batch["mask"],
            jax.random.PRNGKey(1))
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    cost = _cost_analysis(compiled)
    dt = _timed_loop(jitted, args, n_iters=10, warmup=8)

    mpts = B * N / dt / 1e6
    peak_flops, peak_bw = _chip_peak()
    mfu = round(cost[0] / dt / peak_flops, 4) if cost else None
    bw = round(cost[1] / dt / peak_bw, 4) if cost else None
    print(json.dumps({
        "metric": "train_device_throughput",
        "value": round(mpts, 3),
        "unit": "Mpts/s/chip",
        "vs_baseline": round(mpts / (5.0 / 8.0), 3),
        "step_ms": round(dt * 1e3, 1),
        "batch_size": B,
        "mfu": mfu,
        "hbm_bw_util": bw,
    }))


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
    ap.add_argument(
        "--train", action="store_true",
        help="benchmark the train step (default: predict interp step)",
    )
    args_cli = ap.parse_args()
    if args_cli.train:
        bench_train(args_cli)
        return

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
    compiled = jax.jit(lambda *a: step(*a)).lower(*args).compile()
    cost = _cost_analysis(compiled)
    # The production predict loop pipelines device steps with a depth-2
    # pending queue (myria3d_tpu/predict.py), so the bench loop does the
    # same: dispatch step i+1 before fetching step i's scalar. Every result
    # is still fetched (on the tunneled axon backend block_until_ready
    # alone can report bogus sub-ms timings). The 12 fetched warmups absorb
    # the tunneled backend's first-executable slow path (the first timed
    # loop of a fresh process otherwise measures 25-200x high).
    dt = _timed_loop(step, args, n_iters=10, warmup=12)

    mpts = B * TRUE_FULL / dt / 1e6
    baseline_per_chip = 5.0 / 8.0  # v5e-8 north star, per chip
    peak_flops, peak_bw = _chip_peak()
    suffix = "" if args_cli.model == "randlanet" else f"_{args_cli.model}"
    if args_cli.dtype == "bfloat16":
        suffix += "_bf16"
    print(json.dumps({
        "metric": f"predict_device_throughput{suffix}",
        "value": round(mpts, 3),
        "unit": "Mpts/s/chip",
        "vs_baseline": round(mpts / baseline_per_chip, 3),
        "step_ms": round(dt * 1e3, 1),
        "batch_size": B,
        "mfu": round(cost[0] / dt / peak_flops, 4) if cost else None,
        "hbm_bw_util": round(cost[1] / dt / peak_bw, 4) if cost else None,
    }))


if __name__ == "__main__":
    main()
