"""Op-level device profile of the production predict (interp) step.

Same xplane aggregation as ``profile_train_step.py`` but over
``Model.interp_step`` at the bench shape (B=48, 12k bucket -> 32k full
cloud) — the driver-captured headline path. Reference has no analog
(SURVEY.md §5.1).

Usage: python scripts/profile_interp_step.py [--b 48] [--n 12288]
       [--m 32768] [--window 4608] [--top 30]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from myria3d_tpu.models.criterion import CrossEntropyLoss
from myria3d_tpu.models.model import Model
from profile_train_step import device_op_times  # noqa: E402

D_IN, C = 9, 7


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=48)
    ap.add_argument("--n", type=int, default=12288)
    ap.add_argument("--m", type=int, default=32768)
    ap.add_argument("--window", type=int, default=4608)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    hp = dict(
        num_features=D_IN, num_classes=C, num_neighbors=16,
        decimation=4, return_logits=True,
    )
    model = Model(
        neural_net_class_name="RandLANet", neural_net_hparams=hp,
        lr=0.004, criterion=CrossEntropyLoss(ignore_index=65),
        interpolation_k=10,
    )
    rng = np.random.default_rng(0)
    b, n, m = args.b, args.n, args.m

    def sorted_pos(nn):
        pos = rng.uniform(0, 50, (b, nn, 3)).astype(np.float32)
        order = np.argsort(pos[..., 0], axis=1)
        return np.take_along_axis(pos, order[..., None], axis=1)

    pos = sorted_pos(n)
    batch = {
        "x": rng.uniform(0, 1, (b, n, D_IN)).astype(np.float32),
        "pos": pos,
        "y": rng.integers(0, C, (b, n)).astype(np.int32),
        "mask": np.ones((b, n), bool),
    }
    state = model.init_state(
        jax.random.PRNGKey(0),
        {k: v[:2, :256] for k, v in batch.items()},
    )
    full_pos = sorted_pos(m)
    full_mask = np.ones((b, m), bool)
    if args.window:
        model.set_sorted_window(args.window)  # the production predict knob
    step = model.interp_step
    key = jax.random.PRNGKey(1)
    a = jax.device_put((
        batch["x"], batch["pos"], batch["mask"], batch["pos"],
        full_pos, full_mask,
    ))
    call = lambda: step(state, a[0], a[1], a[2], a[3], a[4], a[5], key)

    for _ in range(6):
        out = call()
        jax.device_get(out[0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = call()
        jax.device_get(out[0, 0, :1])
    wall = (time.perf_counter() - t0) / args.iters

    logdir = tempfile.mkdtemp(prefix="interprof_")
    with jax.profiler.trace(logdir):
        for _ in range(args.iters):
            out = call()
        jax.device_get(out[0, 0, :1])

    acc, nrun = device_op_times(logdir)
    total = sum(acc.values())
    print(f"# interp-step profile  B={b} N={n} M={m} window={args.window}")
    print(f"wall/step (fetch-verified): {wall * 1e3:.1f} ms; "
          f"device self-time total {total / 1e3 / args.iters:.1f} ms/step")
    print("| op | ms/step | runs/step | % |")
    print("|---|---|---|---|")
    for name, us in acc.most_common(args.top):
        print(f"| {name[:90]} | {us / 1e3 / args.iters:.2f} | "
              f"{nrun[name] / args.iters:.0f} | {100 * us / total:.1f} |")


if __name__ == "__main__":
    main()
