"""Op-level device profile of the jitted train step (round-4 train lever).

Captures a ``jax.profiler`` trace of a few steady-state train steps and
aggregates per-op device self-time from the xplane (via
``jax.profiler.ProfileData`` — no TensorBoard needed), so the backward's
cost structure is visible op by op. The reference has no analog (its
training profile is Lightning's; SURVEY.md §5.1) — this pins the TPU
train-step bound named in docs/perf_notes.md (gather-VJP / HBM).

Usage: python scripts/profile_train_step.py [--b 8] [--n 12288] [--top 40]
       [--sort-inputs] [--window 4608] [--eval]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from myria3d_tpu.models.criterion import CrossEntropyLoss
from myria3d_tpu.models.model import Model

D_IN, C = 9, 7


def _model(sort_inputs=False, window=0):
    hp = dict(
        num_features=D_IN, num_classes=C, num_neighbors=16,
        decimation=4, return_logits=True,
    )
    if window:
        hp["knn_window"] = window
        hp["sort_inputs"] = sort_inputs
    return Model(
        neural_net_class_name="RandLANet",
        neural_net_hparams=hp,
        lr=0.004,
        criterion=CrossEntropyLoss(ignore_index=65),
    )


def _batch(b, n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": rng.uniform(0, 1, (b, n, D_IN)).astype(np.float32),
        "pos": rng.uniform(-25, 25, (b, n, 3)).astype(np.float32),
        "y": rng.integers(0, C, (b, n)).astype(np.int32),
        "mask": np.ones((b, n), bool),
    }


def device_op_times(logdir):
    """Aggregate (op_name -> self time us) over device planes of the trace."""
    acc = collections.Counter()
    nrun = collections.Counter()
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    for p in paths:
        pd = jax.profiler.ProfileData.from_serialized_xspace(
            open(p, "rb").read()
        )
        for plane in pd.planes:
            if "TPU" not in plane.name and "/device:" not in plane.name:
                continue
            for line in plane.lines:
                lname = line.name.lower()
                # XLA op lines carry per-op events; skip step/annotation lines
                if "xla op" not in lname and "ops" != lname:
                    continue
                for ev in line.events:
                    dur = ev.duration_ns / 1e3
                    acc[ev.name] += dur
                    nrun[ev.name] += 1
    return acc, nrun


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--n", type=int, default=12288)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--sort-inputs", action="store_true")
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--eval", action="store_true",
                    help="profile the eval forward instead of the train step")
    args = ap.parse_args()

    model = _model(sort_inputs=args.sort_inputs, window=args.window)
    state = model.init_state(jax.random.PRNGKey(0), _batch(2, 256))
    rng = jax.random.PRNGKey(1)
    batch = _batch(args.b, args.n)
    if args.eval:
        inner = model.build_eval_step()

        def fn(s, x, pos, y, mask, r):
            return inner(s, x, pos, mask)

        step = jax.jit(fn)
    else:
        step = jax.jit(model.build_train_step())
    # device-put once: re-uploading the ~5 MB numpy batch per step costs
    # ~300 ms through a degraded tunnel and swamps the device time
    batch = jax.device_put(batch)
    a = (state, batch["x"], batch["pos"], batch["y"], batch["mask"], rng)

    for _ in range(6):  # warm up + compile
        out = step(*a)
        jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step(*a)
        jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    wall = (time.perf_counter() - t0) / args.iters

    logdir = tempfile.mkdtemp(prefix="trainprof_")
    with jax.profiler.trace(logdir):
        for _ in range(args.iters):
            out = step(*a)
        jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]

    acc, nrun = device_op_times(logdir)
    total = sum(acc.values())
    print(f"# train-step profile  B={args.b} N={args.n} "
          f"sort={args.sort_inputs} window={args.window} eval={args.eval}")
    print(f"wall/step (fetch-verified): {wall * 1e3:.1f} ms; "
          f"device self-time total {total / 1e3 / args.iters:.1f} ms/step")
    print("| op | ms/step | runs/step | % |")
    print("|---|---|---|---|")
    for name, us in acc.most_common(args.top):
        print(f"| {name[:90]} | {us / 1e3 / args.iters:.2f} | "
              f"{nrun[name] / args.iters:.0f} | {100 * us / total:.1f} |")

    # category rollup: async start/done pairs double-count (each event
    # carries the full duration) — halve categories ending in -start;
    # they are also overlap-inflated, so treat as upper bounds.
    import re as _re

    cats = collections.Counter()
    for name, us in acc.items():
        m = _re.match(r"%?([a-zA-Z\-_]+?)[.\d]*\s*=", name)
        cat = m.group(1) if m else name.split(".")[0].lstrip("%")
        if "pallas" in name or "custom-call" in name:
            cat = _re.sub(r"\.\d+$", "", name.split(" = ")[0].lstrip("%"))
            cat = _re.sub(r"\.\d+", "", cat)
        cats[cat] += us / 2 if ("start" in cat or "done" in cat) else us
    print("\n| category | ms/step (async halved) |")
    print("|---|---|")
    for cat, us in cats.most_common(20):
        print(f"| {cat} | {us / 1e3 / args.iters:.1f} |")


if __name__ == "__main__":
    main()
