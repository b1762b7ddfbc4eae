"""Diagnose the B>=32 train-step backward cliff (docs/perf_notes.md).

Round-2 measurement: at N=12288 the B=32 step is ~12x the B=8 step for 4x
the work, settling at a flat ~2x per-point cost for B>=32; remat does not
cure it. This script localizes the cliff:

1. wall-time sweep over B (fetch-verified, steady-state) for
   a) the full train step, b) grad-only (no adam), c) forward-only (eval);
2. XLA ``cost_analysis`` (flops / bytes accessed) and ``memory_analysis``
   (peak HBM, temp allocation) per B — a bytes-accessed-per-point jump
   identifies spills/defusion, a flat profile points at scheduling;
3. optimized-HLO op census per B (fusion / copy / convert / scatter /
   gather counts) to spot structural changes in the compiled program.

Usage: python scripts/diag_backward_cliff.py [--n 12288] [--bs 8,16,24,32]
Writes a markdown-ish report to stdout; run on the TPU host.
"""

from __future__ import annotations

import argparse
import collections
import re
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from myria3d_tpu.models.criterion import CrossEntropyLoss
from myria3d_tpu.models.model import Model

D_IN, C = 9, 7


def _model(remat=False, microbatch=0):
    return Model(
        neural_net_class_name="RandLANet",
        neural_net_hparams=dict(
            num_features=D_IN, num_classes=C, num_neighbors=16,
            decimation=4, return_logits=True, remat=remat,
        ),
        lr=0.004,
        criterion=CrossEntropyLoss(ignore_index=65),
        grad_microbatch=microbatch,
    )


def _batch(b, n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": rng.uniform(0, 1, (b, n, D_IN)).astype(np.float32),
        "pos": rng.uniform(-25, 25, (b, n, 3)).astype(np.float32),
        "y": rng.integers(0, C, (b, n)).astype(np.int32),
        "mask": np.ones((b, n), bool),
    }


def _time(fn, args, iters=8, warmup=12):
    # fetch per iteration: through the tunneled backend block_until_ready
    # alone reports bogus times (docs/perf_notes.md)
    out = None
    for _ in range(warmup):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def _hlo_census(compiled) -> dict:
    txt = compiled.as_text()
    ops = collections.Counter()
    for m in re.finditer(r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[\w\[\]{},: ]*?\s([a-z\-]+)\(", txt, re.M):
        ops[m.group(1)] += 1
    keep = ("fusion", "copy", "convert", "scatter", "gather", "transpose",
            "all-reduce", "reduce", "custom-call", "while", "sort")
    return {k: ops.get(k, 0) for k in keep}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12288)
    ap.add_argument("--bs", default="8,16,24,32")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--microbatch", type=int, default=0,
                    help="grad_microbatch k — the measured cure: the "
                    "fwd/bwd scans k-cloud microbatches (docs/perf_notes.md"
                    " round 3; B=32 2913->1416 ns/pt with k=16)")
    ap.add_argument("--census", action="store_true",
                    help="also dump the optimized-HLO op census (slow text)")
    args = ap.parse_args()
    bs = [int(x) for x in args.bs.split(",")]
    n = args.n

    model = _model(remat=args.remat, microbatch=args.microbatch)
    state0 = model.init_state(jax.random.PRNGKey(0), _batch(2, 256))
    rng = jax.random.PRNGKey(1)

    train_fn = jax.jit(model.build_train_step())
    grad_fn = jax.jit(model.build_grad_step())
    # forward in train mode (same program shape as the fwd pass of grad)
    def fwd_only(state, x, pos, y, mask, r):
        step_rng = jax.random.fold_in(r, state.step)
        dec_rng, drop_rng = jax.random.split(step_rng)
        logits, _ = model._apply(
            state.params, state.batch_stats, x, pos, mask, train=True,
            rngs={"decimation": dec_rng, "dropout": drop_rng},
            mutable=["batch_stats"],
        )
        return model.criterion(logits, y)
    fwd_fn = jax.jit(fwd_only)

    print(f"# backward-cliff diagnosis  N={n}  remat={args.remat}")
    print("| B | fwd ms | grad ms | train ms | bwd=grad-fwd ms | "
          "bwd ms/pt | Gflops | GB accessed | B/pt | peak HBM GB | temp GB |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for b in bs:
        # device-put once: re-uploading the numpy batch per step costs
        # ~300 ms through a degraded tunnel and swamps the device time
        batch = jax.device_put(_batch(b, n))
        a = (state0, batch["x"], batch["pos"], batch["y"], batch["mask"], rng)
        t_fwd = _time(fwd_fn, a) * 1e3
        t_grad = _time(grad_fn, a) * 1e3
        t_train = _time(train_fn, a) * 1e3

        lowered = jax.jit(model.build_grad_step()).lower(*a)
        comp = lowered.compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        ma = comp.memory_analysis()
        peak = getattr(ma, "peak_memory_in_bytes", None)
        temp = getattr(ma, "temp_size_in_bytes", None)
        pts = b * n
        print(f"| {b} | {t_fwd:.0f} | {t_grad:.0f} | {t_train:.0f} | "
              f"{t_grad - t_fwd:.0f} | {(t_grad - t_fwd) * 1e6 / pts:.1f} ns | "
              f"{flops / 1e9:.1f} | {bytes_acc / 1e9:.2f} | "
              f"{bytes_acc / pts:.0f} | "
              f"{(peak or 0) / 1e9:.2f} | {(temp or 0) / 1e9:.2f} |")
        if args.census:
            print(f"  hlo census B={b}: {_hlo_census(comp)}")


if __name__ == "__main__":
    main()
