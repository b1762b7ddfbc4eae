"""On-TPU validation + measurement of the fused train-mode LFA.

The fused train-mode LFA (``ops/pallas_lfa_train.py``) is routed by
``neural_net_hparams.fused_train_lfa: "auto"`` — engaged only at
compile-time batch dims >= 16, where this harness measured it 1.27x on
v5e (at B=8 it measured 0.84x: the kernel's fixed costs land on a
DMA-bound critical path). The script produces the on-hardware evidence
behind that routing (round-5 item #1):

1. wall/step at B=8 and B=16 (N=12288) with the kernel ON vs OFF
   (OFF = the shipped windowed-gather path, the 102.2/186.1 ms baseline);
2. an on-device gradient check: ``build_grad_step`` run through both
   paths from the same state/batch/rng — per-leaf cosine similarity and
   relative L2 error of the parameter gradients, plus loss and BN-stat
   agreement. Both paths quantize the neighbor payload to bf16 (hi/lo
   positions), so agreement at the few-percent level is the expected
   envelope; the kernel's own exactness is covered by the interpret-mode
   unit tests (``tests/.../test_pallas_lfa_train.py``).

The reference trains the same module with torch autograd
(``myria3d/models/modules/pyg_randla_net.py:112-152``); it has no
hand-written VJPs to validate and no analog of this harness.

Usage: python scripts/validate_train_lfa.py [--n 12288] [--iters 10]
       [--grad-b 4] [--skip-grads] [--skip-timing]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from myria3d_tpu.models.criterion import CrossEntropyLoss
from myria3d_tpu.models.model import Model

D_IN, C = 9, 7
WINDOW = 4608  # shipped default (configs/model/randla_net_model.yaml)


def _model(fused: bool = True):
    """fused=True/False FORCE the fused train-mode LFA on/off (the
    shipped config routes by batch size via "auto"; forcing keeps the
    comparison batch-size-independent)."""
    return Model(
        neural_net_class_name="RandLANet",
        neural_net_hparams=dict(
            num_features=D_IN, num_classes=C, num_neighbors=16,
            decimation=4, return_logits=True,
            knn_window=WINDOW, sort_inputs=True,
            fused_train_lfa=fused,
        ),
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


def time_step(model, state, b, n, iters):
    step = jax.jit(model.build_train_step())
    batch = jax.device_put(_batch(b, n))
    rng = jax.random.PRNGKey(1)
    a = (state, batch["x"], batch["pos"], batch["y"], batch["mask"], rng)
    for _ in range(4):
        out = step(*a)
        jax.device_get(out[1])  # fetch the loss — block_until_ready lies
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*a)
        jax.device_get(out[1])
    return (time.perf_counter() - t0) / iters


def grad_pair(model, state, b, n):
    """(loss, grads, new_stats) through the current availability gates."""
    gs = jax.jit(model.build_grad_step())
    batch = jax.device_put(_batch(b, n, seed=3))
    rng = jax.random.PRNGKey(7)
    loss, grads, stats, _ = gs(
        state, batch["x"], batch["pos"], batch["y"], batch["mask"], rng
    )
    return (
        float(jax.device_get(loss)),
        jax.device_get(grads),
        jax.device_get(stats),
    )


def _flat(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def op_check(n=12288, b=1, k=16, c_in_list=(4, 64), window=WINDOW):
    """Compiled-TPU kernel vs interpret mode (same semantics) at the op
    level, forward AND hand-written VJP. Inputs are bf16-hi/lo-exact
    (positions on a 1/256 grid, features pre-rounded to bf16) so the
    payload quantization is lossless and agreement is up to f32 summation
    order. Closes the chain: unit tests prove interpret == unfused math
    (CPU); this proves device-compiled == interpret (TPU)."""
    import myria3d_tpu.ops.pallas_lfa_train as plt_mod
    from myria3d_tpu.ops.knn import knn_graph

    rng = np.random.default_rng(11)
    pos = np.stack([
        rng.integers(0, 12800, (b, n)) / 256.0,
        rng.integers(0, 12800, (b, n)) / 256.0,
        rng.integers(0, 768, (b, n)) / 256.0,
    ], axis=-1).astype(np.float32)
    pos = np.take_along_axis(pos, np.argsort(pos[..., 0:1], axis=1), axis=1)
    pos = jnp.asarray(pos)
    mask = jnp.ones((b, n), bool)
    idx, _, nv = jax.jit(
        lambda p, m: knn_graph(p, m, k, window=window)
    )(pos, mask)

    print(f"\n# op-level device-vs-interpret  B={b} N={n} K={k} "
          f"window={window}")
    print("| c_in | fwd rel (pooled/mu/var) | VJP rel max over "
          "(dx,dWe,dgamma,dbeta,datt) |")
    print("|---|---|---|")
    all_ok = True
    for c_in in c_in_list:
        c = 2 * c_in
        x = jnp.asarray(
            rng.uniform(-1, 1, (b, n, c_in)).astype(np.float32)
        ).astype(jnp.bfloat16).astype(jnp.float32)
        w_e = jnp.asarray(rng.normal(0, 0.3, (10, c_in)).astype(np.float32))
        b_e = jnp.asarray(rng.normal(0, 0.2, (c_in,)).astype(np.float32))
        gamma = jnp.asarray(rng.uniform(0.5, 1.5, (c_in,)).astype(np.float32))
        beta = jnp.asarray(rng.normal(0, 0.2, (c_in,)).astype(np.float32))
        att_t = jnp.asarray(rng.normal(0, 0.3, (c, c)).astype(np.float32))
        ct = jnp.asarray(rng.normal(0, 1, (b, n, c)).astype(np.float32))

        def run(interpret):
            def f(x_, w_, be_, g_, bt_, at_):
                pooled, mu, var, n_ = plt_mod.lfa_train_pallas(
                    x_, pos, mask, idx, nv, w_, be_, g_, bt_, at_,
                    window=window, interpret=interpret,
                )
                return pooled, (mu, var, n_)

            pooled, vjp, aux = jax.vjp(
                f, x, w_e, b_e, gamma, beta, att_t, has_aux=True
            )
            grads = vjp(ct)
            return jax.device_get((pooled, aux, grads))

        pc, (mu_c, var_c, _), g_c = run(False)
        pi, (mu_i, var_i, _), g_i = run(True)
        rel = lambda a_, b_: float(
            np.linalg.norm(np.asarray(a_, np.float64).ravel()
                           - np.asarray(b_, np.float64).ravel())
            / (np.linalg.norm(np.asarray(b_, np.float64).ravel()) + 1e-30))
        fwd = (rel(pc, pi), rel(mu_c, mu_i), rel(var_c, var_i))
        names = ("dx", "dWe", "dbe", "dgamma", "dbeta", "datt")
        vjps = {nm: rel(a_, b_) for nm, a_, b_ in zip(names, g_c, g_i)
                if np.asarray(b_).dtype != np.dtype("V")  # skip float0
                and np.linalg.norm(np.asarray(b_, np.float64)) > 0}
        # VJP gate 5e-3, not 1e-3: interpret mode on the TPU backend runs
        # its jnp dots at DEFAULT precision (single-pass bf16), so the
        # comparison itself has a ~2e-3 noise floor on cancellation-heavy
        # accumulations (dx). The exact-semantics chain is closed off-TPU:
        # saved-input cross-check TPU-compiled == CPU-interpret == f64
        # reference at 1.6e-4 (docs/perf_notes.md round 5).
        ok = max(fwd) < 1e-3 and max(vjps.values()) < 5e-3
        all_ok = all_ok and ok
        detail = " ".join(f"{nm}={v:.1e}" for nm, v in vjps.items())
        print(f"| {c_in} | {fwd[0]:.2e}/{fwd[1]:.2e}/{fwd[2]:.2e} "
              f"| {detail} | {'ok' if ok else 'FAIL'}")
    print(f"op-check: {'PASS' if all_ok else 'FAIL'} "
          "(gate: fwd rel < 1e-3, VJP rel < 5e-3)")
    return all_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12288)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--grad-b", type=int, default=4)
    ap.add_argument("--skip-grads", action="store_true")
    ap.add_argument("--skip-timing", action="store_true")
    ap.add_argument("--op-check", action="store_true")
    args = ap.parse_args()

    if args.op_check:
        ok = op_check(n=args.n)
        sys.exit(0 if ok else 1)

    model_on, model_off = _model(fused=True), _model(fused=False)
    # same param/stat structure either way — one init serves both
    state = model_on.init_state(jax.random.PRNGKey(0), _batch(2, 256))
    n = args.n

    if not args.skip_timing:
        print(f"# fused train-mode LFA on {jax.devices()[0].device_kind}")
        print("| step, N=%d | unfused (shipped default) | fused train LFA "
              "| speedup | Mpts/s/chip |" % n)
        print("|---|---|---|---|---|")
        for b in (8, 16):
            t_on = time_step(model_on, state, b, n, args.iters)
            t_off = time_step(model_off, state, b, n, args.iters)
            # Mpts/s = sampled points consumed per train step second
            mpts = b * n / t_on / 1e6
            print(f"| train B={b} | {t_off * 1e3:.1f} ms | {t_on * 1e3:.1f} ms "
                  f"| {t_off / t_on:.2f}x | {mpts:.2f} |")

    if args.skip_grads:
        return

    b = args.grad_b
    loss_on, g_on, s_on = grad_pair(model_on, state, b, n)
    loss_off, g_off, s_off = grad_pair(model_off, state, b, n)

    print(f"\n# on-device grad check  B={b} N={n}")
    print(f"loss fused={loss_on:.6f} unfused={loss_off:.6f} "
          f"rel={abs(loss_on - loss_off) / abs(loss_off):.2e}")

    fa, fb = _flat(g_on), _flat(g_off)
    # Significance floor: a leaf whose reference-path gradient RMS is
    # below 1e-6 of the global gradient RMS carries no optimization
    # signal — e.g. every bias immediately before a BatchNorm has
    # MATHEMATICALLY zero gradient (the fused VJP returns exact 0, the
    # unfused path ~1e-10 autodiff noise); relative error there is
    # noise/noise. Negligible leaves are instead checked in ABSOLUTE
    # terms against the same global scale.
    g_rms = np.sqrt(
        sum(float((v.astype(np.float64) ** 2).sum()) for v in fb.values())
        / sum(v.size for v in fb.values())
    )
    floor = 1e-6 * g_rms
    worst, negligible_bad = [], []
    for k in sorted(fb):
        a_, b_ = fa[k].ravel().astype(np.float64), fb[k].ravel().astype(np.float64)
        nb = np.linalg.norm(b_)
        rms_b = nb / np.sqrt(b_.size)
        if rms_b < floor:
            # both paths must agree this leaf is ~zero
            if np.linalg.norm(a_) / np.sqrt(a_.size) > 10 * floor:
                negligible_bad.append(k)
            continue
        rel = np.linalg.norm(a_ - b_) / (nb + 1e-30)
        cos = float(a_ @ b_ / ((np.linalg.norm(a_) + 1e-30) * (nb + 1e-30)))
        worst.append((rel, cos, k, nb))
    worst.sort(reverse=True)
    print("| grad leaf (worst rel L2 first) | rel L2 | cosine | ||g_ref|| |")
    print("|---|---|---|---|")
    for rel, cos, k, nb in worst[:12]:
        print(f"| {k[-70:]} | {rel:.3e} | {cos:.5f} | {nb:.3e} |")
    rels = np.array([w[0] for w in worst])
    coss = np.array([w[1] for w in worst])
    n_neg = len(fb) - len(worst)
    print(f"summary: significant leaves={len(worst)} (negligible ~zero-grad "
          f"leaves={n_neg}, disagreeing={len(negligible_bad)}) "
          f"rel_max={rels.max():.3e} rel_median={np.median(rels):.3e} "
          f"cos_min={coss.min():.5f}")
    # aggregate training direction: the two paths are DIFFERENT numerical
    # programs (bf16 payload kernels vs XLA f32 gathers), so per-leaf
    # relative errors on tiny-norm leaves amplify cancellation noise; what
    # training actually consumes is the full-gradient direction
    cat_a = np.concatenate([fa[k].ravel().astype(np.float64) for k in sorted(fb)])
    cat_b = np.concatenate([fb[k].ravel().astype(np.float64) for k in sorted(fb)])
    cos_all = float(cat_a @ cat_b / (np.linalg.norm(cat_a) * np.linalg.norm(cat_b)))
    rel_all = float(np.linalg.norm(cat_a - cat_b) / np.linalg.norm(cat_b))
    print(f"aggregate: cosine={cos_all:.6f} rel L2={rel_all:.3e}")

    sa, sb = _flat(s_on), _flat(s_off)
    srel = max(
        float(np.linalg.norm(sa[k] - sb[k]) / (np.linalg.norm(sb[k]) + 1e-30))
        for k in sb
    )
    print(f"batch_stats updates: max rel L2 {srel:.3e}")
    ok = (
        cos_all > 0.99 and srel < 0.02 and not negligible_bad
    )
    print(f"VERDICT: {'PASS' if ok else 'FAIL'} "
          "(gates: aggregate grad cosine>0.99, stats rel<0.02, "
          "no zero-grad disagreements)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
