"""Quantify the kernel-approximation sensitivity of predict outputs.

VERDICT r3 weak #3: the binned Pallas kNN (recall ≈0.98) and the bf16
MXU-recombine interpolation approximate the reference's exact
torch_cluster kNN + f32 IDW. This script measures what those
approximations do to the DECISION (argmax class) on a full tile:

    predict A: production path   (approx kNN + fused bf16 interpolation)
    predict B: exact_interpolation only (approx kNN + f32 two-op interp)
    predict C: fully exact       (exact_knn + exact_interpolation)

and reports pairwise class-flip rates + mIoU-vs-GT for each, appended as
one JSON line to ``EXACTNESS_r04.json``.

Run (after training a checkpoint, e.g. via proto151_parity_evidence.py):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/measure_exactness_sensitivity.py \
      --ckpt <orbax_dir> --las <tile.las> [--out EXACTNESS_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _predict_variant(ckpt, las, out_dir, **predict_overrides):
    from myria3d_tpu.predict import predict
    from myria3d_tpu.utils.config import compose

    overrides = [
        "task.task_name=predict",
        f"predict.src_las={os.path.abspath(las)}",
        f"predict.ckpt_path={os.path.abspath(ckpt)}",
        f"predict.output_dir={out_dir}",
        "datamodule.batch_size=8",
    ] + [f"predict.{k}={str(v).lower()}" for k, v in predict_overrides.items()]
    cfg = compose(os.path.join(REPO, "configs"), "config.yaml", overrides)
    return predict(cfg)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--las", required=True)
    ap.add_argument("--out", default=os.path.join(REPO, "EXACTNESS_r04.json"))
    args = ap.parse_args()

    from myria3d_tpu.pctl.io.las import read_las

    variants = {
        "production": dict(),  # approx kNN + fused bf16 interp + window
        "exact_interp": dict(exact_interpolation=True),
        "fully_exact": dict(exact_interpolation=True, exact_knn=True,
                            sorted_window=0),
    }
    preds = {}
    work = tempfile.mkdtemp(prefix="exactness_")
    for name, ov in variants.items():
        out_dir = os.path.join(work, name)
        print(f"# predicting variant {name} ({ov or 'defaults'})")
        out = _predict_variant(args.ckpt, args.las, out_dir, **ov)
        pts = read_las(out).points
        preds[name] = np.asarray(pts["PredictedClassification"], np.int64)
        if "gt" not in preds:
            preds["gt"] = np.asarray(pts["Classification"], np.int64)

    gt = preds.pop("gt")
    report = {"metric": "exactness_sensitivity", "n_points": int(len(gt)),
              "las": os.path.abspath(args.las)}
    names = list(variants)
    for name in names:
        report[f"{name}_acc_vs_gt"] = float((preds[name] == gt).mean())
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            flip = float((preds[a] != preds[b]).mean())
            report[f"flip_{a}_vs_{b}"] = flip
            print(f"# class-flip {a} vs {b}: {flip:.5f}")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {args.out}")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
