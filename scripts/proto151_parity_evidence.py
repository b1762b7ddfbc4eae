"""proto151 parity evidence — the closest achievable verdict without the blob.

The real proto151 checkpoint is a missing large blob in the reference mirror
(``/root/reference/trained_model_assets`` ships only the frozen V3.7.0
predict config), and the reference's torch stack cannot run here
(torch_geometric/pytorch_lightning absent). This script produces the
strongest available substitute for BASELINE.md's "mIoU parity ±0.2 vs
proto151" north star (reference usage ``myria3d/predict.py:21-73``):

1. Train the flagship RandLA-Net on the synthetic toy tile (TPU, overfit
   regime) so the weights carry real discriminative structure.
2. Export those weights as a Lightning-format torch checkpoint with the
   reference's exact state_dict key plan (``utils/torch_ckpt``), i.e. a
   byte-level stand-in for a shipped reference checkpoint.
3. Reference-side oracle predict: the plain-torch reimplementation of
   ``PyGRandLANet`` (validated layer-for-layer against the flax net in
   ``tests/.../test_randla_torch_oracle.py``) runs the same cook pipeline's
   subtiles with EXACT kNN + exact k=10 IDW interpolation and writes the
   "reference" output LAS via the same index-based merge.
4. ``myria3d_tpu.parity`` converts the torch checkpoint back and predicts
   through the production pipeline with the fully-exact path
   (``exact_interpolation`` + ``exact_knn``), then scores ours-vs-ref.

The committed artifact (``PARITY_r04.json``) records per-class IoU, mIoU
diff, class-map agreement and the PASS/FAIL verdict at the 0.2 tolerance.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/proto151_parity_evidence.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _train_toy_checkpoint(
    workdir: str, seed: int = 12345, bn_momentum: float = 0.2
) -> str:
    """Overfit the flagship net on the toy tile; return the orbax ckpt dir."""
    from myria3d_tpu.pctl.dataset.toy_dataset import (
        make_toy_dataset_from_test_file,
        write_synthetic_toy_las,
    )
    from myria3d_tpu.utils.config import compose, update
    from myria3d_tpu.train import train

    las = os.path.join(workdir, "toy.las")
    write_synthetic_toy_las(las)
    hdf5 = make_toy_dataset_from_test_file(
        os.path.join(workdir, "toy.hdf5"), las
    )
    os.environ.setdefault("LOGS_DIR", os.path.join(workdir, "logs"))
    cfg = compose(os.path.join(REPO, "configs"), "config.yaml",
                  ["experiment=RandLaNet-Overfit", "logger=csv",
                   f"datamodule.hdf5_file_path={hdf5}",
                   "datamodule.data_dir=null",
                   "datamodule.split_csv_path=null",
                   "trainer.max_epochs=25",
                   f"seed={int(seed)}",
                   # torch-parity BN momentum 0.01 leaves eval-mode running
                   # stats near init after a short run (ROADMAP known gap);
                   # the default stand-in regime uses 0.2 so its eval-mode
                   # predictions carry real structure for both sides; the
                   # sweep also covers the reference's 0.01 (cold-stats)
                   # regime — parity must hold for BOTH
                   f"model.neural_net_hparams.bn_momentum={bn_momentum}",
                   f"hydra.run.dir={os.path.join(workdir, 'run')}"])
    update(cfg, "callbacks.model_checkpoint.dirpath",
           os.path.join(workdir, "ckpts"))
    trainer = train(cfg)
    best = getattr(trainer.checkpoint_cb, "best_model_path", None)
    assert best and os.path.isdir(best), best
    return las, best


def _export_lightning_ckpt(orbax_dir: str, out_path: str) -> None:
    """flax state -> reference-keyed Lightning .ckpt file."""
    import torch

    from myria3d_tpu.models.model import Model
    from myria3d_tpu.utils.torch_ckpt import flax_to_torch_state_dict

    model, state = Model.load_from_checkpoint(orbax_dir)
    sd = flax_to_torch_state_dict(
        __import__("jax").device_get(state.params),
        __import__("jax").device_get(state.batch_stats),
    )
    torch.save(
        {"state_dict": {f"model.{k}": torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()}},
        out_path,
    )


def _oracle_predict(torch_ckpt: str, src_las: str, cfg, out_dir: str) -> str:
    """Reference-side predict: torch oracle + exact interpolation + merge."""
    import torch

    from myria3d_tpu.models.interpolation import Interpolator
    from myria3d_tpu.pctl.dataset.utils import read_las_array
    from myria3d_tpu.utils.config import _to_plain, instantiate
    from myria3d_tpu.utils.torch_ckpt import strip_lightning_prefix

    # the validated plain-torch PyGRandLANet reimplementation lives beside
    # the parity tests (single source of truth)
    import importlib

    oracle_mod = importlib.import_module(
        "tests.myria3d_tpu.models.test_randla_torch_oracle"
    )

    hp = _to_plain(dict(cfg["model"]["neural_net_hparams"]))
    oracle = oracle_mod.TorchRandLANetOracle(
        hp["num_features"], hp["num_classes"],
        num_neighbors=hp.get("num_neighbors", 16),
        decimation=hp.get("decimation", 4),
    ).eval()
    raw = torch.load(torch_ckpt, map_location="cpu", weights_only=False)
    sd = strip_lightning_prefix(raw["state_dict"])
    oracle.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=True,
    )

    tile_points, tile_header = read_las_array(
        src_las, cfg["datamodule"].get("epsg")
    )
    datamodule = instantiate(cfg["datamodule"])
    datamodule._set_predict_data(src_las, points=tile_points)

    itp_cfg = dict(cfg["predict"]["interpolator"])
    itp: Interpolator = instantiate(itp_cfg)
    itp.prepare(len(tile_points), points=tile_points, header=tile_header)

    k_interp = int(itp_cfg.get("interpolation_k", 10))
    n_sub = 0
    for batch in datamodule.predict_dataloader():
        if batch is None:
            continue
        for b in range(batch.batch_size):
            nv = int(batch.num_valid[b])
            if nv == 0:
                continue
            copies = batch.copies[b]
            idx = batch.idx_in_original_cloud[b]
            if idx is None or "pos_copy" not in copies:
                continue
            # The oracle decimates KEEP-FIRST (a legal randperm draw only
            # when its input order is uniformly random — the oracle parity
            # test monkeypatches the flax net to the same contract). Cooked
            # subtiles arrive in spatially-structured order, so hand the
            # oracle a shuffled view: keep-first over it IS a uniform
            # random decimation (reference ``pyg_randla_net.py:208-231``).
            perm = np.random.default_rng(10_000 + n_sub).permutation(nv)
            x = torch.from_numpy(batch.x[b, :nv][perm])
            # the forward consumes NORMALIZED pos like the flax net
            pos_n = torch.from_numpy(batch.pos[b, :nv][perm])
            with torch.no_grad():
                logits = oracle(x, pos_n).numpy()          # (nv, C)
            # exact k=10 inverse-d2 interpolation to the full subtile
            # (src rows permuted consistently with the logits rows)
            full = copies["pos_copy"].astype(np.float64)
            src = copies["pos_sampled_copy"][:nv].astype(np.float64)[perm]
            d2 = (
                (full[:, None, :] - src[None, :, :]) ** 2
            ).sum(-1)
            kk = min(k_interp, nv)
            nn_idx = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            nn_d2 = np.take_along_axis(d2, nn_idx, axis=1)
            w = 1.0 / np.maximum(nn_d2, 1e-16)
            num = (logits[nn_idx] * w[..., None]).sum(1)
            full_logits = (num / w.sum(1)[:, None]).astype(np.float32)
            itp.store_predictions(full_logits[None], [idx])
            n_sub += 1
    print(f"# oracle predicted {n_sub} subtiles")
    out = itp.reduce_predictions_and_save(
        src_las, out_dir, cfg["datamodule"].get("epsg")
    )
    return out


def _one_run(
    workdir: str, seed: int, bn_momentum: float, overlap: int
) -> dict:
    """Train one stand-in and score ours-vs-oracle parity for it."""
    from myria3d_tpu.parity import (
        DEFAULT_CONFIG,
        _load_frozen_config,
        run_parity,
    )

    print(f"# [1/4] training toy checkpoint (TPU overfit) seed={seed} "
          f"bn_momentum={bn_momentum} overlap={overlap}")
    src_las, orbax_dir = _train_toy_checkpoint(
        workdir, seed=seed, bn_momentum=bn_momentum
    )
    print(f"# checkpoint: {orbax_dir}")

    torch_ckpt = os.path.join(workdir, "proto151_standin.ckpt")
    _export_lightning_ckpt(orbax_dir, torch_ckpt)
    print(f"# [2/4] exported reference-keyed torch ckpt: {torch_ckpt}")

    cfg = _load_frozen_config(DEFAULT_CONFIG, {
        "predict.src_las": os.path.abspath(src_las),
        "predict.output_dir": os.path.join(workdir, "ref_out"),
        "predict.subtile_overlap": int(overlap),
        "datamodule.epsg": None,
    })
    print("# [3/4] reference-side oracle predict (torch CPU, exact)")
    ref_out = _oracle_predict(
        torch_ckpt, src_las, cfg, os.path.join(workdir, "ref_out")
    )
    print(f"# reference oracle output: {ref_out}")

    print("# [4/4] parity run (fully-exact TPU pipeline)")
    report = run_parity(
        torch_ckpt, src_las, ref_out=ref_out,
        output_dir=os.path.join(workdir, "ours"),
        epsg=None,
        extra_overrides={"predict.subtile_overlap": int(overlap)},
    )
    report["standin"] = {
        "seed": int(seed),
        "bn_momentum": float(bn_momentum),
        "subtile_overlap": int(overlap),
    }
    return report


# Sweep plan (round-5 verdict item #4): the r4 PASS was a single point —
# one stand-in, one BN regime, non-overlapping subtiles. Harden it with
# seed variance at the production-like setting, the reference's cold-stats
# bn_momentum=0.01 regime, and a multi-subtile sliding window
# (subtile_overlap=25, the reference's documented production knob —
# configs/predict/default.yaml:7).
SWEEP = (
    (12345, 0.2, 0),
    (23456, 0.2, 0),
    (34567, 0.2, 0),
    (12345, 0.01, 0),
    (12345, 0.2, 25),
)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="single run (the r4 protocol) instead of the sweep")
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_r05.json"))
    args = ap.parse_args()

    evidence = (
        "proto151 blob unavailable (reference .MISSING_LARGE_BLOBS); "
        "stand-in = toy-overfit weights exported through the reference "
        "state_dict key plan; reference side = validated plain-torch "
        "PyGRandLANet oracle with exact kNN + exact IDW interpolation"
    )
    sweep = SWEEP[:1] if args.quick else SWEEP
    runs = []
    for seed, bn, ov in sweep:
        workdir = tempfile.mkdtemp(
            prefix=f"proto151_s{seed}_bn{bn}_ov{ov}_"
        )
        print(f"# workdir {workdir}")
        runs.append(_one_run(workdir, seed, bn, ov))

    diffs = [r["miou_diff"] for r in runs]
    agreements = [r["ours_vs_ref"]["agreement"] for r in runs]
    report = {
        "metric": "proto151_parity_sweep",
        "tolerance": runs[0]["tolerance"],
        "n_runs": len(runs),
        "miou_diff_max": float(max(diffs)),
        "miou_diff_mean": float(np.mean(diffs)),
        "agreement_min": float(min(agreements)),
        "verdict": (
            "PASS" if all(r["verdict"] == "PASS" for r in runs) else "FAIL"
        ),
        "evidence": evidence,
        "runs": runs,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {args.out}: verdict={report['verdict']} "
          f"miou_diff max={report['miou_diff_max']:.4f} "
          f"mean={report['miou_diff_mean']:.4f} "
          f"agreement min={report['agreement_min']:.4f}")
    return 1 if report["verdict"] == "FAIL" else 0


if __name__ == "__main__":
    sys.exit(main())
