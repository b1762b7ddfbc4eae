"""proto151 parity-harness tests (``python -m myria3d_tpu.parity``).

The real proto151 blob is absent upstream (``.MISSING_LARGE_BLOBS``), so the
end-to-end harness is exercised with a synthetic Lightning checkpoint built
from the golden reference state_dict shapes (the convertibility contract,
``utils/torch_ckpt.golden_pyg_state_shapes``).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from myria3d_tpu.parity import _iou_table, _model_hparams_from_config

E2E = pytest.mark.skipif(
    not os.environ.get("MYRIA3D_E2E_TESTS"),
    reason="E2E parity harness is opt-in: set MYRIA3D_E2E_TESTS=1",
)


def test_iou_table_per_class_and_miou():
    pred = np.array([1, 1, 2, 2, 6, 6, 6, 99])
    gt = np.array([1, 2, 2, 2, 6, 6, 1, 50])  # 50 not scored, 99 pred kept
    tab = _iou_table(pred, gt, codes=[1, 2, 6])
    # class 1: inter {0}, union {0,1,6} -> 1/3; class 2: inter {2,3},
    # union {1,2,3} -> 2/3; class 6: inter {4,5}, union {4,5,6} -> 2/3
    assert tab["n_scored"] == 7
    assert abs(tab["per_class_iou"][1] - 1 / 3) < 1e-9
    assert abs(tab["per_class_iou"][2] - 2 / 3) < 1e-9
    assert abs(tab["per_class_iou"][6] - 2 / 3) < 1e-9
    assert abs(tab["miou"] - (1 / 3 + 2 / 3 + 2 / 3) / 3) < 1e-9


def test_iou_table_absent_class_scores_one():
    # absent from BOTH pred and gt -> 1.0 (reference absent_score=1.0)
    tab = _iou_table(np.array([2, 2]), np.array([2, 2]), codes=[2, 9])
    assert tab["per_class_iou"][9] == 1.0
    assert tab["miou"] == 1.0


def test_model_hparams_from_frozen_config_maps_reference_names():
    from myria3d_tpu.parity import DEFAULT_CONFIG, _load_frozen_config

    cfg = _load_frozen_config(DEFAULT_CONFIG, {})
    hp = _model_hparams_from_config(cfg)
    assert hp["neural_net_class_name"] == "RandLANet"
    assert "optimizer" not in hp and "criterion" not in hp
    assert hp["neural_net_hparams"]["num_neighbors"] == 16
    assert set(map(int, hp["classification_dict"].keys())) == {
        1, 2, 5, 6, 9, 17, 64,
    }
    # the reference class name aliases onto our zoo entry
    cfg2 = _load_frozen_config(
        DEFAULT_CONFIG, {"model.neural_net_class_name": "PyGRandLANet"}
    )
    assert (
        _model_hparams_from_config(cfg2)["neural_net_class_name"]
        == "RandLANet"
    )


@E2E
def test_parity_harness_end_to_end(tmp_path, toy_las_path):
    """Synthetic torch ckpt -> convert -> exact predict -> score; then a
    second run with the first output as --ref-out must be a PASS with
    mIoU diff 0 (the pipeline is deterministic for a fixed seed)."""
    from myria3d_tpu.utils.torch_ckpt import make_synthetic_lightning_checkpoint

    ckpt = make_synthetic_lightning_checkpoint(str(tmp_path / "proto.ckpt"))
    out1 = str(tmp_path / "run1")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    cmd = [
        sys.executable, "-m", "myria3d_tpu.parity", ckpt, toy_las_path,
        "--output-dir", out1, "--epsg", "2154", "--batch-size", "4",
    ]
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=3600)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    line = [l for l in r1.stdout.splitlines() if l.startswith("{")][-1]
    rep1 = json.loads(line)
    assert rep1["verdict"] == "INFORMATIONAL"
    assert np.isfinite(rep1["ours_vs_gt"]["miou"])
    assert os.path.isfile(rep1["predicted_las"])

    out2 = str(tmp_path / "run2")
    r2 = subprocess.run(
        cmd[:5] + ["--output-dir", out2, "--epsg", "2154",
                   "--batch-size", "4", "--ref-out", rep1["predicted_las"]],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr
    rep2 = json.loads(
        [l for l in r2.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert rep2["verdict"] == "PASS"
    assert rep2["miou_diff"] == 0.0
    assert rep2["ours_vs_ref"]["agreement"] == 1.0
