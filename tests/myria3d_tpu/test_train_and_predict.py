"""CLI-level E2E round trips — reference ``tests/myria3d/test_train_and_predict.py``:
train one epoch on the toy dataset, reuse the checkpoint for test/finetune/
predict, assert LAS invariance (same point count, key dims unchanged, extra
dims exactly as configured) and header/SRS preservation.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
CONFIG_DIR = os.path.join(REPO_ROOT, "configs")

# Full-pipeline subprocess runs cost several minutes of XLA CPU compiles on
# a 1-core host — opt in with MYRIA3D_E2E_TESTS=1 (CI / verification runs).
pytestmark = pytest.mark.skipif(
    not os.environ.get("MYRIA3D_E2E_TESTS"),
    reason="E2E CLI tests are opt-in: set MYRIA3D_E2E_TESTS=1",
)


def run_cli(args, cwd, extra_env=None, expect_failure=False):
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        # single CPU device: the virtual 8-device mesh flag inherited from
        # the pytest process splits the host thread pool 8 ways
        "XLA_FLAGS": "",
        "JAX_COMPILATION_CACHE_DIR": os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"
        ),
        "LOGS_DIR": os.path.join(cwd, "logs"),
        "PYTHONPATH": REPO_ROOT,
        **(extra_env or {}),
    }
    result = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "run.py"), *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=3600,
    )
    if expect_failure:
        assert result.returncode != 0, (
            f"run.py {' '.join(args)} unexpectedly succeeded:\n"
            f"STDOUT:\n{result.stdout[-2000:]}"
        )
        return result
    if result.returncode != 0:
        raise AssertionError(
            f"run.py {' '.join(args)} failed ({result.returncode}):\n"
            f"STDOUT:\n{result.stdout[-4000:]}\nSTDERR:\n{result.stderr[-4000:]}"
        )
    return result


@pytest.fixture(scope="session")
def one_epoch_trained_ckpt(tmp_path_factory, toy_dataset_hdf5_path):
    """Train RandLA-Net for one debug epoch once per session
    (reference ``one_epoch_trained_RandLaNet_checkpoint`` fixture)."""
    workdir = str(tmp_path_factory.mktemp("fit_run"))
    ckpt_dir = os.path.join(workdir, "ckpts")
    run_cli(
        [
            "--config-path", CONFIG_DIR,
            "experiment=RandLaNetDebug",
            f"datamodule.hdf5_file_path={toy_dataset_hdf5_path}",
            f"callbacks.model_checkpoint.dirpath={ckpt_dir}",
            "datamodule.batch_size=2",
        ],
        cwd=workdir,
    )
    best = os.path.join(ckpt_dir, "epoch_000")
    assert os.path.isdir(best), os.listdir(ckpt_dir)
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))
    assert os.path.isfile(os.path.join(best, "hparams.yaml"))
    return best


def test_fit_writes_metrics_and_ckpt(one_epoch_trained_ckpt):
    assert os.path.isdir(one_epoch_trained_ckpt)


def test_predict_las_invariance(
    tmp_path, one_epoch_trained_ckpt, toy_las_path
):
    """Predict on the toy LAS and assert output invariants (reference
    ``test_predict_as_command`` + LAS checks, ``:146-187,266-286``)."""
    from myria3d_tpu.pctl.io.las import read_las

    out_dir = str(tmp_path / "preds")
    run_cli(
        [
            "--config-path", CONFIG_DIR,
            "task.task_name=predict",
            f"predict.src_las={toy_las_path}",
            f"predict.ckpt_path={one_epoch_trained_ckpt}",
            f"predict.output_dir={out_dir}",
            "datamodule.batch_size=2",
        ],
        cwd=str(tmp_path),
    )
    out_path = os.path.join(out_dir, os.path.basename(toy_las_path))
    assert os.path.isfile(out_path)

    src = read_las(toy_las_path)
    out = read_las(out_path)
    # same point count, key dims unchanged
    assert len(out.points) == len(src.points)
    for dim in ("X", "Y", "Z", "Intensity", "Classification", "ReturnNumber"):
        np.testing.assert_allclose(
            np.asarray(out.points[dim], np.float64),
            np.asarray(src.points[dim], np.float64),
            err_msg=dim,
        )
    # header preserved (scales/offsets/version — the SRS carrier)
    assert out.header.scales == src.header.scales
    assert out.header.offsets == src.header.offsets
    assert out.header.point_format == src.header.point_format
    # extra dims exactly as configured
    names = out.points.dtype.names
    assert "PredictedClassification" in names
    assert "entropy" in names
    for class_name in ("ground", "vegetation", "building"):
        assert class_name in names
    # predicted codes are valid original class codes; artefact points
    # (class 65, dropped by DropPointsByClass) keep their original code
    # with null probabilities — reference parity (interpolation.py:155-170)
    valid_codes = {1, 2, 5, 6, 9, 17, 64, 65}
    assert set(np.unique(out.points["PredictedClassification"])) <= valid_codes
    proba_sum = sum(
        np.asarray(out.points[c], np.float64)
        for c in ("unclassified", "ground", "vegetation", "building",
                  "water", "bridge", "lasting_above")
    )
    predicted = proba_sum > 0.5
    np.testing.assert_allclose(proba_sum[predicted], 1.0, atol=1e-4)
    np.testing.assert_allclose(proba_sum[~predicted], 0.0, atol=1e-6)
    assert predicted.mean() > 0.9  # the bulk of the tile is predicted
    if (~predicted).any():
        # unpredicted points keep original class + null entropy
        assert np.all(out.points["entropy"][~predicted] == 0.0)
        np.testing.assert_array_equal(
            out.points["PredictedClassification"][~predicted],
            np.asarray(src.points["Classification"][~predicted], np.uint8),
        )
    # artefacts never receive a model prediction
    assert np.all(~predicted[src.points["Classification"] == 65])


@pytest.mark.parametrize("overlap", [0, 25], ids=["plain", "overlap25"])
def test_shipped_checkpoint_inference(tmp_path, toy_las_path, overlap):
    """Real-inference smoke with the SHIPPED checkpoint through the frozen
    predict config — the analog of the reference CI running its production
    checkpoint on a hosted LAS, plain AND with the sliding window
    (``.github/workflows/cicd.yaml:26-76`` runs both).
    Uses the committed 25-epoch warm-BN toy-overfit asset
    (``trained_model_assets/randlanet_toy_V0.5.0_ckpt`` — the same
    training regime as the parity stand-ins, so eval-mode BN carries
    real running statistics)."""
    from myria3d_tpu.pctl.io.las import read_las

    assets = os.path.join(REPO_ROOT, "trained_model_assets")
    ckpt = os.path.join(assets, "randlanet_toy_V0.5.0_ckpt")
    assert os.path.isdir(ckpt)
    out_dir = str(tmp_path / "preds")
    run_cli(
        [
            "--config-path", assets,
            "--config-name", "randlanet_tpu_predict_config_V0.1.0.yaml",
            "task.task_name=predict",
            f"predict.src_las={toy_las_path}",
            f"predict.ckpt_path={ckpt}",
            f"predict.output_dir={out_dir}",
            f"predict.subtile_overlap={overlap}",
            "datamodule.batch_size=2",
        ],
        cwd=str(tmp_path),
    )
    out_path = os.path.join(out_dir, os.path.basename(toy_las_path))
    assert os.path.isfile(out_path)
    src = read_las(toy_las_path)
    out = read_las(out_path)
    assert len(out.points) == len(src.points)
    names = out.points.dtype.names
    assert "PredictedClassification" in names and "entropy" in names
    # the overfit checkpoint must actually discriminate on its tile:
    # several classes present and decent agreement on non-artefact points
    pred = np.asarray(out.points["PredictedClassification"], np.int64)
    gt = np.asarray(src.points["Classification"], np.int64)
    scored = (gt != 65) & (gt != 64)
    assert len(np.unique(pred[scored])) >= 3
    assert (pred[scored] == gt[scored]).mean() > 0.5


def test_predict_with_subtile_overlap(
    tmp_path, one_epoch_trained_ckpt, toy_las_path
):
    """Sliding-window inference (reference CI smoke with
    ``predict.subtile_overlap=25``): overlapping subtile logits merge by
    summation; output invariants hold."""
    from myria3d_tpu.pctl.io.las import read_las

    out_dir = str(tmp_path / "preds_overlap")
    run_cli(
        [
            "--config-path", CONFIG_DIR,
            "task.task_name=predict",
            f"predict.src_las={toy_las_path}",
            f"predict.ckpt_path={one_epoch_trained_ckpt}",
            f"predict.output_dir={out_dir}",
            "predict.subtile_overlap=25",
            "datamodule.batch_size=2",
        ],
        cwd=str(tmp_path),
    )
    out_path = os.path.join(out_dir, os.path.basename(toy_las_path))
    out = read_las(out_path)
    src = read_las(toy_las_path)
    assert len(out.points) == len(src.points)
    assert "PredictedClassification" in (out.points.dtype.names or ())


def test_predict_on_laz(tmp_path, one_epoch_trained_ckpt, toy_las_path):
    """task=predict ingests LAZ directly (reference production pipeline
    reads .laz via PDAL; its batch-predict CI globs *.laz). The fixture is
    the toy tile re-expressed as point-format-3 LAZ (classes clamped to the
    5-bit field; NIR rides an extra-bytes dim so all 9 features exist)."""
    import numpy as np

    from myria3d_tpu.pctl.io.las import LasHeader, read_las, write_las

    src = read_las(toy_las_path)
    pts = src.points.copy()
    pts["Classification"] = np.where(
        pts["Classification"] > 31, 1, pts["Classification"]
    )
    hdr = LasHeader(
        point_format=3,
        scales=src.header.scales,
        offsets=src.header.offsets,
        vlrs=[v for v in src.header.vlrs if v.user_id == "LASF_Projection"],
    )
    laz_path = str(tmp_path / "toy_fmt3.laz")
    write_las(laz_path, pts, hdr)

    out_dir = str(tmp_path / "preds_laz")
    run_cli(
        [
            "--config-path", CONFIG_DIR,
            "task.task_name=predict",
            f"predict.src_las={laz_path}",
            f"predict.ckpt_path={one_epoch_trained_ckpt}",
            f"predict.output_dir={out_dir}",
            "datamodule.batch_size=2",
        ],
        cwd=str(tmp_path),
    )
    out_path = os.path.join(out_dir, os.path.basename(laz_path))
    assert os.path.isfile(out_path)
    out = read_las(out_path)
    assert len(out.points) == len(pts)
    assert "PredictedClassification" in (out.points.dtype.names or ())
    # predictions came back as LAZ too (path-driven format selection)
    assert out.header.point_count == len(pts)


def test_predict_on_single_point_cloud(
    tmp_path, one_epoch_trained_ckpt
):
    """Inference on a cloud with a single point (reference
    ``test_predict_on_single_point_cloud``,
    ``tests/myria3d/test_train_and_predict.py:130-143`` — edge case addressed
    in reference V3.4.0), with a ``probas_to_save`` subset override."""
    from myria3d_tpu.pctl.io.las import LasHeader, read_las, write_las

    pts = np.zeros(1, dtype=[("X", "<f8"), ("Y", "<f8"), ("Z", "<f8"),
                             ("Intensity", "<u2"), ("ReturnNumber", "u1"),
                             ("NumberOfReturns", "u1"),
                             ("Classification", "u1")])
    pts["X"], pts["Y"], pts["Z"] = 870150.0, 6616950.0, 100.0
    pts["ReturnNumber"] = 1
    pts["NumberOfReturns"] = 1
    pts["Classification"] = 2
    src = str(tmp_path / "single_point.las")
    write_las(src, pts, LasHeader(point_format=3))

    out_dir = str(tmp_path / "preds_single")
    run_cli(
        [
            "--config-path", CONFIG_DIR,
            "task.task_name=predict",
            f"predict.src_las={src}",
            f"predict.ckpt_path={one_epoch_trained_ckpt}",
            f"predict.output_dir={out_dir}",
            "datamodule.epsg=2154",
            "predict.interpolator.probas_to_save=[building,unclassified]",
            "datamodule.batch_size=2",
        ],
        cwd=str(tmp_path),
    )
    out = read_las(os.path.join(out_dir, "single_point.las"))
    assert len(out.points) == 1
    names = out.points.dtype.names or ()
    assert "PredictedClassification" in names
    assert "building" in names and "unclassified" in names
    # only the selected probas are written
    assert "ground" not in names and "vegetation" not in names


def test_predict_no_epsg_fails_informatively(
    tmp_path, one_epoch_trained_ckpt
):
    """Predicting a LAS without SRS and without datamodule.epsg must fail
    with the informative EPSG error (reference
    ``test_predict_on_single_file_invalid_epsg``,
    ``tests/myria3d/test_train_and_predict.py:105-127``)."""
    from myria3d_tpu.pctl.io.las import LasHeader, write_las

    pts = np.zeros(64, dtype=[("X", "<f8"), ("Y", "<f8"), ("Z", "<f8"),
                              ("Intensity", "<u2"), ("ReturnNumber", "u1"),
                              ("NumberOfReturns", "u1"),
                              ("Classification", "u1")])
    pts["X"] = np.linspace(0, 40, 64)
    pts["Y"] = np.linspace(0, 40, 64)
    pts["ReturnNumber"] = 1
    pts["NumberOfReturns"] = 1
    pts["Classification"] = 1
    src = str(tmp_path / "nosrs.las")
    write_las(src, pts, LasHeader(point_format=3))

    result = run_cli(
        [
            "--config-path", CONFIG_DIR,
            "task.task_name=predict",
            f"predict.src_las={src}",
            f"predict.ckpt_path={one_epoch_trained_ckpt}",
            f"predict.output_dir={tmp_path / 'out'}",
            "datamodule.epsg=null",
            "datamodule.batch_size=2",
        ],
        cwd=str(tmp_path),
        expect_failure=True,
    )
    blob = result.stdout + result.stderr
    assert "No EPSG provided" in blob


def test_run_test_task_with_ckpt(
    tmp_path, one_epoch_trained_ckpt, toy_dataset_hdf5_path
):
    """task=test evaluates full-cloud metrics from a checkpoint."""
    run_cli(
        [
            "--config-path", CONFIG_DIR,
            "experiment=test",
            f"model.ckpt_path={one_epoch_trained_ckpt}",
            f"datamodule.hdf5_file_path={toy_dataset_hdf5_path}",
            "datamodule.batch_size=2",
            "trainer.limit_test_batches=1",
            "logger=csv",
        ],
        cwd=str(tmp_path),
    )


def test_finetune_from_ckpt(
    tmp_path, one_epoch_trained_ckpt, toy_dataset_hdf5_path
):
    """task=finetune reloads the ckpt and trains with staged unfreeze."""
    run_cli(
        [
            "--config-path", CONFIG_DIR,
            "experiment=DebugFineTune",
            "task.task_name=finetune",
            f"model.ckpt_path={one_epoch_trained_ckpt}",
            f"datamodule.hdf5_file_path={toy_dataset_hdf5_path}",
            f"callbacks.model_checkpoint.dirpath={tmp_path / 'ft_ckpts'}",
        ],
        cwd=str(tmp_path),
    )
