"""Tests for the hydra-style config system."""

import os

import pytest

from myria3d_tpu.utils.config import (
    ConfigError,
    compose,
    get_method,
    instantiate,
    select,
    to_yaml,
)

from tests.conftest import CONFIG_DIR


def test_compose_default_tree():
    cfg = compose(CONFIG_DIR, "config.yaml", [])
    assert cfg.seed == 12345
    # experiment RandLaNetDebug overlay applied at global package
    assert cfg.trainer.max_epochs == 1
    assert cfg.datamodule.batch_size == 2
    # interpolation across groups
    assert cfg.model.num_classes == 7
    assert cfg.model.neural_net_hparams.num_features == 9
    assert cfg.model.neural_net_hparams.num_neighbors == 16
    # oc.dict.values turns transform dicts into ordered lists
    prep = cfg.datamodule.transforms.preparations_train_list
    assert isinstance(prep, list) and len(prep) == 6
    assert prep[0]["_target_"].endswith("TargetTransform")
    # hdf5 path uses ${hydra:runtime.cwd}
    assert cfg.datamodule.hdf5_file_path.endswith("tests/data/toy_dataset.hdf5")


def test_value_overrides():
    cfg = compose(
        CONFIG_DIR,
        "config.yaml",
        ["datamodule.batch_size=7", "trainer.max_epochs=3", "model.lr=0.5"],
    )
    assert cfg.datamodule.batch_size == 7
    assert cfg.trainer.max_epochs == 3
    assert cfg.model.lr == 0.5


def test_group_choice_overrides():
    cfg = compose(CONFIG_DIR, "config.yaml", ["experiment=predict"])
    assert cfg.task.task_name == "predict"
    assert cfg.datamodule.batch_size == 48  # multiple of v5e-8 chips


def test_nested_group_choice_override():
    cfg = compose(
        CONFIG_DIR,
        "config.yaml",
        ["model/lr_scheduler=OneCycleLR", "model/criterion=WeightedCrossEntropyLoss"],
    )
    assert "OneCycleLR" in cfg.model.lr_scheduler._args_[0]
    assert cfg.model.criterion.weight == [0.25, 0.1, 0.1, 0.5, 2.0, 2.0, 2.0]


def test_experiment_override_defaults_entry():
    # RandLaNet_base_run_FR declares `override /datamodule/transforms/augmentations: light.yaml`
    cfg = compose(CONFIG_DIR, "config.yaml", ["experiment=RandLaNet_base_run_FR"])
    augs = cfg.datamodule.transforms.augmentations_list
    assert len(augs) == 2
    assert all(a["_target_"].endswith("RandomFlip") for a in augs)
    assert cfg.trainer.accumulate_grad_batches == 3


def test_oc_env_resolver(monkeypatch):
    monkeypatch.setenv("LOGS_DIR", "/tmp/mylogs")
    cfg = compose(CONFIG_DIR, "config.yaml", [])
    # csv logs live in the per-run dir (reference logger/csv.yaml:
    # ${hydra:run.dir}), which itself sits under LOGS_DIR
    assert cfg.logger.csv.save_dir.startswith("/tmp/mylogs/runs/")
    assert cfg.logger.csv.save_dir == cfg.hydra.run.dir


def test_instantiate_partial_and_get_method():
    node = {
        "_target_": "functools.partial",
        "_args_": ["${get_method:os.path.join}"],
    }
    fn = instantiate(node)
    assert fn("a", "b") == os.path.join("a", "b")
    assert get_method("os.path.join") is os.path.join


def test_instantiate_recursion():
    node = {
        "outer": {"_target_": "collections.OrderedDict", "a": 1},
        "plain": [1, 2],
    }
    out = instantiate(node)
    assert dict(out["outer"]) == {"a": 1}
    assert out["plain"] == [1, 2]


def test_interpolation_missing_key_raises():
    with pytest.raises(ConfigError):
        compose(CONFIG_DIR, "config.yaml", ["model.d_in=${nonexistent.key}"])


def test_to_yaml_roundtrip():
    cfg = compose(CONFIG_DIR, "config.yaml", [])
    text = to_yaml(cfg)
    assert "task_name: fit" in text
    assert select(cfg, "datamodule.subtile_width") == 50


def test_experiment_layered_on_experiment_inherits_overrides():
    """An experiment whose defaults include another experiment (bare file
    include) must inherit the included file's `override /group: choice`
    entries — the pre-scan recurses (regression: MultiNode silently lost
    MultiChip's light-augmentations override and trained without any)."""
    cfg = compose(
        CONFIG_DIR, "config.yaml",
        ["experiment=RandLaNet_base_run_FR-MultiNode", "logger=csv"],
    )
    aug = select(cfg, "datamodule.transforms.augmentations")
    assert aug and "x_flip" in aug          # from MultiChip's override
    assert select(cfg, "trainer.num_nodes") == 2   # own value wins
    # CLI group choice still beats the inherited override
    cfg2 = compose(
        CONFIG_DIR, "config.yaml",
        ["experiment=RandLaNet_base_run_FR-MultiNode", "logger=csv",
         "datamodule/transforms/augmentations=none"],
    )
    assert not select(cfg2, "datamodule.transforms.augmentations")


def test_hydra_run_dir_parity(tmp_path, monkeypatch):
    """The hydra config group resolves a timestamped run dir under LOGS_DIR
    and run.py's _enter_run_dir chdirs into it while ${hydra:runtime.cwd}
    keeps the invocation cwd (reference configs/hydra/default.yaml +
    @hydra.main working-directory semantics)."""
    import re

    import run as run_mod
    from myria3d_tpu.utils.config import _runtime_info

    monkeypatch.setenv("LOGS_DIR", str(tmp_path / "logs"))
    cfg = compose(CONFIG_DIR, "config.yaml", [])
    run_dir = cfg["hydra"]["run"]["dir"]
    assert re.search(r"logs/runs/\d{4}-\d{2}-\d{2}/\d{2}-\d{2}-\d{2}$",
                     run_dir.replace("\\", "/"))
    assert cfg["work_dir"] == os.getcwd()

    orig = os.getcwd()
    try:
        run_mod._enter_run_dir(cfg)
        assert os.getcwd() == os.path.abspath(run_dir)
        assert _runtime_info["runtime_cwd"] == orig
        assert _runtime_info["run_dir"] == os.path.abspath(run_dir)
    finally:
        os.chdir(orig)
        _runtime_info.pop("run_dir", None)
        _runtime_info.pop("runtime_cwd", None)

    # frozen configs without a hydra node keep the cwd
    run_mod._enter_run_dir({"predict": {}})
    assert os.getcwd() == orig

    # hydra.job.chdir=false opts out, like hydra
    cfg2 = compose(CONFIG_DIR, "config.yaml", ["hydra.job.chdir=false"])
    run_mod._enter_run_dir(cfg2)
    assert os.getcwd() == orig


def test_launch_predict_resume_skips_existing_outputs(tmp_path, monkeypatch):
    """predict.resume=true skips inputs whose output LAS already exists
    (atomic publish makes presence imply completeness) and still returns
    the output path; remaining files go through predict()."""
    import run as run_mod

    src_dir = tmp_path / "src"
    out_dir = tmp_path / "out"
    src_dir.mkdir()
    out_dir.mkdir()
    (src_dir / "a.las").write_bytes(b"")
    (src_dir / "b.las").write_bytes(b"")
    (out_dir / "a.las").write_bytes(b"done")  # pre-existing output for a

    calls = []

    def fake_predict(cfg, phases=None, preread=None):
        calls.append(cfg["predict"]["src_las"])
        return os.path.join(cfg["predict"]["output_dir"], "b.las")

    import myria3d_tpu.predict as predict_mod

    monkeypatch.setattr(predict_mod, "predict", fake_predict)
    config = {
        "predict": {
            "src_las": str(src_dir / "*.las"),
            "output_dir": str(out_dir),
            "resume": True,
        },
    }
    outs = run_mod.launch_predict(config)
    assert calls == [str(src_dir / "b.las")]  # a skipped, b predicted
    assert outs[0] == str(out_dir / "a.las")

    # resume off (default): both go through predict()
    calls.clear()
    config["predict"]["resume"] = False
    run_mod.launch_predict(config)
    assert len(calls) == 2
