"""CLI entry & task dispatch — reference ``run.py:30-36,43-134``.

``python run.py task.task_name={fit,test,finetune,predict,create_hdf5} ...``
with hydra-style overrides against the ``configs/`` tree. ``task.task_name``
is pre-parsed from argv before composition (reference ``run.py:23,108-113``)
so predict can default to a frozen config shipped beside a checkpoint via
``--config-path/--config-name``.
"""

from __future__ import annotations

import glob
import os
import sys
from typing import List

DEFAULT_DIRECTORY = "configs"
DEFAULT_CONFIG_FILE = "config.yaml"

TASK_NAME_DETECTION_STRING = "task.task_name="


class TASK_NAMES:
    FIT = "fit"
    TEST = "test"
    FINETUNE = "finetune"
    PREDICT = "predict"
    HDF5 = "create_hdf5"


def _parse_cli(argv: List[str]):
    """Split argv into (config_dir, config_name, overrides, task_name)."""
    config_dir, config_name = DEFAULT_DIRECTORY, DEFAULT_CONFIG_FILE
    overrides: List[str] = []
    task_name = TASK_NAMES.FIT
    it = iter(argv)
    for arg in it:
        if arg in ("--config-path", "-cp"):
            config_dir = next(it)
        elif arg in ("--config-name", "-cn"):
            config_name = next(it)
        elif arg.startswith("--config-path="):
            config_dir = arg.split("=", 1)[1]
        elif arg.startswith("--config-name="):
            config_name = arg.split("=", 1)[1]
        elif "=" in arg:
            overrides.append(arg)
            if arg.startswith(TASK_NAME_DETECTION_STRING):
                task_name = arg[len(TASK_NAME_DETECTION_STRING):]
        else:
            print(f"Ignoring unrecognized argument: {arg}")
    if not config_name.endswith((".yaml", ".yml")):
        config_name += ".yaml"
    return config_dir, config_name, overrides, task_name


def _compose(config_dir: str, config_name: str, overrides: List[str]):
    from myria3d_tpu.utils.config import compose, load_config

    if os.path.isdir(config_dir) and os.path.isfile(
        os.path.join(config_dir, config_name)
    ):
        probe = open(os.path.join(config_dir, config_name)).read()
        if "defaults:" in probe:
            return compose(config_dir, config_name, overrides)
        # frozen full config (production predict config beside a ckpt)
        cfg = load_config(os.path.join(config_dir, config_name))
        from myria3d_tpu.utils.config import update

        for ov in overrides:
            key, _, raw = ov.partition("=")
            import yaml

            update(cfg, key, yaml.safe_load(raw))
        from myria3d_tpu.utils.config import resolve_interpolations

        return resolve_interpolations(cfg)
    raise FileNotFoundError(f"No config {config_name} under {config_dir}")


def launch_train(config):
    """fit / test / finetune (reference ``launch_train``, ``run.py:43-57``)."""
    from myria3d_tpu.train import train
    from myria3d_tpu.utils import utils

    utils.extras(config)
    if config.get("print_config", True):
        utils.print_config(config)
    return train(config)


def launch_predict(config):
    """Iterate the glob of LAS files (reference ``launch_predict``,
    ``run.py:60-80``), overlapping each next tile's read/decompress under
    the current tile's device streaming (the reference's production use is
    corpus-scale batch prediction,
    ``.github/workflows/predict-for-lidar-prod-optimization.yml:45-88``,
    where the serial per-tile LAS/LAZ read — tens of seconds — would
    otherwise stall the chip between tiles). ``predict.prefetch_tiles=0``
    disables the lookahead (one extra tile held in RAM)."""
    from concurrent.futures import ThreadPoolExecutor

    from myria3d_tpu.pctl.dataset.utils import read_las_array
    from myria3d_tpu.predict import predict
    from myria3d_tpu.utils import utils

    utils.extras(config)
    src = config["predict"]["src_las"]
    las_files = sorted(glob.glob(src)) if any(c in src for c in "*?[") else [src]
    if not las_files:
        raise FileNotFoundError(f"No LAS file matches predict.src_las={src}")
    # predict.resume: skip inputs whose output already exists — outputs are
    # published atomically (interpolation.py), so presence means complete.
    resume = bool(config["predict"].get("resume", False))
    output_dir = config["predict"]["output_dir"]
    outs = []
    todo = []
    for las in las_files:
        out_path = os.path.join(output_dir, os.path.basename(las))
        if resume and os.path.exists(out_path):
            utils.get_logger(__name__).info(
                f"predict.resume: output exists, skipping {las}"
            )
            outs.append(out_path)
            continue
        todo.append(las)
    if not todo:
        return outs

    prefetch = int(config["predict"].get("prefetch_tiles", 1) or 0)
    epsg = (config.get("datamodule") or {}).get("epsg")

    def _cfg_for(las):
        cfg = dict(config)
        cfg["predict"] = dict(config["predict"])
        cfg["predict"]["src_las"] = las
        return cfg

    if prefetch <= 0 or len(todo) == 1:
        for las in todo:
            outs.append(predict(_cfg_for(las)))
        return outs

    # one reader thread: FIFO submission keeps tile order; while tile i
    # streams through the device, tile i+1's read (the ~13-37 s LAS/LAZ
    # ingest on a 1-core host) completes in the background
    with ThreadPoolExecutor(max_workers=1) as reader:
        futures = [reader.submit(read_las_array, las, epsg) for las in todo[:2]]
        for j, las in enumerate(todo):
            outs.append(predict(_cfg_for(las), preread=futures[j]))
            nxt = j + 2
            if nxt < len(todo):
                futures.append(reader.submit(read_las_array, todo[nxt], epsg))
    return outs


def launch_hdf5(config):
    """Build the HDF5 dataset from a LAS corpus (reference ``launch_hdf5``,
    ``run.py:83-105``)."""
    from myria3d_tpu.pctl.dataset.hdf5 import create_hdf5
    from myria3d_tpu.pctl.dataset.utils import get_las_paths_by_split_dict
    from myria3d_tpu.utils.config import instantiate

    dm_cfg = config["datamodule"]
    las_paths_by_split_dict = get_las_paths_by_split_dict(
        dm_cfg["data_dir"], dm_cfg["split_csv_path"]
    )
    points_pre_transform = instantiate(dm_cfg.get("points_pre_transform"))
    pre_filter = instantiate(dm_cfg.get("pre_filter"))
    create_hdf5(
        las_paths_by_split_dict=las_paths_by_split_dict,
        hdf5_file_path=dm_cfg["hdf5_file_path"],
        epsg=dm_cfg.get("epsg"),
        tile_width=dm_cfg.get("tile_width", 1000),
        subtile_width=dm_cfg.get("subtile_width", 50),
        subtile_overlap_train=dm_cfg.get("subtile_overlap_train", 0),
        points_pre_transform=points_pre_transform,
        pre_filter=pre_filter,
    )


def _enter_run_dir(config) -> None:
    """Reference parity: hydra changes the job's working directory to
    ``hydra.run.dir`` (reference ``configs/hydra/default.yaml``; every task
    runs under ``@hydra.main``, reference ``run.py:108-134``), so relative
    artifacts (``checkpoints/``, ``config_tree.txt``, CSV logs) land in a
    per-run timestamped directory. Frozen production predict configs carry
    no ``hydra`` node and keep the invoking cwd; ``hydra.job.chdir=false``
    opts out like hydra."""
    from myria3d_tpu.utils.config import set_runtime_info

    # freeze the pre-chdir cwd for ${hydra:runtime.cwd} (hydra semantics)
    set_runtime_info(runtime_cwd=os.getcwd())
    hydra_cfg = config.get("hydra")
    if not hydra_cfg:
        return
    job = hydra_cfg.get("job") or {}
    if str(job.get("chdir", True)).lower() in ("false", "0"):
        return
    run_dir = (hydra_cfg.get("run") or {}).get("dir")
    if not run_dir:
        return
    os.makedirs(run_dir, exist_ok=True)
    set_runtime_info(run_dir=os.path.abspath(run_dir))
    os.chdir(run_dir)


def main(argv: List[str]):
    if "--help" in argv or "-h" in argv:
        print(__doc__)
        print(
            "Tasks: fit (default) | test | finetune | predict | create_hdf5\n"
            "Usage: python run.py [--config-path DIR] [--config-name NAME]"
            " [task.task_name=T] [group=choice ...] [a.b=value ...]"
        )
        return None
    # Load environment variables from .env if present (reference run.py:118-120).
    if os.path.isfile(".env"):
        for line in open(".env"):
            line = line.strip()
            if line and not line.startswith("#") and "=" in line:
                k, _, v = line.partition("=")
                os.environ.setdefault(k.strip(), v.strip().strip('"'))

    config_dir, config_name, overrides, task_name = _parse_cli(argv)
    if task_name == TASK_NAMES.PREDICT and config_dir == DEFAULT_DIRECTORY:
        # predict composes the standard tree with the predict experiment
        # unless a frozen config is given via --config-path/--config-name.
        if not any(o.startswith("experiment=") for o in overrides):
            overrides = ["experiment=predict"] + overrides
    config = _compose(config_dir, config_name, overrides)
    _enter_run_dir(config)

    if task_name in (TASK_NAMES.FIT, TASK_NAMES.TEST, TASK_NAMES.FINETUNE):
        return launch_train(config)
    if task_name == TASK_NAMES.PREDICT:
        return launch_predict(config)
    if task_name == TASK_NAMES.HDF5:
        return launch_hdf5(config)
    raise ValueError(f"Unknown task.task_name={task_name}")


if __name__ == "__main__":
    main(sys.argv[1:])
