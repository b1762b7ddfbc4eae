"""Training pipeline — reference ``myria3d/train.py:33-173`` without Lightning.

``train(config)`` instantiates datamodule/model/callbacks/logger from the
composed config, then runs an explicit JAX training loop: jitted train/eval
steps over fixed-shape padded batches, host-side control plane (LR schedule,
checkpointing, early stopping, metrics-from-confusion-matrix). Supports
``task.task_name`` in {fit, test, finetune} (reference ``run.py:30-36``;
fit runs test-after-fit with the best checkpoint like reference
``train.py:148-157``).
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import signal
from typing import Any, Dict, Iterable, List, Optional

import jax
import numpy as np

from myria3d_tpu.callbacks.metric_callbacks import ModelMetrics
from myria3d_tpu.models.model import Model, TrainState
from myria3d_tpu.models.optimizers import set_learning_rate_scale
from myria3d_tpu.pctl.batching import PointCloudBatch, pad_full_cloud, pad_sampled_pos
from myria3d_tpu.utils import utils
from myria3d_tpu.utils.config import instantiate

log = utils.get_logger(__name__)


@dataclasses.dataclass
class TrainerConfig:
    """Trainer knobs — reference ``configs/trainer/default.yaml``."""

    min_epochs: int = 1
    max_epochs: int = 1
    log_every_n_steps: int = 1
    accelerator: str = "auto"
    devices: Any = "auto"
    num_nodes: int = 1
    limit_train_batches: Optional[int] = None
    limit_val_batches: Optional[int] = None
    limit_test_batches: Optional[int] = None
    num_sanity_val_steps: int = 0
    accumulate_grad_batches: int = 1
    overfit_batches: int = 0
    # True (default): BN moments over the global batch (GSPMD sync-BN, a
    # strict upgrade). False: per-shard BN + pmean'd grads — reference DDP
    # local-batch-BN training parity (SURVEY.md §7 last bullet).
    sync_batchnorm: bool = True
    # Preemption safety: on SIGTERM/SIGINT finish the in-flight step, save
    # the "last" checkpoint (weights + optimizer state, resumable via
    # model.ckpt_path) and stop cleanly. TPU fleets deliver SIGTERM ahead
    # of maintenance/preemption; the reference relies on Lightning's
    # KeyboardInterrupt teardown and loses in-epoch progress.
    save_on_interrupt: bool = True

    def __init__(self, **kwargs: Any):
        for f in dataclasses.fields(self):
            setattr(self, f.name, kwargs.pop(f.name, f.default))
        self.extra = kwargs


def _limited(loader: Iterable, limit: Optional[int]) -> Iterable:
    if not limit:
        yield from loader
        return
    for i, item in enumerate(loader):
        if i >= limit:
            break
        yield item


class Trainer:
    """Explicit training loop owning callbacks/logger/scheduler state."""

    def __init__(
        self,
        trainer_config: TrainerConfig,
        callbacks: Optional[Dict[str, Any]] = None,
        logger: Optional[Any] = None,
        seed: int = 12345,
    ):
        self.cfg = trainer_config
        self.callbacks = callbacks or {}
        self.logger = logger
        self.seed = seed
        self.metrics: Optional[ModelMetrics] = self.callbacks.get(
            "model_detailed_metrics"
        )
        self.checkpoint_cb = self.callbacks.get("model_checkpoint")
        self.early_stopping = self.callbacks.get("early_stopping")
        self.lr_monitor = self.callbacks.get("lr_monitor")
        self.finetune_cb = self.callbacks.get("finetune")
        self.global_step = 0
        self.state: Optional[TrainState] = None
        self.interrupted = False  # set by the SIGTERM/SIGINT handler in fit
        self.par = None  # ParallelSteps when >1 device (set in fit/test)
        # predict.exact_interpolation also governs task=test (full-cloud
        # mIoU is computed there — the checkpoint-parity metric)
        self.exact_interpolation = False
        # predict.strict_full_cloud=true turns the silent subsampled-regime
        # fallback in test() into a hard error (the reference test regime is
        # always full-cloud, ``myria3d/models/model.py:86-103``)
        self.strict_full_cloud = False
        self._warned_subsampled_test = False
        # predict.exact_knn: fully-exact neighbor search for task=test
        self.exact_knn = False
        # predict.sorted_window: windowed kNN over x-sorted eval clouds
        self.sorted_window = 0

    def _setup_parallel(self, model: Model, batch_size: int) -> None:
        from myria3d_tpu.parallel import auto_parallel

        self.par = auto_parallel(
            model, batch_size, self.cfg.devices,
            sync_bn=bool(self.cfg.sync_batchnorm),
        )
        if self.par is not None:
            log.info(
                f"Data-parallel over {self.par.mesh.devices.size} devices "
                f"(batch {batch_size}, "
                f"{'sync' if self.cfg.sync_batchnorm else 'local'}-BN)"
            )

    def _place(self, arrays):
        return self.par.place_batch(arrays) if self.par is not None else arrays

    @contextlib.contextmanager
    def _graceful_interrupts(self):
        """While active, the first SIGTERM/SIGINT only sets
        ``self.interrupted`` — the loop finishes its in-flight step, saves
        the "last" checkpoint and returns; a second signal falls back to
        the default die-now behavior. No-op off the main thread (signal
        handlers can only be installed there) or when disabled by config."""
        if not getattr(self.cfg, "save_on_interrupt", True):
            yield
            return
        previous: Dict[int, Any] = {}

        def handler(signum, frame):
            if self.interrupted:  # second signal: stop being graceful
                for s, h in previous.items():
                    signal.signal(s, h)
                raise KeyboardInterrupt
            self.interrupted = True
            log.info(
                f"Received signal {signum} — finishing the current step, "
                "saving the last checkpoint, then stopping."
            )

        try:
            for s in (signal.SIGTERM, signal.SIGINT):
                previous[s] = signal.signal(s, handler)
        except ValueError:  # not in the main thread
            previous = {}
        try:
            yield
        finally:
            for s, h in previous.items():
                signal.signal(s, h)

    # ------------------------------------------------------------------

    def _log(self, metrics: Dict[str, float]) -> None:
        if self.logger is not None:
            self.logger.log_metrics(metrics, step=self.global_step)

    def _scheduler_for(self, model: Model):
        if model.lr_scheduler_factory is None:
            return None
        return model.lr_scheduler_factory()

    def _apply_lr(self, model: Model, scale: float) -> None:
        assert self.state is not None
        set_learning_rate_scale(self.state.opt_state, model.lr, scale)

    # ------------------------------------------------------------------

    def fit(self, model: Model, datamodule, ckpt_path: Optional[str] = None,
            finetune: bool = False) -> TrainState:
        # train-start logging hooks (reference LogCode/LogLogsPath callbacks,
        # comet_callbacks.py:42-60): upload source + record the logs dir
        if self.logger is not None:
            if hasattr(self.logger, "log_code"):
                import myria3d_tpu

                self.logger.log_code(
                    os.path.dirname(os.path.abspath(myria3d_tpu.__file__))
                )
            if hasattr(self.logger, "log_logs_path"):
                self.logger.log_logs_path(
                    os.environ.get("LOGS_DIR", os.getcwd())
                )
        datamodule.prepare_data()
        datamodule.setup("fit")
        rng = jax.random.PRNGKey(self.seed)

        train_loader = datamodule.train_dataloader(seed=self.seed)
        first = _first_batch(train_loader)
        if first is None:
            raise RuntimeError("Empty train dataloader — nothing to fit on.")
        self.state = model.init_state(rng, first.device_arrays())
        if ckpt_path:
            log.info(f"Restoring weights from checkpoint: {ckpt_path}")
            # finetune: weights only + fresh optimizer (reference semantics);
            # plain fit resume: optimizer moments restored too
            self.state = model.restore_into_state(
                ckpt_path, self.state, restore_opt_state=not finetune
            )
        log.info(f"Model has {model.num_params(self.state):,} parameters")
        self._setup_parallel(model, datamodule.batch_size)
        if self.par is not None:
            self.state = self.par.place_state(self.state)
        # sync the injected lr with model.lr (it may have been retuned by
        # the LR range test after the optimizer was built)
        self._apply_lr(model, 1.0)

        scheduler = self._scheduler_for(model)
        per_step_sched = bool(getattr(scheduler, "per_step", False))
        # per-step schedules are fused into the optimizer as an optax
        # schedule (models/optimizers.py); the host object only tracks the
        # scale for LR-monitor display
        sched_fused = bool(getattr(model, "per_step_schedule_fused", False))
        if per_step_sched and not sched_fused:
            # OneCycle starts at max_lr / div_factor, not max_lr
            self._apply_lr(model, scheduler.scale)
        step_rng = jax.random.fold_in(rng, 1)

        # sanity val steps (reference trainer.num_sanity_val_steps)
        if self.cfg.num_sanity_val_steps:
            self._val_epoch(model, datamodule, step_rng,
                            limit=self.cfg.num_sanity_val_steps, log_prefix=None)

        overfit_batches: Optional[List[PointCloudBatch]] = None
        if self.cfg.overfit_batches:
            overfit_batches = [
                b for b in _limited(train_loader, self.cfg.overfit_batches)
                if b is not None
            ]

        # optional jax profiler capture of the first epoch
        # (trainer.profiler="jax"; SURVEY.md §5.1 first-class upgrade)
        profile_dir = None
        if self.cfg.extra.get("profiler") == "jax":
            profile_dir = os.path.join(
                os.environ.get("LOGS_DIR", "logs"), "profile"
            )
            log.info(f"Profiling epoch 0 to {profile_dir}")

        stop = False
        epoch = 0
        with self._graceful_interrupts():
            for epoch in range(self.cfg.max_epochs):
                if self.interrupted:
                    break
                epoch_done = self._fit_one_epoch(
                    model, datamodule, epoch, step_rng, scheduler,
                    per_step_sched, sched_fused, finetune, overfit_batches,
                    profile_dir,
                )
                if epoch_done is not None:
                    stop = epoch_done
                if self.interrupted:
                    break
                if stop and epoch + 1 >= self.cfg.min_epochs:
                    log.info(f"Early stopping at epoch {epoch}")
                    break
        if self.interrupted:
            path = None
            if self.checkpoint_cb is not None and hasattr(
                self.checkpoint_cb, "save_interrupt"
            ):
                path = self.checkpoint_cb.save_interrupt(model, self.state)
            log.info(
                f"Training interrupted at epoch {epoch}, "
                f"step {self.global_step}"
                + (f"; resumable checkpoint: {path}" if path else "")
            )
        return self.state

    def _fit_one_epoch(self, model, datamodule, epoch, step_rng, scheduler,
                       per_step_sched, sched_fused, finetune,
                       overfit_batches, profile_dir) -> Optional[bool]:
        """One train+val epoch; returns the early-stopping decision (or
        None before it is evaluated, e.g. on interrupt)."""
        from myria3d_tpu.utils.profiling import trace

        epoch_trace = trace(profile_dir if epoch == 0 else None)
        lr_mult = None
        if finetune and self.finetune_cb is not None:
            lr_mult = self.finetune_cb.lr_mult_for_epoch(
                self.state.params, epoch
            )

        # ---- train epoch (losses stay on device; fetched at the log
        # cadence and once at epoch end — no per-step host sync)
        train_losses: List[Any] = []
        iterator: Iterable = (
            overfit_batches
            if overfit_batches is not None
            else _limited(
                datamodule.train_dataloader(seed=self.seed + epoch),
                self.cfg.limit_train_batches,
            )
        )
        if overfit_batches is None:
            # overlap host-side sample prep/collate with device steps
            # (SURVEY.md §7: double-buffered host->device feeding)
            from myria3d_tpu.pctl.loader import BackgroundIterator

            iterator = BackgroundIterator(iterator, max_prefetch=2)
        try:
            with epoch_trace:
                for batch in iterator:
                    if batch is None:
                        continue
                    arrays = self._place(batch.device_arrays())
                    if lr_mult is None:
                        step_fn = (
                            self.par.train_step if self.par is not None
                            else model.train_step
                        )
                        self.state, loss, logits = step_fn(
                            self.state, arrays["x"], arrays["pos"],
                            arrays["y"], arrays["mask"], step_rng,
                        )
                    else:
                        step_fn = (
                            self.par.train_step_lr_mult if self.par is not None
                            else model.train_step
                        )
                        self.state, loss, logits = step_fn(
                            self.state, arrays["x"], arrays["pos"],
                            arrays["y"], arrays["mask"], step_rng, lr_mult,
                        )
                    self.global_step += 1
                    train_losses.append(loss)
                    if self.metrics is not None:
                        self.metrics.update(
                            "train", logits, arrays["y"], arrays["mask"]
                        )
                    if self.global_step % max(1, self.cfg.log_every_n_steps) == 0:
                        row = {"train/loss_step": float(loss)}
                        if self.lr_monitor is not None and scheduler is not None:
                            row.update(self.lr_monitor.metrics(
                                model.lr * getattr(scheduler, "scale", 1.0)))
                        self._log(row)
                    if per_step_sched:
                        scale = scheduler.step()  # host bookkeeping (display)
                        if not sched_fused:
                            self._apply_lr(model, scale)
                    if self.interrupted:
                        break
        finally:
            # Stop the prefetch thread on ANY exit from the step loop —
            # normal exhaustion (no-op), a preemption break, or an
            # exception raised by a train step — so it never keeps the
            # dataset pipeline (h5py handles, worker pool) alive
            # (ADVICE r2: the close ran only on the interrupted path).
            if hasattr(iterator, "close"):
                iterator.close()

        if self.interrupted:
            # in-flight step folded in; skip val — fit saves and returns.
            return None

        epoch_metrics: Dict[str, float] = {
            "epoch": float(epoch),
            "train/loss_epoch": (
                float(np.mean(jax.device_get(train_losses)))
                if train_losses else float("nan")
            ),
        }
        if self.metrics is not None:
            self._log_confusion_matrix("train", epoch)
            epoch_metrics.update(self.metrics.compute_and_reset("train"))

        # ---- val epoch
        val_metrics = self._val_epoch(
            model, datamodule, step_rng, limit=self.cfg.limit_val_batches,
            overfit_batches=overfit_batches,
        )
        if self.interrupted:
            # partial val metrics: don't let them elect a "best" checkpoint
            # or advance the scheduler — fit saves "last" and returns
            return None
        epoch_metrics.update(val_metrics)
        self._log(epoch_metrics)

        # ---- control plane: scheduler / ckpt / early stop
        stop = False
        monitor_value = epoch_metrics.get(model.monitor)
        if scheduler is not None and not per_step_sched and monitor_value is not None:
            self._apply_lr(model, scheduler.step(monitor_value))
        if self.checkpoint_cb is not None:
            self.checkpoint_cb.on_validation_end(
                model, self.state, epoch_metrics, epoch
            )
        if self.early_stopping is not None:
            stop = self.early_stopping.on_validation_end(epoch_metrics)
        log.info(
            f"epoch {epoch}: "
            + " ".join(
                f"{k}={v:.4f}" for k, v in epoch_metrics.items()
                if isinstance(v, float) and "/" in k and k.count("/") == 1
            )
        )
        return stop

    def _val_epoch(self, model: Model, datamodule, rng, limit=None,
                   log_prefix: Optional[str] = "val", overfit_batches=None
                   ) -> Dict[str, float]:
        losses: List[Any] = []
        iterator: Iterable = (
            overfit_batches
            if overfit_batches is not None
            else _limited(datamodule.val_dataloader(), limit)
        )
        for batch in iterator:
            if batch is None:
                continue
            arrays = self._place(batch.device_arrays())
            eval_fn = self.par.eval_step if self.par is not None else model.eval_step
            loss, logits = eval_fn(
                self.state, arrays["x"], arrays["pos"], arrays["y"],
                arrays["mask"], rng,
            )
            losses.append(loss)
            if self.metrics is not None and log_prefix:
                self.metrics.update(log_prefix, logits, arrays["y"], arrays["mask"])
            if self.interrupted:
                break
        if log_prefix is None:
            return {}
        out = {
            f"{log_prefix}/loss_epoch": (
                float(np.mean(jax.device_get(losses))) if losses else float("nan")
            )
        }
        if self.metrics is not None:
            self._log_confusion_matrix(log_prefix)
            out.update(self.metrics.compute_and_reset(log_prefix))
        return out

    def _log_confusion_matrix(self, phase: str, epoch: int = 0) -> None:
        """Push the per-epoch confusion matrix to loggers that accept one
        (reference ``log_comet_cm``, ``comet_callbacks.py:61-87``)."""
        if self.logger is None or not hasattr(self.logger, "log_confusion_matrix"):
            return
        cm = self.metrics.confusion_matrix(phase)
        labels = [
            self.metrics.class_names.get(i, str(i))
            for i in range(self.metrics.num_classes)
        ]
        self.logger.log_confusion_matrix(cm, labels, epoch, f"{phase}_cm")

    # ------------------------------------------------------------------

    def test(self, model: Model, datamodule, state: Optional[TrainState] = None,
             ckpt_path: Optional[str] = None) -> Dict[str, float]:
        """Full-cloud evaluation: logits kNN-interpolated back to every point
        of each subtile before the confusion matrix (reference ``task=test``
        regime, ``models/model.py:86-103``, SURVEY.md §3.5)."""
        if (
            self.sorted_window > 0
            and not self.exact_knn
            and hasattr(datamodule, "_stages")
        ):
            # windowed kNN needs x-sorted clouds: append the sort to the
            # eval pipeline BEFORE the dataset composes its transforms
            # (and drop a dataset wrapper built without it during fit)
            from myria3d_tpu.pctl.transforms.transforms import SortPointsByX

            stages = datamodule._stages["eval"]
            if not any(isinstance(t, SortPointsByX) for t in stages):
                datamodule._stages["eval"] = list(stages) + [SortPointsByX()]
                datamodule._dataset = None
        datamodule.prepare_data()
        datamodule.setup("test")
        if ckpt_path:
            model, state = Model.load_from_checkpoint(ckpt_path)
        if state is None:
            state = self.state
        assert state is not None, "test() needs a state or ckpt_path"
        rng = jax.random.PRNGKey(self.seed + 777)
        if self.exact_knn:
            model.set_exact_knn(True)
        elif self.sorted_window > 0:
            model.set_sorted_window(self.sorted_window)
        self._setup_parallel(model, datamodule.batch_size)
        if self.par is not None:
            state = self.par.place_state(state)
        eval_fn = self.par.eval_step if self.par is not None else model.eval_step
        if self.exact_interpolation:
            interp_fn = (
                self.par.exact_interp_step if self.par is not None
                else model.exact_interp_step
            )
        else:
            interp_fn = (
                self.par.interp_step if self.par is not None else model.interp_step
            )

        losses: List[Any] = []
        for batch in _limited(datamodule.test_dataloader(), self.cfg.limit_test_batches):
            if batch is None:
                continue
            arrays = self._place(batch.device_arrays())
            full = pad_full_cloud(batch.copies)
            sampled_pos = pad_sampled_pos(batch.copies, batch.num_points)
            if full is None or sampled_pos is None or "full_y" not in full:
                # No copies stashed: fall back to subsampled-regime eval.
                # That regime is EASIER (metrics on the decimated cloud, not
                # every raw point) — a misconfigured eval transform list
                # (missing CopyFullPos/CopyFullPreparedTargetPos/
                # CopySampledPos) would otherwise silently report the wrong
                # mIoU, the exact metric the north star keys on.
                if self.strict_full_cloud:
                    raise RuntimeError(
                        "predict.strict_full_cloud=true but a test batch "
                        "carries no full-cloud copies — the eval transform "
                        "list is missing the Copy*Pos transforms, so "
                        "full-cloud test metrics cannot be computed."
                    )
                if not self._warned_subsampled_test:
                    self._warned_subsampled_test = True
                    log.warning(
                        "Test batch without full-cloud copies: falling back "
                        "to SUBSAMPLED-regime eval (reference task=test is "
                        "always full-cloud). Check the eval transform list "
                        "(Copy*Pos transforms); set "
                        "predict.strict_full_cloud=true to make this an "
                        "error. This warning is logged once per run."
                    )
                loss, logits = eval_fn(
                    state, arrays["x"], arrays["pos"], arrays["y"],
                    arrays["mask"], rng,
                )
                losses.append(loss)
                if self.metrics is not None:
                    self.metrics.update("test", logits, arrays["y"], arrays["mask"])
                continue
            placed = self._place(
                {"sampled_pos": sampled_pos, "full_pos": full["full_pos"],
                 "full_mask": full["full_mask"]}
            )
            sampled_pos = placed["sampled_pos"]
            full_logits = interp_fn(
                state, arrays["x"], arrays["pos"], arrays["mask"],
                sampled_pos, placed["full_pos"], placed["full_mask"], rng,
            )
            # place_batch pads the batch dim to the device count; align the
            # host-side target/mask rows (fillers carry the ignore code /
            # False, so loss and metrics skip them)
            full_y, full_mask = full["full_y"], full["full_mask"]
            if self.par is not None:
                from myria3d_tpu.pctl.batching import IGNORE_INDEX

                full_y = self.par.pad_rows(full_y, fill=IGNORE_INDEX)
                full_mask = self.par.pad_rows(full_mask, fill=False)
            loss = model.criterion(full_logits, full_y)
            losses.append(loss)
            if self.metrics is not None:
                self.metrics.update("test", full_logits, full_y, full_mask)
        out = {
            "test/loss_epoch": (
                float(np.mean(jax.device_get(losses))) if losses else float("nan")
            )
        }
        if self.metrics is not None:
            self._log_confusion_matrix("test")
            out.update(self.metrics.compute_and_reset("test"))
        self._log(out)
        log.info(
            "test: " + " ".join(
                f"{k}={v:.4f}" for k, v in out.items() if k.count("/") == 1
            )
        )
        return out


def _first_batch(loader) -> Optional[PointCloudBatch]:
    for batch in loader:
        if batch is not None:
            return batch
    return None


def lr_range_test(
    model: Model,
    datamodule,
    seed: int = 12345,
    min_lr: float = 1e-4,
    max_lr: float = 3.0,
    num_steps: int = 100,
    beta: float = 0.98,
) -> float:
    """LR range test — reference ``auto_lr_find`` via Lightning tuner
    (``train.py:114-142``; the shipped lr 0.00393 came from a 200-step range
    test between 1e-4 and 3.0, ``configs/model/randla_net_model.yaml``).

    Sweeps lr geometrically while training on repeated batches, tracks an
    EMA-smoothed loss, and suggests the lr at the steepest descent point.
    """
    import math

    datamodule.prepare_data()
    datamodule.setup("fit")
    rng = jax.random.PRNGKey(seed)
    loader = datamodule.train_dataloader(seed=seed)
    batches = [b for b in _limited(loader, 8) if b is not None]
    if not batches:
        raise RuntimeError("No batches for the LR range test")
    state = model.init_state(rng, batches[0].device_arrays())

    gamma = (max_lr / min_lr) ** (1.0 / max(1, num_steps - 1))
    lrs, losses = [], []
    avg = 0.0
    for i in range(num_steps):
        lr_i = min_lr * gamma**i
        set_learning_rate_scale(state.opt_state, lr_i, 1.0)
        arrays = batches[i % len(batches)].device_arrays()
        state, loss, _ = model.train_step(
            state, arrays["x"], arrays["pos"], arrays["y"], arrays["mask"], rng
        )
        loss = float(loss)
        if not math.isfinite(loss):
            break
        avg = beta * avg + (1 - beta) * loss
        smoothed = avg / (1 - beta ** (i + 1))
        lrs.append(lr_i)
        losses.append(smoothed)
        if i > 10 and smoothed > 4 * min(losses):
            break  # diverged
    if len(losses) < 3:
        return model.lr
    grads = np.gradient(np.asarray(losses), np.log(np.asarray(lrs)))
    suggestion = float(lrs[int(np.argmin(grads))])
    log.info(f"LR range test suggests lr={suggestion:.6g}")
    return suggestion


def train(config) -> Trainer:
    """Instantiate everything from config and run the task
    (reference ``train(config) -> Trainer``, ``train.py:33-173``)."""
    task_name = config.get("task", {}).get("task_name", "fit")
    seed = int(config.get("seed", 12345))
    np.random.seed(seed)

    log.info("Instantiating datamodule <HDF5LidarDataModule>")
    datamodule = instantiate(config["datamodule"])

    log.info("Instantiating model <Model>")
    model_cfg = dict(config["model"])
    accumulate = int(config.get("trainer", {}).get("accumulate_grad_batches", 1) or 1)
    model: Model = instantiate(
        {**model_cfg, "accumulate_grad_batches": accumulate}
    )
    from myria3d_tpu.utils.config import _to_plain  # noqa: SLF001

    model.raw_hparams = _to_plain({k: v for k, v in model_cfg.items()})
    # the loader needs the feature width to synthesize filler batches when
    # a rank's first collated group is all-None (multi-host robustness)
    if getattr(datamodule, "num_features", None) is None:
        nf = (model.neural_net_hparams or {}).get("num_features")
        if nf is not None and hasattr(datamodule, "num_features"):
            datamodule.num_features = int(nf)

    callbacks: Dict[str, Any] = {}
    for name, cb_conf in (config.get("callbacks") or {}).items():
        if isinstance(cb_conf, dict) and "_target_" in cb_conf:
            log.info(f"Instantiating callback <{cb_conf['_target_']}>")
            callbacks[name] = instantiate(cb_conf)

    logger = None
    for lg_conf in (config.get("logger") or {}).values():
        if isinstance(lg_conf, dict) and "_target_" in lg_conf:
            log.info(f"Instantiating logger <{lg_conf['_target_']}>")
            logger = instantiate(lg_conf)
            break

    trainer_cfg_node = dict(config.get("trainer") or {})
    trainer_cfg_node.pop("_target_", None)
    trainer = Trainer(
        TrainerConfig(**trainer_cfg_node),
        callbacks=callbacks,
        logger=logger,
        seed=seed,
    )
    trainer.exact_interpolation = bool(
        (config.get("predict") or {}).get("exact_interpolation", False)
    )
    trainer.strict_full_cloud = bool(
        (config.get("predict") or {}).get("strict_full_cloud", False)
    )
    trainer.exact_knn = bool(
        (config.get("predict") or {}).get("exact_knn", False)
    )
    trainer.sorted_window = int(
        (config.get("predict") or {}).get("sorted_window", 0) or 0
    )

    if logger is not None:
        utils.log_hyperparameters(logger, config, model, None)

    ckpt_path = config.get("model", {}).get("ckpt_path")

    if task_name in ("fit", "fit+test"):
        if config.get("task", {}).get("auto_lr_find"):
            # the scheduler scale path rewrites the injected lr each epoch,
            # so updating model.lr is enough — fit() starts from it
            model.lr = lr_range_test(model, datamodule, seed=seed)
        log.info("Starting training!")
        trainer.fit(model, datamodule, ckpt_path=ckpt_path)
        if trainer.interrupted:
            return trainer  # preempted: checkpoint saved, skip test-after-fit
        best = getattr(trainer.checkpoint_cb, "best_model_path", None)
        log.info(f"Best checkpoint: {best}")
        if best:
            log.info("Starting testing with best checkpoint!")
            trainer.test(model, datamodule, state=None, ckpt_path=best)
        else:
            trainer.test(model, datamodule, state=trainer.state)
    elif task_name == "test":
        log.info("Starting testing!")
        if ckpt_path and os.path.isdir(ckpt_path):
            trainer.test(model, datamodule, ckpt_path=ckpt_path)
        else:
            raise ValueError(
                "task=test requires model.ckpt_path pointing to a checkpoint dir"
            )
    elif task_name == "finetune":
        log.info("Starting finetuning!")
        trainer.fit(model, datamodule, ckpt_path=ckpt_path, finetune=True)
    else:
        raise ValueError(f"Unknown task for train(): {task_name}")

    return trainer
