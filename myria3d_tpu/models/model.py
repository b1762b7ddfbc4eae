"""Task-level model: train/eval/predict steps over padded batches.

Replaces the reference LightningModule (``myria3d/models/model.py:32-198``)
with a JAX-native design: an immutable ``TrainState`` pytree + pure jitted
step functions built once and cached. The dual-regime forward is preserved
(``model.py:80-98``): train/val optimize on subsampled points; test/predict
kNN-interpolate logits back to the full cloud — but the reference's
deliberate device->CPU hop for interpolation ("KNN is way faster on CPU",
``model.py:87``) is replaced by a batched on-device MXU kNN
(``myria3d_tpu.ops.interpolate``).

Checkpoints are orbax directories holding the state pytree plus an
``hparams.yaml`` snapshot of the model config, enabling bare
``Model.load_from_checkpoint(path)`` at predict time (reference
``predict.py:49``, Lightning ``save_hyperparameters`` analog).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from myria3d_tpu.models.criterion import CrossEntropyLoss
from myria3d_tpu.models.modules import get_neural_net_class
from myria3d_tpu.models.optimizers import adam
from myria3d_tpu.ops.interpolate import knn_interpolate

MODEL_CKPT_STATE_DIR = "state"
MODEL_CKPT_HPARAMS = "hparams.yaml"


def _as_dtype(dtype: Any) -> Any:
    """Normalize a config-string compute dtype ("bfloat16") to a jnp dtype."""
    if isinstance(dtype, str):
        return {
            "float32": jnp.float32,
            "bfloat16": jnp.bfloat16,
            "float16": jnp.float16,
        }[dtype]
    return dtype


class TrainState(struct.PyTreeNode):
    """Replicable training state (params + BN stats + optimizer state)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class Model:
    """Point-cloud semantic segmentation task (reference ``Model``)."""

    def __init__(
        self,
        neural_net_class_name: str,
        neural_net_hparams: Dict[str, Any],
        lr: float = 1e-3,
        optimizer: Optional[Callable] = None,
        lr_scheduler: Optional[Callable] = None,
        criterion: Optional[Callable] = None,
        monitor: str = "val/loss_epoch",
        interpolation_k: int = 10,
        d_in: Optional[int] = None,
        num_classes: Optional[int] = None,
        classification_dict: Optional[Dict[int, str]] = None,
        ckpt_path: Optional[str] = None,
        accumulate_grad_batches: int = 1,
        grad_microbatch: int = 0,
        **kwargs: Any,
    ):
        self.neural_net_class_name = neural_net_class_name
        self.neural_net_hparams = dict(neural_net_hparams)
        # compute dtype knob (mixed precision): params/BN stats/logits stay
        # f32 (MaskedBatchNorm computes f32 moments and casts back; the
        # classification head is pinned f32) — "bfloat16" halves edge-tensor
        # HBM traffic and runs the MXU at its native width. The reference
        # trains f32 (torch default); f32 remains our default for parity.
        if "dtype" in self.neural_net_hparams:
            self.neural_net_hparams["dtype"] = _as_dtype(
                self.neural_net_hparams["dtype"]
            )
        neural_net_class = get_neural_net_class(neural_net_class_name)
        self.net = neural_net_class(**self.neural_net_hparams)
        # exact lax.top_k everywhere (parity path); see set_exact_knn
        self.exact_knn = bool(self.neural_net_hparams.get("exact_knn", False))
        # x-sorted window for the full-cloud interpolation search
        # (positions; 0 = full scan) — see set_sorted_window
        self.interp_window = 0

        self.num_classes = int(
            num_classes or self.neural_net_hparams.get("num_classes")
        )
        self.d_in = int(d_in or self.neural_net_hparams.get("num_features"))
        self.classification_dict = classification_dict or {}
        self.lr = float(lr)
        self.monitor = monitor
        self.interpolation_k = int(interpolation_k)
        self.criterion = criterion if criterion is not None else CrossEntropyLoss()
        self.ckpt_path = ckpt_path
        # 0 = monolithic backward; k>0 = scan the fwd/bwd over k-cloud
        # microbatches when k divides the batch (large-batch cliff cure —
        # see build_grad_step). Distinct from accumulate_grad_batches,
        # which spreads the OPTIMIZER update over several loader batches.
        self.grad_microbatch = int(grad_microbatch or 0)

        optimizer_factory = optimizer if optimizer is not None else adam
        tx = optimizer_factory(lr=self.lr)
        # Per-step schedulers (OneCycle) fuse into the optimizer as an optax
        # schedule — the device computes the per-step scale from its own
        # update count, removing the per-step host->device LR write.
        self.per_step_schedule_fused = False
        if lr_scheduler is not None:
            probe = lr_scheduler()
            if getattr(probe, "per_step", False) and hasattr(probe, "optax_schedule"):
                tx = optax.chain(tx, optax.scale_by_schedule(probe.optax_schedule()))
                self.per_step_schedule_fused = True
        if accumulate_grad_batches and accumulate_grad_batches > 1:
            # Reference gradient accumulation (``accumulate_grad_batches: 3``)
            # via optax MultiSteps — params update every k micro-batches.
            tx = optax.MultiSteps(tx, every_k_schedule=int(accumulate_grad_batches))
        self.tx = tx
        self.lr_scheduler_factory = lr_scheduler
        # plain config snapshot for checkpoint hparams (set by train pipeline)
        self.raw_hparams: Optional[dict] = None

        self._jitted: Dict[str, Callable] = {}

    # ------------------------------------------------------------------
    # State
    # ------------------------------------------------------------------

    def init_state(self, rng: jax.Array, example_batch: Dict[str, np.ndarray]) -> TrainState:
        """Initialize parameters/BN stats/optimizer state from one batch."""
        p_rng, d_rng = jax.random.split(rng)
        # jit the init: eager linen dispatch is ~30s on CPU for this net.
        variables = jax.jit(
            lambda r, x, pos, mask: self.net.init(r, x, pos, mask, train=False)
        )(
            {"params": p_rng, "decimation": d_rng},
            example_batch["x"],
            example_batch["pos"],
            example_batch["mask"],
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        opt_state = self.tx.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )

    def _rebuild_net(self) -> None:
        """Re-instantiate the net from ``neural_net_hparams`` and drop the
        jitted step caches. Parameters don't depend on the routing/dtype
        flags these hparams carry, so existing states stay valid."""
        self.net = get_neural_net_class(self.neural_net_class_name)(
            **self.neural_net_hparams
        )
        self._jitted.clear()

    def _net_fields(self) -> set:
        import dataclasses as _dc

        return {f.name for f in _dc.fields(type(self.net))}

    def set_exact_knn(self, enable: bool = True) -> None:
        """Route every kNN search to exact ``lax.top_k`` instead of the
        binned Pallas / ``approx_min_k`` kernels (recall ≈0.98): the
        encoder graph + decoder upsampling (net rebuild when the net class
        exposes ``exact_knn`` — RandLA-Net does) and the non-fused
        full-cloud interpolation search. The reference is exact everywhere
        (``torch_cluster.knn``, ``pyg_randla_net.py:14,180``). Parameters
        don't depend on these flags, so existing states stay valid; jitted
        step caches are dropped (``predict.exact_knn``)."""
        self.exact_knn = bool(enable)
        if "exact_knn" in self._net_fields():
            self.neural_net_hparams["exact_knn"] = bool(enable)
            self._rebuild_net()
        self._jitted.clear()

    def set_sorted_window(self, window: int) -> None:
        """Enable windowed kNN over x-SORTED inputs (predict.sorted_window):
        the stage-1 encoder graph (net rebuild when the net class exposes
        ``knn_window``) and the full-cloud interpolation search scan only
        ~``window`` sorted key positions per query tile instead of the
        whole key set (measured ≥99.97 % neighbor capture at window 4608,
        docs/perf_notes.md round 4). REQUIRES the SortPointsByX transform
        in the cook pipeline — the predict pipeline appends it when the
        config knob is set. ``window=0`` restores the full scan."""
        self.interp_window = int(window)
        fields = self._net_fields()
        if "knn_window" in fields:
            self.neural_net_hparams["knn_window"] = int(window)
            # host-side SortPointsByX owns the sorting contract at predict:
            # a train checkpoint's sort_inputs=true hparam would pay a
            # redundant in-model argsort (identity permutation) per batch
            if "sort_inputs" in fields:
                self.neural_net_hparams["sort_inputs"] = False
            self._rebuild_net()
        self._jitted.clear()

    def set_compute_dtype(self, dtype: Any) -> None:
        """Rebuild the net with a different compute dtype
        (``predict.compute_dtype``). Params/BN stats/logits stay f32, so
        any existing checkpoint state remains valid — only the traced
        compute path changes (bf16 edge tensors halve HBM traffic; the
        fused-interp class-flip rate is measured in EXACTNESS_r04.json).
        """
        if "dtype" in self._net_fields():
            self.neural_net_hparams["dtype"] = _as_dtype(dtype)
            self._rebuild_net()
        self._jitted.clear()

    def num_params(self, state: TrainState) -> int:
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(state.params))

    # ------------------------------------------------------------------
    # Pure steps (jit-cached; recompiled per padded-shape bucket)
    # ------------------------------------------------------------------

    def _apply(self, params, batch_stats, x, pos, mask, train, rngs, mutable):
        variables = {"params": params, "batch_stats": batch_stats}
        return self.net.apply(
            variables, x, pos, mask, train=train, rngs=rngs, mutable=mutable
        )

    def build_grad_step(self) -> Callable:
        """Pure (state, x, pos, y, mask, rng) -> (loss, grads, new_stats,
        logits) — the forward/backward WITHOUT the optimizer update.
        Building block for custom reductions (e.g. the local-BN
        data-parallel step pmean-reduces grads/stats across shards before
        one shared optimizer update, ``parallel/mesh.py``).

        When ``grad_microbatch`` divides the batch into k > 1 chunks, the
        backward runs as a ``lax.scan`` over <=``grad_microbatch``-cloud
        microbatches with gradient/stat averaging. This sidesteps the
        measured large-batch backward cliff on TPU: at B>=32 the monolithic
        backward's per-point cost nearly doubles (B=32: 2974 ns/pt vs
        B=16: 1621) while the compiled HLO stays per-cloud identical
        across B — a runtime scheduling/locality effect once the LFA
        softmax intermediates reach ~400 MB per tensor — and the same 32
        clouds as 2x16 scanned microbatches run at 1483 ns/pt (2.0x the
        monolithic step; measured v5e, docs/perf_notes.md round 3).
        Semantics match the reference's multi-GPU DDP regime
        (``RandLaNet_base_run_FR-2x3GPUs.yaml``): per-microbatch BN
        moments (averaged into the EMA) and mean-of-microbatch losses.
        """
        mb = int(self.grad_microbatch or 0)

        def single(state: TrainState, x, pos, y, mask, dec_rng, drop_rng):
            def loss_fn(params):
                logits, updates = self._apply(
                    params, state.batch_stats, x, pos, mask,
                    train=True,
                    rngs={"decimation": dec_rng, "dropout": drop_rng},
                    mutable=["batch_stats"],
                )
                loss = self.criterion(logits, y)
                return loss, (logits, updates["batch_stats"])

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            return loss, grads, new_stats, logits

        def step(state: TrainState, x, pos, y, mask, rng):
            step_rng = jax.random.fold_in(rng, state.step)
            dec_rng, drop_rng = jax.random.split(step_rng)
            batch = x.shape[0]
            if mb <= 0 or batch <= mb or batch % mb != 0:
                return single(state, x, pos, y, mask, dec_rng, drop_rng)

            k = batch // mb

            def chunk(a):
                return a.reshape((k, mb) + a.shape[1:])

            def body(carry, xs_i):
                loss_sum, grad_sum, stat_sum = carry
                xi, pi, yi, mi, i = xs_i
                loss, grads, stats, logits = single(
                    state, xi, pi, yi, mi,
                    jax.random.fold_in(dec_rng, i),
                    jax.random.fold_in(drop_rng, i),
                )
                carry = (
                    loss_sum + loss,
                    jax.tree_util.tree_map(jnp.add, grad_sum, grads),
                    jax.tree_util.tree_map(jnp.add, stat_sum, stats),
                )
                return carry, logits

            init = (
                jnp.zeros((), jnp.float32),
                jax.tree_util.tree_map(jnp.zeros_like, state.params),
                jax.tree_util.tree_map(jnp.zeros_like, state.batch_stats),
            )
            (loss_sum, grad_sum, stat_sum), logits = jax.lax.scan(
                body,
                init,
                (chunk(x), chunk(pos), chunk(y), chunk(mask), jnp.arange(k)),
            )
            inv = 1.0 / k
            mean = lambda t: jax.tree_util.tree_map(lambda a: a * inv, t)
            return (
                loss_sum * inv,
                mean(grad_sum),
                mean(stat_sum),
                logits.reshape((batch,) + logits.shape[2:]),
            )

        return step

    def build_train_step(self) -> Callable:
        """Pure (state, x, pos, y, mask, rng[, lr_mult]) -> (state, loss,
        logits) — un-jitted, for wrapping with jit or mesh-sharded jit
        (``myria3d_tpu.parallel``)."""

        grad_step = self.build_grad_step()

        def step(state: TrainState, x, pos, y, mask, rng, lr_mult=None):
            loss, grads, new_stats, logits = grad_step(
                state, x, pos, y, mask, rng
            )
            updates, new_opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            if lr_mult is not None:
                updates = jax.tree_util.tree_map(
                    lambda u, m: u * m, updates, lr_mult
                )
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
            )
            return new_state, loss, logits

        return step

    def build_eval_step(self) -> Callable:
        def step(state: TrainState, x, pos, y, mask, rng):
            logits = self._apply(
                state.params, state.batch_stats, x, pos, mask,
                train=False, rngs={"decimation": rng}, mutable=False,
            )
            loss = self.criterion(logits, y)
            return loss, logits

        return step


    def build_interp_step(self, fused: bool = True) -> Callable:
        """``fused=False`` keeps the f32 two-op interpolation (exact pyg
        weighting on the selected neighbors) instead of the bf16 MXU-
        recombine kernel — for exactness-sensitive runs such as
        checkpoint-parity evaluation (``predict.exact_interpolation``)."""

        def step(state: TrainState, x, pos, mask, sampled_pos, full_pos,
                 full_mask, rng):
            logits = self._apply(
                state.params, state.batch_stats, x, pos, mask,
                train=False, rngs={"decimation": rng}, mutable=False,
            )
            from myria3d_tpu.ops.pallas_knn import stage_window

            full = knn_interpolate(
                logits, sampled_pos, mask, full_pos, full_mask,
                k=self.interpolation_k, fused_payload=fused,
                # fully-exact neighbor SEARCH only on the non-fused
                # (exact_interpolation) path when predict.exact_knn is on
                exact=(not fused) and self.exact_knn,
                # density-scaled by the sampled (key) cloud's count: the
                # full-cloud search keys are the sampled points
                window=stage_window(
                    self.interp_window, sampled_pos.shape[1]
                ),
            )
            # f16 on the wire: the (B, M, C) full-cloud logits are the
            # predict loop's device->host payload; halving it matters on
            # PCIe and dominates through tunneled backends. The host
            # accumulator upcasts to f32 before the overlap merge.
            return full.astype(jnp.float16)

        return step

    @property
    def train_step(self) -> Callable:
        """(state, x, pos, y, mask, rng[, lr_mult]) -> (state, loss, logits).

        ``lr_mult`` is an optional params-shaped pytree of per-leaf update
        multipliers (0 freezes a subtree; <1 damps it) used by the
        finetuning callback (reference ``FinetuningFreezeUnfreeze``).
        """
        if "train_step" not in self._jitted:
            self._jitted["train_step"] = jax.jit(
                self.build_train_step(), donate_argnums=(0,)
            )
        return self._jitted["train_step"]

    @property
    def eval_step(self) -> Callable:
        """(state, x, pos, y, mask, rng) -> (loss, logits) on subsampled pts."""
        if "eval_step" not in self._jitted:
            self._jitted["eval_step"] = jax.jit(self.build_eval_step())
        return self._jitted["eval_step"]

    @property
    def interp_step(self) -> Callable:
        """Full-cloud regime (test/predict): forward on sampled points then
        on-device kNN-interpolation of logits to the full cloud
        (reference ``model.py:86-98``, k=``interpolation_k``).

        (state, x, pos, mask, sampled_pos, full_pos, full_mask, rng)
            -> (B, M, C) full-cloud logits
        """
        if "interp_step" not in self._jitted:
            self._jitted["interp_step"] = jax.jit(self.build_interp_step())
        return self._jitted["interp_step"]

    @property
    def exact_interp_step(self) -> Callable:
        """Two-op f32 interpolation variant of ``interp_step``
        (``predict.exact_interpolation=true``)."""
        if "interp_step_exact" not in self._jitted:
            self._jitted["interp_step_exact"] = jax.jit(
                self.build_interp_step(fused=False)
            )
        return self._jitted["interp_step_exact"]

    # ------------------------------------------------------------------
    # Checkpointing (orbax)
    # ------------------------------------------------------------------

    def save_checkpoint(self, ckpt_dir: str, state: TrainState,
                        save_opt_state: bool = True) -> str:
        import orbax.checkpoint as ocp

        from myria3d_tpu.utils.config import to_yaml

        ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(ckpt_dir, exist_ok=True)
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        if save_opt_state:
            payload["opt_state"] = state.opt_state
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(
                os.path.join(ckpt_dir, MODEL_CKPT_STATE_DIR),
                jax.device_get(payload),
                force=True,
            )
        if self.raw_hparams is not None:
            with open(os.path.join(ckpt_dir, MODEL_CKPT_HPARAMS), "w") as f:
                f.write(to_yaml(self.raw_hparams))
        return ckpt_dir

    def restore_into_state(self, ckpt_dir: str, state: TrainState,
                           restore_opt_state: bool = True) -> TrainState:
        """Load a checkpoint into an existing state.

        ``restore_opt_state=True`` resumes training exactly (optimizer
        moments included, when the ckpt has them); False reproduces the
        reference finetune semantics — weights only, fresh optimizer
        (``train.py:159-170``).
        """
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                os.path.join(os.path.abspath(ckpt_dir), MODEL_CKPT_STATE_DIR)
            )
        out = state.replace(
            step=jnp.asarray(restored.get("step", 0), jnp.int32),
            params=restored["params"],
            batch_stats=restored["batch_stats"],
        )
        if restore_opt_state and restored.get("opt_state") is not None:
            template = jax.tree_util.tree_leaves(state.opt_state)
            stored = jax.tree_util.tree_leaves(restored["opt_state"])
            if len(template) == len(stored):
                out = out.replace(
                    opt_state=jax.tree_util.tree_unflatten(
                        jax.tree_util.tree_structure(state.opt_state), stored
                    )
                )
        return out

    @classmethod
    def load_from_checkpoint(cls, ckpt_dir: str, **override_hparams: Any
                             ) -> Tuple["Model", TrainState]:
        """Rebuild the Model from the hparams stored beside the weights and
        restore its state (reference ``Model.load_from_checkpoint``,
        ``predict.py:49``; hparam-overridden reload for finetune,
        ``train.py:162-168``)."""
        import yaml

        from myria3d_tpu.utils.config import DotDict, instantiate

        ckpt_dir = os.path.abspath(ckpt_dir)
        with open(os.path.join(ckpt_dir, MODEL_CKPT_HPARAMS)) as f:
            hparams = DotDict.wrap(yaml.safe_load(f))
        hparams.pop("_target_", None)
        hparams.pop("ckpt_path", None)
        kwargs = {k: instantiate(v) for k, v in hparams.items()}
        kwargs.update(override_hparams)
        model = cls(**kwargs)
        model.raw_hparams = dict(hparams)

        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.join(ckpt_dir, MODEL_CKPT_STATE_DIR))
        state = TrainState(
            step=jnp.asarray(restored.get("step", 0), jnp.int32),
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=model.tx.init(restored["params"]),
        )
        return model, state
