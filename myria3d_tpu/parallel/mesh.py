"""Data-parallel mesh utilities.

Design (SURVEY.md §5.8 "TPU-native equivalent"): one mesh axis ``data``;
batch tensors sharded ``P('data')`` on their leading axis, model/optimizer
state replicated ``P()``. The jitted step is the *same pure function* as the
single-chip path (``Model.build_*_step``) — GSPMD partitions it, inserting
the gradient ``psum`` where the loss mean crosses the batch axis. BatchNorm
batch statistics are likewise computed over the global batch by default
(sync-BN — a strict upgrade over the reference's local-batch BN under DDP);
``sync_bn=False`` switches to a shard_map step with per-shard BN moments
and pmean'd gradients for exact reference DDP training parity.

Multi-host: each process feeds its local shard via
``jax.make_array_from_process_local_data``; process 0 handles logging and
checkpoint writes (reference rank-zero guards, ``utils/utils.py:19-30``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[: int(n_devices)]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicate_to_mesh(tree: Any, mesh: Mesh) -> Any:
    """Place every leaf replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def _row_fill_value(key: str, dtype: np.dtype):
    """Fill for padded batch rows: targets get the ignore code so masked
    CE/metrics skip them; masks get False; everything else zeros."""
    if key == "y" or key.endswith("_y"):
        from myria3d_tpu.pctl.batching import IGNORE_INDEX

        return IGNORE_INDEX
    return False if np.issubdtype(dtype, np.bool_) else 0


def pad_rows(arr: np.ndarray, multiple: int, fill=0) -> np.ndarray:
    """Pad the leading (batch) axis up to the next multiple with constant
    filler rows. No-op when already aligned."""
    arr = np.asarray(arr)
    b = arr.shape[0]
    target = -(-b // multiple) * multiple
    if target == b:
        return arr
    pad = np.full((target - b,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def shard_batch(arrays: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, Any]:
    """Place batch arrays sharded on the leading (batch) axis.

    The batch dim is padded up to the next multiple of the device count
    with all-masked filler rows (``y`` rows carry the ignore code, masks
    are False) — the same filler semantics the padded loader already uses
    for end-of-epoch stubs — so *every* chip participates at any batch
    size instead of capping the mesh to a divisor of the batch
    (reference DDP uses all requested devices,
    ``configs/experiment/RandLaNet_base_run_FR-MultiGPU.yaml:9-13``).

    Multi-host (num_nodes > 1): each process passes its *local* shard of
    the global batch, padded to a multiple of its local device count;
    ``make_array_from_process_local_data`` assembles the logically-global
    array (replaces the reference's DistributedSampler + DDP input path,
    SURVEY.md §5.8).
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        n_local = max(1, mesh.local_mesh.size)
        return {
            k: jax.make_array_from_process_local_data(
                sharding,
                pad_rows(v, n_local, _row_fill_value(k, np.asarray(v).dtype)),
            )
            for k, v in arrays.items()
        }
    n = int(mesh.devices.size)
    return {
        k: jax.device_put(
            pad_rows(v, n, _row_fill_value(k, np.asarray(v).dtype)), sharding
        )
        for k, v in arrays.items()
    }


def _shardings(mesh: Mesh):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return repl, data


def sharded_train_step(model, mesh: Mesh, with_lr_mult: bool = False,
                       sync_bn: bool = True) -> Callable:
    """jit of the model's pure train step with data-parallel shardings.

    (state, x, pos, y, mask, rng[, lr_mult]) -> (state, loss, logits); state
    replicated, batch tensors sharded on ``data``; logits returned sharded.

    ``sync_bn=True`` (default): the step is GSPMD-partitioned, so BatchNorm
    moments and the masked-CE mean span the *global* batch — a strict
    upgrade over the reference's local-batch BN under DDP.
    ``sync_bn=False``: reference DDP training parity — each shard runs the
    whole forward/backward on its local batch (BN moments and loss mean are
    per-shard), then gradients/loss/BN running stats are pmean-reduced and
    one shared optimizer update is applied (NCCL all-reduce analog,
    SURVEY.md §7 last bullet).
    """
    repl, data = _shardings(mesh)
    if sync_bn:
        step = model.build_train_step()
        if with_lr_mult:
            return jax.jit(
                lambda state, x, pos, y, mask, rng, lr_mult: step(
                    state, x, pos, y, mask, rng, lr_mult
                ),
                in_shardings=(repl, data, data, data, data, repl, repl),
                out_shardings=(repl, repl, data),
                donate_argnums=(0,),
            )
        return jax.jit(
            lambda state, x, pos, y, mask, rng: step(state, x, pos, y, mask, rng),
            in_shardings=(repl, data, data, data, data, repl),
            out_shardings=(repl, repl, data),
            donate_argnums=(0,),
        )

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    import optax

    grad_step = model.build_grad_step()

    def per_shard(state, x, pos, y, mask, rng, lr_mult=None):
        loss, grads, new_stats, logits = grad_step(state, x, pos, y, mask, rng)
        # Params enter the shard_map replicated (P()), so AD already psums
        # their cotangent across the data axis — dividing by the number of
        # shards that carry real points yields the DDP gradient mean.
        # Loss/BN stats are per-shard values and need an explicit weighted
        # reduce: shards whose slice is entirely loader/mesh filler rows
        # (batch padded up to the device count) contribute zero grads and
        # degenerate (0-count) BN moments — excluding them keeps parity
        # with reference DDP, where every rank always holds real samples.
        import jax.numpy as jnp

        w = jnp.any(mask).astype(jnp.float32)  # this shard has real points
        n_valid = jnp.maximum(jax.lax.psum(w, DATA_AXIS), 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / n_valid, grads)
        loss = jax.lax.psum(loss * w, DATA_AXIS) / n_valid
        new_stats = jax.tree_util.tree_map(
            lambda s: jax.lax.psum(s * w, DATA_AXIS) / n_valid, new_stats
        )
        updates, new_opt_state = model.tx.update(
            grads, state.opt_state, state.params
        )
        if lr_mult is not None:
            updates = jax.tree_util.tree_map(lambda u, m: u * m, updates, lr_mult)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss, logits

    if with_lr_mult:
        smapped = shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(DATA_AXIS), P(), P()),
            out_specs=(P(), P(), P(DATA_AXIS)),
        )
        return jax.jit(
            smapped,
            in_shardings=(repl, data, data, data, data, repl, repl),
            out_shardings=(repl, repl, data),
            donate_argnums=(0,),
        )
    smapped = shard_map(
        lambda state, x, pos, y, mask, rng: per_shard(state, x, pos, y, mask, rng),
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS), P()),
        out_specs=(P(), P(), P(DATA_AXIS)),
    )
    return jax.jit(
        smapped,
        in_shardings=(repl, data, data, data, data, repl),
        out_shardings=(repl, repl, data),
        donate_argnums=(0,),
    )


def sharded_eval_step(model, mesh: Mesh) -> Callable:
    repl, data = _shardings(mesh)
    step = model.build_eval_step()
    return jax.jit(
        step,
        in_shardings=(repl, data, data, data, data, repl),
        out_shardings=(repl, data),
    )


def sharded_interp_step(model, mesh: Mesh, fused: bool = True) -> Callable:
    """Full-cloud inference step over the mesh via ``shard_map``.

    The step is perfectly batch-parallel (per-subtile logits, no cross-
    sample reduction), so each device runs the *whole* per-shard step on
    its local batch slice. Unlike GSPMD partitioning of the step, this
    keeps the fused Pallas k=1 kernel usable — every program instance owns
    its local shard (``ops.pallas_nn1.per_shard_context``)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from myria3d_tpu.ops import pallas_nn1

    repl, data = _shardings(mesh)
    step = model.build_interp_step(fused=fused)
    smapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
    )
    jitted = jax.jit(
        smapped,
        in_shardings=(repl, data, data, data, data, data, data, repl),
        out_shardings=data,
    )

    def call(state, x, pos, mask, sampled_pos, full_pos, full_mask, rng):
        # tracing happens on first call — mark it per-shard so the Pallas
        # nearest-neighbor gate stays on for TPU shards
        with pallas_nn1.per_shard_context():
            return jitted(
                state, x, pos, mask, sampled_pos, full_pos, full_mask, rng
            )

    return call


class ParallelSteps:
    """Mesh-backed drop-in replacements for the Model's jitted steps.

    ``auto_parallel(model, batch_size)`` returns one of these when more
    than one device is usable, else None and callers use the single-chip
    steps. ``place_batch`` pads the batch dim up to the device count with
    all-masked filler rows, so any batch size uses every chip.
    """

    def __init__(self, model, mesh: Mesh, sync_bn: bool = True):
        self.mesh = mesh
        self.sync_bn = sync_bn
        self.train_step = sharded_train_step(model, mesh, sync_bn=sync_bn)
        self.train_step_lr_mult = sharded_train_step(
            model, mesh, with_lr_mult=True, sync_bn=sync_bn
        )
        self.eval_step = sharded_eval_step(model, mesh)
        self.interp_step = sharded_interp_step(model, mesh)
        self._model = model
        self._exact_interp_step: Optional[Callable] = None

    @property
    def exact_interp_step(self) -> Callable:
        """Two-op f32 interpolation variant (predict.exact_interpolation),
        built lazily — most runs never trace it."""
        if self._exact_interp_step is None:
            self._exact_interp_step = sharded_interp_step(
                self._model, self.mesh, fused=False
            )
        return self._exact_interp_step

    def place_state(self, state):
        return replicate_to_mesh(state, self.mesh)

    def place_batch(self, arrays: Dict[str, np.ndarray]) -> Dict[str, Any]:
        return shard_batch(arrays, self.mesh)

    @property
    def batch_multiple(self) -> int:
        """Row alignment ``place_batch`` pads the batch dim to — callers
        holding host-side per-row arrays (e.g. full-cloud targets in
        ``Trainer.test``) pad theirs to match the device-side batch."""
        if jax.process_count() > 1:
            return max(1, int(self.mesh.local_mesh.size))
        return int(self.mesh.devices.size)

    def pad_rows(self, arr: np.ndarray, fill=0) -> np.ndarray:
        return pad_rows(arr, self.batch_multiple, fill)


def auto_parallel(model, batch_size: int, devices: Any = "auto",
                  sync_bn: bool = True) -> Optional[ParallelSteps]:
    """Build ParallelSteps over the local devices (None for single-chip).

    All requested devices are used regardless of batch size —
    ``place_batch`` pads the batch dim to the device count with masked
    filler rows (reference DDP likewise uses every requested device,
    ``configs/experiment/RandLaNet_base_run_FR-MultiGPU.yaml:9-13``).
    ``batch_size`` only caps the mesh so it never exceeds one sample per
    chip's worth of padding waste beyond the batch itself.
    """
    avail = jax.devices()
    want = len(avail) if devices in (None, "auto") else min(int(devices), len(avail))
    if jax.process_count() > 1:
        # multi-host: the mesh must cover every process's devices
        n = want
    else:
        n = min(want, max(1, int(batch_size)))
    if n <= 1:
        return None
    return ParallelSteps(model, make_mesh(n), sync_bn=sync_bn)
