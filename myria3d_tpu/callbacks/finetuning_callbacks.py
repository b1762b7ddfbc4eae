"""Staged-unfreeze finetuning via per-subtree update multipliers.

Reference ``FinetuningFreezeUnfreeze`` (``callbacks/finetuning_callbacks.py:4-48``)
freezes everything then unfreezes the last FC at epoch 0, the full FC head at
``unfreeze_fc_end_epoch``, and the decoder at ``unfreeze_decoder_train_epoch``,
with lr/100 param groups. (The reference implementation is stale — it targets
modules that no longer exist; this one targets the actual RandLANet tree.)

JAX-native formulation: instead of mutating requires_grad, build a
params-shaped pytree of update multipliers per epoch and hand it to
``Model.train_step(lr_mult=...)`` — 0 freezes, 1/lr_factor damps.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# module-name prefixes per group of the RandLANet tree
_LAST_FC = ("fc_classif",)
_FC_HEAD = ("fc_classif", "mlp_classif")
_DECODER = ("fp1", "fp2", "fp3", "fp4", "mlp_summit")


class FinetuningFreezeUnfreeze:
    def __init__(
        self,
        unfreeze_fc_end_epoch: int = 1,
        unfreeze_decoder_train_epoch: int = 3,
        lr_factor: float = 100.0,
    ):
        self.unfreeze_fc_end_epoch = int(unfreeze_fc_end_epoch)
        self.unfreeze_decoder_train_epoch = int(unfreeze_decoder_train_epoch)
        self.lr_factor = float(lr_factor)

    def lr_mult_for_epoch(self, params: Any, epoch: int) -> Any:
        """Params-shaped pytree of multipliers for this epoch."""
        damp = 1.0 / self.lr_factor

        def top_module(path) -> str:
            return str(path[0].key) if path else ""

        def mult(path, leaf):
            top = top_module(path)
            if top in _LAST_FC:
                return jnp.asarray(1.0, leaf.dtype)
            if top in _FC_HEAD and epoch >= self.unfreeze_fc_end_epoch:
                return jnp.asarray(damp, leaf.dtype)
            if top in _DECODER and epoch >= self.unfreeze_decoder_train_epoch:
                return jnp.asarray(damp, leaf.dtype)
            return jnp.asarray(0.0, leaf.dtype)

        return jax.tree_util.tree_map_with_path(mult, params)
