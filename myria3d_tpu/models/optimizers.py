"""Optimizers and LR schedulers (optax) — TPU-native equivalents of the
reference's torch optimizer/scheduler configs
(``configs/model/optimizer/{Adam,AdamW,SGD}.yaml``,
``configs/model/lr_scheduler/{ReduceLROnPlateau,OneCycleLR}.yaml``).

Optimizer factories return ``optax.GradientTransformation`` built with
``inject_hyperparams`` so the learning rate is a runtime leaf of the
optimizer state — the plateau scheduler rescales it without recompiling
the train step.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import optax


def adam(lr: float, **kwargs) -> optax.GradientTransformation:
    """torch.optim.Adam equivalent (eps 1e-8, betas (0.9, 0.999))."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, **kwargs)


def adamw(lr: float, weight_decay: float = 0.01, **kwargs) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, weight_decay=weight_decay, **kwargs
    )


def sgd(lr: float, momentum: float = 0.9, **kwargs) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.sgd)(
        learning_rate=lr, momentum=momentum, **kwargs
    )


def _find_hyperparams(opt_state):
    """Locate the inject_hyperparams dict inside a (possibly wrapped)
    optimizer state (e.g. under optax.MultiSteps)."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    if hasattr(opt_state, "inner_opt_state"):
        return _find_hyperparams(opt_state.inner_opt_state)
    if isinstance(opt_state, (tuple, list)):
        for sub in opt_state:
            found = _find_hyperparams(sub)
            if found is not None:
                return found
    return None


def set_learning_rate_scale(opt_state, base_lr: float, scale: float):
    """Rewrite the injected learning_rate leaf to ``base_lr * scale``.

    Mutates the hyperparams dict in place — the next jitted step picks the
    new value up as a runtime argument (no recompile).
    """
    import jax.numpy as jnp

    hp = _find_hyperparams(opt_state)
    if hp is not None:
        hp["learning_rate"] = jnp.asarray(base_lr * scale, jnp.float32)
    return opt_state


def current_learning_rate(opt_state) -> float:
    hp = _find_hyperparams(opt_state)
    return float(hp["learning_rate"]) if hp is not None else float("nan")


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Host-side plateau controller — torch ``ReduceLROnPlateau`` semantics
    (reference config: mode=min, factor=0.5, patience=20, cooldown=5).

    Call ``step(metric)`` once per validation epoch; read ``scale`` and apply
    it with ``set_learning_rate_scale``. Stateful on the host: LR control is
    control-plane logic, not device compute.
    """

    mode: str = "min"
    factor: float = 0.5
    patience: int = 10
    cooldown: int = 0
    threshold: float = 1e-4
    min_lr: float = 0.0

    def __post_init__(self):
        self.best: Optional[float] = None
        self.num_bad_epochs = 0
        self.cooldown_counter = 0
        self.scale = 1.0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            if self.cooldown_counter > 0:
                self.cooldown_counter -= 1
            else:
                self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.scale *= self.factor
            self.num_bad_epochs = 0
            self.cooldown_counter = self.cooldown
        return self.scale

    def state_dict(self) -> dict:
        return {
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
            "scale": self.scale,
        }

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)


@dataclasses.dataclass
class OneCycleLR:
    """torch ``OneCycleLR`` (cosine annealing strategy) as a per-step scale.

    ``scale_at(step)`` returns lr_scale relative to max_lr: warms up from
    ``1/div_factor`` to 1 over ``pct_start`` of total steps, then anneals to
    ``1/(div_factor*final_div_factor)``.
    """

    epochs: int = 100
    steps_per_epoch: int = 100
    pct_start: float = 0.3
    div_factor: float = 10.0
    final_div_factor: float = 1000.0

    def __post_init__(self):
        self.total_steps = max(1, self.epochs * self.steps_per_epoch)
        self._step = 0
        self.scale = self.scale_at(0)

    def scale_at(self, step: int) -> float:
        up = max(1, int(self.total_steps * self.pct_start))
        initial = 1.0 / self.div_factor
        final = initial / self.final_div_factor
        s = min(step, self.total_steps)
        if s < up:
            t = s / up
            return initial + (1.0 - initial) * 0.5 * (1 - math.cos(math.pi * t))
        t = (s - up) / max(1, self.total_steps - up)
        return final + (1.0 - final) * 0.5 * (1 + math.cos(math.pi * t))

    def step(self, metric: Optional[float] = None) -> float:
        self._step += 1
        self.scale = self.scale_at(self._step)
        return self.scale

    @property
    def per_step(self) -> bool:
        return True

    def optax_schedule(self) -> optax.Schedule:
        """Device-side equivalent: fused into the optimizer via
        ``optax.scale_by_schedule`` so per-step LR control needs no host
        mutation or transfer (the host object remains only for LR-monitor
        display)."""
        return optax.cosine_onecycle_schedule(
            transition_steps=self.total_steps,
            peak_value=1.0,
            pct_start=self.pct_start,
            div_factor=self.div_factor,
            final_div_factor=self.final_div_factor,
        )

    def state_dict(self) -> dict:
        return {"_step": self._step, "scale": self.scale}

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)
