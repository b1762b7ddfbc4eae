"""Masked neural-net building blocks (flax.linen).

TPU-native equivalents of the reference's ``SharedMLP`` family
(reference ``myria3d/models/modules/pyg_randla_net.py:97-109``): every op
takes a validity mask because clouds are padded to static shapes, and torch
BatchNorm statistics over concatenated valid points become masked moments
over the padded batch (SURVEY.md §7 "hard parts").

Conventions matching the reference:
- LeakyReLU negative_slope 0.2 (``pyg_randla_net.py:92``);
- BatchNorm momentum 0.01 (torch convention; here ``ra = 0.99*ra +
  0.01*batch``), eps 1e-6 (``pyg_randla_net.py:94``);
- layer order Linear -> BN -> act -> dropout, applied to the *last* layer
  too (pyg MLP ``plain_last=False``, ``pyg_randla_net.py:102``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from myria3d_tpu.ops.masked import masked_mean, masked_var

LRELU_SLOPE = 0.2
BN_MOMENTUM = 0.01  # torch-style: ra = (1 - m) * ra + m * batch
BN_EPS = 1e-6


def lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=LRELU_SLOPE)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid points of a padded batch.

    Equivalent to torch ``BatchNorm1d`` applied to the ``(sum(valid), C)``
    concatenation of valid rows: batch statistics are masked moments over
    every axis but the channel axis. Running stats follow torch semantics —
    normalization uses biased batch variance, the running-var update uses
    the unbiased estimate.
    """

    features: int
    momentum: float = BN_MOMENTUM
    eps: float = BN_EPS

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, valid: Optional[jnp.ndarray], train: bool
    ) -> jnp.ndarray:
        # x: (..., C); valid: bool (...,) or None for fully-valid input.
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )

        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        if train:
            if valid is None:
                mean = jnp.mean(xf, axis=axes)
                var = jnp.var(xf, axis=axes)
                n = jnp.float32(
                    jnp.prod(jnp.asarray([x.shape[a] for a in axes]))
                )
            else:
                vmask = valid[..., None]
                mean = masked_mean(xf, vmask, axis=axes)
                var = masked_var(xf, vmask, axis=axes, mean=mean)
                n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(x.dtype)


class DenseCF(nn.Module):
    """Dense over the *channel* axis of channels-first ``(B, C, ..., N)``
    tensors. Parameter names/shapes identical to ``nn.Dense`` (kernel
    ``(in, out)``, bias ``(out,)``) so checkpoints are interchangeable with
    the channels-last path."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        y = jnp.einsum(
            "io,bi...->bo...", kernel.astype(self.dtype), x.astype(self.dtype)
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype).reshape(
                (1, self.features) + (1,) * (y.ndim - 2)
            )
        return y


class MaskedBatchNormCF(nn.Module):
    """MaskedBatchNorm for channels-first ``(B, C, ..., N)`` tensors; same
    parameter/collection names as ``MaskedBatchNorm``.

    ``raw=True`` declares the parameters/statistics and returns
    ``(x, (scale, bias, ra_mean_value, ra_var_value))`` WITHOUT applying
    normalization — the fused train-mode LFA kernel
    (``ops/pallas_lfa_train.py``) computes batch moments itself and feeds
    them back through ``update_stats=(mean, biased_var, n)`` on a second
    call, which applies the torch-semantics running update (unbiased var)
    exactly as the standard path does."""

    features: int
    momentum: float = BN_MOMENTUM
    eps: float = BN_EPS

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, valid: Optional[jnp.ndarray], train: bool,
        raw: bool = False, update_stats=None,
    ):
        # x: (B, C, ..., N); valid: bool (B, ..., N) or None
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        if raw:
            if update_stats is not None and not self.is_initializing():
                mu_b, var_b, n_b = update_stats
                mu_b = jax.lax.stop_gradient(mu_b)
                var_b = jax.lax.stop_gradient(var_b)
                unbiased = var_b * n_b / jnp.maximum(n_b - 1.0, 1.0)
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value
                    + self.momentum * mu_b
                )
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value
                    + self.momentum * unbiased
                )
            return x, (scale, bias, ra_mean.value, ra_var.value)
        xf = x.astype(jnp.float32)
        axes = (0,) + tuple(range(2, x.ndim))
        if train:
            if valid is None:
                mean = jnp.mean(xf, axis=axes)
                var = jnp.var(xf, axis=axes)
                n = jnp.float32(xf.size // self.features)
            else:
                vm = valid[:, None].astype(jnp.float32)       # (B,1,...,N)
                cnt = jnp.maximum(jnp.sum(vm, axis=axes), 1.0)
                mean = jnp.sum(xf * vm, axis=axes) / cnt
                shape = (1, self.features) + (1,) * (x.ndim - 2)
                var = jnp.sum(
                    ((xf - mean.reshape(shape)) ** 2) * vm, axis=axes
                ) / cnt
                n = cnt
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        shape = (1, self.features) + (1,) * (x.ndim - 2)
        y = (xf - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + self.eps)
        y = y * scale.reshape(shape) + bias.reshape(shape)
        return y.astype(x.dtype)


class SharedMLPCF(nn.Module):
    """Channels-first SharedMLP (edge tensors ``(B, C, K, N)``): identical
    math and parameter tree to ``SharedMLP``, but the large N axis rides the
    lane dimension — a trailing C of 4-16 would be tile-padded to 128 lanes
    and cost ~10-30x HBM traffic (docs/perf_notes.md)."""

    channels: Sequence[int]
    act: bool = True
    norm: bool = True
    use_bias: bool = True
    bn_momentum: float = BN_MOMENTUM
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, valid: Optional[jnp.ndarray], train: bool,
        raw_probe: bool = False, update_stats=None,
    ):
        # raw_probe (single-layer MLPs): run the Dense on a probe input,
        # declare BN params/stats WITHOUT normalizing, and return
        # (dense_out, (scale, bias, ra_mean, ra_var)) — the fused
        # train-mode LFA extracts the unfolded pieces this way and feeds
        # batch moments back via update_stats (see MaskedBatchNormCF).
        if raw_probe:
            assert len(self.channels) == 1 and self.norm
            x = DenseCF(
                self.channels[0], use_bias=self.use_bias, dtype=self.dtype,
                name="Dense_0",
            )(x)
            return MaskedBatchNormCF(
                self.channels[0], momentum=self.bn_momentum,
                name="MaskedBatchNorm_0",
            )(x, valid, train, raw=True, update_stats=update_stats)
        for i, width in enumerate(self.channels):
            x = DenseCF(
                width, use_bias=self.use_bias, dtype=self.dtype,
                name=f"Dense_{i}",
            )(x)
            if self.norm:
                x = MaskedBatchNormCF(
                    width, momentum=self.bn_momentum,
                    name=f"MaskedBatchNorm_{i}",
                )(x, valid, train)
            if self.act:
                x = lrelu(x)
        return x


class SharedMLP(nn.Module):
    """Per-point MLP: [Dense -> MaskedBN -> LeakyReLU(0.2) -> Dropout] x L.

    Mirrors reference ``SharedMLP`` (``pyg_randla_net.py:97-109``): the last
    layer also gets norm + act (``plain_last=False``); ``act=False`` or
    ``norm=False`` drop those stages for every layer (reference ``act=None``
    / ``norm=None`` kwargs, e.g. the attention MLP ``:118`` and shortcut
    ``:170``).
    """

    channels: Sequence[int]  # output width per layer
    act: bool = True
    norm: bool = True
    use_bias: bool = True
    dropout: Optional[Sequence[float]] = None
    bn_momentum: float = BN_MOMENTUM
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, valid: Optional[jnp.ndarray], train: bool
    ) -> jnp.ndarray:
        for i, width in enumerate(self.channels):
            x = nn.Dense(width, use_bias=self.use_bias, dtype=self.dtype)(x)
            if self.norm:
                x = MaskedBatchNorm(width, momentum=self.bn_momentum)(
                    x, valid, train
                )
            if self.act:
                x = lrelu(x)
            if self.dropout is not None and self.dropout[i] > 0:
                x = nn.Dropout(self.dropout[i], deterministic=not train)(x)
        return x
