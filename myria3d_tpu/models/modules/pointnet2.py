"""PointNet++ (SSG) semantic segmentation over padded clouds (flax.linen).

Second MODEL_ZOO architecture — exercises the reference's zoo extension
point (``myria3d/models/model.py:12-29``; BASELINE config #4: "PointNet++
architecture swap (FPS + ball-query)"). TPU-first formulation: masked
farthest-point sampling with static output sizes, nearest-K-within-radius
ball query, dense (B, M, K, C) grouping with masked max-pool, and kNN-
interpolated feature propagation — the same fixed-shape machinery as the
RandLA-Net path.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from myria3d_tpu.models.modules.nn import SharedMLP
from myria3d_tpu.ops.fps import farthest_point_sampling
from myria3d_tpu.ops.interpolate import knn_interpolate
from myria3d_tpu.ops.knn import ball_query, gather_neighbors

_NEG = -1e30


class SetAbstraction(nn.Module):
    """FPS -> ball query -> grouped PointNet -> masked max-pool."""

    decimation: int
    radius: float
    num_neighbors: int
    mlp: Sequence[int]
    bn_momentum: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pos: jnp.ndarray, mask: jnp.ndarray, train: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        n = pos.shape[1]
        m = max(1, n // self.decimation)
        sel_idx, sel_mask = farthest_point_sampling(pos, mask, m)
        new_pos = jax.vmap(lambda t, i: t[i])(pos, sel_idx)       # (B, M, 3)

        idx, d2, neigh_valid = ball_query(
            new_pos, pos, mask, self.num_neighbors, self.radius,
            query_mask=sel_mask,
        )
        pos_j = gather_neighbors(pos, idx)                        # (B, M, K, 3)
        rel = (pos_j - new_pos[:, :, None, :]) / self.radius
        x_j = gather_neighbors(x, idx)                            # (B, M, K, C)
        feats = jnp.concatenate([x_j, rel.astype(x.dtype)], axis=-1)

        h = SharedMLP(list(self.mlp), bn_momentum=self.bn_momentum,
                      dtype=self.dtype, name="pointnet")(
            feats, neigh_valid, train
        )
        h = jnp.where(neigh_valid[..., None], h, _NEG)
        pooled = jnp.max(h, axis=2)                               # (B, M, C')
        pooled = jnp.where(sel_mask[..., None], pooled, 0.0)
        return pooled, new_pos, sel_mask


class FeaturePropagation(nn.Module):
    """kNN-interpolate up + skip concat + MLP (k=3, classic PointNet++)."""

    mlp: Sequence[int]
    k: int = 3
    bn_momentum: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, mask, x_skip, pos_skip, mask_skip, train):
        up = knn_interpolate(x, pos, mask, pos_skip, mask_skip, k=self.k)
        up = up.astype(self.dtype)
        if x_skip is not None:
            up = jnp.concatenate([up, x_skip], axis=-1)
        return SharedMLP(list(self.mlp), bn_momentum=self.bn_momentum,
                         dtype=self.dtype, name="mlp")(
            up, mask_skip, train
        )


class PointNet2(nn.Module):
    """4-stage SSG PointNet++ encoder-decoder for LiDAR segmentation.

    Radii are in normalized subtile units (NormalizePos maps the 50 m
    subtile to [-1, 1]); defaults follow the classic SSG plan scaled to
    4 stages of /4 decimation.
    """

    num_features: int
    num_classes: int
    decimation: int = 4
    num_neighbors: int = 32
    radii: Sequence[float] = (0.05, 0.1, 0.2, 0.4)
    widths: Sequence[int] = (64, 128, 256, 512)
    return_logits: bool = True
    bn_momentum: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray],
        pos: jnp.ndarray,
        mask: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        x = x if x is not None else pos
        x = x.astype(self.dtype)
        x = SharedMLP([32], bn_momentum=self.bn_momentum, dtype=self.dtype,
                      name="fc0")(x, mask, train)

        skips = [(x, pos, mask)]
        for i, (r, w) in enumerate(zip(self.radii, self.widths)):
            x, pos, mask = SetAbstraction(
                self.decimation, r, self.num_neighbors,
                [w // 2, w // 2, w], bn_momentum=self.bn_momentum,
                dtype=self.dtype, name=f"sa{i + 1}",
            )(x, pos, mask, train)
            skips.append((x, pos, mask))

        # decoder: FP back up the stack
        fp_widths = [256, 256, 128, 128]
        for j in range(len(self.radii)):
            x_skip, pos_skip, mask_skip = skips[len(skips) - 2 - j]
            x = FeaturePropagation(
                [fp_widths[j]], bn_momentum=self.bn_momentum,
                dtype=self.dtype, name=f"fp{4 - j}",
            )(x, pos, mask, x_skip, pos_skip, mask_skip, train)
            pos, mask = pos_skip, mask_skip

        x = SharedMLP([128], dropout=[0.5], bn_momentum=self.bn_momentum,
                      dtype=self.dtype, name="head")(
            x, mask, train
        )
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc_classif")(
            x.astype(jnp.float32)
        )
        if self.return_logits:
            return logits
        return jax.nn.log_softmax(logits, axis=-1)
