"""RandLA-Net over fixed-shape padded point clouds (flax.linen).

TPU-first re-design of the reference ``PyGRandLANet``
(``myria3d/models/modules/pyg_randla_net.py:22-88``): the ragged
``(B*N, C)`` + edge-list formulation becomes dense ``(B, N, C)`` tensors
with boolean validity masks and gather-based ``(B, N, K)`` neighborhoods,
so every op is a large static-shape matmul/elementwise XLA can tile onto
the MXU.

Channel plan matches the reference exactly (``pyg_randla_net.py:40-53``):
  d_bottleneck = max(32, num_classes, num_features)
  fc0: d_in -> d_bottleneck
  blocks: (d_bottleneck->32) (32->128) (128->256) (256->512), each with
    random /decimation between stages
  mlp_summit: 512 -> 512
  decoder FP (k=1 interp + skip concat): 512+256->256, 256+128->128,
    128+32->32, 32+32->d_bottleneck
  head: SharedMLP [d_bottleneck, 64, 32] (dropout [0, 0.5]) -> Linear
    32 -> num_classes
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from myria3d_tpu.models.modules.nn import SharedMLP, SharedMLPCF, lrelu
from myria3d_tpu.ops.interpolate import knn_interpolate
from myria3d_tpu.ops.knn import gather_neighbors, knn_graph
from myria3d_tpu.ops.masked import masked_softmax
from myria3d_tpu.ops.sampling import random_decimation


class LocalFeatureAggregation(nn.Module):
    """LocSE + attentive pooling over dense (B, N, K) neighborhoods.

    Reference ``LocalFeatureAggregation`` (``pyg_randla_net.py:112-152``):
    message = concat(x_j, MLP_enc(concat(pos_i, pos_j, pos_diff, |diff|)));
    attention scores from a bias-free linear, scatter-softmax per
    neighborhood -> here a dense masked softmax over the K axis; aggr=add;
    then a post-attention MLP. Input feature width must equal channels//2.
    """

    channels: int
    bn_momentum: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,            # (B, N, channels//2)
        relative_infos: Optional[jnp.ndarray],  # (B, 10, K, N) LocSE geometry
        idx_t: Optional[jnp.ndarray],  # (B, K, N) neighbor indices (transposed)
        nv_t: Optional[jnp.ndarray],   # (B, K, N) bool
        mask: jnp.ndarray,         # (B, N) bool — valid centers
        train: bool,
        x_j: Optional[jnp.ndarray] = None,  # (B, C/2, K, N) pre-gathered
        *,
        pos: Optional[jnp.ndarray] = None,          # fused path: (B, N, 3)
        idx: Optional[jnp.ndarray] = None,          # fused/windowed: (B, N, K)
        neigh_valid: Optional[jnp.ndarray] = None,  # fused/windowed: (B, N, K)
        fused_window: int = 0,
        gather_window: int = 0,    # windowed MXU gather for x_j (train path)
        fused_train_window: int = 0,  # fused TRAIN-mode LFA (batch-moment BN)
    ) -> jnp.ndarray:
        if fused_train_window and pos is not None and train:
            # Fused train-mode LFA (ops/pallas_lfa_train.py): batch-moment
            # BN from the 11x11 rel statistics, forward through the eval
            # kernel with batch-folded affines, hand-written VJP — the
            # (B, C, K, N) edge tensors and BOTH XLA gathers (and their
            # scatter VJPs) never exist. The PARAMETER TREE stays
            # identical: the same-named submodules are instantiated and
            # probed for their raw (unfolded) pieces; the BN running
            # stats are updated through the module with the kernel's
            # exact masked moments (torch unbiased-var semantics).
            from myria3d_tpu.ops import pallas_lfa_train

            f32 = jnp.float32
            c = self.channels
            c_in = c // 2
            probe_in = jnp.concatenate(
                [jnp.eye(10, dtype=f32), jnp.zeros((10, 1), f32)], axis=1
            )[None, :, None, :]                         # (1, 10, 1, 11)
            enc = SharedMLPCF(
                [c_in], bn_momentum=self.bn_momentum, dtype=f32,
                act=False, name="mlp_encoder",
            )
            dense_probe, (bn_scale, bn_bias, _, _) = enc(
                probe_in, None, train, raw_probe=True
            )
            w_aff = dense_probe[0, :, 0, :]             # (c_in, 11)
            # bias rides every probe column — subtract the zero-input col
            w_e = (w_aff[:, :10] - w_aff[:, 10:11]).T   # (10, c_in)
            b_e = w_aff[:, 10]
            att_probe_in = jnp.eye(c, dtype=f32)[None, :, None, :]
            att_probe = SharedMLPCF(
                [c], act=False, norm=False, use_bias=False, dtype=f32,
                name="mlp_attention",
            )(att_probe_in, None, False)
            att_t = att_probe[0, :, 0, :]               # (C, C) = kernel^T
            pooled, mu, var, n = pallas_lfa_train.lfa_train_pallas(
                x.astype(f32), pos, mask, idx, neigh_valid,
                w_e, b_e, bn_scale, bn_bias, att_t,
                window=fused_train_window,
                interpret=pallas_lfa_train.FORCE_INTERPRET,
            )
            # feed the kernel's exact masked batch moments back into the
            # running statistics (second call on the SAME submodule)
            enc(probe_in, None, train, raw_probe=True,
                update_stats=(mu, var, n))
            return SharedMLP(
                [c], bn_momentum=self.bn_momentum,
                dtype=self.dtype, name="mlp_post_attention",
            )(pooled.astype(self.dtype), mask, train)
        if fused_window and pos is not None and not train:
            # Fused windowed Pallas LFA (ops/pallas_lfa.py): the XLA
            # neighbor gathers + (B, C, K, N) HBM edge tensors never
            # exist. Eval-only (the ``not train`` gate is load-bearing:
            # this branch folds BN RUNNING stats into the forward and
            # skips batch-moment BN + stat updates — train callers must
            # fall through to fused_train_window / standard) — BN running
            # stats fold to constants. The
            # PARAMETER TREE stays identical to the standard branch: the
            # same-named submodules are instantiated and probed with tiny
            # identity inputs to extract their (eval-mode affine)
            # constants — Dense∘BN is affine at eval, so columns of the
            # probe output ARE the folded weights.
            from myria3d_tpu.ops import pallas_lfa
            from myria3d_tpu.ops.pallas_lfa import lfa_attention_pallas

            f32 = jnp.float32
            c = self.channels
            c_in = c // 2
            enc_probe_in = jnp.concatenate(
                [jnp.eye(10, dtype=f32), jnp.zeros((10, 1), f32)], axis=1
            )[None, :, None, :]                         # (1, 10, 1, 11)
            enc_probe = SharedMLPCF(
                [c_in], bn_momentum=self.bn_momentum, dtype=f32,
                act=False, name="mlp_encoder",
            )(enc_probe_in, None, False)
            enc_aff = enc_probe[0, :, 0, :]             # (c_in, 11)
            enc_a = enc_aff[:, :10] - enc_aff[:, 10:11]
            enc_c = enc_aff[:, 10]
            att_probe_in = jnp.eye(c, dtype=f32)[None, :, None, :]
            att_probe = SharedMLPCF(
                [c], act=False, norm=False, use_bias=False, dtype=f32,
                name="mlp_attention",
            )(att_probe_in, None, False)
            att_t = att_probe[0, :, 0, :]               # (C, C) = kernel^T
            pooled = lfa_attention_pallas(
                x.astype(f32), pos, mask, idx, neigh_valid,
                enc_a, enc_c, att_t, window=fused_window,
                interpret=pallas_lfa.FORCE_INTERPRET,
            )
            return SharedMLP(
                [c], bn_momentum=self.bn_momentum,
                dtype=self.dtype, name="mlp_post_attention",
            )(pooled.astype(self.dtype), mask, train)
        # Channels-first (B, C, K, N) internals: the large N axis rides the
        # lane dimension. The natural (B, N, K, C) layout tile-pads C=4-16
        # to 128 lanes, inflating every edge tensor 8-32x (perf_notes.md).
        # The LocSE geometry tensor comes precomputed from the block: XLA
        # gathers cost ~the same regardless of width (descriptor-bound), so
        # the pos gather + 10-channel concat is built ONCE per block and
        # shared by both LFAs (measured: each gather ~15-25 ms at the
        # production 12k shape).
        local_spatial_encoding = SharedMLPCF(
            [self.channels // 2], bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="mlp_encoder",
        )(relative_infos, nv_t, train)
        if x_j is None:
            x_cf = jnp.swapaxes(x, 1, 2)                       # (B, C/2, N)
            if gather_window and idx is not None:
                # windowed one-hot MXU gather + scatter-add VJP
                # (ops/pallas_gather.py) — the block verified availability
                from myria3d_tpu.ops import pallas_gather

                x_j = pallas_gather.gather_neighbors_windowed(
                    x_cf, idx, neigh_valid, gather_window,
                    interpret=pallas_gather.FORCE_INTERPRET,
                ).astype(x_cf.dtype)
            else:
                x_j = jax.vmap(lambda t, i: t[:, i])(x_cf, idx_t)
        local_features = jnp.concatenate(
            [x_j, local_spatial_encoding], axis=1
        )                                                      # (B, C, K, N)

        att_features = SharedMLPCF(
            [self.channels], act=False, norm=False, use_bias=False,
            dtype=self.dtype, name="mlp_attention",
        )(local_features, None, train)
        att_scores = masked_softmax(
            att_features, nv_t[:, None], axis=2
        ).astype(local_features.dtype)

        out_cf = jnp.sum(att_scores * local_features, axis=2)  # (B, C, N)
        out = jnp.swapaxes(out_cf, 1, 2)                       # (B, N, C)
        out = SharedMLP(
            [self.channels], bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="mlp_post_attention",
        )(out, mask, train)
        return out


class DilatedResidualBlock(nn.Module):
    """Reference ``DilatedResidualBlock`` (``pyg_randla_net.py:155-189``)."""

    num_neighbors: int
    d_out: int
    bn_momentum: float = 0.01
    dtype: jnp.dtype = jnp.float32
    exact_knn: bool = False
    # x-sorted window for the kNN graph (positions; 0 = full scan). Only
    # valid when the block's input cloud is x-sorted — order-preserving
    # random decimation (ops/sampling.py) keeps every encoder stage
    # sorted, so RandLANet passes it to all four blocks (the kernel
    # auto-disables itself when window >= the stage's key count).
    knn_window: int = 0
    # Route training through the fused train-mode LFA Pallas kernel
    # (ops/pallas_lfa_train.py: batch-moment BN folded in, hand-written
    # VJP). Validated on v5e (op-check vs interpret ok, whole-model grad
    # cosine 0.9987 vs the unfused program); measured BATCH-DEPENDENT —
    # 0.84x at B=8 (kernel fixed costs dominate) but 1.27x at B=16
    # (147.6 vs 188.1 ms, docs/perf_notes.md round 5). "auto" (default)
    # engages it only when the stage's compile-time batch dim ≥ 16 (the
    # measured crossover side); True/False force it on/off. Below the
    # threshold the path is windowed Pallas kNN + XLA LFA + MXU
    # scatter-add gather VJPs.
    fused_train_lfa: Any = "auto"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pos: jnp.ndarray, mask: jnp.ndarray, train: bool
    ) -> jnp.ndarray:
        # Density-scale AND clamp the window per stage (ops.pallas_knn.
        # stage_window): a thin x-slab's neighbor span shrinks with the
        # stage's point count, so a proportionally tighter window keeps
        # its measured capture while cutting the distance streaming (and
        # the fused LFA's one-hot span) ~window/4608; the honor clamp
        # keeps deeper stages on the windowed kernels + fused LFAs — at
        # the 12k bucket block2's two gathers alone were ~33 ms at B=48.
        window = self.knn_window
        if window:
            from myria3d_tpu.ops.pallas_knn import stage_window

            window = stage_window(window, pos.shape[1])
        idx, _, neigh_valid = knn_graph(
            pos, mask, self.num_neighbors, exact=self.exact_knn,
            window=window,
        )
        shortcut_of_x = SharedMLP(
            [self.d_out], act=False, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="shortcut",
        )(x, mask, train)
        x = SharedMLP([self.d_out // 8], bn_momentum=self.bn_momentum,
                      dtype=self.dtype, name="mlp1")(
            x, mask, train
        )
        from myria3d_tpu.ops.pallas_lfa import lfa_fused_available

        use_fused_train = (
            self.fused_train_lfa is True
            or (self.fused_train_lfa == "auto" and x.shape[0] >= 16)
        )
        if (
            use_fused_train
            and window > 0 and train and x.dtype == jnp.float32
        ):
            # Fused TRAIN-mode LFA (batch-moment BN + hand-written VJP):
            # requires the windowed Pallas kNN graph (in-window contract)
            # and the VMEM gate for both LFAs' widths.
            from myria3d_tpu.ops.pallas_knn import knn_pallas_available
            from myria3d_tpu.ops.pallas_lfa_train import lfa_train_available

            n_stage = pos.shape[1]
            if (
                not self.exact_knn
                and knn_pallas_available(
                    min(self.num_neighbors, n_stage), n_stage
                )
                and lfa_train_available(
                    n_stage, self.num_neighbors, window,
                    c_in=self.d_out // 8,
                )
                and lfa_train_available(
                    n_stage, self.num_neighbors, window,
                    c_in=self.d_out // 4,
                )
            ):
                x = LocalFeatureAggregation(
                    self.d_out // 4, bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name="lfa1",
                )(x, None, None, None, mask, train, pos=pos, idx=idx,
                  neigh_valid=neigh_valid, fused_train_window=window)
                x = LocalFeatureAggregation(
                    self.d_out // 2, bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name="lfa2",
                )(x, None, None, None, mask, train, pos=pos, idx=idx,
                  neigh_valid=neigh_valid, fused_train_window=window)
                x = SharedMLP(
                    [self.d_out], act=False, bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name="mlp2",
                )(x, mask, train)
                return lrelu(x + shortcut_of_x)

        if (
            window > 0 and not train
            and lfa_fused_available(
                pos.shape[1], self.num_neighbors, window,
                c_in=self.d_out // 4,
            )
        ):
            # Fused windowed LFA: no wide gather, no (B, C, K, N) edge
            # tensors — see LocalFeatureAggregation's fused branch.
            x = LocalFeatureAggregation(
                self.d_out // 4, bn_momentum=self.bn_momentum,
                dtype=self.dtype, name="lfa1",
            )(x, None, None, None, mask, train, pos=pos, idx=idx,
              neigh_valid=neigh_valid, fused_window=window)
            x = LocalFeatureAggregation(
                self.d_out // 2, bn_momentum=self.bn_momentum,
                dtype=self.dtype, name="lfa2",
            )(x, None, None, None, mask, train, pos=pos, idx=idx,
              neigh_valid=neigh_valid, fused_window=window)
            x = SharedMLP(
                [self.d_out], act=False, bn_momentum=self.bn_momentum,
                dtype=self.dtype, name="mlp2",
            )(x, mask, train)
            return lrelu(x + shortcut_of_x)
        # LocSE geometry, built once for both LFAs (they share the graph):
        # (B, 10, K, N) = [pos_i, pos_j, pos_diff, |diff|] channels-first
        idx_t = jnp.swapaxes(idx, 1, 2)                        # (B, K, N)
        nv_t = jnp.swapaxes(neigh_valid, 1, 2)                 # (B, K, N)
        pos_cf = jnp.swapaxes(pos, 1, 2).astype(self.dtype)    # (B, 3, N)
        # ONE wide gather serves both the LocSE geometry and lfa1's
        # neighbor features: XLA gathers are descriptor-bound, so fewer,
        # wider gathers beat many narrow ones (~15-25 ms each at 12k).
        x1_cf = jnp.swapaxes(x, 1, 2)                          # (B, C1, N)
        # Windowed one-hot MXU gather + scatter-add VJP over x-sorted
        # clouds (ops/pallas_gather.py): replaces BOTH descriptor-bound
        # XLA gathers AND their scatter VJPs — the train step's bound
        # (docs/perf_notes.md round 4). Valid only when the windowed
        # Pallas kNN produced idx (every index in-window per query tile).
        from myria3d_tpu.ops import pallas_gather
        from myria3d_tpu.ops.pallas_knn import knn_pallas_available

        n_stage = pos.shape[1]
        p_wide = 3 + x1_cf.shape[1]
        p_lfa2 = self.d_out // 4
        use_wg = (
            window > 0 and not self.exact_knn
            and x.dtype == jnp.float32
            and knn_pallas_available(
                min(self.num_neighbors, n_stage), n_stage
            )
            and (
                pallas_gather.FORCE_INTERPRET
                or (
                    pallas_gather.gather_windowed_available(
                        n_stage, self.num_neighbors, p_wide, window
                    )
                    and pallas_gather.gather_windowed_available(
                        n_stage, self.num_neighbors, p_lfa2, window
                    )
                )
            )
        )
        if use_wg:
            g = pallas_gather.gather_neighbors_windowed(
                jnp.concatenate([pos_cf, x1_cf], axis=1), idx, neigh_valid,
                window, interpret=pallas_gather.FORCE_INTERPRET,
            ).astype(self.dtype)                               # (B, 3+C1, K, N)
        else:
            g = jax.vmap(lambda t, i: t[:, i])(
                jnp.concatenate([pos_cf, x1_cf], axis=1), idx_t
            )                                                  # (B, 3+C1, K, N)
        pos_j, x1_j = g[:, :3], g[:, 3:]
        pos_i = pos_cf[:, :, None, :]                          # (B, 3, 1, N)
        pos_diff = pos_j - pos_i
        distance = jnp.sqrt(jnp.maximum(
            jnp.sum(pos_diff * pos_diff, axis=1, keepdims=True), 0.0
        ))
        relative_infos = jnp.concatenate(
            [jnp.broadcast_to(pos_i, pos_j.shape), pos_j, pos_diff, distance],
            axis=1,
        )                                                      # (B, 10, K, N)
        x = LocalFeatureAggregation(
            self.d_out // 4, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="lfa1",
        )(x, relative_infos, idx_t, nv_t, mask, train, x_j=x1_j)
        x = LocalFeatureAggregation(
            self.d_out // 2, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="lfa2",
        )(x, relative_infos, idx_t, nv_t, mask, train,
          idx=idx, neigh_valid=neigh_valid,
          gather_window=window if use_wg else 0)
        x = SharedMLP([self.d_out], act=False, bn_momentum=self.bn_momentum,
                      dtype=self.dtype, name="mlp2")(
            x, mask, train
        )
        return lrelu(x + shortcut_of_x)


class RandLANet(nn.Module):
    """Encoder-decoder semantic-segmentation net for padded LiDAR clouds.

    ``__call__(x, pos, mask, train)`` -> per-point logits ``(B, N, C)``.
    Random decimation draws from the 'decimation' RNG stream (the reference
    decimates randomly at eval time too, ``pyg_randla_net.py:221``).
    """

    num_features: int
    num_classes: int
    decimation: int = 4
    num_neighbors: int = 16
    return_logits: bool = True
    bn_momentum: float = 0.01
    dtype: jnp.dtype = jnp.float32
    # Rematerialize each residual block in the backward pass (jax.checkpoint
    # via nn.remat): the saved (B, C, K, N) edge tensors dominate training
    # HBM, and past ~B=16 at the 12k bucket their residency drives the
    # backward off a cliff (measured v5e: B=32 bwd 12x the B=8 bwd for 4x
    # the work; with remat the backward recomputes the block forward
    # instead). Opt-in: `model.neural_net_hparams.remat=true` — the
    # production batch-10 config doesn't need it.
    remat: bool = False
    # Exact lax.top_k neighbor selection everywhere instead of the binned
    # Pallas / approx_min_k kernels (recall ≈0.98) — the reference uses
    # exact kNN throughout (torch_cluster.knn, pyg_randla_net.py:14,180).
    # ~20x slower selection on TPU; meant for checkpoint-parity evaluation
    # (predict.exact_knn) and approximation-sensitivity measurements.
    exact_knn: bool = False
    # Windowed kNN over x-SORTED inputs (positions; 0 = off): requires the
    # SortPointsByX transform upstream (or sort_inputs). Order-preserving
    # decimation keeps every stage sorted, so the window serves all four
    # encoder graphs AND the decoder's k=1 upsampling searches; stages
    # whose key count is within the window fall back to the full scan
    # automatically. Set via predict.sorted_window / Model.set_sorted_window.
    knn_window: int = 0
    # Sort inside the forward (device argsort by x, logits unsorted back):
    # for TRAINING, where host-side sorting would have to chase the random
    # flip/rotation augmentations. The predict pipeline sorts on the host
    # instead (SortPointsByX) and keeps this off — a checkpoint hparam of
    # sort_inputs=true would pay a redundant in-model argsort (identity
    # permutation) per batch. Requires knn_window > 0 to matter.
    sort_inputs: bool = False
    # Fused train-mode LFA kernel routing for the encoder blocks — see
    # DilatedResidualBlock.fused_train_lfa. "auto" (default) engages it
    # at compile-time batch dims ≥ 16 where it measured 1.27x on v5e;
    # True/False force.
    fused_train_lfa: Any = "auto"

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray],   # (B, N, F) or None -> use pos
        pos: jnp.ndarray,           # (B, N, 3)
        mask: jnp.ndarray,          # (B, N) bool
        train: bool = False,
    ) -> jnp.ndarray:
        d_bottleneck = max(32, self.num_classes, self.num_features)
        x = x if x is not None else pos
        x = x.astype(self.dtype)

        inv_order = None
        if self.knn_window and self.sort_inputs:
            # device-side x-sort (pads to the end) for the windowed stage-1
            # kNN; logits are scattered back to input order at the bottom
            sort_key = jnp.where(mask, pos[..., 0], jnp.inf)
            order = jnp.argsort(sort_key, axis=1)
            take = jax.vmap(lambda t, i: t[i])
            x = take(x, order)
            pos = take(pos, order)
            mask = take(mask, order)
            inv_order = jnp.argsort(order, axis=1)

        x = nn.Dense(d_bottleneck, dtype=self.dtype, name="fc0")(x)

        # Encoder: block -> decimate, 4 stages. Stage i state lives at
        # resolution N / decimation**i. Decoder skips follow the reference
        # wiring exactly (``pyg_randla_net.py:58-79``): fp4/fp3/fp2 concat
        # the *decimated* outputs of blocks 3/2/1 (the next block's input),
        # fp1 the pre-decimation ``b1_out`` — FP Dense input widths
        # 512+256, 256+128, 128+32, 32+32.
        widths = (32, 128, 256, 512)
        # arg 0 is the module itself in flax lifted transforms -> `train`
        # (a python bool steering BN/dropout modes) is static arg 4
        block_cls = (
            nn.remat(DilatedResidualBlock, static_argnums=(4,))
            if self.remat else DilatedResidualBlock
        )
        skips = []  # (x, pos, mask): [b1_out@N, b1_dec@N/4, b2_dec@N/16, b3_dec@N/64]
        for i, d_out in enumerate(widths):
            x = block_cls(
                self.num_neighbors, d_out, bn_momentum=self.bn_momentum,
                dtype=self.dtype, exact_knn=self.exact_knn,
                knn_window=self.knn_window,
                fused_train_lfa=self.fused_train_lfa,
                name=f"block{i + 1}",
            )(x, pos, mask, train)
            if i == 0:
                skips.append((x, pos, mask))
            dec_idx, dec_mask = random_decimation(
                self.make_rng("decimation"), mask, self.decimation
            )
            # one [x|pos] gather per stage (gathers are descriptor-bound);
            # only when dtypes agree — pos must stay f32 for later-stage kNN
            take = jax.vmap(lambda t, j: t[j])
            if x.dtype == pos.dtype:
                xp = take(jnp.concatenate([x, pos], axis=-1), dec_idx)
                x, pos = xp[..., :-3], xp[..., -3:]
            else:
                x = take(x, dec_idx)
                pos = take(pos, dec_idx)
            mask = dec_mask
            if i < len(widths) - 1:
                skips.append((x, pos, mask))

        x = SharedMLP([512], bn_momentum=self.bn_momentum, dtype=self.dtype,
                      name="mlp_summit")(
            x, mask, train
        )

        # Decoder: FP modules — k=1 kNN-interpolate up to the skip
        # resolution, concat skip features, SharedMLP
        # (``pyg_randla_net.py:241-253``).
        from myria3d_tpu.ops.pallas_knn import stage_window

        fp_widths = (256, 128, 32, d_bottleneck)
        for j, width in enumerate(fp_widths):
            x_skip, pos_skip, mask_skip = skips[len(skips) - 1 - j]
            x = knn_interpolate(
                x, pos, mask, pos_skip, mask_skip, k=1,
                exact=self.exact_knn,
                # sorted clouds at every stage (order-preserving
                # decimation) let the k=1 search window too — it was the
                # single largest kernel of the 40k predict forward
                # (67 ms of 408, docs/perf_notes.md round 4 cont.);
                # density-scaled by the coarse cloud's key count
                window=stage_window(self.knn_window, pos.shape[1]),
            ).astype(self.dtype)
            x = jnp.concatenate([x, x_skip], axis=-1)
            x = SharedMLP([width], bn_momentum=self.bn_momentum, dtype=self.dtype,
                          name=f"fp{4 - j}")(
                x, mask_skip, train
            )
            pos, mask = pos_skip, mask_skip

        x = SharedMLP(
            [64, 32], dropout=[0.0, 0.5], bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="mlp_classif",
        )(x, mask, train)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc_classif")(
            x.astype(jnp.float32)
        )
        if inv_order is not None:
            logits = jax.vmap(lambda t, i: t[i])(logits, inv_order)
        if self.return_logits:
            return logits
        return jax.nn.log_softmax(logits, axis=-1)
