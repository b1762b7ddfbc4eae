"""Masked exact/approx k-nearest-neighbors over fixed-shape padded batches.

Replaces ``torch_cluster.knn`` / ``torch_geometric.nn.pool.knn_graph``
(invoked per encoder stage in reference ``pyg_randla_net.py:180``) with a
dense XLA formulation tuned for the TPU:

- squared distances via the MXU identity ||q-p||^2 = |q|^2 + |p|^2 - 2 q·p^T;
- **pad masking baked into the coordinates**: keys get a 4th coordinate
  w = 0 (valid) / 1e4 (pad), adding w^2 = 1e8 to every pad distance — far
  beyond any real subtile distance (<= 7.5e3 m^2) — so no elementwise
  ``where`` touches the (Nq, Nk) matrix and XLA can fuse distance
  computation straight into the top-k reduction;
- selection routes to the fused Pallas binned-top-k kernel on TPU
  (``ops/pallas_knn.py`` — distances never leave VMEM; required at the
  40k MaximumNumNodes predict shape where a dense (B, Nq, Nk) tensor no
  longer fits), falling back to ``jax.lax.approx_min_k`` — the TPU
  PartialReduce unit, ~25x faster than sort-based ``lax.top_k`` at N≈12k —
  when the kernel is unavailable (CPU, tiny key sets, GSPMD-partitioned
  meshes outside shard_map). Both share the same binned-approximation
  semantics (measured recall ≈ 0.98–0.99). On CPU approx_min_k lowers to
  an exact sort, so host-side tests stay bit-exact. ``exact=True`` forces
  ``lax.top_k`` everywhere;
- query chunking bounds the materialized distance tile when batch x Nq x Nk
  would blow past HBM budget.

Returned neighbor lists are *gather-based* ``(B, N, K)`` index tensors — no
ragged edge lists — which make downstream LocSE/attention dense
``(B, N, K, C)`` ops (SURVEY.md §2.2 row 1).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Pad keys live 1e4 "meters" away along a 4th axis: d2 offset 1e8.
_PAD_W = 1e4
_PAD_D2 = _PAD_W * _PAD_W
_VALID_THRESH = 0.25 * _PAD_D2

# Max elements of the materialized (B, chunk, Nk) distance tile (f32).
_ELEM_BUDGET = 1_500_000_000


def _augment_keys(kpos: jnp.ndarray, kvalid: jnp.ndarray) -> jnp.ndarray:
    """(..., Nk, 3) -> (..., Nk, 4) with the pad-offset coordinate."""
    w = jnp.where(kvalid, 0.0, _PAD_W).astype(kpos.dtype)[..., None]
    return jnp.concatenate([kpos, w], axis=-1)


def _augment_queries(qpos: jnp.ndarray) -> jnp.ndarray:
    zero = jnp.zeros(qpos.shape[:-1] + (1,), qpos.dtype)
    return jnp.concatenate([qpos, zero], axis=-1)


def _knn_single(
    q4: jnp.ndarray,   # (Nq, 4)
    k4: jnp.ndarray,   # (Nk, 4)
    k: int,
    exact: bool,
    recall_target: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # f32 precision matters: bf16 matmul error (~1e-2 relative on 625 m^2
    # norms) would misrank close neighbors; the contraction dim is 4 so
    # HIGHEST costs nothing.
    q_norm2 = jnp.sum(q4 * q4, axis=-1, keepdims=True)            # (Nq, 1)
    k_norm2 = jnp.sum(k4 * k4, axis=-1)                            # (Nk,)
    d2 = q_norm2 + k_norm2[None, :] - 2.0 * jnp.dot(
        q4, k4.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if exact:
        neg_d, idx = jax.lax.top_k(-d2, k)
        dist = -neg_d
    else:
        dist, idx = jax.lax.approx_min_k(d2, k, recall_target=recall_target)
    return idx.astype(jnp.int32), jnp.maximum(dist, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("k", "exact", "recall_target", "window", "exact_d2"),
)
def knn(
    query_pos: jnp.ndarray,    # (B, Nq, 3)
    key_pos: jnp.ndarray,      # (B, Nk, 3)
    key_mask: jnp.ndarray,     # (B, Nk) bool
    k: int,
    query_mask: Optional[jnp.ndarray] = None,  # (B, Nq) bool
    exact: bool = False,
    recall_target: float = 0.95,
    window: int = 0,
    exact_d2: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked kNN from queries into keys, per batch element.

    ``window > 0`` asserts both clouds are x-SORTED (valid prefix
    ascending in x — apply ``pctl.transforms.SortPointsByX`` upstream) and
    lets the Pallas kernel scan only ~``window`` sorted key positions per
    query tile (docs/perf_notes.md round 4: ≥99.97 % neighbor capture at
    window 4608 on the 40k shape, ~9x less distance work). Ignored on the
    non-Pallas fallback and under ``exact=True``.

    ``exact_d2=True`` keeps full-f32 ``dist2`` on the windowed Pallas path
    (classic two-reduction extraction) for callers that derive WEIGHTS from
    the distances (the two-op exact interpolation). The default packed
    extraction truncates returned distances to 2^-11 relative (selection
    quantization far inside the binned recall envelope) for ~1.3x kernel
    speed (docs/perf_notes.md round 5).

    Returns:
        idx:   (B, Nq, K) int32 neighbor indices into the key axis
        dist2: (B, Nq, K) float32 squared distances (ascending)
        neigh_valid: (B, Nq, K) bool — False for slots that fell on pad keys
            (possible when a cloud has fewer than K valid points) or for
            invalid queries.
    """
    b, nq, _ = query_pos.shape
    nk = key_pos.shape[1]
    # Fewer key slots than K (deeply decimated stages): compute the kNN that
    # exists and pad the neighbor axis with invalid slots, mirroring
    # torch_cluster.knn returning < k edges for tiny clouds.
    k_eff = min(k, nk)

    # Center per cloud before the norm expansion: absolute georeferenced
    # inputs (Lambert-93, |Y| ~ 6.6e6 m) carry |p|^2 ~ 4e13 m^2, so the
    # f32 expansion loses ~2^22 m^2 of mantissa — larger than any true
    # subtile distance — and neighbor ranking becomes noise. Subtracting a
    # shared per-cloud offset leaves true differences unchanged and keeps
    # every term small.
    cnt = jnp.maximum(jnp.sum(key_mask, axis=1), 1)
    offset = (
        jnp.sum(jnp.where(key_mask[..., None], key_pos, 0.0), axis=1)
        / cnt[..., None].astype(key_pos.dtype)
    )[:, None, :]
    query_pos = query_pos - offset
    key_pos = key_pos - offset

    q4 = _augment_queries(query_pos)
    k4 = _augment_keys(key_pos, key_mask)

    if not exact:
        # Fused Pallas path: distances never touch HBM; same binned-top-k
        # approximation (and measured recall) as approx_min_k.
        from myria3d_tpu.ops.pallas_knn import (
            knn_pallas_available,
            knn_topk_pallas,
        )

        if knn_pallas_available(k_eff, nk):
            idx, d2 = knn_topk_pallas(
                q4, k4, k_eff, window=window, query_mask=query_mask,
                packed=not exact_d2,
            )
            return _finalize(idx, d2, k, k_eff, query_mask)

    single = functools.partial(
        _knn_single, k=k_eff, exact=exact, recall_target=recall_target
    )

    if b * nq * nk <= _ELEM_BUDGET:
        idx, d2 = jax.vmap(single)(q4, k4)
    else:
        # chunk the query axis; each sequential step stays under budget
        chunk = nq
        while b * chunk * nk > _ELEM_BUDGET and chunk % 2 == 0:
            chunk //= 2
        if chunk == nq:
            idx, d2 = jax.vmap(single)(q4, k4)
        else:
            n_chunks = nq // chunk

            def per_cloud(args):
                q4b, k4b = args
                qc = q4b.reshape(n_chunks, chunk, 4)
                i, d = jax.lax.map(lambda qq: single(qq, k4b), qc)
                return i.reshape(nq, k_eff), d.reshape(nq, k_eff)

            idx, d2 = jax.vmap(lambda qb, kb: per_cloud((qb, kb)))(q4, k4)

    return _finalize(idx, d2, k, k_eff, query_mask)


def _finalize(
    idx: jnp.ndarray,
    d2: jnp.ndarray,
    k: int,
    k_eff: int,
    query_mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    if k_eff < k:
        pad = ((0, 0), (0, 0), (0, k - k_eff))
        idx = jnp.pad(idx, pad)
        d2 = jnp.pad(d2, pad, constant_values=_PAD_D2)

    neigh_valid = d2 < _VALID_THRESH
    if query_mask is not None:
        neigh_valid = neigh_valid & query_mask[..., None]
    idx = jnp.where(neigh_valid, idx, 0)  # clamp pad slots to a safe index
    return idx, d2, neigh_valid


def knn_graph(
    pos: jnp.ndarray, mask: jnp.ndarray, k: int, exact: bool = False,
    window: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Self-kNN graph with self-loops (reference ``knn_graph(..., loop=True)``,
    ``pyg_randla_net.py:180``): each valid point's K nearest valid points,
    itself included (distance 0 sorts first)."""
    return knn(pos, pos, mask, k, query_mask=mask, exact=exact, window=window)


def ball_query(
    query_pos: jnp.ndarray,    # (B, M, 3) centroids
    key_pos: jnp.ndarray,      # (B, N, 3)
    key_mask: jnp.ndarray,     # (B, N) bool
    k: int,
    radius: float,
    query_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Up to K nearest valid neighbors within ``radius`` of each centroid
    (PointNet++ grouping). Unlike the CUDA convention of "first K found in
    scan order", this returns the K *nearest* within the ball — a strictly
    better-defined neighborhood with identical cost on TPU (kNN + radius
    filter on the (B, M, K) result)."""
    idx, d2, neigh_valid = knn(query_pos, key_pos, key_mask, k, query_mask)
    neigh_valid = neigh_valid & (d2 <= radius * radius)
    idx = jnp.where(neigh_valid, idx, 0)
    return idx, d2, neigh_valid


def gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-neighbor features: x (B, N, C), idx (B, Nq, K) → (B, Nq, K, C)."""
    return jax.vmap(lambda xb, ib: xb[ib])(x, idx)
