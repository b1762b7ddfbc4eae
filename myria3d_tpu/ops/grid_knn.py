"""Grid-binned masked kNN — the high-throughput path for large clouds.

The dense kNN (``ops/knn.py``) computes all Nq x Nk distances; at production
Lidar HD sizes (12k sampled points per 50 m subtile) that is ~20x more
distance work than needed, because real neighbors are spatially local. This
kernel bins keys into a static GxG 2-D grid over the cloud's XY bounding
box (aerial scans are height-thin), caps each cell at ``c_max`` points, and
searches only the ``window x window`` cell neighborhood of each query:

    candidates per query = window² * c_max   (e.g. 3²*64 = 576 « 12288)

All shapes are static: binning is a sort by cell id + rank-in-cell scatter
into a dense ``(G²+1, c_max)`` table (row G² holds pads/overflow). Cell
capacity overflow drops the farthest-scan-order extras — with c_max ≈ 4x
the mean occupancy this is vanishingly rare on aerial scans; dropped points
can only cost recall, never produce invalid neighbors.

This replaces the reference's ``torch_cluster.knn`` C++/CUDA spatial search
(reference ``pyg_randla_net.py:180``) with an XLA-native formulation whose
hot ops are one small sort, gathers, and a fused distance + top-k over the
candidate axis.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from myria3d_tpu.ops.knn import _PAD_D2, _VALID_THRESH

_BIG = jnp.float32(_PAD_D2)


def auto_grid_params(nk: int) -> Tuple[int, int]:
    """(G, c_max): ~24 expected keys/cell, 4x capacity headroom."""
    g = int(max(4, min(64, round((nk / 24.0) ** 0.5))))
    c_max = 96 if nk >= 8192 else 64
    return g, c_max


def _bin_points(
    xy_cid: jnp.ndarray,  # (N,) cell ids, g*g for pads
    n_cells: int,
    cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense (n_cells+1, cap) table of point indices via sort + rank-in-cell.
    Row n_cells holds pads/overflow and is marked invalid."""
    n = xy_cid.shape[0]
    order = jnp.argsort(xy_cid)
    sorted_cid = xy_cid[order]
    first = jnp.searchsorted(sorted_cid, sorted_cid, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    keep = rank < cap
    flat = jnp.where(keep, sorted_cid * cap + rank, n_cells * cap)
    table = jnp.zeros((n_cells + 1) * cap, jnp.int32).at[flat].set(
        order.astype(jnp.int32), mode="drop"
    ).reshape(n_cells + 1, cap)
    valid = jnp.zeros((n_cells + 1) * cap, bool).at[flat].set(
        True, mode="drop"
    ).reshape(n_cells + 1, cap)
    valid = valid.at[n_cells].set(False)
    return table, valid


def _grid_knn_single(
    qpos: jnp.ndarray,   # (Nq, 3)
    kpos: jnp.ndarray,   # (Nk, 3)
    kvalid: jnp.ndarray, # (Nk,)
    k: int,
    g: int,
    c_max: int,
    q_max: int,
    window: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cell-blocked search: queries binned like keys, so each cell's query
    block shares one gathered candidate block and the distance computation
    is a dense (q_max, W²·c_max) broadcast — no per-query gathers."""
    nq = qpos.shape[0]
    nk = kpos.shape[0]
    n_cells = g * g
    # XY bounding box over valid keys
    big = jnp.float32(3e38)
    kxy = kpos[:, :2]
    lo = jnp.min(jnp.where(kvalid[:, None], kxy, big), axis=0)
    hi = jnp.max(jnp.where(kvalid[:, None], kxy, -big), axis=0)
    extent = jnp.maximum(hi - lo, 1e-6)

    def cell_of(xy):
        c = jnp.floor((xy - lo) / extent * g).astype(jnp.int32)
        return jnp.clip(c, 0, g - 1)

    kc = cell_of(kxy)
    kcid = jnp.where(kvalid, kc[:, 1] * g + kc[:, 0], n_cells)
    ktable, ktable_valid = _bin_points(kcid, n_cells, c_max)

    qc = cell_of(qpos[:, :2])
    qcid = qc[:, 1] * g + qc[:, 0]       # every query slot gets a result
    qtable, qtable_valid = _bin_points(qcid, n_cells, q_max)
    qtable = qtable[:n_cells]            # (G², q_max)
    qtable_valid = qtable_valid[:n_cells]

    # per-cell candidate window: (G², W²) neighbor cells
    r = window // 2
    offs = jnp.arange(-r, r + 1, dtype=jnp.int32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    ox, oy = ox.reshape(-1), oy.reshape(-1)
    cell_ids = jnp.arange(n_cells, dtype=jnp.int32)
    ccx, ccy = cell_ids % g, cell_ids // g
    wx = ccx[:, None] + ox[None, :]
    wy = ccy[:, None] + oy[None, :]
    in_b = (wx >= 0) & (wx < g) & (wy >= 0) & (wy < g)
    wcells = jnp.where(in_b, wy * g + wx, n_cells)       # (G², W²)

    cand_idx = ktable[wcells].reshape(n_cells, -1)       # (G², W²·c_max)
    cand_ok = ktable_valid[wcells].reshape(n_cells, -1)

    # block coordinates as batched matmul: (G², q_max, 3) x (G², 3, C) so
    # XLA can fuse distance + top-k like the dense path (component-wise
    # gathers avoid the 3->128 lane padding of a trailing coord axis)
    kcomps = jnp.stack([kpos[:, c][cand_idx] for c in range(3)], axis=1)
    # kcomps: (G², 3, C)
    qcomps = jnp.stack([qpos[:, c][qtable] for c in range(3)], axis=2)
    # qcomps: (G², q_max, 3)
    cross = jax.lax.dot_general(
        qcomps, kcomps,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                     # (G², q_max, C)
    qn = jnp.sum(qcomps * qcomps, axis=2)                 # (G², q_max)
    kn = jnp.sum(kcomps * kcomps, axis=1)                 # (G², C)
    kn = jnp.where(cand_ok, kn, _BIG)                     # mask via norm
    d2 = qn[:, :, None] + kn[:, None, :] - 2.0 * cross

    flat_d2 = d2.reshape(n_cells * q_max, -1)
    if flat_d2.shape[1] > 4 * k:
        dist, slot = jax.lax.approx_min_k(flat_d2, k, recall_target=0.95)
    else:
        neg, slot = jax.lax.top_k(-flat_d2, k)
        dist = -neg
    idx_blocks = jnp.take_along_axis(
        jnp.broadcast_to(
            cand_idx[:, None, :], (n_cells, q_max, cand_idx.shape[1])
        ),
        slot.reshape(n_cells, q_max, k),
        axis=2,
    ).reshape(n_cells * q_max, k)

    # scatter block rows back to original query order (dropped-overflow
    # queries keep BIG distances -> all-invalid neighborhoods)
    qflat = jnp.where(
        qtable_valid.reshape(-1), qtable.reshape(-1), nq
    )
    out_idx = jnp.zeros((nq + 1, k), jnp.int32).at[qflat].set(
        idx_blocks, mode="drop"
    )[:nq]
    out_d2 = jnp.full((nq + 1, k), _BIG, jnp.float32).at[qflat].set(
        jnp.maximum(dist, 0.0), mode="drop"
    )[:nq]
    return out_idx, out_d2


@functools.partial(
    jax.jit, static_argnames=("k", "g", "c_max", "q_max", "window")
)
def grid_knn(
    query_pos: jnp.ndarray,    # (B, Nq, 3)
    key_pos: jnp.ndarray,      # (B, Nk, 3)
    key_mask: jnp.ndarray,     # (B, Nk) bool
    k: int,
    query_mask: Optional[jnp.ndarray] = None,
    g: Optional[int] = None,
    c_max: Optional[int] = None,
    q_max: Optional[int] = None,
    window: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Grid-binned kNN with the same contract as ``ops.knn.knn``."""
    b, nq = query_pos.shape[:2]
    nk = key_pos.shape[1]
    if g is None or c_max is None:
        g_auto, c_auto = auto_grid_params(nk)
        g = g or g_auto
        c_max = c_max or c_auto
    if q_max is None:
        mean_q = nq / float(g * g)
        q_max = int(max(16, -(-4 * mean_q // 8) * 8))   # 4x mean, mult of 8

    single = functools.partial(
        _grid_knn_single, k=k, g=g, c_max=c_max, q_max=q_max, window=window
    )
    # d2 blocks are (G², q_max, W²·c_max) f32 per cloud; map over the batch
    # when the whole-batch materialization would exceed the HBM budget.
    block_elems = b * g * g * q_max * window * window * c_max
    if block_elems <= 1_000_000_000:
        idx, d2 = jax.vmap(single)(query_pos, key_pos, key_mask)
    else:
        idx, d2 = jax.lax.map(
            lambda args: single(*args), (query_pos, key_pos, key_mask)
        )

    neigh_valid = d2 < _VALID_THRESH
    if query_mask is not None:
        neigh_valid = neigh_valid & query_mask[..., None]
    idx = jnp.where(neigh_valid, idx, 0)
    return idx, d2, neigh_valid
