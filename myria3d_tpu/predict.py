"""Sliding-window inference pipeline — reference ``myria3d/predict.py:21-73``.

``predict(config) -> str``: loads the checkpoint, streams padded subtile
batches from one LAS through the jitted forward + on-device full-cloud
kNN-interpolation (``Model.interp_step``), accumulates logits in the
``Interpolator``, and writes the output LAS with predicted classification /
per-class probabilities / entropy dimensions.
"""

from __future__ import annotations

from typing import Optional

import jax

from myria3d_tpu.models.model import Model
from myria3d_tpu.pctl.batching import pad_full_cloud, pad_sampled_pos
from myria3d_tpu.utils import utils
from myria3d_tpu.utils.config import instantiate

log = utils.get_logger(__name__)


@utils.eval_time
def predict(config, phases: Optional[dict] = None, preread=None) -> Optional[str]:
    """Predict on a single LAS file and return the output path.

    ``phases``, when given, is filled with wall-clock phase timings
    (tile read, streaming, fetch-blocked share, merge+write) — the
    machine-readable attribution behind ``bench_e2e.py``'s phase table.

    ``preread`` optionally hands over the tile's ``(points, header)`` — or
    a Future resolving to it — read ahead by the caller while the previous
    tile was streaming (``run.py``'s corpus loop overlaps tile i+1's read
    under tile i's device work); the recorded ``tile read`` phase is then
    only the residual wait.
    """
    import time

    src_las = config["predict"]["src_las"]
    output_dir = config["predict"]["output_dir"]
    ckpt_path = config["predict"]["ckpt_path"]

    # Read the tile exactly ONCE, at its original dtypes: the inference
    # stream crops/cooks from the in-memory array, the Interpolator merges
    # into a preallocated plane sized by its point count, and the output
    # ferry reuses the same records (the reference reads the tile twice —
    # once in the InferenceDataset, once in the PDAL update pipeline,
    # ``myria3d/models/interpolation.py:139,176``).
    from myria3d_tpu.pctl.dataset.utils import read_las_array

    t_read0 = time.perf_counter()
    if preread is not None:
        result = preread.result() if hasattr(preread, "result") else preread
        tile_points, tile_header = result
    else:
        tile_points, tile_header = read_las_array(
            src_las, config["datamodule"].get("epsg")
        )
    t_read = time.perf_counter() - t_read0

    datamodule = instantiate(config["datamodule"])

    # predict.sorted_window > 0: windowed kNN over x-sorted subtiles.
    # The sort transform and the kernel window are enabled TOGETHER here so
    # they can never drift apart (an unsorted cloud with a window would
    # silently select wrong neighbors).
    sorted_window = int(config["predict"].get("sorted_window", 0) or 0)
    if sorted_window > 0:
        from myria3d_tpu.pctl.transforms.transforms import SortPointsByX

        datamodule._stages["predict"] = list(
            datamodule._stages["predict"]
        ) + [SortPointsByX()]

    datamodule._set_predict_data(src_las, points=tile_points)

    model, state = Model.load_from_checkpoint(ckpt_path)
    if sorted_window > 0:
        model.set_sorted_window(sorted_window)
    rng = jax.random.PRNGKey(int(config.get("seed", 12345)))

    # data-parallel inference when several chips are visible
    from myria3d_tpu.parallel import auto_parallel

    par = auto_parallel(model, datamodule.batch_size)
    # exact_interpolation=true keeps the f32 two-op interpolation instead
    # of the bf16 MXU-recombine kernel (checkpoint-parity evaluation);
    # exact_knn=true additionally forces exact lax.top_k neighbor search
    # in the forward's encoder/decoder and the interpolation (reference
    # parity: torch_cluster.knn is exact, pyg_randla_net.py:14,180)
    exact = bool(config["predict"].get("exact_interpolation", False))
    if bool(config["predict"].get("exact_knn", False)):
        model.set_exact_knn(True)
    # compute_dtype="bfloat16": bf16 forward compute (params/logits stay
    # f32) — throughput option, mutually sensible with the approx kernels;
    # decision sensitivity quantified in EXACTNESS_r04.json.
    compute_dtype = config["predict"].get("compute_dtype")
    if compute_dtype:
        model.set_compute_dtype(compute_dtype)
    if par is not None:
        interp_fn = par.exact_interp_step if exact else par.interp_step
    else:
        interp_fn = model.exact_interp_step if exact else model.interp_step
    if par is not None:
        state = par.place_state(state)
        log.info(f"Predicting data-parallel over {par.mesh.devices.size} devices")

    itp = instantiate(config["predict"]["interpolator"])
    itp.prepare(len(tile_points), points=tile_points, header=tile_header)

    from collections import deque

    from myria3d_tpu.pctl.loader import BackgroundIterator

    # Two overlaps: BackgroundIterator runs host-side subtile prep/collate
    # ahead of the loop, and a depth-2 pending queue defers each batch's
    # logits fetch until the NEXT batch's step has been dispatched — jax
    # dispatch is async, so batch i's device compute + D2H run while the
    # host uploads and dispatches batch i+1 (the reference streams batches
    # through Lightning's predict loop, which fetches synchronously).
    # The overlap MERGE also happens here: store_predictions scatter-adds
    # straight into the prepared (nb_points, C) plane, so the former
    # merge tail is amortized into the streaming loop.
    import numpy as np

    t_stream0 = time.perf_counter()
    t_fetch = 0.0
    t_merge = 0.0
    pending = deque()
    n_batches = 0

    def _drain(itp):
        nonlocal t_fetch, t_merge
        logits_dev, idx = pending.popleft()
        t0 = time.perf_counter()
        logits_host = np.asarray(logits_dev)  # D2H fetch (tunnel/PCIe)
        t1 = time.perf_counter()
        itp.store_predictions(logits_host, idx)  # host scatter-merge
        t2 = time.perf_counter()
        t_fetch += t1 - t0
        t_merge += t2 - t1
    for batch in BackgroundIterator(datamodule.predict_dataloader(), max_prefetch=2):
        if batch is None:
            continue
        full = pad_full_cloud(batch.copies)
        sampled_pos = pad_sampled_pos(batch.copies, batch.num_points)
        if full is None or sampled_pos is None:
            log.warning("Batch without full-cloud copies; skipping.")
            continue
        arrays = batch.device_arrays()
        arrays.update(
            {"sampled_pos": sampled_pos, "full_pos": full["full_pos"],
             "full_mask": full["full_mask"]}
        )
        if par is not None:
            arrays = par.place_batch(arrays)
        full_logits = interp_fn(
            state, arrays["x"], arrays["pos"], arrays["mask"],
            arrays["sampled_pos"], arrays["full_pos"],
            arrays["full_mask"], rng,
        )
        pending.append((full_logits, batch.idx_in_original_cloud))
        n_batches += 1
        if len(pending) > 1:
            _drain(itp)
    while pending:
        _drain(itp)
    t_stream = time.perf_counter() - t_stream0

    t_reduce0 = time.perf_counter()
    out_path = itp.reduce_predictions_and_save(
        src_las, output_dir, config["datamodule"].get("epsg")
    )
    t_reduce = time.perf_counter() - t_reduce0
    log.info(
        f"predict phases: tile read {t_read:.1f}s; streaming {t_stream:.1f}s "
        f"over {n_batches} batches ({t_stream / max(n_batches, 1):.2f}s/batch "
        f"incl. host prep + H2D + device + D2H + overlap merge, of which "
        f"{t_fetch:.1f}s blocked on the D2H logits fetch and {t_merge:.1f}s "
        f"on the host scatter-merge), finalize+write {t_reduce:.1f}s"
    )
    if phases is not None:
        phases.update(
            tile_read_s=round(t_read, 2),
            streaming_s=round(t_stream, 2),
            fetch_blocked_s=round(t_fetch, 2),
            merge_s=round(t_merge, 2),
            n_batches=n_batches,
            finalize_write_s=round(t_reduce, 2),
        )
        phases.update(
            {"finalize_" + k: v
             for k, v in getattr(itp, "finalize_phases", {}).items()}
        )
    return out_path
