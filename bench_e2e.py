"""End-to-end 1 km²-tile predict benchmark (the BASELINE.json headline).

Times ``myria3d_tpu.predict.predict`` wall-clock on a synthetic ~17 M-point
1 km² classified Lidar-HD-like tile: LAS read → native window binning →
per-subtile feature engineering + GridSampling (threaded) → device forward +
on-device full-cloud kNN interpolation → overlap merge → LAS write. This is
the number the reference defines (BASELINE.md: production predict on one
1 km² tile), as opposed to ``bench.py``'s device-path-only metric.

Prints ONE JSON line:
  {"metric": "predict_e2e_throughput", "value": Mpts/s, "unit": ...,
   "vs_baseline": x vs the 0.625 Mpts/s/chip north-star share,
   "host_cores": N, "phases": {...seconds...}}

The synthetic tile and the random-init flagship checkpoint are cached under
/tmp so repeat runs time only the pipeline.

Usage: python bench_e2e.py [--points 17000000] [--extent 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _ensure_tile(path: str, n_points: int, extent: float) -> None:
    """Synthesize a classified tile with production GridSampling statistics.

    Spatially-uniform density (the toy generator's fixed-size blobs would
    concentrate >100k points in single subtiles at 1 km scale), emitted as
    ~17 pt/m² = ~4 overlapping flight strips sampling the same surface
    within scan/GPS noise (Lidar HD is >=10 pulses/m² with multi-strip
    overlap): each surface site is returned ~4x with ~2.5 cm jitter, so
    GridSampling(0.25) collapses the cloud to the reference-documented
    ~1/3 (reference docs/source/background/general_design.md:31,42 —
    ~30k raw -> ~12.5k sampled per 50 m subtile). A volumetrically-uniform
    cloud (this benchmark's first generation) defeats that collapse
    entirely and pushed every subtile into the 40k sampled bucket — ~3x
    the device work per raw point of the production distribution."""
    if os.path.isfile(path):
        return
    import numpy as np

    from myria3d_tpu.pctl.io.las import LasHeader, make_wkt_vlr_for_epsg, write_las

    t0 = time.perf_counter()
    rng = np.random.default_rng(7)
    n = n_points
    returns_per_site = 4
    n_sites = -(-n // returns_per_site)
    pts = np.zeros(n, dtype=np.dtype([
        ("X", "<f8"), ("Y", "<f8"), ("Z", "<f8"),
        ("Intensity", "<u2"), ("ReturnNumber", "u1"),
        ("NumberOfReturns", "u1"), ("Classification", "u1"),
        ("GpsTime", "<f8"),
        ("Red", "<u2"), ("Green", "<u2"), ("Blue", "<u2"),
        ("Infrared", "<u2"),
    ]))
    x0, y0 = 862000.0, 6652000.0
    sx = rng.uniform(0, extent, n_sites)
    sy = rng.uniform(0, extent, n_sites)
    cls_s = rng.choice(
        np.array([2, 3, 4, 5, 6, 9, 17, 64, 65], np.uint8),
        n_sites,
        p=[0.45, 0.08, 0.08, 0.14, 0.15, 0.04, 0.015, 0.005, 0.04],
    )
    z_s = rng.uniform(0.0, 2.0, n_sites)
    z_s = np.where(np.isin(cls_s, [3, 4, 5]),
                   rng.uniform(0.5, 15.0, n_sites), z_s)
    z_s = np.where(cls_s == 6, rng.uniform(3.0, 12.0, n_sites), z_s)
    z_s = np.where(cls_s == 9, rng.uniform(-0.2, 0.0, n_sites), z_s)
    z_s = np.where(cls_s == 64, rng.uniform(0.0, 25.0, n_sites), z_s)
    rep = np.repeat(np.arange(n_sites), returns_per_site)[:n]
    pts["X"] = sx[rep] + x0 + rng.normal(0.0, 0.025, n)
    pts["Y"] = sy[rep] + y0 + rng.normal(0.0, 0.025, n)
    pts["Z"] = z_s[rep] + rng.normal(0.0, 0.025, n)
    cls = cls_s[rep]
    pts["Classification"] = cls
    pts["Intensity"] = rng.integers(0, 4000, n)
    nr = rng.integers(1, 4, n).astype(np.uint8)
    pts["NumberOfReturns"] = nr
    pts["ReturnNumber"] = np.minimum(rng.integers(1, 4, n), nr)
    rgb = rng.integers(5_000, 40_000, (n, 4))
    pts["Red"], pts["Green"] = rgb[:, 0], rgb[:, 1]
    pts["Blue"], pts["Infrared"] = rgb[:, 2], rgb[:, 3]
    header = LasHeader(
        version=(1, 4), point_format=8,
        scales=(0.01, 0.01, 0.01), offsets=(x0, y0, 0.0),
    )
    header.vlrs.append(make_wkt_vlr_for_epsg(2154))
    write_las(path, pts, header)
    print(f"# synthesized {n_points / 1e6:.1f} Mpt tile in "
          f"{time.perf_counter() - t0:.1f}s: {path}")


def _ensure_ckpt(ckpt_dir: str, config) -> None:
    if os.path.isdir(ckpt_dir) and os.path.isfile(
        os.path.join(ckpt_dir, "hparams.yaml")
    ):
        return
    import jax
    import numpy as np

    from myria3d_tpu.utils.config import _to_plain, instantiate

    model = instantiate(config["model"])
    model.raw_hparams = _to_plain(dict(config["model"]))
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.uniform(0, 1, (2, 512, model.d_in)).astype(np.float32),
        "pos": rng.uniform(-25, 25, (2, 512, 3)).astype(np.float32),
        "y": np.zeros((2, 512), np.int32),
        "mask": np.ones((2, 512), bool),
    }
    state = model.init_state(jax.random.PRNGKey(0), batch)
    model.save_checkpoint(ckpt_dir, state, save_opt_state=False)
    print(f"# saved random-init flagship checkpoint: {ckpt_dir}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=17_000_000)
    ap.add_argument("--extent", type=float, default=1000.0)
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args()

    from myria3d_tpu.utils.config import compose

    # v2: strip-overlap clustered generator (production GridSampling stats)
    tile = f"/tmp/myria3d_e2e_v2_{args.points // 1_000_000}M_{int(args.extent)}m.las"
    ckpt = "/tmp/myria3d_e2e_ckpt"
    out_dir = "/tmp/myria3d_e2e_out"

    _ensure_tile(tile, args.points, args.extent)

    config = compose(
        config_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs"),
        overrides=[
            "task.task_name=predict",
            f"predict.src_las={tile}",
            f"predict.ckpt_path={ckpt}",
            f"predict.output_dir={out_dir}",
            f"datamodule.epsg=2154",
            f"datamodule.batch_size={args.batch_size}",
            f"datamodule.tile_width={int(args.extent)}",
        ],
    )
    _ensure_ckpt(ckpt, config)

    # phase probe: host prep alone (read + binning), measured on the same
    # tile so the JSON carries a host/device attribution
    from myria3d_tpu.pctl.dataset.utils import (
        read_las_array_as_float32,
        split_cloud_into_samples,
    )

    t0 = time.perf_counter()
    pts, _ = read_las_array_as_float32(tile, "2154")
    t_read = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_binned = 0
    for idx, _sub in split_cloud_into_samples(
        tile, args.extent, 50, "2154", 0, points=pts
    ):
        n_binned += len(idx)
    t_bin = time.perf_counter() - t0
    del pts

    from myria3d_tpu.predict import predict

    predict_phases: dict = {}
    t0 = time.perf_counter()
    out_path = predict(config, phases=predict_phases)
    t_total = time.perf_counter() - t0
    assert out_path and os.path.isfile(out_path)

    mpts = args.points / 1e6 / t_total
    baseline_per_chip = 5.0 / 8.0
    phases = {
        "total_s": round(t_total, 1),
        "las_read_probe_s": round(t_read, 1),
        "window_binning_probe_s": round(t_bin, 1),
        # predict()'s own wall-clock attribution: tile_read_s (single read,
        # shared by stream/merge/write), streaming_s (host cook + H2D +
        # device + D2H + incremental overlap merge, pipelined),
        # fetch_blocked_s (D2H logits transfer — tunnel-dominated here,
        # ~negligible on PCIe), merge_s (host scatter-merge),
        # finalize_write_s.
        **predict_phases,
    }
    # v5e-8 host projection (see docs/perf_notes.md "e2e projection"):
    # the per-batch device+H2D work splits over 8 chips via the
    # data-parallel predict path (linear, MULTICHIP-dryrun-validated);
    # the D2H fetch term is excluded (tunnel artifact — PCIe moves the
    # f16 logits at GB/s); the host scatter-merge stays serial, as do
    # read and finalize (conservative: both are thread-parallelizable).
    proj_s = (
        phases.get("tile_read_s", t_read)
        + max(
            (phases.get("streaming_s", t_total)
             - phases.get("fetch_blocked_s", 0.0)
             - phases.get("merge_s", 0.0)) / 8.0,
            phases.get("merge_s", 0.0),
        )
        + phases.get("finalize_write_s", 0.0)
    )
    print(json.dumps({
        "metric": "predict_e2e_throughput",
        "value": round(mpts, 3),
        "unit": "Mpts/s/chip",
        "vs_baseline": round(mpts / baseline_per_chip, 3),
        "host_cores": os.cpu_count(),
        "phases": phases,
        "v5e8_projection_mpts_s": round(args.points / 1e6 / proj_s, 2),
    }))


if __name__ == "__main__":
    main()
