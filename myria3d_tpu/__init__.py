"""myria3d_tpu — TPU-native aerial LiDAR semantic segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of IGNF/myria3d
(reference mounted at /root/reference): multiclass semantic segmentation of
large-scale aerial LiDAR point clouds (French Lidar HD).

Layer map (TPU-first re-design of reference SURVEY.md §1):

- ``pctl``     host-side point-cloud data layer: LAS I/O, tiling, feature
               engineering, transforms, HDF5 cache, padded fixed-shape batching.
- ``ops``      device kernels: masked kNN, kNN-interpolation, random
               decimation, masked normalization — XLA + Pallas TPU paths.
- ``models``   Flax neural nets (RandLA-Net, PointNet++), task-level model,
               full-cloud Interpolator, checkpoint I/O.
- ``parallel`` jax.sharding Mesh / pjit data-parallel training over TPU chips.
- ``train`` / ``predict``  orchestration pipelines behind the run.py CLI.
"""

from myria3d_tpu._version import __version__  # noqa: F401
