"""ops — device kernels for masked fixed-shape point-cloud batches.

TPU-native equivalents of the reference's third-party CUDA kernels
(SURVEY.md §2.2): masked kNN (replaces torch_cluster.knn / knn_graph),
kNN-interpolation (torch_geometric knn_interpolate), random decimation with
static shapes (per-cloud randperm subsampling), and masked softmax/segment
helpers (torch_scatter / scatter softmax).
"""

from myria3d_tpu.ops.knn import ball_query, knn, knn_graph  # noqa: F401
from myria3d_tpu.ops.interpolate import knn_interpolate  # noqa: F401
from myria3d_tpu.ops.sampling import random_decimation  # noqa: F401
from myria3d_tpu.ops.fps import farthest_point_sampling  # noqa: F401
from myria3d_tpu.ops.masked import (  # noqa: F401
    masked_mean,
    masked_softmax,
    masked_var,
)
