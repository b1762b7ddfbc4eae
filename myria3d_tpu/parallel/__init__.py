"""parallel — device-mesh scale-out (data-parallel pjit, sharded IO).

TPU-native replacement for the reference's Lightning DDP/NCCL strategy
strings (``configs/experiment/RandLaNet_base_run_FR-2x3GPUs.yaml:13-18``,
SURVEY.md §5.8): a ``jax.sharding.Mesh`` over chips, batches sharded on the
``data`` axis, parameters replicated, gradient all-reduce inserted by the
XLA partitioner (rides ICI, not host networking).
"""

from myria3d_tpu.parallel.mesh import (  # noqa: F401
    ParallelSteps,
    auto_parallel,
    make_mesh,
    replicate_to_mesh,
    shard_batch,
    sharded_eval_step,
    sharded_interp_step,
    sharded_train_step,
)
