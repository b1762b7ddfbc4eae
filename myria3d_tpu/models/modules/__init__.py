"""Neural-net zoo — reference ``myria3d/models/model.py:12-29``.

``MODEL_ZOO`` + substring-matched factory ``get_neural_net_class`` preserve
the reference's extension point for architecture swaps.
"""

from myria3d_tpu.models.modules.pointnet2 import PointNet2  # noqa: F401
from myria3d_tpu.models.modules.randla_net import RandLANet  # noqa: F401

MODEL_ZOO = [RandLANet, PointNet2]


def get_neural_net_class(class_name: str):
    """Find a neural-net class by (sub)name — reference ``model.py:15-29``."""
    for neural_net_class in MODEL_ZOO:
        if class_name in neural_net_class.__name__:
            return neural_net_class
    raise KeyError(f"Unknown class name {class_name}")
