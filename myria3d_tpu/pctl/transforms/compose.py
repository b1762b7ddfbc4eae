"""None-propagating transform composition (reference ``pctl/transforms/compose.py:6-28``)."""

from typing import Callable, List


class CustomCompose:
    """Composes transforms; short-circuits to ``None`` if any transform
    empties the sample or returns ``None``."""

    def __init__(self, transforms: List[Callable]):
        self.transforms = transforms

    def __call__(self, data):
        for transform in self.transforms:
            if isinstance(data, (list, tuple)):
                data = [transform(d) for d in data]
                data = [d for d in data if d is not None and d["pos"].shape[0] != 0]
                if len(data) == 0:
                    return None
            else:
                data = transform(data)
                if data is None or data["pos"].shape[0] == 0:
                    return None
        return data
