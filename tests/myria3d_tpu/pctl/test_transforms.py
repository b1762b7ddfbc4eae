"""Transform unit + edge-case tests (model: reference tests/myria3d/pctl/transforms/test_transforms.py)."""

import numpy as np
import pytest

from myria3d_tpu.pctl.transforms.compose import CustomCompose
from myria3d_tpu.pctl.transforms.transforms import (
    Center,
    CopyFullPos,
    CopySampledPos,
    DropPointsByClass,
    GridSampling,
    MaximumNumNodes,
    MinimumNumNodes,
    NormalizePos,
    NullifyLowestZ,
    StandardizeRGBAndIntensity,
    TargetTransform,
    subsample_data,
)

CLASSIF_PRE = {3: 5, 4: 5, 160: 64, 0: 1, 7: 1}
CLASSIF_DICT = {1: "unclassified", 2: "ground", 5: "vegetation", 6: "building",
                9: "water", 17: "bridge", 64: "lasting_above"}


def _sample(n=100, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "pos": rng.uniform(0, 50, (n, 3)).astype(np.float32),
        "x": rng.uniform(0, 1, (n, 9)).astype(np.float32),
        "y": rng.choice([1, 2, 5, 6], n).astype(np.int64),
        "x_features_names": [
            "Intensity", "ReturnNumber", "NumberOfReturns", "Red", "Green",
            "Blue", "Infrared", "rgb_avg", "ndvi",
        ],
        "idx_in_original_cloud": np.arange(n),
    }


def test_target_transform_two_stage():
    tt = TargetTransform(CLASSIF_PRE, CLASSIF_DICT)
    y = np.array([6, 6, 17, 9, 1, 3, 4, 160, 65])
    out = tt.transform(y)
    #  6->3, 17->5, 9->4, 1->0, 3->5(veg idx 2), 4->2, 160->64->6, 65 preserved
    np.testing.assert_array_equal(out, [3, 3, 5, 4, 0, 2, 2, 6, 65])


def test_target_transform_unknown_code_raises():
    tt = TargetTransform({}, CLASSIF_DICT)
    with pytest.raises(ValueError):
        tt.transform(np.array([1, 42]))


def test_drop_points_by_class():
    data = _sample(10)
    data["y"] = np.array([65, 1, 65, 2, 2, 65, 5, 6, 1, 65], dtype=np.int64)
    out = DropPointsByClass()(data)
    assert out["pos"].shape[0] == 6
    assert out["y"].tolist() == [1, 2, 2, 5, 6, 1]
    assert out["idx_in_original_cloud"].tolist() == [1, 3, 4, 6, 7, 8]


def test_drop_all_points_gives_empty_then_compose_none():
    data = _sample(4)
    data["y"] = np.full(4, 65, dtype=np.int64)
    out = CustomCompose([DropPointsByClass()])(data)
    assert out is None


def test_maximum_num_nodes():
    data = _sample(100)
    out = MaximumNumNodes(30)(data)
    assert out["pos"].shape[0] == 30
    assert out["x"].shape[0] == 30
    assert out["y"].shape[0] == 30
    # idx is deliberately NOT subsampled (maps full subtile cloud)
    assert out["idx_in_original_cloud"].shape[0] == 100


def test_minimum_num_nodes_duplicates():
    data = _sample(7)
    out = MinimumNumNodes(20)(data)
    assert out["pos"].shape[0] == 20
    # all original points appear at least twice except truncation remainder
    vals, counts = np.unique(out["idx_in_original_cloud"], return_counts=True)
    assert len(vals) == 7  # untouched


def test_single_point_cloud_minimum():
    data = _sample(1)
    out = MinimumNumNodes(300)(data)
    assert out["pos"].shape[0] == 300
    assert np.all(out["pos"] == out["pos"][0])


def test_grid_sampling_means_and_majority():
    pos = np.array(
        [[0.0, 0, 0], [0.1, 0.1, 0.1], [10, 10, 10], [10.2, 10, 10]], dtype=np.float32
    )
    x = np.arange(8, dtype=np.float32).reshape(4, 2)
    y = np.array([1, 2, 5, 5], dtype=np.int64)
    data = {"pos": pos, "x": x, "y": y, "x_features_names": ["a", "b"]}
    out = GridSampling(1.0)(data)
    assert out["pos"].shape[0] == 2
    # voxel 0 contains points 0,1 ; voxel 1 contains 2,3
    order = np.argsort(out["pos"][:, 0])
    np.testing.assert_allclose(out["pos"][order[0]], [0.05, 0.05, 0.05], atol=1e-6)
    # y majority: tie in voxel0 {1:1, 2:1} -> smallest code 1; voxel1 -> 5
    assert out["y"][order[0]] == 1
    assert out["y"][order[1]] == 5
    np.testing.assert_allclose(out["x"][order[0]], [1.0, 2.0])


def test_standardize_rgb_and_intensity():
    data = _sample(1000)
    data["x"][:, 0] = np.random.default_rng(0).exponential(1000, 1000)  # Intensity
    out = StandardizeRGBAndIntensity()(data)
    assert abs(out["x"][:, 0].mean()) < 0.1
    assert out["x"][:, 0].std() <= 3.1
    idx = data["x_features_names"].index("rgb_avg")
    assert abs(out["x"][:, idx].mean()) < 0.1


def test_normalizations():
    data = _sample(50)
    data["pos"][:, 2] += 100.0
    out = NullifyLowestZ()(data)
    assert out["pos"][:, 2].min() == 0.0
    data2 = Center()(out)
    np.testing.assert_allclose(data2["pos"].mean(axis=0), 0, atol=1e-4)
    data3 = NormalizePos(subtile_width=50)(data2)
    # mean-centering (not midpoint) means one side can slightly exceed 1
    assert np.abs(data3["pos"][:, :2]).max() <= 2.0


def test_copies():
    data = _sample(20)
    data = CopyFullPos()(data)
    data = MaximumNumNodes(5)(data)
    data = CopySampledPos()(data)
    assert data["copies"]["pos_copy"].shape == (20, 3)
    assert data["copies"]["pos_sampled_copy"].shape == (5, 3)


def test_subsample_with_bool_mask():
    data = _sample(10)
    mask = np.zeros(10, dtype=bool)
    mask[:3] = True
    out = subsample_data(data, 10, mask)
    assert out["pos"].shape[0] == 3
