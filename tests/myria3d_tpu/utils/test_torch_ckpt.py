"""Torch↔flax checkpoint mapping round-trip tests (the proto151 blob itself
is not shipped in the reference repo — ``.MISSING_LARGE_BLOBS`` — so the
mapping is validated by exact round-trip through the torch naming scheme)."""

import jax
import jax.numpy as jnp
import numpy as np

from myria3d_tpu.models.modules.randla_net import RandLANet
from myria3d_tpu.utils.torch_ckpt import (
    golden_pyg_state_shapes as _golden_pyg_state_shapes,
    convert_randlanet_state_dict,
    flax_to_torch_state_dict,
    strip_lightning_prefix,
)


def _init_flax():
    net = RandLANet(num_features=9, num_classes=7)
    vs = jax.jit(
        lambda r, x, p, m: net.init(r, x, p, m, train=False)
    )(
        {"params": jax.random.PRNGKey(0), "decimation": jax.random.PRNGKey(1)},
        jnp.zeros((1, 256, 9)), jnp.zeros((1, 256, 3)), jnp.ones((1, 256), bool),
    )
    return jax.device_get(vs["params"]), jax.device_get(vs["batch_stats"])


def test_roundtrip_exact():
    params, stats = _init_flax()
    sd = flax_to_torch_state_dict(params, stats)
    # names look like the pyg module tree
    assert "fc0.weight" in sd
    assert "fc_classif.bias" in sd
    assert any(k.startswith("block1.lfa1.mlp_encoder.lins.0.") for k in sd)
    assert any(k.startswith("fp4.nn.norms.0.") for k in sd)
    assert any("running_mean" in k for k in sd)
    # torch Linear layout is (out, in)
    assert sd["fc0.weight"].shape == (32, 9)

    p2, s2 = convert_randlanet_state_dict(sd, params, stats)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(stats), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_key_raises():
    params, stats = _init_flax()
    sd = flax_to_torch_state_dict(params, stats)
    sd.pop("fc0.weight")
    try:
        convert_randlanet_state_dict(sd, params, stats)
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_strip_lightning_prefix():
    sd = {"model.fc0.weight": np.zeros((2, 2)), "other": np.ones(3)}
    out = strip_lightning_prefix(sd)
    assert "fc0.weight" in out and "other" in out


def test_exported_state_dict_matches_reference_shapes():
    """The flax tree exports to EXACTLY the reference PyGRandLANet key set
    and shapes — the structural guarantee that the real proto151 blob loads."""
    params, stats = _init_flax()
    sd = flax_to_torch_state_dict(params, stats)
    golden = _golden_pyg_state_shapes()
    missing = sorted(set(golden) - set(sd))
    extra = sorted(set(sd) - set(golden))
    assert not missing, f"flax tree lacks reference entries: {missing[:8]}"
    assert not extra, f"flax tree has non-reference entries: {extra[:8]}"
    for k, shape in golden.items():
        assert sd[k].shape == shape, (k, sd[k].shape, shape)


def test_convert_synthetic_reference_checkpoint():
    """A synthetic state_dict with the exact reference shapes converts
    without error and survives a value round trip."""
    params, stats = _init_flax()
    rng = np.random.default_rng(0)
    golden = _golden_pyg_state_shapes()
    sd = {k: rng.normal(size=shape).astype(np.float32) for k, shape in golden.items()}
    # real Lightning ckpts also carry num_batches_tracked scalars — ignored
    sd["mlp_summit.norms.0.num_batches_tracked"] = np.asarray(7, np.int64)
    p2, s2 = convert_randlanet_state_dict(sd, params, stats)
    back = flax_to_torch_state_dict(p2, s2)
    for k in golden:
        np.testing.assert_array_equal(back[k], sd[k])
