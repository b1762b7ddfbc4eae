"""Torch (Lightning) → myria3d_tpu checkpoint converter.

The reference ships a production Lightning checkpoint (proto151,
``trained_model_assets/...predict_config_V3.7.0.yaml``); full-cloud mIoU
parity against it (BASELINE.md) requires mapping its ``PyGRandLANet``
state_dict onto the flax RandLA-Net tree:

- torch ``Linear.weight (out, in)`` → flax ``Dense.kernel (in, out)``
  (transposed); bias as-is;
- torch ``BatchNorm1d.{weight, bias}`` → MaskedBatchNorm ``{scale, bias}``;
  ``running_{mean, var}`` → ``batch_stats {mean, var}``;
- pyg ``MLP`` children ``lins.{i}`` / ``norms.{i}`` → SharedMLP children
  ``Dense_{i}`` / ``MaskedBatchNorm_{i}``;
- ``fp{i}.nn`` (FPModule wraps its MLP in ``.nn``) → ``fp{i}``.

CLI: ``python -m myria3d_tpu.utils.torch_ckpt <in.ckpt> <out_dir>
[--hparams hparams.yaml]`` writes an orbax checkpoint directory loadable by
``Model.load_from_checkpoint``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

_DENSE_RE = re.compile(r"^Dense_(\d+)$")
_BN_RE = re.compile(r"^MaskedBatchNorm_(\d+)$")
_FP_RE = re.compile(r"^fp(\d+)$")


def _torch_prefix(path: Tuple[str, ...]) -> str:
    """Translate a flax module path to the torch state_dict prefix."""
    parts = []
    for comp in path:
        m = _DENSE_RE.match(comp)
        if m:
            parts.append(f"lins.{m.group(1)}")
            continue
        m = _BN_RE.match(comp)
        if m:
            parts.append(f"norms.{m.group(1)}")
            continue
        m = _FP_RE.match(comp)
        if m:
            parts.append(f"{comp}.nn")
            continue
        parts.append(comp)
    return ".".join(parts)


_LEAF_MAP_PARAMS = {"kernel": "weight", "bias": "bias", "scale": "weight"}
_LEAF_MAP_STATS = {"mean": "running_mean", "var": "running_var"}


def _convert_tree(
    tree: Any,
    state_dict: Dict[str, np.ndarray],
    leaf_map: Dict[str, str],
    path: Tuple[str, ...] = (),
    strict: bool = True,
):
    """Recursively fill a flax tree from the torch state_dict."""
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return type(dict(tree))(
            {
                k: _convert_tree(v, state_dict, leaf_map, path + (k,), strict)
                for k, v in dict(tree).items()
            }
        )
    # leaf: path[:-1] is the module path, path[-1] the leaf name
    *mods, leaf = path
    # torch top-level plain Linear layers have no pyg-MLP nesting
    prefix = _torch_prefix(tuple(mods))
    torch_leaf = leaf_map.get(leaf)
    if torch_leaf is None:
        raise KeyError(f"No torch mapping for flax leaf '{leaf}' at {path}")
    key = f"{prefix}.{torch_leaf}" if prefix else torch_leaf
    if key not in state_dict:
        if strict:
            raise KeyError(
                f"Missing '{key}' in torch state_dict (flax path {path})"
            )
        return tree
    value = np.asarray(state_dict[key], np.float32)
    if leaf == "kernel":
        value = value.T  # torch (out, in) -> flax (in, out)
    expected = np.shape(tree)
    if value.shape != tuple(expected):
        raise ValueError(
            f"Shape mismatch for {key}: torch {value.shape} vs flax {expected}"
        )
    return value


def strip_lightning_prefix(state_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Lightning ckpts nest the net under ``model.`` (reference
    ``Model.__init__`` attribute name, ``models/model.py:62``)."""
    out = {}
    for k, v in state_dict.items():
        k = k[len("model."):] if k.startswith("model.") else k
        try:
            out[k] = np.asarray(v, np.float32)
        except Exception:
            out[k] = np.asarray(v.detach().cpu().numpy(), np.float32)
    return out


def convert_randlanet_state_dict(
    state_dict: Dict[str, np.ndarray], params: Any, batch_stats: Any
) -> Tuple[Any, Any]:
    """Map a PyGRandLANet state_dict onto (params, batch_stats) trees shaped
    like the flax RandLANet."""
    new_params = _convert_tree(params, state_dict, _LEAF_MAP_PARAMS)
    new_stats = _convert_tree(batch_stats, state_dict, _LEAF_MAP_STATS)
    return new_params, new_stats


def flax_to_torch_state_dict(params: Any, batch_stats: Any) -> Dict[str, np.ndarray]:
    """Inverse mapping (for tests and for exporting back to torch users)."""
    out: Dict[str, np.ndarray] = {}

    def walk(tree, leaf_map, path=()):
        for k, v in dict(tree).items():
            p = path + (k,)
            if isinstance(v, dict) or hasattr(v, "items"):
                walk(v, leaf_map, p)
            else:
                *mods, leaf = p
                key = _torch_prefix(tuple(mods))
                tl = leaf_map[leaf]
                val = np.asarray(v, np.float32)
                if leaf == "kernel":
                    val = val.T
                out[f"{key}.{tl}" if key else tl] = val

    walk(params, _LEAF_MAP_PARAMS)
    walk(batch_stats, _LEAF_MAP_STATS)
    return out


def convert_checkpoint_file(
    torch_ckpt_path: str, out_dir: str, hparams: Dict[str, Any]
) -> str:
    """Load a Lightning .ckpt, convert, save an orbax checkpoint dir."""
    import torch

    import jax.numpy as jnp
    import jax

    from myria3d_tpu.models.model import Model, TrainState

    raw = torch.load(torch_ckpt_path, map_location="cpu", weights_only=False)
    state_dict = strip_lightning_prefix(raw.get("state_dict", raw))

    model = Model(**{k: v for k, v in hparams.items() if k != "_target_"})
    model.raw_hparams = dict(hparams)
    n = 256
    example = {
        "x": jnp.zeros((1, n, model.d_in), jnp.float32),
        "pos": jnp.zeros((1, n, 3), jnp.float32),
        "mask": jnp.ones((1, n), bool),
    }
    state = model.init_state(jax.random.PRNGKey(0), example)
    params, stats = convert_randlanet_state_dict(
        state_dict, jax.device_get(state.params), jax.device_get(state.batch_stats)
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=stats,
        opt_state=state.opt_state,
    )
    return model.save_checkpoint(out_dir, state)


def golden_pyg_state_shapes(
    num_features: int = 9, num_classes: int = 7
) -> Dict[str, Tuple[int, ...]]:
    """Every ``PyGRandLANet(num_features, num_classes)`` state_dict entry →
    shape, hard-coded from the reference module definitions
    (``pyg_randla_net.py:42-53`` net plan, ``:97-109`` SharedMLP=pyg MLP,
    ``:112-119`` LocalFeatureAggregation, ``:155-177`` DilatedResidualBlock).
    This is the convertibility contract with the shipped proto151
    checkpoint; tests assert the flax export matches it exactly."""
    d_b = max(32, num_classes, num_features)
    shapes: Dict[str, Tuple[int, ...]] = {}

    def linear(prefix, din, dout, bias=True):
        shapes[f"{prefix}.weight"] = (dout, din)
        if bias:
            shapes[f"{prefix}.bias"] = (dout,)

    def bn(prefix, d):
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"{prefix}.{leaf}"] = (d,)

    def mlp(prefix, chans, bias=True, norm=True):
        for i, (a, b) in enumerate(zip(chans[:-1], chans[1:])):
            linear(f"{prefix}.lins.{i}", a, b, bias=bias)
            if norm:
                bn(f"{prefix}.norms.{i}", b)

    def lfa(prefix, channels):
        mlp(f"{prefix}.mlp_encoder", [10, channels // 2])
        mlp(f"{prefix}.mlp_attention", [channels, channels],
            bias=False, norm=False)
        mlp(f"{prefix}.mlp_post_attention", [channels, channels])

    def block(prefix, d_in, d_out):
        mlp(f"{prefix}.mlp1", [d_in, d_out // 8])
        mlp(f"{prefix}.shortcut", [d_in, d_out])
        mlp(f"{prefix}.mlp2", [d_out // 2, d_out])
        lfa(f"{prefix}.lfa1", d_out // 4)
        lfa(f"{prefix}.lfa2", d_out // 2)

    linear("fc0", num_features, d_b)
    block("block1", d_b, 32)
    block("block2", 32, 128)
    block("block3", 128, 256)
    block("block4", 256, 512)
    mlp("mlp_summit", [512, 512])
    # Decoder FP inputs concat decoder features with the *decimated*
    # previous-stage skips: 768/384/160/64 (reference pyg_randla_net.py:48-51,
    # skips wired at :76-79).
    mlp("fp4.nn", [768, 256])
    mlp("fp3.nn", [384, 128])
    mlp("fp2.nn", [160, 32])
    mlp("fp1.nn", [64, d_b])
    mlp("mlp_classif", [d_b, 64, 32])
    linear("fc_classif", 32, num_classes)
    return shapes


def make_synthetic_lightning_checkpoint(
    path: str, num_features: int = 9, num_classes: int = 7, seed: int = 0
) -> str:
    """Write a Lightning-style ``.ckpt`` with the exact reference
    ``PyGRandLANet`` state_dict layout and random (but BN-valid) values —
    the stand-in for the proto151 blob (absent upstream,
    ``.MISSING_LARGE_BLOBS``) used by the parity-harness CI test."""
    import torch

    rng = np.random.default_rng(seed)
    sd = {}
    for key, shape in golden_pyg_state_shapes(num_features, num_classes).items():
        if key.endswith("running_var"):
            val = rng.uniform(0.5, 2.0, size=shape)  # rsqrt-safe
        else:
            val = rng.normal(0.0, 0.2, size=shape)
        sd[f"model.{key}"] = torch.from_numpy(val.astype(np.float32))
        if key.endswith("running_var"):
            sd[f"model.{key.rsplit('.', 1)[0]}.num_batches_tracked"] = (
                torch.tensor(7, dtype=torch.int64)
            )
    torch.save({"state_dict": sd, "epoch": 100}, path)
    return path


def main() -> None:
    import argparse

    import yaml

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("torch_ckpt")
    p.add_argument("out_dir")
    p.add_argument("--hparams", required=True,
                   help="YAML with the model config (see configs/model/)")
    args = p.parse_args()
    with open(args.hparams) as f:
        hparams = yaml.safe_load(f)
    out = convert_checkpoint_file(args.torch_ckpt, args.out_dir, hparams)
    print(f"Converted checkpoint written to {out}")


if __name__ == "__main__":
    main()
