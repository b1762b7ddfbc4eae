"""Full-forward numerical parity against a plain-torch oracle of the
reference ``PyGRandLANet``.

The proto151 parity north star (BASELINE.md) needs more than shape
compatibility: the flax forward must compute the *same function* as the
reference once weights are converted. The reference itself cannot run here
(torch_geometric is not installed), so this module re-implements its exact
forward semantics (``myria3d/models/modules/pyg_randla_net.py:55-88`` and
submodules) in plain torch — dense kNN instead of edge lists, but the same
math — with the reference's parameter naming, then asserts:

    torch_oracle(weights, cloud)  ==  flax_randlanet(convert(weights), cloud)

to ~1e-4 on logits, in eval mode (running BN stats randomized so BN is
actually exercised; dropout off). Decimation is made deterministic on both
sides (keep the first ``max(1, n // 4)`` valid points — valid points are
stored front-first, so this is a legal draw of the reference's ``randperm``
decimation, ``pyg_randla_net.py:208-231``).

Neighbor selection uses exact kNN on both sides (CPU ``approx_min_k``
lowers to an exact sort, ``ops/knn.py`` docstring). The fixed seeds keep
random positions away from distance near-ties, where f32-vs-f64 ranking
could legitimately swap two almost-equidistant neighbors.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import myria3d_tpu.models.modules.randla_net as rl_mod
from myria3d_tpu.models.modules.randla_net import RandLANet
from myria3d_tpu.utils.torch_ckpt import convert_randlanet_state_dict

# The oracle comparison assumes exact kNN selection and f32 CPU numerics;
# on the real chip (MYRIA3D_TEST_TPU=1) knn routes to the binned Pallas /
# approx_min_k path (recall ~0.99) and neighbor sets legitimately diverge
# from the float64 torch ranking.
pytestmark = pytest.mark.skipif(
    bool(os.environ.get("MYRIA3D_TEST_TPU")),
    reason="parity oracle requires exact CPU kNN + f32 host numerics",
)


# ---------------------------------------------------------------------------
# Plain-torch oracle with the reference's exact semantics + parameter names.
# ---------------------------------------------------------------------------


class TorchSharedMLP(torch.nn.Module):
    """pyg ``MLP`` as configured by the reference ``SharedMLP``
    (``pyg_randla_net.py:97-109``): per layer Linear -> BN(momentum 0.01,
    eps 1e-6) -> LeakyReLU(0.2) -> dropout, applied to the last layer too
    (``plain_last=False``). ``act``/``norm`` off reproduce the reference's
    ``act=None`` / ``norm=None`` kwargs."""

    def __init__(self, chans, bias=True, act=True, norm=True):
        super().__init__()
        self.use_act, self.use_norm = act, norm
        self.lins = torch.nn.ModuleList(
            [torch.nn.Linear(a, b, bias=bias) for a, b in zip(chans[:-1], chans[1:])]
        )
        if norm:
            self.norms = torch.nn.ModuleList(
                [torch.nn.BatchNorm1d(b, momentum=0.01, eps=1e-6) for b in chans[1:]]
            )

    def forward(self, x):
        for i, lin in enumerate(self.lins):
            x = lin(x)
            if self.use_norm:
                x = self.norms[i](x)
            if self.use_act:
                x = F.leaky_relu(x, 0.2)
        return x  # dropout omitted: oracle runs in eval mode only


class TorchLFA(torch.nn.Module):
    """Reference ``LocalFeatureAggregation`` (``pyg_randla_net.py:112-152``)
    over a dense (N, K) neighborhood: message = cat(x_j, MLP(cat(pos_i,
    pos_j, pos_diff, |diff|))); per-neighborhood softmax of a bias-free
    attention MLP; sum-aggregate; post-attention MLP."""

    def __init__(self, channels):
        super().__init__()
        self.mlp_encoder = TorchSharedMLP([10, channels // 2])
        self.mlp_attention = TorchSharedMLP(
            [channels, channels], bias=False, act=False, norm=False
        )
        self.mlp_post_attention = TorchSharedMLP([channels, channels])

    def forward(self, idx, x, pos):
        n, k = idx.shape
        pos_j = pos[idx]                                   # (N, K, 3)
        pos_i = pos[:, None, :].expand(n, k, 3)
        pos_diff = pos_j - pos_i
        distance = (pos_diff * pos_diff).sum(-1, keepdim=True).sqrt()
        rel = torch.cat([pos_i, pos_j, pos_diff, distance], dim=-1)
        enc = self.mlp_encoder(rel.reshape(n * k, 10)).reshape(n, k, -1)
        local_features = torch.cat([x[idx], enc], dim=-1)  # (N, K, C)
        att = self.mlp_attention(local_features.reshape(n * k, -1)).reshape(n, k, -1)
        att_scores = torch.softmax(att, dim=1)             # scatter softmax per center
        out = (att_scores * local_features).sum(dim=1)     # aggr="add"
        return self.mlp_post_attention(out)


def _dense_knn(pos, k):
    """Exact self-kNN with self-loops (``knn_graph(..., loop=True)``),
    float64 ranking."""
    p = pos.double()
    d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    return d2.topk(min(k, pos.shape[0]), dim=1, largest=False).indices


class TorchBlock(torch.nn.Module):
    """Reference ``DilatedResidualBlock`` (``pyg_randla_net.py:155-189``)."""

    def __init__(self, num_neighbors, d_in, d_out):
        super().__init__()
        self.num_neighbors = num_neighbors
        self.mlp1 = TorchSharedMLP([d_in, d_out // 8])
        self.shortcut = TorchSharedMLP([d_in, d_out], act=False)
        self.mlp2 = TorchSharedMLP([d_out // 2, d_out], act=False)
        self.lfa1 = TorchLFA(d_out // 4)
        self.lfa2 = TorchLFA(d_out // 2)

    def forward(self, x, pos):
        idx = _dense_knn(pos, self.num_neighbors)
        shortcut_of_x = self.shortcut(x)
        x = self.mlp1(x)
        x = self.lfa1(idx, x, pos)
        x = self.lfa2(idx, x, pos)
        x = self.mlp2(x)
        return F.leaky_relu(x + shortcut_of_x, 0.2)


class TorchFP(torch.nn.Module):
    """Reference ``FPModule`` with k=1 (``pyg_randla_net.py:241-253``):
    nearest-source copy, concat skip, MLP."""

    def __init__(self, chans):
        super().__init__()
        self.nn = TorchSharedMLP(chans)

    def forward(self, x, pos, x_skip, pos_skip):
        d2 = ((pos_skip.double()[:, None, :] - pos.double()[None, :, :]) ** 2).sum(-1)
        nearest = d2.argmin(dim=1)
        x = x[nearest]                                     # k=1 interpolate
        x = self.nn(torch.cat([x, x_skip], dim=-1))
        return x


class TorchRandLANetOracle(torch.nn.Module):
    """Reference ``PyGRandLANet`` net plan (``pyg_randla_net.py:40-53``) with
    deterministic keep-first decimation; parameter names match the reference
    state_dict exactly (asserted against the golden fixture elsewhere)."""

    def __init__(self, num_features, num_classes, num_neighbors=16, decimation=4):
        super().__init__()
        self.decimation = decimation
        d_b = max(32, num_classes, num_features)
        self.fc0 = torch.nn.Linear(num_features, d_b)
        self.block1 = TorchBlock(num_neighbors, d_b, 32)
        self.block2 = TorchBlock(num_neighbors, 32, 128)
        self.block3 = TorchBlock(num_neighbors, 128, 256)
        self.block4 = TorchBlock(num_neighbors, 256, 512)
        self.mlp_summit = TorchSharedMLP([512, 512])
        self.fp4 = TorchFP([512 + 256, 256])
        self.fp3 = TorchFP([256 + 128, 128])
        self.fp2 = TorchFP([128 + 32, 32])
        self.fp1 = TorchFP([32 + 32, d_b])
        self.mlp_classif = TorchSharedMLP([d_b, 64, 32])
        self.fc_classif = torch.nn.Linear(32, num_classes)

    def forward(self, x, pos):
        x = self.fc0(x)
        b1 = self.block1(x, pos)
        n1 = max(1, pos.shape[0] // self.decimation)
        b1d, pos1 = b1[:n1], pos[:n1]

        b2 = self.block2(b1d, pos1)
        n2 = max(1, n1 // self.decimation)
        b2d, pos2 = b2[:n2], pos1[:n2]

        b3 = self.block3(b2d, pos2)
        n3 = max(1, n2 // self.decimation)
        b3d, pos3 = b3[:n3], pos2[:n3]

        b4 = self.block4(b3d, pos3)
        n4 = max(1, n3 // self.decimation)
        b4d, pos4 = b4[:n4], pos3[:n4]

        m = self.mlp_summit(b4d)
        x = self.fp4(m, pos4, b3d, pos3)
        x = self.fp3(x, pos3, b2d, pos2)
        x = self.fp2(x, pos2, b1d, pos1)
        x = self.fp1(x, pos1, b1, pos)
        x = self.mlp_classif(x)
        return self.fc_classif(x)


# ---------------------------------------------------------------------------
# Alignment helpers
# ---------------------------------------------------------------------------


def _det_decimation(rng, mask, decimation):
    """Deterministic stand-in for ``ops.sampling.random_decimation``: keep
    the first ``max(1, valid // decimation)`` slots (same contract: static
    (B, N//decimation) idx + slot mask). Valid points are front-packed in
    these tests, so this equals the oracle's keep-first-n rule."""
    b, n = mask.shape
    n_out = n // decimation
    idx = jnp.broadcast_to(jnp.arange(n_out, dtype=jnp.int32)[None], (b, n_out))
    valid = jnp.sum(mask, axis=1)
    kept = jnp.where(valid > 0, jnp.maximum(1, valid // decimation), 0)
    new_mask = jnp.arange(n_out)[None, :] < kept[:, None]
    return jnp.where(new_mask, idx, 0), new_mask


def _randomized_oracle(num_features=9, num_classes=7, seed=0):
    torch.manual_seed(seed)
    oracle = TorchRandLANetOracle(num_features, num_classes).eval()
    gen = torch.Generator().manual_seed(seed + 1)
    for m in oracle.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            # exercise BN for real: non-trivial running stats + affine
            m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.3)
            m.running_var.copy_(0.5 + torch.rand(m.num_features, generator=gen))
            m.weight.data.copy_(0.5 + torch.rand(m.num_features, generator=gen))
            m.bias.data.copy_(torch.randn(m.num_features, generator=gen) * 0.1)
    return oracle


def _flax_from_oracle(oracle, num_features=9, num_classes=7, n=256):
    net = RandLANet(num_features=num_features, num_classes=num_classes)
    vs = net.init(
        {"params": jax.random.PRNGKey(0), "decimation": jax.random.PRNGKey(1)},
        jnp.zeros((1, n, num_features)), jnp.zeros((1, n, 3)),
        jnp.ones((1, n), bool), train=False,
    )
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, stats = convert_randlanet_state_dict(
        sd, jax.device_get(vs["params"]), jax.device_get(vs["batch_stats"])
    )
    return net, {"params": params, "batch_stats": stats}


@pytest.fixture()
def det_decimation(monkeypatch):
    monkeypatch.setattr(rl_mod, "random_decimation", _det_decimation)


def test_full_forward_matches_torch_oracle(det_decimation):
    """Single full cloud, no padding: converted weights reproduce the
    reference forward point-for-point."""
    num_features, num_classes, n = 9, 7, 1280
    oracle = _randomized_oracle(num_features, num_classes)
    net, variables = _flax_from_oracle(oracle, num_features, num_classes, n)

    rng = np.random.default_rng(42)
    pos = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    feats = rng.uniform(0.0, 1.0, (n, num_features)).astype(np.float32)

    with torch.no_grad():
        ref = oracle(torch.from_numpy(feats), torch.from_numpy(pos)).numpy()

    logits = net.apply(
        variables,
        jnp.asarray(feats)[None], jnp.asarray(pos)[None],
        jnp.ones((1, n), bool), train=False,
        rngs={"decimation": jax.random.PRNGKey(2)},
    )
    got = np.asarray(logits[0])

    assert got.shape == ref.shape == (n, num_classes)
    # measured baseline agreement is ~1e-7; atol=1e-5 still catches the
    # most-attenuated single-weight perturbation probed (block1 attention
    # kernel flip -> 3.6e-5 logit shift)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    # class decisions identical everywhere (the "bit-for-class" contract)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_convert_checkpoint_file_roundtrip(det_decimation, tmp_path):
    """The actual proto151 ingestion path: a Lightning-style ``.ckpt`` FILE
    (state_dict under ``model.`` prefixes, stray ``num_batches_tracked``
    scalars included) through ``convert_checkpoint_file`` -> orbax dir ->
    ``Model.load_from_checkpoint`` -> eval forward equals the torch oracle."""
    from myria3d_tpu.models.model import Model
    from myria3d_tpu.utils.torch_ckpt import convert_checkpoint_file

    num_features, num_classes, n = 9, 7, 1280
    oracle = _randomized_oracle(num_features, num_classes, seed=5)

    ckpt_path = str(tmp_path / "proto_synthetic.ckpt")
    torch.save(
        {
            "epoch": 100,
            "state_dict": {
                f"model.{k}": v for k, v in oracle.state_dict().items()
            },
        },
        ckpt_path,
    )
    hparams = {
        "_target_": "myria3d_tpu.models.model.Model",
        "neural_net_class_name": "RandLANet",
        "neural_net_hparams": {
            "num_features": num_features, "num_classes": num_classes,
            "num_neighbors": 16, "decimation": 4, "return_logits": True,
        },
        "lr": 0.003933709606504788,
    }
    out_dir = convert_checkpoint_file(
        ckpt_path, str(tmp_path / "converted"), hparams
    )

    model, state = Model.load_from_checkpoint(out_dir)
    rng = np.random.default_rng(42)
    pos = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    feats = rng.uniform(0.0, 1.0, (n, num_features)).astype(np.float32)

    with torch.no_grad():
        ref = oracle(torch.from_numpy(feats), torch.from_numpy(pos)).numpy()

    logits = model.net.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(feats)[None], jnp.asarray(pos)[None],
        jnp.ones((1, n), bool), train=False,
        rngs={"decimation": jax.random.PRNGKey(2)},
    )
    np.testing.assert_allclose(np.asarray(logits[0]), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(logits[0]).argmax(-1), ref.argmax(-1)
    )


def test_train_mode_batch_stats_match_torch_oracle(det_decimation):
    """One train-mode forward on a padded ragged batch: every BN layer's
    updated running stats must match torch's (masked moments over valid
    points / valid neighbor slots == torch moments over the concatenated
    ragged rows). All BN layers sit before the head's 0.5 dropout, so the
    stats comparison is dropout-independent."""
    num_features, num_classes, n_pad = 9, 7, 1280
    sizes = [1280, 1088]
    oracle = _randomized_oracle(num_features, num_classes, seed=11)
    net, variables = _flax_from_oracle(oracle, num_features, num_classes, n_pad)

    rng = np.random.default_rng(13)
    pos = rng.uniform(-1.0, 1.0, (2, n_pad, 3)).astype(np.float32)
    feats = rng.uniform(0.0, 1.0, (2, n_pad, num_features)).astype(np.float32)
    mask = np.zeros((2, n_pad), bool)
    for b, s in enumerate(sizes):
        mask[b, :s] = True

    _, mutated = net.apply(
        variables,
        jnp.asarray(feats), jnp.asarray(pos), jnp.asarray(mask), train=True,
        rngs={"decimation": jax.random.PRNGKey(2),
              "dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )

    # The reference flattens clouds into one graph, so each torch BN sees
    # the ragged concatenation of both clouds' rows — while kNN, decimation
    # and the LFA neighborhoods stay per-cloud. Running the per-cloud oracle
    # twice would update the running stats twice with per-cloud moments
    # (NOT the reference semantics), so emulate the flattened batch with a
    # manual forward where every BN call pools rows from both clouds.
    stats_ref = _torch_pooled_stats_forward(oracle, feats, pos, sizes)

    flat = {}

    def walk(tree, path=()):
        for k, v in dict(tree).items():
            if isinstance(v, dict) or hasattr(v, "items"):
                walk(v, path + (k,))
            else:
                flat[path + (k,)] = np.asarray(v)

    walk(mutated["batch_stats"])
    from myria3d_tpu.utils.torch_ckpt import _LEAF_MAP_STATS, _torch_prefix

    checked = 0
    for path, got in flat.items():
        *mods, leaf = path
        key = _torch_prefix(tuple(mods))
        tl = _LEAF_MAP_STATS[leaf]
        ref = stats_ref[f"{key}.{tl}"]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"{key}.{tl}")
        checked += 1
    # 7 BNs per block x 4 blocks + summit + 4 FPs + 2 classif = 35 BNs,
    # each with mean + var leaves
    assert checked == 70


def _torch_pooled_stats_forward(oracle, feats, pos, sizes):
    """Run both clouds through the oracle with BN pooling moments over the
    two clouds' rows jointly (the reference's flattened-batch semantics),
    and return the updated running stats as a torch-style dict."""
    # Wrap each BatchNorm1d so forward normalizes with externally-computed
    # pooled batch stats. Two phases per BN call site: phase 1 records rows
    # per call-site; phase 2 normalizes using pooled moments and updates
    # running stats once.
    # Because upstream normalization changes downstream activations, the
    # phases must interleave per LAYER, not per full pass: process both
    # clouds in lockstep through a batched oracle forward where tensors keep
    # a list-of-clouds structure.
    class Pooled:
        def __init__(self, bn):
            self.bn = bn

        def __call__(self, xs):  # xs: list of (rows_b, C)
            cat = torch.cat(xs, dim=0)
            mean = cat.mean(dim=0)
            var = cat.var(dim=0, unbiased=False)
            n = cat.shape[0]
            unbiased = var * n / max(n - 1, 1)
            m = self.bn.momentum
            self.bn.running_mean.mul_(1 - m).add_(m * mean)
            self.bn.running_var.mul_(1 - m).add_(m * unbiased)
            inv = torch.rsqrt(var + self.bn.eps)
            return [
                (x - mean) * inv * self.bn.weight + self.bn.bias for x in xs
            ]

    def mlp(mod, xs):
        for i, lin in enumerate(mod.lins):
            xs = [lin(x) for x in xs]
            if mod.use_norm:
                xs = Pooled(mod.norms[i])(xs)
            if mod.use_act:
                xs = [F.leaky_relu(x, 0.2) for x in xs]
        return xs

    def lfa(mod, idxs, xs, poss):
        rels, lfs = [], []
        for idx, x, p in zip(idxs, xs, poss):
            n, k = idx.shape
            pos_j = p[idx]
            pos_i = p[:, None, :].expand(n, k, 3)
            diff = pos_j - pos_i
            dist = (diff * diff).sum(-1, keepdim=True).sqrt()
            rels.append(torch.cat([pos_i, pos_j, diff, dist], -1).reshape(n * k, 10))
        encs = mlp(mod.mlp_encoder, rels)
        outs = []
        for idx, x, enc in zip(idxs, xs, encs):
            n, k = idx.shape
            lf = torch.cat([x[idx], enc.reshape(n, k, -1)], dim=-1)
            att = mod.mlp_attention.lins[0](lf)
            scores = torch.softmax(att, dim=1)
            outs.append((scores * lf).sum(dim=1))
        return mlp(mod.mlp_post_attention, outs)

    def block(mod, xs, poss):
        idxs = [_dense_knn(p, mod.num_neighbors) for p in poss]
        shortcuts = mlp(mod.shortcut, xs)
        xs = mlp(mod.mlp1, xs)
        xs = lfa(mod.lfa1, idxs, xs, poss)
        xs = lfa(mod.lfa2, idxs, xs, poss)
        xs = mlp(mod.mlp2, xs)
        return [F.leaky_relu(x + s, 0.2) for x, s in zip(xs, shortcuts)]

    def fp(mod, xs, poss, x_skips, pos_skips):
        outs = []
        for x, p, xs_, ps_ in zip(xs, poss, x_skips, pos_skips):
            d2 = ((ps_.double()[:, None, :] - p.double()[None, :, :]) ** 2).sum(-1)
            outs.append(torch.cat([x[d2.argmin(dim=1)], xs_], dim=-1))
        return mlp(mod.nn, outs)

    with torch.no_grad():
        xs = [torch.from_numpy(feats[b, :s]) for b, s in enumerate(sizes)]
        poss = [torch.from_numpy(pos[b, :s]) for b, s in enumerate(sizes)]
        xs = [oracle.fc0(x) for x in xs]
        b1 = block(oracle.block1, xs, poss)
        ns = [max(1, s // oracle.decimation) for s in sizes]
        xs, poss1 = [x[:n] for x, n in zip(b1, ns)], [p[:n] for p, n in zip(poss, ns)]
        b2 = block(oracle.block2, xs, poss1)
        ns2 = [max(1, n // oracle.decimation) for n in ns]
        xs, poss2 = [x[:n] for x, n in zip(b2, ns2)], [p[:n] for p, n in zip(poss1, ns2)]
        b3 = block(oracle.block3, xs, poss2)
        ns3 = [max(1, n // oracle.decimation) for n in ns2]
        xs, poss3 = [x[:n] for x, n in zip(b3, ns3)], [p[:n] for p, n in zip(poss2, ns3)]
        b4 = block(oracle.block4, xs, poss3)
        ns4 = [max(1, n // oracle.decimation) for n in ns3]
        xs, poss4 = [x[:n] for x, n in zip(b4, ns4)], [p[:n] for p, n in zip(poss3, ns4)]
        xs = mlp(oracle.mlp_summit, xs)
        xs = fp(oracle.fp4, xs, poss4, [x[:n] for x, n in zip(b3, ns3)], poss3)
        xs = fp(oracle.fp3, xs, poss3, [x[:n] for x, n in zip(b2, ns2)], poss2)
        xs = fp(oracle.fp2, xs, poss2, [x[:n] for x, n in zip(b1, ns)], poss1)
        xs = fp(oracle.fp1, xs, poss1, b1, poss)
        xs = mlp(oracle.mlp_classif, xs)

    return {k: v.numpy() for k, v in oracle.state_dict().items()
            if "running_" in k}


def test_full_forward_matches_torch_oracle_ragged_batch(det_decimation):
    """Padded 2-cloud batch vs per-cloud oracle runs: masking (kNN, BN-eval,
    attention, decimation, FP) must keep each cloud's function identical to
    the reference's per-cloud semantics."""
    num_features, num_classes, n_pad = 9, 7, 1280
    sizes = [1280, 1088]  # both keep >= K=16 valid points at block4
    oracle = _randomized_oracle(num_features, num_classes, seed=3)
    net, variables = _flax_from_oracle(oracle, num_features, num_classes, n_pad)

    rng = np.random.default_rng(7)
    pos = rng.uniform(-1.0, 1.0, (2, n_pad, 3)).astype(np.float32)
    feats = rng.uniform(0.0, 1.0, (2, n_pad, num_features)).astype(np.float32)
    mask = np.zeros((2, n_pad), bool)
    for b, s in enumerate(sizes):
        mask[b, :s] = True

    logits = net.apply(
        variables,
        jnp.asarray(feats), jnp.asarray(pos), jnp.asarray(mask), train=False,
        rngs={"decimation": jax.random.PRNGKey(2)},
    )
    got = np.asarray(logits)

    with torch.no_grad():
        for b, s in enumerate(sizes):
            ref = oracle(
                torch.from_numpy(feats[b, :s]), torch.from_numpy(pos[b, :s])
            ).numpy()
            np.testing.assert_allclose(got[b, :s], ref, rtol=1e-4, atol=1e-5)
            np.testing.assert_array_equal(got[b, :s].argmax(-1), ref.argmax(-1))
