"""EfficientNet porter oracle: the ``efficientnet_pytorch`` package is not
installed here, but the lukemelas b0 attribute schema is stable and fully
determined by the block specs — so build a state-dict-shaped fake from torch
primitives, assert ``port_efficientnet`` maps EVERY key with the right
shape, and check the ported forward against the torch twin end to end."""

import math
import types

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
torch.backends.mkldnn.enabled = False
F = torch.nn.functional

from aat_tpu.models.efficientnet import (  # noqa: E402
    block_specs,
    efficientnet_features,
    init_efficientnet_params,
    port_efficientnet,
)


def _mk_bn(c, g):
    m = torch.nn.BatchNorm2d(c, eps=1e-3, momentum=0.01)
    with torch.no_grad():
        m.weight.copy_(torch.tensor(g.normal(1, 0.1, c).astype(np.float32)))
        m.bias.copy_(torch.tensor(g.normal(0, 0.1, c).astype(np.float32)))
        m.running_mean.copy_(torch.tensor(g.normal(0, 0.2, c).astype(np.float32)))
        m.running_var.copy_(torch.tensor(g.uniform(0.5, 1.5, c).astype(np.float32)))
    return m.eval()


def _mk_conv(cin, cout, k, stride=1, groups=1, bias=False, g=None):
    m = torch.nn.Conv2d(cin, cout, k, stride=stride, groups=groups, bias=bias)
    with torch.no_grad():
        m.weight.copy_(torch.tensor(
            g.normal(0, 0.1, m.weight.shape).astype(np.float32)))
        if bias:
            m.bias.copy_(torch.tensor(
                g.normal(0, 0.05, m.bias.shape).astype(np.float32)))
    return m.eval()


def build_fake_b0(seed=0):
    """A module exposing exactly the lukemelas EfficientNet-b0 attribute
    schema the porter reads: ``_conv_stem``, ``_bn0``, ``_blocks[i]``
    (with ``_expand_conv/_bn0/_depthwise_conv/_bn1/_se_reduce/_se_expand/
    _project_conv/_bn2``), ``_conv_head``, ``_bn1``."""
    g = np.random.default_rng(seed)
    net = types.SimpleNamespace()
    net._conv_stem = _mk_conv(3, 32, 3, stride=2, g=g)
    net._bn0 = _mk_bn(32, g)
    net._blocks = []
    for spec in block_specs():
        b = types.SimpleNamespace()
        mid = spec["cin"] * spec["expand"]
        if spec["expand"] != 1:
            b._expand_conv = _mk_conv(spec["cin"], mid, 1, g=g)
            b._bn0 = _mk_bn(mid, g)
        b._depthwise_conv = _mk_conv(mid, mid, spec["kernel"],
                                     stride=spec["stride"], groups=mid, g=g)
        b._bn1 = _mk_bn(mid, g)
        se = max(1, int(spec["cin"] * 0.25))
        b._se_reduce = _mk_conv(mid, se, 1, bias=True, g=g)
        b._se_expand = _mk_conv(se, mid, 1, bias=True, g=g)
        b._project_conv = _mk_conv(mid, spec["cout"], 1, g=g)
        b._bn2 = _mk_bn(spec["cout"], g)
        net._blocks.append(b)
    net._conv_head = _mk_conv(320, 1280, 1, g=g)
    net._bn1 = _mk_bn(1280, g)
    return net


def _tf_same(x, k, s):
    """TF-'SAME' padding (lukemelas Conv2dStaticSamePadding == XLA SAME)."""
    ih, iw = x.shape[2], x.shape[3]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


def torch_b0_features(net, x):
    """lukemelas ``extract_features`` + global pool, from the fake's own
    modules (reference adapter consumes exactly this, modeling_aslm.py:70-93
    with fc/dropout stripped)."""
    x = F.silu(net._bn0(net._conv_stem(_tf_same(x, 3, 2))))
    for spec, b in zip(block_specs(), net._blocks):
        inp = x
        if spec["expand"] != 1:
            x = F.silu(b._bn0(b._expand_conv(x)))
        x = F.silu(b._bn1(b._depthwise_conv(
            _tf_same(x, spec["kernel"], spec["stride"]))))
        s = x.mean((2, 3), keepdim=True)
        s = torch.sigmoid(b._se_expand(F.silu(b._se_reduce(s))))
        x = x * s
        x = b._bn2(b._project_conv(x))
        if spec["stride"] == 1 and spec["cin"] == spec["cout"]:
            x = x + inp
    x = F.silu(net._bn1(net._conv_head(x)))
    return x.mean((2, 3))


def test_porter_maps_every_key():
    ported = port_efficientnet(build_fake_b0())
    ref = init_efficientnet_params()
    flat_p = jax.tree_util.tree_flatten_with_path(ported)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(ref)[0]
    paths_p = [jax.tree_util.keystr(p) for p, _ in flat_p]
    paths_r = [jax.tree_util.keystr(p) for p, _ in flat_r]
    assert paths_p == paths_r  # every key present, none extra
    for (path, a), (_, b) in zip(flat_p, flat_r):
        assert np.asarray(a).shape == np.asarray(b).shape, jax.tree_util.keystr(path)
    # and the port actually wrote the torch values (not the random init)
    stem = np.asarray(ported["stem"]["conv"]["kernel"])
    assert np.abs(stem - np.asarray(ref["stem"]["conv"]["kernel"])).max() > 1e-3


def test_ported_forward_matches_torch_twin():
    net = build_fake_b0(seed=1)
    ported = port_efficientnet(net)
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 64, 32, 3)).astype(np.float32)  # NHWC
    with torch.no_grad():
        ref = torch_b0_features(net, torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(efficientnet_features(ported, x))
    np.testing.assert_allclose(
        ours, ref, atol=max(2e-4, 1e-4 * float(np.abs(ref).max())))
