"""Independent naive-loop oracles for the Inception family trunks:
Inception-v4 (Cadene/timm module tree, reference backbones.py:34) and
BN-Inception (pretrainedmodels flat layout, backbones.py:8-9).

Like tests/test_{swin,resnest,xcit,convnet}_oracle.py: float64 numpy with
explicit per-position loops, with the branch WIRING (order of concat,
per-conv pads/strides, pool flavors) written out literal-by-literal from
the upstream module definitions — sharing none of the JAX
implementation's table-driven structure.  These catch branch-order /
padding / pool-semantics drift; the channel-plan constants themselves are
frozen by tests/test_manifests.py.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# naive primitives (f64, loops)
# ---------------------------------------------------------------------------

def naive_conv(x, w, stride=1, pad=(0, 0, 0, 0)):
    """x [Cin, H, W], w [Cout, Cin, kh, kw]; pad = (top, bottom, l, r)."""
    cin, h, wid = x.shape
    cout, _, kh, kw = w.shape
    t, bo, le, ri = pad
    xp = np.zeros((cin, h + t + bo, wid + le + ri))
    xp[:, t:t + h, le:le + wid] = x
    ho = (h + t + bo - kh) // stride + 1
    wo = (wid + le + ri - kw) // stride + 1
    out = np.empty((cout, ho, wo))
    for o in range(cout):
        for i in range(ho):
            for j in range(wo):
                out[o, i, j] = np.sum(
                    xp[:, i * stride:i * stride + kh,
                       j * stride:j * stride + kw] * w[o])
    return out


def naive_bn(x, p, name, eps):
    return ((x - p[name + ".running_mean"][:, None, None])
            / np.sqrt(p[name + ".running_var"][:, None, None] + eps)
            * p[name + ".weight"][:, None, None]
            + p[name + ".bias"][:, None, None])


def naive_maxpool_3x3_s2(x):
    """MaxPool2d(3, 2): floor division, no padding (the v4 flavor)."""
    c, h, w = x.shape
    ho, wo = (h - 3) // 2 + 1, (w - 3) // 2 + 1
    out = np.empty((c, ho, wo))
    for i in range(ho):
        for j in range(wo):
            out[:, i, j] = x[:, 2 * i:2 * i + 3,
                             2 * j:2 * j + 3].max(axis=(1, 2))
    return out


def naive_maxpool_3x3_s2_ceil(x):
    """MaxPool2d(3, 2, ceil_mode=True): windows start at 0 (no top/left
    pad), the ceil-count of windows clips at the bottom/right edge —
    pretrainedmodels BN-Inception's stride-2 pool everywhere."""
    c, h, w = x.shape
    ho, wo = -(-(h - 3) // 2) + 1, -(-(w - 3) // 2) + 1
    out = np.empty((c, ho, wo))
    for i in range(ho):
        for j in range(wo):
            out[:, i, j] = x[:, 2 * i:min(h, 2 * i + 3),
                             2 * j:min(w, 2 * j + 3)].max(axis=(1, 2))
    return out


def naive_maxpool_3x3_s1_p1(x):
    """MaxPool2d(3, 1, padding=1): torch pads with -inf (window clips)."""
    c, h, w = x.shape
    out = np.empty((c, h, w))
    for i in range(h):
        for j in range(w):
            out[:, i, j] = x[:, max(0, i - 1):min(h, i + 2),
                             max(0, j - 1):min(w, j + 2)].max(axis=(1, 2))
    return out


def naive_avgpool_3x3_s1_p1(x, include_pad):
    """AvgPool2d(3, 1, padding=1): Inception-v4 divides by the number of
    REAL elements (count_include_pad=False); BN-Inception divides by 9
    everywhere (padded zeros count)."""
    c, h, w = x.shape
    out = np.empty((c, h, w))
    for i in range(h):
        for j in range(w):
            i0, i1 = max(0, i - 1), min(h, i + 2)
            j0, j1 = max(0, j - 1), min(w, j + 2)
            s = x[:, i0:i1, j0:j1].sum(axis=(1, 2))
            out[:, i, j] = s / (9.0 if include_pad
                                else (i1 - i0) * (j1 - j0))
    return out


# ---------------------------------------------------------------------------
# Inception-v4: the whole features trunk, wiring per Cadene inceptionv4.py
# ---------------------------------------------------------------------------

V4_EPS = 1e-3


def v4_basic(x, p, prefix, stride=1, pad=(0, 0)):
    """BasicConv2d: bias-free conv -> BatchNorm(eps=0.001) -> ReLU."""
    if isinstance(pad, int):
        pad = (pad, pad)
    h = naive_conv(x, p[prefix + ".conv.weight"], stride,
                   (pad[0], pad[0], pad[1], pad[1]))
    return np.maximum(naive_bn(h, p, prefix + ".bn", V4_EPS), 0.0)


def naive_inception_v4(x, p, deepest):
    """[3, H, W] image -> {features.i: [C, H', W']} for i <= deepest."""

    def b(idx, suffix, y, stride=1, pad=(0, 0)):
        prefix = f"features.{idx}" + (f".{suffix}" if suffix else "")
        return v4_basic(y, p, prefix, stride, pad)

    out = {}

    def rec(idx, y):
        out[f"features.{idx}"] = y
        return y

    x = rec(0, b(0, "", x, stride=2))                     # 3 -> 32, 3x3 s2
    x = rec(1, b(1, "", x))                               # 32 -> 32, 3x3
    x = rec(2, b(2, "", x, pad=1))                        # 32 -> 64, 3x3 p1
    if deepest < 3:
        return out
    # Mixed_3a: cat(maxpool(x), conv3x3 s2)
    x = rec(3, np.concatenate(
        [naive_maxpool_3x3_s2(x), b(3, "conv", x, stride=2)], axis=0))
    if deepest < 4:
        return out
    # Mixed_4a: cat(1x1->3x3, 1x1->1x7->7x1->3x3)
    b0 = b(4, "branch0.1", b(4, "branch0.0", x))
    b1 = b(4, "branch1.1", b(4, "branch1.0", x), pad=(0, 3))
    b1 = b(4, "branch1.2", b1, pad=(3, 0))
    b1 = b(4, "branch1.3", b1)
    x = rec(4, np.concatenate([b0, b1], axis=0))
    if deepest < 5:
        return out
    # Mixed_5a: cat(conv3x3 s2, maxpool)
    x = rec(5, np.concatenate(
        [b(5, "conv", x, stride=2), naive_maxpool_3x3_s2(x)], axis=0))
    for idx in range(6, min(deepest, 9) + 1):             # Inception_A x4
        b0 = b(idx, "branch0", x)
        b1 = b(idx, "branch1.1", b(idx, "branch1.0", x), pad=1)
        b2 = b(idx, "branch2.1", b(idx, "branch2.0", x), pad=1)
        b2 = b(idx, "branch2.2", b2, pad=1)
        b3 = b(idx, "branch3.1",
               naive_avgpool_3x3_s1_p1(x, include_pad=False))
        x = rec(idx, np.concatenate([b0, b1, b2, b3], axis=0))
    if deepest < 10:
        return out
    # Reduction_A: cat(conv3x3 s2, 1x1->3x3->3x3 s2, maxpool)
    b0 = b(10, "branch0", x, stride=2)
    b1 = b(10, "branch1.1", b(10, "branch1.0", x), pad=1)
    b1 = b(10, "branch1.2", b1, stride=2)
    x = rec(10, np.concatenate([b0, b1, naive_maxpool_3x3_s2(x)], axis=0))
    for idx in range(11, min(deepest, 17) + 1):           # Inception_B x7
        b0 = b(idx, "branch0", x)
        b1 = b(idx, "branch1.1", b(idx, "branch1.0", x), pad=(0, 3))
        b1 = b(idx, "branch1.2", b1, pad=(3, 0))
        b2 = b(idx, "branch2.1", b(idx, "branch2.0", x), pad=(3, 0))
        b2 = b(idx, "branch2.2", b2, pad=(0, 3))
        b2 = b(idx, "branch2.3", b2, pad=(3, 0))
        b2 = b(idx, "branch2.4", b2, pad=(0, 3))
        b3 = b(idx, "branch3.1",
               naive_avgpool_3x3_s1_p1(x, include_pad=False))
        x = rec(idx, np.concatenate([b0, b1, b2, b3], axis=0))
    if deepest < 18:
        return out
    # Reduction_B: cat(1x1->3x3 s2, 1x1->1x7->7x1->3x3 s2, maxpool)
    b0 = b(18, "branch0.1", b(18, "branch0.0", x), stride=2)
    b1 = b(18, "branch1.1", b(18, "branch1.0", x), pad=(0, 3))
    b1 = b(18, "branch1.2", b1, pad=(3, 0))
    b1 = b(18, "branch1.3", b1, stride=2)
    x = rec(18, np.concatenate([b0, b1, naive_maxpool_3x3_s2(x)], axis=0))
    for idx in range(19, min(deepest, 21) + 1):           # Inception_C x3
        b0 = b(idx, "branch0", x)
        b1_0 = b(idx, "branch1_0", x)
        b1 = np.concatenate([b(idx, "branch1_1a", b1_0, pad=(0, 1)),
                             b(idx, "branch1_1b", b1_0, pad=(1, 0))],
                            axis=0)
        b2 = b(idx, "branch2_1", b(idx, "branch2_0", x), pad=(1, 0))
        b2 = b(idx, "branch2_2", b2, pad=(0, 1))
        b2 = np.concatenate([b(idx, "branch2_3a", b2, pad=(0, 1)),
                             b(idx, "branch2_3b", b2, pad=(1, 0))],
                            axis=0)
        b3 = b(idx, "branch3.1",
               naive_avgpool_3x3_s1_p1(x, include_pad=False))
        x = rec(idx, np.concatenate([b0, b1, b2, b3], axis=0))
    return out


# ---------------------------------------------------------------------------
# BN-Inception: stem + all 10 modules, wiring per pretrainedmodels
# ---------------------------------------------------------------------------

BNI_EPS = 1e-5
# (stride, pool-branch kind) per module, straight from the BN paper /
# pretrainedmodels' bninception.py.  stride-2 modules have no 1x1 and no
# pool-proj branch (the pool passes through); every stride-1 module ends
# in a pooled 1x1 projection.
BNI_PLAN = {
    "3a": (1, "avg"), "3b": (1, "avg"), "3c": (2, "max"),
    "4a": (1, "avg"), "4b": (1, "avg"), "4c": (1, "avg"),
    "4d": (1, "avg"), "4e": (2, "max"),
    "5a": (1, "avg"), "5b": (1, "max"),
}


def bni_conv(x, p, name, stride=1, pad=0):
    """Conv WITH bias -> BatchNorm(eps=1e-5) -> ReLU."""
    h = naive_conv(x, p[name + ".weight"], stride, (pad,) * 4)
    h = h + p[name + ".bias"][:, None, None]
    return np.maximum(naive_bn(h, p, name + "_bn", BNI_EPS), 0.0)


def naive_bninception(x, p):
    """[3, H, W] image -> {inception_<name>: [C, H', W']} for all 10."""
    x = bni_conv(x, p, "conv1_7x7_s2", stride=2, pad=3)
    x = naive_maxpool_3x3_s2_ceil(x)
    x = bni_conv(x, p, "conv2_3x3_reduce")
    x = bni_conv(x, p, "conv2_3x3", pad=1)
    x = naive_maxpool_3x3_s2_ceil(x)
    out = {}
    for name, (stride, pool) in BNI_PLAN.items():
        pre = f"inception_{name}_"
        branches = []
        if stride == 1:
            branches.append(bni_conv(x, p, pre + "1x1"))
        y = bni_conv(x, p, pre + "3x3_reduce")
        branches.append(bni_conv(y, p, pre + "3x3", stride=stride, pad=1))
        y = bni_conv(x, p, pre + "double_3x3_reduce")
        y = bni_conv(y, p, pre + "double_3x3_1", pad=1)
        branches.append(bni_conv(y, p, pre + "double_3x3_2",
                                 stride=stride, pad=1))
        if stride == 2:
            branches.append(naive_maxpool_3x3_s2_ceil(x))
        else:
            pooled = (naive_avgpool_3x3_s1_p1(x, include_pad=True)
                      if pool == "avg" else naive_maxpool_3x3_s1_p1(x))
            branches.append(bni_conv(pooled, p, pre + "pool_proj"))
        x = np.concatenate(branches, axis=0)
        out[f"inception_{name}"] = x
    return out


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def _perturb_bn(params, rng):
    """Non-trivial BN statistics so normalization is actually exercised."""
    import jax.numpy as jnp

    def tweak(k, v):
        if "running_mean" in k or k.endswith("bn.bias"):
            return jnp.asarray(np.asarray(v)
                               + 0.1 * rng.standard_normal(v.shape),
                               jnp.float32)
        if "running_var" in k or k.endswith("bn.weight"):
            return jnp.asarray(np.asarray(v)
                               * (1.0 + 0.2 * rng.uniform(size=v.shape)),
                               jnp.float32)
        return v

    return {k: tweak(k, v) for k, v in params.items()}


class TestInceptionV4Oracle:
    def test_full_trunk_matches_naive(self):
        import jax.numpy as jnp

        from tpu_ac.models.inception import (INCEPTION_V4,
                                             inception_v4_forward,
                                             init_inception_v4_params)

        rng = np.random.default_rng(11)
        params = _perturb_bn(init_inception_v4_params(0, INCEPTION_V4), rng)
        # 75px: odd sizes at every stride-2 boundary (37/35/17/15/7/3/1),
        # exercising the no-pad floor pooling + valid convs.
        x = rng.standard_normal((1, 3, 75, 75)).astype(np.float32)
        taps = tuple(f"features.{i}" for i in (3, 4, 5, 6, 10, 11, 18, 19))
        got = inception_v4_forward(params, jnp.asarray(x), INCEPTION_V4,
                                   taps=taps)
        p64 = {k: np.asarray(v, np.float64) for k, v in params.items()}
        want = naive_inception_v4(x[0].astype(np.float64), p64, deepest=19)
        for t in taps:
            assert got[t].shape == (1, *want[t].shape), t
            np.testing.assert_allclose(
                np.asarray(got[t])[0], want[t], rtol=2e-3, atol=2e-4,
                err_msg=t)


class TestBNInceptionOracle:
    def test_full_trunk_matches_naive(self):
        import jax.numpy as jnp

        from tpu_ac.models.inception import (BNINCEPTION,
                                             bninception_forward,
                                             init_bninception_params)

        rng = np.random.default_rng(12)
        params = _perturb_bn(init_bninception_params(0, BNINCEPTION), rng)
        # 67px: ceil-mode pools clip a partial window at BOTH stem pools
        # (34 -> 17 -> 8), the semantics that differ from symmetric pad-1.
        x = rng.standard_normal((1, 3, 67, 67)).astype(np.float32)
        taps = ("inception_3a", "inception_3c", "inception_4e",
                "inception_5b")
        got = bninception_forward(params, jnp.asarray(x), BNINCEPTION,
                                  taps=taps)
        p64 = {k: np.asarray(v, np.float64) for k, v in params.items()}
        want = naive_bninception(x[0].astype(np.float64), p64)
        for t in taps:
            assert got[t].shape == (1, *want[t].shape), t
            np.testing.assert_allclose(
                np.asarray(got[t])[0], want[t], rtol=2e-3, atol=2e-4,
                err_msg=t)
