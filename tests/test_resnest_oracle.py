"""Independent naive-loop oracle for the ResNeSt split-attention unit.

ResNeSt has no reference-tree source (timm loads it) and its SplAtConv2d
is the layout hotspot review passes kept finding bugs in (rsoftmax
radix/cardinality ordering, avd order).  This oracle re-implements the
official zhanghang1989/ResNeSt SplAtConv2d + rSoftMax definitions in
float64 numpy with EXPLICIT loops — per group, per radix chunk, per gate
element with hand-derived index arithmetic — sharing none of the JAX
implementation's reshape/transpose structure.
"""

from __future__ import annotations

import numpy as np
import pytest


def naive_grouped_conv(x, w, groups, stride=1, pad=0):
    """x [Cin, H, W], w [Cout, Cin/groups, kh, kw] -> [Cout, H', W']."""
    cin, h, wid = x.shape
    cout, cing, kh, kw = w.shape
    xp = np.zeros((cin, h + 2 * pad, wid + 2 * pad))
    xp[:, pad:pad + h, pad:pad + wid] = x
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (wid + 2 * pad - kw) // stride + 1
    out = np.zeros((cout, ho, wo))
    opg = cout // groups  # out channels per group
    for o in range(cout):
        g = o // opg
        xin = xp[g * cing:(g + 1) * cing]
        for i in range(ho):
            for j in range(wo):
                patch = xin[:, i * stride:i * stride + kh,
                            j * stride:j * stride + kw]
                out[o, i, j] = np.sum(patch * w[o])
    return out


def naive_bn(x, p, name, eps):
    w, b = p[name + ".weight"], p[name + ".bias"]
    m, v = p[name + ".running_mean"], p[name + ".running_var"]
    return ((x - m[:, None, None]) / np.sqrt(v[:, None, None] + eps)
            * w[:, None, None] + b[:, None, None])


def naive_rsoftmax(gate, radix, card):
    """Official rSoftMax via per-element index arithmetic.

    Input gate [radix*C] is laid out as the fc2 output: grouped by
    cardinality, i.e. viewed (card, radix, c') the channel index is
    k*(radix*c') + r*c' + j.  The official module transposes to
    radix-major, softmaxes over radix, and flattens WITHOUT transposing
    back, so output channel r*(card*c') + k*c' + j holds
    softmax_r(gate[k*(radix*c') + r*c' + j]).  radix == 1 -> sigmoid.
    """
    if radix == 1:
        return 1.0 / (1.0 + np.exp(-gate))
    n = gate.shape[0]
    cp = n // (card * radix)  # c'
    out = np.zeros_like(gate)
    for k in range(card):
        for j in range(cp):
            logits = np.array([gate[k * radix * cp + r * cp + j]
                               for r in range(radix)])
            e = np.exp(logits - logits.max())
            sm = e / e.sum()
            for r in range(radix):
                out[r * card * cp + k * cp + j] = sm[r]
    return out


def naive_splat(x, p, pre, radix, card, stride, eps):
    """Official SplAtConv2d for one sample: x [Cin, H, W] -> [C, H', W']."""
    y = naive_grouped_conv(x, p[pre + "conv.weight"], card * radix,
                           stride=stride, pad=1)
    y = np.maximum(naive_bn(y, p, pre + "bn0", eps), 0.0)
    rc = y.shape[0]
    c = rc // radix
    # torch.split(x, C, dim=1): radix chunk r = channels [r*C, (r+1)*C)
    splits = [y[r * c:(r + 1) * c] for r in range(radix)]
    gap = np.sum(splits, axis=0).mean(axis=(1, 2))  # [C]
    g = naive_grouped_conv(gap[:, None, None], p[pre + "fc1.weight"], card)
    g = g + p[pre + "fc1.bias"][:, None, None]
    g = np.maximum(naive_bn(g, p, pre + "bn1", eps), 0.0)
    g = naive_grouped_conv(g, p[pre + "fc2.weight"], card)
    g = (g + p[pre + "fc2.bias"][:, None, None])[:, 0, 0]  # [radix*C]
    atten = naive_rsoftmax(g, radix, card)
    out = np.zeros_like(splits[0])
    for r in range(radix):
        out += atten[r * c:(r + 1) * c][:, None, None] * splits[r]
    return out


def _make_params(rng, radix, card, gw, inter):
    p = {
        "u.conv.weight": rng.standard_normal(
            (gw * radix, gw // (card * radix), 3, 3)) * 0.3,
        "u.fc1.weight": rng.standard_normal((inter, gw // card, 1, 1)) * 0.3,
        "u.fc1.bias": rng.standard_normal((inter,)) * 0.1,
        "u.fc2.weight": rng.standard_normal(
            (gw * radix, inter // card, 1, 1)) * 0.3,
        "u.fc2.bias": rng.standard_normal((gw * radix,)) * 0.1,
    }
    for name, ch in (("u.bn0", gw * radix), ("u.bn1", inter)):
        p[name + ".weight"] = rng.uniform(0.5, 1.5, ch)
        p[name + ".bias"] = rng.standard_normal(ch) * 0.1
        p[name + ".running_mean"] = rng.standard_normal(ch) * 0.1
        p[name + ".running_var"] = rng.uniform(0.5, 1.5, ch)
    return p


class TestSplitAttentionOracle:
    @pytest.mark.parametrize("radix,card,stride", [
        (4, 2, 1),   # the resnest50d_4s2x40d configuration
        (2, 2, 2),   # strided variant, different radix
        (2, 1, 1),   # cardinality 1
        (1, 2, 1),   # sigmoid branch
    ])
    def test_splat_unit_parity(self, radix, card, stride):
        import dataclasses

        import jax

        from tpu_ac.models.resnest import RESNEST50D_4S2X40D, \
            _split_attn_conv

        gw, inter = 8, 8
        rng = np.random.default_rng(11)
        p64 = _make_params(rng, radix, card, gw, inter)
        x = rng.standard_normal((2, gw, 6, 6))

        cfg = dataclasses.replace(RESNEST50D_4S2X40D, radix=radix,
                                  cardinality=card)
        import jax.numpy as jnp

        pj = {k: jnp.asarray(v, jnp.float32) for k, v in p64.items()}
        got = np.asarray(_split_attn_conv(
            pj, "u.", jnp.asarray(x, jnp.float32), cfg, stride,
            jax.lax.Precision.HIGHEST))

        want = np.stack([
            naive_splat(x[i], p64, "u.", radix, card, stride, cfg.bn_eps)
            for i in range(x.shape[0])])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_rsoftmax_matches_naive(self):
        from tpu_ac.models.resnest import _rsoftmax

        rng = np.random.default_rng(3)
        for radix, card, cp in ((4, 2, 3), (2, 3, 2), (1, 2, 4)):
            g = rng.standard_normal((5, radix * card * cp))
            got = np.asarray(_rsoftmax(
                __import__("jax.numpy", fromlist=["asarray"]).asarray(
                    g.astype(np.float32)), radix, card))
            want = np.stack([naive_rsoftmax(g[i], radix, card)
                             for i in range(5)])
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
