"""Independent naive-loop oracle for XCiT's attention units.

XCiT has no reference-tree source (torch.hub loads it), so the
cross-covariance attention (XCA: channel-vs-channel attention over
L2-normalized transposed features with a learnable per-head temperature),
the LPI depthwise-conv mixer, and the class-attention block (including
the official code's residual-doubling quirk, PARITY.md #12) are
re-derived here from the facebookresearch/xcit definitions in float64
numpy with explicit per-head / per-channel / per-token loops — none of
the JAX implementation's reshape/transpose structure is shared.
"""

from __future__ import annotations

import numpy as np
import pytest

from scipy.stats import norm as _norm


def _gelu(x):
    return x * _norm.cdf(x)


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _lin(x, w, b=None):
    y = x @ w.T
    return y if b is None else y + b


def naive_xca(x, p, pre, nh, temperature):
    """One sample [N, D]: per-head channel-attention with explicit loops."""
    n, d = x.shape
    hd = d // nh
    qkv = _lin(x, p[pre + "attn.qkv.weight"], p.get(pre + "attn.qkv.bias"))
    out = np.zeros((n, d))
    for h in range(nh):
        # transposed per-head features: rows = channels, cols = tokens
        qt = qkv[:, h * hd:(h + 1) * hd].T.copy()
        kt = qkv[:, d + h * hd:d + (h + 1) * hd].T.copy()
        vt = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd].T.copy()
        for c in range(hd):  # L2-normalize each channel vector over tokens
            qt[c] /= max(np.linalg.norm(qt[c]), 1e-12)
            kt[c] /= max(np.linalg.norm(kt[c]), 1e-12)
        temp = float(np.asarray(temperature)[h].reshape(()))
        logits = np.zeros((hd, hd))
        for c1 in range(hd):
            for c2 in range(hd):
                logits[c1, c2] = temp * float(qt[c1] @ kt[c2])
        e = np.exp(logits - logits.max(-1, keepdims=True))
        attn = e / e.sum(-1, keepdims=True)
        ot = attn @ vt  # [hd, N]
        out[:, h * hd:(h + 1) * hd] = ot.T
    return _lin(out, p[pre + "attn.proj.weight"], p[pre + "attn.proj.bias"])


def naive_dwconv3(g, w, bias):
    """Depthwise 3x3, pad 1: g [D, H, W], w [D, 1, 3, 3]."""
    d, h, wid = g.shape
    gp = np.zeros((d, h + 2, wid + 2))
    gp[:, 1:-1, 1:-1] = g
    out = np.zeros_like(g)
    for c in range(d):
        for i in range(h):
            for j in range(wid):
                out[c, i, j] = np.sum(gp[c, i:i + 3, j:j + 3] * w[c, 0]) \
                    + bias[c]
    return out


def naive_lpi(x, p, pre, hp, wp, bn_eps):
    """[N, D] tokens -> depthwise conv / GELU / BN / depthwise conv."""
    n, d = x.shape
    g = x.T.reshape(d, hp, wp)
    g = naive_dwconv3(g, p[pre + "local_mp.conv1.weight"],
                      p[pre + "local_mp.conv1.bias"])
    g = _gelu(g)
    bnp = pre + "local_mp.bn"
    g = ((g - p[bnp + ".running_mean"][:, None, None])
         / np.sqrt(p[bnp + ".running_var"][:, None, None] + bn_eps)
         * p[bnp + ".weight"][:, None, None]
         + p[bnp + ".bias"][:, None, None])
    g = naive_dwconv3(g, p[pre + "local_mp.conv2.weight"],
                      p[pre + "local_mp.conv2.bias"])
    return g.reshape(d, n).T


def naive_class_attention(x, p, pre, nh):
    """Official ClassAttention: CLS-query over all tokens, per head."""
    n, d = x.shape
    hd = d // nh
    qkv = _lin(x, p[pre + "attn.qkv.weight"], p.get(pre + "attn.qkv.bias"))
    cls = np.zeros((d,))
    for h in range(nh):
        q0 = qkv[0, h * hd:(h + 1) * hd]
        logits = np.array([
            float(q0 @ qkv[t, d + h * hd:d + (h + 1) * hd]) * hd ** -0.5
            for t in range(n)])
        e = np.exp(logits - logits.max())
        attn = e / e.sum()
        for t in range(n):
            cls[h * hd:(h + 1) * hd] += \
                attn[t] * qkv[t, 2 * d + h * hd:2 * d + (h + 1) * hd]
    cls = _lin(cls[None], p[pre + "attn.proj.weight"],
               p[pre + "attn.proj.bias"])[0]
    return np.concatenate([cls[None], x[1:]], axis=0)


def naive_cls_attn_block(x, p, pre, nh, eps, tokens_norm):
    """facebookresearch/xcit ClassAttentionBlock incl. the residual that
    re-adds the full concatenated tensor (doubling patch tokens)."""
    y = _ln(x, p[pre + "norm1.weight"], p[pre + "norm1.bias"], eps)
    x = x + p[pre + "gamma1"] * naive_class_attention(y, p, pre, nh)
    if tokens_norm:
        x = _ln(x, p[pre + "norm2.weight"], p[pre + "norm2.bias"], eps)
    else:
        cls_n = _ln(x[:1], p[pre + "norm2.weight"], p[pre + "norm2.bias"],
                    eps)
        x = np.concatenate([cls_n, x[1:]], axis=0)
    x_res = x
    cls = _lin(x[:1], p[pre + "mlp.fc1.weight"], p[pre + "mlp.fc1.bias"])
    cls = _lin(_gelu(cls), p[pre + "mlp.fc2.weight"],
               p[pre + "mlp.fc2.bias"])
    cls = p[pre + "gamma2"] * cls
    return x_res + np.concatenate([cls, x[1:]], axis=0)


@pytest.fixture(scope="module")
def xcit_setup():
    import jax.numpy as jnp

    from tpu_ac.models.xcit import XCiTConfig, init_xcit_params

    cfg = XCiTConfig(patch_size=16, embed_dim=16, depth=2, num_heads=2,
                     cls_attn_layers=1)
    params = init_xcit_params(0, cfg)
    # break the symmetric init so the oracle is non-trivial
    rng = np.random.default_rng(9)
    params = {k: (jnp.asarray(np.asarray(v)
                              + 0.05 * rng.standard_normal(v.shape),
                              jnp.float32)
                  if k.endswith(("temperature", "gamma1", "gamma2",
                                 "gamma3"))
                  or ".bn" in k or "running" in k else v)
              for k, v in params.items()}
    p64 = {k: np.asarray(v, np.float64) for k, v in params.items()}
    return cfg, params, p64, rng


class TestXCAOracle:
    def test_xca_parity(self, xcit_setup):
        import jax
        import jax.numpy as jnp

        from tpu_ac.models.xcit import xca

        cfg, params, p64, rng = xcit_setup
        x = rng.standard_normal((2, 9, cfg.embed_dim)).astype(np.float32)
        got = np.asarray(xca(params, "blocks.0.", jnp.asarray(x), cfg,
                             jax.lax.Precision.HIGHEST))
        want = np.stack([
            naive_xca(x[i].astype(np.float64), p64, "blocks.0.",
                      cfg.num_heads, p64["blocks.0.attn.temperature"])
            for i in range(2)])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_lpi_parity(self, xcit_setup):
        import jax
        import jax.numpy as jnp

        from tpu_ac.models.xcit import lpi

        cfg, params, p64, rng = xcit_setup
        x = rng.standard_normal((2, 9, cfg.embed_dim)).astype(np.float32)
        got = np.asarray(lpi(params, "blocks.0.", jnp.asarray(x), 3, 3,
                             cfg, jax.lax.Precision.HIGHEST))
        want = np.stack([
            naive_lpi(x[i].astype(np.float64), p64, "blocks.0.", 3, 3,
                      cfg.bn_eps)
            for i in range(2)])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    @pytest.mark.parametrize("tokens_norm", [True, False])
    def test_cls_attn_block_parity(self, xcit_setup, tokens_norm):
        import dataclasses

        import jax
        import jax.numpy as jnp

        from tpu_ac.models.xcit import cls_attn_block

        cfg, params, p64, rng = xcit_setup
        cfg2 = dataclasses.replace(cfg, tokens_norm=tokens_norm)
        x = rng.standard_normal((2, 10, cfg.embed_dim)).astype(np.float32)
        got = np.asarray(cls_attn_block(params, 0, jnp.asarray(x), cfg2,
                                        jax.lax.Precision.HIGHEST))
        want = np.stack([
            naive_cls_attn_block(x[i].astype(np.float64), p64,
                                 "cls_attn_blocks.0.", cfg.num_heads,
                                 cfg.ln_eps, tokens_norm)
            for i in range(2)])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
