"""Independent naive-loop oracle for the Swin backbone.

Swin has no reference-tree source (timm loads it) and no released weights
in this environment, so tpu_ac/models/swin.py was previously guarded only
by structural invariants.  This oracle re-implements the upstream Swin
definition (microsoft/Swin-Transformer SwinTransformerBlock /
WindowAttention / PatchMerging semantics) in float64 numpy with EXPLICIT
loops — per window, per head, per token pair — deriving the relative-
position bias index, the shifted-window mask regions, and the patch-
merging neighborhood order directly from their definitions.  None of the
vectorized reshape/transpose tricks of the JAX implementation are shared,
so a layout mistake cannot appear identically in both (the failure class
four rounds of review kept finding in exactly these families).
"""

from __future__ import annotations

import numpy as np
import pytest


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _lin(x, w, b=None):
    y = x @ w.T
    return y if b is None else y + b


def _rel_bias(table, w, nh):
    """bias[h, p, q] = table[idx(p - q), h] — canonical per-pair loop."""
    n = w * w
    out = np.zeros((nh, n, n))
    for p in range(n):
        for q in range(n):
            dy = p // w - q // w
            dx = p % w - q % w
            idx = (dy + w - 1) * (2 * w - 1) + (dx + w - 1)
            out[:, p, q] = table[idx]
    return out


def _region(r, size, w, shift):
    """Pre-shift region id of a rolled row/col (window-mask semantics)."""
    if r < size - w:
        return 0
    if r < size - shift:
        return 1
    return 2


def _window_attn(xw, p, pre, nh, w, mask_bool):
    """One window [n, c] through multi-head attention, head by head."""
    n, c = xw.shape
    hd = c // nh
    qkv = _lin(xw, p[pre + "attn.qkv.weight"], p.get(pre + "attn.qkv.bias"))
    bias = _rel_bias(p[pre + "attn.relative_position_bias_table"], w, nh)
    heads = []
    for h in range(nh):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
        logits = q @ k.T * (hd ** -0.5) + bias[h]
        if mask_bool is not None:
            logits = logits + np.where(mask_bool, -100.0, 0.0)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        attn = e / e.sum(-1, keepdims=True)
        heads.append(attn @ v)
    out = np.concatenate(heads, axis=-1)
    return _lin(out, p[pre + "attn.proj.weight"], p[pre + "attn.proj.bias"])


def _block(x, p, pre, nh, w, shift, eps):
    """One image [H, W, C] through a Swin block, window by window."""
    hgt, wid, c = x.shape
    y = _ln(x, p[pre + "norm1.weight"], p[pre + "norm1.bias"], eps)
    if shift:
        y = np.roll(y, (-shift, -shift), axis=(0, 1))
    out = np.zeros_like(y)
    for wi in range(hgt // w):
        for wj in range(wid // w):
            rows = range(wi * w, (wi + 1) * w)
            cols = range(wj * w, (wj + 1) * w)
            xw = np.stack([y[r, cc] for r in rows for cc in cols])
            mask = None
            if shift:
                n = w * w
                mask = np.zeros((n, n), bool)
                toks = [(r, cc) for r in rows for cc in cols]
                for a, (ra, ca) in enumerate(toks):
                    for b_, (rb, cb) in enumerate(toks):
                        same = (_region(ra, hgt, w, shift)
                                == _region(rb, hgt, w, shift)) and \
                               (_region(ca, wid, w, shift)
                                == _region(cb, wid, w, shift))
                        mask[a, b_] = not same
            aw = _window_attn(xw, p, pre, nh, w, mask)
            for t, (r, cc) in enumerate(
                    [(r, cc) for r in rows for cc in cols]):
                out[r, cc] = aw[t]
    if shift:
        out = np.roll(out, (shift, shift), axis=(0, 1))
    x = x + out
    y = _ln(x, p[pre + "norm2.weight"], p[pre + "norm2.bias"], eps)
    y = _lin(y, p[pre + "mlp.fc1.weight"], p[pre + "mlp.fc1.bias"])
    from scipy.stats import norm

    y = y * norm.cdf(y)  # exact GELU
    y = _lin(y, p[pre + "mlp.fc2.weight"], p[pre + "mlp.fc2.bias"])
    return x + y


def _patch_merge(x, p, pre, eps):
    """[H, W, C] -> [H/2, W/2, 2C]: explicit 2x2 neighborhood gather in
    the upstream order (x0=(0,0), x1=(1,0), x2=(0,1), x3=(1,1))."""
    hgt, wid, c = x.shape
    out = np.zeros((hgt // 2, wid // 2, 4 * c))
    for i in range(hgt // 2):
        for j in range(wid // 2):
            out[i, j] = np.concatenate([
                x[2 * i, 2 * j], x[2 * i + 1, 2 * j],
                x[2 * i, 2 * j + 1], x[2 * i + 1, 2 * j + 1]])
    out = _ln(out, p[pre + "norm.weight"], p[pre + "norm.bias"], eps)
    return _lin(out, p[pre + "reduction.weight"])


def naive_swin_forward(p, images, cfg):
    """Per-image loop forward; returns {tap: [B, C, H, W]} like the JAX one."""
    ps, w, eps = cfg.patch_size, cfg.window_size, cfg.ln_eps
    conv_w = p["patch_embed.proj.weight"]  # [C, 3, ps, ps]
    outs: dict[str, list] = {}
    for img in images:  # [3, H, W]
        gh, gw = img.shape[1] // ps, img.shape[2] // ps
        x = np.zeros((gh, gw, conv_w.shape[0]))
        for i in range(gh):
            for j in range(gw):
                patch = img[:, i * ps:(i + 1) * ps, j * ps:(j + 1) * ps]
                x[i, j] = (conv_w.reshape(conv_w.shape[0], -1)
                           @ patch.reshape(-1)) + p["patch_embed.proj.bias"]
        x = _ln(x, p["patch_embed.norm.weight"],
                p["patch_embed.norm.bias"], eps)
        for li, (depth, nh) in enumerate(zip(cfg.depths, cfg.num_heads)):
            for bi in range(depth):
                shift = 0 if (bi % 2 == 0
                              or min(x.shape[0], x.shape[1]) <= w) \
                    else w // 2
                x = _block(x, p, f"layers.{li}.blocks.{bi}.", nh, w, shift,
                           eps)
            outs.setdefault(f"layers.{li}", []).append(x.transpose(2, 0, 1))
            if li < len(cfg.depths) - 1:
                x = _patch_merge(x, p, f"layers.{li}.downsample.", eps)
        xf = _ln(x, p["norm.weight"], p["norm.bias"], eps)
        outs.setdefault("final", []).append(xf.transpose(2, 0, 1))
    return {k: np.stack(v) for k, v in outs.items()}


class TestSwinOracle:
    @pytest.fixture(scope="class")
    def setup(self):
        import jax

        from tpu_ac.models.swin import SwinConfig, init_swin_params, \
            swin_forward

        # stage 0: 8x8 grid of window 4 -> shifted blocks active;
        # stage 1: 4x4 grid == window -> shift disabled (both paths hit)
        cfg = SwinConfig(patch_size=4, window_size=4, embed_dim=8,
                         depths=(2, 2), num_heads=(2, 4))
        params = init_swin_params(0, cfg)
        rng = np.random.default_rng(5)
        images = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        got = swin_forward(params, images, cfg,
                           taps=("layers.0", "layers.1"),
                           precision=jax.lax.Precision.HIGHEST)
        p64 = {k: np.asarray(v, np.float64) for k, v in params.items()}
        want = naive_swin_forward(p64, images.astype(np.float64), cfg)
        return got, want

    @pytest.mark.parametrize("tap", ["layers.0", "layers.1", "final"])
    def test_tap_parity(self, setup, tap):
        got, want = setup
        g = np.asarray(got[tap], np.float64)
        assert g.shape == want[tap].shape
        np.testing.assert_allclose(g, want[tap], rtol=2e-4, atol=2e-5)

    def test_shift_actually_differs(self, setup):
        """Regression guard for the mask itself: with the shifted-window
        mask removed, stage-0 outputs must CHANGE — i.e. the oracle's
        agreement above genuinely covers the mask, not just the unshifted
        path."""
        import tpu_ac.models.swin as S

        from tpu_ac.models.swin import SwinConfig, init_swin_params, \
            swin_forward

        cfg = SwinConfig(patch_size=4, window_size=4, embed_dim=8,
                         depths=(2,), num_heads=(2,))
        params = init_swin_params(0, cfg)
        rng = np.random.default_rng(5)
        images = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
        ref = np.asarray(swin_forward(params, images, cfg,
                                      taps=("layers.0",))["layers.0"])
        orig = S.shifted_window_mask
        try:
            S.shifted_window_mask = lambda h, ww, w, s: np.zeros(
                ((h // w) * (ww // w), w * w, w * w), np.float32)
            unmasked = np.asarray(swin_forward(
                params, images, cfg, taps=("layers.0",))["layers.0"])
        finally:
            S.shifted_window_mask = orig
        assert np.abs(ref - unmasked).max() > 1e-4
