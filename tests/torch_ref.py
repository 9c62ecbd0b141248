"""Functional torch implementation of the DINO ViT math, for parity tests.

This is a test-only oracle: the standard pre-LN ViT forward (patch-conv ->
cls+pos -> [LN, MHSA, residual, LN, MLP, residual] x depth) evaluated with
torch primitives on CPU, driven by the same flat params dict tpu_ac uses.
It pins the exact op semantics (erf-GELU, eps=1e-6 LN, packed qkv, bicubic
pos-embed resize) that released DINO checkpoints assume.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(params, key):
    return torch.from_numpy(np.asarray(params[key]))


def torch_vit_blocks(params, images_np, cfg, taps):
    """Return {tap: block-output [B, N+1, D]} computed with torch ops."""
    x = torch.from_numpy(images_np)
    b = x.shape[0]
    d, nh = cfg.embed_dim, cfg.num_heads
    hd = d // nh
    scale = hd ** -0.5

    tokens = F.conv2d(x, _t(params, "patch_embed.proj.weight"),
                      _t(params, "patch_embed.proj.bias"),
                      stride=cfg.patch_size)
    tokens = tokens.flatten(2).transpose(1, 2)  # [B, N, D]
    cls = _t(params, "cls_token").expand(b, -1, -1)
    h = torch.cat([cls, tokens], dim=1)

    pos = _t(params, "pos_embed")
    npatch = h.shape[1] - 1
    n_ref = pos.shape[1] - 1
    img_h, img_w = images_np.shape[-2:]
    if not (npatch == n_ref and img_w == img_h):
        side = int(math.sqrt(n_ref))
        class_pos, patch_pos = pos[:, :1], pos[:, 1:]
        w0 = img_w // cfg.patch_size + 0.1
        h0 = img_h // cfg.patch_size + 0.1
        grid = patch_pos.reshape(1, side, side, d).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, scale_factor=(w0 / side, h0 / side),
                             mode="bicubic", recompute_scale_factor=False)
        pos = torch.cat([class_pos,
                         grid.permute(0, 2, 3, 1).reshape(1, -1, d)], dim=1)
    h = h + pos

    outs = {}
    depth = max(taps) + 1
    for i in range(depth):
        pre = f"blocks.{i}."
        y = F.layer_norm(h, (d,), _t(params, pre + "norm1.weight"),
                         _t(params, pre + "norm1.bias"), eps=cfg.ln_eps)
        qkv = F.linear(y, _t(params, pre + "attn.qkv.weight"),
                       _t(params, pre + "attn.qkv.bias"))
        qkv = qkv.reshape(b, -1, 3, nh, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * scale
        attn = attn.softmax(dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(b, -1, d)
        o = F.linear(o, _t(params, pre + "attn.proj.weight"),
                     _t(params, pre + "attn.proj.bias"))
        h = h + o
        y = F.layer_norm(h, (d,), _t(params, pre + "norm2.weight"),
                         _t(params, pre + "norm2.bias"), eps=cfg.ln_eps)
        y = F.linear(y, _t(params, pre + "mlp.fc1.weight"),
                     _t(params, pre + "mlp.fc1.bias"))
        y = F.gelu(y)
        y = F.linear(y, _t(params, pre + "mlp.fc2.weight"),
                     _t(params, pre + "mlp.fc2.bias"))
        h = h + y
        if i in taps:
            outs[i] = h.numpy()
    return outs
