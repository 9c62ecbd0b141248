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


def torch_embed_pipeline(block_outputs, pretrain_dim, target_dim, patchsize=3):
    """Reference _embed tail (patchcore.py:355-431) with torch ops.

    block_outputs: list of [B, N+1, D] numpy token tensors (tapped blocks).
    Returns [B, P, target_dim] numpy.
    """
    feats = []
    for arr in block_outputs:
        f = torch.from_numpy(arr)
        f = f[:, 1:, :]
        g = int(math.sqrt(f.shape[1]))
        f = f.reshape(f.shape[0], g, g, f.shape[2]).permute(0, 3, 1, 2)
        ln = torch.nn.LayerNorm([f.shape[1], f.shape[2], f.shape[3]])
        with torch.no_grad():
            f = ln(f)
        feats.append(f)

    pad = (patchsize - 1) // 2
    unfolder = torch.nn.Unfold(kernel_size=patchsize, stride=1, padding=pad)
    patched, grids = [], []
    for f in feats:
        u = unfolder(f)
        u = u.reshape(*f.shape[:2], patchsize, patchsize, -1)
        u = u.permute(0, 4, 1, 2, 3)  # [B, P, C, k, k]
        patched.append(u)
        grids.append((f.shape[2], f.shape[3]))

    ref = grids[0]
    for i in range(1, len(patched)):
        if grids[i] != ref:
            x = patched[i]
            b, _, c, k, _ = x.shape
            x = x.reshape(b, grids[i][0], grids[i][1], c, k, k)
            x = x.permute(0, 3, 4, 5, 1, 2)
            shp = x.shape
            x = x.reshape(-1, *x.shape[-2:])
            x = F.interpolate(x.unsqueeze(1), size=ref, mode="bilinear",
                              align_corners=False).squeeze(1)
            x = x.reshape(*shp[:-2], *ref)
            x = x.permute(0, 4, 5, 1, 2, 3).reshape(b, ref[0] * ref[1], c, k, k)
            patched[i] = x

    b, p = patched[0].shape[:2]
    pooled = []
    for x in patched:
        flat = x.reshape(b * p, 1, -1)
        pooled.append(F.adaptive_avg_pool1d(flat, pretrain_dim).squeeze(1))
    stacked = torch.stack(pooled, dim=1)  # [B*P, L, pretrain]
    agg = F.adaptive_avg_pool1d(stacked.reshape(b * p, 1, -1), target_dim)
    return agg.reshape(b, p, target_dim).numpy()


def torch_alpha_unsupervised(Z_np, tau):
    """Reference Matrix_Alpha_Unsupervised (utils.py:222-257) verbatim math."""
    Z = torch.from_numpy(Z_np)
    rows = []
    for i in range(Z.shape[0]):
        mins = []
        for j in range(Z.shape[0]):
            if j != i:
                mins.append(torch.min(torch.cdist(Z[i], Z[j]), 1)[0])
        w = torch.stack(mins, dim=1).mean(dim=1).double()
        if math.isclose(tau, 0):
            a = (w == w.max()).double()
        else:
            a = torch.exp(w / tau)
        rows.append((a / a.sum()).numpy())
    return np.stack(rows)


def torch_alpha_supervised(Z_np, Ztr_np, tau):
    """Reference Matrix_Alpha_Supervised (utils.py:230-277) verbatim math."""
    Z = torch.from_numpy(Z_np)
    Ztr = torch.from_numpy(Ztr_np)
    rows = []
    for i in range(Z.shape[0]):
        mins = []
        for j in range(Ztr.shape[0]):
            mins.append(torch.min(torch.cdist(Z[i], Ztr[j]), 1)[0])
        w = torch.stack(mins, dim=1).min(dim=1)[0].double()
        if math.isclose(tau, 0):
            a = (w == w.max()).double()
        else:
            a = torch.exp(w / tau)
        rows.append((a / a.sum()).numpy())
    return np.stack(rows)


def torch_resnet_forward(params, images_np, cfg, taps=("layer2", "layer3")):
    """Inference-mode torchvision-style bottleneck ResNet with torch ops."""
    x = torch.from_numpy(images_np)

    def conv(x, name, stride=1, padding=0):
        return F.conv2d(x, _t(params, name + ".weight"), stride=stride,
                        padding=padding)

    def bn(x, name):
        return F.batch_norm(
            x, _t(params, name + ".running_mean"),
            _t(params, name + ".running_var"),
            _t(params, name + ".weight"), _t(params, name + ".bias"),
            training=False, eps=cfg.bn_eps)

    x = F.relu(bn(conv(x, "conv1", stride=2, padding=3), "bn1"))
    x = F.max_pool2d(x, kernel_size=3, stride=2, padding=1)

    stages = ("layer1", "layer2", "layer3", "layer4")
    deepest = max(stages.index(t) for t in taps)
    outs = {}
    for li in range(deepest + 1):
        stage = stages[li]
        for b in range(cfg.block_counts[li]):
            pre = f"{stage}.{b}."
            stride = (1 if li == 0 else 2) if b == 0 else 1
            identity = x
            out = F.relu(bn(conv(x, pre + "conv1"), pre + "bn1"))
            out = F.relu(bn(conv(out, pre + "conv2", stride=stride,
                                 padding=1), pre + "bn2"))
            out = bn(conv(out, pre + "conv3"), pre + "bn3")
            if pre + "downsample.0.weight" in params:
                identity = bn(conv(x, pre + "downsample.0", stride=stride),
                              pre + "downsample.1")
            x = F.relu(out + identity)
        if stage in taps:
            outs[stage] = x.numpy()
    return outs
