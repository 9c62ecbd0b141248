"""Flash (streaming-softmax) attention for the ViT trunk.

XLA's dense attention materializes the [B, H, S, S] probability tensor in
HBM — at the flagship embed shape (B=32, H=12, S=785, bf16) that is
~470 MB written + read back per block, and the measured 33 ms of
attention time per ViT-B forward is bandwidth, not FLOPs (the two
S x S x 64 matmuls are only ~60 GFLOP per block).  The Pallas TPU flash
kernel (jax.experimental.pallas.ops.tpu.flash_attention) keeps the
probability tiles in VMEM with an online softmax, so attention becomes
compute-bound.

Usage: pair with ``vit_forward(..., seq_pad=True)`` — the kernel tiles the
sequence in 128-wide blocks, so S must be a multiple of 128 (785 -> 896).
The padding mask arrives as the trunk's additive ``attn_bias`` and is
translated to the kernel's segment-id mask here.  Head dim 64 is padded to
the 128-lane width with zeros: QK^T and the output are unchanged (zero
columns contribute nothing), and the MXU runs 64-deep contractions at half
utilization anyway, so the padding costs no extra time.
"""

from __future__ import annotations

import jax.numpy as jnp


def flash_attention_impl(q, k, v, scale, attn_bias=None):
    """softmax(QK^T * scale)V via the Pallas TPU flash kernel.

    Args:
        q, k, v: [B, H, S, Dh] with S a multiple of 128.
        scale: softmax scale (head_dim ** -0.5).
        attn_bias: optional batch-uniform additive key mask of shape
            [1, ..., 1, S] from the trunk's seq_pad (finite = valid,
            very-negative = padding); converted to the kernel's segment-id
            mask.  Per-batch masks and genuinely additive biases are NOT
            representable as segment ids and are rejected — use the XLA
            attention path for those.
    Returns:
        [B, H, S, Dh]
    """
    import os

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, h, s, d = q.shape
    block_sizes = None
    bq = int(os.environ.get("TPU_AC_FLASH_BLOCK_Q", "0"))
    bk = int(os.environ.get("TPU_AC_FLASH_BLOCK_K", "0"))
    bb = int(os.environ.get("TPU_AC_FLASH_BLOCK_B", "1"))
    if bq or bk or bb > 1:
        bq = min(bq or 128, s)
        bk = min(bk or 128, s)
        block_sizes = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk,
                                 block_b=max(1, min(bb, b)))
    segment_ids = None
    if attn_bias is not None:
        if attn_bias.shape[-1] != s or \
                any(dim != 1 for dim in attn_bias.shape[:-1]):
            raise NotImplementedError(
                "flash attention_impl supports only a batch-uniform "
                f"[1, ..., 1, S] key mask; got {attn_bias.shape}. "
                "Per-batch or truly additive biases need the XLA path.")
        ids = (attn_bias.reshape(-1) < -1.0).astype(jnp.int32)  # [S]
        ids = jnp.broadcast_to(ids, (b, s))
        segment_ids = SegmentIds(q=ids, kv=ids)

    d_pad = (-d) % 128
    if d_pad:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    out = flash_attention(q, k, v, segment_ids=segment_ids,
                          sm_scale=float(scale), block_sizes=block_sizes)
    return out[..., :d] if d_pad else out


flash_attention_impl.handles_mask = True
