"""DAVIS-2017 video object segmentation CLI — dino-main/
eval_video_segmentation.py rebuilt TPU-native.

Protocol (eval_video_segmentation.py:252-295): walk
``<data_path>/ImageSets/2017/val.txt``; per video read the frames from
``JPEGImages/480p/<video>`` and the first frame's indexed-PNG annotation
from ``Annotations/480p/<video>``, propagate the mask frame-by-frame
through DINO patch features (first frame + the ``n_last_frames`` most
recent predictions as context), and write per-frame indexed PNGs.

TPU-native differences from the reference:

- frames are embedded in fixed-size batches through ONE jitted ViT
  program (the reference re-runs the model per frame, batch_size=1);
- the propagation step (affinity softmax + neighborhood mask + top-k
  sparsification + label averaging) is the jitted
  :func:`tpu_ac.train.video_seg.propagate_labels` — one program per
  (grid, context-size) shape;
- the DAVIS color palette is generated bitwise (the standard PASCAL-VOC
  colormap) instead of downloaded from the UVC repo
  (eval_video_segmentation.py:280-283) — this environment has no egress,
  and the palette is deterministic anyway.

    python -m tpu_ac.cli.eval_video_segmentation \
        --data_path /path/to/davis --output_dir out/ [--arch dino_deitsmall16]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from PIL import Image

# the reference's color_normalize defaults (eval_video_segmentation.py:244):
# std[0] is 0.228 — NOT torchvision's usual 0.229 — reproduced verbatim
_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_STD = np.asarray([0.228, 0.224, 0.225], np.float32)


def davis_palette() -> np.ndarray:
    """[256, 3] uint8 PASCAL-VOC/DAVIS palette (bitwise colormap; equals
    the UVC palette.txt the reference fetches over HTTP)."""
    pal = np.zeros((256, 3), np.uint8)
    for i in range(256):
        lab, j = i, 0
        while lab:
            for c in range(3):
                pal[i, c] |= ((lab >> c) & 1) << (7 - j)
            lab >>= 3
            j += 1
    return pal


def imwrite_indexed(filename: str, array: np.ndarray,
                    palette: np.ndarray) -> None:
    """Save a [H, W] uint8 label map as an indexed PNG
    (eval_video_segmentation.py:167-175)."""
    if array.ndim != 2:
        raise ValueError("Saving indexed PNGs requires 2D array.")
    im = Image.fromarray(array.astype(np.uint8))
    im.putpalette(palette.ravel().tolist())
    im.save(filename, format="PNG")


def _scaled_hw(h: int, w: int, scale_size: list[int]) -> tuple[int, int]:
    """read_frame's resize rule (eval_video_segmentation.py:199-215):
    short side pinned to scale_size[0], long side floored to a multiple
    of 64."""
    if len(scale_size) == 1:
        s = scale_size[0]
        if h > w:
            tw = s
            th = int(((s * h) / w) // 64 * 64)
        else:
            th = s
            tw = int(((s * w) / h) // 64 * 64)
    else:
        th, tw = scale_size
    return th, tw


def read_frame(path: str, scale_size: list[int]
               ) -> tuple[np.ndarray, int, int]:
    """One frame -> normalized [3, th, tw] float32 + original size."""
    img = Image.open(path).convert("RGB")
    ori_w, ori_h = img.size
    th, tw = _scaled_hw(ori_h, ori_w, scale_size)
    arr = np.asarray(img.resize((tw, th), Image.BILINEAR), np.float32) / 255.0
    arr = (arr - _MEAN) / _STD
    return arr.transpose(2, 0, 1), ori_h, ori_w


def read_seg(path: str, patch_size: int, scale_size: list[int]
             ) -> tuple[np.ndarray, np.ndarray]:
    """First-frame annotation -> ([C, h, w] one-hot at the patch grid,
    original-resolution label map).

    Mirrors read_seg (eval_video_segmentation.py:226-241) including its
    quirk: with a 2-element scale_size the reference reads it as
    (width, height) here but (height, width) in read_frame — only the
    1-element default path is self-consistent, and only it is ever used
    by the reference's __main__.
    """
    from tpu_ac.train.video_seg import to_one_hot

    seg = Image.open(path)
    _w, _h = seg.size
    if len(scale_size) == 1:
        s = scale_size[0]
        if _w > _h:
            _th = s
            _tw = int(((s * _w) / _h) // 64 * 64)
        else:
            _tw = s
            _th = int(((s * _h) / _w) // 64 * 64)
    else:
        _th, _tw = scale_size[1], scale_size[0]
    small = seg.resize((_tw // patch_size, _th // patch_size),
                       Image.NEAREST)
    labels = np.asarray(small, np.int64)
    return to_one_hot(labels), np.asarray(seg)


def _embed_frames(params, imgs, cfg):
    """Last-block final-norm'd patch features, [B, h*w, D].

    Module-level jit (cfg static): the jit cache persists across videos,
    so every video of the same (batch, H, W) shape reuses one executable
    instead of re-tracing per call.
    """
    from tpu_ac.models.vit import vit_intermediate_layers

    out = vit_intermediate_layers(params, imgs, cfg, n=1)[0]
    skip = getattr(cfg, "num_prefix_tokens", 1)
    return out[:, skip:, :]


def _extract_features(params, cfg, frames: list[np.ndarray],
                      batch_size: int) -> list[np.ndarray]:
    """Last-block final-norm'd patch features per frame, [h*w, D] each.

    Batched through one jitted program per (batch, H, W) shape — the last
    chunk is wrap-padded so every dispatch reuses the same executable.
    """
    import jax
    import jax.numpy as jnp

    global _EMBED_JIT
    if _EMBED_JIT is None:
        _EMBED_JIT = jax.jit(_embed_frames,
                             static_argnames=("cfg",))

    feats: list[np.ndarray] = []
    n = len(frames)
    for start in range(0, n, batch_size):
        chunk = frames[start:start + batch_size]
        pad = batch_size - len(chunk)
        batch = np.stack(chunk + [chunk[-1]] * pad)
        out = np.asarray(_EMBED_JIT(params, jnp.asarray(batch), cfg=cfg))
        feats.extend(out[: len(chunk)])
    return feats


_EMBED_JIT = None


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "Evaluation with video object segmentation on DAVIS 2017 "
        "(TPU-native)")
    p.add_argument("--arch", default="dino_deitsmall16",
                   help="backbone registry name (the reference's "
                        "vit_small/patch 16 default)")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--output_dir", default=".",
                   help="Path where to save segmentations")
    p.add_argument("--data_path", required=True, type=str)
    p.add_argument("--n_last_frames", type=int, default=7,
                   help="number of preceeding frames")
    p.add_argument("--size_mask_neighborhood", default=12, type=int,
                   help="restrict sources to a spatial neighborhood of "
                        "the query")
    p.add_argument("--topk", type=int, default=5,
                   help="accumulate label from top k neighbors")
    p.add_argument("--bs", type=int, default=6,
                   help="feature-extraction batch size")
    p.add_argument("--scale_size", type=int, nargs="+", default=[480],
                   help="frame resize (1 value: short side, long side "
                        "floored to 64; 2 values: exact h w — HAZARD: "
                        "read_seg interprets two values as (w, h), the "
                        "reference's internal quirk (PARITY #19), so two "
                        "UNEQUAL values transpose the seg grid vs the "
                        "feature grid and produce garbage propagation)")
    p.add_argument("--video_list", default=None,
                   help="override ImageSets/2017/val.txt")
    return p


def main(argv=None) -> list[str]:
    args = build_parser().parse_args(argv)
    if len(args.scale_size) == 2 and args.scale_size[0] != args.scale_size[1]:
        import warnings
        warnings.warn(
            "--scale_size with two UNEQUAL values: read_frame treats them "
            "as (h, w) but read_seg as (w, h) — the reference's internal "
            "quirk (PARITY #19) — so the seg grid is transposed vs the "
            "feature grid and propagation will produce garbage. Use one "
            "value (short side) or two equal values.", stacklevel=1)
    from tpu_ac.models.registry import load_backbone
    from tpu_ac.ops.interpolate import interpolate_bilinear
    from tpu_ac.train.video_seg import norm_mask, propagate_video

    params, cfg, family = load_backbone(args.arch,
                                        checkpoint_dir=args.checkpoint_dir)
    if family != "vit":
        raise SystemExit(f"Architecture {args.arch} non supported")
    patch = cfg.patch_size
    palette = davis_palette()

    list_path = args.video_list or os.path.join(
        args.data_path, "ImageSets", "2017", "val.txt")
    with open(list_path) as f:
        video_names = [ln.strip() for ln in f if ln.strip()]

    written: list[str] = []
    for vi, video_name in enumerate(video_names):
        print(f"[{vi}/{len(video_names)}] Begin to segmentate video "
              f"{video_name}.")
        video_dir = os.path.join(args.data_path, "JPEGImages", "480p",
                                 video_name)
        frame_list = sorted(glob.glob(os.path.join(video_dir, "*.jpg")))
        if not frame_list:
            raise SystemExit(f"no frames under {video_dir}")
        seg_path = (frame_list[0]
                    .replace("JPEGImages", "Annotations")
                    .replace("jpg", "png"))
        first_seg, seg_ori = read_seg(seg_path, patch, args.scale_size)

        out_dir = os.path.join(args.output_dir, video_name)
        os.makedirs(out_dir, exist_ok=True)
        out0 = os.path.join(out_dir, "00000.png")
        imwrite_indexed(out0, seg_ori, palette)
        written.append(out0)

        frames, ori_h, ori_w = [], None, None
        for fp in frame_list:
            fr, ori_h, ori_w = read_frame(fp, args.scale_size)
            frames.append(fr)
        th, tw = frames[0].shape[1:]
        grid = (th // patch, tw // patch)
        feats = _extract_features(params, cfg, frames, args.bs)

        segs = propagate_video(
            feats, first_seg, grid, n_last_frames=args.n_last_frames,
            topk=args.topk,
            size_mask_neighborhood=args.size_mask_neighborhood,
            normalize=False)
        for fp, seg in zip(frame_list[1:], segs[1:]):
            # upsample x patch FIRST, then norm_mask + argmax — the
            # reference's order (eval_video_segmentation.py:76-80)
            up = np.asarray(interpolate_bilinear(
                seg[None], size=(grid[0] * patch, grid[1] * patch),
                scale_factor=(float(patch), float(patch)))[0])
            lab = np.argmax(norm_mask(up), axis=0).astype(np.uint8)
            lab = np.asarray(
                Image.fromarray(lab).resize((ori_w, ori_h), Image.NEAREST))
            out_p = os.path.join(
                out_dir, os.path.basename(fp).replace(".jpg", ".png"))
            imwrite_indexed(out_p, lab, palette)
            written.append(out_p)
    return written


if __name__ == "__main__":
    main()
