"""Attention-video generation (dino-main/video_generation.py:40-296).

The reference extracts per-frame last-block CLS attention maps and stitches
them into a video with ffmpeg.  Here frame rendering is the same
(attention_maps over each frame); assembly uses PIL's animated-GIF writer
so no external binary is required, with optional ffmpeg when present.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
from PIL import Image


def render_attention_frames(params, frames_chw: np.ndarray, vit_cfg,
                            head: int | str = "mean") -> list[np.ndarray]:
    """Per-frame attention heat maps: [T, 3, H, W] -> list of [H, W]."""
    from tpu_ac.viz.plots import attention_maps

    out = []
    for frame in frames_chw:
        maps = attention_maps(params, frame, vit_cfg)
        m = maps.mean(axis=0) if head == "mean" else maps[int(head)]
        out.append(m)
    return out


def _colorize(m: np.ndarray) -> np.ndarray:
    """Map [H, W] scores to an RGB inferno-like gradient without pyplot."""
    m = m - m.min()
    m = m / max(m.max(), 1e-12)
    r = np.clip(3 * m, 0, 1)
    g = np.clip(3 * m - 1, 0, 1)
    b = np.clip(3 * m - 2, 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def write_video(frames: list[np.ndarray], out_path: str, fps: int = 10
                ) -> str:
    """Assemble heat-map frames into an animated GIF (or mp4 via ffmpeg
    when available and out_path endswith .mp4)."""
    rgb = [Image.fromarray(_colorize(f)) for f in frames]
    if out_path.endswith(".mp4") and shutil.which("ffmpeg"):
        tmpdir = out_path + ".frames"
        os.makedirs(tmpdir, exist_ok=True)
        for i, im in enumerate(rgb):
            im.save(os.path.join(tmpdir, f"{i:06d}.png"))
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(fps), "-i",
             os.path.join(tmpdir, "%06d.png"), "-pix_fmt", "yuv420p",
             out_path], check=True, capture_output=True)
        shutil.rmtree(tmpdir)
        return out_path
    gif_path = out_path if out_path.endswith(".gif") else out_path + ".gif"
    rgb[0].save(gif_path, save_all=True, append_images=rgb[1:],
                duration=int(1000 / fps), loop=0)
    return gif_path


def generate_attention_video(params, frames_chw: np.ndarray, vit_cfg,
                             out_path: str, fps: int = 10,
                             head: int | str = "mean") -> str:
    """End-to-end VideoGenerator equivalent: frames -> attention video."""
    heat = render_attention_frames(params, frames_chw, vit_cfg, head)
    return write_video(heat, out_path, fps)
