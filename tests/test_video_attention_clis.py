"""End-to-end drives of the DAVIS video-segmentation and
visualize-attention CLIs.

The propagation math is invariant-tested in test_video_seg.py; these
exercise the argparse entry points (dino-main/eval_video_segmentation.py
and the fork's visualize_attention.py equivalents): dataset-tree walk,
the reference's resize rules, indexed-PNG output, per-block attention
figures, threshold masks.
"""

import os

import numpy as np
import pytest
from PIL import Image

from tpu_ac.cli.eval_video_segmentation import (
    davis_palette,
    imwrite_indexed,
    read_frame,
    read_seg,
)
from tpu_ac.cli.visualize_attention import threshold_masks


@pytest.fixture(scope="module")
def tiny_arch():
    from tpu_ac.models.registry import BackboneSpec, register_backbone
    from tpu_ac.models.vit import ViTConfig

    name = "tiny_test_videocli"
    register_backbone(name, BackboneSpec(
        "vit", ViTConfig(patch_size=8, embed_dim=32, depth=4, num_heads=2,
                         img_size=32), None))
    return name


@pytest.fixture(scope="module")
def davis_root(tmp_path_factory):
    """Minimal DAVIS-2017 tree: one 3-frame 64x64 video of a bright
    square moving on a dark background, first-frame indexed-PNG mask."""
    root = tmp_path_factory.mktemp("davis")
    vid = root / "JPEGImages" / "480p" / "vid1"
    ann = root / "Annotations" / "480p" / "vid1"
    sets = root / "ImageSets" / "2017"
    for d in (vid, ann, sets):
        d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for t in range(3):
        arr = rng.integers(0, 40, (64, 64, 3)).astype(np.uint8)
        off = 8 * t
        arr[16 + off:40 + off, 16:40] = 230
        Image.fromarray(arr).save(vid / f"{t:05d}.jpg", quality=95)
    labels = np.zeros((64, 64), np.uint8)
    labels[16:40, 16:40] = 1
    seg = Image.fromarray(labels)
    seg.putpalette(davis_palette().ravel().tolist())
    seg.save(ann / "00000.png")
    (sets / "val.txt").write_text("vid1\n")
    return str(root)


class TestDavisHelpers:
    def test_palette_is_voc(self):
        pal = davis_palette()
        assert pal.shape == (256, 3)
        np.testing.assert_array_equal(pal[0], [0, 0, 0])
        np.testing.assert_array_equal(pal[1], [128, 0, 0])
        np.testing.assert_array_equal(pal[2], [0, 128, 0])
        np.testing.assert_array_equal(pal[3], [128, 128, 0])
        np.testing.assert_array_equal(pal[4], [0, 0, 128])

    def test_read_frame_short_side_rule(self, davis_root):
        # a 128x64 (w x h) image: short side -> 32, long side floored
        # to a 64 multiple (eval_video_segmentation.py:199-215)
        p = os.path.join(davis_root, "wide.png")
        Image.new("RGB", (128, 64)).save(p)
        frame, ori_h, ori_w = read_frame(p, [32])
        assert (ori_h, ori_w) == (64, 128)
        assert frame.shape == (3, 32, 64)  # th=32, tw=(32*128/64)//64*64

    def test_read_frame_normalization(self, davis_root):
        p = os.path.join(davis_root, "gray.png")
        Image.new("RGB", (64, 64), (128, 128, 128)).save(p)
        frame, _, _ = read_frame(p, [32, 32])
        # the reference's quirky std[0]=0.228 (NOT 0.229)
        want = (128 / 255.0 - 0.485) / 0.228
        np.testing.assert_allclose(frame[0], want, atol=1e-5)

    def test_read_seg_grid(self, davis_root):
        ann = os.path.join(davis_root, "Annotations", "480p", "vid1",
                           "00000.png")
        onehot, ori = read_seg(ann, 8, [32, 32])
        assert onehot.shape == (2, 4, 4)  # 32/8 grid, 2 classes
        assert ori.shape == (64, 64)
        np.testing.assert_allclose(onehot.sum(0), 1.0)

    def test_imwrite_indexed_roundtrip(self, tmp_path):
        labels = np.arange(16, dtype=np.uint8).reshape(4, 4) % 3
        p = str(tmp_path / "seg.png")
        imwrite_indexed(p, labels, davis_palette())
        back = Image.open(p)
        assert back.mode == "P"
        np.testing.assert_array_equal(np.asarray(back), labels)
        with pytest.raises(ValueError):
            imwrite_indexed(p, np.zeros((2, 2, 3), np.uint8),
                            davis_palette())


class TestDavisCLI:
    def test_cli_end_to_end(self, davis_root, tiny_arch, tmp_path):
        from tpu_ac.cli.eval_video_segmentation import main

        out = str(tmp_path / "out")
        written = main(["--arch", tiny_arch, "--data_path", davis_root,
                        "--output_dir", out, "--scale_size", "32", "32",
                        "--n_last_frames", "2", "--topk", "2",
                        "--size_mask_neighborhood", "1", "--bs", "2"])
        names = sorted(os.path.basename(p) for p in written)
        assert names == ["00000.png", "00001.png", "00002.png"]
        # first frame: the annotation written back at original resolution
        first = Image.open(os.path.join(out, "vid1", "00000.png"))
        assert first.mode == "P"
        got = np.asarray(first)
        want = np.zeros((64, 64), np.uint8)
        want[16:40, 16:40] = 1
        np.testing.assert_array_equal(got, want)
        # propagated frames: original resolution, labels from {0, 1}
        for t in (1, 2):
            im = Image.open(os.path.join(out, "vid1", f"{t:05d}.png"))
            assert im.mode == "P" and im.size == (64, 64)
            assert set(np.unique(np.asarray(im))) <= {0, 1}


class TestVisualizeAttentionCLI:
    def test_threshold_masks_semantics(self):
        # visualize_attention.py:200-208: keep the TOP elements carrying
        # `threshold` of the mass (ascending cumsum > 1-threshold)
        att = np.asarray([[0.1, 0.4, 0.2, 0.3]], np.float32)
        np.testing.assert_array_equal(
            threshold_masks(att, 0.5)[0], [0.0, 1.0, 0.0, 1.0])
        # threshold ~1 keeps everything but the very smallest tail
        assert threshold_masks(att, 0.99)[0].sum() == 4

    def test_cli_end_to_end(self, tiny_arch, tmp_path):
        from tpu_ac.cli.visualize_attention import main

        # MVTec-style layout so the ground-truth overlay branch runs
        img_dir = tmp_path / "bottle" / "test" / "broken"
        gt_dir = tmp_path / "bottle" / "ground_truth" / "broken"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        img_path = str(img_dir / "000.png")
        Image.fromarray(arr).save(img_path)
        mask = np.zeros((64, 64), np.uint8)
        mask[20:40, 20:40] = 255
        Image.fromarray(mask).save(gt_dir / "000_mask.png")

        out = str(tmp_path / "viz")
        written = main(["--arch", tiny_arch, "--image_path", img_path,
                        "--output_dir", out, "--image_size", "32",
                        "--threshold", "0.6"])
        files = {os.path.basename(p) for p in written}
        assert "img.png" in files
        # one figure per block (depth=4)...
        for b in range(4):
            assert f"blocks.{b}_attn-head.png" in files
        # ...and one threshold mask per head (nh=2), final block's
        for j in range(2):
            assert f"mask_th0.6_head{j}.png" in files
        for p in written:
            assert os.path.getsize(p) > 0
