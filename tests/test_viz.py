"""Visualization utilities (headless Agg backend)."""

import os

import numpy as np
import pytest


class TestViz:
    def test_alpha_heatmap_upsamples(self, rng):
        from tpu_ac.viz import alpha_heatmap

        alpha = rng.uniform(size=16).astype(np.float32)
        heat = alpha_heatmap(alpha, upsample=8)
        assert heat.shape == (32, 32)
        assert heat.max() == pytest.approx(1.0)

    def test_visualize_alpha_saves(self, rng, tmp_path):
        from tpu_ac.viz import visualize_alpha_on_image

        img = rng.standard_normal((3, 32, 32)).astype(np.float32)
        alpha = rng.uniform(size=16)
        path = str(tmp_path / "alpha.png")
        visualize_alpha_on_image(img, alpha, save_path=path)
        assert os.path.exists(path)

    def test_results_csv_roundtrip(self, tmp_path):
        from tpu_ac.viz import read_results_csv, draw_metrics

        csv_path = tmp_path / "r.csv"
        csv_path.write_text(
            "unsupervised\nCategory,NMI,ARI,F1\n---,---,---,---\n"
            "TAU=1.0\nbottle,0.5,0.4,0.6\ncable,0.3,0.2,0.4\n"
            "TAU=2.0\nbottle,0.6,0.5,0.7\ncable,0.2,0.1,0.3\n")
        res = read_results_csv(str(csv_path))
        assert res[1.0]["bottle"] == (0.5, 0.4, 0.6)
        assert res[2.0]["cable"] == (0.2, 0.1, 0.3)
        out = str(tmp_path / "plot.png")
        draw_metrics(res, ["bottle", "cable"], "NMI", save_path=out)
        assert os.path.exists(out)

    def test_plot_segmentation_images(self, rng, tmp_path):
        from PIL import Image
        from tpu_ac.viz import plot_segmentation_images

        img_path = str(tmp_path / "img.png")
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(img_path)
        segs = rng.uniform(size=(1, 32, 32))
        out = str(tmp_path / "segs")
        plot_segmentation_images(out, [img_path], segs,
                                 anomaly_scores=[0.7])
        assert os.path.exists(os.path.join(out, "segmentation_0000.png"))

    def test_attention_maps(self, rng, tmp_path):
        from tpu_ac.models import ViTConfig, init_vit_params
        from tpu_ac.viz import attention_maps

        cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                        img_size=32)
        params = init_vit_params(0, cfg)
        img = rng.standard_normal((3, 32, 32)).astype(np.float32)
        maps = attention_maps(params, img, cfg, save_dir=str(tmp_path))
        assert maps.shape == (2, 32, 32)
        assert os.path.exists(tmp_path / "attn-head0.png")
        assert np.isfinite(maps).all()


class TestVideo:
    def test_attention_video_gif(self, rng, tmp_path):
        from tpu_ac.models import ViTConfig, init_vit_params
        from tpu_ac.viz.video import generate_attention_video

        cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                        img_size=32)
        params = init_vit_params(0, cfg)
        frames = rng.standard_normal((3, 3, 32, 32)).astype(np.float32)
        out = generate_attention_video(params, frames, cfg,
                                       str(tmp_path / "attn.gif"), fps=5)
        assert os.path.exists(out)
        from PIL import Image
        gif = Image.open(out)
        assert gif.n_frames == 3


class TestFeatureMapVisualize:
    def test_grid_normalized(self, rng):
        from tpu_ac.viz.plots import feature_map_grid

        z = rng.standard_normal((16, 8)).astype(np.float32)
        grid = feature_map_grid(z)
        assert grid.shape == (4, 4)
        assert grid.min() == 0.0 and grid.max() == pytest.approx(1.0)

    def test_saves_once_per_label_run(self, rng, tmp_path):
        """Reproduces the reference's label_current walk
        (examples/main.py:166-181): one png per label change."""
        from tpu_ac.viz.plots import feature_map_visualize

        Z = rng.standard_normal((6, 16, 8)).astype(np.float32)
        labels = ["good", "good", "crack", "crack", "good", "hole"]
        paths = feature_map_visualize(Z, labels, str(tmp_path), "vitb8")
        assert [os.path.basename(p) for p in paths] == [
            "vitb8_good.png", "vitb8_crack.png", "vitb8_good.png",
            "vitb8_hole.png"]
        assert all(os.path.exists(p) for p in set(paths))

    def test_with_images_panel(self, rng, tmp_path):
        from tpu_ac.viz.plots import feature_map_visualize

        Z = rng.standard_normal((2, 16, 8)).astype(np.float32)
        imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        paths = feature_map_visualize(Z, ["good", "bad"], str(tmp_path),
                                      "t", images_chw=imgs)
        assert len(paths) == 2


class TestMaxHausdorff:
    def test_matches_scipy_directed(self, rng):
        from scipy.spatial import distance

        from tpu_ac.cluster.alpha import max_hausdorff_distance

        a = rng.standard_normal((20, 8)).astype(np.float32)
        b = rng.standard_normal((15, 8)).astype(np.float32)
        got = max_hausdorff_distance(a, b)
        # the reference's max(directed(i,j), directed(i,j))[0] collapses to
        # the directed distance — reproduced quirk
        want = distance.directed_hausdorff(a, b)[0]
        assert got == pytest.approx(want, rel=1e-5)


class TestAttentionMapsDistilled:
    def test_two_prefix_tokens_reshape(self, rng, tmp_path):
        """DeiT-distilled (CLS + dist prefix) must drop BOTH prefix tokens
        before the grid reshape."""
        import dataclasses

        from tpu_ac.models import ViTConfig, init_vit_params
        from tpu_ac.viz import attention_maps

        cfg = dataclasses.replace(
            ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                      img_size=32), num_prefix_tokens=2)
        params = init_vit_params(0, cfg)
        img = rng.standard_normal((3, 32, 32)).astype(np.float32)
        maps = attention_maps(params, img, cfg)
        assert maps.shape == (2, 32, 32)
        assert np.isfinite(maps).all()


class TestVideoInputPath:
    """Video-FILE input side of video_generation (video_generation.py:40-117)."""

    def _write_clip(self, path, n_frames=4, size=32, fps=8.0):
        import cv2

        rng = np.random.default_rng(3)
        writer = cv2.VideoWriter(str(path),
                                 cv2.VideoWriter_fourcc(*"mp4v"), fps,
                                 (size, size))
        assert writer.isOpened()
        frames = rng.integers(0, 255, (n_frames, size, size, 3))
        for f in frames:
            writer.write(f.astype(np.uint8))
        writer.release()
        return frames

    def test_extract_frames_roundtrip(self, tmp_path):
        from tpu_ac.viz.video import extract_frames_from_video

        clip = tmp_path / "clip.mp4"
        self._write_clip(clip, n_frames=5, fps=8.0)
        frames, fps = extract_frames_from_video(
            str(clip), out_dir=str(tmp_path / "frames"))
        assert len(frames) == 5
        assert frames[0].shape == (32, 32, 3)
        assert fps == pytest.approx(8.0, rel=0.01)
        assert len(os.listdir(tmp_path / "frames")) == 5

    def test_preprocess_crops_to_patch_multiple(self):
        from tpu_ac.viz.video import preprocess_frames

        frames = [np.zeros((37, 45, 3), np.uint8)]
        x = preprocess_frames(frames, patch_size=8)
        assert x.shape == (1, 3, 32, 40)  # floored to patch multiples
        x = preprocess_frames(frames, patch_size=8, resize=24)
        assert x.shape[2] % 8 == 0 and x.shape[3] % 8 == 0
        assert min(x.shape[2], x.shape[3]) == 24

    def test_cli_video_file_end_to_end(self, tmp_path):
        from tpu_ac.cli.video_generation import main
        from tpu_ac.models.registry import BackboneSpec, register_backbone
        from tpu_ac.models.vit import ViTConfig

        clip = tmp_path / "clip.mp4"
        self._write_clip(clip, n_frames=3)
        register_backbone("tiny_video_test", BackboneSpec(
            "vit", ViTConfig(patch_size=8, embed_dim=32, depth=2,
                             num_heads=2, img_size=32), None))
        out = main(["--input_path", str(clip),
                    "--output_path", str(tmp_path / "out"),
                    "--arch", "tiny_video_test", "--video_format", "gif"])
        assert os.path.exists(out)
        from PIL import Image

        assert Image.open(out).n_frames == 3


class TestDrawCLI:
    _CSV = ("unsupervised\nCategory,NMI,ARI,F1\n---,---,---,---\n"
            "TAU=1.0\nbottle,0.5,0.4,0.6\ncable,0.3,0.2,0.4\n"
            "MVTec(object),0.4,0.3,0.5\n"
            "TAU=2.0\nbottle,0.6,0.5,0.7\ncable,0.2,0.1,0.3\n"
            "MVTec(object),0.4,0.3,0.5\n")

    def test_cli_end_to_end(self, tmp_path, capsys):
        from tpu_ac.cli.draw import main

        csv_path = tmp_path / "tau_result.csv"
        csv_path.write_text(self._CSV)
        out = str(tmp_path / "sweep.png")
        main([str(csv_path), "--metric", "ARI", "--out", out])
        assert os.path.exists(out)
        # the aggregate MVTec(...) rows are excluded from the default
        # category set (utils/draw.py plots per-category curves)
        assert "2 categories, 2 tau values" in capsys.readouterr().out

    def test_cli_gbk_csv(self, tmp_path):
        from tpu_ac.cli.draw import main

        csv_path = tmp_path / "tau_result_gbk.csv"
        csv_path.write_bytes(self._CSV.encode("gbk"))
        out = str(tmp_path / "sweep_gbk.png")
        main([str(csv_path), "--gbk", "--categories", "bottle",
              "--out", out])
        assert os.path.exists(out)
