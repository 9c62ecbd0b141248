"""End-to-end drive of the DINO pre-training CLI (main_dino.py rebuilt):
ImageFolder walk -> multi-crop aug -> jitted train step -> checkpoint +
JSON-lines log, in both precision modes (--use_fp16, main_dino.py:78)."""

import json
import os

import numpy as np
from typing import Sequence
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def tiny_imagefolder(tmp_path_factory):
    root = tmp_path_factory.mktemp("dino_data")
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = root / cls
        d.mkdir()
        for i in range(6):
            arr = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


def _run(tiny_imagefolder, tmp_path, use_fp16: str, tag: str = "",
         extra: Sequence[str] = ()):
    from tpu_ac.cli.dino import main

    out = str(tmp_path / f"out_{use_fp16}{tag}")
    main(["--arch", "vit_tiny", "--patch_size", "16",
          "--data_path", tiny_imagefolder, "--output_dir", out,
          "--global_size", "32", "--local_size", "16",
          "--local_crops_number", "2", "--out_dim", "128",
          "--batch_size_per_gpu", "4", "--epochs", "1",
          "--max_steps_per_epoch", "2", "--warmup_epochs", "0",
          "--use_fp16", use_fp16, *extra])
    with open(os.path.join(out, "log.txt")) as f:
        row = json.loads(f.readline())
    assert np.isfinite(row["train_loss"])
    assert any(n.startswith("checkpoint") for n in os.listdir(out))
    return row["train_loss"]


def test_cli_end_to_end_bf16(tiny_imagefolder, tmp_path):
    _run(tiny_imagefolder, tmp_path, "true")


def test_cli_end_to_end_f32(tiny_imagefolder, tmp_path):
    """Also pins resident-table (default) ~= --host_schedules numerics
    (~1 ulp contract, PARITY.md #22: a table gather fuses differently
    than a passed scalar) and the lagged async metric fetch."""
    loss_resident = _run(tiny_imagefolder, tmp_path, "false")
    loss_host = _run(tiny_imagefolder, tmp_path, "false", tag="_host",
                     extra=["--host_schedules"])
    assert loss_resident == pytest.approx(loss_host, rel=5e-7)


def test_cli_device_aug_end_to_end(tiny_imagefolder, tmp_path):
    """--device_aug: host decodes square uint8 bases, the jitted program
    does crops+jitter+blur+solarize+normalize+train in one dispatch.
    Deterministic per seed (aug keys fold in the global step), and the
    fused k=2 path reproduces the per-step epoch stats."""
    extra = ["--device_aug", "--base_size", "48",
             "--max_steps_per_epoch", "3"]
    loss_a = _run(tiny_imagefolder, tmp_path, "false", tag="_dev",
                  extra=extra)
    loss_b = _run(tiny_imagefolder, tmp_path, "false", tag="_dev2",
                  extra=extra)
    assert loss_a == loss_b  # same seed -> same keys -> same crops
    loss_k2 = _run(tiny_imagefolder, tmp_path, "false", tag="_devk2",
                   extra=extra + ["--steps_per_dispatch", "2"])
    assert loss_k2 == pytest.approx(loss_a, rel=5e-7)


def test_cli_data_cache_matches_live_decode(tiny_imagefolder, tmp_path):
    """--data_cache (decode-once memmapped uint8 bases) feeds the exact
    bytes load_base_image produces, so the run is bit-identical to the
    live-decode --device_aug path; a second run reuses the cache file."""
    extra = ["--device_aug", "--base_size", "48",
             "--max_steps_per_epoch", "3"]
    loss_live = _run(tiny_imagefolder, tmp_path, "false", tag="_dc0",
                     extra=extra)
    cache_dir = tmp_path / "base_cache"
    loss_cached = _run(tiny_imagefolder, tmp_path, "false", tag="_dc1",
                       extra=extra + ["--data_cache", str(cache_dir)])
    assert loss_cached == loss_live
    files = list(cache_dir.iterdir())
    assert len(files) == 1 and files[0].suffix == ".npy"
    loss_again = _run(tiny_imagefolder, tmp_path, "false", tag="_dc2",
                      extra=extra + ["--data_cache", str(cache_dir)])
    assert loss_again == loss_live
    assert list(cache_dir.iterdir()) == files

    from tpu_ac.cli.dino import main

    with pytest.raises(SystemExit, match="--device_aug"):
        main(["--data_path", tiny_imagefolder,
              "--output_dir", str(tmp_path / "bad"),
              "--data_cache", str(cache_dir)])


def test_cli_steps_per_dispatch_matches_single(tiny_imagefolder, tmp_path):
    """--steps_per_dispatch 2 (one fused lax.scan program per 2 steps,
    ragged tail through the single-step program: 3 steps = one 2-scan +
    one single) must reproduce the per-step path's epoch stats — the
    deterministic (seed, epoch, position) aug keys make the crops
    identical, and the scan body IS the single step."""
    extra = ["--max_steps_per_epoch", "3"]
    loss_single = _run(tiny_imagefolder, tmp_path, "false", tag="_k1",
                       extra=extra)
    loss_fused = _run(tiny_imagefolder, tmp_path, "false", tag="_k2",
                      extra=extra + ["--steps_per_dispatch", "2"])
    assert loss_fused == pytest.approx(loss_single, rel=5e-7)


def test_remat_flag_parses():
    from tpu_ac.cli.dino import _remat_flag

    assert _remat_flag("dots") == "dots"
    assert _remat_flag("DOTS") == "dots"
    assert _remat_flag("true") is True
    assert _remat_flag("false") is False
