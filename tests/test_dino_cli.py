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
    """Also pins resident-table (default) == --host_schedules numerics:
    the device-gathered schedule values and the lagged async metric fetch
    must not change a single bit of the training math."""
    loss_resident = _run(tiny_imagefolder, tmp_path, "false")
    loss_host = _run(tiny_imagefolder, tmp_path, "false", tag="_host",
                     extra=["--host_schedules"])
    assert loss_resident == loss_host
