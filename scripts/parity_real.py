"""Real-weight drop-in parity drill.

When the released DINO ViT-B/8 weights and the MVTec AD dataset are
present, this script runs the COMPLETE reference protocol end to end and
diffs the resulting tau-sweep CSV against the reference's checked-in one
(Anomaly-Clustering/outputs/mvtec_ad/dino_vitbase8/<mode>/
blocks.10_blocks.11_2048_4096_tau_result.csv):

  1. checkpoint presence check (dino_vitbase8_pretrain.pth under
     --checkpoint_dir, default ~/.cache/tpu_ac/checkpoints);
  2. ``python -m tpu_ac.cli.convert --verify`` against the frozen
     per-model manifest (key/shape inventory);
  3. full 15-category x 2-mode stage-1 sweep (``tpu_ac.cli.main`` — the
     reference's examples/main.py:348-366 loop);
  4. ``tpu_ac.cli.evaluate`` with the reference's 17-value tau list
     (examples/test.py:239);
  5. row-by-row CSV diff vs the reference's published CSV.

If the checkpoint or the dataset is absent it reports so cleanly and
exits 0 — this zero-egress build environment cannot download either; the
drill exists so a user WITH the artifacts can close the metric side of
parity with one command (``make parity-real``).

``--smoke`` rehearses the full machinery without real artifacts: it
synthesizes a random-weight stand-in checkpoint from the frozen manifest
(passes convert --verify by construction), builds a synthetic MVTec
category, runs the same sweep/evaluate path, and self-diffs the produced
CSV (must be exactly zero) — exercised by tests/test_parity_real.py.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

# `python scripts/parity_real.py` puts scripts/ (not the repo root) on
# sys.path; make tpu_ac importable without requiring a pip install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile

REFERENCE_CSV_DIR = "/root/reference/Anomaly-Clustering/outputs/mvtec_ad"
CKPT_NAME = "dino_vitbase8_pretrain.pth"
# the reference's sweep (examples/test.py:239)
REF_TAU_LIST = ["0", "0.2", "0.4", "0.6", "0.8", "1", "1.5", "2", "2.5",
                "3", "4", "8", "10", "12", "14", "18", "20"]


def parse_tau_csv(path: str, encoding: str = "utf-8") -> dict:
    """{(tau, category): (nmi, ari, f1)} from a tau_result.csv (either
    side: both write the examples/test.py:249-325 layout)."""
    rows: dict[tuple[str, str], tuple[float, float, float]] = {}
    tau = None
    with open(path, newline="", encoding=encoding) as f:
        for row in csv.reader(f):
            if not row:
                continue
            if row[0].startswith("TAU="):
                tau = row[0][4:]
                continue
            if row[0] in ("---", "Category") or len(row) < 4:
                continue
            try:
                vals = (float(row[1]), float(row[2]), float(row[3]))
            except ValueError:
                continue
            # normalize tau spelling ("1" vs "1.0")
            key_tau = repr(float(tau)) if tau is not None else ""
            rows[(key_tau, row[0])] = vals
    return rows


def diff_csvs(ours: str, theirs: str, theirs_encoding: str | None = None
              ) -> tuple[float, int, list[str]]:
    """(max_abs_diff, n_rows_compared, messages).

    ``theirs_encoding=None`` tries utf-8 then falls back to gbk — the
    reference writes its CSVs gbk-encoded (examples/test.py:255, PARITY
    quirk #8); its checked-in copies happen to be ASCII-only, but a
    regenerated one need not be."""
    a = parse_tau_csv(ours)
    if theirs_encoding is None:
        try:
            b = parse_tau_csv(theirs, encoding="utf-8")
        except UnicodeDecodeError:
            b = parse_tau_csv(theirs, encoding="gbk")
    else:
        b = parse_tau_csv(theirs, encoding=theirs_encoding)
    common = sorted(set(a) & set(b))
    msgs = []
    if not common:
        msgs.append(f"no comparable rows between {ours} and {theirs}")
        return float("inf"), 0, msgs
    worst = 0.0
    for key in common:
        d = max(abs(x - y) for x, y in zip(a[key], b[key]))
        if d > worst:
            worst = d
        if d > 1e-3:
            msgs.append(f"  tau={key[0]} {key[1]}: ours={a[key]} "
                        f"ref={b[key]} (max diff {d:.2e})")
    only_a = set(a) - set(b)
    only_b = set(b) - set(a)
    if only_b:
        msgs.append(f"  {len(only_b)} reference rows not produced "
                    f"(e.g. {sorted(only_b)[:3]})")
    if only_a:
        msgs.append(f"  {len(only_a)} extra rows vs reference")
    return worst, len(common), msgs


def _smoke_checkpoint(tmpdir: str) -> str:
    """Random-weight stand-in with the exact dino_vitbase8 key/shape
    inventory (from the frozen manifest) — convert --verify passes."""
    import numpy as np
    import torch

    from tpu_ac.models import manifest

    inv = manifest.load_manifests()["dino_vitbase8"]
    rng = np.random.default_rng(0)
    sd = {k: torch.from_numpy(
        (rng.standard_normal(shape) * 0.02).astype(np.float32))
        for k, shape in inv.items()}
    path = os.path.join(tmpdir, CKPT_NAME)
    torch.save(sd, path)
    return path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--mvtec_path",
                   default=os.environ.get("MVTEC_PATH",
                                          os.path.expanduser("~/data/mvtec")))
    p.add_argument("--checkpoint_dir",
                   default=os.path.expanduser("~/.cache/tpu_ac/checkpoints"))
    p.add_argument("--output_dir", default=None,
                   help="artifact tree (default: a temp dir)")
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--precision", default=None,
                   help="pipeline precision override (e.g. 'highest' for "
                        "strict-parity mode; default = bf16 production)")
    p.add_argument("--tolerance", default=5e-3, type=float,
                   help="max per-row |NMI/ARI/F1| diff vs the reference "
                        "CSV before exiting nonzero")
    p.add_argument("--smoke", action="store_true",
                   help="rehearse with a random-weight stand-in + "
                        "synthetic MVTec ('bottle' only, tau=1)")
    args = p.parse_args(argv)

    out_dir = args.output_dir or tempfile.mkdtemp(prefix="parity_real_")
    if args.smoke:
        tmp = tempfile.mkdtemp(prefix="parity_smoke_")
        ckpt = _smoke_checkpoint(tmp)
        from tpu_ac.data.mvtec import make_synthetic_mvtec

        mvtec = os.path.join(tmp, "mvtec")
        make_synthetic_mvtec(mvtec, image_size=224, n_per_anomaly=2,
                             n_train=2)
        categories = ["bottle"]
        modes = ["unsupervised"]
        tau_list = ["1"]
        ckpt_dir = tmp
    else:
        ckpt = os.path.join(args.checkpoint_dir, CKPT_NAME)
        if not os.path.exists(ckpt):
            print(f"checkpoints absent: place {CKPT_NAME} (the released "
                  f"DINO ViT-B/8 weights) under {args.checkpoint_dir} "
                  f"and re-run. Nothing was executed.")
            return 0
        mvtec = args.mvtec_path
        if not os.path.isdir(os.path.join(mvtec, "bottle")):
            print(f"MVTec AD dataset absent at {mvtec} (expected "
                  f"<path>/bottle/test/...). Pass --mvtec_path or set "
                  f"MVTEC_PATH. Nothing was executed.")
            return 0
        categories = None  # all 15
        modes = ["unsupervised", "supervised"]
        tau_list = REF_TAU_LIST
        ckpt_dir = args.checkpoint_dir

    # 1. convert --verify against the frozen manifest
    from tpu_ac.cli.convert import main as convert_main

    # --verify sys.exits(1) itself on a manifest mismatch; missing /
    # misshaped tensors in the returned conversion report are also fatal
    # (extra unused tensors are warn-only, convert.py:78-83)
    report = convert_main([ckpt, "--backbone", "dino_vitbase8", "--verify"])
    bad = {k: v for k, v in report.items()
           if k in ("missing", "shape_mismatch") and v}
    if bad:
        print(f"convert --verify FAILED: {bad}")
        return 1
    print("convert --verify: checkpoint matches the frozen "
          "dino_vitbase8 manifest")

    # 2+3. stage-1 sweep + evaluate through the real CLIs
    from tpu_ac.cli.evaluate import main as eval_main
    from tpu_ac.cli.main import main as cli_main

    common = ["--path", mvtec, "--backbone_names", "dino_vitbase8",
              "--layers_to_extract_from", "blocks.10", "blocks.11",
              "--pretrain_embed_dimension", "2048",
              "--target_embed_dimension", "4096",
              "--output_dir", out_dir]
    if categories:
        common += ["--categories", *categories]
    stage1 = common + ["--supervised", "all" if len(modes) > 1 else modes[0],
                       "--batch_size", str(args.batch_size),
                       "--checkpoint_dir", ckpt_dir]
    if args.precision:
        stage1 += ["--precision", args.precision]
    cli_main(stage1)
    eval_main(common + ["--tau_list", *tau_list,
                        "--supervised_modes", *modes])

    # 4. diff vs the reference's checked-in CSVs
    fname = "blocks.10_blocks.11_2048_4096_tau_result.csv"
    rc = 0
    for mode in modes:
        ours = os.path.join(out_dir, "mvtec_ad", "dino_vitbase8", mode,
                            fname)
        theirs = (ours if args.smoke else
                  os.path.join(REFERENCE_CSV_DIR, "dino_vitbase8", mode,
                               fname))
        worst, n, msgs = diff_csvs(ours, theirs)
        label = "self-diff (smoke)" if args.smoke else "vs reference CSV"
        print(f"[{mode}] {label}: {n} rows compared, "
              f"max |diff| = {worst:.2e}")
        for m in msgs[:20]:
            print(m)
        if worst > args.tolerance or n == 0:
            rc = 1
    print("parity drill PASSED" if rc == 0 else
          f"parity drill FAILED (tolerance {args.tolerance})")
    return rc


if __name__ == "__main__":
    sys.exit(main())
