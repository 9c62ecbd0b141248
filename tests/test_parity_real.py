"""Real-weight drop-in drill machinery (scripts/parity_real.py).

The full drill needs the released dino_vitbase8 weights + the MVTec AD
dataset (absent in this zero-egress environment) or the --smoke rehearsal
(`make parity-real-smoke`, a full ViT-B/8 CPU sweep — too slow for the
suite).  These tests pin the pieces that must not rot: the clean
absent-artifact exit, the CSV parser against the REFERENCE'S OWN
checked-in CSV, the diff detector, and the manifest-exact stand-in
checkpoint.
"""

import csv
import os
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, SCRIPTS)

import parity_real  # noqa: E402

REF_CSV = os.path.join(
    parity_real.REFERENCE_CSV_DIR, "dino_vitbase8", "unsupervised",
    "blocks.10_blocks.11_2048_4096_tau_result.csv")


class TestAbsentArtifacts:
    def test_missing_checkpoint_reports_cleanly(self, tmp_path, capsys):
        rc = parity_real.main(["--checkpoint_dir", str(tmp_path)])
        assert rc == 0
        assert "checkpoints absent" in capsys.readouterr().out

    def test_missing_dataset_reports_cleanly(self, tmp_path, capsys):
        # checkpoint present (empty file is enough for the existence
        # check), dataset absent -> clean exit before any model load
        (tmp_path / parity_real.CKPT_NAME).write_bytes(b"")
        rc = parity_real.main(["--checkpoint_dir", str(tmp_path),
                               "--mvtec_path", str(tmp_path / "nodata")])
        assert rc == 0
        assert "dataset absent" in capsys.readouterr().out


class TestCsvDiff:
    def test_parses_reference_csv(self):
        """The parser must read the reference's actual published CSV:
        17 taus x 13 categories + 2 aggregate rows per tau."""
        rows = parity_real.parse_tau_csv(REF_CSV, encoding="gbk")
        taus = {t for t, _ in rows}
        assert len(taus) == 17
        cats = {c for t, c in rows if t == repr(1.0)}
        assert {"bottle", "carpet", "MVTec(object)",
                "MVTec(texture)"} <= cats
        nmi, ari, f1 = rows[(repr(1.0), "MVTec(object)")]
        # SURVEY.md section 6.2 golden numbers
        assert nmi == pytest.approx(0.40116, abs=1e-4)
        assert ari == pytest.approx(0.22938, abs=1e-4)
        assert f1 == pytest.approx(0.47256, abs=1e-4)

    def test_self_diff_zero_and_perturbation_detected(self, tmp_path):
        ours = tmp_path / "ours.csv"
        import shutil

        shutil.copy(REF_CSV, ours)
        worst, n, _ = parity_real.diff_csvs(str(ours), REF_CSV,
                                            theirs_encoding="gbk")
        # self-diff: identical bytes -> 0.0 over every row
        assert worst == 0.0 and n > 200
        # perturb one value -> detected with the right magnitude
        rows = list(csv.reader(open(ours, newline="")))
        for r in rows:
            if r and r[0] == "bottle":
                r[1] = str(float(r[1]) + 0.01)
                break
        with open(ours, "w", newline="") as f:
            csv.writer(f).writerows(rows)
        worst, _, msgs = parity_real.diff_csvs(str(ours), REF_CSV,
                                               theirs_encoding="gbk")
        assert worst == pytest.approx(0.01, abs=1e-9)
        assert any("bottle" in m for m in msgs)

    def test_no_overlap_is_infinite(self, tmp_path):
        empty = tmp_path / "empty.csv"
        empty.write_text("unsupervised\nCategory,NMI,ARI,F1\n")
        worst, n, msgs = parity_real.diff_csvs(str(empty), REF_CSV,
                                               theirs_encoding="gbk")
        assert n == 0 and worst == float("inf") and msgs

    def test_gbk_reference_falls_back(self, tmp_path):
        """The reference writes its CSVs gbk-encoded (examples/test.py:
        255); a regenerated one with non-ASCII bytes must still diff
        under the default (utf-8 -> gbk fallback) encoding."""
        ours = tmp_path / "ours.csv"
        theirs = tmp_path / "theirs_gbk.csv"
        body = "TAU=1.0\nCategory,NMI,ARI,F1\nbottle,0.5,0.4,0.6\n"
        ours.write_text(body)
        with open(theirs, "w", encoding="gbk", newline="") as f:
            f.write("备注 gbk header\n" + body)  # non-ASCII gbk bytes
        with pytest.raises(UnicodeDecodeError):
            parity_real.parse_tau_csv(str(theirs), encoding="utf-8")
        worst, n, _ = parity_real.diff_csvs(str(ours), str(theirs))
        assert n == 1 and worst == 0.0


class TestSmokeCheckpoint:
    def test_standin_matches_frozen_manifest(self, tmp_path):
        """The --smoke stand-in must pass convert --verify by
        construction (exact key/shape inventory)."""
        import torch

        from tpu_ac.models import manifest

        path = parity_real._smoke_checkpoint(str(tmp_path))
        sd = {k: np.asarray(v) for k, v in torch.load(
            path, map_location="cpu").items()}
        report = manifest.verify_checkpoint(sd, "dino_vitbase8")
        assert report == {"missing": [], "unexpected": [],
                          "shape_mismatch": []}
