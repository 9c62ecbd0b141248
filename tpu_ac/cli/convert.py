"""Checkpoint conversion/validation CLI.

The migration tool for reference users: takes a released torch ``.pth``
(DINO hub / torchvision / full DINO training checkpoint), converts it to
tpu_ac params, validates key coverage and shapes against the target
backbone, and installs it under the checkpoint cache so
``load_backbone(name)`` picks it up.

    python -m tpu_ac.cli.convert dino_vitbase8_pretrain.pth \
        --backbone dino_vitbase8 [--checkpoint_key teacher] [--install]

``--verify`` diffs the checkpoint against the FROZEN per-model manifest
(tpu_ac/models/manifests.json — the expected state_dict key+shape
inventory of every registry name, see tpu_ac.models.manifest) and exits
non-zero on any mismatch, so a conversion that would silently drop or
misshape tensors fails loudly BEFORE anything is installed.

``--update_manifests`` (no checkpoint argument needed) regenerates the
frozen manifests from the current architectures — run it after an
intentional architecture change; ``tests/test_manifests.py`` guards
against accidental drift.
"""

from __future__ import annotations

import argparse
import os
import sys

from tpu_ac.models.convert import (
    load_torch_checkpoint,
    validate_params_against_backbone,
)
from tpu_ac.models.registry import BACKBONE_CONFIGS


def main(argv=None) -> dict:
    p = argparse.ArgumentParser("tpu_ac checkpoint converter")
    p.add_argument("checkpoint", nargs="?",
                   help="path to the torch .pth file")
    p.add_argument("--backbone", choices=sorted(BACKBONE_CONFIGS))
    p.add_argument("--checkpoint_key", default=None,
                   help="sub-dict key, e.g. 'teacher' for DINO training "
                        "checkpoints")
    p.add_argument("--install", action="store_true",
                   help="copy into the checkpoint cache under the expected "
                        "filename for load_backbone")
    p.add_argument("--verify", action="store_true",
                   help="diff the checkpoint against the frozen per-model "
                        "manifest; non-zero exit on mismatch")
    p.add_argument("--update_manifests", nargs="*", metavar="NAME",
                   default=None,
                   help="regenerate tpu_ac/models/manifests.json (all "
                        "registry names, or just the listed ones)")
    p.add_argument("--cache_dir",
                   default=os.path.expanduser("~/.cache/tpu_ac/checkpoints"))
    args = p.parse_args(argv)

    if args.update_manifests is not None:
        from tpu_ac.models import manifest

        names = args.update_manifests or None
        manifests = manifest.load_manifests() if names else {}
        manifests.update(manifest.generate_all(names))
        manifest.save_manifests(manifests)
        print(f"manifests written: {len(manifests)} models -> "
              f"{manifest.MANIFEST_PATH}")
        return {}

    if args.checkpoint is None or args.backbone is None:
        p.error("checkpoint and --backbone are required "
                "(unless --update_manifests)")

    params = load_torch_checkpoint(args.checkpoint, args.checkpoint_key)

    if args.verify:
        from tpu_ac.models import manifest

        report = manifest.verify_checkpoint(params, args.backbone)
        # missing/misshaped tensors break the conversion -> hard FAIL;
        # extra tensors (classifier heads our feature-extraction archs
        # never instantiate, EMA copies, ...) are merely unused -> warn
        bad = report["missing"] or report["shape_mismatch"]
        print(f"{args.checkpoint}: {len(params)} tensors vs frozen manifest "
              f"'{args.backbone}'")
        for kind in ("missing", "unexpected", "shape_mismatch"):
            vals = report[kind]
            if vals:
                print(f"  {kind} ({len(vals)}): {vals[:8]}"
                      f"{' ...' if len(vals) > 8 else ''}")
        if bad:
            print("FAIL — checkpoint does not match the frozen manifest")
            sys.exit(1)
        print("VERIFIED — checkpoint covers the frozen manifest"
              + (" (extra unused tensors ignored)" if report["unexpected"]
                 else " exactly"))

    report = validate_params_against_backbone(params, args.backbone)
    n_ok = len(params) - len(report["unexpected"])
    print(f"{args.checkpoint}: {len(params)} tensors, {n_ok} map onto "
          f"'{args.backbone}'")
    for kind in ("missing", "unexpected", "shape_mismatch"):
        vals = report[kind]
        if vals:
            print(f"  {kind} ({len(vals)}): {vals[:8]}"
                  f"{' ...' if len(vals) > 8 else ''}")
    ok = not report["missing"] and not report["shape_mismatch"]
    print("OK — checkpoint fully covers the backbone" if ok
          else "WARNING — conversion incomplete (see above)")

    if args.install:
        if not ok:
            print("NOT installed — the conversion is incomplete; fix the "
                  "checkpoint/backbone pairing first")
            sys.exit(1)
        import torch

        from tpu_ac.models.convert import params_to_torch_state_dict

        spec = BACKBONE_CONFIGS[args.backbone]
        os.makedirs(args.cache_dir, exist_ok=True)
        dest = os.path.join(args.cache_dir, spec.checkpoint)
        # write the CONVERTED flat state_dict (checkpoint_key selected,
        # prefixes stripped) — copying the raw file would install e.g. a
        # full DINO training checkpoint that load_backbone can't parse
        torch.save(params_to_torch_state_dict(params), dest)
        print(f"installed -> {dest}")
    return report


if __name__ == "__main__":
    main()
