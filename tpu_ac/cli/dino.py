"""DINO self-supervised training CLI — main_dino.py rebuilt.

Flag-compatible subset of dino-main/main_dino.py:41-129 driving the
tpu_ac.train.dino step: multi-crop host augmentation, cosine schedules,
EMA teacher, checkpoint/resume, NaN abort, per-epoch JSON-lines log.

Distributed: batch arrays are dp-sharded over the local mesh (one jit
handles 1..N chips); multi-host runs call
tpu_ac.distributed.multihost_init first.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys


def _bool_flag(s: str) -> bool:
    """dino utils.bool_flag (utils.py:60-68): 'false'/'off'/'0' -> False."""
    if s.lower() in ("off", "false", "0"):
        return False
    if s.lower() in ("on", "true", "1"):
        return True
    raise argparse.ArgumentTypeError(f"invalid bool flag {s!r}")


def _remat_flag(s: str):
    """bool_flag plus the 'dots' policy (save matmul outputs)."""
    if s.lower() == "dots":
        return "dots"
    return _bool_flag(s)

import numpy as np

import jax.numpy as jnp

from tpu_ac.data.augment import DINOAugmentation
from tpu_ac.utils.profiling import maybe_profile, step_annotation
from tpu_ac.data.imagefolder import ImageFolder
from tpu_ac.models.vit import VIT_BASE, VIT_SMALL, VIT_TINY, ViTConfig
from tpu_ac.train.dino import (
    DINOConfig,
    init_dino_state,
    make_dino_multi_step,
    make_dino_train_step,
    make_schedules,
    make_step_schedule_tables,
)
from tpu_ac.utils import (
    LaggedFetch,
    MetricLogger,
    fix_seeds,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)

_ARCHS = {"vit_tiny": VIT_TINY, "vit_small": VIT_SMALL, "vit_base": VIT_BASE}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("DINO (TPU-native)")
    p.add_argument("--arch", default="vit_small", choices=sorted(_ARCHS))
    p.add_argument("--patch_size", default=16, type=int)
    p.add_argument("--out_dim", default=65536, type=int)
    # dino utils.bool_flag semantics: type=bool would make ANY string
    # (incl. "False") truthy
    p.add_argument("--norm_last_layer", default=True, type=_bool_flag)
    p.add_argument("--momentum_teacher", default=0.996, type=float)
    p.add_argument("--warmup_teacher_temp", default=0.04, type=float)
    p.add_argument("--teacher_temp", default=0.04, type=float)
    p.add_argument("--warmup_teacher_temp_epochs", default=0, type=int)
    p.add_argument("--weight_decay", default=0.04, type=float)
    p.add_argument("--weight_decay_end", default=0.4, type=float)
    p.add_argument("--clip_grad", default=3.0, type=float)
    p.add_argument("--batch_size_per_gpu", default=64, type=int)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--freeze_last_layer", default=1, type=int)
    p.add_argument("--lr", default=0.0005, type=float)
    p.add_argument("--warmup_epochs", default=10, type=int)
    p.add_argument("--min_lr", default=1e-6, type=float)
    p.add_argument("--global_crops_scale", type=float, nargs="+",
                   default=(0.4, 1.0))
    p.add_argument("--local_crops_number", type=int, default=8)
    p.add_argument("--local_crops_scale", type=float, nargs="+",
                   default=(0.05, 0.4))
    p.add_argument("--data_path", required=True, type=str)
    p.add_argument("--output_dir", default=".", type=str)
    p.add_argument("--saveckp_freq", default=20, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--global_size", default=224, type=int)
    p.add_argument("--local_size", default=96, type=int)
    p.add_argument("--num_workers", default=10, type=int,
                   help="augmentation worker threads feeding the train "
                        "step (the reference's DataLoader num_workers, "
                        "main_dino.py:125; 0 = serial). Per-image rng "
                        "keys make the crops identical at any worker "
                        "count.")
    p.add_argument("--host_schedules", action="store_true",
                   help="feed lr/wd/momentum/temp/freeze to the step as "
                        "per-step host scalars (the reference's table "
                        "indexing, main_dino.py:309-312) instead of the "
                        "default device-resident tables gathered by the "
                        "step counter. Equivalent numerics to ~1 ulp "
                        "(table gathers fuse differently than passed "
                        "scalars, PARITY.md #22); the default saves 5 "
                        "host->device round trips per step. Console "
                        "log_every meters lag one step behind the printed "
                        "iteration (LaggedFetch); epoch stats and log.txt "
                        "are exact either way.")
    p.add_argument("--host_normalize", action="store_true",
                   help="normalize crops to f32 on the host instead of "
                        "uploading raw uint8 and normalizing inside the "
                        "jitted step (same math, 4x the host->device "
                        "transfer; device-side is the default).")
    p.add_argument("--max_steps_per_epoch", default=None, type=int,
                   help="cap steps per epoch (smoke tests)")
    p.add_argument("--profile", default=None, metavar="TRACE_DIR",
                   help="Capture a jax.profiler trace (with per-step "
                        "StepTraceAnnotations) into TRACE_DIR.")
    p.add_argument("--device_aug", action="store_true",
                   help="run the full multi-crop augmentation INSIDE the "
                        "jitted train program (data/device_aug.py): the "
                        "host only decodes + square-resizes each image "
                        "to --base_size uint8. Removes the host PIL "
                        "bottleneck (~145 ms/batch at 10 workers vs the "
                        "~18 ms fused device step, PERF.md round 5). "
                        "Distribution-equivalent to the PIL path, not "
                        "bit-comparable (PARITY.md #23); crops sample "
                        "from the square base resize. Requires the "
                        "default device-resident schedules.")
    p.add_argument("--data_cache", default=None, type=str,
                   help="Directory for a decode-once memory-mapped uint8 "
                        "base-image cache (--device_aug only): the host's "
                        "per-step work drops from B image decodes to one "
                        "memmap read — the data-path lever on decode-poor "
                        "hosts. Keyed by the ordered file list + "
                        "--base_size; reused across runs.")
    p.add_argument("--base_size", default=256, type=int,
                   help="square uint8 base-image size the device aug "
                        "crops from (--device_aug only).")
    p.add_argument("--steps_per_dispatch", default=1, type=int,
                   help="fuse k train steps into one jitted lax.scan "
                        "program (k x fewer host dispatches and metric "
                        "fetches — the lever for remote-attached chips "
                        "where every dispatch pays the link round trip). "
                        "Identical math to k sequential steps; the NaN "
                        "abort lags up to k steps and the loader stages "
                        "k batches ahead. Requires the default "
                        "device-resident schedules (not "
                        "--host_schedules).")
    p.add_argument("--remat", default=False, type=_remat_flag,
                   help="jax.checkpoint each transformer block "
                        "(rematerialize activations in backward — trades "
                        "FLOPs for HBM; the ViT-B/16 paper recipe at "
                        "batch 16 x 10 crops uses it, PERF.md). 'dots' "
                        "saves matmul outputs and recomputes only the "
                        "elementwise chain — most of the memory win at a "
                        "fraction of the recompute FLOPs.")
    p.add_argument("--use_fp16", default=True, type=_bool_flag,
                   help="Mixed-precision training (main_dino.py:78): "
                        "forward/backward in bfloat16 with f32 master "
                        "params/optimizer/loss/center. bf16 keeps f32's "
                        "exponent range, so the reference's GradScaler "
                        "has no equivalent here. Disable like the "
                        "reference suggests if training is unstable.")
    return p


def train_dino(args) -> dict:
    import jax

    fix_seeds(args.seed)
    dataset = ImageFolder(args.data_path)
    print(f"Data loaded: there are {len(dataset)} images.")

    vit_cfg = ViTConfig(
        **{**_ARCHS[args.arch].__dict__, "patch_size": args.patch_size,
           "img_size": args.global_size})
    # must equal the batch count epoch_batches actually yields per shard:
    # shards are WRAP-PADDED to ceil(n/shards) (DistributedSampler
    # semantics), so flooring n/shards first would under-count and run the
    # lr/wd/momentum schedules at the wrong pace on multi-host
    per_shard = -(-len(dataset) // jax.process_count())
    steps_per_epoch = max(1, per_shard // args.batch_size_per_gpu)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    cfg = DINOConfig(
        out_dim=args.out_dim,
        local_crops_number=args.local_crops_number,
        global_size=args.global_size, local_size=args.local_size,
        warmup_teacher_temp=args.warmup_teacher_temp,
        teacher_temp=args.teacher_temp,
        warmup_teacher_temp_epochs=args.warmup_teacher_temp_epochs,
        momentum_teacher=args.momentum_teacher,
        norm_last_layer=args.norm_last_layer,
        epochs=args.epochs, steps_per_epoch=steps_per_epoch,
        lr=args.lr, warmup_epochs=args.warmup_epochs, min_lr=args.min_lr,
        weight_decay=args.weight_decay,
        weight_decay_end=args.weight_decay_end,
        clip_grad=args.clip_grad, freeze_last_layer=args.freeze_last_layer,
        remat=args.remat)

    k = args.steps_per_dispatch
    if k > 1 and args.host_schedules:
        raise SystemExit("--steps_per_dispatch > 1 needs the device-"
                         "resident schedules (drop --host_schedules)")
    if args.data_cache and not args.device_aug:
        raise SystemExit("--data_cache is the --device_aug base-image "
                         "cache; the PIL aug path crops from the "
                         "original-resolution images and cannot use it")
    if args.device_aug and args.host_schedules:
        raise SystemExit("--device_aug needs the device-resident "
                         "schedules (drop --host_schedules)")
    state = init_dino_state(args.seed, vit_cfg, cfg)
    schedules = make_schedules(
        cfg, args.batch_size_per_gpu * jax.process_count())
    compute_dtype = jnp.bfloat16 if args.use_fp16 else None
    if args.device_aug:
        # aug + train fused into one program: (state, raw_u8, base_key,
        # tables) single-step, (state, raws [k,...], base_key, tables)
        # fused.  The per-step aug key is derived IN-PROGRAM from the
        # device-resident step counter (fold_in(base_key, state.step),
        # clamped like the schedule gather) — zero per-step/per-group key
        # dispatches on the host, and the stream is identical to host
        # folding at it = min(epoch*steps_per_epoch + i, total-1) because
        # the CLI pins state.step to the epoch start index.
        from tpu_ac.data.device_aug import DeviceAugConfig, device_multicrop

        aug_cfg = DeviceAugConfig(
            global_crops_scale=tuple(args.global_crops_scale),
            local_crops_scale=tuple(args.local_crops_scale),
            local_crops_number=args.local_crops_number,
            global_size=args.global_size, local_size=args.local_size,
            base_size=args.base_size)
        inner = make_dino_train_step(vit_cfg, cfg,
                                     compute_dtype=compute_dtype,
                                     resident_schedules=True)

        def _aug_body(s, raw, base_key, tables):
            it = jnp.minimum(s.step, cfg.total_steps - 1)
            g, l = device_multicrop(raw, jax.random.fold_in(base_key, it),
                                    aug_cfg)
            return inner(s, g, l, tables)

        step_fn = jax.jit(_aug_body)

        def _aug_multi(state, raws, base_key, tables):
            def body(s, raw):
                return _aug_body(s, raw, base_key, tables)
            return jax.lax.scan(body, state, raws)

        multi_fn = jax.jit(_aug_multi) if k > 1 else None
        aug_base_key = jax.random.PRNGKey(args.seed)
        if jax.process_count() > 1:
            # decorrelate crop-box/jitter draws across hosts (each host
            # augments a DIFFERENT data shard — the reference's DataLoader
            # workers likewise draw from per-process torch RNG streams);
            # single-process streams are untouched (no fold_in)
            aug_base_key = jax.random.fold_in(aug_base_key,
                                              jax.process_index())
    else:
        step_fn = jax.jit(make_dino_train_step(
            vit_cfg, cfg, compute_dtype=compute_dtype,
            resident_schedules=not args.host_schedules))
        multi_fn = (jax.jit(make_dino_multi_step(
            vit_cfg, cfg, k, compute_dtype=compute_dtype))
            if k > 1 else None)
    # Device-resident tables, passed as jit ARGUMENTS every step (free:
    # the arrays already live on device) rather than closed over — closure
    # would inline ~20 B/step of HLO constants, ~40 MB at ImageNet scale.
    tables = (None if args.host_schedules
              else make_step_schedule_tables(cfg, schedules))
    aug = DINOAugmentation(
        global_crops_scale=tuple(args.global_crops_scale),
        local_crops_scale=tuple(args.local_crops_scale),
        local_crops_number=args.local_crops_number,
        global_size=args.global_size, local_size=args.local_size,
        seed=args.seed, normalize=args.host_normalize)
    # the reference feeds this loop through DataLoader(num_workers=10)
    # (main_dino.py:147-154); without the parallel loader the 20 ms jitted
    # step sits behind ~1 s of serial PIL multi-crop work (PERF.md)
    if args.device_aug:
        from tpu_ac.data.prefetch import BaseImagePrefetcher

        if args.data_cache:
            from tpu_ac.data.device_aug import build_base_cache

            base_cache = build_base_cache(dataset, args.base_size,
                                          args.data_cache)
            fetch_base = lambda i: base_cache[int(i)]  # noqa: E731
        else:
            fetch_base = lambda i: dataset[int(i)][0]  # noqa: E731
        loader = BaseImagePrefetcher(
            fetch_base, args.base_size,
            num_workers=args.num_workers, transfer=jax.device_put)
    else:
        from tpu_ac.data.prefetch import CropBatchPrefetcher

        loader = CropBatchPrefetcher(
            lambda i: dataset[int(i)][0], aug, cfg.local_crops_number,
            num_workers=args.num_workers, seed=args.seed,
            transfer=jax.device_put)

    start_epoch = 0
    ckpt = latest_checkpoint(args.output_dir, "checkpoint")
    if ckpt:
        state, meta = restore_checkpoint(ckpt, state)
        start_epoch = meta["extra"].get("epoch", 0) + 1
        print(f"Resumed from {ckpt} at epoch {start_epoch}")

    os.makedirs(args.output_dir, exist_ok=True)
    stats = {}

    def consume(pending):
        """Resolve the (already host-copied) metrics of a prior dispatch
        (a scalar tree, or a [k]-stacked one under --steps_per_dispatch)."""
        losses = np.atleast_1d(np.asarray(pending["loss"]))
        lrs = np.atleast_1d(np.asarray(pending["lr"]))
        wds = np.atleast_1d(np.asarray(pending["wd"]))
        for loss, lr, wd in zip(losses, lrs, wds):
            loss = float(loss)
            if not math.isfinite(loss):
                # one dispatch later than the reference's per-step check
                # (main_dino.py:330-333) — the lag overlaps the fetch with
                # the next dispatch's compute; nothing is checkpointed in
                # between (up to k steps under --steps_per_dispatch).
                # Multi-host caveat: a one-sided sys.exit leaves peers
                # blocked in the next collective until the distributed-
                # runtime timeout tears the job down (same failure mode as
                # the reference's per-rank exit under DDP).
                print(f"Loss is {loss}, stopping training", flush=True)
                sys.exit(1)
            logger.update(loss=loss, lr=float(lr), wd=float(wd))

    with maybe_profile(args.profile):
        for epoch in range(start_epoch, args.epochs):
            logger = MetricLogger()
            t_temp = schedules["teacher_temp"][min(
                epoch, len(schedules["teacher_temp"]) - 1)]
            if not args.host_schedules:
                # pin the device-side table index to the reference's
                # it = epoch * steps_per_epoch (exact under resume and
                # --max_steps_per_epoch truncation alike)
                state = state._replace(
                    step=jnp.asarray(epoch * steps_per_epoch, jnp.int32))
            batches = dataset.epoch_batches(
                args.batch_size_per_gpu, seed=args.seed + epoch,
                num_shards=jax.process_count(),
                shard_index=jax.process_index())
            # start each step's d2h immediately, resolve it after the NEXT
            # dispatch: the fetch round trip rides under step i+1's compute
            fetch = LaggedFetch(consume)
            it_src = logger.log_every(loader.batches(epoch, batches), 10,
                                      f"Epoch: [{epoch}]")

            # one loop body for all four mode combinations (device/host
            # aug x fused/single dispatch); only the dispatch closures
            # differ.  ``item`` is a raw uint8 base batch under
            # --device_aug, else a (global_crops, local_crops) pair.
            def run_single(item, it):
                nonlocal state
                with step_annotation("dino_step", step=it):
                    if args.device_aug:
                        state, metrics = step_fn(
                            state, jnp.asarray(item), aug_base_key, tables)
                    else:
                        g, l = item
                        g = jnp.asarray(g)
                        l = jnp.asarray(l) if l is not None else None
                        if args.host_schedules:
                            state, metrics = step_fn(
                                state, g, l,
                                lr=jnp.float32(schedules["lr"][it]),
                                wd=jnp.float32(schedules["wd"][it]),
                                teacher_momentum=jnp.float32(
                                    schedules["momentum"][it]),
                                teacher_temp=jnp.float32(t_temp),
                                freeze_last=jnp.asarray(
                                    epoch < cfg.freeze_last_layer))
                        else:
                            state, metrics = step_fn(state, g, l, tables)
                fetch.push(metrics)

            def run_fused(items, it):
                nonlocal state
                with step_annotation("dino_step", step=it):
                    if args.device_aug:
                        state, metrics = multi_fn(
                            state,
                            jnp.stack([jnp.asarray(x) for x in items]),
                            aug_base_key, tables)
                    else:
                        gs = jnp.stack([jnp.asarray(g) for g, _ in items])
                        ls = (jnp.stack([jnp.asarray(l) for _, l in items])
                              if items[0][1] is not None else None)
                        state, metrics = multi_fn(state, gs, ls, tables)
                fetch.push(metrics)

            # k-step fused dispatch stages k batches and runs ONE scan
            # program; a ragged tail (epoch end / max_steps cap) runs
            # through the single-step program
            buf: list = []
            done = 0
            for i, item in enumerate(it_src):
                if (args.max_steps_per_epoch
                        and i >= args.max_steps_per_epoch):
                    break
                if k > 1:
                    buf.append(item)
                    if len(buf) < k:
                        continue
                    run_fused(buf, min(epoch * steps_per_epoch + done,
                                       cfg.total_steps - 1))
                    done += k
                    buf = []
                else:
                    run_single(item, min(epoch * steps_per_epoch + i,
                                         cfg.total_steps - 1))
            for item in buf:
                run_single(item, min(epoch * steps_per_epoch + done,
                                     cfg.total_steps - 1))
                done += 1
            fetch.flush()
            logger.synchronize_between_processes()
            stats = {k: m.global_avg for k, m in logger.meters.items()}
            if jax.process_index() == 0:
                save_checkpoint(args.output_dir, "checkpoint", state,
                                step=epoch, extra={"epoch": epoch}, keep=2)
                if args.saveckp_freq and epoch % args.saveckp_freq == 0:
                    save_checkpoint(args.output_dir, f"checkpoint{epoch:04d}",
                                    state, step=epoch, extra={"epoch": epoch})
                with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
                    f.write(json.dumps({"epoch": epoch, **{
                        f"train_{k}": v for k, v in stats.items()}}) + "\n")
    loader.close()
    return stats


def main(argv=None) -> None:
    train_dino(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
