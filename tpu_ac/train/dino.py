"""DINO self-supervised training, TPU-native.

Capability-parity rebuild of dino-main/main_dino.py:132-416:

- student/teacher ViT + projection head, teacher EMA of the student,
- multi-crop: 2 global views through the teacher, all views through the
  student (MultiCropWrapper's resolution bucketing, dino-main/utils.py:594-629,
  becomes two static-shape forwards — global and local — per step),
- DINOLoss: temperature-sharpened, centered teacher softmax vs student
  log-softmax over cross-view pairs (main_dino.py:363-416),
- cosine lr/wd/teacher-momentum schedules with linear warmup
  (dino-main/utils.py:187-198), per-parameter gradient clipping
  (utils.py:132-142), frozen last layer for the first epochs
  (utils.py:144-149), no weight decay on 1-D params (utils.py:632-643),
- AdamW with decoupled, schedule-driven weight decay.

Distributed design: the reference wraps modules in DDP and all_reduces the
loss center over NCCL (main_dino.py:406-416).  Here the train step is one
pure jitted function over global-batch arrays; under a
``jax.sharding.Mesh`` with the batch sharded on the "dp" axis, every batch
reduction (loss mean, center mean, gradient averaging inside autodiff)
lowers to ICI collectives automatically — no hand-written psum needed, and
the same step runs single-chip or multi-pod unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_ac.data.mvtec import normalize_on_device
from tpu_ac.models.dino_head import dino_head_forward, init_dino_head_params
from tpu_ac.models.vit import ViTConfig, init_vit_params, vit_cls_forward

Params = Mapping[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class DINOConfig:
    """Mirrors the main_dino.py argparse defaults (main_dino.py:41-129)."""

    out_dim: int = 65536
    local_crops_number: int = 8
    global_size: int = 224
    local_size: int = 96
    warmup_teacher_temp: float = 0.04
    teacher_temp: float = 0.04
    warmup_teacher_temp_epochs: int = 0
    student_temp: float = 0.1
    center_momentum: float = 0.9
    momentum_teacher: float = 0.996
    use_bn_in_head: bool = False
    norm_last_layer: bool = True
    epochs: int = 100
    steps_per_epoch: int = 1000
    lr: float = 0.0005  # scaled by batch/256 by the caller, main_dino.py:226
    warmup_epochs: int = 10
    min_lr: float = 1e-6
    weight_decay: float = 0.04
    weight_decay_end: float = 0.4
    clip_grad: float = 3.0
    freeze_last_layer: int = 1
    head_hidden_dim: int = 2048
    head_bottleneck_dim: int = 256
    head_nlayers: int = 3
    remat: bool | str = False  # jax.checkpoint each block; 'dots' saves matmuls
    # lax.scan over the transformer blocks: one block body in the HLO
    # instead of `depth` copies — cuts train-step compile time ~depth-fold
    # at identical numerics (tested). Disable to let XLA unroll.
    scan_blocks: bool = True

    @property
    def ncrops(self) -> int:
        return 2 + self.local_crops_number

    @property
    def total_steps(self) -> int:
        return self.epochs * self.steps_per_epoch


def cosine_scheduler(base_value: float, final_value: float, total_steps: int,
                     warmup_steps: int = 0,
                     start_warmup_value: float = 0.0) -> np.ndarray:
    """dino-main/utils.py:187-198 as a per-step table."""
    warmup_steps = min(warmup_steps, total_steps)
    warmup = np.linspace(start_warmup_value, base_value, warmup_steps)
    iters = np.arange(total_steps - warmup_steps)
    cos = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / max(1, len(iters))))
    return np.concatenate([warmup, cos]).astype(np.float32)


class DINOTrainState(NamedTuple):
    student: dict[str, jnp.ndarray]      # backbone.* + head.* flat params
    teacher: dict[str, jnp.ndarray]
    opt_state: Any
    center: jnp.ndarray                  # [1, out_dim]
    step: jnp.ndarray                    # scalar int32


def _split_params(params: Params, prefix: str) -> dict[str, jnp.ndarray]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in params.items() if k.startswith(prefix)}


def _no_wd_mask(params: Params) -> dict[str, bool]:
    """True where weight decay applies: skip 1-D params and biases
    (dino-main/utils.py:632-643)."""
    return {k: (v.ndim > 1 and not k.endswith(".bias"))
            for k, v in params.items()}


def student_forward(params: Params, global_crops: jnp.ndarray,
                    local_crops: jnp.ndarray | None, vit_cfg: ViTConfig,
                    precision=jax.lax.Precision.DEFAULT,
                    remat: bool | str = False,
                    scan_blocks: bool = False) -> jnp.ndarray:
    """MultiCropWrapper forward (utils.py:594-629): backbone per resolution
    bucket, head on the concatenation.  Returns [(2+L)*B, out_dim]."""
    backbone = _split_params(params, "backbone.")
    head = _split_params(params, "head.")
    feats = [vit_cls_forward(backbone, global_crops, vit_cfg,
                             precision=precision, remat=remat,
                             scan_blocks=scan_blocks)]
    if local_crops is not None:
        feats.append(vit_cls_forward(backbone, local_crops, vit_cfg,
                                     precision=precision, remat=remat,
                                     scan_blocks=scan_blocks))
    return dino_head_forward(head, jnp.concatenate(feats), precision=precision)


def dino_loss(student_out: jnp.ndarray, teacher_out: jnp.ndarray,
              center: jnp.ndarray, ncrops: int, teacher_temp: jnp.ndarray,
              student_temp: float = 0.1) -> jnp.ndarray:
    """Cross-view CE of sharpened teacher vs student (main_dino.py:380-404).

    student_out: [ncrops*B, D]; teacher_out: [2*B, D] (stop-gradient'd by
    the caller's value_and_grad over student params only).
    """
    s = (student_out / student_temp).reshape(ncrops, -1, student_out.shape[-1])
    t = jax.nn.softmax((teacher_out - center) / teacher_temp, axis=-1)
    t = jax.lax.stop_gradient(t).reshape(2, -1, teacher_out.shape[-1])
    logp = jax.nn.log_softmax(s, axis=-1)
    total, n_terms = 0.0, 0
    for iq in range(2):
        for v in range(ncrops):
            if v == iq:
                continue
            total = total + jnp.mean(jnp.sum(-t[iq] * logp[v], axis=-1))
            n_terms += 1
    return total / n_terms


def _clip_per_param(grads: Params, clip: float) -> dict[str, jnp.ndarray]:
    """Per-parameter norm clipping (dino-main/utils.py:132-142)."""
    def clip_one(g):
        norm = jnp.sqrt(jnp.sum(jnp.square(g)))
        coef = jnp.minimum(clip / (norm + 1e-6), 1.0)
        return g * coef

    return {k: clip_one(g) for k, g in grads.items()}


def init_dino_state(seed: int, vit_cfg: ViTConfig,
                    cfg: DINOConfig) -> DINOTrainState:
    backbone = init_vit_params(seed, vit_cfg)
    head = init_dino_head_params(seed + 1, vit_cfg.embed_dim, cfg.out_dim,
                                 nlayers=cfg.head_nlayers,
                                 hidden_dim=cfg.head_hidden_dim,
                                 bottleneck_dim=cfg.head_bottleneck_dim)
    student = ({f"backbone.{k}": v for k, v in backbone.items()} |
               {f"head.{k}": v for k, v in head.items()})
    teacher = jax.tree.map(lambda x: x, student)  # teacher init = student
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    opt_state = adam.init(student)
    return DINOTrainState(
        student=student, teacher=teacher, opt_state=opt_state,
        center=jnp.zeros((1, cfg.out_dim), jnp.float32),
        step=jnp.zeros((), jnp.int32))


def make_step_schedule_tables(cfg: DINOConfig,
                              schedules: Mapping[str, np.ndarray]):
    """Per-STEP schedule tables — the ``tables`` argument of a
    ``make_dino_train_step(..., resident_schedules=True)`` step.

    Expands ``make_schedules`` output (lr/wd/momentum per step,
    teacher_temp per EPOCH, main_dino.py:371-377) plus the
    freeze-last-layer epoch rule (main_dino.py:334-336) into five
    length-``total_steps`` arrays indexed by the step counter inside the
    jitted step.  Eliminates the five per-step host->device scalar
    transfers (each a full link round trip on remote-attached chips).
    """
    t = cfg.total_steps
    epoch_of = np.minimum(np.arange(t) // cfg.steps_per_epoch,
                          cfg.epochs - 1)
    temp = np.asarray(schedules["teacher_temp"], np.float32)
    return {
        "lr": jnp.asarray(schedules["lr"], jnp.float32),
        "wd": jnp.asarray(schedules["wd"], jnp.float32),
        "momentum": jnp.asarray(schedules["momentum"], jnp.float32),
        "teacher_temp": jnp.asarray(
            temp[np.minimum(epoch_of, len(temp) - 1)]),
        "freeze_last": jnp.asarray(epoch_of < cfg.freeze_last_layer),
    }


def make_dino_train_step(vit_cfg: ViTConfig, cfg: DINOConfig,
                         precision=jax.lax.Precision.DEFAULT,
                         compute_dtype=None, resident_schedules=False):
    """Build the jittable train step.

    Step signature: (state, global_crops [2B, 3, Hg, Wg],
    local_crops [L*B, 3, Hl, Wl] or None, lr, wd, teacher_momentum,
    teacher_temp, freeze_last) -> (state, metrics).

    Schedule values are passed as traced scalars so one compiled program
    serves the whole run (the reference indexes per-iteration numpy tables,
    main_dino.py:309-312 — do the same on the host and feed the scalars).

    With ``resident_schedules=True`` the signature becomes
    ``(state, global_crops, local_crops, tables)`` where ``tables`` is the
    dict from :func:`make_step_schedule_tables`: all five values are
    gathered on DEVICE at ``min(state.step, total_steps - 1)`` — the
    reference's ``it`` clamp (main_dino.py:309) — so a remote link pays
    zero schedule round trips per step.  The tables are ordinary jit
    arguments (already device-resident, so passing them is free), NOT
    closed-over constants — at ImageNet scale (~2M steps) inlined tables
    would add ~40 MB of HLO constants to a remote-compile path that
    rejects >100 MB payloads.

    Contract: the resident path is numerically equivalent to the
    host-scalar path within a 1-2 ulp tolerance, NOT bit-identical — the
    table gather fuses differently than a passed scalar, so XLA may emit
    a differently-associated fusion for the same math (PARITY.md #22).

    ``compute_dtype=jnp.bfloat16`` is the TPU mixed-precision mode (the
    reference's fp16 autocast + GradScaler, main_dino.py:233-235,337-344):
    forward/backward run in bf16 with f32 master params, optimizer state,
    loss, and center.  bf16's f32-equal exponent range needs no loss
    scaling, so there is no GradScaler equivalent.
    """
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    use_local = cfg.local_crops_number > 0
    ncrops = cfg.ncrops if use_local else 2

    def _cast(tree):
        if compute_dtype is None:
            return tree
        return jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def loss_fn(student_params, teacher_params, center, g_crops, l_crops,
                teacher_temp):
        sp, tp = _cast(student_params), _cast(teacher_params)
        g_crops = _cast(g_crops)
        l_crops = _cast(l_crops) if l_crops is not None else None
        t_out = student_forward(tp, g_crops, None, vit_cfg,
                                precision, scan_blocks=cfg.scan_blocks
                                ).astype(jnp.float32)
        s_out = student_forward(sp, g_crops,
                                l_crops if use_local else None, vit_cfg,
                                precision, remat=cfg.remat,
                                scan_blocks=cfg.scan_blocks
                                ).astype(jnp.float32)
        loss = dino_loss(s_out, jax.lax.stop_gradient(t_out), center, ncrops,
                         teacher_temp, cfg.student_temp)
        return loss, t_out

    def train_step(state: DINOTrainState, global_crops, local_crops,
                   lr, wd, teacher_momentum, teacher_temp, freeze_last):
        # uint8 crops = the device-side normalization path (4x less
        # host->device transfer than pre-normalized f32; the loader emits
        # them via DINOAugmentation(normalize=False)).  dtype is static
        # under jit, so this branch resolves at trace time.
        if global_crops.dtype == jnp.uint8:
            global_crops = normalize_on_device(global_crops)
        if local_crops is not None and local_crops.dtype == jnp.uint8:
            local_crops = normalize_on_device(local_crops)
        (loss, t_out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.student, state.teacher, state.center, global_crops,
            local_crops, teacher_temp)

        if cfg.clip_grad:
            grads = _clip_per_param(grads, cfg.clip_grad)
        # cancel_gradients_last_layer (utils.py:144-149): torch sets
        # p.grad=None so optimizer.step skips the param entirely (no adam
        # update, no weight decay) — mask the whole parameter update.
        frozen = {
            k: (freeze_last if k.startswith("head.last_layer")
                else jnp.asarray(False))
            for k in grads
        }
        grads = {k: jnp.where(frozen[k], jnp.zeros_like(g), g)
                 for k, g in grads.items()}

        updates, opt_state = adam.update(grads, state.opt_state)
        wd_mask = _no_wd_mask(state.student)
        student = {
            k: jnp.where(
                frozen[k], p,
                p - lr * (updates[k] + (wd if wd_mask[k] else 0.0) * p))
            for k, p in state.student.items()
        }
        # norm_last_layer: weight_g frozen at 1 (vision_transformer.py:278-280)
        if cfg.norm_last_layer and "head.last_layer.weight_g" in student:
            student["head.last_layer.weight_g"] = (
                state.student["head.last_layer.weight_g"])

        m = teacher_momentum
        teacher = {
            k: m * state.teacher[k] + (1.0 - m) * student[k]
            for k in state.teacher
        }

        # center EMA over the *global* teacher batch (main_dino.py:406-416);
        # with dp-sharded inputs this mean is a cross-chip reduction XLA
        # lowers to a psum over ICI.
        batch_center = jnp.mean(t_out, axis=0, keepdims=True)
        center = (state.center * cfg.center_momentum +
                  batch_center * (1.0 - cfg.center_momentum))

        new_state = DINOTrainState(student=student, teacher=teacher,
                                   opt_state=opt_state, center=center,
                                   step=state.step + 1)
        return new_state, {"loss": loss, "lr": lr, "wd": wd}

    if not resident_schedules:
        return train_step

    def train_step_resident(state: DINOTrainState, global_crops,
                            local_crops, tables):
        it = jnp.minimum(state.step, cfg.total_steps - 1)
        return train_step(state, global_crops, local_crops,
                          lr=tables["lr"][it], wd=tables["wd"][it],
                          teacher_momentum=tables["momentum"][it],
                          teacher_temp=tables["teacher_temp"][it],
                          freeze_last=tables["freeze_last"][it])

    return train_step_resident


def make_dino_multi_step(vit_cfg: ViTConfig, cfg: DINOConfig, k: int,
                         precision=jax.lax.Precision.DEFAULT,
                         compute_dtype=None):
    """k train steps fused into ONE jitted program via ``lax.scan``.

    Signature: ``(state, global_stack [k, 2B, 3, Hg, Wg],
    local_stack [k, L*B, 3, Hl, Wl] or None, tables) -> (state,
    metrics)`` with each metric leaf stacked ``[k]``.

    TPU-native dispatch amortization: on remote-attached chips every
    dispatch pays the link round trip (~30-50 ms through a tunnel), so a
    k-step program divides the per-step dispatch/fetch overhead by k.
    The scan body is exactly the resident-schedule single step — same
    math, same per-step schedule gathers at the advancing ``state.step``
    — so the k-step chain is the same program composition XLA would run
    step-by-step (equivalence pinned by
    tests/test_dino_train.py::TestMultiStep).  The reference has no
    equivalent; its loop is host-driven per step (main_dino.py:306-356).

    Trade-offs: the loader must stage k batches of crops ahead (k x the
    in-flight batch memory) and NaN detection lags up to k steps.
    """
    if k < 1:
        raise ValueError(f"steps_per_dispatch must be >= 1, got {k}")
    step = make_dino_train_step(vit_cfg, cfg, precision, compute_dtype,
                                resident_schedules=True)

    def multi_step(state: DINOTrainState, global_stack, local_stack,
                   tables):
        def body(s, crops):
            g, l = crops
            s2, m = step(s, g, l, tables)
            return s2, m

        xs = (global_stack,
              local_stack if local_stack is not None
              else jnp.zeros((global_stack.shape[0], 0)))
        if local_stack is None:
            def body(s, crops):  # noqa: F811 — no-local variant
                g, _ = crops
                s2, m = step(s, g, None, tables)
                return s2, m
        return jax.lax.scan(body, state, xs)

    return multi_step


def make_schedules(cfg: DINOConfig, batch_size_global: int):
    """Per-step lr/wd/momentum tables (main_dino.py:238-251)."""
    scaled_lr = cfg.lr * batch_size_global / 256.0
    lr = cosine_scheduler(scaled_lr, cfg.min_lr, cfg.total_steps,
                          cfg.warmup_epochs * cfg.steps_per_epoch)
    wd = cosine_scheduler(cfg.weight_decay, cfg.weight_decay_end,
                          cfg.total_steps)
    mom = cosine_scheduler(cfg.momentum_teacher, 1.0, cfg.total_steps)
    # teacher temp warmup is per-epoch (main_dino.py:371-377)
    temp = np.concatenate([
        np.linspace(cfg.warmup_teacher_temp, cfg.teacher_temp,
                    cfg.warmup_teacher_temp_epochs),
        np.full(max(0, cfg.epochs - cfg.warmup_teacher_temp_epochs),
                cfg.teacher_temp),
    ]).astype(np.float32)
    return {"lr": lr, "wd": wd, "momentum": mom, "teacher_temp": temp}
