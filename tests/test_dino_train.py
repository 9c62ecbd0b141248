"""DINO train step: correctness invariants + dp-sharded execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_ac.models.vit import ViTConfig
from tpu_ac.train import (
    DINOConfig,
    init_dino_state,
    make_dino_train_step,
    cosine_scheduler,
)

TINY_VIT = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                     img_size=32)
TINY_CFG = DINOConfig(out_dim=64, local_crops_number=2, global_size=32,
                      local_size=16, head_hidden_dim=32,
                      head_bottleneck_dim=16, epochs=2, steps_per_epoch=4)


@pytest.fixture(scope="module")
def state():
    return init_dino_state(0, TINY_VIT, TINY_CFG)


@pytest.fixture(scope="module")
def batch(rng):
    b = 8
    g = rng.standard_normal((2 * b, 3, 32, 32)).astype(np.float32)
    l = rng.standard_normal((2 * b, 3, 16, 16)).astype(np.float32)
    return jnp.asarray(g), jnp.asarray(l)


def _scalars(freeze=False):
    return dict(lr=jnp.float32(1e-3), wd=jnp.float32(0.04),
                teacher_momentum=jnp.float32(0.996),
                teacher_temp=jnp.float32(0.04),
                freeze_last=jnp.asarray(freeze))


class TestDinoStep:
    def test_step_runs_and_loss_finite(self, state, batch):
        step = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG))
        g, l = batch
        new_state, metrics = step(state, g, l, **_scalars())
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1

    def test_teacher_is_ema_of_student(self, state, batch):
        step = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG))
        g, l = batch
        s1, _ = step(state, g, l, **_scalars())
        k = "backbone.blocks.0.attn.qkv.weight"
        m = 0.996
        want = m * np.asarray(state.teacher[k]) + (1 - m) * np.asarray(s1.student[k])
        np.testing.assert_allclose(np.asarray(s1.teacher[k]), want,
                                   rtol=1e-5, atol=1e-7)

    def test_center_updates(self, state, batch):
        step = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG))
        g, l = batch
        s1, _ = step(state, g, l, **_scalars())
        assert not np.allclose(np.asarray(s1.center), 0.0)

    def test_freeze_last_layer(self, state, batch):
        step = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG))
        g, l = batch
        s1, _ = step(state, g, l, **_scalars(freeze=True))
        np.testing.assert_array_equal(
            np.asarray(s1.student["head.last_layer.weight_v"]),
            np.asarray(state.student["head.last_layer.weight_v"]))
        # non-frozen params did move
        assert not np.allclose(
            np.asarray(s1.student["head.mlp.0.weight"]),
            np.asarray(state.student["head.mlp.0.weight"]))

    def test_weight_g_frozen_by_norm_last_layer(self, state, batch):
        step = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG))
        g, l = batch
        s1, _ = step(state, g, l, **_scalars())
        np.testing.assert_array_equal(
            np.asarray(s1.student["head.last_layer.weight_g"]),
            np.asarray(state.student["head.last_layer.weight_g"]))

    def test_loss_decreases_over_steps(self, state, batch):
        step = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG))
        g, l = batch
        s = state
        losses = []
        for _ in range(5):
            s, m = step(s, g, l, **_scalars())
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # same batch -> should overfit


class TestDinoSharded:
    def test_dp_sharded_step_matches_replicated(self, state, batch):
        """The same step under an 8-device dp mesh gives the same numbers."""
        devs = jax.devices()
        assert len(devs) == 8, "conftest must provide 8 virtual CPU devices"
        mesh = Mesh(np.array(devs), ("dp",))
        step = make_dino_train_step(TINY_VIT, TINY_CFG)

        g, l = batch
        batch_sharding = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        g_sh = jax.device_put(g, batch_sharding)
        l_sh = jax.device_put(l, batch_sharding)
        state_sh = jax.device_put(state, repl)

        sharded_step = jax.jit(step)
        s1, m1 = sharded_step(state_sh, g_sh, l_sh, **_scalars())
        s2, m2 = jax.jit(step)(state, g, l, **_scalars())
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s1.center), np.asarray(s2.center), rtol=1e-5, atol=1e-7)


class TestSchedules:
    def test_cosine_scheduler_shape_and_endpoints(self):
        s = cosine_scheduler(1.0, 0.1, 100, warmup_steps=10)
        assert len(s) == 100
        assert s[0] == 0.0 and abs(s[9] - 1.0) < 0.11
        assert abs(s[-1] - 0.1) < 0.01

    def test_make_schedules(self):
        from tpu_ac.train.dino import make_schedules
        sch = make_schedules(TINY_CFG, batch_size_global=64)
        assert len(sch["lr"]) == TINY_CFG.total_steps
        assert len(sch["teacher_temp"]) == TINY_CFG.epochs
        assert sch["momentum"][-1] <= 1.0


class TestResidentSchedules:
    """Device-resident schedule tables gathered by state.step must match
    the host-scalar path (main_dino.py:309-312 indexing).  Contract
    (PARITY.md #22): the gathered SCALARS (lr/wd/...) are bit-identical —
    both sides round the same float64 table entry to f32 — but the LOSS
    and params may differ by ~1 ulp because a table gather fuses into the
    downstream program differently than a passed scalar."""

    def test_tables_shapes_and_freeze_rule(self):
        from tpu_ac.train.dino import make_schedules, make_step_schedule_tables
        sch = make_schedules(TINY_CFG, batch_size_global=64)
        tab = make_step_schedule_tables(TINY_CFG, sch)
        t = TINY_CFG.total_steps
        assert all(len(tab[k]) == t for k in
                   ("lr", "wd", "momentum", "teacher_temp", "freeze_last"))
        # freeze_last_layer=1 -> frozen exactly during epoch 0
        spe = TINY_CFG.steps_per_epoch
        assert bool(tab["freeze_last"][spe - 1]) is True
        assert bool(tab["freeze_last"][spe]) is False
        # teacher_temp expands the per-EPOCH table
        np.testing.assert_array_equal(
            np.asarray(tab["teacher_temp"][:spe]),
            np.full(spe, sch["teacher_temp"][0], np.float32))

    def test_resident_matches_host_scalars_over_epochs(self, batch):
        from tpu_ac.train.dino import make_schedules, make_step_schedule_tables
        sch = make_schedules(TINY_CFG, batch_size_global=64)
        tab = make_step_schedule_tables(TINY_CFG, sch)
        step_host = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG))
        step_res = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG,
                                                resident_schedules=True))
        g, l = batch
        s_h = init_dino_state(0, TINY_VIT, TINY_CFG)
        s_r = init_dino_state(0, TINY_VIT, TINY_CFG)
        spe = TINY_CFG.steps_per_epoch
        # 6 steps cross the epoch-0/1 boundary (freeze flips) and exercise
        # the moving lr/wd/momentum tables
        for it in range(6):
            epoch = it // spe
            s_h, m_h = step_host(
                s_h, g, l,
                lr=jnp.float32(sch["lr"][it]), wd=jnp.float32(sch["wd"][it]),
                teacher_momentum=jnp.float32(sch["momentum"][it]),
                teacher_temp=jnp.float32(sch["teacher_temp"][epoch]),
                freeze_last=jnp.asarray(
                    epoch < TINY_CFG.freeze_last_layer))
            s_r, m_r = step_res(s_r, g, l, tab)
            # loss: ≤2 ulp (fusion-order tolerance, see class docstring)
            np.testing.assert_allclose(np.asarray(m_h["loss"]),
                                       np.asarray(m_r["loss"]),
                                       rtol=5e-7, atol=0)
            # the gathered schedule scalar itself IS bit-identical
            np.testing.assert_array_equal(np.asarray(m_h["lr"]),
                                          np.asarray(m_r["lr"]))
        k = "backbone.blocks.0.attn.qkv.weight"
        np.testing.assert_allclose(np.asarray(s_h.student[k]),
                                   np.asarray(s_r.student[k]),
                                   rtol=5e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(s_h.teacher[k]),
                                   np.asarray(s_r.teacher[k]),
                                   rtol=5e-7, atol=1e-9)

    def test_step_clamps_past_total_steps(self, batch):
        from tpu_ac.train.dino import make_schedules, make_step_schedule_tables
        sch = make_schedules(TINY_CFG, batch_size_global=64)
        tab = make_step_schedule_tables(TINY_CFG, sch)
        step_res = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG,
                                                resident_schedules=True))
        g, l = batch
        s = init_dino_state(0, TINY_VIT, TINY_CFG)._replace(
            step=jnp.asarray(TINY_CFG.total_steps + 3, jnp.int32))
        _, m = step_res(s, g, l, tab)
        # the reference clamps it to the last table entry (main_dino.py:309)
        np.testing.assert_array_equal(np.asarray(m["lr"]),
                                      np.float32(sch["lr"][-1]))


class TestMultiStep:
    """k-step fused dispatch (make_dino_multi_step): one lax.scan program
    must equal k sequential resident-schedule steps."""

    def test_matches_sequential_steps(self, batch):
        from tpu_ac.train.dino import (make_dino_multi_step,
                                       make_schedules,
                                       make_step_schedule_tables)
        sch = make_schedules(TINY_CFG, batch_size_global=64)
        tab = make_step_schedule_tables(TINY_CFG, sch)
        step = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG,
                                            resident_schedules=True))
        multi = jax.jit(make_dino_multi_step(TINY_VIT, TINY_CFG, k=3))
        g, l = batch
        rng = np.random.default_rng(7)
        gs = jnp.asarray(rng.standard_normal(
            (3, *np.shape(g))).astype(np.float32))
        ls = jnp.asarray(rng.standard_normal(
            (3, *np.shape(l))).astype(np.float32))

        s_seq = init_dino_state(0, TINY_VIT, TINY_CFG)
        seq_losses = []
        for i in range(3):
            s_seq, m = step(s_seq, gs[i], ls[i], tab)
            seq_losses.append(float(m["loss"]))
        s_multi = init_dino_state(0, TINY_VIT, TINY_CFG)
        s_multi, ms = multi(s_multi, gs, ls, tab)

        assert ms["loss"].shape == (3,)
        np.testing.assert_allclose(np.asarray(ms["loss"]),
                                   np.asarray(seq_losses),
                                   rtol=5e-7, atol=0)
        # lr stacked per inner step follows the advancing step counter
        np.testing.assert_array_equal(
            np.asarray(ms["lr"]), np.asarray(sch["lr"][:3], np.float32))
        assert int(s_multi.step) == int(s_seq.step) == 3
        k = "backbone.blocks.0.attn.qkv.weight"
        np.testing.assert_allclose(np.asarray(s_multi.student[k]),
                                   np.asarray(s_seq.student[k]),
                                   rtol=5e-7, atol=1e-8)
        np.testing.assert_allclose(np.asarray(s_multi.teacher[k]),
                                   np.asarray(s_seq.teacher[k]),
                                   rtol=5e-7, atol=1e-8)

    def test_no_local_crops_variant(self, batch):
        from tpu_ac.train.dino import (make_dino_multi_step,
                                       make_schedules,
                                       make_step_schedule_tables)
        import dataclasses

        cfg = dataclasses.replace(TINY_CFG, local_crops_number=0)
        sch = make_schedules(cfg, batch_size_global=64)
        tab = make_step_schedule_tables(cfg, sch)
        multi = jax.jit(make_dino_multi_step(TINY_VIT, cfg, k=2))
        g, _ = batch
        gs = jnp.stack([g, g])
        s = init_dino_state(0, TINY_VIT, cfg)
        s, ms = multi(s, gs, None, tab)
        assert ms["loss"].shape == (2,)
        assert np.isfinite(np.asarray(ms["loss"])).all()

    def test_rejects_k_below_one(self):
        from tpu_ac.train.dino import make_dino_multi_step
        with pytest.raises(ValueError):
            make_dino_multi_step(TINY_VIT, TINY_CFG, k=0)


class TestMixedPrecision:
    def test_bf16_step_close_to_f32(self, state, batch):
        step32 = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG))
        step16 = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG,
                                              compute_dtype=jnp.bfloat16))
        g, l = batch
        _, m32 = step32(state, g, l, **_scalars())
        s16, m16 = step16(state, g, l, **_scalars())
        assert np.isfinite(float(m16["loss"]))
        # same objective within bf16 tolerance
        assert abs(float(m16["loss"]) - float(m32["loss"])) < 0.05
        # master params stay f32
        assert s16.student["backbone.cls_token"].dtype == jnp.float32


class TestRemat:
    def test_remat_step_matches_plain(self, state, batch):
        import dataclasses
        cfg_r = dataclasses.replace(TINY_CFG, remat=True)
        step_r = jax.jit(make_dino_train_step(TINY_VIT, cfg_r))
        step_p = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG))
        g, l = batch
        sr, mr = step_r(state, g, l, **_scalars())
        sp, mp = step_p(state, g, l, **_scalars())
        np.testing.assert_allclose(float(mr["loss"]), float(mp["loss"]),
                                   rtol=1e-6)
        k = "backbone.blocks.0.attn.qkv.weight"
        np.testing.assert_allclose(np.asarray(sr.student[k]),
                                   np.asarray(sp.student[k]),
                                   rtol=1e-5, atol=1e-7)
        cfg_d = dataclasses.replace(TINY_CFG, remat="dots")
        sd, md = jax.jit(make_dino_train_step(TINY_VIT, cfg_d))(
            state, g, l, **_scalars())
        np.testing.assert_allclose(float(md["loss"]), float(mp["loss"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sd.student[k]),
                                   np.asarray(sp.student[k]),
                                   rtol=1e-5, atol=1e-7)


class TestUint8Input:
    """The device-side normalization path: uint8 crops in, same training."""

    def test_uint8_step_matches_host_normalized(self, state, rng):
        from tpu_ac.data.mvtec import IMAGENET_MEAN, IMAGENET_STD

        b = 4
        g_u8 = rng.integers(0, 256, (2 * b, 3, 32, 32)).astype(np.uint8)
        l_u8 = rng.integers(0, 256, (2 * b, 3, 16, 16)).astype(np.uint8)

        def host_norm(u8):
            arr = u8.astype(np.float32) / 255.0
            m = IMAGENET_MEAN[:, None, None]
            s = IMAGENET_STD[:, None, None]
            return (arr - m) / s

        step = jax.jit(make_dino_train_step(TINY_VIT, TINY_CFG))
        s_u8, m_u8 = step(state, jnp.asarray(g_u8), jnp.asarray(l_u8),
                          **_scalars())
        s_f32, m_f32 = step(state, jnp.asarray(host_norm(g_u8)),
                            jnp.asarray(host_norm(l_u8)), **_scalars())
        np.testing.assert_allclose(float(m_u8["loss"]),
                                   float(m_f32["loss"]), rtol=1e-5)
        k = "backbone.blocks.0.attn.qkv.weight"
        # Not bit-identical by contract: the in-jit (u8/255 - m)/s chain
        # may fuse into a different FMA order than host normalization
        # (~1 ulp on the inputs), and AdamW's m/(sqrt(v)+eps) amplifies
        # that for near-zero-gradient elements — a first-step update is
        # ~lr-sized (1e-3), so allow a small absolute slice of it
        # (observed worst case 1.8e-5 on 2/3072 elements in full-suite
        # runs; a wrong normalization constant would shift EVERY element
        # by ~1e-3 and still fail).
        np.testing.assert_allclose(np.asarray(s_u8.student[k]),
                                   np.asarray(s_f32.student[k]),
                                   rtol=1e-4, atol=5e-5)

    def test_uint8_no_locals(self, state, rng):
        cfg = DINOConfig(**{**TINY_CFG.__dict__, "local_crops_number": 0})
        step = jax.jit(make_dino_train_step(TINY_VIT, cfg))
        g_u8 = jnp.asarray(
            rng.integers(0, 256, (8, 3, 32, 32)).astype(np.uint8))
        st = init_dino_state(0, TINY_VIT, cfg)
        _, metrics = step(st, g_u8, None, **_scalars())
        assert np.isfinite(float(metrics["loss"]))
