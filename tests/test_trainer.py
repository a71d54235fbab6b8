"""Trainer semantics: LR schedule parity, EMA warmup, loss descent, ckpt."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinddm_tpu.config import DiffusionConfig, TrainConfig
from sinddm_tpu.models import SinDDMNet
from sinddm_tpu.schedules import make_schedules
from sinddm_tpu.training import MultiscaleTrainer
from sinddm_tpu.training.trainer import _ema_update, make_lr_schedule


@pytest.fixture(scope="module")
def tiny_setup(tiny_pyramid):
    sched = make_schedules(
        timesteps=100,
        scale_losses=tiny_pyramid.rescale_losses,
        n_scales=tiny_pyramid.n_scales,
    )
    model = SinDDMNet(dim=8)
    return model, sched, tiny_pyramid


def test_lr_schedule_matches_torch_multistep():
    """lr(k) = lr0 * 0.5^|{m : m <= k}| (torch MultiStepLR semantics)."""
    cfg = TrainConfig(train_lr=1e-3, sched_milestones=(10, 20), lr_gamma=0.5)
    sch = make_lr_schedule(cfg)
    assert float(sch(0)) == pytest.approx(1e-3)
    assert float(sch(9)) == pytest.approx(1e-3)
    assert float(sch(10)) == pytest.approx(5e-4)
    assert float(sch(19)) == pytest.approx(5e-4)
    assert float(sch(20)) == pytest.approx(2.5e-4)
    assert float(sch(100)) == pytest.approx(2.5e-4)


def test_ema_semantics():
    cfg = TrainConfig(ema_decay=0.9, step_start_ema=20, update_ema_every=10)
    p = {"w": jnp.asarray(2.0)}
    e = {"w": jnp.asarray(1.0)}
    # warmup step on the cadence: hard copy
    out = _ema_update(e, p, jnp.asarray(10), cfg)
    assert float(out["w"]) == 2.0
    # off-cadence: unchanged
    out = _ema_update(e, p, jnp.asarray(11), cfg)
    assert float(out["w"]) == 1.0
    # past warmup on cadence: lerp 0.9*1 + 0.1*2
    out = _ema_update(e, p, jnp.asarray(30), cfg)
    assert float(out["w"]) == pytest.approx(1.1)


def test_fused_chunk_descends_and_matches_scales(tiny_setup):
    model, sched, pyr = tiny_setup
    cfg = TrainConfig(
        train_batch_size=4, train_num_steps=100, steps_per_chunk=40,
        step_start_ema=10**9,
    )
    tr = MultiscaleTrainer(
        model, sched, pyr, cfg, DiffusionConfig(), "/tmp/test_tr_fused", seed=0
    )
    losses = tr.train_chunk(40)
    assert losses.shape == (40,)
    assert np.isfinite(losses).all()
    # training reduces loss on this tiny problem
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    # every scale was visited
    assert set(tr.running_scale) == set(range(pyr.n_scales))
    assert tr.step == 40


def test_per_scale_step_and_fused_agree_in_distribution(tiny_setup):
    """Same init: first per-scale loss and first fused loss are comparable."""
    model, sched, pyr = tiny_setup
    cfg = TrainConfig(train_batch_size=4, steps_per_chunk=4)
    tr1 = MultiscaleTrainer(
        model, sched, pyr, cfg, DiffusionConfig(), "/tmp/test_tr1", seed=0
    )
    tr2 = MultiscaleTrainer(
        model, sched, pyr, cfg, DiffusionConfig(), "/tmp/test_tr2", seed=0
    )
    l_per = tr1.train_step(s=1)
    l_fused = float(tr2.train_chunk(4)[0])
    # same initial params, same data distribution -> same loss scale
    assert abs(l_per - l_fused) / l_per < 0.5


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    model, sched, pyr = tiny_setup
    cfg = TrainConfig(train_batch_size=2, steps_per_chunk=2)
    tr = MultiscaleTrainer(
        model, sched, pyr, cfg, DiffusionConfig(), str(tmp_path), seed=0
    )
    tr.train_chunk(2)
    tr.running_loss = [0.5, 0.4]
    tr.save(1)

    tr2 = MultiscaleTrainer(
        model, sched, pyr, cfg, DiffusionConfig(), str(tmp_path), seed=99
    )
    tr2.load(1)
    assert tr2.step == tr.step
    assert tr2.running_loss == [0.5, 0.4]
    chex_equal = jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.array_equal(a, b)),
                     tr.state.params, tr2.state.params)
    )
    assert chex_equal
    # optimizer state restored too (the reference drops it — we keep it)
    opt_equal = jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.array_equal(a, b)),
                     tr.state.opt_state, tr2.state.opt_state)
    )
    assert opt_equal


def test_grouped_chunk_descends_and_counts(tiny_setup):
    from sinddm_tpu.config import DiffusionConfig, TrainConfig

    model, sched, pyr = tiny_setup
    cfg = TrainConfig(
        train_batch_size=4, steps_per_chunk=20, fused_mode="grouped",
        step_start_ema=10**9,
    )
    tr = MultiscaleTrainer(
        model, sched, pyr, cfg, DiffusionConfig(), "/tmp/test_tr_grp", seed=0
    )
    losses = tr.train_chunk_grouped(5 * pyr.n_scales)
    assert losses.shape == (5 * pyr.n_scales,)
    assert np.isfinite(losses).all()
    assert tr.step == 5 * pyr.n_scales
    # every scale visited exactly 5 times
    import collections

    counts = collections.Counter(tr.running_scale)
    assert all(counts[s] == 5 for s in range(pyr.n_scales))
    # more training reduces loss
    l2 = tr.train_chunk_grouped(5 * pyr.n_scales)
    assert np.mean(l2) < np.mean(losses)


def test_load_latest_milestone(tiny_setup, tmp_path):
    from sinddm_tpu.config import DiffusionConfig, TrainConfig

    model, sched, pyr = tiny_setup
    cfg = TrainConfig(train_batch_size=2, steps_per_chunk=2)
    tr = MultiscaleTrainer(
        model, sched, pyr, cfg, DiffusionConfig(), str(tmp_path), seed=0
    )
    tr.train_chunk_grouped(2)
    tr.save(1)
    tr.train_chunk_grouped(2)
    tr.save(3)
    tr2 = MultiscaleTrainer(
        model, sched, pyr, cfg, DiffusionConfig(), str(tmp_path), seed=1
    )
    assert tr2.latest_milestone() == 3
    tr2.load(-1)
    assert tr2.step == tr.step
