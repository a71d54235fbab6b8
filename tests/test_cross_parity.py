"""End-to-end sampler parity against the reference's OWN code.

The strongest parity check in the suite: export random flax denoiser
weights to torch (``models/export_reference.py``), load them into the
reference's ``MultiScaleGaussianDiffusion`` (``SinDDM/models.py:155-631``)
on CPU, feed both samplers an IDENTICAL noise sequence, and assert the
full reverse processes match — scale-0 DDPM (``p_sample_loop``,
models.py:462-487), the reblur via-scale chain (``p_sample_via_scale_loop``,
models.py:501-547) including the custom posterior, and the omega-variance
branch (models.py:331-345).

Noise identity: our sampler's draws are a pure function of the JAX key
(split sequence in ``diffusion/core.py``: sample_scale0 splits once for
the init noise then once per scan step; sample_via_scale splits once for
the q_sample noise then once per step). We replay that sequence host-side
and monkeypatch the reference's ``noise_like`` / ``torch.randn`` /
``torch.randn_like`` to pop from it.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tests")
from _reference_loader import load_reference_models

from sinddm_tpu.diffusion.core import sample_scale0, sample_via_scale
from sinddm_tpu.models import SinDDMNet
from sinddm_tpu.models.convert_reference import denoiser_params_from_state_dict
from sinddm_tpu.models.export_reference import (
    diffusion_state_dict,
    state_dict_from_denoiser_params,
)
from sinddm_tpu.ops.resize import resize_bilinear
from sinddm_tpu.schedules import make_schedules

# tiny-but-real configuration: 3 scales, T=20, dim-16 denoiser
T = 20
N_SCALES = 3
SIZES_HW = [(12, 16), (17, 23), (24, 32)]
SCALE_LOSSES = [0.35, 0.2]
SCALE_FACTOR = 1.411
DIM = 16
BATCH = 2


@pytest.fixture(scope="module")
def setup():
    ref_models = load_reference_models()
    key = jax.random.PRNGKey(7)
    model = SinDDMNet(dim=DIM)
    params = model.init(
        key, jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,)), jnp.asarray(0.0)
    )["params"]
    sched = make_schedules(
        timesteps=T, scale_losses=SCALE_LOSSES, n_scales=N_SCALES
    )

    ref_net = ref_models.SinDDMNet(dim=DIM, multiscale=True, device="cpu")
    ref_diff = ref_models.MultiScaleGaussianDiffusion(
        denoise_fn=ref_net,
        n_scales=N_SCALES,
        scale_factor=SCALE_FACTOR,
        image_sizes=[(w, h) for h, w in SIZES_HW],  # reference takes (W, H)
        timesteps=T,
        train_full_t=True,
        scale_losses=SCALE_LOSSES,
        loss_factor=1.0,
        device="cpu",
        reblurring=True,
    )
    # strict load of the FULL exported diffusion state dict — proves the
    # exported payload carries every buffer the reference registers
    ref_diff.load_state_dict(
        {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in diffusion_state_dict(params, sched).items()
        }
    )
    ref_diff.eval()

    def model_fn(x, t, s):
        return model.apply({"params": params}, x, t, s)

    return ref_models, ref_diff, model_fn, params, sched


def _replay_draws(key, shape_nhwc, n_steps, with_init):
    """Reproduce the sampler's normal draws for a given starting key."""
    draws = []
    if with_init:
        key, k0 = jax.random.split(key)
        draws.append(np.asarray(jax.random.normal(k0, shape_nhwc, jnp.float32)))
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        draws.append(np.asarray(jax.random.normal(sub, shape_nhwc, jnp.float32)))
    return draws


class _NoiseQueue:
    def __init__(self, draws_nhwc):
        self.q = [
            torch.from_numpy(np.ascontiguousarray(np.transpose(a, (0, 3, 1, 2))))
            for a in draws_nhwc
        ]

    def pop(self, shape):
        t = self.q.pop(0)
        assert tuple(t.shape) == tuple(shape), (tuple(t.shape), tuple(shape))
        return t


def _patch_ref_noise(monkeypatch, ref_models, queue):
    monkeypatch.setattr(
        ref_models, "noise_like", lambda shape, device, repeat=False: queue.pop(shape)
    )
    monkeypatch.setattr(
        torch, "randn", lambda *size, **kw: queue.pop(size[0] if len(size) == 1 else size)
    )
    monkeypatch.setattr(torch, "randn_like", lambda x, **kw: queue.pop(x.shape))


def _nchw(x_nhwc):
    return torch.from_numpy(
        np.ascontiguousarray(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)))
    )


def _nhwc(x_torch):
    return np.transpose(x_torch.detach().numpy(), (0, 2, 3, 1))


def test_exporter_importer_round_trip():
    key = jax.random.PRNGKey(0)
    model = SinDDMNet(dim=DIM)
    params = model.init(
        key, jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,)), jnp.asarray(0.0)
    )["params"]
    sd = state_dict_from_denoiser_params(params)
    back = denoiser_params_from_state_dict(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert set(flat_b) == {p for p, _ in flat_a}
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[path]))


def test_schedule_buffers_match_reference(setup):
    """Our Schedules must equal the buffers the reference derives itself."""
    ref_models, _, _, params, sched = setup
    ref_own = ref_models.MultiScaleGaussianDiffusion(
        denoise_fn=ref_models.SinDDMNet(dim=DIM, multiscale=True, device="cpu"),
        n_scales=N_SCALES,
        scale_factor=SCALE_FACTOR,
        image_sizes=[(w, h) for h, w in SIZES_HW],
        timesteps=T,
        train_full_t=True,
        scale_losses=SCALE_LOSSES,
        loss_factor=1.0,
        device="cpu",
        reblurring=True,
    )
    exported = diffusion_state_dict(params, sched)
    for name, buf in ref_own.named_buffers():
        np.testing.assert_allclose(
            exported[name], buf.numpy(), atol=1e-6, rtol=1e-6, err_msg=name
        )
    assert list(ref_own.num_timesteps_ideal) == list(sched.num_timesteps_ideal)
    assert list(ref_own.num_timesteps_trained) == list(sched.num_timesteps_trained)


def test_scale0_loop_matches_reference(setup, monkeypatch):
    ref_models, ref_diff, model_fn, _, sched = setup
    h, w = SIZES_HW[0]
    key = jax.random.PRNGKey(11)

    ours, _, _ = sample_scale0(model_fn, sched, (BATCH, h, w, 3), key, s=0)

    queue = _NoiseQueue(_replay_draws(key, (BATCH, h, w, 3), T, with_init=True))
    _patch_ref_noise(monkeypatch, ref_models, queue)
    with torch.no_grad():
        theirs = ref_diff.p_sample_loop((BATCH, 3, h, w), s=0)
    assert not queue.q  # every injected draw consumed
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), atol=1e-4)


@pytest.mark.parametrize("s,custom_t,omega", [(1, 12, 0.0), (2, 8, 0.5)])
def test_via_scale_loop_matches_reference(setup, monkeypatch, s, custom_t, omega):
    """Reblur chain incl. deblend, custom posterior, and omega variance."""
    ref_models, ref_diff, model_fn, _, sched = setup
    hp, wp = SIZES_HW[s - 1]
    h, w = SIZES_HW[s]
    key = jax.random.PRNGKey(100 + s)
    base = jax.random.uniform(
        jax.random.PRNGKey(5), (BATCH, hp, wp, 3), minval=-1.0, maxval=1.0
    )

    img_prev = resize_bilinear(base, (h, w))
    ours, _, _ = sample_via_scale(
        model_fn, sched, img_prev, key, s=s, total_t=custom_t, omega=omega
    )

    queue = _NoiseQueue(
        _replay_draws(key, (BATCH, h, w, 3), custom_t, with_init=True)
    )
    _patch_ref_noise(monkeypatch, ref_models, queue)
    ref_diff.omega = omega
    try:
        with torch.no_grad():
            theirs = ref_diff.sample_via_scale(
                BATCH, _nchw(base), s, scale_mul=(1, 1), custom_t=custom_t
            )
    finally:
        ref_diff.omega = 0.0
        ref_diff.clip_mask = None
    assert not queue.q
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), atol=2e-4)
