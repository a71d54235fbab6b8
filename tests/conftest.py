"""Test configuration: CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh (the standard JAX
stand-in for a TPU slice); this must be set before jax is imported.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# this image's sitecustomize imports jax at interpreter startup, so the
# JAX_PLATFORMS env var is already baked — override through jax.config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


BALLOONS = "/root/reference/datasets/balloons/balloons.png"


@pytest.fixture(scope="module", autouse=True)
def _drop_compile_state():
    """Free cached executables between test modules.

    XLA:CPU segfaults inside backend_compile_and_load once enough compiled
    programs accumulate in one process (observed twice at the ~110th test,
    compiling an interpret-mode Pallas kernel that passes in isolation).
    Dropping jit caches per module keeps the live-executable count bounded;
    the cost is a handful of recompiles of shared helper jits.
    """
    yield
    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def balloons_path():
    return BALLOONS


@pytest.fixture(scope="session")
def balloons_pyramid():
    from sinddm_tpu.pyramid import build_pyramid

    return build_pyramid(BALLOONS)


@pytest.fixture(scope="session")
def balloons_schedules(balloons_pyramid):
    from sinddm_tpu.schedules import make_schedules

    return make_schedules(
        timesteps=100,
        scale_losses=balloons_pyramid.rescale_losses,
        n_scales=balloons_pyramid.n_scales,
    )


@pytest.fixture(scope="session")
def tiny_pyramid(tmp_path_factory):
    """A small synthetic pyramid for fast tests (3 scales)."""
    from PIL import Image

    from sinddm_tpu.pyramid import build_pyramid

    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (96, 128, 3))).astype(np.uint8)
    p = tmp_path_factory.mktemp("tinyimg") / "tiny.png"
    Image.fromarray(img).save(p)
    return build_pyramid(str(p), auto_scale=50000)
