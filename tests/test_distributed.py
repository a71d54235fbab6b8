"""Multi-host (DCN) equality: 2 localhost processes == 1 process, same mesh.

The reference has no distributed story at all (SURVEY §2.4); this is the
contract test for the new first-class multi-host subsystem
(``parallel/distributed.py``): two processes with 4 virtual CPU devices
each, joined by ``jax.distributed.initialize``, must reproduce the
single-process 8-device run bit-for-bit-ish (same global mesh, same
shardings, same keys — only process placement differs), through

* the fused train-chunk path (gradient all-reduce spans the process
  boundary — the DCN axis stand-in),
* a collective orbax save + abstract-template restore mid-run,
* mesh-sharded pyramid sampling with primary-only result fetch.

Each worker is a fresh subprocess (``tests/dist_worker.py``) because the
device topology must be fixed before the backend initializes.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = Path(__file__).with_name("dist_worker.py")
_IMG = "/root/reference/datasets/balloons/balloons.png"


def _clean_env() -> dict:
    env = dict(os.environ)
    # force the CPU platform in the children regardless of the outer
    # session's TPU pinning (sitecustomize registers the axon plugin off
    # these vars) and of conftest's own XLA_FLAGS
    for var in (
        "JAX_PLATFORM_NAME", "PALLAS_AXON_POOL_IPS",
        "PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_TPU_GEN", "XLA_FLAGS",
        "SINDDM_COORDINATOR", "SINDDM_NUM_PROCESSES", "SINDDM_PROCESS_ID",
    ):
        env.pop(var, None)
    return env


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_single(tmp: Path) -> Path:
    out = tmp / "single.npz"
    subprocess.run(
        [sys.executable, str(_WORKER), str(out), _IMG, str(tmp / "w_single")],
        env=_clean_env(), check=True, timeout=900,
        cwd=str(_WORKER.parent.parent),
    )
    return out


def _run_two_process(tmp: Path) -> Path:
    out = tmp / "dist.npz"
    port = _free_port()
    workdir = tmp / "w_dist"  # SHARED by both processes (collective orbax)
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(_WORKER), str(out), _IMG, str(workdir),
                "--nproc", "2", "--pid", str(pid), "--port", str(port),
            ],
            env=_clean_env(),
            cwd=str(_WORKER.parent.parent),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    errs = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            errs.append(f"rc={p.returncode}\n{so}\n{se}")
    assert not errs, "\n====\n".join(errs)
    return out


def _write_tiny_img(tmp: Path) -> str:
    from PIL import Image

    rng = np.random.default_rng(0)
    p = tmp / "tiny.png"
    Image.fromarray(
        rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8)
    ).save(p)
    return str(p)


def _run_guided_single(tmp: Path, img: str) -> Path:
    out = tmp / "guided_single.npz"
    subprocess.run(
        [sys.executable, str(_WORKER), str(out), img, str(tmp / "g_single"),
         "--guided"],
        env=_clean_env(), check=True, timeout=900,
        cwd=str(_WORKER.parent.parent),
    )
    return out


def _run_guided_two_process(tmp: Path, img: str) -> Path:
    out = tmp / "guided_dist.npz"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(_WORKER), str(out), img,
                str(tmp / "g_dist"), "--guided",
                "--nproc", "2", "--pid", str(pid), "--port", str(port),
            ],
            env=_clean_env(),
            cwd=str(_WORKER.parent.parent),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    errs = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            errs.append(f"rc={p.returncode}\n{so}\n{se}")
    assert not errs, "\n====\n".join(errs)
    return out


def test_two_process_guided_sampling_matches_single_process(tmp_path):
    """CLIP-guided sampling — per-scale AND bucketed, scale 0 guided too —
    over the 2-process global mesh must reproduce the single-process run
    (same mesh, same keys; only process placement differs). This is the
    multi-host proof for the guided staging path (committed keys, carries,
    embeds, size scalars) that the train/sample equality test does not
    touch; before round 5 the bucketed path passed host-local jit inputs
    that a DCN mesh rejects."""
    img = _write_tiny_img(tmp_path)
    single = np.load(_run_guided_single(tmp_path, img))
    dist = np.load(_run_guided_two_process(tmp_path, img))

    for k in ("per_scale", "bucketed"):
        assert np.isfinite(dist[k]).all()
        # same draws; only collective/placement fp noise and the
        # thresholded-grad knife edge differ. Cross-process reduction
        # orderings give a slightly fatter flip tail than the
        # single-process sharded tests (measured: bucketed max 0.21 on
        # a handful of pixels), so bound the bulk, the flip fraction,
        # and the flip magnitude separately.
        diff = np.abs(single[k] - dist[k])
        assert np.mean(diff > 1e-4) < 0.05, f"{k}: bulk of pixels"
        assert np.mean(diff > 0.1) < 0.005, f"{k}: flips stay rare"
        assert diff.max() < 0.5, f"{k}: flips stay bounded"
    for k in ("scores_ps", "scores_b"):
        np.testing.assert_allclose(single[k], dist[k], atol=1e-3)


def test_two_process_mesh_matches_single_process(tmp_path):
    single = np.load(_run_single(tmp_path))
    dist = np.load(_run_two_process(tmp_path))

    assert int(single["step"]) == int(dist["step"]) == 8
    # same global mesh + same keys: the only differences are collective
    # reduction orderings across the process boundary
    np.testing.assert_allclose(
        single["losses_a"], dist["losses_a"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        single["losses_b"], dist["losses_b"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(single["p0"], dist["p0"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        single["sample"], dist["sample"], rtol=1e-4, atol=1e-4
    )
    assert np.isfinite(dist["sample"]).all()
