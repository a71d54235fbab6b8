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
