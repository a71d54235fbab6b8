"""Measure warp-matmul variants on the chip: fold x precision, + parity.

The guided step's dominant cost is the soft-one-hot warp matmuls
(benchmarks/guided_cost_breakdown_mm.json: warp f+b 227 ms of a 396 ms
chunk). Two recorded-but-untried ideas from round 3:

  * precision: every output sums <= 4 tap terms, so 3-pass bf16
    (Precision.HIGH) should clear the 1e-5 parity bar at half the MXU
    passes of the 6-pass HIGHEST;
  * fold: one W*C-wide matmul instead of 3 per-channel ones — fewer
    dispatches but ~3x the peak operand memory (the folded [N, W*C]
    dot operand materializes), so the full 64-view load may OOM.

This script times warp-only forward+backward (the same computation as
guided_cost_breakdown.py's warp_fb) for each variant in ONE process,
flipping the module-level knobs in sinddm_tpu.ops.warp between traces.
Fold variants run at a reduced view load first; the full-load fold run
is gated behind --big_fold because an HBM OOM can wedge the tunneled
worker. Also reports on-DEVICE parity (max |grad diff|) of each mm
variant against the gather/scatter autodiff path, since CPU ignores
TPU matmul precision modes.

Prints one JSON line per measurement. Run exclusively (one TPU process).
"""

from __future__ import annotations

import os as _os, sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _REPO)

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--small_batch", type=int, default=4,
                    help="reduced batch for the fold variants' first run")
    ap.add_argument("--n_aug", type=int, default=16)
    ap.add_argument("--view_chunk", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--big_fold", action="store_true",
                    help="also run the fold variants at the full batch "
                         "(OOM risk: ~13 GB folded dot operand)")
    ap.add_argument("--force_cpu", action="store_true")
    ap.add_argument("--pallas_only", action="store_true",
                    help="run only the HIGHEST anchor + the pallas arms")
    ap.add_argument("--win_only", action="store_true",
                    help="run only the HIGHEST anchor + the windowed "
                         "pallas kernel")
    ap.add_argument("--win3_only", action="store_true",
                    help="windowed kernel anchor + the bf16x3 split "
                         "variant")
    ap.add_argument("--winx_only", action="store_true",
                    help="windowed kernel anchor + the transposed-"
                         "reduction forward variant")
    ap.add_argument("--winb_only", action="store_true",
                    help="winx anchor + the channel-batched-dot variant")
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sinddm_tpu import build_pyramid
    from sinddm_tpu.guidance.clip_extractor import (
        augment_views_subset,
        resize_output_size,
    )
    from sinddm_tpu.ops import warp as Wmod

    pyr = build_pyramid("/root/reference/datasets/balloons/balloons.png")
    H, W = pyr.sizes_hw[-1]
    c, n_aug = args.view_chunk, args.n_aug
    ch, cw = resize_output_size(H, W)
    key = jax.random.PRNGKey(0)

    def sync(v):
        return float(jnp.asarray(v).sum())

    def timeit(fn, *a):
        sync(fn(*a))  # compile + warm
        ts = []
        for _ in range(args.repeats):
            t0 = time.time()
            sync(fn(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts)) * 1000.0

    def make_warp_fb(B, mm):
        x01 = jax.random.uniform(key, (B, H, W, 3))
        idc = jnp.arange(c)
        kmat = jax.vmap(lambda k: jax.random.split(k, 2 * n_aug))(
            jax.random.split(key, B)
        )
        kcs, kas = kmat[:, :c], kmat[:, n_aug:n_aug + c]

        @jax.jit
        def warp_fb(x):
            def loss(xx):
                views = jax.vmap(
                    lambda img, kcb, kab: augment_views_subset(
                        kcb, kab, idc, img, 1.0, mm_adjoint=mm
                    )
                )(xx, kcs, kas)
                return jnp.sum(views * views)
            return jax.grad(loss)(x)

        return warp_fb, x01

    base = {
        "metric": "warp_variant",
        "n_aug": n_aug, "view_chunk": c,
        "canvas_hw": [H, W], "view_hw": [ch, cw],
    }

    def run(fold, precision, B, label):
        Wmod._MM_FOLD = fold
        Wmod._MM_PRECISION = precision
        fn, x01 = make_warp_fb(B, mm=True)
        ms = timeit(fn, x01)
        rec = dict(base, fold=fold, precision=precision, batch=B,
                   views=B * c, warp_fb_ms=round(ms, 1), label=label)
        print(json.dumps(rec))
        _sys.stdout.flush()
        print(f"{label}: {ms:.1f} ms", file=_sys.stderr)
        return ms

    # on-device parity of each mm variant vs the gather/scatter autodiff
    # path (small load; the magnitude of interest is per-element)
    def parity(fold, precision):
        Wmod._MM_FOLD = fold
        Wmod._MM_PRECISION = precision
        fn_mm, x01 = make_warp_fb(2, mm=True)
        fn_ref, _ = make_warp_fb(2, mm=False)
        g_mm = np.asarray(fn_mm(x01))
        g_ref = np.asarray(fn_ref(x01))
        d = float(np.max(np.abs(g_mm - g_ref)))
        scale = float(np.max(np.abs(g_ref)))
        rec = dict(base, metric="warp_variant_parity", fold=fold,
                   precision=precision, max_abs_grad_diff=d,
                   max_abs_grad=scale)
        print(json.dumps(rec))
        _sys.stdout.flush()
        print(f"parity fold={fold} {precision}: max|dg|={d:.3e} "
              f"(max|g|={scale:.3e})", file=_sys.stderr)

    def run_pallas(B, label, impl="pallas"):
        """A fused VMEM kernel (ops/pallas_warp.py) at the same load."""
        Wmod._MM_FOLD = False
        Wmod._MM_PRECISION = "highest"
        prev_impl = Wmod._WARP_IMPL
        Wmod._WARP_IMPL = impl
        try:
            fn, x01 = make_warp_fb(B, mm=True)
            ms = timeit(fn, x01)
            rec = dict(base, impl=impl, batch=B, views=B * c,
                       warp_fb_ms=round(ms, 1), label=label)
            print(json.dumps(rec))
            _sys.stdout.flush()
            print(f"{label}: {ms:.1f} ms", file=_sys.stderr)
            # parity vs the gather/scatter autodiff path on device
            fn_p, x2 = make_warp_fb(2, mm=True)
            g_p = np.asarray(fn_p(x2))
            Wmod._WARP_IMPL = ""
            fn_ref, _ = make_warp_fb(2, mm=False)
            g_ref = np.asarray(fn_ref(x2))
            d = float(np.max(np.abs(g_p - g_ref)))
            scale = float(np.max(np.abs(g_ref)))
            print(json.dumps(dict(base, metric="warp_variant_parity",
                                  impl=impl, max_abs_grad_diff=d,
                                  max_abs_grad=scale)))
            _sys.stdout.flush()
            print(f"parity {impl}: max|dg|={d:.3e} (max|g|={scale:.3e})",
                  file=_sys.stderr)
        finally:
            Wmod._WARP_IMPL = prev_impl

    Bs, Bf = args.small_batch, args.batch

    if args.pallas_only:
        run(False, "highest", Bf, "perchan-highest-full")  # anchor
        run_pallas(Bf, "pallas-full")
        run_pallas(Bf, "pallas-win-full", impl="pallas_win")
        return

    if args.win_only:
        run(False, "highest", Bf, "perchan-highest-full")  # anchor
        run_pallas(Bf, "pallas-win-full", impl="pallas_win")
        return

    if args.win3_only:
        run_pallas(Bf, "pallas-win-full", impl="pallas_win")    # anchor
        run_pallas(Bf, "pallas-win3-full", impl="pallas_win3")
        return

    if args.winx_only:
        run_pallas(Bf, "pallas-win-full", impl="pallas_win")    # anchor
        run_pallas(Bf, "pallas-winx-full", impl="pallas_winx")
        return

    if args.winb_only:
        run_pallas(Bf, "pallas-winx-full", impl="pallas_winx")  # anchor
        run_pallas(Bf, "pallas-winb-full", impl="pallas_winb")
        return

    # baseline per-channel HIGHEST at both loads (anchors vs prior runs)
    run(False, "highest", Bf, "perchan-highest-full")
    run(False, "high", Bf, "perchan-high-full")
    run(False, "highest", Bs, "perchan-highest-small")
    run(False, "high", Bs, "perchan-high-small")
    run(True, "highest", Bs, "fold-highest-small")
    run(True, "high", Bs, "fold-high-small")
    if args.big_fold:
        run(True, "high", Bf, "fold-high-full")
    run_pallas(Bf, "pallas-full")
    run_pallas(Bf, "pallas-win-full", impl="pallas_win")

    parity(False, "highest")
    parity(False, "high")
    parity(True, "high")


if __name__ == "__main__":
    main()
