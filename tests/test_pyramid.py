"""Pyramid geometry and rescale-loss golden tests (vs hand-derived values)."""

import numpy as np
import pytest

from sinddm_tpu.pyramid import build_pyramid, compute_pyramid_geometry


def test_balloons_geometry(balloons_pyramid):
    p = balloons_pyramid
    assert p.n_scales == 5
    assert p.sizes_wh == ((64, 48), (90, 67), (126, 94), (177, 133), (248, 186))
    assert p.sizes_hw == ((48, 64), (67, 90), (94, 126), (133, 177), (186, 248))
    assert abs(p.scale_factor - 1.4030331316483415) < 1e-12


def test_balloons_rescale_losses_reference_semantics(balloons_pyramid):
    # golden values computed with the reference's uint8-wraparound subtract
    expected = [1.0871835898797855, 0.7771932694518568, 0.5452509776707822,
                0.3865868564044144]
    assert np.allclose(balloons_pyramid.rescale_losses, expected, rtol=1e-12)


def test_exact_diff_mode(balloons_path):
    p = build_pyramid(balloons_path, exact_diff=True)
    # true float losses are much smaller than the wraparound ones
    assert all(l < 0.1 for l in p.rescale_losses)


def test_auto_scale_cap():
    # a 1000x800 image must be capped to <= 50000 px
    capped, sizes, sf, n = compute_pyramid_geometry((1000, 800))
    assert capped[0] * capped[1] <= 50000
    assert sizes[-1] == capped


def test_scale0_short_side_clamp(balloons_pyramid):
    h0, w0 = balloons_pyramid.sizes_hw[0]
    assert 42 <= min(h0, w0) <= 55


def test_images_range_and_shapes(balloons_pyramid):
    p = balloons_pyramid
    for s in range(p.n_scales):
        h, w = p.sizes_hw[s]
        assert p.images[s].shape == (h, w, 3)
        assert p.recon_images[s].shape == (h, w, 3)
        assert p.images[s].min() >= -1.0 and p.images[s].max() <= 1.0
    # scale-0 recon duplicates the clean image (reference trainer.py:131-132)
    assert np.array_equal(p.images[0], p.recon_images[0])


def test_save_layout(tmp_path, balloons_path):
    p = build_pyramid(balloons_path, save_to=str(tmp_path))
    for s in range(p.n_scales):
        assert (tmp_path / f"scale_{s}" / "balloons.png").exists()
        if s > 0:
            assert (tmp_path / f"scale_{s}_recon" / "balloons.png").exists()
