"""CLI flag surface: defaults must match the reference (main.py:13-60)."""

import pytest

from sinddm_tpu.cli import build_parser


def test_defaults_match_reference():
    p = build_parser()
    a = p.parse_args(["--mode", "sample"])
    assert a.scope == "forest"
    assert a.input_image == "seascape_composite_dragon.png"
    assert a.start_t_harm == 5
    assert a.start_t_style == 15
    assert a.harm_mask == "seascape_mask_dragon.png"
    assert a.clip_text == "Fire in the Forest"
    assert a.roi_n_tar == 1
    assert a.dim == 160
    assert a.scale_factor == 1.411
    assert a.timesteps == 100
    assert a.train_batch_size == 32
    assert a.grad_accumulate == 1
    assert a.train_num_steps == 120001
    assert a.save_and_sample_every == 10000
    assert a.avg_window == 100
    assert a.train_lr == 1e-3
    assert a.sched_k_milestones == [20, 40, 70, 80, 90, 110]
    assert a.load_milestone == 0
    assert a.sample_batch_size == 16
    assert a.scale_mul == [1, 1]
    assert a.sample_t_list is None
    assert a.omega == 0
    assert a.loss_factor == 1
    assert not a.sample_limited_t


def test_all_nine_modes_accepted():
    p = build_parser()
    for mode in [
        "train", "sample", "clip_content", "clip_style_gen",
        "clip_style_trans", "clip_roi", "harmonization", "style_transfer",
        "roi",
    ]:
        assert p.parse_args(["--mode", mode]).mode == mode
    with pytest.raises(SystemExit):
        p.parse_args(["--mode", "bogus"])


def test_roi_flags():
    p = build_parser()
    a = p.parse_args(
        ["--mode", "roi", "--target_roi", "1", "2", "3", "4",
         "--roi_bb", "5", "6", "7", "8", "--roi_bb", "9", "10", "11", "12"]
    )
    assert a.target_roi == [1, 2, 3, 4]
    assert a.roi_bb == [[5, 6, 7, 8], [9, 10, 11, 12]]
