"""End-to-end CLI dispatch on CPU: ``cli.main()`` drives the real mode
ladder (reference ``main.py:133-322``) with tiny dims, so regressions in
the dispatch glue break CI instead of only breaking TPU evidence runs.

Covers train (fused chunks + milestone checkpointing), sample with
latest-milestone resume, harmonization, style_transfer, and headless roi.
The CLIP modes' dispatch is covered at the library level
(``tests/test_apps.py``, ``tests/test_guidance.py``); their CLI glue needs
a torch-layout weights file (``--clip_weights``) whose no-weights error
path is asserted here.
"""

import numpy as np
import pytest
from PIL import Image

from sinddm_tpu import cli


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ws")
    ds = root / "ds"
    i2i = ds / "i2i"
    i2i.mkdir(parents=True)
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8)
    ).save(ds / "tiny.png")
    Image.fromarray(
        rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8)
    ).save(i2i / "comp.png")
    mask = np.zeros((96, 128, 3), np.uint8)
    mask[30:60, 40:80] = 255
    Image.fromarray(mask).save(i2i / "mask.png")
    res = root / "results"
    common = [
        "--dataset_folder", str(ds), "--image_name", "tiny.png",
        "--results_folder", str(res), "--scope", "tiny",
        "--dim", "8", "--timesteps", "10", "--sample_batch_size", "2",
    ]
    return ds, res, common


@pytest.fixture(scope="module")
def trained(workspace):
    """Run --mode train once; later modes resume its checkpoints."""
    ds, res, common = workspace
    cli.main(
        common + [
            "--mode", "train", "--train_num_steps", "4",
            "--steps_per_chunk", "2", "--train_batch_size", "2",
            "--save_and_sample_every", "2", "--avg_window", "2",
        ]
    )
    scope = res / "tiny"
    assert (scope / "model-2").is_dir(), "milestone checkpoint missing"
    assert (scope / "sample-2.png").is_file(), "milestone sample missing"
    assert list((scope / "final_samples").glob("out_s*_post_train_*.png"))
    return workspace


def test_sample_resumes_latest_milestone(trained):
    ds, res, common = trained
    cli.main(common + ["--mode", "sample", "--load_milestone", "-1"])
    outs = list((res / "tiny" / "final_samples").glob("out_s*_sample_*.png"))
    assert outs, "sample mode wrote no outputs"


def test_harmonization_dispatch(trained):
    ds, res, common = trained
    cli.main(
        common + [
            "--mode", "harmonization", "--load_milestone", "-1",
            "--input_image", "comp.png", "--harm_mask", "mask.png",
        ]
    )
    out = res / "tiny" / "i2i_final_samples" / "comp_i2i_harmonization.png"
    assert out.is_file()


def test_style_transfer_dispatch(trained):
    ds, res, common = trained
    cli.main(
        common + [
            "--mode", "style_transfer", "--load_milestone", "-1",
            "--input_image", "comp.png",
        ]
    )
    out = res / "tiny" / "i2i_final_samples" / "comp_i2i_style_transfer.png"
    assert out.is_file()


def test_roi_dispatch_headless(trained):
    ds, res, common = trained
    cli.main(
        common + [
            "--mode", "roi", "--load_milestone", "-1",
            "--target_roi", "10", "10", "20", "20",
            "--roi_bb", "30", "40", "20", "20",
        ]
    )
    assert (res / "tiny" / "final_samples" / "roi_out.png").is_file()


def test_clip_mode_without_weights_errors(trained, monkeypatch):
    ds, res, common = trained
    monkeypatch.delenv("SINDDM_CLIP_WEIGHTS", raising=False)
    monkeypatch.setattr(
        "sinddm_tpu.models.clip.convert.find_clip_weights", lambda: None
    )
    with pytest.raises(SystemExit, match="ViT-B/32"):
        cli.main(
            common + [
                "--mode", "clip_content", "--clip_text", "x",
                "--strength", "0.3", "--fill_factor", "0.3",
            ]
        )


def test_clip_content_cli_dispatch(trained, tmp_path):
    """The full --clip_weights path: a torch-layout checkpoint is sniffed,
    converted, and drives a guided run through the CLI (tiny CLIP whose
    shapes survive the real config-inference rules)."""
    torch = pytest.importorskip("torch")
    from clip_sd_util import cli_tiny_clip_config, make_torch_clip_state_dict

    sd = make_torch_clip_state_dict(cli_tiny_clip_config())
    wt = tmp_path / "tiny-vit.pt"
    torch.save(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}, str(wt)
    )

    ds, res, common = trained
    cli.main(
        common + [
            "--mode", "clip_content", "--load_milestone", "-1",
            "--clip_text", "a red tree", "--strength", "0.3",
            "--fill_factor", "0.3", "--clip_weights", str(wt),
            "--sample_t_list", "2", "2",
        ]
    )
    outs = list(
        (res / "tiny" / "final_samples").glob("clip_content_a_red_tree*.png")
    )
    assert outs, "clip_content wrote no outputs"


def test_clip_content_bucketed_cli_dispatch(trained, tmp_path):
    """--bucketed_guidance drives the shape-bucketed sampler end-to-end
    through the CLI (one executable for all guided via scales)."""
    torch = pytest.importorskip("torch")
    from clip_sd_util import cli_tiny_clip_config, make_torch_clip_state_dict

    sd = make_torch_clip_state_dict(cli_tiny_clip_config())
    wt = tmp_path / "tiny-vit-b.pt"
    torch.save(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}, str(wt)
    )

    ds, res, common = trained
    cli.main(
        common + [
            "--mode", "clip_content", "--load_milestone", "-1",
            "--clip_text", "a blue sky", "--strength", "0.3",
            "--fill_factor", "0.3", "--clip_weights", str(wt),
            "--sample_t_list", "2", "2", "--bucketed_guidance",
        ]
    )
    outs = list(
        (res / "tiny" / "final_samples").glob("clip_content_a_blue_sky*.png")
    )
    assert outs, "bucketed clip_content wrote no outputs"


def test_mesh_flag_validation(workspace):
    """Asking for more mesh devices than visible exits with a clear error
    (8 virtual CPU devices in this suite)."""
    ds, res, common = workspace
    with pytest.raises(SystemExit, match="needs 16 devices"):
        cli.main(common + ["--mode", "sample", "--mesh_data", "16"])


def test_n_aug_flag_rejects_nonpositive():
    """--n_aug < 1 is rejected at the parser (it would otherwise crash
    deep inside the extractor's view chunking)."""
    parser = cli.build_parser()
    assert parser.parse_args(["--mode", "sample", "--n_aug", "8"]).n_aug == 8
    for bad in ("0", "-3"):
        with pytest.raises(SystemExit):
            parser.parse_args(["--mode", "sample", "--n_aug", bad])


def test_cli_harmonization_on_mesh(trained):
    """i2i modes honor the mesh flags too (sharded batch + replicated
    params through image2image)."""
    ds, res, common = trained
    cli.main(
        common + [
            "--mode", "harmonization", "--load_milestone", "-1",
            "--input_image", "comp.png", "--harm_mask", "mask.png",
            "--mesh_data", "2",
        ]
    )
    out = res / "tiny" / "i2i_final_samples" / "comp_i2i_harmonization.png"
    assert out.is_file()


def test_mesh_batch_divisibility_validated(workspace):
    """--mesh_data must divide the batch size; the CLI exits with a clear
    message instead of failing deep inside device_put (ADVICE r2)."""
    ds, res, common = workspace
    with pytest.raises(SystemExit, match="divisible by"):
        cli.main(
            common + [
                "--mode", "sample", "--mesh_data", "4",
                "--sample_batch_size", "6",
            ]
        )


def test_save_interm_writes_frame_dumps(trained):
    """--save_interm writes per-timestep PNG grids in the reference's
    interm_samples_scale_{s}/ layout (models.py:469-475,511-526)."""
    ds, res, common = trained
    cli.main(
        common + [
            "--mode", "sample", "--load_milestone", "-1", "--save_interm",
        ]
    )
    s0 = res / "tiny" / "interm_samples_scale_0"
    frames = sorted(s0.glob("output_t-*_s-0.png"))
    # scale 0 runs the full T=10 chain -> 10 frames, t=009..000
    assert len(frames) == 10, frames
    assert (s0 / "output_t-009_s-0.png").is_file()
    assert (s0 / "output_t-000_s-0.png").is_file()
    # finer scales dump their (shorter) chains too
    assert list(
        (res / "tiny" / "interm_samples_scale_1").glob("output_t-*_s-1.png")
    )


def test_cli_sample_on_mesh(trained):
    """The CLI mesh flags drive a real sharded sampling run (VERDICT #5:
    multi-device must be reachable from the product surface)."""
    ds, res, common = trained
    cli.main(
        common + [
            "--mode", "sample", "--load_milestone", "-1",
            "--mesh_data", "2",
        ]
    )
    outs = list((res / "tiny" / "final_samples").glob("out_s*_sample_*.png"))
    assert outs


def test_n_aug_flag_reaches_extractor(trained, tmp_path, monkeypatch):
    """--n_aug (new in r5, benchmarks/n_aug_curve.jsonl) must reach the
    ClipExtractor — the knob that trades guided wall for guidance signal
    (reference hardcodes 16, main.py:158)."""
    torch = pytest.importorskip("torch")
    from clip_sd_util import cli_tiny_clip_config, make_torch_clip_state_dict
    from sinddm_tpu.apps import clip_apps

    sd = make_torch_clip_state_dict(cli_tiny_clip_config())
    wt = tmp_path / "tiny-vit.pt"
    torch.save(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}, str(wt)
    )

    seen = {}
    real = clip_apps.ClipExtractor

    def spy(*a, **kw):
        seen["n_aug"] = kw.get("n_aug")
        return real(*a, **kw)

    monkeypatch.setattr(clip_apps, "ClipExtractor", spy)
    ds, res, common = trained
    cli.main(
        common + [
            "--mode", "clip_content", "--load_milestone", "-1",
            "--clip_text", "a red tree", "--strength", "0.3",
            "--fill_factor", "0.3", "--clip_weights", str(wt),
            "--sample_t_list", "2", "2", "--n_aug", "4",
        ]
    )
    assert seen["n_aug"] == 4
