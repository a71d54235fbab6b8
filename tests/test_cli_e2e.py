"""End-to-end CLI dispatch tests (tiny shapes, CPU).

Drives ``cli.main`` — not just the parser — through the mode ladder the
reference dispatches in ``main.py:133-322``: train (incl. post-train
sampling), sample, harmonization, roi, plus the TPU-native mesh flags
(``--mesh_data/--mesh_spatial``) on the virtual 8-device CPU mesh.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from sinddm_tpu import cli


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """A writable dataset folder with a small image + i2i inputs."""
    root = tmp_path_factory.mktemp("cli_ds")
    ds = root / "tiny"
    ds.mkdir()
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8)
    Image.fromarray(img).save(ds / "tiny.png")
    i2i = ds / "i2i"
    i2i.mkdir()
    comp = rng.uniform(0, 255, (80, 100, 3)).astype(np.uint8)
    Image.fromarray(comp).save(i2i / "composite.png")
    mask = np.zeros((80, 100, 3), np.uint8)
    mask[20:50, 30:70] = 255
    Image.fromarray(mask).save(i2i / "mask.png")
    return ds


def _common(tiny_dataset, results, extra):
    return [
        "--dataset_folder", str(tiny_dataset) + "/",
        "--image_name", "tiny.png",
        "--results_folder", str(results),
        "--scope", "tiny",
        "--dim", "8",
        "--timesteps", "20",
        "--sample_batch_size", "2",
    ] + extra


def test_cli_train_dispatch(tiny_dataset, tmp_path):
    results = tmp_path / "res"
    cli.main(_common(tiny_dataset, results, [
        "--mode", "train",
        "--train_num_steps", "6",
        "--train_batch_size", "2",
        "--steps_per_chunk", "3",
    ]))
    # post-train sampling wrote per-scale grids + unbatched finals
    finals = list((results / "tiny" / "final_samples").glob("out_s*_post_train_*.png"))
    assert finals, "train mode must save post-train samples"


def test_cli_sample_dispatch(tiny_dataset, tmp_path):
    results = tmp_path / "res"
    cli.main(_common(tiny_dataset, results, ["--mode", "sample"]))
    finals = list((results / "tiny" / "final_samples").glob("out_s*_sample_*.png"))
    assert finals


def test_cli_sample_mesh_dispatch(tiny_dataset, tmp_path):
    """CLI-driven mesh sampling on the virtual CPU mesh (VERDICT item 5)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    results = tmp_path / "res"
    cli.main(_common(tiny_dataset, results, [
        "--mode", "sample",
        "--mesh_data", "4", "--mesh_spatial", "2",
        "--sample_batch_size", "4",
    ]))
    finals = list((results / "tiny" / "final_samples").glob("out_s*_sample_*.png"))
    assert finals


def test_cli_train_mesh_dispatch(tiny_dataset, tmp_path):
    """CLI-driven sharded training (mesh= threaded into the trainer)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    results = tmp_path / "res"
    cli.main(_common(tiny_dataset, results, [
        "--mode", "train",
        "--mesh_data", "4", "--mesh_spatial", "2",
        "--train_num_steps", "4",
        "--train_batch_size", "4",
        "--steps_per_chunk", "2",
    ]))
    finals = list((results / "tiny" / "final_samples").glob("out_s*_post_train_*.png"))
    assert finals


def test_cli_harmonization_dispatch(tiny_dataset, tmp_path):
    results = tmp_path / "res"
    cli.main(_common(tiny_dataset, results, [
        "--mode", "harmonization",
        "--input_image", "composite.png",
        "--harm_mask", "mask.png",
        "--start_t_harm", "3",
    ]))
    out = results / "tiny" / "i2i_final_samples" / "composite_i2i_harmonization.png"
    assert out.exists()


def test_cli_roi_dispatch(tiny_dataset, tmp_path):
    results = tmp_path / "res"
    cli.main(_common(tiny_dataset, results, [
        "--mode", "roi",
        "--target_roi", "4", "4", "16", "16",
        "--roi_bb", "8", "8", "16", "16",
    ]))
    out = results / "tiny" / "final_samples" / "roi_out.png"
    assert out.exists()


def test_cli_mesh_too_few_devices(tiny_dataset, tmp_path):
    with pytest.raises(SystemExit):
        cli.main(_common(tiny_dataset, tmp_path / "res", [
            "--mode", "sample", "--mesh_data", "64",
        ]))
