"""CLI glue tests: run both trainer CLIs on a tiny on-disk dataset."""
import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from iron_tpu.data.synthetic import render_synthetic_dataset
    from iron_tpu.data.io import write_image

    tmp = tmp_path_factory.mktemp("scene")
    data = render_synthetic_dataset("sphere", n_views=3, H=32, W=32, light=30.0)
    img_dir = tmp / "train" / "image"
    os.makedirs(img_dir)
    cam = {}
    for i in range(3):
        write_image(str(img_dir / f"{i:02d}.png"), data["images"][i])
        cam[f"{i:02d}.png"] = {"K": [float(x) for x in data["Ks"][i].flatten()],
                               "W2C": [float(x) for x in data["W2Cs"][i].flatten()],
                               "img_size": [32, 32]}
    json.dump(cam, open(tmp / "train" / "cam_dict_norm.json", "w"))
    return str(tmp)


@pytest.mark.slow
def test_train_volume_cli(scene_dir, tmp_path):
    import iron_tpu.cli.train_volume as tv
    conf = {
        "train": {"end_iter": 6, "warm_up_end": 1, "anneal_end": 3,
                  "batch_size": 32, "val_freq": 3, "report_freq": 100,
                  "save_freq": 6},
        "model": {"neus_renderer": {"n_samples": 8, "n_importance": 8,
                                    "n_outside": 0, "up_sample_steps": 2,
                                    "perturb": 1.0}},
    }
    conf_path = tmp_path / "conf.json"
    json.dump(conf, open(conf_path, "w"))
    out_dir = str(tmp_path / "exp1")
    tv.main(["--mode", "train", "--conf", str(conf_path),
             "--data_dir", os.path.join(scene_dir, "train"),
             "--out_dir", out_dir, "--num_iters", "6"])
    from iron_tpu.train.checkpoints import load_any_checkpoint
    assert load_any_checkpoint(out_dir) is not None  # pickle or orbax
    assert any(f.startswith("val_") for f in os.listdir(out_dir))

    # mesh validation mode from the checkpoint
    tv.main(["--mode", "validate_mesh", "--conf", str(conf_path),
             "--data_dir", os.path.join(scene_dir, "train"),
             "--out_dir", out_dir, "--mcube_resolution", "32"])
    assert any(f.startswith("mesh_") and f.endswith(".obj")
               for f in os.listdir(out_dir))


@pytest.mark.slow
def test_train_surface_cli_render_all(scene_dir, tmp_path):
    import iron_tpu.cli.train_surface as ts
    out_dir = str(tmp_path / "exp2")
    # --export_res 64: the default 512^3 final export costs ~25 min of CPU
    # SDF sweeps and adds no coverage over the 64^3 path
    ts.main(["--data_dir", os.path.join(scene_dir, "train"),
             "--out_dir", out_dir, "--renderer_name", "ggx",
             "--num_iters", "3", "--patch_size", "16", "--export_res", "64"])
    # trainer ran to num_iters and exported assets
    assert any("mesh_and_materials" in f for f in os.listdir(out_dir))
    mesh_dirs = [f for f in os.listdir(out_dir) if "mesh_and_materials" in f]
    contents = os.listdir(os.path.join(out_dir, mesh_dirs[0]))
    assert "mesh.obj" in contents and "diffuse_albedo.png" in contents

    ts.main(["--data_dir", os.path.join(scene_dir, "train"),
             "--out_dir", out_dir, "--renderer_name", "ggx",
             "--num_iters", "3", "--patch_size", "16", "--render_all"])
    render_dirs = [f for f in os.listdir(out_dir) if f.startswith("render_")]
    assert render_dirs
    rendered = os.listdir(os.path.join(out_dir, render_dirs[0]))
    assert any(f.endswith(".jpg") for f in rendered)
