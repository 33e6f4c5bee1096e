"""Real-scene ingestion dry run: a reference-format scene folder on disk is
driven end-to-end through the actual CLIs (the user workflow,
README.md:40-56 / train_scene.sh:1-13):

    preprocess check/normalize -> train_volume (stage 1, conf JSON)
      -> train_surface --neus_ckpt_fpath (stage 2) -> rendered mosaic

Data is the self-contained golden-oracle renderer written to disk with
`write_scene_dir`, so the test exercises the *disk* loaders (PNG IO,
cam_dict_norm.json parsing) exactly as a prepared real scene would.
"""
import glob
import json
import os

import numpy as np
import pytest

from iron_tpu.data.synthetic import render_synthetic_dataset, write_scene_dir


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene") / "dryrun" / "train"
    data = render_synthetic_dataset("sphere", n_views=4, H=64, W=64,
                                    light=30.0)
    write_scene_dir(data, str(root), denormalize=(np.array([1.0, -2.0, 0.5]),
                                                  0.25))
    return str(root), data


def test_scene_dir_layout_and_loader_roundtrip(scene_dir):
    root, data = scene_dir
    assert len(glob.glob(os.path.join(root, "image", "*.png"))) == 4
    assert len(glob.glob(os.path.join(root, "masks", "*.png"))) == 4
    from iron_tpu.data.dataset import load_image_folder
    fpaths, imgs, Ks, W2Cs, masks = load_image_folder(
        root, mask_dir=os.path.join(root, "masks"))
    assert imgs.shape == (4, 64, 64, 3)
    np.testing.assert_allclose(Ks, data["Ks"], atol=1e-5)
    np.testing.assert_allclose(W2Cs, data["W2Cs"], atol=1e-5)
    # PNG 8-bit roundtrip
    assert np.abs(imgs - np.clip(data["images"], 0, 1)).max() < 2.0 / 255.0


def test_preprocess_check_and_normalize(scene_dir, capsys):
    root, data = scene_dir
    from iron_tpu.cli.preprocess import main
    main(["check", "--image_dir", os.path.join(root, "image"),
          "--cam_dict", os.path.join(root, "cam_dict_norm.json")])
    assert "OK: dataset is consistent" in capsys.readouterr().out

    # normalize the denormalized dict; relative camera geometry must be
    # preserved and centers brought inside the unit sphere
    main(["normalize", "--cam_dict", os.path.join(root, "cam_dict.json"),
          "--out", os.path.join(root, "cam_dict_renorm.json")])
    with open(os.path.join(root, "cam_dict_renorm.json")) as f:
        renorm = json.load(f)
    centers = np.stack([np.linalg.inv(np.asarray(v["W2C"]).reshape(4, 4))[:3, 3]
                        for v in renorm.values()])
    assert np.linalg.norm(centers, axis=-1).max() <= 1.0 + 1e-6
    # normalization = translate-to-centroid + uniform scale, so the camera
    # constellation must match the GT ring up to one similarity factor:
    # all pairwise distance ratios equal
    gt_centers = np.stack([np.linalg.inv(W)[:3, 3] for W in data["W2Cs"]])
    d = np.linalg.norm(centers[None] - centers[:, None], axis=-1)
    d_gt = np.linalg.norm(gt_centers[None] - gt_centers[:, None], axis=-1)
    iu = np.triu_indices(len(centers), k=1)
    ratios = d[iu] / d_gt[iu]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)


@pytest.mark.slow
def test_cli_two_stage_dry_run(scene_dir, tmp_path):
    """Stage 1 -> ckpt -> stage 2 through the CLI mains on tiny settings."""
    root, _ = scene_dir
    conf = {
        "general": {"base_exp_dir": str(tmp_path / "exp1")},
        "dataset": {"data_dir": root, "folder_name": "image"},
        "train": {"end_iter": 30, "batch_size": 128, "warm_up_end": 5,
                  "anneal_end": 15, "val_freq": 30, "report_freq": 10,
                  "save_freq": 30},
        "model": {
            "sdf_network": {"d_out": 33, "d_hidden": 32, "n_layers": 2,
                            "skip_in": [], "multires": 2},
            "rendering_network": {"d_feature": 32, "d_hidden": 32,
                                  "n_layers": 2, "skip_in": [],
                                  "multires": 0, "multires_view": 0},
            "neus_renderer": {"n_samples": 12, "n_importance": 12,
                              "n_outside": 0, "up_sample_steps": 2},
        },
    }
    conf_path = tmp_path / "conf.json"
    conf_path.write_text(json.dumps(conf))

    from iron_tpu.cli.train_volume import main as train_volume
    train_volume(["--mode", "train", "--conf", str(conf_path),
                  "--num_iters", "30"])
    from iron_tpu.train.checkpoints import load_any_checkpoint
    assert load_any_checkpoint(str(tmp_path / "exp1")) is not None

    from iron_tpu.cli.train_surface import main as train_surface
    out2 = str(tmp_path / "exp2")
    train_surface(["--data_dir", root, "--out_dir", out2,
                   "--neus_ckpt_fpath", str(tmp_path / "exp1"),
                   "--renderer_name", "ggx",
                   "--num_iters", "4", "--patch_size", "32", "--use_mask",
                   "--skip_final_export"])
    assert load_any_checkpoint(out2) is not None
    assert os.path.isfile(os.path.join(out2, "args.txt"))


@pytest.mark.slow
def test_cli_env_flash_warm_start(scene_dir, tmp_path, capsys):
    """env<->flash handoff (model_volume.py:134-159): a second stage-1 run
    warm-starts from another experiment's latest checkpoint via
    --init_ckpt_dir."""
    root, _ = scene_dir
    conf = {
        "general": {"base_exp_dir": str(tmp_path / "exp_env")},
        "dataset": {"data_dir": root, "folder_name": "image"},
        "train": {"end_iter": 10, "batch_size": 64, "warm_up_end": 2,
                  "anneal_end": 5, "val_freq": 10, "report_freq": 10,
                  "save_freq": 10},
        "model": {
            "sdf_network": {"d_out": 33, "d_hidden": 32, "n_layers": 2,
                            "skip_in": [], "multires": 2},
            "rendering_network": {"d_feature": 32, "d_hidden": 32,
                                  "n_layers": 2, "skip_in": [],
                                  "multires": 0, "multires_view": 0},
            "neus_renderer": {"n_samples": 8, "n_importance": 8,
                              "n_outside": 0, "up_sample_steps": 2},
        },
    }
    conf_path = tmp_path / "conf_env.json"
    conf_path.write_text(json.dumps(conf))

    from iron_tpu.cli.train_volume import main as train_volume
    train_volume(["--mode", "train", "--conf", str(conf_path),
                  "--num_iters", "10"])

    conf["general"]["base_exp_dir"] = str(tmp_path / "exp_flash")
    conf_path2 = tmp_path / "conf_flash.json"
    conf_path2.write_text(json.dumps(conf))
    capsys.readouterr()
    train_volume(["--mode", "train", "--conf", str(conf_path2),
                  "--num_iters", "10",
                  "--init_ckpt_dir", str(tmp_path / "exp_env")])
    out = capsys.readouterr().out
    assert "warm-started from" in out
    from iron_tpu.train.checkpoints import load_any_checkpoint
    assert load_any_checkpoint(str(tmp_path / "exp_flash")) is not None
