"""Data layer + config system tests."""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iron_tpu.data.cameras import load_cam_dict, get_tf_cams, normalize_cam_dict, transform_pose
from iron_tpu.data.dataset import RayDataset, near_far_from_sphere, load_image_folder
from iron_tpu.data.io import read_image, write_image
from iron_tpu.config import load_config_file, stage1_config_from_dict
from iron_tpu.data.synthetic import render_synthetic_dataset

DATA = os.path.join(os.path.dirname(__file__), "data_singleview")


def test_load_cam_dict_fixture():
    d = load_cam_dict(os.path.join(DATA, "cam_dict_norm.json"))
    assert "12.png" in d
    assert d["12.png"]["K"].shape == (4, 4)
    assert d["12.png"]["img_size"] == (512, 512)


def test_normalize_cam_dict(tmp_path):
    # build a fake dict with far-away cameras, normalize, verify radius <= 1
    cams = {}
    g = np.random.default_rng(0)
    for i in range(6):
        W2C = np.eye(4)
        W2C[:3, 3] = g.normal(size=3) * 20 + 50
        cams[f"{i}.png"] = {"K": list(np.eye(4).flatten()),
                            "W2C": list(W2C.flatten()), "img_size": [64, 64]}
    in_path = str(tmp_path / "cam.json")
    out_path = str(tmp_path / "cam_norm.json")
    json.dump(cams, open(in_path, "w"))
    normalize_cam_dict(in_path, out_path, target_radius=1.0)
    out = load_cam_dict(out_path)
    centers = [np.linalg.inv(v["W2C"])[:3, 3] for v in out.values()]
    assert np.max(np.linalg.norm(np.stack(centers) - np.mean(centers, axis=0),
                                 axis=-1)) <= 1.0 + 1e-4


def test_near_far_from_sphere():
    o = jnp.asarray([[0.0, 0.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    near, far = near_far_from_sphere(o, d)
    np.testing.assert_allclose(float(near[0, 0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(far[0, 0]), 4.0, atol=1e-5)


def test_ray_dataset_sampling_consistency():
    data = render_synthetic_dataset("sphere", n_views=3, H=32, W=32, light=30.0)
    ds = RayDataset.from_arrays(data["images"], data["Ks"], data["W2Cs"],
                                data["masks"])
    batch = ds.gen_random_rays(jax.random.PRNGKey(0), 1, 64)
    assert batch.shape == (64, 10)
    # directions are unit length, origins equal the camera center
    np.testing.assert_allclose(np.linalg.norm(np.asarray(batch[:, 3:6]), axis=-1),
                               1.0, atol=1e-5)
    c = np.linalg.inv(np.asarray(ds.W2Cs[1]))[:3, 3]
    np.testing.assert_allclose(np.asarray(batch[0, :3]), c, atol=1e-5)
    # colors come from the image
    assert np.asarray(batch[:, 6:9]).min() >= 0.0


def test_load_image_folder_roundtrip(tmp_path):
    data = render_synthetic_dataset("sphere", n_views=2, H=16, W=16, light=30.0)
    img_dir = tmp_path / "scene" / "image"
    os.makedirs(img_dir)
    cam = {}
    for i in range(2):
        write_image(str(img_dir / f"{i:02d}.png"), data["images"][i])
        cam[f"{i:02d}.png"] = {"K": [float(x) for x in data["Ks"][i].flatten()],
                               "W2C": [float(x) for x in data["W2Cs"][i].flatten()],
                               "img_size": [16, 16]}
    json.dump(cam, open(tmp_path / "scene" / "cam_dict_norm.json", "w"))
    fpaths, imgs, Ks, W2Cs, masks = load_image_folder(str(tmp_path / "scene"))
    assert len(fpaths) == 2 and imgs.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(imgs, np.clip(data["images"], 0, 1), atol=2 / 255)


def test_config_substitution_and_mapping(tmp_path):
    conf = load_config_file("iron_tpu/configs/womask_iron.json", case="dragon")
    assert conf["general"]["base_exp_dir"] == "./exp_stage1/dragon/"
    cfg = stage1_config_from_dict(conf)
    assert cfg.batch_size == 512
    assert cfg.render.n_samples == 64
    assert cfg.render.n_outside == 32
    assert cfg.sdf.multires == 6
    assert cfg.color.n_layers == 8
    assert cfg.nerf.multires == 10
    assert cfg.variance_init == 0.3


def test_load_K_Rt_from_P_roundtrip():
    from iron_tpu.data.cameras import load_K_Rt_from_P
    g = np.random.default_rng(0)
    K = np.eye(3)
    K[0, 0], K[1, 1] = 120.0, 115.0
    K[0, 2], K[1, 2] = 64.0, 60.0
    q, _ = np.linalg.qr(g.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q = -q
    t = g.normal(size=3)
    W2C = np.eye(4)
    W2C[:3, :3] = q
    W2C[:3, 3] = t
    P = K @ W2C[:3, :4]
    K_out, pose_out = load_K_Rt_from_P(P)
    np.testing.assert_allclose(K_out[:3, :3], K, atol=1e-4)
    np.testing.assert_allclose(pose_out, np.linalg.inv(W2C), atol=1e-4)


def test_load_transforms_json(tmp_path):
    from iron_tpu.data.cameras import load_transforms_json
    import math
    meta = {
        "camera_angle_x": math.pi / 3,
        "frames": [{"file_path": "./train/r_0",
                    "transform_matrix": np.eye(4).tolist()}],
    }
    p = tmp_path / "transforms.json"
    json.dump(meta, open(p, "w"))
    cams = load_transforms_json(str(p), H=100, W=200)
    assert "r_0.png" in cams
    K = cams["r_0.png"]["K"]
    np.testing.assert_allclose(K[0, 0], 0.5 * 200 / math.tan(math.pi / 6), rtol=1e-6)
    # identity GL pose looks down -z; OpenCV W2C must flip y/z
    W2C = cams["r_0.png"]["W2C"]
    np.testing.assert_allclose(W2C[:3, :3], np.diag([1.0, -1.0, -1.0]), atol=1e-6)


def test_torus_scene_renders_with_hole():
    """The torus golden scene shows a genus-1 silhouette: a face-on view has
    background *inside* the ring (the data generator's hardest scene)."""
    import jax.numpy as jnp
    from iron_tpu.data.synthetic import render_synthetic_dataset, torus_scene
    sdf_fn, sdf_all_fn = torus_scene()
    # SDF sanity: ring center is inside-the-hole (positive), tube center
    # is deepest inside the surface (== -r)
    assert float(sdf_fn(jnp.zeros(3))) > 0.2
    assert abs(float(sdf_fn(jnp.array([0.42, 0.0, 0.0]))) + 0.18) < 1e-6
    d = render_synthetic_dataset("torus", n_views=3, H=96, W=96, light=30.0)
    masks = d["masks"][..., 0]
    assert 0.03 < masks.mean() < 0.4
    # at least one view has a background pixel at the image center with
    # object pixels on both sides of it in the same row (the hole)
    import numpy as np
    found_hole = False
    for m in masks:
        row = m[48]
        on = np.nonzero(row > 0.5)[0]
        if len(on) > 4 and row[48] < 0.5 and on.min() < 48 < on.max():
            found_hole = True
    assert found_hole


def test_hemisphere_camera_rig_geometry():
    """hemisphere_cameras: eyes on the view sphere, origin projects to the
    image center, pole axis selectable (torus hole axis is y)."""
    import numpy as np
    from iron_tpu.data.synthetic import hemisphere_cameras
    from iron_tpu.core.camera import project
    import jax.numpy as jnp

    for pole, axis in (("z", 2), ("y", 1)):
        cams, Ks, W2Cs = hemisphere_cameras(9, radius=3.0, H=64, W=64,
                                            pole=pole)
        eyes = np.stack([np.linalg.inv(w)[:3, 3] for w in W2Cs])
        np.testing.assert_allclose(np.linalg.norm(eyes, axis=1), 3.0,
                                   atol=1e-4)
        # pole coordinate spans a real elevation range (not a ring)
        span = eyes[:, axis].max() - eyes[:, axis].min()
        assert span > 2.0, f"pole {pole}: span {span}"
        # top view looks along the pole axis
        assert abs(eyes[-1, axis]) > 2.4
        for cam in cams:
            uv = np.asarray(project(cam, jnp.zeros((1, 3))))
            np.testing.assert_allclose(uv[0], [32.0, 32.0], atol=1e-2)


def test_load_image_folder_shard(tmp_path):
    """Per-host sharding selects files before reading (SURVEY §2.5
    per-host image shards)."""
    from iron_tpu.data.synthetic import render_synthetic_dataset, write_scene_dir
    from iron_tpu.data.dataset import load_image_folder
    d = render_synthetic_dataset("sphere", n_views=5, H=24, W=24)
    write_scene_dir(d, str(tmp_path))
    full = load_image_folder(str(tmp_path), "image")
    s0 = load_image_folder(str(tmp_path), "image", shard=(0, 2))
    s1 = load_image_folder(str(tmp_path), "image", shard=(1, 2))
    assert len(full[0]) == 5 and len(s0[0]) == 3 and len(s1[0]) == 2
    assert sorted(s0[0] + s1[0]) == sorted(full[0])
    np.testing.assert_array_equal(s0[1][0], full[1][0])
    np.testing.assert_array_equal(s1[1][0], full[1][1])
