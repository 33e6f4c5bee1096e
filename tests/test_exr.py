"""Built-in EXR codec (data/exr.py): roundtrips + IO-factory integration.

The reference's HDR captures are EXR (dataset.py:53-92, pyexr); this
image's cv2 has no EXR codec, so the format is implemented directly
(scanline, HALF/FLOAT, NONE/ZIPS/ZIP)."""
import numpy as np
import pytest

from iron_tpu.data.exr import read_exr, write_exr, _zip_block, _unzip_block


def test_exr_roundtrip_float(tmp_path):
    img = np.random.default_rng(0).uniform(0, 4, (17, 23, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=False, compression="none")
    out = read_exr(p)
    np.testing.assert_array_equal(out, img)


def test_exr_roundtrip_half_zips(tmp_path):
    img = np.random.default_rng(1).uniform(0, 4, (32, 16, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=True, compression="zips")
    out = read_exr(p)
    np.testing.assert_allclose(out, img.astype(np.float16).astype(np.float32))


def test_exr_single_channel(tmp_path):
    img = np.random.default_rng(2).uniform(0, 1, (9, 11)).astype(np.float32)
    p = str(tmp_path / "y.exr")
    write_exr(p, img, half=False)
    out = read_exr(p)
    np.testing.assert_array_equal(out[..., 0], img)


def test_zip_filter_inverse():
    raw = np.random.default_rng(3).integers(0, 256, 1024, dtype=np.uint8).tobytes()
    assert _unzip_block(_zip_block(raw)) == raw


def test_io_factory_exr_gamma(tmp_path):
    """read_image applies the reference's 1/2.2 EXR gamma (dataset.py:53-58)
    and write_image stores linear float."""
    from iron_tpu.data.io import read_image, write_image
    img = np.random.default_rng(4).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "img.exr")
    write_image(p, img)
    lin = read_image(p, apply_exr_gamma=False)
    np.testing.assert_allclose(lin, img, atol=2e-3)  # half precision
    gam = read_image(p, apply_exr_gamma=True)
    np.testing.assert_allclose(gam, np.power(lin + 1e-6, 1 / 2.2), atol=1e-6)


def test_load_image_folder_exr_capture(tmp_path):
    """A reference-format capture folder holding EXR HDR images loads
    through the standard folder loader with the 1/2.2 read gamma
    (dataset.py:53-58 semantics) — the real-capture HDR path."""
    import json
    from iron_tpu.data.exr import write_exr
    from iron_tpu.data.dataset import load_image_folder

    img_dir = tmp_path / "image"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    cam = {}
    K = np.eye(4); K[0, 0] = K[1, 1] = 20.0; K[0, 2] = K[1, 2] = 8.0
    W2C = np.eye(4); W2C[2, 3] = 3.0
    imgs = []
    for i in range(2):
        img = rng.uniform(0, 2.0, (16, 16, 3)).astype(np.float32)  # HDR range
        imgs.append(img)
        write_exr(str(img_dir / f"{i:05d}.exr"), img, half=False)
        cam[f"{i:05d}.exr"] = {"K": K.flatten().tolist(),
                               "W2C": W2C.flatten().tolist(),
                               "img_size": [16, 16]}
    (tmp_path / "cam_dict_norm.json").write_text(json.dumps(cam))

    fpaths, images, Ks, W2Cs, masks = load_image_folder(str(tmp_path))
    assert len(fpaths) == 2 and images.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(
        images[0], np.power(np.clip(imgs[0], 0, None) + 1e-6, 1 / 2.2),
        atol=1e-5)
    np.testing.assert_allclose(Ks[0], K, atol=1e-6)
