"""Vision preprocessing pipeline (brevitas_tpu/vision.py).

Oracle: PIL for the host resize stage, hand math for crop/normalize — the
same split the reference's torchvision chain uses.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from brevitas_tpu import vision


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3)).astype(np.uint8)


def test_resize_shorter_side_semantics():
    tall = vision.resize_shorter_side(_img(400, 200), 256)
    assert tall.shape[1] == 256 and tall.shape[0] == 512
    wide = vision.resize_shorter_side(_img(200, 300), 256)
    assert wide.shape[0] == 256 and wide.shape[1] == 384
    square = vision.resize_shorter_side(_img(100, 100), 256)
    assert square.shape[:2] == (256, 256)


def test_center_crop_exact():
    x = jnp.arange(6 * 8 * 1, dtype=jnp.float32).reshape(1, 6, 8, 1)
    c = vision.center_crop(x, 4)
    assert c.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(x)[:, 1:5, 2:6])


def test_normalize_math():
    x = jnp.ones((2, 4, 4, 3)) * 0.5
    y = np.asarray(vision.normalize(x))
    expect = (0.5 - np.asarray(vision.IMAGENET_MEAN)) / np.asarray(
        vision.IMAGENET_STD)
    np.testing.assert_allclose(y[0, 0, 0], expect, rtol=1e-6)


def test_preprocess_batch_matches_reference_chain():
    batch = np.stack([_img(256, 256, s) for s in range(3)])
    out = np.asarray(vision.preprocess_batch(jnp.asarray(batch)))
    assert out.shape == (3, 224, 224, 3)
    # manual: crop 16:240, /255, normalize
    ref = batch[:, 16:240, 16:240].astype(np.float32) / 255.0
    ref = (ref - vision.IMAGENET_MEAN) / vision.IMAGENET_STD
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_eval_transform_shapes_any_aspect():
    for h, w in [(500, 375), (375, 500), (224, 224), (1024, 300)]:
        out = vision.eval_transform(_img(h, w))
        assert out.shape == (224, 224, 3), (h, w)
        assert out.dtype == np.uint8


def test_imagenet_folder_and_eval_cli(tmp_path):
    from PIL import Image

    from brevitas_tpu.examples.imagenet_val import main

    rng = np.random.default_rng(0)
    for ci, cname in enumerate(["class_a", "class_b"]):
        d = tmp_path / cname
        d.mkdir()
        for i in range(3):
            arr = rng.integers(0, 256, (300, 280, 3)).astype(np.uint8)
            Image.fromarray(arr).save(str(d / f"img{i}.jpg"))

    paths, labels, classes = vision.imagenet_folder(str(tmp_path))
    assert classes == ["class_a", "class_b"]
    assert len(paths) == 6 and labels == [0, 0, 0, 1, 1, 1]

    batches = list(vision.folder_batches(str(tmp_path), batch_size=3))
    assert len(batches) == 2
    x, y = batches[0]
    assert x.shape == (3, 224, 224, 3) and x.dtype == np.float32
    np.testing.assert_array_equal(y, [0, 0, 0])

    res = main(["--model", "mobilenet_v1_4b", "--dataset", "folder",
                "--data-dir", str(tmp_path), "--batch-size", "3",
                "--num-classes", "1000"])
    assert res["images"] == 6
