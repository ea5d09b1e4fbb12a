"""Image preprocessing for the classification eval pipelines.

The reference's ImageNet eval composes torchvision transforms —
``Resize(256) -> CenterCrop(224) -> ToTensor -> Normalize(mean, std)``
(``src/brevitas_examples/imagenet_classification/imagenet_val.py``). This is
the framework-native equivalent:

- host side, per image: PIL decode + shorter-side bilinear resize (aspect
  ratios differ per image, so this stage is inherently dynamic-shape and
  stays on host, exactly like torchvision's);
- device side, per batch: one jitted ``preprocess_batch`` (crop + scale +
  normalize) over fixed shapes, fusable with the model's first conv.

Layout is NHWC (TPU-native); the reference's NCHW never appears.
"""

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision-standard ImageNet statistics (imagenet_val.py normalize)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def load_image(path: str) -> np.ndarray:
    """Decode an image file to uint8 RGB (H, W, 3)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def resize_shorter_side(img: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize so the SHORTER side equals ``size`` (torchvision
    Resize(int) semantics). Host-side PIL: per-image output shapes vary with
    aspect ratio, which cannot live under jit."""
    from PIL import Image

    h, w = img.shape[:2]
    if h <= w:
        out = (size, int(round(w * size / h)))
    else:
        out = (int(round(h * size / w)), size)
    im = Image.fromarray(img).resize((out[1], out[0]), Image.BILINEAR)
    return np.asarray(im)


def center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Center crop ``(..., H, W, C) -> (..., size, size, C)``."""
    h, w = x.shape[-3], x.shape[-2]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top: top + size, left: left + size, :]


def normalize(x: jnp.ndarray,
              mean: Sequence[float] = IMAGENET_MEAN,
              std: Sequence[float] = IMAGENET_STD) -> jnp.ndarray:
    """(x - mean) / std per channel, channels-last."""
    m = jnp.asarray(mean, x.dtype)
    s = jnp.asarray(std, x.dtype)
    return (x - m) / s


def preprocess_batch(batch_u8: jnp.ndarray, crop: int = 224,
                     mean: Sequence[float] = IMAGENET_MEAN,
                     std: Sequence[float] = IMAGENET_STD) -> jnp.ndarray:
    """Jittable eval transform: uint8 (N, H, W, 3) -> normalized f32
    (N, crop, crop, 3). The ToTensor 1/255 scale, crop, and normalize fuse
    into one device program."""
    x = center_crop(batch_u8, crop).astype(jnp.float32) / 255.0
    return normalize(x, mean, std)


def eval_transform(img: np.ndarray, resize: int = 256,
                   crop: int = 224) -> np.ndarray:
    """Full reference chain for ONE image: shorter-side resize (host) then
    center crop to a fixed (crop, crop, 3) uint8 — batch these and feed
    ``preprocess_batch``."""
    img = resize_shorter_side(img, resize)
    h, w = img.shape[:2]
    top, left = (h - crop) // 2, (w - crop) // 2
    return img[top: top + crop, left: left + crop]


def imagenet_folder(data_dir: str) -> Tuple[list, list, list]:
    """Walk a torchvision ImageFolder-layout tree (class-per-subdir):
    returns (paths, labels, class_names)."""
    classes = sorted(d for d in os.listdir(data_dir)
                     if os.path.isdir(os.path.join(data_dir, d)))
    paths, labels = [], []
    for idx, c in enumerate(classes):
        cdir = os.path.join(data_dir, c)
        for f in sorted(os.listdir(cdir)):
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp")):
                paths.append(os.path.join(cdir, f))
                labels.append(idx)
    return paths, labels, classes


def folder_batches(data_dir: str, batch_size: int, crop: int = 224,
                   resize: int = 256):
    """Yield (normalized f32 NHWC batch, int32 labels) from an ImageFolder
    tree: PIL decode/resize on host, crop+normalize jitted on device."""
    paths, labels, _ = imagenet_folder(data_dir)
    proc = jax.jit(lambda b: preprocess_batch(b, crop))
    for i in range(0, len(paths) - batch_size + 1, batch_size):
        imgs = np.stack([eval_transform(load_image(p), resize, crop)
                         for p in paths[i: i + batch_size]])
        yield (np.asarray(proc(jnp.asarray(imgs))),
               np.asarray(labels[i: i + batch_size], np.int32))
