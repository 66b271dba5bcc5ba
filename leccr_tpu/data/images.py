"""Image decode + augmentation pipeline.

Capability parity with the reference transforms (dataset/__init__.py:41-83):
train = RandomResizedCrop(image_res, scale=(0.5,1.0), bicubic) + HFlip +
CLIP normalization; eval = Resize(image_res²) + normalization.  The RandAugment
bank the reference keeps available (dataset/randaugment.py; disabled in the
live train transform, dataset/__init__.py:57) is provided as device-side jax
ops in leccr_tpu.data.randaugment.

Split of work (TPU-first):
- host (this module, numpy/PIL): JPEG decode, crop-box sampling, bicubic
  resize of the variable-size source to the fixed training resolution →
  uint8 [H, W, 3].  Variable source sizes make resize un-jittable; everything
  after this point has static shapes.
- device (normalize_images, jit): uint8→float, /255, CLIP mean/std
  normalization, conditional horizontal flip.  These run fused on the TPU, so
  the host hands over 1 byte/pixel instead of 4 (4x less PCIe/ICI traffic
  than the reference's float32 CHW tensors).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# CLIP normalization constants (reference dataset/__init__.py:41)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def decode_image(path: str) -> "np.ndarray":
    """Decode an image file to RGB uint8 [H, W, 3]."""
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    Image.MAX_IMAGE_PIXELS = None
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), np.uint8)


def sample_resized_crop(
    height: int,
    width: int,
    rng: np.random.RandomState,
    scale: Tuple[float, float] = (0.5, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop box sampling: (top, left, h, w)."""
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = rng.randint(0, height - h + 1)
            left = rng.randint(0, width - w + 1)
            return top, left, h, w
    # center fallback
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    top = (height - h) // 2
    left = (width - w) // 2
    return top, left, h, w


def _pil_resize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((size[1], size[0]), Image.BICUBIC),
        np.uint8)


def load_train_image(
    path: str, image_res: int, rng: np.random.RandomState
) -> Tuple[np.ndarray, bool]:
    """Decode + RandomResizedCrop to [image_res, image_res, 3] uint8, plus the
    hflip decision (applied on device)."""
    img = decode_image(path)
    top, left, h, w = sample_resized_crop(img.shape[0], img.shape[1], rng)
    crop = img[top: top + h, left: left + w]
    out = _pil_resize(crop, (image_res, image_res))
    return out, bool(rng.rand() < 0.5)


def load_eval_image(path: str, image_res: int) -> np.ndarray:
    """Decode + Resize(image_res²) uint8 (reference test_transform)."""
    return _pil_resize(decode_image(path), (image_res, image_res))


@jax.jit
def normalize_images(images_u8: jax.Array,
                     flip: Optional[jax.Array] = None) -> jax.Array:
    """Device-side: uint8 [B,H,W,3] → normalized float32, optional per-image
    horizontal flip (flip: [B] bool)."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    if flip is not None:
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    return x


def preprocess_train_images(
    images_u8: jax.Array,
    flip: Optional[jax.Array],
    rng: Optional[jax.Array] = None,
    randaugment_n: int = 0,
    randaugment_m: int = 7,
) -> jax.Array:
    """Full device-side train preprocessing: /255 → (optional RandAugment
    policy, reference dataset/__init__.py:43-51) → CLIP normalize → hflip."""
    x = images_u8.astype(jnp.float32) / 255.0
    if randaugment_n > 0 and rng is not None:
        from leccr_tpu.data.randaugment import rand_augment_batch

        x = rand_augment_batch(x, rng, randaugment_n, randaugment_m)
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    if flip is not None:
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    return x


def resize_batch_on_device(images: jax.Array, image_res: int) -> jax.Array:
    """Bicubic resize of a fixed-size uint8/float batch on device (used when
    sources share a shape, e.g. packed stores or video frames)."""
    b = images.shape[0]
    return jax.image.resize(
        images.astype(jnp.float32), (b, image_res, image_res, images.shape[-1]),
        method="bicubic")
