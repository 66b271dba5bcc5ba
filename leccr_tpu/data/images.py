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
    path: str, image_res: int, rng: np.random.RandomState,
    fast: bool = False,
) -> Tuple[np.ndarray, bool]:
    """Decode + RandomResizedCrop to [image_res, image_res, 3] uint8, plus the
    hflip decision (applied on device).

    Stays in PIL end to end (crop → resize, ONE numpy copy of the final
    224² tile): pixel-identical to torchvision's PIL-backend resized_crop
    and ~1.2-2.3× faster than decoding the full frame to numpy first —
    the numpy round trip of a multi-MP source costs more than the resize.

    ``fast=True`` (DataConfig.fast_decode) additionally uses libjpeg DCT
    pre-scaling (`Image.draft`): the JPEG is decoded at ~the target
    resolution (1/2,1/4,1/8 steps) and the crop box is taken in scaled
    coordinates.  2-13× faster depending on source size, but NOT
    pixel-identical to the reference transform (the crop resamples
    through the pre-scaled image) — ship it for throughput, keep it off
    for strict parity runs.  Non-JPEG sources: draft is a no-op."""
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    Image.MAX_IMAGE_PIXELS = None
    with Image.open(path) as img:
        if fast:
            w_full, h_full = img.size
            img.draft("RGB", (image_res, image_res))
            img = img.convert("RGB")
            w0, h0 = img.size
            # rng consumption order matches the exact path: crop box, flip
            top, left, h, w = sample_resized_crop(h_full, w_full, rng)
            sx, sy = w0 / w_full, h0 / h_full
            out = img.resize(
                (image_res, image_res), Image.BICUBIC,
                box=(left * sx, top * sy, (left + w) * sx, (top + h) * sy))
        else:
            img = img.convert("RGB")
            w0, h0 = img.size
            top, left, h, w = sample_resized_crop(h0, w0, rng)
            out = img.crop((left, top, left + w, top + h)).resize(
                (image_res, image_res), Image.BICUBIC)
        arr = np.asarray(out, np.uint8)
    return arr, bool(rng.rand() < 0.5)


def load_eval_image(path: str, image_res: int,
                    fast: bool = False) -> np.ndarray:
    """Decode + Resize(image_res²) uint8 (reference test_transform).
    Pure-PIL; `fast` pre-scales the JPEG decode (see load_train_image)."""
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    Image.MAX_IMAGE_PIXELS = None
    with Image.open(path) as img:
        if fast:
            img.draft("RGB", (image_res, image_res))
        out = img.convert("RGB").resize((image_res, image_res),
                                        Image.BICUBIC)
        return np.asarray(out, np.uint8)


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
