"""RandAugment bank as device-side jax ops.

Capability parity with reference dataset/randaugment.py:310-331 — the
`RandomAugment(2, 7, augs=[...])` policy used by the pretrain transform
(dataset/__init__.py:43-51; the live fine-tune transform keeps it available
but commented out, :57).  The reference implements the ops with PIL/cv2 on
the host; here each op is a jit-able function on a normalized float image
[H, W, 3] in [0, 1], so the whole augmentation policy runs fused on device
after the host decode.

Policy semantics (reference randaugment.py:310-331): per image, sample N ops
(with replacement) from the bank and apply each at magnitude M (0..10
scale).  Geometric ops use bilinear resampling via map_coordinates with
edge padding.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp


def _sample_affine(img: jax.Array, matrix: jax.Array) -> jax.Array:
    """Apply a 2x3 inverse affine (output->input coords) with bilinear
    sampling and edge padding.  img: [H, W, C] float."""
    h, w, _ = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    src_x = matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]
    src_y = matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]
    coords = jnp.stack([src_y.ravel(), src_x.ravel()])

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, coords, order=1, mode="nearest").reshape(h, w)

    return jnp.stack([sample_channel(img[..., c]) for c in range(3)],
                     axis=-1)


def identity(img, _mag):
    return img


def brightness(img, mag):
    # PIL ImageEnhance.Brightness(1 + mag*0.9/10 range approx)
    factor = 1.0 + (mag / 10.0) * 0.9 - 0.45  # symmetric around 1
    return jnp.clip(img * factor, 0.0, 1.0)


def sharpness(img, mag):
    """PIL-style sharpness: blend with a 3x3 smoothing kernel."""
    kernel = jnp.array([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    blurred = jnp.stack([
        jax.scipy.signal.convolve2d(img[..., c], kernel, mode="same")
        for c in range(3)], axis=-1)
    factor = 1.0 + (mag / 10.0) * 0.9 - 0.45
    return jnp.clip(blurred + factor * (img - blurred), 0.0, 1.0)


def autocontrast(img, _mag):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / jnp.maximum(hi - lo, 1e-6), 0.0)
    out = jnp.where(hi > lo, (img - lo) * scale, img)
    return jnp.clip(out, 0.0, 1.0)


def equalize(img, _mag):
    """Histogram equalization per channel (256 bins)."""
    def eq_channel(ch):
        values = (ch * 255.0).astype(jnp.int32).clip(0, 255)
        hist = jnp.bincount(values.ravel(), length=256).astype(jnp.float32)
        cdf = jnp.cumsum(hist)
        cdf_min = cdf[jnp.argmax(hist > 0)]
        denom = jnp.maximum(cdf[-1] - cdf_min, 1.0)
        lut = jnp.clip((cdf - cdf_min) / denom, 0.0, 1.0)
        return lut[values]

    return jnp.stack([eq_channel(img[..., c]) for c in range(3)], axis=-1)


def shear_x(img, mag):
    s = (mag / 10.0) * 0.3
    m = jnp.array([[1.0, s, -s * img.shape[0] / 2], [0.0, 1.0, 0.0]])
    return _sample_affine(img, m)


def shear_y(img, mag):
    s = (mag / 10.0) * 0.3
    m = jnp.array([[1.0, 0.0, 0.0], [s, 1.0, -s * img.shape[1] / 2]])
    return _sample_affine(img, m)


def translate_x(img, mag):
    t = (mag / 10.0) * 0.45 * img.shape[1]
    m = jnp.array([[1.0, 0.0, t], [0.0, 1.0, 0.0]])
    return _sample_affine(img, m)


def translate_y(img, mag):
    t = (mag / 10.0) * 0.45 * img.shape[0]
    m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, t]])
    return _sample_affine(img, m)


def rotate(img, mag):
    deg = (mag / 10.0) * 30.0
    rad = jnp.deg2rad(deg)
    h, w = img.shape[0], img.shape[1]
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    cx, cy = w / 2.0, h / 2.0
    m = jnp.array([
        [cos, sin, cx - cos * cx - sin * cy],
        [-sin, cos, cy + sin * cx - cos * cy],
    ])
    return _sample_affine(img, m)


# the reference's default op bank (dataset/__init__.py:47-48)
OP_BANK = (identity, autocontrast, equalize, brightness, sharpness,
           shear_x, shear_y, translate_x, translate_y, rotate)


@functools.partial(jax.jit, static_argnames=("n_ops", "magnitude"))
def rand_augment(img: jax.Array, rng: jax.Array, n_ops: int = 2,
                 magnitude: int = 7) -> jax.Array:
    """Apply `n_ops` randomly chosen bank ops at `magnitude` to one image
    ([H, W, 3] float in [0,1])."""
    def apply_one(i, state):
        img, rng = state
        rng, sub = jax.random.split(rng)
        op_idx = jax.random.randint(sub, (), 0, len(OP_BANK))
        img = jax.lax.switch(
            op_idx, [(lambda x, op=op: op(x, magnitude)) for op in OP_BANK],
            img)
        return img, rng

    img, _ = jax.lax.fori_loop(0, n_ops, apply_one, (img, rng))
    return img


def rand_augment_batch(images: jax.Array, rng: jax.Array, n_ops: int = 2,
                       magnitude: int = 7) -> jax.Array:
    """vmapped policy over a batch [B, H, W, 3]."""
    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(
        lambda im, r: rand_augment(im, r, n_ops, magnitude))(images, rngs)
