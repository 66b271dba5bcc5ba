"""RandAugment bank as device-side jax ops.

Capability parity with reference dataset/randaugment.py — the full
`arg_dict` bank (14 ops, :288-308) plus the defined-but-unwired cutout
(:194-205) and invert.  The reference implements the ops with PIL/cv2 on
the host; here each op is a jit-able function on a normalized float image
[H, W, 3] in [0, 1], so the whole augmentation policy runs fused on device
after the host decode.

Policy semantics (reference randaugment.py:310-334): per image, sample N
ops uniformly WITH replacement from the bank, and apply each independently
with probability 0.5 at magnitude M (0..10 scale).  Magnitude mappings
match the reference level_to_args exactly (:208-265): enhance ops use
factor = M/10*1.8 + 0.1; shear = ±M/10*0.3; translate = ±M/10*10 px;
rotate = ±M/10*30°; solarize threshold = int(M/10*256); posterize keeps
int(M/10*4) high bits.  Geometric ops fill out-of-bounds pixels with gray
128 (the reference's replace_value, :287) and resample bilinearly like
cv2.warpAffine(INTER_LINEAR).

One deliberate deviation: the reference's color/contrast luma weights are
ordered for cv2 BGR images but its datasets load RGB via PIL, so the
reference mixes the R and B weights (randaugment.py:87-120).  We use the
PIL-correct Rec.601 RGB weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

FILL = 128.0 / 255.0  # reference replace_value=(128,128,128)
_LUMA = jnp.array([0.299, 0.587, 0.114])  # PIL RGB weights (see docstring)


def _sample_affine(img: jax.Array, matrix: jax.Array) -> jax.Array:
    """Apply a 2x3 inverse affine (output->input coords) with bilinear
    sampling; out-of-bounds pixels take the reference's gray fill
    (cv2.warpAffine borderValue semantics).  img: [H, W, C] float."""
    h, w, _ = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    src_x = matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]
    src_y = matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]
    inside = ((src_x >= 0) & (src_x <= w - 1)
              & (src_y >= 0) & (src_y <= h - 1))[..., None]
    coords = jnp.stack([src_y.ravel(), src_x.ravel()])

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, coords, order=1, mode="nearest").reshape(h, w)

    out = jnp.stack([sample_channel(img[..., c]) for c in range(3)], axis=-1)
    return jnp.where(inside, out, FILL)


def _rand_sign(rng: jax.Array) -> jax.Array:
    """The reference flips each geometric magnitude's sign with p=0.5
    (randaugment.py:215-229,258-264)."""
    return jnp.where(jax.random.uniform(rng) > 0.5, -1.0, 1.0)


def _enhance_factor(mag: float) -> float:
    return (mag / 10.0) * 1.8 + 0.1  # reference enhance_level_to_args


def identity(img, _mag, _rng):
    return img


def brightness(img, mag, _rng):
    # PIL ImageEnhance.Brightness: blend with black
    return jnp.clip(img * _enhance_factor(mag), 0.0, 1.0)


def color(img, mag, _rng):
    # PIL ImageEnhance.Color: blend with the grayscale image
    gray = (img @ _LUMA)[..., None]
    f = _enhance_factor(mag)
    return jnp.clip(gray + f * (img - gray), 0.0, 1.0)


def contrast(img, mag, _rng):
    # PIL ImageEnhance.Contrast: blend with the mean gray level
    mean = jnp.mean(img @ _LUMA)
    f = _enhance_factor(mag)
    return jnp.clip(mean + f * (img - mean), 0.0, 1.0)


def sharpness(img, mag, _rng):
    """PIL-style sharpness: blend the interior with a 3x3 smoothing kernel;
    the 1-pixel border stays untouched (reference randaugment.py:131-149)."""
    kernel = jnp.array([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    blurred = jnp.stack([
        jax.scipy.signal.convolve2d(img[..., c], kernel, mode="same")
        for c in range(3)], axis=-1)
    f = _enhance_factor(mag)
    out = jnp.clip(blurred + f * (img - blurred), 0.0, 1.0)
    h, w = img.shape[0], img.shape[1]
    ys = jnp.arange(h)[:, None, None]
    xs = jnp.arange(w)[None, :, None]
    interior = (ys > 0) & (ys < h - 1) & (xs > 0) & (xs < w - 1)
    return jnp.where(interior, out, img)


def autocontrast(img, _mag, _rng):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / jnp.maximum(hi - lo, 1e-6), 0.0)
    out = jnp.where(hi > lo, (img - lo) * scale, img)
    return jnp.clip(out, 0.0, 1.0)


def equalize(img, _mag, _rng):
    """PIL.ImageOps.equalize semantics (integer step/cumsum arithmetic —
    differs from classic cdf-min equalization; reference :43-63)."""
    def eq_channel(ch):
        values = jnp.clip(jnp.round(ch * 255.0).astype(jnp.int32), 0, 255)
        hist = jnp.bincount(values.ravel(), length=256)
        nz = hist > 0
        last_idx = 255 - jnp.argmax(nz[::-1])
        last_val = hist[last_idx]
        step = (jnp.sum(hist) - last_val) // 255
        n = jnp.concatenate([(step // 2)[None], hist[:-1]])
        lut = jnp.clip(jnp.cumsum(n) // jnp.maximum(step, 1), 0, 255)
        out = lut[values].astype(jnp.float32) / 255.0
        return jnp.where(step == 0, ch, out)

    return jnp.stack([eq_channel(img[..., c]) for c in range(3)], axis=-1)


def solarize(img, mag, _rng):
    # invert pixels at or above the threshold (reference :77-85)
    thresh = int((mag / 10.0) * 256)
    v = jnp.clip(jnp.round(img * 255.0), 0.0, 255.0)
    return jnp.where(v < thresh, v, 255.0 - v) / 255.0


def posterize(img, mag, _rng):
    # keep the top int(M/10*4) bits (reference :179-184,251-256)
    bits = int((mag / 10.0) * 4)
    mask = (255 << (8 - bits)) & 255 if bits > 0 else 0
    v = jnp.clip(jnp.round(img * 255.0), 0.0, 255.0).astype(jnp.int32)
    return (v & mask).astype(jnp.float32) / 255.0


def invert(img, _mag, _rng):
    return 1.0 - img


def shear_x(img, mag, rng):
    # forward cv2 matrix [[1, s, 0], [0, 1, 0]] -> inverse for sampling
    s = _rand_sign(rng) * (mag / 10.0) * 0.3
    m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    m = m.at[0, 1].set(-s)
    return _sample_affine(img, m)


def shear_y(img, mag, rng):
    s = _rand_sign(rng) * (mag / 10.0) * 0.3
    m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    m = m.at[1, 0].set(-s)
    return _sample_affine(img, m)


def translate_x(img, mag, rng):
    # reference: offset = ±M/10 * translate_const(10) PIXELS; forward
    # matrix [[1,0,-offset]] -> inverse adds the offset
    t = _rand_sign(rng) * (mag / 10.0) * 10.0
    m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    m = m.at[0, 2].set(t)
    return _sample_affine(img, m)


def translate_y(img, mag, rng):
    t = _rand_sign(rng) * (mag / 10.0) * 10.0
    m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    m = m.at[1, 2].set(t)
    return _sample_affine(img, m)


def rotate(img, mag, rng):
    # cv2.getRotationMatrix2D(center, deg) is the forward map; the inverse
    # is the rotation by -deg about the same center
    deg = _rand_sign(rng) * (mag / 10.0) * 30.0
    rad = jnp.deg2rad(-deg)
    h, w = img.shape[0], img.shape[1]
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    cx, cy = w / 2.0, h / 2.0  # reference rotate_func center (:66-74)
    m = jnp.array([
        [cos, sin, cx - cos * cx - sin * cy],
        [-sin, cos, cy + sin * cx - cos * cy],
    ])
    return _sample_affine(img, m)


def cutout(img, mag, rng):
    """Square gray patch at a random center (reference cutout_func
    :194-205 — defined there but not wired into the bank; cutout_const=40)."""
    pad = int((mag / 10.0) * 40) // 2
    h, w = img.shape[0], img.shape[1]
    r1, r2 = jax.random.uniform(rng, (2,))
    ch = jnp.floor(r1 * h)
    cw = jnp.floor(r2 * w)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    inside = ((ys >= ch - pad) & (ys < ch + pad)
              & (xs >= cw - pad) & (xs < cw + pad))
    return jnp.where(inside, FILL, img)


# full reference arg_dict bank (randaugment.py:288-308) + unwired extras
OP_BANK = {
    "Identity": identity,
    "AutoContrast": autocontrast,
    "Equalize": equalize,
    "Rotate": rotate,
    "Solarize": solarize,
    "Color": color,
    "Contrast": contrast,
    "Brightness": brightness,
    "Sharpness": sharpness,
    "ShearX": shear_x,
    "ShearY": shear_y,
    "TranslateX": translate_x,
    "TranslateY": translate_y,
    "Posterize": posterize,
    "Cutout": cutout,    # not in the reference arg_dict (dead code there)
    "Invert": invert,    # not in the reference bank; standard RandAugment op
}

# the live policy (reference dataset/__init__.py:47-48)
LIVE_POLICY = ("Identity", "AutoContrast", "Equalize", "Brightness",
               "Sharpness", "ShearX", "ShearY", "TranslateX", "TranslateY",
               "Rotate")


@functools.partial(jax.jit, static_argnames=("n_ops", "magnitude", "ops"))
def rand_augment(img: jax.Array, rng: jax.Array, n_ops: int = 2,
                 magnitude: int = 7, ops: tuple = LIVE_POLICY) -> jax.Array:
    """Apply the policy to one image ([H, W, 3] float in [0,1]): n_ops
    draws with replacement, each applied with probability 0.5."""
    bank = [OP_BANK[name] for name in ops]

    def apply_one(i, state):
        img, rng = state
        rng, r_op, r_gate, r_arg = jax.random.split(rng, 4)
        op_idx = jax.random.randint(r_op, (), 0, len(bank))
        new = jax.lax.switch(
            op_idx,
            [(lambda x, op=op: op(x, magnitude, r_arg)) for op in bank],
            img)
        # (op, 0.5, M) tuples: skip when uniform > prob (reference :322-331)
        img = jnp.where(jax.random.uniform(r_gate) > 0.5, img, new)
        return img, rng

    img, _ = jax.lax.fori_loop(0, n_ops, apply_one, (img, rng))
    return img


def rand_augment_batch(images: jax.Array, rng: jax.Array, n_ops: int = 2,
                       magnitude: int = 7,
                       ops: tuple = LIVE_POLICY) -> jax.Array:
    """vmapped policy over a batch [B, H, W, 3]."""
    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(
        lambda im, r: rand_augment(im, r, n_ops, magnitude, ops))(
            images, rngs)
