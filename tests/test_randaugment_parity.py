"""RandAugment op parity vs the reference's own backends.

Pixel ops are checked against PIL (ImageEnhance/ImageOps — what the
reference's implementations document themselves against,
dataset/randaugment.py docstrings) and geometric ops against
cv2.warpAffine with the reference's forward matrices, INTER_LINEAR and
borderValue=(128,128,128) (randaugment.py:66-205, arg_dict :288-308).
"""

import numpy as np
import pytest

import jax

from leccr_tpu.data import randaugment as ra

cv2 = pytest.importorskip("cv2")
PIL = pytest.importorskip("PIL")
from PIL import Image, ImageEnhance, ImageOps  # noqa: E402

H, W = 48, 64
MAG = 7


@pytest.fixture(scope="module")
def img_u8():
    rs = np.random.RandomState(11)
    # smooth-ish image: interpolation parity is meaningless on pure noise
    base = rs.randint(0, 255, (6, 8, 3)).astype(np.uint8)
    return np.asarray(Image.fromarray(base).resize((W, H), Image.BILINEAR))


def run_op(name, img_u8, rng=jax.random.PRNGKey(0), mag=MAG):
    out = ra.OP_BANK[name](img_u8.astype(np.float32) / 255.0, mag, rng)
    return np.asarray(out) * 255.0


def close(mine, want, atol=1.5, frac_bad=0.0, max_bad_frac=0.02):
    diff = np.abs(mine.astype(np.float64) - want.astype(np.float64))
    if frac_bad:
        assert np.mean(diff > atol) <= max_bad_frac, (
            f"bad frac {np.mean(diff > atol):.3f}, max {diff.max():.1f}")
    else:
        assert diff.max() <= atol, f"max diff {diff.max():.2f}"


# ------------------------------------------------------------- pixel ops

def test_brightness_matches_pil(img_u8):
    f = MAG / 10 * 1.8 + 0.1
    want = np.asarray(
        ImageEnhance.Brightness(Image.fromarray(img_u8)).enhance(f))
    close(run_op("Brightness", img_u8), want)


def test_color_matches_pil(img_u8):
    f = MAG / 10 * 1.8 + 0.1
    want = np.asarray(ImageEnhance.Color(Image.fromarray(img_u8)).enhance(f))
    # PIL converts through an 8-bit L image; allow that quantization
    close(run_op("Color", img_u8), want, atol=2.5)


def test_contrast_matches_pil(img_u8):
    f = MAG / 10 * 1.8 + 0.1
    want = np.asarray(
        ImageEnhance.Contrast(Image.fromarray(img_u8)).enhance(f))
    close(run_op("Contrast", img_u8), want, atol=2.5)


def test_sharpness_interior_matches_pil(img_u8):
    f = MAG / 10 * 1.8 + 0.1
    want = np.asarray(
        ImageEnhance.Sharpness(Image.fromarray(img_u8)).enhance(f))
    mine = run_op("Sharpness", img_u8)
    # the reference itself only matches PIL away from the 1px border
    # (randaugment.py:131-135); PIL's SMOOTH border handling differs
    close(mine[2:-2, 2:-2], want[2:-2, 2:-2], atol=2.0)
    # border passes through untouched (reference :145-147)
    np.testing.assert_array_equal(mine[0], img_u8[0].astype(np.float64))


def test_autocontrast_matches_pil(img_u8):
    want = np.asarray(ImageOps.autocontrast(Image.fromarray(img_u8)))
    close(run_op("AutoContrast", img_u8), want, atol=1.5)


def test_equalize_matches_pil(img_u8):
    want = np.asarray(ImageOps.equalize(Image.fromarray(img_u8)))
    close(run_op("Equalize", img_u8), want, atol=0.5)


def test_solarize_matches_pil(img_u8):
    thresh = int(MAG / 10 * 256)  # reference solarize_level_to_args
    want = np.asarray(ImageOps.solarize(Image.fromarray(img_u8), thresh))
    close(run_op("Solarize", img_u8), want, atol=0.5)


def test_posterize_matches_reference_bits(img_u8):
    bits = int(MAG / 10 * 4)
    want = np.bitwise_and(img_u8, np.uint8((255 << (8 - bits)) & 255))
    close(run_op("Posterize", img_u8), want, atol=0.5)
    pil = np.asarray(ImageOps.posterize(Image.fromarray(img_u8), bits))
    np.testing.assert_array_equal(want, pil)


def test_invert(img_u8):
    close(run_op("Invert", img_u8), 255 - img_u8.astype(np.float64),
          atol=0.5)


# --------------------------------------------------------- geometric ops

def _sign(rng):
    return -1.0 if float(jax.random.uniform(rng)) > 0.5 else 1.0


def _cv2_affine(img_u8, m_forward):
    return cv2.warpAffine(
        img_u8, np.float32(m_forward), (W, H),
        borderValue=(128, 128, 128), flags=cv2.INTER_LINEAR)


@pytest.mark.parametrize("name", ["ShearX", "ShearY",
                                  "TranslateX", "TranslateY"])
def test_affine_ops_match_cv2(name, img_u8):
    rng = jax.random.PRNGKey(3)
    s = _sign(rng)
    if name == "ShearX":
        m = [[1, s * MAG / 10 * 0.3, 0], [0, 1, 0]]
    elif name == "ShearY":
        m = [[1, 0, 0], [s * MAG / 10 * 0.3, 1, 0]]
    elif name == "TranslateX":
        m = [[1, 0, -s * MAG / 10 * 10], [0, 1, 0]]
    else:
        m = [[1, 0, 0], [0, 1, -s * MAG / 10 * 10]]
    want = _cv2_affine(img_u8, m)
    mine = run_op(name, img_u8, rng)
    # interpolation backends may differ on a sliver of border pixels
    close(mine, want, atol=3.0, frac_bad=True, max_bad_frac=0.03)


def test_rotate_matches_cv2(img_u8):
    rng = jax.random.PRNGKey(9)
    deg = _sign(rng) * MAG / 10 * 30
    m = cv2.getRotationMatrix2D((W / 2, H / 2), deg, 1)
    want = _cv2_affine(img_u8, m)
    mine = run_op("Rotate", img_u8, rng)
    close(mine, want, atol=3.0, frac_bad=True, max_bad_frac=0.03)


# ----------------------------------------------------------- policy level

def test_cutout_patch(img_u8):
    out = run_op("Cutout", img_u8, jax.random.PRNGKey(1), mag=10)
    diff = np.any(np.abs(out - img_u8) > 0.5, axis=-1)
    n = diff.sum()
    assert 0 < n <= 40 * 40
    # the patch is gray 128
    assert np.allclose(out[diff], 128.0, atol=0.5)


def test_bank_is_complete():
    # full reference arg_dict (randaugment.py:288-308) + documented extras
    ref_bank = {"Identity", "AutoContrast", "Equalize", "Rotate", "Solarize",
                "Color", "Contrast", "Brightness", "Sharpness", "ShearX",
                "TranslateX", "TranslateY", "Posterize", "ShearY"}
    assert ref_bank <= set(ra.OP_BANK)
    assert set(ra.LIVE_POLICY) <= set(ra.OP_BANK)


def test_policy_prob_gate():
    """Each sampled op applies with prob 0.5 (reference :322-331): over many
    seeds some outputs must equal the input exactly and some must differ."""
    img = np.asarray(
        Image.fromarray(np.random.RandomState(0).randint(
            0, 255, (8, 8, 3)).astype(np.uint8)).resize((16, 16))
    ).astype(np.float32) / 255.0
    same = changed = 0
    out = jax.vmap(lambda r: ra.rand_augment(img, r, 1, 10,
                                             ops=("Invert",)))(
        jax.random.split(jax.random.PRNGKey(0), 64))
    for o in np.asarray(out):
        if np.array_equal(o, img):
            same += 1
        else:
            changed += 1
    assert same > 10 and changed > 10  # ~32 ± binomial noise
