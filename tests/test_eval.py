"""Streaming ranker vs the reference's argsort semantics
(image_Retrieval_caption.py:261-317), including tie ordering, double-sim
fusion, and metric assembly."""

import numpy as np
import pytest

from leccr_tpu.eval.retrieval import (
    itm_metrics_from_ranks,
    retrieval_metrics,
    retrieval_ranks,
    score_matrix,
)

RS = np.random.RandomState(3)


def oracle_ranks(scores_i2t, scores_t2i, txt2img, img2txt):
    """Literal argsort-based ranking, the reference algorithm.

    kind='stable': the reference uses np.argsort's default introsort whose
    tie order is arbitrary/non-deterministic; our spec pins the stable
    ordering (equal scores ranked by descending index after the reversal),
    which is what the streaming ranker implements."""
    i2t = np.zeros(scores_i2t.shape[0], np.int64)
    for i, score in enumerate(scores_i2t):
        inds = np.argsort(score, kind="stable")[::-1]
        i2t[i] = min(int(np.where(inds == t)[0][0]) for t in img2txt[i])
    t2i = np.zeros(scores_t2i.shape[0], np.int64)
    for t, score in enumerate(scores_t2i):
        inds = np.argsort(score, kind="stable")[::-1]
        t2i[t] = int(np.where(inds == txt2img[t])[0][0])
    return i2t, t2i


def _setup(n_img=13, n_txt=39, e=8, ties=False):
    img = RS.randn(n_img, e).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt = RS.randn(n_txt, e).astype(np.float32)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    if ties:
        # duplicate embeddings -> exactly tied scores
        txt[5] = txt[1]
        txt[20] = txt[1]
        img[7] = img[2]
    txt2img = {t: t % n_img for t in range(n_txt)}
    img2txt = {}
    for t, i in txt2img.items():
        img2txt.setdefault(i, []).append(t)
    return img, txt, txt2img, img2txt


@pytest.mark.parametrize("ties", [False, True])
@pytest.mark.parametrize("block", [4, 13, 256])
def test_ranks_match_argsort_oracle(ties, block):
    img, txt, txt2img, img2txt = _setup(ties=ties)
    scores = np.asarray(score_matrix(img, txt))
    want_i2t, want_t2i = oracle_ranks(scores, scores.T, txt2img, img2txt)
    got_i2t, got_t2i = retrieval_ranks(
        img, txt, txt2img, img2txt, block=block)
    np.testing.assert_array_equal(got_i2t, want_i2t)
    np.testing.assert_array_equal(got_t2i, want_t2i)


@pytest.mark.parametrize("block", [4, 13])
def test_tied_gt_captions_of_same_image(block):
    """Two gt captions of ONE image with exactly equal scores: the i2t rank
    must come from the larger-index duplicate (stable-descending order), the
    tie-break the single-best-gt pass-2 rewrite relies on."""
    img, txt, txt2img, img2txt = _setup(ties=False)
    # image 1's gt captions are {1, 14, 27}; make two of them identical,
    # and give image 2 a three-way gt tie
    txt[14] = txt[1]
    txt[28] = txt[15]
    txt[2] = txt[15]
    txt2img[2] = 2  # already true (2 % 13); keep gt maps consistent
    scores = np.asarray(score_matrix(img, txt))
    want_i2t, want_t2i = oracle_ranks(scores, scores.T, txt2img, img2txt)
    got_i2t, got_t2i = retrieval_ranks(
        img, txt, txt2img, img2txt, block=block)
    np.testing.assert_array_equal(got_i2t, want_i2t)
    np.testing.assert_array_equal(got_t2i, want_t2i)


def test_double_sim_minmax_fusion_matches_oracle():
    """Video double-sim eval (video_…py:87-91,169-179): fused =
    a*norm(S) + (1-a)*norm(C), norm via global min/max."""
    img, txt, txt2img, img2txt = _setup()
    n_img, n_txt = len(img), len(txt)
    slots = RS.randn(n_img, 3, img.shape[1]).astype(np.float32)
    alpha = 0.9

    s = np.asarray(score_matrix(img, txt))
    c = np.max(np.einsum("ine,te->int", slots, txt), axis=1)

    def norm(m):
        # -((-m - min(-m)) / max(-m - min(-m))) == (m - max m)/(max m - min m)
        neg = -m
        neg = neg - neg.min()
        neg = neg / neg.max()
        return -neg

    fused = alpha * norm(s) + (1 - alpha) * norm(c)
    want_i2t, want_t2i = oracle_ranks(fused, fused.T, txt2img, img2txt)
    got_i2t, got_t2i = retrieval_ranks(
        img, txt, txt2img, img2txt, slots=slots, fusion="minmax", alpha=alpha,
        block=8)
    np.testing.assert_array_equal(got_i2t, want_i2t)
    np.testing.assert_array_equal(got_t2i, want_t2i)


def test_raw_fusion_matches_oracle():
    """Image alpha-blend fusion (image_…py:244-246)."""
    img, txt, txt2img, img2txt = _setup()
    slots = RS.randn(len(img), 2, img.shape[1]).astype(np.float32)
    alpha = 0.8
    s = np.asarray(score_matrix(img, txt))
    c = np.max(np.einsum("ine,te->int", slots, txt), axis=1)
    fused = alpha * s + (1 - alpha) * c
    want_i2t, want_t2i = oracle_ranks(fused, fused.T, txt2img, img2txt)
    got_i2t, got_t2i = retrieval_ranks(
        img, txt, txt2img, img2txt, slots=slots, fusion="raw", alpha=alpha,
        block=4)
    np.testing.assert_array_equal(got_i2t, want_i2t)
    np.testing.assert_array_equal(got_t2i, want_t2i)


def test_metric_values():
    """Hand-built ranks → exact metric values."""
    i2t = np.array([0, 0, 4, 11])  # R@1 = 50%, R@5 = 75%, R@10 = 75%
    t2i = np.array([0, 2, 9, 20])  # R@1 = 25%, R@5 = 50%, R@10 = 75%
    m = itm_metrics_from_ranks(i2t, t2i)
    assert m["txt_r1"] == 50.0 and m["txt_r5"] == 75.0 and m["txt_r10"] == 75.0
    assert m["img_r1"] == 25.0 and m["img_r5"] == 50.0 and m["img_r10"] == 75.0
    assert m["sumr_sum"] == 50 + 75 + 75 + 25 + 50 + 75
    np.testing.assert_allclose(m["r_mean"],
                               ((50 + 75 + 75) / 3 + (25 + 50 + 75) / 3) / 2)


def test_perfect_retrieval():
    img, _, txt2img, img2txt = _setup(n_img=10, n_txt=10)
    txt2img = {t: t for t in range(10)}
    img2txt = {i: [i] for i in range(10)}
    m = retrieval_metrics(img, img, txt2img, img2txt)  # txt == img embeds
    assert m["txt_r1"] == 100.0 and m["img_r1"] == 100.0
    assert m["sumr_sum"] == 600.0
