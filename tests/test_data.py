"""Data layer: normalization goldens, ground-truth index construction,
feature bank round-trip, sharding/bucketing, synthetic dataset parsing."""

import numpy as np
import pytest

from leccr_tpu.data.feature_bank import FeatureBank, write_feature_bank
from leccr_tpu.data.pipeline import (
    bucket_width,
    pad_token_batch,
    shard_indices,
)
from leccr_tpu.data.text import (
    build_eval_index,
    language_of_train_file,
    normalize_caption,
    video_id_of,
)


def test_normalize_caption_goldens():
    # punctuation → space, lowercase, squeeze (dataset/utils.py:31-59)
    assert normalize_caption("A man, riding his bike!", 30) == \
        "a man riding his bike"
    assert normalize_caption("<person> runs fast-ish", 30) == \
        "person runs fast ish"
    assert normalize_caption("a/b  c", 30) == "a b c"
    # word-level truncation
    assert normalize_caption("one two three four", 2) == "one two"
    with pytest.raises(ValueError):
        normalize_caption("...", 30)


def test_video_id_of():
    assert video_id_of("img123#enc#0") == "img123"
    assert video_id_of("clip.mp4#enc2fr#1") == "clip"
    assert video_id_of("pic.jpg#enc#2") == "pic"


def test_language_of_train_file():
    assert language_of_train_file(
        "TextData/Flickr30ktrain_google_enc2fr.caption.txt") == "fr"
    assert language_of_train_file("TextData/train_enc2zh.caption.txt") == "zh"


def test_build_eval_index():
    entries = [
        ("imgA#enc#0", "first caption"),
        ("imgA#enc#1", "second caption"),
        ("imgB#enc#0", "third caption"),
        ("imgA#enc#2", "fourth caption"),
    ]
    idx = build_eval_index(entries)
    assert idx.image_ids == ["imgA", "imgB"]
    assert idx.txt2img == {0: 0, 1: 0, 2: 1, 3: 0}
    assert idx.img2txt == {0: [0, 1, 3], 1: [2]}
    assert idx.texts[0] == "first caption"


def test_feature_bank_roundtrip(tmp_path):
    names = [f"v{i}" for i in range(7)]
    mat = np.random.RandomState(0).randn(7, 5).astype(np.float32)
    write_feature_bank(str(tmp_path / "fb"), names, mat)
    bank = FeatureBank(str(tmp_path / "fb"))
    assert bank.shape == (7, 5)
    np.testing.assert_array_equal(bank.read_one("v3"), mat[3])
    np.testing.assert_array_equal(bank.read_rows(["v5", "v0"]),
                                  mat[[5, 0]])
    frames, mask = bank.read_video(["v1", "v2", "v4"], max_frames=5)
    np.testing.assert_array_equal(frames[:3], mat[[1, 2, 4]])
    assert mask.tolist() == [True, True, True, False, False]
    # subsampling keeps endpoints
    frames2, mask2 = bank.read_video(names, max_frames=3)
    assert mask2.all()
    np.testing.assert_array_equal(frames2[0], mat[0])
    np.testing.assert_array_equal(frames2[-1], mat[6])
    # sequential stream (reference StreamFile, utils/bigfile.py:66-105):
    # full pass in file order, block boundary exercised
    streamed = list(bank.iter_rows(block_rows=3))
    assert [n for n, _ in streamed] == names
    np.testing.assert_array_equal(np.stack([r for _, r in streamed]), mat)


def test_shard_indices_cover_and_disjoint():
    shards = [shard_indices(103, epoch=2, seed=1, process_count=4,
                            process_index=p) for p in range(4)]
    sizes = {len(s) for s in shards}
    assert sizes == {25}  # drop_last
    allidx = np.concatenate(shards)
    assert len(set(allidx.tolist())) == 100
    # determinism
    again = shard_indices(103, epoch=2, seed=1, process_count=4,
                          process_index=1)
    np.testing.assert_array_equal(shards[1], again)
    # different epoch -> different order
    other = shard_indices(103, epoch=3, seed=1, process_count=4,
                          process_index=1)
    assert not np.array_equal(shards[1], other)


def test_bucket_and_pad():
    assert bucket_width([5, 9], [16, 32, 64]) == 16
    assert bucket_width([20], [16, 32, 64]) == 32
    assert bucket_width([100], [16, 32, 64]) == 64  # clamped
    ids, mask = pad_token_batch([[1, 2, 3], [4]], 5)
    np.testing.assert_array_equal(ids, [[1, 2, 3, 0, 0], [4, 0, 0, 0, 0]])
    np.testing.assert_array_equal(mask, [[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]])


def test_synthetic_image_dataset_parses(tmp_path):
    from leccr_tpu.data.datasets import ImageEvalDataset, ImageTrainDataset
    from leccr_tpu.data.synthetic import make_image_dataset

    cfg = make_image_dataset(str(tmp_path / "ds"), n_train=6, n_eval=3,
                             caps_per_image=2, image_res=32)
    train = ImageTrainDataset(cfg, image_res=32)
    assert len(train) == 12  # 6 images x 2 captions
    rng = np.random.RandomState(0)
    sample = train.get(0, rng)
    assert sample.image_u8.shape == (32, 32, 3)
    assert len(sample.texts) == 2
    assert sample.idx == 0
    assert isinstance(sample.caption, str) and sample.caption

    ev = ImageEvalDataset(cfg, cfg.test_file["de"], image_res=32,
                          split="test")
    assert len(ev) == 3
    assert len(ev.texts) == 6
    img, cap, i = ev.get(1)
    assert img.shape == (32, 32, 3) and i == 1


def test_synthetic_video_dataset_parses(tmp_path):
    from leccr_tpu.data.datasets import VideoEvalDataset, VideoTrainDataset
    from leccr_tpu.data.synthetic import make_video_dataset

    cfg = make_video_dataset(str(tmp_path / "vds"), n_train=4, n_eval=2,
                             feat_dim=16, frames_per_video=4)
    train = VideoTrainDataset(cfg, max_frames=6)
    assert len(train) == 8
    sample = train.get(3, np.random.RandomState(0))
    assert sample.frames.shape == (6, 16)
    assert sample.frame_mask[0]
    ev = VideoEvalDataset(cfg, cfg.test_file["zh"], max_frames=6,
                          split="test")
    (frames, mask), cap, i = ev.get(0)
    assert frames.shape == (6, 16)


def test_train_loader_batches(tmp_path):
    from leccr_tpu.data.datasets import ImageTrainDataset
    from leccr_tpu.data.pipeline import TrainLoader
    from leccr_tpu.data.synthetic import make_image_dataset
    from leccr_tpu.data.tokenizers import WordPieceTokenizer

    cfg = make_image_dataset(str(tmp_path / "ds"), n_train=8, n_eval=2,
                             caps_per_image=2, image_res=32)
    ds = ImageTrainDataset(cfg, image_res=32)
    tok = WordPieceTokenizer(cfg.text_vocab)
    loader = TrainLoader(ds, tok, cfg, batch_size=4, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 4  # 16 samples / bs 4
    b = batches[0]
    assert b["vision"].shape == (4, 32, 32, 3)
    assert b["vision"].dtype == np.uint8
    assert b["text_ids_s"].shape == b["text_ids_t"].shape
    assert b["text_ids_s"].shape[1] in cfg.token_buckets
    assert b["caption_ids"].shape[0] == 4
    assert b["idx"].shape == (4,)
    # two processes shard disjointly
    l0 = TrainLoader(ds, tok, cfg, batch_size=4, process_count=2,
                     process_index=0, num_workers=1)
    l1 = TrainLoader(ds, tok, cfg, batch_size=4, process_count=2,
                     process_index=1, num_workers=1)
    ids0 = np.concatenate([b["idx"] for b in l0.epoch(1)])
    ids1 = np.concatenate([b["idx"] for b in l1.epoch(1)])
    assert len(ids0) == len(ids1) == 8


def test_randaugment_ops_shapes_and_ranges():
    import jax
    import jax.numpy as jnp
    from leccr_tpu.data import randaugment as ra

    img = jnp.asarray(
        np.random.RandomState(0).rand(24, 24, 3).astype(np.float32))
    rng = jax.random.PRNGKey(5)
    for name, op in ra.OP_BANK.items():
        out = op(img, 7, rng)
        assert out.shape == img.shape, name
        assert float(jnp.min(out)) >= -1e-5, name
        assert float(jnp.max(out)) <= 1.0 + 1e-5, name
    # identity really is identity
    np.testing.assert_array_equal(np.asarray(ra.identity(img, 7, rng)),
                                  np.asarray(img))
    # full policy: deterministic per key, differs across keys
    out1 = ra.rand_augment(img, jax.random.PRNGKey(0))
    out2 = ra.rand_augment(img, jax.random.PRNGKey(0))
    out3 = ra.rand_augment(img, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # batch version
    batch = jnp.stack([img, img])
    outb = ra.rand_augment_batch(batch, jax.random.PRNGKey(1))
    assert outb.shape == batch.shape


def test_local_io_module(tmp_path):
    from leccr_tpu.utils import io as lio

    p = tmp_path / "sub" / "f.txt"
    lio.makedirs(str(p.parent))
    assert lio.exists(str(p.parent))
    with lio.open_file(str(p), "w") as f:
        f.write("hello")
    assert lio.exists(str(p))
    with lio.open_file(str(p), "r") as f:
        assert f.read() == "hello"
    lio.copy(str(p), str(tmp_path / "g.txt"))
    assert lio.exists(str(tmp_path / "g.txt"))
    assert any(x.endswith("f.txt") for x in lio.listdir(str(p.parent)))


def test_eval_loader_batches(tmp_path):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from leccr_tpu.data.datasets import ImageEvalDataset
    from leccr_tpu.data.pipeline import EvalLoader, device_prefetch
    from leccr_tpu.data.synthetic import make_image_dataset
    from leccr_tpu.data.tokenizers import WordPieceTokenizer

    cfg = make_image_dataset(str(tmp_path / "ds"), n_train=4, n_eval=5,
                             caps_per_image=2, image_res=32)
    ds = ImageEvalDataset(cfg, cfg.test_file["de"], image_res=32,
                          split="test")
    tok = WordPieceTokenizer(cfg.text_vocab)
    loader = EvalLoader(ds, tok, cfg, batch_size=4, text_batch_size=4)

    # text batches: bucketed static width (smallest bucket covering the
    # split's longest sequence), count marks the valid rows; the split
    # tokenization is computed once and cached on the dataset
    tb = list(loader.text_batches())
    assert hasattr(ds, "_tok_cache")
    tb_again = list(loader.text_batches())
    np.testing.assert_array_equal(tb[0][0], tb_again[0][0])
    assert sum(n for _, _, n in tb) == len(ds.texts) == 10
    ids, mask, n = tb[-1]
    longest = max(int(m.sum(1).max()) for _, m, _ in tb)
    width = next((b for b in sorted(cfg.token_buckets) if b >= longest),
                 cfg.max_tokens)
    assert ids.shape == (4, width)
    assert n == 10 - 2 * 4

    # image batches: padded to batch_size, counts sum to n images
    ib = list(loader.image_batches())
    assert sum(c for _, c in ib) == 5
    batch, count = ib[-1]
    assert batch["vision"].shape[0] == 4 and count == 1

    # device_prefetch yields the same batches, on device
    mesh = jax.sharding.Mesh(jax.devices()[:1], ("data",))
    sharding = NamedSharding(mesh, P())
    out = list(device_prefetch(iter([{"x": np.ones((2, 2))}]), sharding))
    assert len(out) == 1
    assert isinstance(out[0]["x"], jax.Array)


def test_mscoco_layout_dataset(tmp_path):
    """mscoco id→filename indirection + per-language eval id files."""
    from leccr_tpu.data.datasets import ImageEvalDataset, ImageTrainDataset
    from leccr_tpu.data.synthetic import make_mscoco_dataset

    cfg = make_mscoco_dataset(str(tmp_path / "coco"), n_train=4, n_eval=2,
                              image_res=32)
    train = ImageTrainDataset(cfg, image_res=32)
    assert len(train) == 8
    sample = train.get(0, np.random.RandomState(0))
    assert sample.image_u8.shape == (32, 32, 3)
    assert len(sample.texts) == 2
    assert sample.caption

    ev = ImageEvalDataset(cfg, cfg.test_file["zh"], image_res=32,
                          split="test")
    assert len(ev) == 2
    img, cap, i = ev.get(0)
    assert img.shape == (32, 32, 3) and cap


def test_metrics_module():
    from leccr_tpu.train.metrics import JSONLLogger, MetricLogger, SmoothedValue

    sv = SmoothedValue(window_size=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        sv.update(v)
    assert sv.value == 4.0
    assert sv.avg == pytest.approx(3.0)  # window (2,3,4)
    assert sv.global_avg == pytest.approx(2.5)
    assert sv.median == 3.0

    outputs = []
    ml = MetricLogger(print_fn=outputs.append)
    for item in ml.log_every(range(5), print_freq=2, header="t"):
        ml.update(loss=float(item))
    assert ml.meters["loss"].global_avg == pytest.approx(2.0)
    assert any("t  [0/5]" in line for line in outputs)
    assert any("Total time" in line for line in outputs)


def test_jsonl_logger(tmp_path):
    import json

    from leccr_tpu.train.metrics import JSONLLogger

    lg = JSONLLogger(str(tmp_path), enabled=True)
    lg.write({"a": 1})
    lg.write({"b": np.float64(2.5)})
    lines = (tmp_path / "log.txt").read_text().strip().splitlines()
    assert json.loads(lines[0]) == {"a": 1}
    assert json.loads(lines[1]) == {"b": 2.5}


def test_feats_caption_loader(tmp_path):
    """Loader collation of .npy caption features (caps padded + masked)."""
    from leccr_tpu.data.datasets import ImageTrainDataset
    from leccr_tpu.data.pipeline import TrainLoader
    from leccr_tpu.data.synthetic import make_image_dataset
    from leccr_tpu.data.tokenizers import WordPieceTokenizer

    cfg = make_image_dataset(str(tmp_path / "ds"), n_train=4, n_eval=2,
                             caps_per_image=1, image_res=32)
    # convert the caption dir to feats
    rs = np.random.RandomState(0)
    cap_dir = tmp_path / "feats"
    cap_dir.mkdir()
    for i in range(4):
        np.save(cap_dir / f"img{i:04d}.npy",
                rs.randn(rs.randint(2, 6), 768).astype(np.float32))
    cfg.generated_caption_dir = str(cap_dir)
    cfg.generated_caption_type = "feats"

    ds = ImageTrainDataset(cfg, image_res=32)
    tok = WordPieceTokenizer(cfg.text_vocab)
    loader = TrainLoader(ds, tok, cfg, batch_size=4, num_workers=1)
    batch = next(iter(loader.epoch(0)))
    assert "caption_feats" in batch and "caption_ids" not in batch
    assert batch["caption_feats"].shape[2] == 768
    assert batch["caption_mask"].shape == batch["caption_feats"].shape[:2]
    # masks mark true lengths
    assert (batch["caption_mask"].sum(1) >= 2).all()


def test_eval_loader_process_sharding(tmp_path):
    """Two simulated processes each materialize half of every global eval
    batch; concatenating their slices reproduces the single-process batch
    exactly (multi-host eval: decode cost scales 1/P)."""
    from leccr_tpu.data.datasets import ImageEvalDataset
    from leccr_tpu.data.pipeline import EvalLoader
    from leccr_tpu.data.synthetic import make_image_dataset
    from leccr_tpu.data.tokenizers import WordPieceTokenizer

    cfg = make_image_dataset(str(tmp_path / "ds"), n_train=4, n_eval=5,
                             caps_per_image=2, image_res=32)
    ds = ImageEvalDataset(cfg, cfg.test_file["de"], image_res=32,
                          split="test")
    tok = WordPieceTokenizer(cfg.text_vocab)
    full = EvalLoader(ds, tok, cfg, batch_size=4, text_batch_size=4)
    parts = [EvalLoader(ds, tok, cfg, batch_size=4, text_batch_size=4,
                        process_count=2, process_index=pi)
             for pi in (0, 1)]

    for (ids, mask, n), (i0, m0, n0), (i1, m1, n1) in zip(
            full.text_batches(), *(p.text_batches() for p in parts)):
        assert n == n0 == n1  # counts are global
        np.testing.assert_array_equal(ids, np.concatenate([i0, i1]))
        np.testing.assert_array_equal(mask, np.concatenate([m0, m1]))

    for (b, c), (b0, c0), (b1, c1) in zip(
            full.image_batches(), *(p.image_batches() for p in parts)):
        assert c == c0 == c1
        for k in b:
            np.testing.assert_array_equal(
                b[k], np.concatenate([b0[k], b1[k]]))


def test_image_load_matches_numpy_oracle(tmp_path):
    """The pure-PIL decode path (crop -> resize, one numpy copy) must be
    pixel-identical to the torchvision-semantics oracle: full decode to
    numpy, numpy crop, PIL bicubic resize — the path the trajectory-parity
    suites were validated against."""
    from PIL import Image

    from leccr_tpu.data.images import (load_eval_image, load_train_image,
                                       sample_resized_crop)

    rs = np.random.RandomState(0)
    src = rs.randint(0, 255, (300, 400, 3)).astype(np.uint8)
    path = str(tmp_path / "img.jpg")
    Image.fromarray(src).save(path)

    def oracle_train(res, rng):
        with Image.open(path) as im:
            img = np.asarray(im.convert("RGB"), np.uint8)
        top, left, h, w = sample_resized_crop(img.shape[0], img.shape[1],
                                              rng)
        crop = img[top: top + h, left: left + w]
        out = np.asarray(Image.fromarray(crop).resize(
            (res, res), Image.BICUBIC), np.uint8)
        return out, bool(rng.rand() < 0.5)

    for seed in (1, 2, 3):
        a, fa = load_train_image(path, 224, np.random.RandomState(seed))
        b, fb = oracle_train(224, np.random.RandomState(seed))
        np.testing.assert_array_equal(a, b)
        assert fa == fb

    with Image.open(path) as im:
        full = np.asarray(im.convert("RGB"), np.uint8)
    want = np.asarray(Image.fromarray(full).resize(
        (224, 224), Image.BICUBIC), np.uint8)
    np.testing.assert_array_equal(load_eval_image(path, 224), want)


def test_image_load_fast_decode(tmp_path):
    """fast=True (libjpeg DCT pre-scaling): same shapes/flip stream and
    deterministic, approximately the exact path's pixels on smooth
    content (it is NOT bit-identical by design)."""
    from PIL import Image

    from leccr_tpu.data.images import load_eval_image, load_train_image

    yy, xx = np.mgrid[0:600, 0:800]
    smooth = np.stack([(xx // 4) % 256, (yy // 4) % 256,
                       ((xx + yy) // 8) % 256], -1).astype(np.uint8)
    path = str(tmp_path / "img.jpg")
    Image.fromarray(smooth).save(path, quality=95)

    a, fa = load_train_image(path, 224, np.random.RandomState(5), fast=True)
    b, fb = load_train_image(path, 224, np.random.RandomState(5), fast=True)
    exact, fe = load_train_image(path, 224, np.random.RandomState(5))
    assert a.shape == exact.shape == (224, 224, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)  # deterministic
    assert fa == fb == fe  # the rng flip stream is mode-independent
    diff = np.abs(a.astype(int) - exact.astype(int))
    assert diff.mean() < 16, diff.mean()

    ev = load_eval_image(path, 224, fast=True)
    ee = load_eval_image(path, 224)
    assert ev.shape == ee.shape
    assert np.abs(ev.astype(int) - ee.astype(int)).mean() < 16
