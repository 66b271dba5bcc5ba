"""Datasets in the reference on-disk layout (image + video retrieval).

Capability parity with reference dataset/retrieval_dataset.py (image,
#10 in SURVEY.md §2) and dataset/retrieval_dataset_video.py (#11):

- train caption files: first file = source language (`imgid#enc#n cap`),
  later files = machine-translated targets (`imgid#enc2fr#n cap`);
- `img_id/{train,val,test}_id.txt` enumerate image ids; a sample's `idx` is
  its position in train_id.txt (duplicate-caption soft labels key off it);
- per-image MLLM captions live in `<generated_caption_dir>/<id>.txt`
  (or `.npy` 768-d feature files when generated_caption_type == 'feats');
- mscoco id→filename indirection via `img_id/image_ids.txt`;
- video: BigFile feature bank + `video2frames.txt`.

Redesigned (SURVEY.md §7 fidelity footnotes): the reference's cumulative
`cap_id.replace('#enc#', ...)` mutation inside the language loop
(retrieval_dataset.py:130-134) is replaced by deriving each language's cap_id
from the original — same result for its 2-file configs, robust for more.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from leccr_tpu.config import DataConfig
from leccr_tpu.data import images as I
from leccr_tpu.data.feature_bank import FeatureBank, read_video2frames
from leccr_tpu.data.text import (
    EvalIndex,
    build_eval_index,
    language_of_train_file,
    normalize_caption,
    parse_caption_file,
    read_generated_captions,
    read_id_file,
    read_image_name_map,
    video_id_of,
)


def _load_caption_feats(caption_dir: str, image_ids: Sequence[str]
                        ) -> Dict[str, np.ndarray]:
    """generated_caption_type == 'feats': per-image .npy, reshaped to
    [-1, 768] (reference retrieval_dataset.py:67-69)."""
    out = {}
    for image_id in image_ids:
        arr = np.load(os.path.join(caption_dir, f"{image_id}.npy"),
                      allow_pickle=True)
        out[image_id] = np.asarray(arr, np.float32).reshape(-1, 768)
    return out


@dataclasses.dataclass
class TrainSample:
    image_u8: Optional[np.ndarray]  # [H, W, 3] or None (video)
    flip: bool
    frames: Optional[np.ndarray]  # [T, D] or None (image)
    frame_mask: Optional[np.ndarray]
    texts: List[str]  # [source, target, ...] normalized
    caption: str | np.ndarray  # MLLM caption text (or feats)
    idx: int
    cap_id: str


class ImageTrainDataset:
    """reference re_train_dataset_caption (retrieval_dataset.py:30-135)."""

    def __init__(self, cfg: DataConfig, image_res: int):
        self.cfg = cfg
        self.image_res = image_res
        root = cfg.root_dir

        self.name_map = None
        if cfg.dataset == "mscoco":
            self.name_map = read_image_name_map(
                os.path.join(root, "img_id", "image_ids.txt"))

        train_ids = read_id_file(os.path.join(root, "img_id", "train_id.txt"))
        self.img_ids = {img: i for i, img in enumerate(train_ids)}

        if cfg.generated_caption_type == "feats":
            self.generated = _load_caption_feats(
                cfg.generated_caption_dir, train_ids)
        else:
            self.generated = read_generated_captions(
                cfg.generated_caption_dir, train_ids, self.name_map)

        self.languages: List[str] = []
        self.caption_maps: List[Dict[str, str]] = []
        self.cap_ids: List[str] = []
        for i, rel in enumerate(cfg.train_file):
            if i != 0:
                self.languages.append(language_of_train_file(rel))
            entries = parse_caption_file(os.path.join(root, rel))
            self.caption_maps.append(dict(entries))
            if i == 0:
                self.cap_ids = [cid for cid, _ in entries]

    def __len__(self) -> int:
        return len(self.cap_ids)

    def image_path(self, image_id: str) -> str:
        if self.cfg.dataset == "mscoco":
            return os.path.join(self.cfg.image_root, self.name_map[image_id])
        return os.path.join(self.cfg.image_root, f"{image_id}.jpg")

    def get(self, index: int, rng: np.random.RandomState) -> TrainSample:
        cap_id = self.cap_ids[index]
        image_id = video_id_of(cap_id)
        img, flip = I.load_train_image(
            self.image_path(image_id), self.image_res, rng,
            fast=self.cfg.fast_decode)
        texts = []
        for k, cmap in enumerate(self.caption_maps):
            key = cap_id if k == 0 else cap_id.replace(
                "#enc#", f"#enc2{self.languages[k - 1]}#")
            texts.append(normalize_caption(cmap[key], self.cfg.max_words))
        return TrainSample(
            image_u8=img, flip=flip, frames=None, frame_mask=None,
            texts=texts, caption=self.generated[image_id],
            idx=self.img_ids[image_id], cap_id=cap_id)


class ImageEvalDataset:
    """reference re_eval_dataset_caption (retrieval_dataset.py:140-264)."""

    def __init__(self, cfg: DataConfig, ann_file: str, image_res: int,
                 split: str = "eval"):
        self.cfg = cfg
        self.image_res = image_res
        self.text_trans: List[str] = []
        if split == "test" and cfg.test_trans_file:
            # translated test texts (reference retrieval_dataset.py:228-233;
            # parsed and stored, reference never consumes them either)
            self.text_trans = [
                normalize_caption(c, cfg.max_words) for _, c in
                parse_caption_file(os.path.join(cfg.root_dir,
                                                cfg.test_trans_file))]
        root = cfg.root_dir
        self.name_map = None
        if cfg.dataset == "mscoco":
            self.name_map = read_image_name_map(
                os.path.join(root, "img_id", "image_ids.txt"))
            lang = Path(ann_file).name.split(".")[0].split("_")[-1]
            id_name = (f"{lang}_val_id.txt" if split == "eval"
                       else f"{lang}_test_id.txt")
        else:
            id_name = "val_id.txt" if split == "eval" else "test_id_2016.txt"

        self.index: EvalIndex = build_eval_index(
            parse_caption_file(os.path.join(root, ann_file)), cfg.max_words)

        split_ids = read_id_file(os.path.join(root, "img_id", id_name))
        if cfg.generated_caption_type == "feats":
            self.generated = _load_caption_feats(
                cfg.generated_caption_dir, split_ids)
        else:
            self.generated = read_generated_captions(
                cfg.generated_caption_dir, split_ids, self.name_map)

    @property
    def texts(self) -> List[str]:
        return self.index.texts

    def __len__(self) -> int:
        return len(self.index.image_ids)

    def image_path(self, image_id: str) -> str:
        if self.cfg.dataset == "mscoco":
            return os.path.join(self.cfg.image_root, self.name_map[image_id])
        return os.path.join(self.cfg.image_root, f"{image_id}.jpg")

    def get(self, index: int):
        image_id = self.index.image_ids[index]
        img = I.load_eval_image(self.image_path(image_id), self.image_res,
                                fast=self.cfg.fast_decode)
        return img, self.generated[image_id], index


class VideoTrainDataset:
    """reference video_train_dataset_caption
    (retrieval_dataset_video.py:71-159)."""

    def __init__(self, cfg: DataConfig, max_frames: int = 32):
        self.cfg = cfg
        self.max_frames = max_frames
        root = cfg.root_dir
        feat_dir = os.path.join(root, "FeatureData", cfg.image_root)
        self.bank = FeatureBank(feat_dir)
        self.video2frames = read_video2frames(
            os.path.join(feat_dir, "video2frames.txt"))

        train_ids = read_id_file(
            os.path.join(root, "video_id", "train_id.txt"))
        self.img_ids = {vid: i for i, vid in enumerate(train_ids)}
        if cfg.generated_caption_type == "feats":
            self.generated = _load_caption_feats(
                cfg.generated_caption_dir, train_ids)
        else:
            self.generated = read_generated_captions(
                cfg.generated_caption_dir, train_ids)

        self.languages = []
        self.caption_maps = []
        self.cap_ids = []
        for i, rel in enumerate(cfg.train_file):
            if i != 0:
                self.languages.append(language_of_train_file(rel))
            entries = parse_caption_file(os.path.join(root, rel))
            self.caption_maps.append(dict(entries))
            if i == 0:
                self.cap_ids = [cid for cid, _ in entries]

    def __len__(self) -> int:
        return len(self.cap_ids)

    def get(self, index: int, rng: np.random.RandomState) -> TrainSample:
        cap_id = self.cap_ids[index]
        video_id = video_id_of(cap_id)
        frames, mask = self.bank.read_video(
            self.video2frames[video_id], self.max_frames)
        texts = []
        for k, cmap in enumerate(self.caption_maps):
            key = cap_id if k == 0 else cap_id.replace(
                "#enc#", f"#enc2{self.languages[k - 1]}#")
            texts.append(normalize_caption(cmap[key], self.cfg.max_words))
        return TrainSample(
            image_u8=None, flip=False, frames=frames, frame_mask=mask,
            texts=texts, caption=self.generated[video_id],
            idx=self.img_ids[video_id], cap_id=cap_id)


class VideoEvalDataset:
    """reference video_eval_dataset_caption
    (retrieval_dataset_video.py:164-244)."""

    def __init__(self, cfg: DataConfig, ann_file: str, max_frames: int = 32,
                 split: str = "eval"):
        self.cfg = cfg
        self.max_frames = max_frames
        root = cfg.root_dir
        feat_dir = os.path.join(root, "FeatureData", cfg.image_root)
        self.bank = FeatureBank(feat_dir)
        self.video2frames = read_video2frames(
            os.path.join(feat_dir, "video2frames.txt"))

        id_name = "val_id.txt" if split == "eval" else "test_id.txt"
        split_ids = read_id_file(os.path.join(root, "video_id", id_name))
        if cfg.generated_caption_type == "feats":
            self.generated = _load_caption_feats(
                cfg.generated_caption_dir, split_ids)
        else:
            self.generated = read_generated_captions(
                cfg.generated_caption_dir, split_ids)

        self.index: EvalIndex = build_eval_index(
            parse_caption_file(os.path.join(root, ann_file)), cfg.max_words)

    @property
    def texts(self) -> List[str]:
        return self.index.texts

    def __len__(self) -> int:
        return len(self.index.image_ids)

    def get(self, index: int):
        video_id = self.index.image_ids[index]
        frames, mask = self.bank.read_video(
            self.video2frames[video_id], self.max_frames)
        return (frames, mask), self.generated[video_id], index
