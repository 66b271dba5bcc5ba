"""End-to-end Trainer validation on the real chip: flagship towers
(ViT-B/32 @ 384² + mBERT-base) on a synthetic dataset, 2 epochs + eval."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from leccr_tpu.config import LECCRConfig  # noqa: E402
from leccr_tpu.train.trainer import Trainer  # noqa: E402


def main():
    cfg = LECCRConfig()
    cfg.output_dir = "/tmp/leccr_tpu_train_check"
    cfg.model.vision.image_res = 384
    cfg.model.dtype = "bfloat16"
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_size = 32
    cfg.data.synthetic_eval_images = 8
    cfg.data.synthetic_captions_per_image = 2
    cfg.data.max_tokens = 48
    cfg.data.token_buckets = [32]
    cfg.train.batch_size_train = 16
    cfg.train.batch_size_test = 8
    cfg.train.batch_size_test_text = 16
    cfg.train.schedular.epochs = 2
    cfg.train.optimizer.lr = 1e-4
    cfg.parallel.data = 1

    t0 = time.time()
    tr = Trainer(cfg)
    print(f"trainer built in {time.time()-t0:.1f}s; device "
          f"{jax.devices()[0]}")
    stats = tr.fit()
    print("final epoch stats:", {k: v for k, v in stats.items()
                                 if "sumr" in k or "r1" in k})
    print(f"total {time.time()-t0:.1f}s OK")


if __name__ == "__main__":
    main()


def video():
    """vtr_caption on chip: temporal tower + double-sim eval."""
    import tempfile

    from leccr_tpu.data.synthetic import make_video_dataset

    tmp = tempfile.mkdtemp(prefix="leccr_video_")
    data_cfg = make_video_dataset(tmp, n_train=16, n_eval=6,
                                  feat_dim=4096, frames_per_video=8)
    cfg = LECCRConfig()
    cfg.output_dir = tmp + "/out"
    cfg.model.vision.kind = "temporal"
    cfg.model.vision.frame_feat_dim = 4096
    cfg.model.vision.num_layers = 1
    cfg.model.vision.max_frames = 8
    cfg.model.num_queries = 2
    cfg.model.dtype = "bfloat16"
    cfg.data = data_cfg
    cfg.data.max_tokens = 48
    cfg.data.token_buckets = [32]
    cfg.train.batch_size_train = 16
    cfg.train.batch_size_test = 8
    cfg.train.batch_size_test_text = 16
    cfg.train.schedular.epochs = 1
    cfg.parallel.data = 1
    t0 = time.time()
    tr = Trainer(cfg)
    stats = tr.fit()
    print("video stats:", {k: v for k, v in stats.items() if "sumr" in k})
    print(f"video total {time.time()-t0:.1f}s OK")


if __name__ == "__main__" and "--video" in sys.argv:
    video()
