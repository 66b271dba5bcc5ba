"""Stage-by-stage eval profiling on the real chip (dev tool)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")

from leccr_tpu.config import LECCRConfig
from leccr_tpu.data.images import normalize_images
from leccr_tpu.eval.retrieval import retrieval_ranks
from leccr_tpu.models.leccr import LECCRModel

IMG_BS, TEXT_BS, W, RES, VOCAB = 50, 256, 200, 384, 119547


def timed(label, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1000:.1f} ms")
    return out, dt


def main(fused: bool):
    cfg = LECCRConfig()
    cfg.model.vision.image_res = RES
    cfg.model.dtype = "bfloat16"
    cfg.model.fused_eval_attention = fused
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    img_batch = {
        "vision": jnp.asarray(rs.rand(IMG_BS, RES, RES, 3), jnp.float32),
        "caption_ids": jnp.asarray(rs.randint(1, VOCAB, (IMG_BS, W))),
        "caption_mask": jnp.ones((IMG_BS, W), jnp.int32),
    }
    txt_ids = jnp.asarray(rs.randint(1, VOCAB, (TEXT_BS, W)))
    txt_mask = jnp.ones((TEXT_BS, W), jnp.int32)
    t0 = time.time()
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                        {**img_batch,
                         "text_ids_s": img_batch["caption_ids"],
                         "text_mask_s": img_batch["caption_mask"],
                         "text_ids_t": img_batch["caption_ids"],
                         "text_mask_t": img_batch["caption_mask"]})["params"]
    print(f"init: {time.time()-t0:.1f}s")

    embed_images = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, method="embed_images"))
    embed_texts = jax.jit(lambda p, i, m: model.apply(
        {"params": p}, i, m, method="embed_texts"))

    t0 = time.time()
    out = jax.block_until_ready(embed_images(params, img_batch))
    print(f"embed_images compile+run (fused={fused}): {time.time()-t0:.1f}s")
    _, ti = timed("embed_images steady", embed_images, params, img_batch)
    t0 = time.time()
    jax.block_until_ready(embed_texts(params, txt_ids, txt_mask))
    print(f"embed_texts compile+run: {time.time()-t0:.1f}s")
    _, tt = timed("embed_texts steady", embed_texts, params, txt_ids,
                  txt_mask)

    n_img, n_txt = 1000, 5000
    imgf = np.asarray(rs.randn(n_img, 256), np.float32)
    txtf = np.asarray(rs.randn(n_txt, 256), np.float32)
    t2i = {t: t % n_img for t in range(n_txt)}
    i2t = {}
    for t, i in t2i.items():
        i2t.setdefault(i, []).append(t)
    t0 = time.time()
    retrieval_ranks(imgf, txtf, t2i, i2t)
    print(f"ranks compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    retrieval_ranks(imgf, txtf, t2i, i2t)
    print(f"ranks steady: {time.time()-t0:.2f}s")

    full = ti * (1000 / IMG_BS) + tt * (5000 / TEXT_BS)
    print(f"extrapolated full eval embed time: {full:.1f}s")


if __name__ == "__main__":
    import sys

    main(fused="--fused" in sys.argv)
