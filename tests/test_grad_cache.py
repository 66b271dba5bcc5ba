"""GradCache (TrainConfig.grad_cache_microbatches): exact large-batch
contrastive gradients in O(batch/m) tower-activation memory.

The reference cannot decouple its negative pool from activation memory at
all (per-GPU batch caps the AllGather pool, SURVEY §2c); GradCache is the
TPU-native answer (trainer._grad_cache_grads, Gao et al. 2101.06983).
"Exact" is the whole contract, so these tests pin it three ways:

- a unit test of the machinery itself against jax.grad of the identical
  composed objective — including per-microbatch dropout masks, which must
  agree between the no-residency forward pass and the vjp re-forward, and
  the temperature cotangent split;
- the real Trainer, one epoch, grad-cache vs monolithic on one device;
- the real Trainer on the 8-device virtual mesh with ring_fused negatives
  (microbatch reshape composing with the data-axis sharding).
"""

import dataclasses
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # epoch-equivalence runs on the virtual mesh

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from leccr_tpu.config import tiny_test_config
from leccr_tpu.models.leccr import TrainEmbeddings
from leccr_tpu.train.trainer import _grad_cache_grads


def _toy_embeddings(params, x, mask):
    """A stand-in tower: every TrainEmbeddings field depends on params, and
    `mask` plays the role of a per-microbatch dropout mask."""
    h = jnp.tanh(x @ params["w1"]) * mask
    e = h @ params["w2"]
    slots = jnp.einsum("be,ne->bne", e, params["q"])
    return TrainEmbeddings(
        image_feat=e,
        text_feat_s=jnp.tanh(e + params["b"]),
        text_feat_t=jnp.tanh(e - params["b"]),
        slots=slots,
        ori_slots=slots[..., :3] * 2.0,
        cv_caption_mean=h[:, :3],
        cv_vision_mean=jnp.flip(h[:, :3], axis=-1),
        temp=jnp.exp(params["logt"]),
    )


def _toy_loss(emb):
    """Nonlinear in every field + the temp, with a cross-example (global
    negative-like) coupling through a softmax over the full batch."""
    sim = emb.image_feat @ emb.text_feat_s.T / emb.temp
    itc = -jnp.mean(jax.nn.log_softmax(sim, axis=-1).diagonal())
    rest = (jnp.mean(emb.text_feat_t ** 2) + jnp.mean(jnp.abs(emb.slots))
            + jnp.mean(emb.ori_slots * emb.cv_caption_mean[:, None, :])
            + jnp.mean(emb.cv_vision_mean ** 3))
    total = itc + rest
    return total, {"total": total, "itc": itc}


def test_grad_cache_unit_exact_with_dropout():
    """_grad_cache_grads == jax.grad of the composed objective, with
    microbatch-keyed dropout masks live (exactness hinges on pass 1 and the
    vjp re-forward sampling identical masks for the same k)."""
    b, d, e, m = 16, 8, 6, 4
    rs = np.random.RandomState(0)
    params = {
        "w1": jnp.asarray(rs.randn(d, d), jnp.float32),
        "w2": jnp.asarray(rs.randn(d, e), jnp.float32),
        "q": jnp.asarray(rs.randn(3, e), jnp.float32),
        "b": jnp.asarray(rs.randn(e), jnp.float32),
        "logt": jnp.asarray(0.3, jnp.float32),
    }
    batch = {"x": jnp.asarray(rs.randn(b, d), jnp.float32)}
    key = jax.random.PRNGKey(7)

    def forward(p, mbatch, fl, k):
        mask = jax.random.bernoulli(
            jax.random.fold_in(key, k), 0.8,
            (mbatch["x"].shape[0], d)).astype(jnp.float32)
        return _toy_embeddings(p, mbatch["x"], mask)

    losses, grads = jax.jit(
        lambda p: _grad_cache_grads(forward, _toy_loss, p, batch, None, m)
    )(params)

    def composed(p):
        embs = [forward(p, {"x": xs}, None, k)
                for k, xs in enumerate(jnp.split(batch["x"], m))]
        names = [f.name for f in dataclasses.fields(TrainEmbeddings)]
        emb = TrainEmbeddings(**{
            n: (getattr(embs[0], n) if n == "temp"
                else jnp.concatenate([getattr(eb, n) for eb in embs]))
            for n in names})
        return _toy_loss(emb)

    (ref_total, ref_losses), ref_grads = jax.value_and_grad(
        composed, has_aux=True)(params)

    np.testing.assert_allclose(losses["total"], ref_losses["total"],
                               rtol=1e-6)
    for name in params:
        np.testing.assert_allclose(
            grads[name], ref_grads[name], rtol=2e-5, atol=1e-6,
            err_msg=f"grad mismatch on {name}")


def _epoch(tmp, gc_m, parallel=None):
    from leccr_tpu.train.trainer import Trainer

    cfg = tiny_test_config()
    cfg.output_dir = str(tmp)
    # zero every stochastic knob so grad-cache (per-microbatch dropout
    # keys) and monolithic (one key) run the same math
    cfg.model.dropout = 0.0
    cfg.model.text.hidden_dropout = 0.0
    cfg.model.text.attention_dropout = 0.0
    cfg.data.num_workers = 0
    cfg.train.batch_size_train = 16
    cfg.train.schedular.epochs = 1
    cfg.train.grad_cache_microbatches = gc_m
    if parallel:
        for k, v in parallel.items():
            setattr(cfg.parallel, k, v)
    trainer = Trainer(cfg, devices=jax.devices()[:8] if parallel
                      else jax.devices()[:1])
    stats = trainer.train_epoch(0)
    lang = list(trainer.test_ds)[0]
    metrics = trainer.evaluate(trainer.test_ds[lang])
    return ({k: float(v) for k, v in stats.items() if k.startswith("loss")},
            {k: float(v) for k, v in metrics.items()})


@pytest.mark.parametrize("parallel", [
    None,
    {"data": 4, "model": 1, "negatives": "ring_fused"},
], ids=["single_device", "mesh_ring_fused"])
def test_grad_cache_epoch_matches_monolithic(parallel, tmp_path_factory):
    """One real epoch through the production Trainer: grad_cache m=4 must
    reproduce the monolithic step's loss trajectory and retrieval ranks
    (same objective, different activation schedule).  The mesh variant
    additionally pins the microbatch reshape composing with data-axis
    sharding and the ring_fused global-negative path."""
    tag = "mesh" if parallel else "single"
    base_stats, base_metrics = _epoch(
        tmp_path_factory.mktemp(f"gc0_{tag}"), 0, parallel)
    gc_stats, gc_metrics = _epoch(
        tmp_path_factory.mktemp(f"gc4_{tag}"), 4, parallel)
    assert gc_stats and all(np.isfinite(v) for v in gc_stats.values())
    for k, v in gc_stats.items():
        np.testing.assert_allclose(
            v, base_stats[k], rtol=2e-3, atol=1e-4,
            err_msg=f"loss {k} diverged under grad_cache ({tag})")
    for k, v in gc_metrics.items():
        np.testing.assert_allclose(
            v, base_metrics[k], rtol=1e-6,
            err_msg=f"metric {k} diverged under grad_cache ({tag})")
