"""Optimizer factory: AdamW with the reference's parameter-group policy.

Capability parity with reference optim.py:8-65:
- AdamW, betas (0.9, 0.98), eps 1e-8 (optim.py:63);
- no weight decay for biases and all LayerNorm params (optim.py:21-30) — in
  flax terms: leaves named `bias` or `scale`;
- an `init_params` group at lr × lr_mult.  NOTE: the reference's live model
  RESETS init_params to [] after construction
  (model_retrieval_caption.py:14), so the lr_mult group is empty in practice;
  we expose `lr_mult_paths` (regex list, default empty = live reference
  behavior) to make the capability real;
- frozen parameters (`caption_encoder*`, optim.py:49-50).  With the shared
  mbert caption encoder this freezes nothing (torch dedups shared modules in
  named_parameters); gradient isolation instead comes from stop_gradient in
  the model.  `frozen_paths` is provided for genuinely separate caption
  encoders (the 'clip' option), whose grads are structurally zero anyway.

Weight-decay semantics match torch/transformers AdamW: decay is multiplied
by the current learning rate (optax.adamw does the same).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Sequence

import jax
import optax

from leccr_tpu.config import OptimConfig


def _path_str(kp) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "name", k))) for k in kp)


def classify_params(
    params: Any,
    lr_mult_paths: Sequence[str] = (),
    frozen_paths: Sequence[str] = (),
) -> Any:
    """Label tree: 'frozen' | '{base,mult}_{decay,no_decay}'."""
    mult_re = [re.compile(p) for p in lr_mult_paths]
    frozen_re = [re.compile(p) for p in frozen_paths]

    def label(kp, leaf):
        path = _path_str(kp)
        if any(r.search(path) for r in frozen_re):
            return "frozen"
        name = path.rsplit("/", 1)[-1]
        no_decay = name in ("bias", "scale")
        mult = any(r.search(path) for r in mult_re)
        return (("mult" if mult else "base")
                + ("_no_decay" if no_decay else "_decay"))

    return jax.tree_util.tree_map_with_path(label, params)


def _legacy_adamw(
    lr_fn: Callable, b1: float, b2: float, eps: float, wd: float,
    moment_dtype: Any = None,
) -> optax.GradientTransformation:
    """AdamW with the historical transformers(<4.46) update rule — the
    optimizer the reference actually runs (requirements.txt pins
    transformers 4.12; optim.py:63): eps is added to the UNCORRECTED
    sqrt(v) and the bias correction scales the step size.  Decoupled weight
    decay at rate lr*wd (the historical impl decays the post-update params;
    doing it on pre-update params differs only at O(lr^2*wd)).

    ``moment_dtype`` (e.g. jnp.bfloat16) stores mu AND nu at reduced width;
    the moment math and the step itself stay f32 (f32 master params).  With
    b2=0.98 the per-step nu increment is ~nu/50, well above bf16's ~nu/256
    rounding floor, so the second moment keeps tracking."""
    import jax.numpy as jnp

    def store(x):
        return x if moment_dtype is None else x.astype(moment_dtype)

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(lambda p: jnp.zeros_like(
                p, dtype=moment_dtype or p.dtype), params),
            nu=jax.tree.map(lambda p: jnp.zeros_like(
                p, dtype=moment_dtype or p.dtype), params))

    def update(grads, state, params):
        lr = lr_fn(state.count)
        count = state.count + 1
        mu = jax.tree.map(
            lambda m, g: b1 * m.astype(g.dtype) + (1 - b1) * g,
            state.mu, grads)
        nu = jax.tree.map(
            lambda v, g: b2 * v.astype(g.dtype) + (1 - b2) * g * g,
            state.nu, grads)
        c = count.astype(jnp.float32)
        bias = jnp.sqrt(1.0 - b2 ** c) / (1.0 - b1 ** c)
        updates = jax.tree.map(
            lambda m, v, p: -lr * (bias * m / (jnp.sqrt(v) + eps) + wd * p),
            mu, nu, params)
        return updates, optax.ScaleByAdamState(
            count=count, mu=jax.tree.map(store, mu),
            nu=jax.tree.map(store, nu))

    return optax.GradientTransformation(init, update)


def build_optimizer(
    cfg: OptimConfig,
    params: Any,
    schedule: Callable,
    lr_mult_paths: Sequence[str] = (),
    frozen_paths: Sequence[str] = (),
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    import jax.numpy as jnp

    labels = classify_params(params, lr_mult_paths, frozen_paths)
    moment_dtype = (None if cfg.moment_dtype in ("float32", "", None)
                    else jnp.dtype(cfg.moment_dtype))

    def adamw(mult: float, wd: float):
        if cfg.legacy_eps:
            return _legacy_adamw(
                lambda s: schedule(s) * mult,
                cfg.betas[0], cfg.betas[1], cfg.eps, wd,
                moment_dtype=moment_dtype)
        # optax adamw exposes mu_dtype only; nu stays f32 on this path
        return optax.adamw(
            learning_rate=lambda s: schedule(s) * mult,
            b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
            weight_decay=wd, mu_dtype=moment_dtype)

    transforms: Dict[str, optax.GradientTransformation] = {
        "base_decay": adamw(1.0, cfg.weight_decay),
        "base_no_decay": adamw(1.0, 0.0),
        "mult_decay": adamw(cfg.lr_mult, cfg.weight_decay),
        "mult_no_decay": adamw(cfg.lr_mult, 0.0),
        "frozen": optax.set_to_zero(),
    }
    tx = optax.multi_transform(transforms, labels)
    if grad_clip > 0.0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
