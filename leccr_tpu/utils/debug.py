"""Numerical-safety hooks.

The reference has no sanitizers beyond a single NaN probe in the video eval
(video_…py:167; SURVEY.md §5 'race detection / sanitizers: none').  Here:
- `enable_nan_checks()` flips jax_debug_nans so any NaN-producing op under
  jit raises at the op (the XLA equivalent of torch.autograd.detect_anomaly);
- `assert_all_finite(tree)` is a cheap post-step guard over a pytree
  (losses / grads) usable in production loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def assert_all_finite(tree, name: str = "tree") -> None:
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:8]}")
