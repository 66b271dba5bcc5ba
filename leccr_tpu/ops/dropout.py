"""Memory-lean dropout for the tower hot path.

flax nn.Dropout draws a uniform from 32-bit random bits; under jit the
saved-for-backward tensor ends up being those u32 bits (4 B/element), which
at bs>=128 is >1 GB of mask residuals across the text tower and pushes XLA
into whole-block rematerialization (measured: the bs128 step carried
`.remat` re-executions of every MLP fusion).

LeanDropout draws 16-bit bits instead and thresholds them directly: the
largest tensor the backward pass can keep is u16 (or the bool keep-mask),
halving (or quartering) mask residency with a keep-probability quantization
of 1/65536 — numerically indistinguishable from the f32 uniform draw for
any practical rate.

Semantics otherwise match nn.Dropout (inverted scaling by 1/keep, rng from
the "dropout" collection, no-op when deterministic or rate==0).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LeanDropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        if self.rate >= 1.0:
            # degenerate rate: drop everything (nn.Dropout semantics) —
            # the u16 threshold would otherwise wrap 65536 -> 0 and keep all
            return jnp.zeros_like(x)
        keep_prob = 1.0 - self.rate
        rng = self.make_rng("dropout")
        thresh = min(65535, int(round(self.rate * 65536.0)))
        bits = jax.random.bits(rng, x.shape, jnp.uint16)
        keep = bits >= jnp.uint16(thresh)
        scale = jnp.asarray(1.0 / keep_prob, x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))
