"""LR schedule: linear warmup → linear decay to 0, stepped per optimizer step.

Capability parity with reference scheduler.py:4-28 (the only schedule the
reference implements); warmup given as an int step count or a float fraction
of total steps (scheduler.py:9-11)."""

from __future__ import annotations

import optax


def resolve_warmup(num_warmup_steps: float | int, total_steps: int) -> int:
    if isinstance(num_warmup_steps, float):
        assert 0.0 <= num_warmup_steps < 1.0
        return int(total_steps * num_warmup_steps)
    return int(num_warmup_steps)


def linear_warmup_decay(
    lr: float, total_steps: int, num_warmup_steps: float | int
) -> optax.Schedule:
    warmup = resolve_warmup(num_warmup_steps, total_steps)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup)
        decay = (total_steps - step) / jnp.maximum(1.0, total_steps - warmup)
        return lr * jnp.clip(jnp.where(step < warmup, warm, decay), 0.0, 1.0)

    return schedule
