"""Stepwise tiled-kernel bring-up on the chip: tiny multi-tile shapes,
unbuffered, one stage at a time to isolate compile hangs."""
import faulthandler
import sys
import time
from pathlib import Path

faulthandler.dump_traceback_later(420, repeat=True)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")

import jax.numpy as jnp
import numpy as np

from leccr_tpu.ops.flash_attention import (_partitioned_tiled_fwd,
                                           _tiled_fwd_pallas,
                                           flash_tower_attention)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu"
    b, h, l, d = 2, 4, 256, 64  # 2x2 tiles, small
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, h, l, d), jnp.float32) * 0.3
    k = jnp.asarray(rs.randn(b, h, l, d), jnp.float32) * 0.3
    v = jnp.asarray(rs.randn(b, h, l, d), jnp.float32) * 0.3
    mask3 = jnp.zeros((b, 1, l), jnp.int32)
    seed = jnp.zeros((b,), jnp.int32)

    log("stage 1: raw _tiled_fwd_pallas (no partitioning wrapper)")
    out, lse = jax.jit(
        lambda s, a, bb, c, m: _tiled_fwd_pallas(s, a, bb, c, m, 0.0, False)
    )(seed, q, k, v, mask3)
    out.block_until_ready()
    log(f"stage 1 OK: out {out.shape}, lse {lse.shape}")

    @jax.jit
    def ref_and_diff(q, k, v, out):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d ** 0.5)
        want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
        return jnp.max(jnp.abs(out - want)), want

    diff, want = ref_and_diff(q, k, v, out)
    log(f"stage 1 maxdiff: {float(diff)}")

    log("stage 2: custom_partitioning wrapper")
    out2, _ = jax.jit(
        lambda s, a, bb, c, m: _partitioned_tiled_fwd(0.0, False)(
            s, a, bb, c, m))(seed, q, k, v, mask3)
    out2.block_until_ready()
    log(f"stage 2 OK maxdiff: "
        f"{float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(out2, want))}")

    log("stage 3: full flash_tower_attention dispatch (forced tiled)")
    import leccr_tpu.ops.flash_attention as fa

    orig = fa.fits_vmem
    fa.fits_vmem = lambda *a: False
    try:
        out3 = jax.jit(lambda a, bb, c: flash_tower_attention(
            a, bb, c, None, 0, 0.0))(q, k, v)
        out3.block_until_ready()
        log(f"stage 3 OK maxdiff: "
            f"{float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(out3, want))}")
        log("stage 4: grads")
        g = jax.jit(jax.grad(lambda a, bb, c: jnp.sum(
            flash_tower_attention(a, bb, c, None, 0, 0.0) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        g[0].block_until_ready()
        log("stage 4 OK: grads finite="
            f"{bool(jax.jit(lambda x: jnp.all(jnp.isfinite(x)))(g[0]))}")
        log("stage 5: dropout fwd+grad")
        g2 = jax.jit(jax.grad(lambda a: jnp.sum(flash_tower_attention(
            a, k, v, None, 7, 0.1) ** 2)))(q)
        g2.block_until_ready()
        log("stage 5 OK")
    finally:
        fa.fits_vmem = orig


if __name__ == "__main__":
    main()
