"""Microbenchmark: can folding the head-split transposes into the q/k/v
and out projections (einsum 'ble,ehd->bhld' / 'bhld,hde->ble') kill the
measured 25-36 ms/step of HBM copies around the flash-attention custom
call at the flagship shape?

Round-2 note this does NOT contradict: the rejected "einsums without
explicit head transposes" experiment ran against the XLA attention, where
removing the transposes let XLA pick worse layouts for the attention
einsums themselves.  Here the pallas custom call PINS the attention
operand layout to [B,H,L,D] {3,2,1,0}; the only question is whether the
projection matmuls can write/read that layout directly.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")

import jax.numpy as jnp
import numpy as np

from leccr_tpu.ops.flash_attention import flash_tower_attention

B, L, E, H = 128, 145, 768, 12   # flagship vision tower block shape
D = E // H
DT = jnp.bfloat16
N_LAYERS = 12   # amortize like a real tower


def make_params(rs):
    p = {}
    for i in range(N_LAYERS):
        for nm in ("q", "k", "v", "o"):
            p[f"{i}.{nm}.w"] = jnp.asarray(
                rs.randn(E, E) / np.sqrt(E), DT)
            p[f"{i}.{nm}.b"] = jnp.zeros((E,), DT)
    return p


def block_transpose(p, i, x, seed):
    def proj(nm):
        y = x @ p[f"{i}.{nm}.w"] + p[f"{i}.{nm}.b"]
        return y.reshape(B, L, H, D).transpose(0, 2, 1, 3)

    out = flash_tower_attention(proj("q"), proj("k"), proj("v"), None,
                                seed + i, 0.1)
    out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
    return x + out @ p[f"{i}.o.w"] + p[f"{i}.o.b"]


def block_folded(p, i, x, seed):
    def proj(nm):
        w = p[f"{i}.{nm}.w"].reshape(E, H, D)
        b = p[f"{i}.{nm}.b"].reshape(H, D)
        return (jnp.einsum("ble,ehd->bhld", x, w)
                + b[None, :, None, :]).astype(DT)

    out = flash_tower_attention(proj("q"), proj("k"), proj("v"), None,
                                seed + i, 0.1)
    wo = p[f"{i}.o.w"].reshape(H, D, E)
    return x + (jnp.einsum("bhld,hde->ble", out, wo).astype(DT)
                + p[f"{i}.o.b"])


def tower_loss(block):
    def loss(p, x, seed):
        for i in range(N_LAYERS):
            x = block(p, i, x, seed)
        return jnp.sum(x.astype(jnp.float32) ** 2)

    return jax.jit(jax.grad(loss))


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rs = np.random.RandomState(0)
    params = make_params(rs)
    x = jnp.asarray(rs.randn(B, L, E) * 0.1, DT)

    for name, block in [("transpose", block_transpose),
                        ("folded", block_folded)]:
        f = tower_loss(block)
        g = f(params, x, 0)
        _ = float(jnp.sum(g["0.q.w"].astype(jnp.float32)))  # barrier
        t0 = time.time()
        n = 10
        for it in range(n):
            g = f(params, x, it)
        _ = float(jnp.sum(g["0.q.w"].astype(jnp.float32)))
        dt = (time.time() - t0) / n * 1000
        print(f"{name}: fwd+bwd {dt:.2f} ms "
              f"({N_LAYERS} layers, bs{B} L{L} E{E} H{H})")


if __name__ == "__main__":
    main()
