"""Validate the Lk-tiled flash attention kernels on REAL TPU hardware:
forward + grads vs the XLA attention at ViT-L/14@336 shape (577 tokens,
past the single-block VMEM limit), plus a step-time comparison."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")

import jax.numpy as jnp
import numpy as np

from leccr_tpu.ops.flash_attention import fits_vmem, flash_tower_attention


def xla_attention(q, k, v, mask):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / (d ** 0.5)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :].astype(bool),
                      jnp.finfo(jnp.float32).min, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    b, h, l, d = 4, 16, 577, 64  # ViT-L/14 @336
    assert not fits_vmem(h, l, l, d), "should exercise the tiled path"
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, h, l, d), jnp.float32) * 0.3
    k = jnp.asarray(rs.randn(b, h, l, d), jnp.float32) * 0.3
    v = jnp.asarray(rs.randn(b, h, l, d), jnp.float32) * 0.3
    mask = np.zeros((b, l), np.int32)
    mask[0, -33:] = 1
    mask = jnp.asarray(mask)

    out = jax.jit(lambda q, k, v: flash_tower_attention(q, k, v, mask, 0,
                                                        0.0))(q, k, v)
    want = jax.jit(lambda q, k, v: xla_attention(q, k, v, mask))(q, k, v)
    fwd_md = float(jnp.max(jnp.abs(out - want)))
    print("fwd maxdiff:", fwd_md)
    # hardware parity ASSERTS (round-4 chip measurements: f32 fwd
    # <=1.4e-4, grads <=2.2e-5 of scale; thresholds carry ~5-10x headroom
    # so a real accumulation regression fails while fp noise passes)
    assert fwd_md <= 7e-4, f"f32 fwd parity regressed: {fwd_md}"

    def loss_mine(q, k, v):
        o = flash_tower_attention(q, k, v, mask, 0, 0.0)
        return jnp.sum(o * jnp.sin(o))

    def loss_ref(q, k, v):
        o = xla_attention(q, k, v, mask)
        return jnp.sum(o * jnp.sin(o))

    g1 = jax.jit(jax.grad(loss_mine, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, bb, name in zip(g1, g2, "qkv"):
        md = float(jnp.max(jnp.abs(a - bb)))
        scale = float(jnp.max(jnp.abs(bb)))
        print(f"d{name} maxdiff:", md, " scale:", scale)
        assert md <= 2e-4 * max(scale, 1.0), \
            f"f32 d{name} parity regressed: {md} vs scale {scale}"

    # dropout determinism on hardware PRNG
    o1 = jax.jit(lambda q: flash_tower_attention(q, k, v, mask, 7, 0.1))(q)
    o2 = jax.jit(lambda q: flash_tower_attention(q, k, v, mask, 7, 0.1))(q)
    o3 = jax.jit(lambda q: flash_tower_attention(q, k, v, mask, 8, 0.1))(q)
    same = float(jnp.max(jnp.abs(o1 - o2)))
    diff = float(jnp.max(jnp.abs(o1 - o3)))
    print(f"dropout: same-seed maxdiff {same} (want 0), "
          f"diff-seed maxdiff {diff} (want >0)")
    gd = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(flash_tower_attention(q, k, v, mask, 7, 0.1)
                                ** 2), argnums=(0,)))(q, k, v)
    print("dropout grad finite:", bool(jnp.all(jnp.isfinite(gd[0]))))

    # bf16 chunked parity smoke check (bf16 is the production tower dtype
    # and dispatches to the chunked kernel at this shape; exact parity is
    # pinned by the interpret-mode tests)
    from leccr_tpu.ops import flash_attention as fa
    assert fa.fits_chunked(h, l, l, d, 2), "bf16 should dispatch chunked"
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ob = jax.jit(lambda q, k, v: flash_tower_attention(q, k, v, mask, 0,
                                                       0.0))(qb, kb, vb)
    wb = jax.jit(lambda q, k, v: xla_attention(q, k, v, mask))(qb, kb, vb)
    bf_md = float(jnp.max(jnp.abs(ob.astype(jnp.float32) - wb)))
    print("bf16 chunked fwd maxdiff:", bf_md)
    assert bf_md <= 2e-3, f"bf16 chunked fwd parity regressed: {bf_md}"
    gb = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(flash_tower_attention(q, k, v, mask, 0, 0.0)
                                .astype(jnp.float32) ** 2),
        argnums=(0, 1, 2)))(qb, kb, vb)
    print("bf16 chunked grads finite:",
          all(bool(jnp.all(jnp.isfinite(x.astype(jnp.float32))))
              for x in gb))
    # bf16 GRAD parity vs XLA at the 577-token production shape — the
    # direct hardware check of the round-4 chunked-backward f32-dq
    # accumulation fix (the CPU interpret-mode tests run f32 only;
    # VERDICT r4 next #7).  The grads come back as bf16 tensors, so
    # 1 ulp of legitimate rounding is ~2^-8 (4e-3) of each element's
    # magnitude — chip-measured maxdiffs sit exactly there (dq 1.9e-6 on
    # a 3.9e-4-scale grad).  The bug class guarded against (a low-
    # precision dq accumulator across Lk tiles) errs at >=1e-1 of scale,
    # so a 2e-2-of-scale + small-absolute bound separates them cleanly.
    gb_ref = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(xla_attention(q, k, v, mask)
                                .astype(jnp.float32) ** 2),
        argnums=(0, 1, 2)))(qb, kb, vb)
    for a, r_, name in zip(gb, gb_ref, "qkv"):
        af = a.astype(jnp.float32)
        rf = r_.astype(jnp.float32)
        md = float(jnp.max(jnp.abs(af - rf)))
        scale = float(jnp.max(jnp.abs(rf)))
        print(f"bf16 chunked d{name} maxdiff {md:.3e} scale {scale:.3e}")
        assert md <= 2e-2 * scale + 1e-5, \
            f"bf16 d{name} grad parity regressed: {md} vs scale {scale}"

    # timing: chunked vs streamed-tiled vs XLA fwd+bwd at ViT-L blocks
    bt = 32
    qt = jnp.asarray(rs.randn(bt, h, l, d), jnp.bfloat16)
    kt = jnp.asarray(rs.randn(bt, h, l, d), jnp.bfloat16)
    vt = jnp.asarray(rs.randn(bt, h, l, d), jnp.bfloat16)

    def flash_loss(q, k, v):
        o = flash_tower_attention(q, k, v, None, 0, 0.0)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    f_chunked = jax.jit(jax.grad(flash_loss, argnums=(0, 1, 2)))

    def tiled_only(q, k, v):
        saved = fa.fits_chunked
        fa.fits_chunked = lambda *a, **k2: False
        try:
            return jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
        finally:
            fa.fits_chunked = saved

    f_tiled = jax.jit(tiled_only)
    f_xla = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(
            xla_attention(q, k, v, None) ** 2), argnums=(0, 1, 2)))

    for name, f in [("chunked", f_chunked), ("tiled", f_tiled),
                    ("xla", f_xla)]:
        r = f(qt, kt, vt)
        _ = float(jnp.sum(r[0].astype(jnp.float32)))  # barrier
        t0 = time.time()
        n = 10
        for _ in range(n):
            r = f(qt, kt, vt)
        _ = float(jnp.sum(r[0].astype(jnp.float32)))
        print(f"{name}: fwd+bwd {(time.time()-t0)/n*1000:.2f} ms "
              f"(bs{bt}, H{h}, L{l}, D{d})")


if __name__ == "__main__":
    main()
