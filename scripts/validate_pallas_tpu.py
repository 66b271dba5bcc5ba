"""Validate the Pallas kernels on REAL TPU hardware against the XLA paths
(CI runs them in interpreter mode only — this is the hardware check)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")

import jax.numpy as jnp
import numpy as np

from leccr_tpu.models.losses import soft_label_contrastive_loss
from leccr_tpu.ops.attention import dot_product_attention
from leccr_tpu.ops.infonce import infonce_loss, infonce_stats
from leccr_tpu.ops.pallas_attention import fused_cross_attention


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rs = np.random.RandomState(0)

    # ---- fused InfoNCE stats kernel ----------------------------------
    m, e = 1024, 256
    q = rs.randn(m, e).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    k = rs.randn(m, e).astype(np.float32)
    k /= np.linalg.norm(k, axis=-1, keepdims=True)
    idx = rs.randint(0, m // 2, m).astype(np.int32)

    lse_p, ps_p, pc_p = infonce_stats(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(idx), jnp.asarray(idx),
        1.0 / 0.07, impl="pallas")
    lse_x, ps_x, pc_x = infonce_stats(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(idx), jnp.asarray(idx),
        1.0 / 0.07, impl="xla")
    print("lse  maxdiff:", float(jnp.max(jnp.abs(lse_p - lse_x))))
    print("ps   maxdiff:", float(jnp.max(jnp.abs(ps_p - ps_x))))
    print("pc   maxdiff:", float(jnp.max(jnp.abs(pc_p - pc_x))))

    loss_p = infonce_loss(jnp.asarray(q), jnp.asarray(k), jnp.float32(0.07),
                          jnp.asarray(idx), impl="pallas")
    loss_d = soft_label_contrastive_loss(
        jnp.asarray(q), jnp.asarray(k), jnp.float32(0.07), jnp.asarray(idx))
    print("loss pallas vs dense:", float(loss_p), float(loss_d))

    # timing: fused kernel vs dense at 8k rows
    import time

    m2 = 8192
    q2 = jnp.asarray(rs.randn(m2, e).astype(np.float32))
    k2 = jnp.asarray(rs.randn(m2, e).astype(np.float32))
    idx2 = jnp.asarray(np.arange(m2, dtype=np.int32))
    f_pallas = jax.jit(lambda a, b: infonce_loss(
        a, b, jnp.float32(0.07), idx2, impl="pallas"))
    f_dense = jax.jit(lambda a, b: soft_label_contrastive_loss(
        a, b, jnp.float32(0.07), idx2))
    _ = float(f_pallas(q2, k2)); _ = float(f_dense(q2, k2))
    for name, f in (("pallas", f_pallas), ("dense", f_dense)):
        t0 = time.time()
        for _ in range(5):
            v = float(f(q2, k2))
        print(f"infonce {name} @8k: {(time.time()-t0)/5*1000:.1f} ms "
              f"(loss {v:.4f})")

    # ---- fused cross-attention kernel ---------------------------------
    b, h, lq, lk, dh = 64, 8, 4, 200, 64
    q3 = jnp.asarray(rs.randn(b, h, lq, dh).astype(np.float32))
    k3 = jnp.asarray(rs.randn(b, h, lk, dh).astype(np.float32))
    v3 = jnp.asarray(rs.randn(b, h, lk, dh).astype(np.float32))
    pad = np.zeros((b, lk), bool)
    pad[:, 150:] = True
    want = dot_product_attention(q3, k3, v3, key_padding_mask=jnp.asarray(pad))
    got = fused_cross_attention(q3, k3, v3, jnp.asarray(pad))
    print("fused-attn maxdiff:",
          float(jnp.max(jnp.abs(got.astype(jnp.float32) - want))))

    f_fused = jax.jit(lambda a, b_, c: fused_cross_attention(
        a, b_, c, jnp.asarray(pad)))
    f_xla = jax.jit(lambda a, b_, c: dot_product_attention(
        a, b_, c, key_padding_mask=jnp.asarray(pad)))
    _ = np.asarray(f_fused(q3, k3, v3)); _ = np.asarray(f_xla(q3, k3, v3))
    for name, f in (("fused", f_fused), ("xla", f_xla)):
        t0 = time.time()
        for _ in range(10):
            r = f(q3, k3, v3)
        _ = np.asarray(r)
        print(f"cross-attn {name}: {(time.time()-t0)/10*1000:.2f} ms")
    print("OK")


if __name__ == "__main__":
    main()


def backward_check():
    import time

    import numpy as np

    rs = np.random.RandomState(1)
    m, e = 2048, 256
    q = jnp.asarray(rs.randn(m, e).astype(np.float32))
    k = jnp.asarray(rs.randn(m, e).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, m // 2, m).astype(np.int32))
    temp = jnp.float32(0.07)

    g_pallas = jax.jit(jax.grad(lambda a, b: infonce_loss(
        a, b, temp, idx, impl="pallas"), argnums=(0, 1)))
    g_dense = jax.jit(jax.grad(lambda a, b: soft_label_contrastive_loss(
        a, b, temp, idx), argnums=(0, 1)))
    gp = g_pallas(q, k)
    gd = g_dense(q, k)
    print("bwd dq maxdiff:", float(jnp.max(jnp.abs(gp[0] - gd[0]))))
    print("bwd dk maxdiff:", float(jnp.max(jnp.abs(gp[1] - gd[1]))))
    for name, f in (("pallas", g_pallas), ("dense", g_dense)):
        t0 = time.time()
        for _ in range(5):
            r = f(q, k)
        _ = np.asarray(r[0])
        print(f"fwd+bwd {name} @2k: {(time.time()-t0)/5*1000:.1f} ms")


if __name__ == "__main__" and "--bwd" in sys.argv:
    backward_check()


def ring_fused_check():
    """ring_fused on a 1-device mesh: the ppermute ring degenerates but the
    Pallas stats/backward kernels run on hardware through the hand-written
    ring VJP — loss and (dq, dk, d_temp) must match the dense loss."""
    import numpy as np
    from jax.sharding import Mesh

    from leccr_tpu.parallel.ring import ring_infonce

    rs = np.random.RandomState(3)
    m, e = 1024, 256
    q = jnp.asarray(rs.randn(m, e).astype(np.float32))
    k = jnp.asarray(rs.randn(m, e).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, m // 2, m).astype(np.int32))
    temp = jnp.float32(0.07)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))

    want = soft_label_contrastive_loss(q, k, temp, idx)
    got = ring_infonce(mesh, q, k, temp, idx, impl="fused")
    print("ring_fused loss:", float(got), "dense:", float(want))
    assert abs(float(got) - float(want)) < 1e-4 * abs(float(want))

    gw = jax.grad(lambda a, b, t: soft_label_contrastive_loss(a, b, t, idx),
                  argnums=(0, 1, 2))(q, k, temp)
    gg = jax.grad(lambda a, b, t: ring_infonce(mesh, a, b, t, idx,
                                               impl="fused"),
                  argnums=(0, 1, 2))(q, k, temp)
    diffs = []
    for name, w, g in zip(("dq", "dk", "dtemp"), gw, gg):
        diff = float(jnp.max(jnp.abs(jnp.asarray(g) - jnp.asarray(w))))
        scale = max(1.0, float(jnp.max(jnp.abs(jnp.asarray(w)))))
        print(f"ring_fused {name} maxdiff: {diff:.3e} (scale {scale:.3e})",
              flush=True)
        diffs.append((name, diff, scale))
    for name, diff, scale in diffs:
        assert diff < 5e-4 * scale, (name, diff, scale)  # MXU f32 rounding
    print("ring_fused OK")


if __name__ == "__main__" and "--ring" in sys.argv:
    ring_fused_check()
