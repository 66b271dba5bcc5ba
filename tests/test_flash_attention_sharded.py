"""flash_tower_attention under a multi-device mesh (8 virtual CPU devices):
the pallas custom call must stay CORRECT when its operands carry a
batch NamedSharding (GSPMD may replicate the call — fine for correctness;
docs/DESIGN.md records the partitioning caveat)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from leccr_tpu.ops.flash_attention import flash_tower_attention

B, H, L, D = 8, 2, 16, 8


def test_batch_sharded_inputs_match_single_device():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should force 8 virtual cpu devices"
    mesh = Mesh(np.array(devs[:8]), ("data",))

    rs = np.random.RandomState(0)
    q = rs.randn(B, H, L, D).astype(np.float32)
    k = rs.randn(B, H, L, D).astype(np.float32)
    v = rs.randn(B, H, L, D).astype(np.float32)
    mask = np.zeros((B, L), np.int32)
    mask[:, -3:] = 1

    want = np.asarray(flash_tower_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        0, 0.0, True))

    sh4 = NamedSharding(mesh, P("data", None, None, None))
    sh2 = NamedSharding(mesh, P("data", None))
    qd = jax.device_put(q, sh4)
    kd = jax.device_put(k, sh4)
    vd = jax.device_put(v, sh4)
    md = jax.device_put(mask, sh2)

    f = jax.jit(
        lambda a, b, c, m: flash_tower_attention(a, b, c, m, 0, 0.0, True))
    out = f(qd, kd, vd, md)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)

    # the custom_partitioning rule must shard the kernel over the batch
    # axis — no all-gathers/replication around the pallas call
    hlo = f.lower(qd, kd, vd, md).compile().as_text()
    assert "all-gather" not in hlo, "kernel got replicated under the mesh"


def test_long_seq_families_sharded_match_single_device(monkeypatch):
    """The chunked and streamed-tiled dispatches carry the same
    custom_partitioning rule; pin value parity under a batch-sharded mesh
    for both (monkeypatched guards force each family at test shapes)."""
    from leccr_tpu.ops import flash_attention as fa

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), ("data",))
    rs = np.random.RandomState(2)
    q = rs.randn(B, H, L, D).astype(np.float32)
    k = rs.randn(B, H, L, D).astype(np.float32)
    v = rs.randn(B, H, L, D).astype(np.float32)
    mask = np.zeros((B, L), np.int32)
    mask[:, -3:] = 1
    sh4 = NamedSharding(mesh, P("data"))
    sh2 = NamedSharding(mesh, P("data", None))

    for family in ("chunked", "tiled"):
        monkeypatch.setattr(fa, "fits_vmem", lambda *a: False)
        if family == "tiled":
            monkeypatch.setattr(fa, "fits_chunked", lambda *a, **kw: False)
        want = np.asarray(flash_tower_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask), 0, 0.0, True))
        out = jax.jit(
            lambda a, b, c, m: flash_tower_attention(a, b, c, m, 0, 0.0,
                                                     True))(
            jax.device_put(q, sh4), jax.device_put(k, sh4),
            jax.device_put(v, sh4), jax.device_put(mask, sh2))
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-6,
                                   err_msg=family)


def test_sharded_grads_match_single_device():
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), ("data",))
    rs = np.random.RandomState(1)
    q = rs.randn(B, H, L, D).astype(np.float32)
    k = rs.randn(B, H, L, D).astype(np.float32)
    v = rs.randn(B, H, L, D).astype(np.float32)

    def loss(q, k, v):
        out = flash_tower_attention(q, k, v, None, 0, 0.0, True)
        return jnp.sum(out * out)

    want = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    sh4 = NamedSharding(mesh, P("data"))
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        jax.device_put(q, sh4), jax.device_put(k, sh4),
        jax.device_put(v, sh4))
    for a, b, name in zip(g, want, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, err_msg=name)
