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

    out = jax.jit(
        lambda a, b, c, m: flash_tower_attention(a, b, c, m, 0, 0.0, True)
    )(qd, kd, vd, md)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)
