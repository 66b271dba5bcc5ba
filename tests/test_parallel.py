"""Distributed-semantics tests on the 8-virtual-device CPU mesh
(SURVEY.md §4 item 3): sharded == single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from leccr_tpu.config import ParallelConfig
from leccr_tpu.models.losses import soft_label_contrastive_loss
from leccr_tpu.parallel.mesh import make_mesh, params_shardings
from leccr_tpu.parallel.ring import ring_infonce

RS = np.random.RandomState(11)


def _feats(b=32, e=16):
    a = RS.randn(b, e).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b_ = RS.randn(b, e).astype(np.float32)
    b_ /= np.linalg.norm(b_, axis=-1, keepdims=True)
    idx = RS.randint(0, b // 2, size=b).astype(np.int32)  # duplicates
    return jnp.asarray(a), jnp.asarray(b_), jnp.asarray(idx)


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_ring_infonce_matches_global(data, model):
    mesh = make_mesh(ParallelConfig(data=data, model=model))
    a, b, idx = _feats()
    temp = jnp.float32(0.07)
    want = soft_label_contrastive_loss(a, b, temp, idx)
    got = ring_infonce(mesh, a, b, temp, idx)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


@pytest.mark.slow
def test_ring_infonce_gradients_match_global():
    mesh = make_mesh(ParallelConfig(data=8, model=1))
    a, b, idx = _feats()
    temp = jnp.float32(0.07)

    g_want = jax.grad(
        lambda x, y: soft_label_contrastive_loss(x, y, temp, idx),
        argnums=(0, 1))(a, b)
    g_got = jax.grad(
        lambda x, y: ring_infonce(mesh, x, y, temp, idx),
        argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(g_got[0]), np.asarray(g_want[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_got[1]), np.asarray(g_want[1]),
                               atol=1e-6)


def test_ring_infonce_without_idx():
    mesh = make_mesh(ParallelConfig(data=8, model=1))
    a, b, _ = _feats(16, 8)
    temp = jnp.float32(0.1)
    want = soft_label_contrastive_loss(a, b, temp, None)
    got = ring_infonce(mesh, a, b, temp, None)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_global_loss_under_data_sharding_matches_single_device():
    """The jit path: global-batch loss with inputs sharded over `data` must
    equal the unsharded result (XLA inserts the all-gathers the reference
    did by hand)."""
    mesh = make_mesh(ParallelConfig(data=8, model=1))
    a, b, idx = _feats()
    temp = jnp.float32(0.07)
    want = soft_label_contrastive_loss(a, b, temp, idx)

    sharding = NamedSharding(mesh, P("data"))
    a_s = jax.device_put(a, sharding)
    b_s = jax.device_put(b, sharding)
    idx_s = jax.device_put(idx, sharding)
    got = jax.jit(soft_label_contrastive_loss)(a_s, b_s, temp, idx_s)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_param_partition_specs():
    mesh = make_mesh(ParallelConfig(data=4, model=2))
    params = {
        "layer": {
            "c_fc": {"kernel": jnp.zeros((8, 32)), "bias": jnp.zeros((32,))},
            "c_proj": {"kernel": jnp.zeros((32, 8)), "bias": jnp.zeros((8,))},
            "norm": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
        }
    }
    sh = params_shardings(mesh, params)
    assert sh["layer"]["c_fc"]["kernel"].spec == P(None, "model")
    assert sh["layer"]["c_proj"]["kernel"].spec == P("model", None)
    assert sh["layer"]["norm"]["scale"].spec == P()
    # odd dims fall back to replicated
    params2 = {"c_fc": {"kernel": jnp.zeros((8, 33))}}
    sh2 = params_shardings(mesh, params2)
    assert sh2["c_fc"]["kernel"].spec == P()


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.slow
def test_ring_infonce_fused_matches_global(impl):
    """Fused ring (per-rotation blocks through the InfoNCE kernels with a
    hand-written ring VJP): values AND gradients — including d/d temp —
    match the dense global loss.  impl='pallas' runs the kernels in
    interpret mode on the CPU mesh."""
    mesh = make_mesh(ParallelConfig(data=8, model=1))
    a, b, idx = _feats()
    temp = jnp.float32(0.07)
    interpret = impl == "pallas"

    want = soft_label_contrastive_loss(a, b, temp, idx)
    got = ring_infonce(mesh, a, b, temp, idx, impl=impl,
                       interpret=interpret)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    g_want = jax.grad(
        lambda x, y, t: soft_label_contrastive_loss(x, y, t, idx),
        argnums=(0, 1, 2))(a, b, temp)
    g_got = jax.grad(
        lambda x, y, t: ring_infonce(mesh, x, y, t, idx, impl=impl,
                                     interpret=interpret),
        argnums=(0, 1, 2))(a, b, temp)
    for w, g in zip(g_want, g_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=2e-6)


def test_dcn_slice_major_ordering():
    """Multi-slice device ordering: devices sorted slice-major by
    (slice_index, id) so model groups stay inside a slice; devices without
    slice_index (CPU/virtual) keep their given order."""
    from types import SimpleNamespace

    from leccr_tpu.parallel.mesh import _dcn_slice_major

    devs = [SimpleNamespace(slice_index=s, id=i)
            for i, s in enumerate([1, 0, 1, 0, 0, 1, 0, 1])]
    ordered = _dcn_slice_major(devs, dcn=2)
    assert [d.slice_index for d in ordered] == [0] * 4 + [1] * 4
    assert [d.id for d in ordered] == [1, 3, 4, 6, 0, 2, 5, 7]

    plain = [SimpleNamespace(id=i) for i in range(4)]
    assert _dcn_slice_major(plain, dcn=2) == plain

    # a physical slice straddling a dcn-group boundary must be rejected:
    # 8 devices in 2 slices of 4, but a 6-device mesh split dcn=2 puts
    # slice 0's last device into group 1 — intra-group collectives would
    # silently ride DCN
    devs2 = [SimpleNamespace(slice_index=i // 4, id=i) for i in range(8)]
    with pytest.raises(AssertionError, match="straddles"):
        _dcn_slice_major(devs2, dcn=2, need=6)
    # slice-aligned selections pass: 8 devices/2 groups (one slice each)
    assert len(_dcn_slice_major(devs2, dcn=2, need=8)) == 8
    # ... and a partial FINAL slice is fine (groups still slice-aligned)
    assert len(_dcn_slice_major(devs2, dcn=1, need=6)) == 8
    # a SINGLE physical slice is always fine: dcn grouping is purely
    # logical there (everything rides ICI), so the straddle check must
    # not fire — dryruns force dcn=2 on single-slice hardware
    devs1 = [SimpleNamespace(slice_index=0, id=i) for i in range(4)]
    assert len(_dcn_slice_major(devs1, dcn=2, need=4)) == 4


def test_dcn_mesh_builds_and_loss_unchanged():
    """dcn_data on the virtual CPU mesh (single hardware slice): the mesh
    builds with the declared layout and the sharded global loss still
    matches the dense one — dcn is an ordering property, not a semantic
    change."""
    mesh = make_mesh(ParallelConfig(data=4, model=2, dcn_data=2))
    assert mesh.shape == {"data": 4, "model": 2}
    a, b, idx = _feats()
    want = soft_label_contrastive_loss(a, b, jnp.float32(0.07), idx)
    got = ring_infonce(make_mesh(ParallelConfig(data=8, dcn_data=2)),
                       a, b, jnp.float32(0.07), idx)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    with pytest.raises(AssertionError):
        make_mesh(ParallelConfig(data=3, model=1, dcn_data=2))
