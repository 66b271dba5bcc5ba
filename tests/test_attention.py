"""Parity tests for the attention ops against torch oracles.

The torch modules here are assembled from torch.nn primitives in the test —
they define the *contract* (torch MultiheadAttention semantics + the LECCR
post-LN residual block, reference models/attention.py:24-59)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from leccr_tpu.models.convert import mha_params_from_torch, _dense, _layernorm
from leccr_tpu.ops.attention import (
    CrossAttentionBlock,
    MultiHeadAttention,
    SelfAttentionStack,
)

D, H, B, LQ, LK = 32, 4, 3, 5, 7


def _rand(*shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(np.float32)


@pytest.fixture(scope="module")
def torch_mha():
    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(D, H, dropout=0.0, batch_first=True)
    mha.eval()
    return mha


def test_mha_matches_torch(torch_mha):
    q, k, v = _rand(B, LQ, D), _rand(B, LK, D), _rand(B, LK, D)
    pad = np.zeros((B, LK), dtype=bool)
    pad[:, -2:] = True  # last two key positions are padding

    with torch.no_grad():
        want, _ = torch_mha(
            torch.tensor(q), torch.tensor(k), torch.tensor(v),
            key_padding_mask=torch.tensor(pad))

    params = mha_params_from_torch(
        {k_: v_ for k_, v_ in torch_mha.state_dict().items()}, D)
    mod = MultiHeadAttention(D, H, dropout=0.0)
    got = mod.apply({"params": params}, jnp.asarray(q), jnp.asarray(k),
                    jnp.asarray(v), key_padding_mask=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-5)


def test_cross_block_matches_contract(torch_mha):
    """out = LayerNorm(tgt + FFN(MHA(tgt, mem))) — the reference block's
    residual skips the attention output (models/attention.py:47-54)."""
    torch.manual_seed(1)
    lin1 = torch.nn.Linear(D, D)
    lin2 = torch.nn.Linear(D, D)
    norm = torch.nn.LayerNorm(D)

    tgt, mem = _rand(B, LQ, D), _rand(B, LK, D)
    pad = np.zeros((B, LK), dtype=bool)
    pad[:, -1] = True

    with torch.no_grad():
        a, _ = torch_mha(torch.tensor(tgt), torch.tensor(mem),
                         torch.tensor(mem), key_padding_mask=torch.tensor(pad))
        h = lin2(torch.nn.functional.gelu(lin1(a)))
        want = norm(torch.tensor(tgt) + h)

    sd = {f"attn.{k}": v for k, v in torch_mha.state_dict().items()}
    sd.update({f"lin1.{k}": v for k, v in lin1.state_dict().items()})
    sd.update({f"lin2.{k}": v for k, v in lin2.state_dict().items()})
    sd.update({f"norm.{k}": v for k, v in norm.state_dict().items()})
    params = {
        "attn": mha_params_from_torch(
            {k.replace("attn.", "", 1): v for k, v in sd.items()
             if k.startswith("attn.")}, D),
        "ffn": {"linear1": _dense(sd, "lin1"), "linear2": _dense(sd, "lin2")},
        "norm": _layernorm(sd, "norm"),
    }
    mod = CrossAttentionBlock(D, H, dropout=0.0)
    got = mod.apply({"params": params}, jnp.asarray(tgt), jnp.asarray(mem),
                    memory_key_padding_mask=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-5)


def test_self_attention_mask_blocks_padding():
    """Padded positions must not influence valid positions' outputs."""
    mod = SelfAttentionStack(D, H, num_layers=2, dropout=0.0)
    x = jnp.asarray(_rand(2, LK, D))
    pad = jnp.zeros((2, LK), dtype=bool).at[:, -3:].set(True)
    params = mod.init(jax.random.PRNGKey(0), x, pad)["params"]
    out1 = mod.apply({"params": params}, x, pad)
    # perturb the padded positions — valid outputs must be unchanged
    x2 = x.at[:, -3:].set(123.0)
    out2 = mod.apply({"params": params}, x2, pad)
    np.testing.assert_allclose(
        np.asarray(out1[:, :-3]), np.asarray(out2[:, :-3]), atol=1e-5)


def test_dropout_is_stochastic_and_gated():
    mod = CrossAttentionBlock(D, H, dropout=0.5)
    tgt, mem = jnp.asarray(_rand(2, LQ, D)), jnp.asarray(_rand(2, LK, D))
    params = mod.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tgt, mem, deterministic=False)["params"]
    det = mod.apply({"params": params}, tgt, mem, deterministic=True)
    det2 = mod.apply({"params": params}, tgt, mem, deterministic=True)
    np.testing.assert_allclose(np.asarray(det), np.asarray(det2))
    s1 = mod.apply({"params": params}, tgt, mem, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    s2 = mod.apply({"params": params}, tgt, mem, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(s1), np.asarray(s2))
