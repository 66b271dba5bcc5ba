"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4 item 3)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may point at TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# this XLA/CPU build defaults to low-precision matmuls; parity tests need f32
import jax  # noqa: E402

# the axon TPU plugin overrides the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NO persistent compilation cache on CPU: XLA:CPU serializes AOT machine
# code whose feature set can exceed the executing host's (cpu_aot_loader
# E-logs), and reloading such entries intermittently SIGILLs/aborts
# mid-test.  CPU compiles of the tiny test models are cheap.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def embedder(tmp_path_factory):
    """Tiny serving Embedder shared by the serving test modules."""
    import jax.numpy as jnp

    from leccr_tpu.config import tiny_test_config
    from leccr_tpu.data.tokenizers import write_tiny_wordpiece_vocab
    from leccr_tpu.models.leccr import LECCRModel
    from leccr_tpu.serve import Embedder

    tmp = tmp_path_factory.mktemp("serve")
    vocab = tmp / "vocab.txt"
    write_tiny_wordpiece_vocab(
        str(vocab), "a man rides his red bike dog field".split())
    cfg = tiny_test_config()
    cfg.data.text_vocab = str(vocab)
    model = LECCRModel(cfg.model)
    rs = np.random.RandomState(0)
    res = cfg.model.vision.image_res
    batch = {
        "vision": jnp.asarray(rs.rand(1, res, res, 3), jnp.float32),
        "text_ids_s": jnp.asarray(rs.randint(1, 512, (1, 8))),
        "text_mask_s": jnp.ones((1, 8), jnp.int32),
        "text_ids_t": jnp.asarray(rs.randint(1, 512, (1, 8))),
        "text_mask_t": jnp.ones((1, 8), jnp.int32),
        "caption_ids": jnp.asarray(rs.randint(1, 512, (1, 8))),
        "caption_mask": jnp.ones((1, 8), jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, batch)["params"]
    return Embedder(cfg, params, batch_size=4)
