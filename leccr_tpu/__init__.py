"""leccr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) cross-lingual cross-modal
retrieval framework with the capabilities of LECCR (ACM MM 2024).

Reference capability map: see SURVEY.md at the repo root. The reference is a
PyTorch/NCCL research codebase (`/root/reference/LECCR`); this package is a
ground-up redesign for TPU: functional flax models jit-compiled to XLA,
`jax.sharding.Mesh` + shard_map collectives for global-negative contrastive
losses, Pallas kernels for the fused similarity/InfoNCE hot loop, and an
input pipeline that pre-tokenizes on the host and keeps shapes static.
"""

__version__ = "0.1.0"

from leccr_tpu.config import LECCRConfig, load_config  # noqa: F401
