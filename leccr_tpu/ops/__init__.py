from leccr_tpu.ops.attention import (  # noqa: F401
    MultiHeadAttention,
    CrossAttentionBlock,
    CrossAttentionStack,
    SelfAttentionBlock,
    SelfAttentionStack,
)
