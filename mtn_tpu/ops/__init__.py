from mtn_tpu.ops.masks import (causal_mask, length_mask, pad_mask,
                               target_mask)
from mtn_tpu.ops.positional import sinusoidal_table
from mtn_tpu.ops.attention import multi_head_attention

__all__ = [
    "causal_mask",
    "length_mask",
    "pad_mask",
    "target_mask",
    "sinusoidal_table",
    "multi_head_attention",
]
