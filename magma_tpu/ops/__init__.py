from magma_tpu.ops.rotary import rotary_sincos, apply_rotary
from magma_tpu.ops.attention import causal_attention, decode_attention

__all__ = ["rotary_sincos", "apply_rotary", "causal_attention", "decode_attention"]
