from qwen_tts_tpu.ops.norms import rms_norm, layer_norm
from qwen_tts_tpu.ops.rope import (
    rope_cos_sin,
    apply_rope,
    merge_mrope_sections,
)
from qwen_tts_tpu.ops.attention import attention_prefill, attention_decode_step
from qwen_tts_tpu.ops.sampling import (
    SamplingConfig,
    apply_repetition_penalty,
    apply_suppress_mask,
    sample_token,
)
from qwen_tts_tpu.ops.convs import causal_conv1d, causal_conv_transpose1d
from qwen_tts_tpu.ops.snake import snake_beta

__all__ = [
    "rms_norm",
    "layer_norm",
    "rope_cos_sin",
    "apply_rope",
    "merge_mrope_sections",
    "attention_prefill",
    "attention_decode_step",
    "SamplingConfig",
    "apply_repetition_penalty",
    "apply_suppress_mask",
    "sample_token",
    "causal_conv1d",
    "causal_conv_transpose1d",
    "snake_beta",
]
