from .gpt import (
    GPTConfig,
    gpt_apply,
    gpt_decode_step,
    gpt_loss,
    gpt_prefill,
    init_decode_cache,
    init_gpt_params,
    sample_token,
)

__all__ = [
    "GPTConfig",
    "init_gpt_params",
    "gpt_apply",
    "gpt_loss",
    "gpt_prefill",
    "gpt_decode_step",
    "init_decode_cache",
    "sample_token",
]
