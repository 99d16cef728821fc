from .beam import gpt_generate_beam
from .gpt import (
    GPTConfig,
    gpt_apply,
    gpt_decode_chunk,
    gpt_decode_step,
    gpt_loss,
    gpt_prefill,
    init_decode_cache,
    init_gpt_params,
    sample_token,
)
from .gpt_modules import GPT, AdamW, DecoderOnlyLayer
from .lora import (
    LoRAConfig,
    init_lora_params,
    load_lora,
    lora_merge,
    save_lora,
)
from .moe import (
    MoEGPTConfig,
    init_moe_params,
    moe_ffn,
    moe_gpt_apply,
    moe_gpt_loss,
)
from .seq2seq import (
    Seq2SeqConfig,
    init_seq2seq_params,
    make_reverse_batch,
    seq2seq_apply,
    seq2seq_loss,
)
from .transformer import (
    FFN,
    Decoder,
    DecoderLayer,
    Encoder,
    EncoderLayer,
    OutputHead,
    TokenEmbedding,
    Transformer,
    sinusoidal_pos_encoding,
    softmax_rows,
)

__all__ = [
    # functional GPT
    "GPTConfig",
    "init_gpt_params",
    "gpt_apply",
    "gpt_loss",
    "gpt_prefill",
    "gpt_decode_step",
    "gpt_decode_chunk",
    "init_decode_cache",
    "sample_token",
    "gpt_generate_beam",
    # LoRA finetuning
    "LoRAConfig",
    "init_lora_params",
    "lora_merge",
    "save_lora",
    "load_lora",
    # mixture-of-experts GPT
    "MoEGPTConfig",
    "init_moe_params",
    "moe_ffn",
    "moe_gpt_apply",
    "moe_gpt_loss",
    # stateful GPT
    "DecoderOnlyLayer",
    "GPT",
    "AdamW",
    # encoder-decoder (stateful)
    "FFN",
    "EncoderLayer",
    "DecoderLayer",
    "Encoder",
    "Decoder",
    "Transformer",
    "TokenEmbedding",
    "OutputHead",
    "softmax_rows",
    "sinusoidal_pos_encoding",
    # functional seq2seq
    "Seq2SeqConfig",
    "init_seq2seq_params",
    "seq2seq_apply",
    "seq2seq_loss",
    "make_reverse_batch",
]
