from .checkpoint import load_ckpt, save_ckpt
from .data import batch_stream, build_char_vocab, decode, encode, load_text
from .optim import adamw_init, adamw_update, gpt_wd_mask, warmup_cosine
from .trainer import (
    eval_avg,
    make_device_train_step,
    make_train_step,
    sample,
    train,
    train_sharded,
)

__all__ = [
    "load_ckpt",
    "save_ckpt",
    "load_text",
    "build_char_vocab",
    "encode",
    "decode",
    "batch_stream",
    "adamw_init",
    "adamw_update",
    "gpt_wd_mask",
    "warmup_cosine",
    "train",
    "train_sharded",
    "sample",
    "make_train_step",
    "make_device_train_step",
    "eval_avg",
]
