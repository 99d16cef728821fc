"""Continuous-batching serving for the TPU GPT.

The reference's serving surface is a single-stream REPL that recomputes the
full forward per token (/root/reference/gpt.py:518-546). This package is the
production-serving extension of that capability: a slot-based engine where
requests join and leave an in-flight fixed-shape decode batch (continuous
batching), so one compiled decode step serves an arbitrary request stream.
"""

from .engine import Completion, Request, ServeEngine, serve
from .paged import PageAllocator, decode_chunk_paged, init_paged_cache

__all__ = ["Request", "Completion", "ServeEngine", "serve",
           "PageAllocator", "decode_chunk_paged", "init_paged_cache"]
