"""PyTorch twin: an autograd oracle mirroring the encoder-decoder stack.

Capability parity with the reference's
``ai_comps/pytorch_encoder_decoder_transformer.py``: the same pre-LN
encoder-decoder architecture written against torch (CPU) autograd, used as a
behavioral/correctness oracle for the hand-derived JAX backward passes, plus
the reversal-task training demo with a ``TrainConfig`` dataclass.

The real oracle work lives in tests/test_torch_oracle.py, which copies
weights between this twin and the JAX components and cross-checks outputs
and gradients.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

try:
    import torch
    import torch.nn as nn

    TORCH_AVAILABLE = True
except Exception:  # pragma: no cover
    TORCH_AVAILABLE = False


@dataclasses.dataclass
class TrainConfig:
    vocab_size: int = 12
    d_model: int = 64
    n_heads: int = 4
    n_enc_layers: int = 2
    n_dec_layers: int = 2
    d_ff: int = 256
    seq_len: int = 10
    batch_size: int = 64
    epochs: int = 300
    lr: float = 1e-3
    seed: int = 0
    device: str = "cpu"


if TORCH_AVAILABLE:

    class TwinEncoderLayer(nn.Module):
        def __init__(self, d_model, n_heads, d_ff):
            super().__init__()
            self.ln1 = nn.LayerNorm(d_model)
            self.attn = nn.MultiheadAttention(d_model, n_heads, batch_first=True)
            self.ln2 = nn.LayerNorm(d_model)
            self.ff = nn.Sequential(
                nn.Linear(d_model, d_ff), nn.ReLU(), nn.Linear(d_ff, d_model)
            )

        def forward(self, x):
            h = self.ln1(x)
            a, _ = self.attn(h, h, h, need_weights=False)
            x = x + a
            return x + self.ff(self.ln2(x))

    class TwinDecoderLayer(nn.Module):
        def __init__(self, d_model, n_heads, d_ff):
            super().__init__()
            self.ln1 = nn.LayerNorm(d_model)
            self.self_attn = nn.MultiheadAttention(d_model, n_heads, batch_first=True)
            self.ln2 = nn.LayerNorm(d_model)
            self.cross_attn = nn.MultiheadAttention(d_model, n_heads, batch_first=True)
            self.ln3 = nn.LayerNorm(d_model)
            self.ff = nn.Sequential(
                nn.Linear(d_model, d_ff), nn.ReLU(), nn.Linear(d_ff, d_model)
            )

        def forward(self, x, memory, tgt_mask=None):
            h = self.ln1(x)
            a, _ = self.self_attn(h, h, h, attn_mask=tgt_mask, need_weights=False)
            x = x + a
            h = self.ln2(x)
            c, _ = self.cross_attn(h, memory, memory, need_weights=False)
            x = x + c
            return x + self.ff(self.ln3(x))

    class TwinTransformer(nn.Module):
        """Pre-LN encoder-decoder with tied target embedding / output head."""

        def __init__(self, cfg: TrainConfig):
            super().__init__()
            D = cfg.d_model
            self.cfg = cfg
            self.src_emb = nn.Embedding(cfg.vocab_size, D)
            self.tgt_emb = nn.Embedding(cfg.vocab_size, D)
            self.enc = nn.ModuleList(
                [TwinEncoderLayer(D, cfg.n_heads, cfg.d_ff)
                 for _ in range(cfg.n_enc_layers)]
            )
            self.dec = nn.ModuleList(
                [TwinDecoderLayer(D, cfg.n_heads, cfg.d_ff)
                 for _ in range(cfg.n_dec_layers)]
            )
            self.head = nn.Linear(D, cfg.vocab_size, bias=True)
            self.head.weight = self.tgt_emb.weight  # weight tying
            pe = torch.zeros(512, D)
            pos = torch.arange(512).unsqueeze(1).float()
            i = torch.arange(D).unsqueeze(0).float()
            angle = pos / torch.pow(10000.0, 2 * (i // 2) / D)
            pe[:, 0::2] = torch.sin(angle[:, 0::2])
            pe[:, 1::2] = torch.cos(angle[:, 1::2])
            self.register_buffer("pe", pe)

        def forward(self, src, tgt):
            Ts, Tt = src.shape[1], tgt.shape[1]
            x = self.src_emb(src) + self.pe[:Ts]
            for lyr in self.enc:
                x = lyr(x)
            memory = x
            mask = torch.triu(
                torch.full((Tt, Tt), float("-inf")), diagonal=1
            ).to(src.device)
            y = self.tgt_emb(tgt) + self.pe[:Tt]
            for lyr in self.dec:
                y = lyr(y, memory, tgt_mask=mask)
            return self.head(y)

    def train_reverse_twin(cfg: Optional[TrainConfig] = None):
        """Reversal-task training demo on the torch twin."""
        cfg = cfg or TrainConfig()
        torch.manual_seed(cfg.seed)
        rng = np.random.default_rng(cfg.seed)
        model = TwinTransformer(cfg).to(cfg.device)
        opt = torch.optim.AdamW(model.parameters(), lr=cfg.lr)
        lossf = nn.CrossEntropyLoss()
        for ep in range(cfg.epochs):
            src = rng.integers(1, cfg.vocab_size, (cfg.batch_size, cfg.seq_len))
            rev = np.flip(src, axis=1).copy()
            tgt_in = np.concatenate(
                [np.zeros((cfg.batch_size, 1), np.int64), rev[:, :-1]], axis=1
            )
            s = torch.as_tensor(src, dtype=torch.long)
            ti = torch.as_tensor(tgt_in, dtype=torch.long)
            to = torch.as_tensor(rev.astype(np.int64))
            logits = model(s, ti)
            loss = lossf(logits.reshape(-1, cfg.vocab_size), to.reshape(-1))
            opt.zero_grad()
            loss.backward()
            opt.step()
            if ep % 50 == 0 or ep == cfg.epochs - 1:
                acc = (logits.argmax(-1) == to).float().mean().item()
                print(f"epoch {ep:4d}  loss {loss.item():.4f}  acc {acc:.3f}")
        return model


if __name__ == "__main__":
    if not TORCH_AVAILABLE:
        raise SystemExit("torch not available")
    train_reverse_twin()
