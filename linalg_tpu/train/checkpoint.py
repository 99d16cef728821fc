"""Checkpointing: npz archive + JSON meta sidecar, reference-compatible.

Save/load uses the reference's exact key naming (``tok_W``, ``head_W``,
``head_b``, ``l{i}_Wq`` ... ``l{i}_ln2_b`` — /root/reference/gpt.py:438-476)
so checkpoints interoperate both ways: this framework can resume from a
reference-produced archive and vice versa. The meta sidecar carries the
tokenizer (stoi/itos) and architecture hyperparameters.
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, Tuple

import numpy as np

from ..models.gpt import GPTConfig, Params, init_gpt_params

__all__ = ["save_ckpt", "load_ckpt", "load_tokenizer", "save_ckpt_orbax",
           "load_ckpt_orbax", "CKPT_NAME", "META_NAME"]

CKPT_NAME = "chars_gpt_best.npz"
META_NAME = "chars_gpt_meta.json"


def save_ckpt(ckpt_dir, params: Params, cfg: GPTConfig,
              stoi: Dict[str, int], itos: Dict[int, str],
              tokenizer=None) -> pathlib.Path:
    from ..utils.transfer import pull_pytree

    ckpt_dir = pathlib.Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    host = pull_pytree(params)  # single device->host transfer
    lay = {k: np.asarray(v) for k, v in host["layers"].items()}
    tok_W = np.asarray(host["tok_W"])
    arrays = {
        "tok_W": tok_W,
        "head_W": tok_W.T,  # tied head, stored for reference compatibility
        "head_b": np.asarray(host["head_b"]),
    }
    if "pos_W" in host:  # learned positional table (--pos learned)
        arrays["pos_W"] = np.asarray(host["pos_W"])
    # every layer key present in the pytree is saved per layer — this covers
    # both the dense GPT (reference key set, gpt.py:438-464) and the MoE
    # extension (router Wr + expert-stacked W1/b1/W2/b2)
    for i in range(cfg.n_layers):
        for ours in lay:
            arrays[f"l{i}_{ours}"] = lay[ours][i]
    path = ckpt_dir / CKPT_NAME
    # uncompressed: zlib on ~50 MB of params costs ~8-10 s per save (the
    # trainer saves on every val improvement); the reference's shipped
    # checkpoint is uncompressed npz too (96.7 MB ~= raw f32 params).
    np.savez(path, **arrays)
    meta = _build_meta(cfg, stoi, itos, tokenizer)
    (ckpt_dir / META_NAME).write_text(json.dumps(meta))
    return path


def _build_meta(cfg: GPTConfig, stoi, itos, tokenizer=None) -> dict:
    """The JSON meta sidecar shared by the npz and orbax backends."""
    meta = {
        "stoi": stoi,
        "itos": {str(k): v for k, v in itos.items()},
        "vocab_size": cfg.vocab_size,
        "d_model": cfg.d_model,
        "heads": cfg.n_heads,
        "layers": cfg.n_layers,
        "ctx_len": cfg.ctx_len,
        "pos": cfg.pos,
        "d_ff": cfg.d_ff,  # None = the 4*d_model default
        "dtype": cfg.dtype,
    }
    if cfg.n_kv_heads is not None:  # GQA/MQA: grouped K/V head count
        meta["kv_heads"] = cfg.n_kv_heads
    if cfg.window is not None:  # sliding-window attention
        meta["window"] = cfg.window
    if cfg.ffn != "relu":  # FFN variant (gated configs carry l{i}_Wg/bg)
        meta["ffn"] = cfg.ffn
    # a non-char tokenizer rides the sidecar (type + merge table); char
    # checkpoints keep the reference's stoi/itos-only format for interop
    from ..nn.tokenizers import BPETokenizer

    if isinstance(tokenizer, BPETokenizer):
        meta["tokenizer"] = "bpe"
        meta["merges"] = [list(m) for m in tokenizer.merges]
    from ..models.moe import MoEGPTConfig

    if isinstance(cfg, MoEGPTConfig):
        meta["experts"] = cfg.n_experts
        meta["capacity_factor"] = cfg.capacity_factor
        meta["aux_weight"] = cfg.aux_weight
        meta["router_top_k"] = cfg.router_top_k
    return meta


def load_ckpt(ckpt_dir) -> Tuple[Params, GPTConfig, Dict[str, int], Dict[int, str]]:
    """Rebuild (params, cfg, stoi, itos) from an archive + meta sidecar.

    Raises on any missing/corrupt file — callers implement the reference's
    resume-or-init semantics by catching (gpt.py:264-273).
    """
    ckpt_dir = pathlib.Path(ckpt_dir)
    z = np.load(ckpt_dir / CKPT_NAME)
    meta = json.loads((ckpt_dir / META_NAME).read_text())
    stoi = meta["stoi"]
    itos = {int(k): v for k, v in meta["itos"].items()}
    cfg = _cfg_from_meta(meta)
    if meta.get("experts", 0):
        from ..models.moe import init_moe_params

        params = init_moe_params(cfg)
    else:
        params = init_gpt_params(cfg)  # shapes; every leaf overwritten below
    from ..utils.transfer import push_pytree
    lay = {}
    for ours in params["layers"]:
        # astype: reference-produced archives are float64 (NumPy default,
        # gpt.py:440-464); our compute dtype is float32
        lay[ours] = np.stack(
            [z[f"l{i}_{ours}"] for i in range(cfg.n_layers)], axis=0
        ).astype(np.float32)
    host = {
        "tok_W": np.asarray(z["tok_W"], dtype=np.float32),
        "head_b": np.asarray(z["head_b"], dtype=np.float32),
        "layers": lay,
    }
    if "pos_W" in params:  # learned positions: template has the leaf
        host["pos_W"] = np.asarray(z["pos_W"], dtype=np.float32)
    return push_pytree(host), cfg, stoi, itos


def _cfg_from_meta(meta: dict) -> GPTConfig:
    """Rebuild the (dense or MoE) config from a meta sidecar, tolerating
    reference-format metas (no pos/d_ff/dtype/vocab_size keys)."""
    common = dict(
        vocab_size=meta.get("vocab_size") or len(meta["stoi"]),
        d_model=meta["d_model"],
        n_heads=meta["heads"],
        n_layers=meta["layers"],
        ctx_len=meta["ctx_len"],
        pos=meta.get("pos", "sinusoidal"),  # absent in reference-format meta
        d_ff=meta.get("d_ff"),  # absent in reference-format meta -> default
        dtype=meta.get("dtype", "float32"),
        n_kv_heads=meta.get("kv_heads"),  # absent = standard MHA
        window=meta.get("window"),  # absent = full causal attention
        ffn=meta.get("ffn", "relu"),  # absent = the reference's relu MLP
    )
    if meta.get("experts", 0):
        from ..models.moe import MoEGPTConfig

        return MoEGPTConfig(
            n_experts=meta["experts"],
            capacity_factor=meta.get("capacity_factor", 1.25),
            aux_weight=meta.get("aux_weight", 0.01),
            router_top_k=meta.get("router_top_k", 1),
            **common,
        )
    return GPTConfig(**common)


def load_tokenizer(ckpt_dir):
    """Rebuild the tokenizer a checkpoint was trained with.

    BPE checkpoints carry their merge table in the meta sidecar
    (``meta["tokenizer"] == "bpe"``); everything else — including
    reference-produced archives — is the char tokenizer rebuilt from
    stoi/itos.
    """
    from ..nn.tokenizers import BPETokenizer, CharTokenizer

    meta = json.loads((pathlib.Path(ckpt_dir) / META_NAME).read_text())
    if meta.get("tokenizer") == "bpe":
        return BPETokenizer.load({"merges": meta["merges"]})
    itos = {int(k): v for k, v in meta["itos"].items()}
    return CharTokenizer.from_pretrained(meta["stoi"], itos)


# ---------------------------------------------------------------------------
# orbax backend (optional, alongside the reference-compatible npz format)
# ---------------------------------------------------------------------------


def save_ckpt_orbax(ckpt_dir, params: Params, cfg: GPTConfig,
                    stoi: Dict[str, int], itos: Dict[int, str],
                    tokenizer=None):
    """Save via orbax (sharding-aware, async-capable); meta stays JSON.

    Use for large/sharded models; ``save_ckpt`` remains the
    reference-compatible default. The meta sidecar is identical to the
    npz backend's (dtype/MoE/tokenizer fields included).
    """
    import orbax.checkpoint as ocp

    ckpt_dir = pathlib.Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / "orbax"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)
    meta = _build_meta(cfg, stoi, itos, tokenizer)
    (ckpt_dir / META_NAME).write_text(json.dumps(meta))
    return path


def load_ckpt_orbax(ckpt_dir):
    """Counterpart of ``save_ckpt_orbax``; returns (params, cfg, stoi, itos)."""
    import orbax.checkpoint as ocp

    ckpt_dir = pathlib.Path(ckpt_dir).resolve()
    meta = json.loads((ckpt_dir / META_NAME).read_text())
    stoi = meta["stoi"]
    itos = {int(k): v for k, v in meta["itos"].items()}
    cfg = _cfg_from_meta(meta)
    with ocp.PyTreeCheckpointer() as ckptr:
        params = ckptr.restore(ckpt_dir / "orbax")
    return params, cfg, stoi, itos
