"""Checkpoint loading — twin of the reference's Meta-format loader
(`chat/llama/generation.py:101-120`) plus the fused-weight transform
(`chat/llama/model.py:292-328`), generalized:

- Meta llama `.pth` + `params.json` (single consolidated shard, or multiple
  model-parallel shards which are re-assembled — the reference instead picks
  one shard per rank).
- HuggingFace safetensors directories (single or indexed multi-file). HF
  checkpoints store q/k permuted for NEOX rope, so rope_style is set
  accordingly.

Weights land directly in the kernel-native fused layout (see
``models.llama.fuse_attention_weights``); nothing is kept in torch.
"""

from __future__ import annotations

import json
import os
from glob import glob
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from clusterfusion_tpu.config import LlamaConfig
from clusterfusion_tpu.models.llama import (LlamaParams,
                                            fuse_attention_weights,
                                            padded_ffn_dim)


def _pad_ffn(w13, w2, cfg):
    f_pad = padded_ffn_dim(cfg)
    f = w2.shape[0]
    if f_pad != f:
        w13 = jnp.pad(w13, ((0, 0), (0, 0), (0, f_pad - f)))
        w2 = jnp.pad(w2, ((0, f_pad - f), (0, 0)))
    return w13, w2


def _meta_ffn_dim(dim: int, multiple_of: int, ffn_dim_multiplier) -> int:
    """Meta llama FFN sizing rule (`chat/llama/model.py:413-424`)."""
    hidden = int(2 * (4 * dim) / 3)
    if ffn_dim_multiplier is not None:
        hidden = int(ffn_dim_multiplier * hidden)
    return multiple_of * ((hidden + multiple_of - 1) // multiple_of)


def config_from_params_json(path: str, max_seq_len: int = 2048) -> LlamaConfig:
    with open(path) as f:
        p = json.load(f)
    dim = p["dim"]
    n_heads = p["n_heads"]
    return LlamaConfig(
        hidden_dim=dim,
        n_heads=n_heads,
        n_kv_heads=p.get("n_kv_heads"),
        ffn_dim=_meta_ffn_dim(dim, p.get("multiple_of", 256),
                              p.get("ffn_dim_multiplier")),
        n_layers=p["n_layers"],
        vocab_size=p.get("vocab_size", 32000) if p.get("vocab_size", -1) > 0 else 32000,
        norm_eps=p.get("norm_eps", 1e-5),
        rope_theta=p.get("rope_theta", 10000.0),
        max_seq_len=max_seq_len,
        rope_style="gptj",     # meta checkpoints use the complex/interleaved rope
    )


# --- Meta .pth -------------------------------------------------------------

# (key suffix, shard axis) for model-parallel reassembly; axis None = replicated
_META_SHARD_AXES = {
    "attention.wq.weight": 0, "attention.wk.weight": 0, "attention.wv.weight": 0,
    "attention.wo.weight": 1,
    "feed_forward.w1.weight": 0, "feed_forward.w3.weight": 0,
    "feed_forward.w2.weight": 1,
    "tok_embeddings.weight": 1, "output.weight": 0,
    "attention_norm.weight": None, "ffn_norm.weight": None, "norm.weight": None,
}


def _load_meta_state(ckpt_dir: str) -> Dict[str, np.ndarray]:
    import torch  # cpu-only usage: deserialize + to numpy

    paths = sorted(glob(os.path.join(ckpt_dir, "*.pth")))
    assert paths, f"no .pth checkpoints in {ckpt_dir}"
    shards = [torch.load(p, map_location="cpu", weights_only=True) for p in paths]
    state: Dict[str, np.ndarray] = {}
    for key in shards[0]:
        suffix = key.split(".", 2)[-1] if key.startswith("layers.") else key
        axis = _META_SHARD_AXES.get(suffix, None)
        if len(shards) == 1 or axis is None:
            t = shards[0][key]
        else:
            t = __import__("torch").cat([s[key] for s in shards], dim=axis)
        state[key] = t.to(torch.float32).numpy()
    return state


def load_meta_checkpoint(ckpt_dir: str, max_seq_len: int = 2048,
                         dtype=jnp.bfloat16) -> Tuple[LlamaParams, LlamaConfig]:
    """Load a Meta llama checkpoint dir (params.json + *.pth)."""
    cfg = config_from_params_json(os.path.join(ckpt_dir, "params.json"),
                                  max_seq_len)
    state = _load_meta_state(ckpt_dir)
    if "tok_embeddings.weight" in state:
        vocab = state["tok_embeddings.weight"].shape[0]
        if vocab != cfg.vocab_size:
            cfg = LlamaConfig(**{**cfg.__dict__, "vocab_size": vocab})

    def get(i, name):
        return jnp.asarray(state[f"layers.{i}.{name}"], dtype)

    wqkv_l, wo_l, w13_l, w2_l, an_l, fn_l = [], [], [], [], [], []
    for i in range(cfg.n_layers):
        wqkv_f, wo_f = fuse_attention_weights(
            get(i, "attention.wq.weight"), get(i, "attention.wk.weight"),
            get(i, "attention.wv.weight"), get(i, "attention.wo.weight"), cfg)
        wqkv_l.append(wqkv_f)
        wo_l.append(wo_f)
        w13, w2 = _pad_ffn(
            jnp.stack([get(i, "feed_forward.w1.weight").T,
                       get(i, "feed_forward.w3.weight").T], axis=0),
            get(i, "feed_forward.w2.weight").T, cfg)
        w13_l.append(w13)
        w2_l.append(w2)
        an_l.append(get(i, "attention_norm.weight"))
        fn_l.append(get(i, "ffn_norm.weight"))

    params: LlamaParams = {
        "embed": jnp.asarray(state["tok_embeddings.weight"], dtype),
        "layers": {
            "wqkv_f": jnp.stack(wqkv_l), "wo_f": jnp.stack(wo_l),
            "w13": jnp.stack(w13_l), "w2": jnp.stack(w2_l),
            "attn_norm": jnp.stack(an_l), "ffn_norm": jnp.stack(fn_l),
        },
        "final_norm": jnp.asarray(state["norm.weight"], dtype),
        "lm_head": jnp.asarray(state["output.weight"], dtype).T,
    }
    return params, cfg


# --- HF safetensors --------------------------------------------------------


def _load_hf_state(model_dir: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            weight_map = json.load(f)["weight_map"]
        files = sorted(set(weight_map.values()))
    else:
        files = [os.path.basename(p) for p in
                 glob(os.path.join(model_dir, "*.safetensors"))]
    state: Dict[str, np.ndarray] = {}
    for fname in files:
        with safe_open(os.path.join(model_dir, fname), framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    return state


def load_hf_checkpoint(model_dir: str, max_seq_len: int = 2048,
                       dtype=jnp.bfloat16) -> Tuple[LlamaParams, LlamaConfig]:
    """Load an HF-format llama directory (config.json + *.safetensors)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hc = json.load(f)
    cfg = LlamaConfig(
        hidden_dim=hc["hidden_size"],
        n_heads=hc["num_attention_heads"],
        n_kv_heads=hc.get("num_key_value_heads"),
        ffn_dim=hc["intermediate_size"],
        n_layers=hc["num_hidden_layers"],
        vocab_size=hc["vocab_size"],
        norm_eps=hc.get("rms_norm_eps", 1e-5),
        rope_theta=hc.get("rope_theta", 10000.0),
        max_seq_len=max_seq_len,
        rope_style="neox",     # HF stores q/k pre-permuted for rotate-half
    )
    state = _load_hf_state(model_dir)

    def get(name):
        return jnp.asarray(state[name].astype(np.float32), dtype)

    wqkv_l, wo_l, w13_l, w2_l, an_l, fn_l = [], [], [], [], [], []
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        wqkv_f, wo_f = fuse_attention_weights(
            get(pre + "self_attn.q_proj.weight"),
            get(pre + "self_attn.k_proj.weight"),
            get(pre + "self_attn.v_proj.weight"),
            get(pre + "self_attn.o_proj.weight"), cfg)
        wqkv_l.append(wqkv_f)
        wo_l.append(wo_f)
        w13, w2 = _pad_ffn(
            jnp.stack([get(pre + "mlp.gate_proj.weight").T,
                       get(pre + "mlp.up_proj.weight").T], axis=0),
            get(pre + "mlp.down_proj.weight").T, cfg)
        w13_l.append(w13)
        w2_l.append(w2)
        an_l.append(get(pre + "input_layernorm.weight"))
        fn_l.append(get(pre + "post_attention_layernorm.weight"))

    lm_head = state.get("lm_head.weight", state["model.embed_tokens.weight"])
    params: LlamaParams = {
        "embed": get("model.embed_tokens.weight"),
        "layers": {
            "wqkv_f": jnp.stack(wqkv_l), "wo_f": jnp.stack(wo_l),
            "w13": jnp.stack(w13_l), "w2": jnp.stack(w2_l),
            "attn_norm": jnp.stack(an_l), "ffn_norm": jnp.stack(fn_l),
        },
        "final_norm": get("model.norm.weight"),
        "lm_head": jnp.asarray(lm_head.astype(np.float32), dtype).T,
    }
    return params, cfg


def load_checkpoint(path: str, max_seq_len: int = 2048, dtype=jnp.bfloat16):
    """Dispatch: Meta dir (params.json) vs HF dir (config.json)."""
    if os.path.exists(os.path.join(path, "params.json")):
        return load_meta_checkpoint(path, max_seq_len, dtype)
    if os.path.exists(os.path.join(path, "config.json")):
        return load_hf_checkpoint(path, max_seq_len, dtype)
    raise FileNotFoundError(f"no params.json or config.json under {path}")
