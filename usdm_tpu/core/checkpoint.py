"""Checkpointing: orbax-native save/restore + reference-format loaders.

The reference consumes four external checkpoint formats (SURVEY.md §6):
HF causal-LM (naver-ai/USDM-DailyTalk), HubMixin Voicebox
(naver-ai/xlsr-token-Voicebox), BigVGAN `{"generator": ...}` torch dicts
(nvidia/bigvgan_22khz_80band), and fairseq2 XLS-R + kmeans .npy.  This module
loads each from a *local directory* (zero-egress: users download separately)
and converts to our stacked-param layout; our own training state is saved with
orbax (async, sharding-aware).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional


import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Raw state-dict readers (safetensors / torch)
# ---------------------------------------------------------------------------


def read_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a model directory or file into {name: np.ndarray}.

    Supports: *.safetensors (sharded or single), pytorch_model.bin /
    *.pt (torch pickles, loaded on CPU).
    """
    if os.path.isdir(path):
        sts = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
        if sts:
            out: Dict[str, np.ndarray] = {}
            from safetensors.numpy import load_file

            for f in sts:
                out.update(load_file(os.path.join(path, f)))
            return out
        bins = [f for f in os.listdir(path) if f.endswith((".bin", ".pt"))]
        if not bins:
            raise FileNotFoundError(f"no checkpoint files in {path}")
        out = {}
        for f in sorted(bins):
            out.update(_read_torch(os.path.join(path, f)))
        return out
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    return _read_torch(path)


def _read_torch(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "generator" in obj and all(
        hasattr(v, "numpy") for v in obj["generator"].values()
    ):
        obj = obj["generator"]  # BigVGAN checkpoint wrapper (models.py:228)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and isinstance(obj.get("model"), dict):
        obj = obj["model"]  # fairseq2 CheckpointManager wrapper (xlsr2_1b_v2.pt)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}


# ---------------------------------------------------------------------------
# Model loaders (local HF-style directories)
# ---------------------------------------------------------------------------


def load_mistral(path: str, cfg=None, dtype: Optional[str] = None):
    """Local USDM/Mistral HF dir -> (params, MistralConfig)."""
    from usdm_tpu.core.config import MistralConfig
    from usdm_tpu.models.mistral import convert_hf_state_dict

    cfg_file = os.path.join(path, "config.json")
    if cfg is None:
        with open(cfg_file) as f:
            hf = json.load(f)
        cfg = MistralConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
            head_dim=hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"],
            rope_theta=hf.get("rope_theta", 10000.0),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
            sliding_window=hf.get("sliding_window") or 4096,
            dtype=dtype or "bfloat16",
        )
    state = read_state_dict(path)
    if "lm_head.weight" not in state and "model.embed_tokens.weight" in state:
        state["lm_head.weight"] = state["model.embed_tokens.weight"]  # tied
    return convert_hf_state_dict(state, cfg, dtype=dtype), cfg


def save_mistral_hf(path: str, params, cfg, tokenizer=None,
                    save_dtype: str = "bfloat16") -> None:
    """Export our LM params to an HF-MistralForCausalLM directory
    (config.json + model.safetensors, and the tokenizer if given).

    The inverse of `load_mistral` / `convert_hf_state_dict`: unstacks the
    scan's leading layer axis and transposes back to nn.Linear's [out, in].
    Lets checkpoints trained here feed any HF-layout consumer — including
    our own inference CLIs and the reference implementation (the reference
    trains through HF Trainer, so its artifacts are HF dirs; ours become
    interchangeable).  torch.bfloat16 round-trips through safetensors;
    `save_dtype="float32"` widens for consumers that can't read bf16."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    hf_cfg = {
        "architectures": ["MistralForCausalLM"],
        "model_type": "mistral",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "sliding_window": cfg.sliding_window,
        "tie_word_embeddings": False,
        "torch_dtype": save_dtype,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)

    # bf16 numpy arrays carry a non-standard dtype; safetensors handles
    # them via ml_dtypes.  float32 export stays plain numpy.
    dt = jnp.dtype(save_dtype)

    def to_np(x):
        return np.asarray(jnp.asarray(x).astype(dt))

    sd = {
        "model.embed_tokens.weight": to_np(params["embed"]),
        "model.norm.weight": to_np(params["final_norm"]),
        "lm_head.weight": to_np(jnp.swapaxes(jnp.asarray(params["lm_head"]), 0, 1)),
    }
    names = {
        "ln1": ("input_layernorm.weight", False),
        "ln2": ("post_attention_layernorm.weight", False),
        "wq": ("self_attn.q_proj.weight", True),
        "wk": ("self_attn.k_proj.weight", True),
        "wv": ("self_attn.v_proj.weight", True),
        "wo": ("self_attn.o_proj.weight", True),
        "w_gate": ("mlp.gate_proj.weight", True),
        "w_up": ("mlp.up_proj.weight", True),
        "w_down": ("mlp.down_proj.weight", True),
    }
    for ours, (theirs, transpose) in names.items():
        stacked = jnp.asarray(params["layers"][ours])
        for i in range(cfg.num_layers):
            layer = stacked[i]
            if transpose:
                layer = jnp.swapaxes(layer, 0, 1)
            sd[f"model.layers.{i}.{theirs}"] = to_np(layer)
    save_file(sd, os.path.join(path, "model.safetensors"))
    if tokenizer is not None:
        tokenizer.save(path)


def load_voicebox(path: str, cfg=None):
    """Local HubMixin Voicebox dir -> (params, VoiceboxConfig)."""
    from usdm_tpu.core.config import VoiceboxConfig
    from usdm_tpu.models.voicebox import convert_reference_state_dict

    if cfg is None:
        cfg_file = os.path.join(path, "config.json")
        with open(cfg_file) as f:
            rc = json.load(f)
        cfg = VoiceboxConfig(
            n_feats=rc.get("n_feats", 80),
            n_tokens=rc.get("n_tokens", 10000),
            embedding_dim=rc.get("embedding_dim", 1280),
            hidden_size=rc.get("hidden_size", 1024),
            intermediate_size=rc.get("intermediate_size", 4096),
            num_heads=rc.get("num_attention_heads", 16),
            num_layers=rc.get("num_hidden_layers", 24),
            convpos_width=rc.get("convpos_width", 31),
            convpos_groups=rc.get("convpos_groups", 16),
            convpos_depth=rc.get("convpos_depth", 2),
            sigma_min=rc.get("sigma_min", 1e-4),
        )
    state = read_state_dict(path)
    return convert_reference_state_dict(state, cfg), cfg


def load_bigvgan(path: str, cfg=None):
    """Local BigVGAN dir (config.json + bigvgan_generator.pt) -> (params, cfg)."""
    from usdm_tpu.core.config import BigVGANConfig
    from usdm_tpu.models.bigvgan import convert_reference_state_dict

    if cfg is None:
        with open(os.path.join(path, "config.json")) as f:
            h = json.load(f)
        cfg = BigVGANConfig(
            num_mels=h["num_mels"],
            upsample_initial_channel=h["upsample_initial_channel"],
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(tuple(d) for d in h["resblock_dilation_sizes"]),
            resblock=str(h["resblock"]),
            activation=h["activation"],
            snake_logscale=h["snake_logscale"],
            sampling_rate=h["sampling_rate"],
        )
    state = read_state_dict(path)
    return convert_reference_state_dict(state, cfg), cfg


def load_xlsr(path: str, kmeans_path: Optional[str] = None, cfg=None):
    """Local XLS-R checkpoint -> (params, XlsrConfig).

    Accepts BOTH real-world layouts:
      * an HF `Wav2Vec2Model` directory (config.json + safetensors/bin), or
      * the fairseq2 `xlsr2_1b_v2` checkpoint the reference actually ships —
        a torch `.pt` (possibly under a `{"model": ...}` wrapper) with
        `encoder_frontend.*` / `encoder.layers.*` keys
        (/root/reference/src/inference.py:111-113, setup.py:49).
    Detection is by key prefix; fairseq2 checkpoints carry no config, so the
    fixed xlsr2_1b_v2 geometry (XlsrConfig defaults) applies unless `cfg`
    overrides it.
    """
    from usdm_tpu.core.config import XlsrConfig
    from usdm_tpu.models.xlsr import (
        convert_fairseq2_state_dict,
        convert_hf_state_dict,
        load_kmeans,
    )

    state = read_state_dict(path)
    state = {k.removeprefix("wav2vec2."): v for k, v in state.items()}
    is_fairseq2 = any(k.startswith("encoder_frontend.") for k in state)
    if cfg is None:
        cfg_file = os.path.join(path, "config.json") if os.path.isdir(path) else ""
        if not is_fairseq2 and os.path.exists(cfg_file):
            with open(cfg_file) as f:
                h = json.load(f)
            cfg = XlsrConfig(
                conv_channels=h["conv_dim"][0],
                conv_kernels=tuple(h["conv_kernel"]),
                conv_strides=tuple(h["conv_stride"]),
                hidden_size=h["hidden_size"],
                intermediate_size=h["intermediate_size"],
                num_heads=h["num_attention_heads"],
                num_layers=h["num_hidden_layers"],
                conv_pos_width=h["num_conv_pos_embeddings"],
                conv_pos_groups=h["num_conv_pos_embedding_groups"],
            )
        else:
            cfg = XlsrConfig()  # fairseq2 checkpoints: fixed xlsr2_1b_v2 geometry
    if is_fairseq2:
        params = convert_fairseq2_state_dict(state, cfg)
    else:
        params = convert_hf_state_dict(state, cfg)
    if kmeans_path:
        params = load_kmeans(params, kmeans_path)
    return params, cfg


# ---------------------------------------------------------------------------
# Orbax-native train-state checkpointing
# ---------------------------------------------------------------------------


def save_train_state(path: str, state: Any, step: int, keep: int = 2) -> None:
    """Async orbax save of an arbitrary pytree under `path/step_N`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    mngr = ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    )
    mngr.save(step, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()
    mngr.close()


def latest_step(path: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    mngr = ocp.CheckpointManager(path)
    step = mngr.latest_step()
    mngr.close()
    return step


def restore_train_state(path: str, template: Any, step: Optional[int] = None) -> Any:
    """Restore a pytree saved by save_train_state; `template` provides
    structure/shardings (abstract arrays ok)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    mngr = ocp.CheckpointManager(path)
    if step is None:
        step = mngr.latest_step()
    out = mngr.restore(step, args=ocp.args.StandardRestore(template))
    mngr.close()
    return out
