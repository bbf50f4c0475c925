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


def _weight_norm_split(w, dim: int = 0):
    """Split a folded weight into torch weight_norm (g, v) with v = w:
    ||v|| then equals g, so g * v/||v|| reconstructs w exactly.  `dim` is the
    torch weight_norm dim (kept dimension of g)."""
    import torch

    dims = [d for d in range(w.dim()) if d != dim]
    g = torch.linalg.vector_norm(w, dim=dims, keepdim=True)
    return g, w.clone()


def save_voicebox_hub(path: str, params, cfg) -> None:
    """Export Voicebox params as a HubMixin-style dir (config.json +
    pytorch_model.bin with estimator.* keys) — the format the reference's
    training saves (decoder/scripts/train.py:305-318) and our `load_voicebox`
    reads back.  The convpos conv is weight_norm-parameterized in the
    reference (networks.py:78-82, dim=2); its weight is written as
    parametrizations.weight.original0/original1 so a strict
    `load_state_dict` into the reference module accepts the export
    (tests/test_reference_golden.py round-trips it)."""
    import torch

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({
            "n_feats": cfg.n_feats, "n_tokens": cfg.n_tokens,
            "embedding_dim": cfg.embedding_dim, "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_attention_heads": cfg.num_heads,
            "num_hidden_layers": cfg.num_layers,
            "convpos_width": cfg.convpos_width,
            "convpos_groups": cfg.convpos_groups,
            "convpos_depth": cfg.convpos_depth,
            "sigma_min": cfg.sigma_min,
        }, f, indent=2)

    def t(x):
        return torch.from_numpy(np.array(x, np.float32))  # copy: torch wants writable

    p = params
    sd = {
        "estimator.embed.weight": t(p["embed"]),
        # ours [in, out] -> torch Conv1d-1x1 [out, in, 1]
        "estimator.proj_in.weight": t(np.asarray(p["proj_in_w"]).T[:, :, None]),
        "estimator.proj_in.bias": t(p["proj_in_b"]),
        "estimator.proj_out.weight": t(np.asarray(p["proj_out_w"]).T[:, :, None]),
        "estimator.proj_out.bias": t(p["proj_out_b"]),
        "estimator.layer_norm.weight": t(p["ln0_w"]),
        "estimator.layer_norm.bias": t(p["ln0_b"]),
    }
    for i in range(cfg.convpos_depth):
        # ours [w, in/g, out] -> torch [out, in/g, w], split as weight_norm
        # dim=2 (g over dims 0,1) the way the reference parameterizes it
        g, v = _weight_norm_split(t(np.asarray(p["convpos_w"][i]).transpose(2, 1, 0)), dim=2)
        sd[f"estimator.pos_conv_embeds.{i}.conv.parametrizations.weight.original0"] = g
        sd[f"estimator.pos_conv_embeds.{i}.conv.parametrizations.weight.original1"] = v
        sd[f"estimator.pos_conv_embeds.{i}.conv.bias"] = t(p["convpos_b"][i])
    lp = p["layers"]
    names = [("wq", "bq", "attention.q_proj"), ("wk", "bk", "attention.k_proj"),
             ("wv", "bv", "attention.v_proj"), ("wo", "bo", "attention.out_proj"),
             ("ffn_w1", "ffn_b1", "feed_forward.intermediate_dense"),
             ("ffn_w2", "ffn_b2", "feed_forward.output_dense")]
    for i in range(cfg.num_layers):
        for wk_, bk_, nm in names:
            sd[f"estimator.layers.{i}.{nm}.weight"] = t(np.asarray(lp[wk_][i]).T)
            sd[f"estimator.layers.{i}.{nm}.bias"] = t(lp[bk_][i])
        sd[f"estimator.layers.{i}.layer_norm.weight"] = t(lp["ln1_w"][i])
        sd[f"estimator.layers.{i}.layer_norm.bias"] = t(lp["ln1_b"][i])
        sd[f"estimator.layers.{i}.final_layer_norm.weight"] = t(lp["ln2_w"][i])
        sd[f"estimator.layers.{i}.final_layer_norm.bias"] = t(lp["ln2_b"][i])
    for i in range(cfg.num_layers // 2):
        sd[f"estimator.skip_connections_layers.{i}.weight"] = t(np.asarray(p["skip_w"][i]).T)
        sd[f"estimator.skip_connections_layers.{i}.bias"] = t(p["skip_b"][i])
    torch.save(sd, os.path.join(path, "pytorch_model.bin"))


def save_bigvgan_generator(path: str, params, cfg) -> None:
    """Export BigVGAN generator params as config.json + bigvgan_generator.pt
    ({"generator": state_dict}) — the reference checkpoint layout our
    `load_bigvgan` reads.  Every conv is weight_norm-parameterized in the
    reference (vocoder/models.py:150-182, nn.utils.weight_norm dim=0), so
    weights are written split as weight_g/weight_v — a strict
    `load_state_dict` into the reference generator accepts the export
    (tests/test_reference_golden.py round-trips it)."""
    import torch

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({
            "num_mels": cfg.num_mels,
            "upsample_initial_channel": cfg.upsample_initial_channel,
            "upsample_rates": list(cfg.upsample_rates),
            "upsample_kernel_sizes": list(cfg.upsample_kernel_sizes),
            "resblock_kernel_sizes": list(cfg.resblock_kernel_sizes),
            "resblock_dilation_sizes": [list(d) for d in cfg.resblock_dilation_sizes],
            "resblock": cfg.resblock, "activation": cfg.activation,
            "snake_logscale": cfg.snake_logscale,
            "sampling_rate": cfg.sampling_rate,
        }, f, indent=2)

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x, np.float32)))

    sd = {}

    def put_wn(key, w):  # folded torch-layout weight -> weight_g/weight_v
        g, v = _weight_norm_split(w, dim=0)
        sd[key + ".weight_g"] = g
        sd[key + ".weight_v"] = v

    def conv_t(w):  # ours [K, in, out] -> torch Conv1d [out, in, K]
        return t(np.asarray(w).transpose(2, 1, 0))

    def convT_t(w):  # ours [K, out, in] flipped -> torch ConvTranspose1d [in, out, K]
        return t(np.asarray(w).transpose(2, 1, 0)[:, :, ::-1])

    # Activation1d's anti-aliasing low-pass FIRs are fixed registered buffers
    # in the reference state dict (alias_free_torch/resample.py: ratio 2,
    # kernel 12, cutoff 0.25, half_width 0.3 for both up and down paths)
    from usdm_tpu.models.bigvgan import kaiser_sinc_filter1d

    aa_filter = t(kaiser_sinc_filter1d(0.25, 0.3, 12)[None, None, :])

    def put_act1d(key):
        sd[key + ".upsample.filter"] = aa_filter.clone()
        sd[key + ".downsample.lowpass.filter"] = aa_filter.clone()

    p = params
    put_wn("conv_pre", conv_t(p["conv_pre_w"]))
    put_wn("conv_post", conv_t(p["conv_post_w"]))
    put_act1d("activation_post")
    sd.update({"conv_pre.bias": t(p["conv_pre_b"]),
               "conv_post.bias": t(p["conv_post_b"]),
               "activation_post.act.alpha": t(p["act_post"]["alpha"])})
    if cfg.activation == "snakebeta":
        sd["activation_post.act.beta"] = t(p["act_post"]["beta"])
    nk = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        put_wn(f"ups.{i}.0", convT_t(p["ups"][i]["w"]))
        sd[f"ups.{i}.0.bias"] = t(p["ups"][i]["b"])
        for j in range(nk):
            r = i * nk + j
            block = p["resblocks"][r]
            for ci, c in enumerate(block["convs1"]):
                put_wn(f"resblocks.{r}.convs1.{ci}", conv_t(c["w"]))
                sd[f"resblocks.{r}.convs1.{ci}.bias"] = t(c["b"])
            for ci, c in enumerate(block["convs2"]):
                put_wn(f"resblocks.{r}.convs2.{ci}", conv_t(c["w"]))
                sd[f"resblocks.{r}.convs2.{ci}.bias"] = t(c["b"])
            for ai, act in enumerate(block["acts"]):
                put_act1d(f"resblocks.{r}.activations.{ai}")
                sd[f"resblocks.{r}.activations.{ai}.act.alpha"] = t(act["alpha"])
                if cfg.activation == "snakebeta":
                    sd[f"resblocks.{r}.activations.{ai}.act.beta"] = t(act["beta"])
    torch.save({"generator": sd}, os.path.join(path, "bigvgan_generator.pt"))


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
