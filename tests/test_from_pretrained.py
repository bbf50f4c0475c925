"""Full-geometry UsdmPipeline.from_pretrained round-trip.

Real checkpoints don't exist in this sandbox; this writes synthetic
checkpoint directories in each reference format at the REAL tensor widths
(42,003-token vocab, 4096-hidden LM, 1280-wide XLS-R, 1024/1280 Voicebox,
1536-channel BigVGAN — layer counts reduced to 2 for CPU time) and drives
one full speech-to-speech turn, so the loading path is exercised at real
geometry every round (transposes/width mistakes can't hide behind tiny
configs)."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from usdm_tpu.audio.wav import write_wav
from usdm_tpu.core.tokenizer import UsdmTokenizer


def _write_llm_dir(d):
    """HF-Mistral dir at USDM-7B widths, 2 layers, f16 safetensors."""
    from safetensors.numpy import save_file

    V, H, F, HKV = 42003, 4096, 14336, 8 * 128
    cfg = {
        "vocab_size": V, "hidden_size": H, "intermediate_size": F,
        "num_hidden_layers": 2, "num_attention_heads": 32,
        "num_key_value_heads": 8, "head_dim": 128, "rope_theta": 10000.0,
        "rms_norm_eps": 1e-5, "sliding_window": 4096,
    }
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(0)

    def r(*shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(np.float16)

    sd = {"model.embed_tokens.weight": r(V, H), "lm_head.weight": r(V, H),
          "model.norm.weight": np.ones(H, np.float16)}
    for i in range(2):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = np.ones(H, np.float16)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones(H, np.float16)
        sd[f"{p}.self_attn.q_proj.weight"] = r(H, H)
        sd[f"{p}.self_attn.k_proj.weight"] = r(HKV, H)
        sd[f"{p}.self_attn.v_proj.weight"] = r(HKV, H)
        sd[f"{p}.self_attn.o_proj.weight"] = r(H, H)
        sd[f"{p}.mlp.gate_proj.weight"] = r(F, H)
        sd[f"{p}.mlp.up_proj.weight"] = r(F, H)
        sd[f"{p}.mlp.down_proj.weight"] = r(H, F)
    save_file(sd, str(d / "model.safetensors"))
    tok = UsdmTokenizer.build_synthetic_full()
    tok.save(str(d))
    (d / "tokenizer_config.json").write_text(json.dumps({"model_max_length": 8192}))


def _write_xlsr_dir(d, kmeans_path):
    """HF Wav2Vec2Model at xlsr2_1b_v2 widths (1280 hidden), 2 layers."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    hf_cfg = Wav2Vec2Config(
        vocab_size=32, hidden_size=1280, num_hidden_layers=2,
        num_attention_heads=16, intermediate_size=5120,
        conv_dim=[512] * 7, conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    Wav2Vec2Model(hf_cfg).eval().save_pretrained(d)
    cents = np.random.default_rng(1).standard_normal((10000, 1280)).astype(np.float32)
    np.save(kmeans_path, cents)


def _write_voicebox_dir(d):
    """HubMixin dir at real widths (E=1280, H=1024, F=4096), 2 layers."""
    L, H, F, E, nf = 2, 1024, 4096, 1280, 80
    cfg = {
        "n_feats": nf, "n_tokens": 10000, "embedding_dim": E,
        "hidden_size": H, "intermediate_size": F, "num_attention_heads": 16,
        "num_hidden_layers": L, "convpos_width": 31, "convpos_groups": 16,
        "convpos_depth": 2, "sigma_min": 1e-4,
    }
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    torch.manual_seed(1)

    def r(*shape):
        return torch.randn(*shape) * 0.02

    sd = {
        "estimator.embed.weight": r(10001, E),
        "estimator.proj_in.weight": r(H, 2 * nf + E, 1),
        "estimator.proj_in.bias": r(H),
        "estimator.proj_out.weight": r(nf, H, 1),
        "estimator.proj_out.bias": r(nf),
        "estimator.layer_norm.weight": torch.ones(H),
        "estimator.layer_norm.bias": torch.zeros(H),
    }
    for i in range(2):
        sd[f"estimator.pos_conv_embeds.{i}.conv.weight_g"] = torch.rand(1, 1, 31) + 0.5
        sd[f"estimator.pos_conv_embeds.{i}.conv.weight_v"] = r(H, H // 16, 31)
        sd[f"estimator.pos_conv_embeds.{i}.conv.bias"] = r(H)
    for i in range(L):
        for nm in ["q_proj", "k_proj", "v_proj", "out_proj"]:
            sd[f"estimator.layers.{i}.attention.{nm}.weight"] = r(H, H)
            sd[f"estimator.layers.{i}.attention.{nm}.bias"] = r(H)
        sd[f"estimator.layers.{i}.layer_norm.weight"] = torch.ones(H)
        sd[f"estimator.layers.{i}.layer_norm.bias"] = torch.zeros(H)
        sd[f"estimator.layers.{i}.final_layer_norm.weight"] = torch.ones(H)
        sd[f"estimator.layers.{i}.final_layer_norm.bias"] = torch.zeros(H)
        sd[f"estimator.layers.{i}.feed_forward.intermediate_dense.weight"] = r(F, H)
        sd[f"estimator.layers.{i}.feed_forward.intermediate_dense.bias"] = r(F)
        sd[f"estimator.layers.{i}.feed_forward.output_dense.weight"] = r(H, F)
        sd[f"estimator.layers.{i}.feed_forward.output_dense.bias"] = r(H)
    for i in range(L // 2):
        sd[f"estimator.skip_connections_layers.{i}.weight"] = r(H, 2 * H)
        sd[f"estimator.skip_connections_layers.{i}.bias"] = r(H)
    torch.save(sd, d / "pytorch_model.bin")


def _write_bigvgan_dir(d):
    """nvidia/bigvgan_22khz_80band geometry (1536 initial channels)."""
    from usdm_tpu.core.config import BigVGANConfig

    cfg = BigVGANConfig()
    h = {
        "num_mels": cfg.num_mels,
        "upsample_initial_channel": cfg.upsample_initial_channel,
        "upsample_rates": list(cfg.upsample_rates),
        "upsample_kernel_sizes": list(cfg.upsample_kernel_sizes),
        "resblock_kernel_sizes": list(cfg.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(x) for x in cfg.resblock_dilation_sizes],
        "resblock": cfg.resblock, "activation": cfg.activation,
        "snake_logscale": cfg.snake_logscale, "sampling_rate": cfg.sampling_rate,
    }
    d.mkdir()
    (d / "config.json").write_text(json.dumps(h))
    torch.manual_seed(2)
    sd = {}
    ch0 = cfg.upsample_initial_channel

    def wn(prefix, shape, bias_dim):
        sd[prefix + ".weight_v"] = torch.randn(*shape) * 0.02
        sd[prefix + ".weight_g"] = torch.rand(shape[0], *([1] * (len(shape) - 1))) + 0.5
        sd[prefix + ".bias"] = torch.randn(bias_dim) * 0.02

    wn("conv_pre", (ch0, cfg.num_mels, 7), ch0)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin, cout = ch0 // (2**i), ch0 // (2 ** (i + 1))
        wn(f"ups.{i}.0", (cin, cout, k), cout)
        for j, kernel in enumerate(cfg.resblock_kernel_sizes):
            r = i * nk + j
            for ci in range(len(cfg.resblock_dilation_sizes[j])):
                wn(f"resblocks.{r}.convs1.{ci}", (cout, cout, kernel), cout)
                wn(f"resblocks.{r}.convs2.{ci}", (cout, cout, kernel), cout)
            for ai in range(2 * len(cfg.resblock_dilation_sizes[j])):
                sd[f"resblocks.{r}.activations.{ai}.act.alpha"] = torch.randn(cout)
                sd[f"resblocks.{r}.activations.{ai}.act.beta"] = torch.randn(cout)
    ch_last = ch0 // (2 ** len(cfg.upsample_rates))
    sd["activation_post.act.alpha"] = torch.randn(ch_last)
    sd["activation_post.act.beta"] = torch.randn(ch_last)
    wn("conv_post", (1, ch_last, 7), 1)
    torch.save({"generator": sd}, d / "bigvgan_generator.pt")


def test_from_pretrained_full_geometry(tmp_path):
    from usdm_tpu.pipeline import UsdmPipeline

    _write_llm_dir(tmp_path / "llm")
    _write_xlsr_dir(tmp_path / "xlsr", tmp_path / "kmeans.npy")
    _write_voicebox_dir(tmp_path / "vb")
    _write_bigvgan_dir(tmp_path / "bv")

    pipe = UsdmPipeline.from_pretrained(
        llm_dir=str(tmp_path / "llm"),
        xlsr_dir=str(tmp_path / "xlsr"),
        kmeans_path=str(tmp_path / "kmeans.npy"),
        voicebox_dir=str(tmp_path / "vb"),
        bigvgan_dir=str(tmp_path / "bv"),
        lm_dtype="float32",
    )
    assert pipe.lm_cfg.vocab_size == 42003 and pipe.lm_cfg.hidden_size == 4096
    assert pipe.xlsr_cfg.hidden_size == 1280
    assert pipe.tokenizer.vocab_size == 42003
    # the synthetic XLS-R has 2 layers; retarget the feature tap (real
    # checkpoints carry 48 layers and tap 35)
    pipe = dataclasses.replace(
        pipe,
        xlsr_cfg=pipe.xlsr_cfg.replace(output_layer=2),
        max_new_tokens=4,
    )

    wav_path = str(tmp_path / "user.wav")
    write_wav(wav_path, (np.random.default_rng(3).standard_normal(8000) * 0.1
                         ).astype(np.float32), 16000)
    out_path = str(tmp_path / "agent.wav")
    res = pipe.respond(wav_path, out_path, n_timesteps=2, top_k=0, temperature=1.0)
    # random weights: content is noise, but the full path must run at real
    # geometry and produce units in range + finite audio
    assert all(0 <= u < 10000 for u in res.agent_units)
    assert len(res.stage_tokens["unit2text"]) >= 1
    if res.agent_units:
        import scipy.io.wavfile as wavfile

        sr, audio = wavfile.read(out_path)
        assert sr == 22050 and np.isfinite(audio).all()
