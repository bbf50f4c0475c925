"""Checkpoint loader tests: real HF/torch directory formats round-trip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from usdm_tpu.core import checkpoint as ckpt
from usdm_tpu.core.config import MistralConfig, TrainConfig


def test_load_mistral_hf_dir(tmp_path, rng):
    """save_pretrained dir -> load_mistral -> logits match HF forward."""
    from transformers import MistralConfig as HFConfig
    from transformers.models.mistral.modeling_mistral import MistralForCausalLM

    hf_cfg = HFConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        rms_norm_eps=1e-5, rope_theta=10000.0, sliding_window=32,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = MistralForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path / "m")

    params, cfg = ckpt.load_mistral(str(tmp_path / "m"), dtype="float32")
    assert cfg.vocab_size == 64 and cfg.num_layers == 2 and cfg.head_dim == 8

    from usdm_tpu.models import mistral as M

    ids = rng.integers(0, 64, (1, 10))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(M.forward(params, cfg, jnp.asarray(ids), attn_impl="xla"))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_load_bigvgan_dir(tmp_path):
    """config.json + bigvgan_generator.pt ({'generator': sd}) loads."""
    from usdm_tpu.core.config import BigVGANConfig
    from usdm_tpu.models import bigvgan as BV

    cfg = BigVGANConfig.tiny()
    h = {
        "num_mels": cfg.num_mels,
        "upsample_initial_channel": cfg.upsample_initial_channel,
        "upsample_rates": list(cfg.upsample_rates),
        "upsample_kernel_sizes": list(cfg.upsample_kernel_sizes),
        "resblock_kernel_sizes": list(cfg.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(d) for d in cfg.resblock_dilation_sizes],
        "resblock": cfg.resblock,
        "activation": cfg.activation,
        "snake_logscale": cfg.snake_logscale,
        "sampling_rate": cfg.sampling_rate,
    }
    d = tmp_path / "bv"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(h))

    # build a weight-normed torch state dict matching the reference layout
    torch.manual_seed(0)
    sd = {}
    ch0 = cfg.upsample_initial_channel

    def wn(prefix, shape, bias_dim):
        v = torch.randn(*shape)
        g = torch.rand(shape[0], *([1] * (len(shape) - 1))) + 0.5
        sd[prefix + ".weight_v"] = v
        sd[prefix + ".weight_g"] = g
        sd[prefix + ".bias"] = torch.randn(bias_dim)

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

    params, loaded_cfg = ckpt.load_bigvgan(str(d))
    assert loaded_cfg == cfg
    wav = BV.generator(params, loaded_cfg, jnp.zeros((1, cfg.num_mels, 8)))
    assert bool(jnp.all(jnp.isfinite(wav)))


def test_orbax_roundtrip(tmp_path):
    from usdm_tpu.core.mesh import create_mesh
    from usdm_tpu.train import lm as T

    cfg = MistralConfig.tiny(vocab_size=64)
    tc = TrainConfig(batch_size=1, max_steps=4)
    mesh = create_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    state, _ = T.init_state(cfg, tc, mesh, jax.random.PRNGKey(0))

    path = str(tmp_path / "ckpt")
    ckpt.save_train_state(path, state, step=3)
    assert ckpt.latest_step(path) == 3
    restored = ckpt.restore_train_state(path, state)
    np.testing.assert_array_equal(
        np.asarray(restored.params["layers"]["wq"]), np.asarray(state.params["layers"]["wq"])
    )
    assert int(restored.step) == int(state.step)

    # second save with keep=2, then latest
    ckpt.save_train_state(path, state, step=7, keep=2)
    assert ckpt.latest_step(path) == 7


def test_load_xlsr_hf_dir(tmp_path, rng):
    """HF Wav2Vec2Model save_pretrained dir + kmeans npy -> loader -> units
    match the direct converter path."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    from usdm_tpu.core.config import XlsrConfig
    from usdm_tpu.models import xlsr as X

    cfg = XlsrConfig.tiny()
    hf_cfg = Wav2Vec2Config(
        vocab_size=32, hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
        conv_dim=[cfg.conv_channels] * len(cfg.conv_kernels),
        conv_kernel=list(cfg.conv_kernels), conv_stride=list(cfg.conv_strides),
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        num_conv_pos_embeddings=cfg.conv_pos_width,
        num_conv_pos_embedding_groups=cfg.conv_pos_groups,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    model = Wav2Vec2Model(hf_cfg).eval()
    model.save_pretrained(tmp_path / "x")
    cents = rng.standard_normal((cfg.num_clusters, cfg.hidden_size)).astype(np.float32)
    np.save(tmp_path / "kmeans.npy", cents)

    params, loaded_cfg = ckpt.load_xlsr(str(tmp_path / "x"), str(tmp_path / "kmeans.npy"))
    assert loaded_cfg.hidden_size == cfg.hidden_size
    assert loaded_cfg.conv_strides == cfg.conv_strides
    np.testing.assert_array_equal(np.asarray(params["centroids"]), cents)

    wav = jnp.asarray((rng.standard_normal((1, 3200)) * 0.1).astype(np.float32))
    units, ulen = X.extract_units(params, loaded_cfg, wav, output_layer=loaded_cfg.num_layers)
    u = np.asarray(units)[0, : int(ulen[0])]
    assert (u >= 0).all() and (u < cfg.num_clusters).all()


def _hf_to_fairseq2_names(state):
    """Rename an HF Wav2Vec2Model state dict to the fairseq2 xlsr2_1b_v2
    layout (same tensors, fairseq2 names)."""
    import re

    out = {}
    for k, v in state.items():
        n = k
        n = n.replace("feature_extractor.conv_layers.",
                      "encoder_frontend.feature_extractor.layers.")
        n = n.replace("feature_projection.layer_norm.",
                      "encoder_frontend.post_extract_layer_norm.")
        n = n.replace("feature_projection.projection.",
                      "encoder_frontend.model_dim_proj.")
        n = n.replace("encoder.pos_conv_embed.conv.",
                      "encoder_frontend.pos_encoder.conv.")
        n = re.sub(r"encoder\.layers\.(\d+)\.attention\.out_proj\.",
                   r"encoder.layers.\1.self_attn.output_proj.", n)
        n = re.sub(r"encoder\.layers\.(\d+)\.attention\.",
                   r"encoder.layers.\1.self_attn.", n)
        n = re.sub(r"encoder\.layers\.(\d+)\.layer_norm\.",
                   r"encoder.layers.\1.self_attn_layer_norm.", n)
        n = re.sub(r"encoder\.layers\.(\d+)\.final_layer_norm\.",
                   r"encoder.layers.\1.ffn_layer_norm.", n)
        n = re.sub(r"encoder\.layers\.(\d+)\.feed_forward\.intermediate_dense\.",
                   r"encoder.layers.\1.ffn.inner_proj.", n)
        n = re.sub(r"encoder\.layers\.(\d+)\.feed_forward\.output_dense\.",
                   r"encoder.layers.\1.ffn.output_proj.", n)
        out[n] = v
    return out


def test_load_xlsr_fairseq2_checkpoint(tmp_path, rng):
    """The fairseq2 xlsr2_1b_v2 layout (the reference's actual tokenizer
    artifact, inference.py:111-113) must load and produce params identical to
    the HF-layout conversion of the same tensors."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    from usdm_tpu.core.config import XlsrConfig
    from usdm_tpu.models import xlsr as X

    cfg = XlsrConfig.tiny()
    hf_cfg = Wav2Vec2Config(
        vocab_size=32, hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
        conv_dim=[cfg.conv_channels] * len(cfg.conv_kernels),
        conv_kernel=list(cfg.conv_kernels), conv_stride=list(cfg.conv_strides),
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        num_conv_pos_embeddings=cfg.conv_pos_width,
        num_conv_pos_embedding_groups=cfg.conv_pos_groups,
        apply_spec_augment=False,
    )
    torch.manual_seed(1)
    model = Wav2Vec2Model(hf_cfg).eval()
    hf_state = {k: v.numpy() for k, v in model.state_dict().items()}
    p_hf = X.convert_hf_state_dict(hf_state, cfg)

    fs2 = _hf_to_fairseq2_names(hf_state)
    # fairseq2 checkpoints also carry pretraining-only tensors: must be ignored
    fs2["masker.temporal_mask_embed"] = np.zeros(cfg.hidden_size, np.float32)
    fs2["quantizer.entries"] = np.zeros((4, 8), np.float32)
    fs2["final_proj.weight"] = np.zeros((8, cfg.hidden_size), np.float32)
    p_fs2 = X.convert_fairseq2_state_dict(fs2, cfg)

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p_hf, p_fs2,
    )

    # and through the file loader, with the {"model": ...} wrapper + kmeans
    pt = {k: torch.from_numpy(np.asarray(v)) for k, v in fs2.items()}
    torch.save({"model": pt}, tmp_path / "xlsr2_tiny_v2.pt")
    cents = rng.standard_normal((cfg.num_clusters, cfg.hidden_size)).astype(np.float32)
    np.save(tmp_path / "kmeans.npy", cents)
    params, loaded_cfg = ckpt.load_xlsr(
        str(tmp_path / "xlsr2_tiny_v2.pt"), str(tmp_path / "kmeans.npy"), cfg=cfg
    )
    np.testing.assert_array_equal(np.asarray(params["centroids"]), cents)
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["wq"]), np.asarray(p_hf["layers"]["wq"])
    )

    # units from the loaded params are valid
    wav = jnp.asarray((rng.standard_normal((1, 3200)) * 0.1).astype(np.float32))
    units, ulen = X.extract_units(params, loaded_cfg, wav, output_layer=loaded_cfg.num_layers)
    u = np.asarray(units)[0, : int(ulen[0])]
    assert (u >= 0).all() and (u < cfg.num_clusters).all()


def test_save_mistral_hf_roundtrip(tmp_path, rng):
    """save_mistral_hf -> load_mistral reproduces identical logits (our
    trained checkpoints feed our own inference / any HF consumer)."""
    import jax
    import jax.numpy as jnp

    from usdm_tpu.core import checkpoint as ckpt
    from usdm_tpu.core.config import MistralConfig
    from usdm_tpu.models import mistral as M

    cfg = MistralConfig.tiny(vocab_size=128)
    params = M.init_params(cfg, jax.random.PRNGKey(3), dtype="float32")
    d = str(tmp_path / "hf")
    ckpt.save_mistral_hf(d, params, cfg, save_dtype="float32")

    re_params, re_cfg = ckpt.load_mistral(d, dtype="float32")
    assert re_cfg.vocab_size == cfg.vocab_size
    assert re_cfg.num_layers == cfg.num_layers
    ids = jnp.asarray(rng.integers(0, 128, (1, 16)))
    with jax.default_matmul_precision("highest"):
        a = M.forward(params, cfg, ids, attn_impl="xla")
        b = M.forward(re_params, re_cfg, ids, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_train_pt_export_hf_smoke(tmp_path):
    """train_pt --tiny --export_hf emits a loadable HF dir."""
    from usdm_tpu.cli.train_pt import main as pt_main
    from usdm_tpu.core import checkpoint as ckpt

    data = tmp_path / "packed"
    data.mkdir()
    rows = [" ".join(str(i % 500) for i in range(32)) for _ in range(4)]
    (data / "part0.txt").write_text("\n".join(rows))
    out = str(tmp_path / "out")
    exp = str(tmp_path / "hf")
    rc = pt_main(["--output_dir", out, "--data_path", str(data), "--tiny",
                  "--max_steps", "2", "--train_batch_size", "8",
                  "--max_input_length", "32", "--export_hf", exp])
    assert rc == 0
    params, cfg = ckpt.load_mistral(exp)
    assert params["embed"].shape[0] == cfg.vocab_size


def test_train_draft_cli_smoke(tmp_path):
    """train_draft --tiny distills an early-exit draft, logs agreement, and
    exports an HF dir whose geometry matches --draft_layers (ready for
    --draft_dir on serve/infer)."""
    from usdm_tpu.cli.train_draft import main as draft_main
    from usdm_tpu.core import checkpoint as ckpt

    data = tmp_path / "packed"
    data.mkdir()
    rows = [" ".join(str(i % 500) for i in range(32)) for _ in range(4)]
    (data / "part0.txt").write_text("\n".join(rows))
    out = str(tmp_path / "out")
    exp = str(tmp_path / "draft_hf")
    rc = draft_main(["--output_dir", out, "--data_path", str(data), "--tiny",
                     "--draft_layers", "1", "--max_steps", "2",
                     "--train_batch_size", "8", "--max_input_length", "32",
                     "--quantize_target", "--export_hf", exp])
    assert rc == 0
    params, cfg = ckpt.load_mistral(exp)
    assert cfg.num_layers == 1
    assert params["layers"]["wq"].shape[0] == 1


def test_save_voicebox_hub_roundtrip(tmp_path, rng):
    """save_voicebox_hub -> load_voicebox reproduces identical estimator
    outputs."""
    import jax
    import jax.numpy as jnp

    from usdm_tpu.core import checkpoint as ckpt
    from usdm_tpu.core.config import VoiceboxConfig
    from usdm_tpu.models import voicebox as VB

    cfg = VoiceboxConfig.tiny()
    params = VB.init_params(cfg, jax.random.PRNGKey(4))
    d = str(tmp_path / "vb")
    ckpt.save_voicebox_hub(d, params, cfg)
    re_params, re_cfg = ckpt.load_voicebox(d)
    assert re_cfg.num_layers == cfg.num_layers

    B, T = 1, 12
    x = jnp.asarray(rng.integers(0, cfg.n_tokens, (B, T)))
    z = jnp.asarray(rng.standard_normal((B, cfg.n_feats, T)), jnp.float32)
    c = jnp.zeros((B, cfg.n_feats, T), jnp.float32)
    t = jnp.full((B,), 0.3, jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    with jax.default_matmul_precision("highest"):
        a = VB.estimator(params, cfg, x, z, c, t, lens, attn_impl="xla")
        b = VB.estimator(re_params, re_cfg, x, z, c, t, lens, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_save_bigvgan_roundtrip(tmp_path, rng):
    """save_bigvgan_generator -> load_bigvgan reproduces identical audio."""
    import jax
    import jax.numpy as jnp

    from usdm_tpu.core import checkpoint as ckpt
    from usdm_tpu.core.config import BigVGANConfig
    from usdm_tpu.models import bigvgan as BGV

    cfg = BigVGANConfig.tiny()
    params = BGV.init_generator(cfg, jax.random.PRNGKey(5))
    d = str(tmp_path / "bv")
    ckpt.save_bigvgan_generator(d, params, cfg)
    re_params, re_cfg = ckpt.load_bigvgan(d)

    mel = jnp.asarray(rng.standard_normal((1, cfg.num_mels, 9)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        a = BGV.generator(params, cfg, mel)
        b = BGV.generator(re_params, re_cfg, mel)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
