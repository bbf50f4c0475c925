"""XLS-R speech tokenizer golden tests vs HF Wav2Vec2 (torch CPU oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from usdm_tpu.core.config import XlsrConfig
from usdm_tpu.models import xlsr as X

CFG = XlsrConfig.tiny()


def _hf_model(cfg: XlsrConfig):
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    hf_cfg = Wav2Vec2Config(
        vocab_size=32,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=[cfg.conv_channels] * len(cfg.conv_kernels),
        conv_kernel=list(cfg.conv_kernels),
        conv_stride=list(cfg.conv_strides),
        conv_bias=True,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        num_conv_pos_embeddings=cfg.conv_pos_width,
        num_conv_pos_embedding_groups=cfg.conv_pos_groups,
        hidden_act="gelu",
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    return Wav2Vec2Model(hf_cfg).eval()


@pytest.fixture(scope="module")
def models():
    hf = _hf_model(CFG)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = X.convert_hf_state_dict(state, CFG)
    return hf, params


def test_conv_feature_lengths():
    n = X.conv_feature_lengths(CFG, 16000)
    # strides 5*2*2 = 20x downsample for the tiny config
    assert n == (((16000 - 10) // 5 + 1 - 3) // 2 + 1 - 2) // 2 + 1


def test_encoder_matches_hf_full_depth(models, rng):
    hf, params = models
    wav = rng.standard_normal((1, 3200)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    # HF applies a FINAL layer norm after all layers (stable-layer-norm
    # encoder); our tap path returns pre-final-LN states, so compare a
    # manually-normalized tap at full depth.
    with jax.default_matmul_precision("highest"):
        feats, flen = X.encode(params, CFG, jnp.asarray(wav), output_layer=CFG.num_layers,
                               normalize=False)
        # apply HF's encoder.layer_norm for comparison
        w = np.asarray(hf.encoder.layer_norm.weight.detach())
        b_ = np.asarray(hf.encoder.layer_norm.bias.detach())
        ours = np.asarray(feats)
        mu = ours.mean(-1, keepdims=True)
        var = ours.var(-1, keepdims=True)
        ours = (ours - mu) / np.sqrt(var + 1e-5) * w + b_
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_intermediate_tap_matches_hf(models, rng):
    """Tap after layer k == HF hidden_states[k] (what UnitExtractor uses)."""
    hf, params = models
    wav = rng.standard_normal((1, 3200)).astype(np.float32) * 0.1
    tap = 3
    with torch.no_grad():
        out = hf(torch.from_numpy(wav), output_hidden_states=True)
        ref = out.hidden_states[tap].numpy()
    with jax.default_matmul_precision("highest"):
        feats, _ = X.encode(params, CFG, jnp.asarray(wav), output_layer=tap, normalize=False)
    np.testing.assert_allclose(np.asarray(feats), ref, rtol=2e-3, atol=2e-4)


def test_kmeans_assign_matches_bruteforce(rng):
    feats = rng.standard_normal((5, 7, 16)).astype(np.float32)
    cents = rng.standard_normal((11, 16)).astype(np.float32)
    got = np.asarray(X.kmeans_assign(jnp.asarray(feats), jnp.asarray(cents)))
    d = ((feats[..., None, :] - cents[None, None]) ** 2).sum(-1)
    ref = d.argmin(-1)
    np.testing.assert_array_equal(got, ref)


def test_extract_units_shapes_and_padding(models, rng):
    _, params = models
    wav = rng.standard_normal((2, 3200)).astype(np.float32) * 0.1
    lengths = jnp.asarray([3200, 2000])
    units, ulen = X.extract_units(params, CFG, jnp.asarray(wav), lengths)
    assert units.shape[0] == 2
    assert int(ulen[0]) == X.conv_feature_lengths(CFG, 3200)
    assert int(ulen[1]) == X.conv_feature_lengths(CFG, 2000)
    assert (np.asarray(units) >= 0).all() and (np.asarray(units) < CFG.num_clusters).all()


def test_batch_padding_invariance(models, rng):
    """A short utterance padded inside a batch must produce the same units as
    alone (within its valid frames)."""
    _, params = models
    a = rng.standard_normal(2000).astype(np.float32) * 0.1
    b = rng.standard_normal(3200).astype(np.float32) * 0.1
    solo_units, solo_len = X.extract_units(params, CFG, jnp.asarray(a[None]), jnp.asarray([2000]))
    batch = np.zeros((2, 3200), np.float32)
    batch[0, :2000] = a
    batch[1] = b
    bu, bl = X.extract_units(params, CFG, jnp.asarray(batch), jnp.asarray([2000, 3200]))
    n = int(solo_len[0])
    assert int(bl[0]) == n
    np.testing.assert_array_equal(np.asarray(solo_units)[0, :n], np.asarray(bu)[0, :n])


def test_encode_features_padding_exact(models, rng):
    """Length-padding must be bit-invisible at the FEATURE level (not just
    after k-means argmax): the positional conv mixes neighboring frames, so
    without the pre-pos-conv tail zeroing the last ~width/2 valid frames of
    a padded run would differ from an exact-length run."""
    _, params = models
    a = rng.standard_normal(2000).astype(np.float32) * 0.1
    exact, el = X.encode(params, CFG, jnp.asarray(a[None]), jnp.asarray([2000]))
    padded = np.zeros((1, 3600), np.float32)
    padded[0, :2000] = a
    pad_out, pl = X.encode(params, CFG, jnp.asarray(padded), jnp.asarray([2000]))
    n = int(el[0])
    assert int(pl[0]) == n
    np.testing.assert_allclose(np.asarray(exact)[0, :n], np.asarray(pad_out)[0, :n],
                               rtol=1e-6, atol=1e-6)


def test_extract_units_bucketed_degenerate(models):
    """Empty / sub-kernel-length wavs must yield ZERO units, not a bucket of
    garbage (negative feat_len used to slice as [:-1])."""
    _, params = models
    for n in (0, 1, CFG.conv_kernels[0] - 1):
        assert X.extract_units_bucketed(params, CFG, np.zeros(n, np.float32)) == []


def test_encode_flash_matches_xla(models, rng, monkeypatch):
    """The TPU path (attn_impl="flash", VERDICT-r3 item 6) must match the XLA
    path at the feature level, and exactly at the unit level.  Run the Pallas
    kernel in interpret mode on CPU; includes a padded-length row so the
    segment-(-1) tail masking is exercised through the flash kernel too."""
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    _, params = models
    wav = rng.standard_normal((2, 3200)).astype(np.float32) * 0.1
    lengths = jnp.asarray([3200, 2000])
    fx, lx = X.encode(params, CFG, jnp.asarray(wav), lengths,
                      attn_impl="xla")
    ff, lf = X.encode(params, CFG, jnp.asarray(wav), lengths,
                      attn_impl="flash")
    np.testing.assert_array_equal(np.asarray(lx), np.asarray(lf))
    for i, n in enumerate(np.asarray(lx)):
        np.testing.assert_allclose(np.asarray(fx)[i, :n], np.asarray(ff)[i, :n],
                                   rtol=2e-5, atol=2e-5)
    ux = X.kmeans_assign(fx, params["centroids"])
    uf = X.kmeans_assign(ff, params["centroids"])
    for i, n in enumerate(np.asarray(lx)):
        np.testing.assert_array_equal(np.asarray(ux)[i, :n],
                                      np.asarray(uf)[i, :n])
