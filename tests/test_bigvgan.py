"""BigVGAN tests vs independent torch oracles for the tricky conv plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from usdm_tpu.core.config import BigVGANConfig
from usdm_tpu.models import bigvgan as BV

CFG = BigVGANConfig.tiny()


def test_kaiser_filter_matches_torch():
    for k in (12, 13):
        ours = BV.kaiser_sinc_filter1d(0.25, 0.3, k)
        # torch oracle: same formula with torch.kaiser_window(periodic=False)
        import math
        half_size = k // 2
        delta_f = 4 * 0.3
        a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
        beta = 0.1102 * (a - 8.7) if a > 50 else (0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0) if a >= 21 else 0.0)
        win = torch.kaiser_window(k, beta=beta, periodic=False)
        time = (torch.arange(-half_size, half_size) + 0.5) if k % 2 == 0 else (torch.arange(k) - half_size)
        filt = 2 * 0.25 * win * torch.sinc(2 * 0.25 * time)
        filt = filt / filt.sum()
        np.testing.assert_allclose(ours, filt.numpy(), rtol=1e-5, atol=1e-6)
        assert abs(ours.sum() - 1.0) < 1e-6


def test_conv_transpose_matches_torch(rng):
    b, t, cin, cout, k, stride = 2, 16, 4, 6, 8, 4
    pad = (k - stride) // 2
    x = rng.standard_normal((b, cin, t)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)  # torch layout
    bias = rng.standard_normal(cout).astype(np.float32)
    ref = tF.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                              torch.from_numpy(bias), stride=stride, padding=pad).numpy()
    # ours: [K, Cout, Cin] pre-flipped
    w_ours = jnp.asarray(np.ascontiguousarray(w[:, :, ::-1].transpose(2, 1, 0)))
    x_ours = jnp.asarray(x.transpose(0, 2, 1))  # [B, T, C]
    got = BV.conv_transpose1d(x_ours, w_ours, jnp.asarray(bias), stride=stride, padding=pad)
    got = np.asarray(got).transpose(0, 2, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def _torch_upsample(x, ratio=2, kernel_size=12):
    filt = torch.from_numpy(BV.kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size))[None, None]
    c = x.shape[1]
    pad = kernel_size // ratio - 1
    pad_left = pad * ratio + (kernel_size - ratio) // 2
    pad_right = pad * ratio + (kernel_size - ratio + 1) // 2
    xp = tF.pad(x, (pad, pad), mode="replicate")
    y = ratio * tF.conv_transpose1d(xp, filt.expand(c, -1, -1), stride=ratio, groups=c)
    return y[..., pad_left:-pad_right]


def _torch_downsample(x, ratio=2, kernel_size=12):
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = torch.from_numpy(BV.kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size))[None, None]
    c = x.shape[1]
    xp = tF.pad(x, (pad_left, pad_right), mode="replicate")
    return tF.conv1d(xp, filt.expand(c, -1, -1), stride=ratio, groups=c)


def test_upsample2_matches_torch(rng):
    x = rng.standard_normal((1, 3, 40)).astype(np.float32)
    ref = _torch_upsample(torch.from_numpy(x)).numpy()
    got = np.asarray(BV.upsample2(jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    assert got.shape == ref.shape == (1, 3, 80)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_downsample2_matches_torch(rng):
    x = rng.standard_normal((1, 3, 80)).astype(np.float32)
    ref = _torch_downsample(torch.from_numpy(x)).numpy()
    got = np.asarray(BV.downsample2(jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_up_down_roundtrip_preserves_band_limited(rng):
    """A band-limited signal should survive up->down nearly unchanged."""
    t = np.arange(256) / 256
    x = np.sin(2 * np.pi * 8 * t).astype(np.float32)[None, :, None]
    y = np.asarray(BV.downsample2(BV.upsample2(jnp.asarray(x))))
    interior = slice(16, -16)
    np.testing.assert_allclose(y[0, interior, 0], x[0, interior, 0], atol=2e-3)


def test_snake_formula(rng):
    x = rng.standard_normal((2, 10, 4)).astype(np.float32)
    alpha = rng.standard_normal(4).astype(np.float32)
    beta = rng.standard_normal(4).astype(np.float32)
    got = np.asarray(BV.snake_beta(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta), logscale=True))
    a = np.exp(alpha)[None, None, :]
    b = np.exp(beta)[None, None, :]
    ref = x + (1.0 / (b + 1e-9)) * np.sin(x * a) ** 2
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    got2 = np.asarray(BV.snake(jnp.asarray(x), jnp.asarray(np.abs(alpha)), logscale=False))
    a2 = np.abs(alpha)[None, None, :]
    ref2 = x + (1.0 / (a2 + 1e-9)) * np.sin(x * a2) ** 2
    np.testing.assert_allclose(got2, ref2, rtol=1e-5, atol=1e-6)


def test_generator_shape_and_finite(rng):
    params = BV.init_generator(CFG, jax.random.PRNGKey(0))
    mel = jnp.asarray(rng.standard_normal((1, CFG.num_mels, 12)).astype(np.float32))
    wav = BV.generator(params, CFG, mel)
    assert wav.shape == (1, 1, 12 * CFG.total_upsample)
    assert bool(jnp.all(jnp.isfinite(wav)))
    assert float(jnp.max(jnp.abs(wav))) <= 1.0


def test_convert_reference_state_dict_shapes():
    """Synthetic reference-layout state dict (with weight norm) converts to
    our shapes and folds g·v/||v|| correctly."""
    torch.manual_seed(0)
    cfg = CFG
    sd = {}
    ch0 = cfg.upsample_initial_channel

    def wn(prefix, shape, dim0):
        v = torch.randn(*shape)
        g = torch.rand(dim0, *([1] * (len(shape) - 1))) + 0.5
        sd[prefix + ".weight_v"] = v
        sd[prefix + ".weight_g"] = g
        sd[prefix + ".bias"] = torch.randn(shape[1] if "ups" in prefix else shape[0])

    wn("conv_pre", (ch0, cfg.num_mels, 7), ch0)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin = ch0 // (2**i)
        cout = ch0 // (2 ** (i + 1))
        wn(f"ups.{i}.0", (cin, cout, k), cin)
        for j, kernel in enumerate(cfg.resblock_kernel_sizes):
            r = i * nk + j
            dil = cfg.resblock_dilation_sizes[j]
            for ci in range(len(dil)):
                wn(f"resblocks.{r}.convs1.{ci}", (cout, cout, kernel), cout)
                wn(f"resblocks.{r}.convs2.{ci}", (cout, cout, kernel), cout)
            for ai in range(2 * len(dil)):
                sd[f"resblocks.{r}.activations.{ai}.act.alpha"] = torch.randn(cout)
                sd[f"resblocks.{r}.activations.{ai}.act.beta"] = torch.randn(cout)
    ch_last = ch0 // (2 ** len(cfg.upsample_rates))
    sd["activation_post.act.alpha"] = torch.randn(ch_last)
    sd["activation_post.act.beta"] = torch.randn(ch_last)
    wn("conv_post", (1, ch_last, 7), 1)

    npsd = {k: v.numpy() for k, v in sd.items()}
    params = BV.convert_reference_state_dict(npsd, cfg)
    ref = BV.init_generator(cfg, jax.random.PRNGKey(0))
    assert jax.tree.map(lambda a: a.shape, params) == jax.tree.map(lambda a: a.shape, ref)

    # run the converted generator
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((1, cfg.num_mels, 8)).astype(np.float32))
    wav = BV.generator(params, cfg, mel)
    assert bool(jnp.all(jnp.isfinite(wav)))
