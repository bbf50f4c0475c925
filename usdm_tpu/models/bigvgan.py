"""BigVGAN vocoder (generator + GAN training heads), pure-functional JAX.

TPU-first rebuild of the reference vocoder (/root/reference/src/decoder/
voicebox/vocoder/models.py, activations.py, alias_free_torch/): a HiFi-GAN
style generator whose resblocks use anti-aliased Snake/SnakeBeta activations —
each activation is an up-sample(2x, kaiser-sinc) -> snake -> down-sample(2x)
sandwich (alias_free_torch/act.py:8-27) — plus the multi-period and
multi-resolution discriminators and GAN losses used for training
(models.py:316-488).

Layout is [B, T, C] channels-last throughout (XLA-friendly); the public API
keeps the reference's [B, n_mels, T] mel input / [B, 1, T] wav output
contract.  All convs are `lax.conv_general_dilated` on the MXU; the
anti-alias filters are precomputed numpy constants.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from usdm_tpu.core.config import BigVGANConfig

Params = Dict[str, Any]
_PREC = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Kaiser-windowed sinc low-pass filters (alias_free_torch/filter.py:28-57)
# ---------------------------------------------------------------------------


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """[kernel_size] normalized low-pass FIR (sum = 1)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2

    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)  # symmetric, matches torch periodic=False

    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def _replicate_pad(x: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    """Replicate-pad along the time axis of [B, T, C]."""
    return jnp.pad(x, ((0, 0), (lo, hi), (0, 0)), mode="edge")


def _depthwise_conv(x: jnp.ndarray, filt: np.ndarray, stride: int) -> jnp.ndarray:
    """[B, T, C] depthwise conv with a shared 1-D filter."""
    c = x.shape[-1]
    w = jnp.asarray(filt)[:, None, None] * jnp.ones((1, 1, c), x.dtype)  # [K, 1, C]
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding=[(0, 0)],
        dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=c,
        precision=_PREC,
    )


def upsample2(x: jnp.ndarray, ratio: int = 2, kernel_size: int = 12) -> jnp.ndarray:
    """Anti-aliased ratio-x upsample (alias_free_torch/resample.py:10-33):
    replicate-pad, zero-stuff by `ratio`, depthwise sinc filter, crop."""
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    pad = kernel_size // ratio - 1
    pad_left = pad * ratio + (kernel_size - ratio) // 2
    pad_right = pad * ratio + (kernel_size - ratio + 1) // 2
    c = x.shape[-1]
    x = _replicate_pad(x, pad, pad)
    # conv_transpose(stride=r, filter K) == lhs_dilation=r full conv; the
    # sinc filter is symmetric so kernel flipping is a no-op.
    w = jnp.asarray(filt)[:, None, None] * jnp.ones((1, 1, c), x.dtype)
    y = jax.lax.conv_general_dilated(
        x, (ratio * w).astype(x.dtype), window_strides=(1,),
        padding=[(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(ratio,),
        dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=c,
        precision=_PREC,
    )
    return y[:, pad_left : y.shape[1] - pad_right]


def downsample2(x: jnp.ndarray, ratio: int = 2, kernel_size: int = 12) -> jnp.ndarray:
    """Anti-aliased ratio-x downsample (resample.py:36-48 + filter.py:60-94):
    replicate-pad then strided depthwise sinc filter."""
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    x = _replicate_pad(x, pad_left, pad_right)
    return _depthwise_conv(x, filt, stride=ratio)


# ---------------------------------------------------------------------------
# Snake activations (activations.py:9-119)
# ---------------------------------------------------------------------------


def snake(x: jnp.ndarray, alpha: jnp.ndarray, logscale: bool) -> jnp.ndarray:
    """x + (1/α)·sin²(αx), α per channel; x: [B, T, C]."""
    if logscale:
        alpha = jnp.exp(alpha)
    a = alpha[None, None, :]
    return x + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(x * a))


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray, logscale: bool) -> jnp.ndarray:
    """x + (1/β)·sin²(αx) (SnakeBeta, activations.py:62-119)."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    a = alpha[None, None, :]
    b = beta[None, None, :]
    return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(x * a))


def activation1d(x: jnp.ndarray, act_params: Dict[str, jnp.ndarray], cfg: BigVGANConfig) -> jnp.ndarray:
    """up(2x) -> snake -> down(2x) anti-aliasing sandwich (act.py:8-27).

    On TPU the whole sandwich runs as ONE Pallas pass (ops/fused_act.py:
    the 2x intermediate never round-trips HBM); elsewhere, and for
    gradients, the plain three-op composition below."""
    if cfg.fused_act:
        from usdm_tpu.ops.fused_act import fused_activation1d

        snakebeta = cfg.activation == "snakebeta"
        return fused_activation1d(
            x, act_params["alpha"], act_params.get("beta") if snakebeta else None,
            cfg.snake_logscale, snakebeta)
    x = upsample2(x)
    if cfg.activation == "snakebeta":
        x = snake_beta(x, act_params["alpha"], act_params["beta"], cfg.snake_logscale)
    else:
        x = snake(x, act_params["alpha"], cfg.snake_logscale)
    return downsample2(x)


# ---------------------------------------------------------------------------
# Convolution helpers (channels-last; weights stored [K, Cin/g, Cout])
# ---------------------------------------------------------------------------


def conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, stride: int = 1,
           dilation: int = 1, padding: int = 0) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NTC", "TIO", "NTC"),
        precision=_PREC,
    )
    return y + b


def conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, stride: int,
                     padding: int) -> jnp.ndarray:
    """torch ConvTranspose1d equivalent.  w stored [K, Cout, Cin] pre-flipped
    at conversion time so this is one dilated conv."""
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x, jnp.swapaxes(w, 1, 2).astype(x.dtype),  # [K, Cin, Cout]
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NTC", "TIO", "NTC"),
        precision=_PREC,
    )
    return y + b


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


def init_generator(cfg: BigVGANConfig, key: jax.Array) -> Params:
    ks = iter(jax.random.split(key, 256))

    def conv_w(k, ksize, cin, cout, std=0.01):
        return jax.random.normal(k, (ksize, cin, cout), jnp.float32) * std

    ch0 = cfg.upsample_initial_channel
    params: Params = {
        "conv_pre_w": conv_w(next(ks), 7, cfg.num_mels, ch0),
        "conv_pre_b": jnp.zeros((ch0,)),
        "ups": [],
        "resblocks": [],
    }
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin = ch0 // (2**i)
        cout = ch0 // (2 ** (i + 1))
        params["ups"].append({
            # stored [K, Cout, Cin] (pre-flipped torch convtranspose layout)
            "w": conv_w(next(ks), k, cout, cin),
            "b": jnp.zeros((cout,)),
        })
        for kernel, dilations in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            block = {"convs1": [], "convs2": [], "acts": []}
            n_act = 2 * len(dilations) if cfg.resblock == "1" else len(dilations)
            for d in dilations:
                block["convs1"].append({
                    "w": conv_w(next(ks), kernel, cout, cout), "b": jnp.zeros((cout,)),
                })
                if cfg.resblock == "1":
                    block["convs2"].append({
                        "w": conv_w(next(ks), kernel, cout, cout), "b": jnp.zeros((cout,)),
                    })
            for _ in range(n_act):
                act = {"alpha": jnp.zeros((cout,))}
                if cfg.activation == "snakebeta":
                    act["beta"] = jnp.zeros((cout,))
                block["acts"].append(act)
            params["resblocks"].append(block)
    ch_last = ch0 // (2 ** len(cfg.upsample_rates))
    params["act_post"] = {"alpha": jnp.zeros((ch_last,))}
    if cfg.activation == "snakebeta":
        params["act_post"]["beta"] = jnp.zeros((ch_last,))
    params["conv_post_w"] = conv_w(next(ks), 7, ch_last, 1)
    params["conv_post_b"] = jnp.zeros((1,))
    return params


def _amp_block(cfg: BigVGANConfig, bp: Params, x: jnp.ndarray, kernel: int,
               dilations: Sequence[int]) -> jnp.ndarray:
    """AMPBlock1 (models.py:28-79): (act, dilated conv, act, conv) x3 with
    residual; AMPBlock2 (models.py:88-124): (act, dilated conv) x n.
    Dilations are static (from cfg), never traced."""
    if cfg.resblock == "1":
        acts1 = bp["acts"][0::2]
        acts2 = bp["acts"][1::2]
        for c1, c2, a1, a2, d in zip(bp["convs1"], bp["convs2"], acts1, acts2, dilations):
            xt = activation1d(x, a1, cfg)
            xt = conv1d(xt, c1["w"], c1["b"], dilation=d, padding=get_padding(kernel, d))
            xt = activation1d(xt, a2, cfg)
            xt = conv1d(xt, c2["w"], c2["b"], dilation=1, padding=get_padding(kernel, 1))
            x = xt + x
    else:
        for c, a, d in zip(bp["convs1"], bp["acts"], dilations):
            xt = activation1d(x, a, cfg)
            xt = conv1d(xt, c["w"], c["b"], dilation=d, padding=get_padding(kernel, d))
            x = xt + x
    return x


@partial(jax.jit, static_argnames=("cfg",))
def generator(params: Params, cfg: BigVGANConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, n_mels, T] -> waveform [B, 1, T * prod(upsample_rates)].

    Mirrors BigVGAN.forward (models.py:189-211): pre conv, per-stage
    transposed-conv upsample + mean of `num_kernels` AMP blocks, post
    activation + conv + tanh.
    """
    x = jnp.swapaxes(mel, 1, 2)  # [B, T, C]
    x = conv1d(x, params["conv_pre_w"], params["conv_pre_b"], padding=3)

    nk = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        up = params["ups"][i]
        x = conv_transpose1d(x, up["w"], up["b"], stride=u, padding=(k - u) // 2)
        xs = None
        for j, kernel in enumerate(cfg.resblock_kernel_sizes):
            out = _amp_block(cfg, params["resblocks"][i * nk + j], x, kernel,
                             cfg.resblock_dilation_sizes[j])
            xs = out if xs is None else xs + out
        x = xs / nk

    x = activation1d(x, params["act_post"], cfg)
    x = conv1d(x, params["conv_post_w"], params["conv_post_b"], padding=3)
    x = jnp.tanh(x)
    return jnp.swapaxes(x, 1, 2)  # [B, 1, T]


# ---------------------------------------------------------------------------
# Reference checkpoint conversion
# ---------------------------------------------------------------------------


def _fold_wn(state: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    """Fold torch weight_norm (dim=0): w = g * v / ||v||_{all dims but 0}."""
    if f"{prefix}.weight" in state:
        return np.asarray(state[f"{prefix}.weight"])
    if f"{prefix}.weight_g" in state:
        g = np.asarray(state[f"{prefix}.weight_g"])
        v = np.asarray(state[f"{prefix}.weight_v"])
    else:
        g = np.asarray(state[f"{prefix}.parametrizations.weight.original0"])
        v = np.asarray(state[f"{prefix}.parametrizations.weight.original1"])
    norm = np.sqrt((v * v).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def convert_reference_state_dict(state: Dict[str, np.ndarray], cfg: BigVGANConfig) -> Params:
    """Map the nvidia/bigvgan `generator` state dict to our params.

    torch Conv1d [out, in, K] -> ours [K, in, out]; ConvTranspose1d
    [in, out, K] -> ours [K, out, in] with the kernel flipped along K (so the
    forward pass is a single dilated conv).
    """

    def conv(prefix):
        w = _fold_wn(state, prefix)  # [out, in, K]
        return jnp.asarray(w.transpose(2, 1, 0).astype(np.float32))

    def convT(prefix):
        w = _fold_wn(state, prefix)  # [in, out, K]
        w = w[:, :, ::-1]  # flip kernel
        return jnp.asarray(np.ascontiguousarray(w.transpose(2, 1, 0)).astype(np.float32))  # [K, out, in]

    def b(prefix):
        return jnp.asarray(np.asarray(state[prefix + ".bias"]).astype(np.float32))

    params: Params = {
        "conv_pre_w": conv("conv_pre"), "conv_pre_b": b("conv_pre"),
        "ups": [], "resblocks": [],
    }
    nk = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        params["ups"].append({"w": convT(f"ups.{i}.0"), "b": b(f"ups.{i}.0")})
        for j in range(nk):
            r = i * nk + j
            dilations = cfg.resblock_dilation_sizes[j]
            block = {"convs1": [], "convs2": [], "acts": []}
            for ci in range(len(dilations)):
                block["convs1"].append({"w": conv(f"resblocks.{r}.convs1.{ci}"),
                                        "b": b(f"resblocks.{r}.convs1.{ci}")})
                if cfg.resblock == "1":
                    block["convs2"].append({"w": conv(f"resblocks.{r}.convs2.{ci}"),
                                            "b": b(f"resblocks.{r}.convs2.{ci}")})
            n_act = 2 * len(dilations) if cfg.resblock == "1" else len(dilations)
            for ai in range(n_act):
                act = {"alpha": jnp.asarray(np.asarray(state[f"resblocks.{r}.activations.{ai}.act.alpha"]).astype(np.float32))}
                if cfg.activation == "snakebeta":
                    act["beta"] = jnp.asarray(np.asarray(state[f"resblocks.{r}.activations.{ai}.act.beta"]).astype(np.float32))
                block["acts"].append(act)
            params["resblocks"].append(block)
    params["act_post"] = {"alpha": jnp.asarray(np.asarray(state["activation_post.act.alpha"]).astype(np.float32))}
    if cfg.activation == "snakebeta":
        params["act_post"]["beta"] = jnp.asarray(np.asarray(state["activation_post.act.beta"]).astype(np.float32))
    params["conv_post_w"] = conv("conv_post")
    params["conv_post_b"] = b("conv_post")
    return params


# ---------------------------------------------------------------------------
# Discriminators + GAN losses (training side of C14; models.py:316-488)
# ---------------------------------------------------------------------------


def init_period_discriminator(key: jax.Array, period: int, d_mult: int = 1,
                              kernel_size: int = 5, stride: int = 3) -> Params:
    """DiscriminatorP (models.py:316-350): 2-D convs over a [T/p, p] reshape."""
    ks = iter(jax.random.split(key, 8))
    chans = [1, int(32 * d_mult), int(128 * d_mult), int(512 * d_mult),
             int(1024 * d_mult), int(1024 * d_mult)]
    convs = []
    for i in range(5):
        st = (stride, 1) if i < 4 else (1, 1)
        kk = (kernel_size, 1)
        w = jax.random.normal(next(ks), (kk[0], kk[1], chans[i], chans[i + 1]), jnp.float32) * 0.02
        convs.append({"w": w, "b": jnp.zeros((chans[i + 1],)), "stride": None})
    post = {
        "w": jax.random.normal(next(ks), (3, 1, chans[-1], 1), jnp.float32) * 0.02,
        "b": jnp.zeros((1,)),
    }
    # period/kernel/stride are static structure, kept out of the param pytree
    return {"convs": convs, "post": post}


def _conv2d(x, w, b, stride, padding):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_PREC,
    )
    return y + b


def _leaky_relu(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


def period_discriminator(dp: Params, wav: jnp.ndarray, period: int,
                         kernel_size: int = 5, stride: int = 3) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """wav [B, 1, T] -> (score [B, N], feature maps).  Pads T to a multiple of
    the period with reflection, then runs strided (k, 1) 2-D convs."""
    p = period
    b, _, t = wav.shape
    if t % p != 0:
        n_pad = p - (t % p)
        wav = jnp.pad(wav, ((0, 0), (0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    x = wav.reshape(b, 1, t // p, p).transpose(0, 2, 3, 1)  # NHWC: [B, T/p, p, 1]
    fmap = []
    ksz = kernel_size
    pad = (ksz - 1) // 2  # get_padding(5, 1)
    for i, c in enumerate(dp["convs"]):
        st = (stride, 1) if i < 4 else (1, 1)
        padding = [(pad, pad), (0, 0)] if i < 4 else [(2, 2), (0, 0)]
        x = _conv2d(x, c["w"], c["b"], st, padding)
        x = _leaky_relu(x)
        fmap.append(x)
    x = _conv2d(x, dp["post"]["w"], dp["post"]["b"], (1, 1), [(1, 1), (0, 0)])
    fmap.append(x)
    return x.reshape(b, -1), fmap


DEFAULT_PERIODS = (2, 3, 5, 7, 11)


def init_mpd(key: jax.Array, periods: Sequence[int] = DEFAULT_PERIODS, d_mult: int = 1) -> List[Params]:
    keys = jax.random.split(key, len(periods))
    return [init_period_discriminator(k, p, d_mult) for k, p in zip(keys, periods)]


def init_resolution_discriminator(key: jax.Array, d_mult: int = 1) -> Params:
    """DiscriminatorR convs (models.py:377-402): 2-D convs over |STFT|."""
    ks = iter(jax.random.split(key, 8))
    c = int(32 * d_mult)
    shapes = [
        ((3, 9), 1, c, (1, 1)),
        ((3, 9), c, c, (1, 2)),
        ((3, 9), c, c, (1, 2)),
        ((3, 9), c, c, (1, 2)),
        ((3, 3), c, c, (1, 1)),
    ]
    convs = []
    for (kh, kw), cin, cout, st in shapes:
        w = jax.random.normal(next(ks), (kh, kw, cin, cout), jnp.float32) * 0.02
        convs.append({"w": w, "b": jnp.zeros((cout,))})
    post = {"w": jax.random.normal(next(ks), (3, 3, c, 1), jnp.float32) * 0.02,
            "b": jnp.zeros((1,))}
    return {"convs": convs, "post": post}


def _stft_mag(wav: jnp.ndarray, n_fft: int, hop: int, win: int) -> jnp.ndarray:
    """[B, T] -> [B, F, frames] magnitude, torch.stft(center=False) semantics
    with the reference's (n_fft - hop)/2 reflect pre-pad (models.py:419-427)."""
    pad = int((n_fft - hop) / 2)
    wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    # reference uses rectangular window (no window arg to torch.stft)
    t = wav.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = wav[:, idx]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-12)
    return jnp.swapaxes(mag, -1, -2)


def resolution_discriminator(dr: Params, wav: jnp.ndarray, resolution: Sequence[int]) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """wav [B, 1, T] with resolution (n_fft, hop, win)."""
    n_fft, hop, win = resolution
    mag = _stft_mag(wav[:, 0, :], n_fft, hop, win)  # [B, F, TT]
    x = mag[:, :, :, None]  # NHWC
    fmap = []
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    for c, st in zip(dr["convs"], strides):
        kh, kw = c["w"].shape[0], c["w"].shape[1]
        x = _conv2d(x, c["w"], c["b"], st, [(kh // 2, kh // 2), (kw // 2, kw // 2)])
        x = _leaky_relu(x)
        fmap.append(x)
    x = _conv2d(x, dr["post"]["w"], dr["post"]["b"], (1, 1), [(1, 1), (1, 1)])
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


DEFAULT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def init_mrd(key: jax.Array, n: int = 3, d_mult: int = 1) -> List[Params]:
    keys = jax.random.split(key, n)
    return [init_resolution_discriminator(k, d_mult) for k in keys]


def discriminate(mpd: List[Params], mrd: List[Params], resolutions, real: jnp.ndarray, fake: jnp.ndarray,
                 periods: Sequence[int] = DEFAULT_PERIODS):
    """Run all discriminators on (real, fake) -> scores + feature maps."""
    y_r, y_g, f_r, f_g = [], [], [], []
    for dp, period in zip(mpd, periods):
        sr, fr = period_discriminator(dp, real, period)
        sg, fg = period_discriminator(dp, fake, period)
        y_r.append(sr); y_g.append(sg); f_r.append(fr); f_g.append(fg)
    for dr, res in zip(mrd, resolutions):
        sr, fr = resolution_discriminator(dr, real, res)
        sg, fg = resolution_discriminator(dr, fake, res)
        y_r.append(sr); y_g.append(sg); f_r.append(fr); f_g.append(fg)
    return y_r, y_g, f_r, f_g


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """2 * sum of mean|fr - fg| (models.py:458-464)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return 2.0 * loss


def discriminator_loss(real_outs, gen_outs) -> Tuple[jnp.ndarray, List, List]:
    """LSGAN discriminator loss (models.py:467-478)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(real_outs, gen_outs):
        r = jnp.mean(jnp.square(1.0 - dr))
        g = jnp.mean(jnp.square(dg))
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outs) -> Tuple[jnp.ndarray, List]:
    """LSGAN generator loss (models.py:481-488)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outs:
        l = jnp.mean(jnp.square(1.0 - dg))
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses
