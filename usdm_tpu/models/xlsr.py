"""XLS-R speech tokenizer: wav2vec2 encoder + k-means unit assignment.

TPU-native replacement for SeamlessM4T's `UnitExtractor` (reference external
dep; invoked at /root/reference/src/inference.py:111-113 with
`xlsr2_1b_v2` + `kmeans_10k.npy`, features tapped at transformer layer 35):

  raw 16 kHz wav -> 7-layer conv feature extractor (320x downsample = 50 Hz)
  -> feature projection -> conv positional embedding -> N pre-LN ("stable
  layer norm") transformer layers, hidden states tapped after layer
  `output_layer` -> nearest-centroid assignment over 10,000 k-means
  centroids -> unit ids.

The architecture matches HF's `Wav2Vec2Model` with
`do_stable_layer_norm=True, feat_extract_norm="layer"` (the XLS-R
configuration), so real checkpoints convert directly from the HF format;
k-means centroids load from the reference's `.npy`.

TPU-first details: the tap is a *slice of the stacked layer parameters*
(`layers[:output_layer]`) fed to one `lax.scan` — layers past the tap are
never computed (the reference runs fairseq2's encoder with an early-exit
hook).  The k-means assignment is a single [T, D] x [D, K] matmul + argmin on
the MXU, not a vector-quantizer loop.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from usdm_tpu.core.config import XlsrConfig
from usdm_tpu.ops.attention import mha

Params = Dict[str, Any]
_PREC = jax.lax.Precision.HIGHEST


def _gelu(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def _layer_norm(x, w, b, eps=1e-5):
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)).astype(dt)) * w + b


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(cfg: XlsrConfig, key: jax.Array) -> Params:
    ks = iter(jax.random.split(key, 32))
    C, H, F, L = cfg.conv_channels, cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    def dense(k, fan_in, *shape):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    convs = []
    cin = 1
    for kern, stride in zip(cfg.conv_kernels, cfg.conv_strides):
        convs.append({
            "w": dense(next(ks), cin * kern, kern, cin, C),
            "b": jnp.zeros((C,)),
            "ln_w": jnp.ones((C,)),
            "ln_b": jnp.zeros((C,)),
        })
        cin = C

    def stack(fan_in, *shape):
        return dense(next(ks), fan_in, L, *shape)

    return {
        "convs": convs,
        "feat_ln_w": jnp.ones((C,)), "feat_ln_b": jnp.zeros((C,)),
        "proj_w": dense(next(ks), C, C, H), "proj_b": jnp.zeros((H,)),
        "pos_conv_w": dense(next(ks), H * cfg.conv_pos_width // cfg.conv_pos_groups,
                            cfg.conv_pos_width, H // cfg.conv_pos_groups, H),
        "pos_conv_b": jnp.zeros((H,)),
        "layers": {
            "ln1_w": jnp.ones((L, H)), "ln1_b": jnp.zeros((L, H)),
            "wq": stack(H, H, H), "bq": jnp.zeros((L, H)),
            "wk": stack(H, H, H), "bk": jnp.zeros((L, H)),
            "wv": stack(H, H, H), "bv": jnp.zeros((L, H)),
            "wo": stack(H, H, H), "bo": jnp.zeros((L, H)),
            "ln2_w": jnp.ones((L, H)), "ln2_b": jnp.zeros((L, H)),
            "ffn_w1": stack(H, H, F), "ffn_b1": jnp.zeros((L, F)),
            "ffn_w2": stack(F, F, H), "ffn_b2": jnp.zeros((L, H)),
        },
        # k-means centroids [K, D]; identity-ish placeholder until loaded
        "centroids": jax.random.normal(next(ks), (cfg.num_clusters, H), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def conv_feature_lengths(cfg: XlsrConfig, n_samples: int) -> int:
    """Output frame count of the conv extractor for a given sample count."""
    t = n_samples
    for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
        t = (t - k) // s + 1
    return t


def feature_extractor(params: Params, cfg: XlsrConfig, wav: jnp.ndarray) -> jnp.ndarray:
    """[B, T] waveform -> [B, T', C] features ("layer" norm mode: conv ->
    LayerNorm -> GELU per stage)."""
    x = wav[:, :, None]  # [B, T, 1]
    for conv, stride in zip(params["convs"], cfg.conv_strides):
        x = jax.lax.conv_general_dilated(
            x, conv["w"].astype(x.dtype), window_strides=(stride,), padding=[(0, 0)],
            dimension_numbers=("NTC", "TIO", "NTC"), precision=_PREC,
        ) + conv["b"]
        x = _layer_norm(x, conv["ln_w"], conv["ln_b"])
        x = _gelu(x)
    return x


def _pos_conv(params: Params, cfg: XlsrConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Grouped conv positional embedding with SamePad trim (even kernel drops
    the final step) + GELU."""
    w = params["pos_conv_w"]
    width = cfg.conv_pos_width
    pad = width // 2
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=cfg.conv_pos_groups, precision=_PREC,
    ) + params["pos_conv_b"]
    if width % 2 == 0:
        y = y[:, :-1]
    return _gelu(y)


def encode(
    params: Params,
    cfg: XlsrConfig,
    wav: jnp.ndarray,  # [B, T] 16 kHz in [-1, 1]
    lengths: Optional[jnp.ndarray] = None,  # [B] valid samples
    output_layer: Optional[int] = None,
    normalize: bool = True,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (features [B, T', H] tapped after `output_layer` layers,
    feat_lengths [B]).

    `output_layer` defaults to cfg.output_layer (35, matching the reference's
    `out_layer_idx = 35 - 1` call sites, e.g. src/inference.py:59).
    """
    b, t = wav.shape
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    if normalize:
        # per-utterance zero-mean/unit-var over valid samples (XLS-R was
        # trained with normalized input)
        idx = jnp.arange(t)[None, :]
        valid = (idx < lengths[:, None]).astype(wav.dtype)
        n = jnp.maximum(lengths.astype(wav.dtype), 1.0)[:, None]
        mean = jnp.sum(wav * valid, axis=1, keepdims=True) / n
        var = jnp.sum(jnp.square(wav - mean) * valid, axis=1, keepdims=True) / n
        wav = (wav - mean) * jax.lax.rsqrt(var + 1e-7) * valid

    x = feature_extractor(params, cfg, wav)  # [B, T', C]
    x = _layer_norm(x, params["feat_ln_w"], params["feat_ln_b"])
    x = x @ params["proj_w"] + params["proj_b"]  # [B, T', H]

    feat_len = lengths
    for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
        # clamp per stage: a sub-kernel-length input must yield 0 frames,
        # not a negative count that later slicing misreads as "almost all"
        feat_len = jnp.maximum((feat_len - k) // s + 1, 0)

    # zero the frames beyond feat_len BEFORE the positional conv: the conv
    # mixes neighboring frames, and the reference zero-pads at its (exact)
    # boundary — with the tail forced to zero, every valid frame of a
    # length-padded batch is bit-identical to an exact-length run (attention
    # is segment-masked and everything else is per-frame, so this is the
    # only cross-frame leak).  Enables padding wavs to a bucketed length
    # (bounded XLA compile set) with no fidelity cost.
    fvalid = (jnp.arange(x.shape[1])[None, :] < feat_len[:, None]).astype(x.dtype)
    x = x * fvalid[..., None]

    x = x + _pos_conv(params, cfg, x)

    tp = x.shape[1]
    if attn_impl == "auto":
        # Pallas flash kernel for LONG clips only (VERDICT-r3 item 6): the
        # XLA path materializes [B, 16, T', T'] f32 scores per layer — 14 GB
        # at a 5-min clip (T'=15000), a preprocessing OOM — while flash never
        # builds them.  Measured crossover on v5e (f32, head_dim 80): XLA
        # wins to ~30 s (109 vs 127 ms), flash from ~60 s (237 vs 243 ms) and
        # 120 s (626 vs 652 ms); the d=80 lane padding + block-pad overhead
        # dominates below that.  Valid frames agree to 2e-5 and units exactly
        # (tests/test_xlsr.py::test_encode_flash_matches_xla).
        on_tpu = jax.devices()[0].platform == "tpu"
        attn_impl = "flash" if (on_tpu and tp >= 2048) else "xla"
    seg = jnp.where(jnp.arange(tp)[None, :] < feat_len[:, None], 0, -1)
    pos = jnp.broadcast_to(jnp.arange(tp)[None], (b, tp))

    n_layers = output_layer if output_layer is not None else cfg.output_layer
    lp = jax.tree.map(lambda a: a[:n_layers], params["layers"])

    nh = cfg.num_heads
    hd = cfg.hidden_size // nh

    def layer(x, p):
        # pre-LN ("stable layer norm") block
        y = _layer_norm(x, p["ln1_w"], p["ln1_b"])
        q = (y @ p["wq"] + p["bq"]).reshape(b, tp, nh, hd)
        kk = (y @ p["wk"] + p["bk"]).reshape(b, tp, nh, hd)
        vv = (y @ p["wv"] + p["bv"]).reshape(b, tp, nh, hd)
        attn = mha(q, kk, vv, q_segment_ids=seg, kv_segment_ids=seg,
                   q_positions=pos, kv_positions=pos, causal=False,
                   impl=attn_impl)
        x = x + attn.reshape(b, tp, cfg.hidden_size) @ p["wo"] + p["bo"]
        y = _layer_norm(x, p["ln2_w"], p["ln2_b"])
        x = x + _gelu(y @ p["ffn_w1"] + p["ffn_b1"]) @ p["ffn_w2"] + p["ffn_b2"]
        return x, None

    x, _ = jax.lax.scan(layer, x, lp)
    return x, feat_len


def kmeans_assign(features: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """argmin_k ||f - c_k||^2 as one MXU matmul: argmax(f·c - ||c||²/2)."""
    logits = jnp.einsum("...d,kd->...k", features, centroids, precision=_PREC)
    logits = logits - 0.5 * jnp.sum(jnp.square(centroids), axis=-1)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@partial(jax.jit,
         static_argnames=("cfg", "output_layer", "normalize", "attn_impl"))
def extract_units(
    params: Params,
    cfg: XlsrConfig,
    wav: jnp.ndarray,  # [B, T]
    lengths: Optional[jnp.ndarray] = None,
    output_layer: Optional[int] = None,
    normalize: bool = True,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """wav -> (units [B, T'] int32, unit_lengths [B]).  50 Hz, no dedup
    (reference keeps duplicates; decoder/scripts/preprocess.py:40)."""
    feats, feat_len = encode(params, cfg, wav, lengths, output_layer,
                             normalize, attn_impl)
    units = kmeans_assign(feats, params["centroids"])
    return units, feat_len


def extract_units_bucketed(params: Params, cfg: XlsrConfig, wav,
                           bucket_s: float = 0.5) -> list:
    """extract_units with the wav zero-padded up to a `bucket_s`-second
    multiple: every DISTINCT input length otherwise compiles a fresh XLA
    program for the 48-layer stack (~30 s+), and serving/preprocessing see
    arbitrary lengths.  Lossless: encode() masks the padded tail (attention
    segments + pre-pos-conv zeroing), so the valid units are bit-identical
    to an exact-length run (tests/test_xlsr.py feature-level test)."""
    from usdm_tpu.audio.wav import pad_to_bucket

    wav = np.asarray(wav, np.float32)
    if len(wav) < cfg.conv_kernels[0]:
        return []  # shorter than one conv window: zero frames
    padded, n = pad_to_bucket(wav, cfg.sample_rate, bucket_s)
    units, ulen = extract_units(params, cfg, jnp.asarray(padded[None]),
                                lengths=jnp.asarray([n], jnp.int32))
    return np.asarray(units)[0, : max(int(ulen[0]), 0)].tolist()


def load_kmeans(params: Params, npy_path: str) -> Params:
    """Attach reference k-means centroids (kmeans_10k.npy: [K, D])."""
    cents = np.load(npy_path)
    out = dict(params)
    out["centroids"] = jnp.asarray(cents.astype(np.float32))
    return out


# ---------------------------------------------------------------------------
# HF checkpoint conversion (Wav2Vec2Model, do_stable_layer_norm=True)
# ---------------------------------------------------------------------------


def convert_hf_state_dict(state: Dict[str, np.ndarray], cfg: XlsrConfig) -> Params:
    """Map a HF Wav2Vec2Model state dict (XLS-R layout) to our params."""

    def g(name):
        return np.asarray(state[name]).astype(np.float32)

    def lin(name):
        return jnp.asarray(g(name + ".weight").T)

    def bias(name):
        return jnp.asarray(g(name + ".bias"))

    convs = []
    for i in range(len(cfg.conv_kernels)):
        p = f"feature_extractor.conv_layers.{i}"
        convs.append({
            "w": jnp.asarray(g(p + ".conv.weight").transpose(2, 1, 0)),  # [out,in,K]->[K,in,out]
            "b": jnp.asarray(g(p + ".conv.bias")),
            "ln_w": jnp.asarray(g(p + ".layer_norm.weight")),
            "ln_b": jnp.asarray(g(p + ".layer_norm.bias")),
        })

    # pos conv weight norm (dim=2): w = g * v / ||v||_{dims 0,1}
    pre = "encoder.pos_conv_embed.conv"
    if pre + ".weight" in state:
        w = g(pre + ".weight")
    else:
        if pre + ".weight_g" in state:
            gg, v = g(pre + ".weight_g"), g(pre + ".weight_v")
        else:
            gg = g(pre + ".parametrizations.weight.original0")
            v = g(pre + ".parametrizations.weight.original1")
        norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
        w = gg * v / np.maximum(norm, 1e-12)

    L = cfg.num_layers

    def stack_lin(fmt):
        return jnp.asarray(np.stack([g(fmt.format(i) + ".weight").T for i in range(L)]))

    def stack_bias(fmt):
        return jnp.asarray(np.stack([g(fmt.format(i) + ".bias") for i in range(L)]))

    def stack_raw(fmt, field):
        return jnp.asarray(np.stack([g(fmt.format(i) + "." + field) for i in range(L)]))

    return {
        "convs": convs,
        "feat_ln_w": jnp.asarray(g("feature_projection.layer_norm.weight")),
        "feat_ln_b": jnp.asarray(g("feature_projection.layer_norm.bias")),
        "proj_w": lin("feature_projection.projection"),
        "proj_b": bias("feature_projection.projection"),
        "pos_conv_w": jnp.asarray(w.transpose(2, 1, 0)),  # [out, in/g, K] -> [K, in/g, out]
        "pos_conv_b": jnp.asarray(g(pre + ".bias")),
        "layers": {
            "ln1_w": stack_raw("encoder.layers.{}.layer_norm", "weight"),
            "ln1_b": stack_raw("encoder.layers.{}.layer_norm", "bias"),
            "wq": stack_lin("encoder.layers.{}.attention.q_proj"),
            "bq": stack_bias("encoder.layers.{}.attention.q_proj"),
            "wk": stack_lin("encoder.layers.{}.attention.k_proj"),
            "bk": stack_bias("encoder.layers.{}.attention.k_proj"),
            "wv": stack_lin("encoder.layers.{}.attention.v_proj"),
            "bv": stack_bias("encoder.layers.{}.attention.v_proj"),
            "wo": stack_lin("encoder.layers.{}.attention.out_proj"),
            "bo": stack_bias("encoder.layers.{}.attention.out_proj"),
            "ln2_w": stack_raw("encoder.layers.{}.final_layer_norm", "weight"),
            "ln2_b": stack_raw("encoder.layers.{}.final_layer_norm", "bias"),
            "ffn_w1": stack_lin("encoder.layers.{}.feed_forward.intermediate_dense"),
            "ffn_b1": stack_bias("encoder.layers.{}.feed_forward.intermediate_dense"),
            "ffn_w2": stack_lin("encoder.layers.{}.feed_forward.output_dense"),
            "ffn_b2": stack_bias("encoder.layers.{}.feed_forward.output_dense"),
        },
        "centroids": jnp.zeros((cfg.num_clusters, cfg.hidden_size), jnp.float32),
    }


def convert_fairseq2_state_dict(state: Dict[str, np.ndarray], cfg: XlsrConfig) -> Params:
    """Map a fairseq2 Wav2Vec2Model state dict to our params.

    This is the layout of the actual reference tokenizer weights:
    seamless_communication's `xlsr2_1b_v2` fairseq2 checkpoint
    (/root/reference/src/inference.py:111-113, downloaded by setup.py:49).
    fairseq2 names differ from HF: `encoder_frontend.*` for the conv
    extractor / projection / positional conv, `self_attn.output_proj` for the
    attention output, `ffn.inner_proj`/`ffn.output_proj` for the MLP.
    Pretraining-only tensors (masker/quantizer/final_proj) are ignored.
    """

    def pick(*names):
        for n in names:
            if n in state:
                return np.asarray(state[n]).astype(np.float32)
        raise KeyError(
            f"fairseq2 xlsr: none of {names} found; checkpoint keys look like "
            + ", ".join(sorted(state)[:8]) + " ..."
        )

    def lin(base):
        return jnp.asarray(pick(base + ".weight").T)

    def bias(base):
        return jnp.asarray(pick(base + ".bias"))

    fe = "encoder_frontend.feature_extractor.layers.{}"
    convs = []
    for i in range(len(cfg.conv_kernels)):
        p = fe.format(i)
        convs.append({
            "w": jnp.asarray(pick(p + ".conv.weight").transpose(2, 1, 0)),  # [out,in,K]->[K,in,out]
            "b": jnp.asarray(pick(p + ".conv.bias")),
            "ln_w": jnp.asarray(pick(p + ".layer_norm.weight")),
            "ln_b": jnp.asarray(pick(p + ".layer_norm.bias")),
        })

    # positional conv: plain weight or weight-norm (g, v) pairs
    pc = "encoder_frontend.pos_encoder.conv"
    if pc + ".weight" in state:
        w = np.asarray(state[pc + ".weight"]).astype(np.float32)
    else:
        try:
            gg = pick(pc + ".weight_g", pc + ".parametrizations.weight.original0")
            v = pick(pc + ".weight_v", pc + ".parametrizations.weight.original1")
        except KeyError:
            raise KeyError(f"fairseq2 xlsr: no positional conv weight under {pc}")
        norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
        w = gg * v / np.maximum(norm, 1e-12)

    L = cfg.num_layers
    enc = "encoder.layers.{}"

    def stack(fmt_suffix, field="weight", transpose=False):
        arrs = [pick(enc.format(i) + fmt_suffix + "." + field) for i in range(L)]
        return jnp.asarray(np.stack([a.T if transpose else a for a in arrs]))

    return {
        "convs": convs,
        "feat_ln_w": jnp.asarray(pick("encoder_frontend.post_extract_layer_norm.weight",
                                      "encoder_frontend.layer_norm.weight")),
        "feat_ln_b": jnp.asarray(pick("encoder_frontend.post_extract_layer_norm.bias",
                                      "encoder_frontend.layer_norm.bias")),
        "proj_w": lin("encoder_frontend.model_dim_proj"),
        "proj_b": bias("encoder_frontend.model_dim_proj"),
        "pos_conv_w": jnp.asarray(w.transpose(2, 1, 0)),  # [out, in/g, K] -> [K, in/g, out]
        "pos_conv_b": jnp.asarray(pick(pc + ".bias")),
        "layers": {
            "ln1_w": stack(".self_attn_layer_norm"),
            "ln1_b": stack(".self_attn_layer_norm", "bias"),
            "wq": stack(".self_attn.q_proj", transpose=True),
            "bq": stack(".self_attn.q_proj", "bias"),
            "wk": stack(".self_attn.k_proj", transpose=True),
            "bk": stack(".self_attn.k_proj", "bias"),
            "wv": stack(".self_attn.v_proj", transpose=True),
            "bv": stack(".self_attn.v_proj", "bias"),
            "wo": stack(".self_attn.output_proj", transpose=True),
            "bo": stack(".self_attn.output_proj", "bias"),
            "ln2_w": stack(".ffn_layer_norm"),
            "ln2_b": stack(".ffn_layer_norm", "bias"),
            "ffn_w1": stack(".ffn.inner_proj", transpose=True),
            "ffn_b1": stack(".ffn.inner_proj", "bias"),
            "ffn_w2": stack(".ffn.output_proj", transpose=True),
            "ffn_b2": stack(".ffn.output_proj", "bias"),
        },
        "centroids": jnp.zeros((cfg.num_clusters, cfg.hidden_size), jnp.float32),
    }
