"""Weight-only int8 quantization for bandwidth-bound decode.

Single-chip 7B decode is HBM-weight-read bound (bench.py: 19 ms/step =
14.5 GB / 800 GB/s).  Storing the big projection matrices as int8 with
per-output-channel bf16 scales halves the bytes the decode step streams,
nearly doubling tokens/s — the TPU counterpart of the int8/low-bit serving
tricks the GPU stacks use (cf. PAPERS.md VecInfer/Transformer-Lite; fresh
implementation).

Quantized leaves are dicts {"q": int8 [..., in, out], "s": bf16 [..., out]}
(symmetric, per-output-channel over the contraction axis).  `qmm` computes
y @ w for either plain or quantized weights, dequantizing tile-by-tile inside
the fused XLA matmul so the HBM traffic stays int8.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_weight(w: jnp.ndarray, axis: int = -2) -> Dict[str, jnp.ndarray]:
    """Symmetric int8 over `axis` (the contraction/input axis):
    w ≈ q * s with per-output-channel scale."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": jnp.squeeze(scale, axis=axis).astype(jnp.bfloat16)}


def dequantize_weight(qw: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    return (qw["q"].astype(jnp.float32) * qw["s"].astype(jnp.float32)[..., None, :]).astype(dtype)


def qmm(y: jnp.ndarray, w) -> jnp.ndarray:
    """y @ w where w is a plain array or a quantized {"q","s"} dict.

    Quantized path is W8A8: activations are dynamically quantized per row and
    the dot runs int8 x int8 -> int32 on the MXU.  (A bf16-dequant formulation
    gets loop-hoisted by XLA into a full materialized bf16 weight copy —
    doubling HBM instead of halving it; int8 operands leave nothing to hoist.)
    """
    if isinstance(w, dict) and "q" in w:
        yf = y.astype(jnp.float32)
        amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
        ys = jnp.maximum(amax / 127.0, 1e-8)
        qy = jnp.clip(jnp.round(yf / ys), -127, 127).astype(jnp.int8)
        out = jnp.einsum("...i,io->...o", qy, w["q"], preferred_element_type=jnp.int32)
        return (out.astype(jnp.float32) * ys * w["s"].astype(jnp.float32)).astype(y.dtype)
    return y @ w


def quantize_llm_params(params: Params) -> Params:
    """Quantize the stacked per-layer projection matrices of a Mistral param
    tree (embed/lm_head/norms stay bf16 — embed is a gather, lm_head benefits
    less and dominates logit quality)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in _QUANT_KEYS:
        layers[name] = quantize_weight(layers[name], axis=-2)
    out["layers"] = layers
    return out


_VB_QUANT_KEYS = ("wq", "wk", "wv", "wo", "ffn_w1", "ffn_w2")


def quantize_voicebox_params(params: Params) -> Params:
    """Quantize the Voicebox estimator's stacked per-layer projection/FFN
    matrices (and the UNet skip combiners) to W8A8 int8.

    The estimator is matmul-bound (~55% MFU bf16, scripts/trace_estimator.py);
    the MXU runs int8 at 2x bf16 throughput, so these dots — ~97% of the
    estimator's FLOPs — get the full rate win.  Embedding (a gather),
    proj_in/proj_out (quality-critical I/O, <1% of FLOPs), conv-pos, biases
    and norms stay in the float dtype.  Inference-only: the custom backward
    would see quantized weights."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in _VB_QUANT_KEYS:
        layers[name] = quantize_weight(layers[name], axis=-2)
    out["layers"] = layers
    out["skip_w"] = quantize_weight(params["skip_w"], axis=-2)
    return out


def early_exit_draft(params: Params, n_layers: int):
    """Self-speculation draft: the target's FIRST `n_layers` layers with the
    target's own embed/final-norm/lm_head — a draft model that needs no
    training or extra checkpoint (speculative decoding is lossless for any
    draft, so this only affects speed, never output; acceptance depends on
    how early the truncated network's argmax matches the full one).

    Returns a draft params tree sharing embed/lm_head/final_norm with the
    target, with sliced copies of the first `n_layers` stacked layer weights
    (n/L of the layer bytes in HBM).
    """
    layers = {}
    for name, leaf in params["layers"].items():
        if isinstance(leaf, dict):  # quantized {"q","s"}
            layers[name] = {k: v[:n_layers] for k, v in leaf.items()}
        else:
            layers[name] = leaf[:n_layers]
    return {
        "embed": params["embed"],
        "layers": layers,
        "final_norm": params["final_norm"],
        "lm_head": params["lm_head"],
    }


def quantized_bytes(params: Params) -> int:
    import numpy as np

    total = 0
    for leaf in jax.tree.leaves(params):
        total += int(np.prod(leaf.shape)) * leaf.dtype.itemsize
    return total
