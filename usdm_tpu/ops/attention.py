"""Attention ops: packed/segmented causal attention with sliding windows.

The reference isolates packed subsamples with per-subsample `cu_seqlens` passed
to flash_attn_varlen_func (/root/reference/src/model.py:475-497).  The TPU
equivalent is *segment ids*: a [B, T] int array where tokens attend only to
earlier tokens with the same segment id.  No unpad/pad dance — static shapes,
one mask.

Two implementations share a single interface:
  - `impl="xla"`  : jnp einsum attention with an additive mask (reference path,
                     runs anywhere; XLA fuses it well for moderate T)
  - `impl="flash"`: Pallas TPU flash-attention kernel (ops/flash_attention.py)
`mha()` auto-selects flash on TPU for long sequences.

GQA is handled without materializing repeated K/V: queries are reshaped to
[B, T, Hkv, G, d] and contracted against K/V of Hkv heads.
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _prec(dtype) -> jax.lax.Precision:
    """f32 inputs need HIGHEST: XLA's DEFAULT computes f32 dots at ~bf16
    accuracy on CPU/TPU; bf16 inputs already use the MXU natively."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def make_attention_mask(
    q_segment_ids: jnp.ndarray,  # [B, Tq] int; segment id per query token
    kv_segment_ids: jnp.ndarray,  # [B, Tk]
    q_positions: jnp.ndarray,  # [B, Tq] int; absolute position of each query
    kv_positions: jnp.ndarray,  # [B, Tk]
    causal: bool = True,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """[B, Tq, Tk] boolean mask (True = attend).

    Padding convention: segment id < 0 marks padding; pad tokens attend to
    nothing and are attended by nothing.
    """
    same_seg = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]) & (
        q_segment_ids[:, :, None] >= 0
    )
    mask = same_seg
    if causal:
        mask = mask & (q_positions[:, :, None] >= kv_positions[:, None, :])
    if sliding_window is not None:
        # matches flash-attn's window_size=(w, w): key position must be within
        # w of the query position.
        mask = mask & (q_positions[:, :, None] - kv_positions[:, None, :] <= sliding_window)
    return mask


def _xla_attention(
    q: jnp.ndarray,  # [B, Tq, H, d]
    k: jnp.ndarray,  # [B, Tk, Hkv, d]
    v: jnp.ndarray,  # [B, Tk, Hkv, d]
    mask: Optional[jnp.ndarray],  # [B, Tq, Tk] bool or None
    bias: Optional[jnp.ndarray] = None,  # [B, H, Tq, Tk] additive (e.g. ALiBi)
    scale: Optional[float] = None,
) -> jnp.ndarray:
    b, tq, h, d = q.shape
    hkv = k.shape[2]
    g = h // hkv
    scale = d ** -0.5 if scale is None else scale

    qg = q.reshape(b, tq, hkv, g, d)
    # scores in f32 for stability
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32, precision=_prec(q.dtype))
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.reshape(b, hkv, g, tq, -1).astype(scores.dtype)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v, precision=_prec(v.dtype))
    return out.reshape(b, tq, h, d)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    causal: bool = True,
    sliding_window: Optional[int] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention over [B, T, H, d] tensors with GQA support."""
    b, tq = q.shape[:2]
    tk = k.shape[1]
    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(tq)[None], (b, tq))
    if kv_positions is None:
        kv_positions = jnp.broadcast_to(jnp.arange(tk)[None], (b, tk))
    if q_segment_ids is None:
        q_segment_ids = jnp.zeros((b, tq), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.zeros((b, tk), jnp.int32)

    if impl == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = "flash" if (on_tpu and bias is None and tq >= 128) else "xla"

    if impl == "flash":
        from usdm_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            q_positions=q_positions,
            kv_positions=kv_positions,
            causal=causal,
            sliding_window=sliding_window,
            scale=scale,
        )

    mask = make_attention_mask(
        q_segment_ids, kv_segment_ids, q_positions, kv_positions, causal, sliding_window
    )
    return _xla_attention(q, k, v, mask, bias=bias, scale=scale)


def decode_attention(
    q: jnp.ndarray,  # [B, 1, H, d] single query step
    k_cache: jnp.ndarray,  # [B, S, Hkv, d]
    v_cache: jnp.ndarray,  # [B, S, Hkv, d]
    cache_len: jnp.ndarray,  # [B] number of valid cache entries (incl. this step)
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    kv_positions: Optional[jnp.ndarray] = None,  # [B, S] absolute position per
    # cache slot (ring-buffer caches; negative = never written)
) -> jnp.ndarray:
    """One-token attention against a (padded) KV cache.

    Valid keys are positions [0, cache_len); with a sliding window, further
    restricted to (pos - window, pos].  With `kv_positions`, slot order need
    not equal position order (ring-bounded cache, models.mistral.decode_step):
    validity is per-slot absolute position instead of slot index.  Cheap
    single-step path used by the dense decode loop; the paged engine has its
    own kernel.
    """
    b, _, h, d = q.shape
    s = k_cache.shape[1]
    scale = d ** -0.5 if scale is None else scale
    hkv = k_cache.shape[2]
    g = h // hkv

    pos = jnp.arange(s)[None, :] if kv_positions is None else kv_positions  # [B?, S]
    valid = (pos < cache_len[:, None]) & (pos >= 0)
    if sliding_window is not None:
        qpos = cache_len[:, None] - 1
        valid = valid & (qpos - pos <= sliding_window)

    qg = q.reshape(b, hkv, g, d)
    scores = jnp.einsum("bhgd,bshd->bhgs", qg, k_cache, preferred_element_type=jnp.float32, precision=_prec(q.dtype)) * scale
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", probs.astype(v_cache.dtype), v_cache, precision=_prec(v_cache.dtype))
    return out.reshape(b, 1, h, d)
