"""Pallas TPU paged-attention decode kernel.

The gather-free core of the serving engine: single-token queries attend to a
sequence's KV pages directly from the HBM page pool, selected per grid step by
a scalar-prefetched page table (no [B, S, ...] gather materialization — the
TPU equivalent of vLLM's PagedAttention CUDA kernel, reference
/root/reference/src/inference_vllm.py:109).

Layout: q [B, Hkv, G, d] (queries grouped by kv head), page pool
[N, P, Hkv, d].  Grid (B, Hkv, max_pages); the innermost page dimension
revisits the same output block, so online-softmax state lives in VMEM scratch.
The page table feeds BlockSpec index maps via PrefetchScalarGridSpec, so the
next page's DMA is issued while the current one computes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128


def _decode_kernel(
    # scalar prefetch
    page_table_ref,  # [B, maxp] int32
    seq_lens_ref,  # [B] int32 (valid kv count per slot)
    # blocks
    q_ref,  # [1, Hkv, G, d]   (whole slot)
    k_ref,  # [Hkv, 1, P, d]   (one page, all kv heads; selected by index_map)
    v_ref,  # [Hkv, 1, P, d]
    o_ref,  # [1, Hkv, G, d]
    m_scr,  # [Hkv*G, LANES]
    l_scr,  # [Hkv*G, LANES]
    acc_scr,  # [Hkv*G, d]
    *,
    scale: float,
    page_size: int,
    window: Optional[int],
    n_kv_heads: int,
):
    b = pl.program_id(0)
    p = pl.program_id(1)
    np_ = pl.num_programs(1)

    @pl.when(p == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    kv_len = seq_lens_ref[b]
    page_start = p * page_size

    run = page_start < kv_len
    if window is not None:
        # query position is kv_len - 1; skip pages entirely below the window
        run = jnp.logical_and(run, page_start + page_size - 1 >= kv_len - 1 - window)

    @pl.when(run)
    def _compute():
        g = q_ref.shape[2]
        kv_pos = page_start + jax.lax.broadcasted_iota(jnp.int32, (1, page_size), 1)
        mask = kv_pos < kv_len
        if window is not None:
            mask = jnp.logical_and(mask, (kv_len - 1) - kv_pos <= window)

        for h in range(n_kv_heads):  # static unroll over kv heads
            q = q_ref[0, h]  # [G, d]
            k = k_ref[h, 0]  # [P, d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [G, P]
            s = jnp.where(mask, s, NEG_INF)

            row = slice(h * g, (h + 1) * g)
            m_prev = m_scr[row, :1]
            l_prev = l_scr[row, :1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            pexp = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            l_new = alpha * l_prev + jnp.sum(pexp, axis=1, keepdims=True)

            v = v_ref[h, 0]  # [P, d]
            pv = jax.lax.dot_general(
                pexp.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[row, :] = acc_scr[row, :] * alpha + pv
            m_scr[row, :] = jnp.broadcast_to(m_new, (g, m_scr.shape[1]))
            l_scr[row, :] = jnp.broadcast_to(l_new, (g, l_scr.shape[1]))

    @pl.when(p == np_ - 1)
    def _finalize():
        g = q_ref.shape[2]
        l = l_scr[:, :1]
        safe = jnp.where(l > 0.0, l, 1.0)
        out = (acc_scr[...] / safe).astype(o_ref.dtype)  # [Hkv*G, d]
        o_ref[0] = out.reshape(n_kv_heads, g, out.shape[-1])


def paged_decode_attention(
    q: jnp.ndarray,  # [B, Hkv, G, d]
    k_pages: jnp.ndarray,  # [Hkv, N, P, d]
    v_pages: jnp.ndarray,  # [Hkv, N, P, d]
    page_table: jnp.ndarray,  # [B, maxp] int32
    seq_lens: jnp.ndarray,  # [B] int32 valid kv count (incl. current token)
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """-> [B, Hkv, G, d] attention outputs.

    Page-pool layout is [Hkv, N, P, d] (kv-head major) so each grid step's
    block keeps (P, d) as the trailing tile-aligned dims."""
    b, hkv, g, d = q.shape
    _, n, p, _ = k_pages.shape
    maxp = page_table.shape[1]
    scale = d**-0.5 if scale is None else scale

    kernel = functools.partial(
        _decode_kernel, scale=scale, page_size=p, window=sliding_window,
        n_kv_heads=hkv,
    )

    def kv_index(bi, pi, pt, sl):
        # clamp out-of-range steps to the nearest in-range page: Pallas skips
        # the DMA when a block index repeats, so pages outside
        # [first_window_page, last_page] cost nothing.
        last = jnp.maximum(sl[bi] - 1, 0) // p
        if sliding_window is not None:
            first = jnp.maximum(sl[bi] - 1 - sliding_window, 0) // p
        else:
            first = 0
        pi_c = jnp.clip(pi, first, last)
        return (0, pt[bi, pi_c], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, maxp),
        in_specs=[
            pl.BlockSpec((1, hkv, g, d), lambda bi, pi, pt, sl: (bi, 0, 0, 0)),
            pl.BlockSpec((hkv, 1, p, d), kv_index),
            pl.BlockSpec((hkv, 1, p, d), kv_index),
        ],
        out_specs=pl.BlockSpec((1, hkv, g, d), lambda bi, pi, pt, sl: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv * g, _LANES), jnp.float32),
            pltpu.VMEM((hkv * g, _LANES), jnp.float32),
            pltpu.VMEM((hkv * g, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
    )(page_table.astype(jnp.int32), seq_lens.astype(jnp.int32), q, k_pages, v_pages)


def paged_decode_attention_reference(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,  # [Hkv, N, P, d]
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,
    seq_lens: jnp.ndarray,
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """jnp gather reference with identical semantics (used on CPU and as the
    kernel's golden model)."""
    b, hkv, g, d = q.shape
    _, n, p, _ = k_pages.shape
    scale = d**-0.5 if scale is None else scale
    kc = k_pages[:, page_table]  # [Hkv, B, maxp, P, d]
    vc = v_pages[:, page_table]
    s_max = kc.shape[2] * p
    kc = jnp.moveaxis(kc, 0, 1).reshape(b, hkv, s_max, d)
    vc = jnp.moveaxis(vc, 0, 1).reshape(b, hkv, s_max, d)
    scores = jnp.einsum("bhgd,bhsd->bhgs", q, kc, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) * scale
    pos = jnp.arange(s_max)[None, None, None, :]
    valid = pos < seq_lens[:, None, None, None]
    if sliding_window is not None:
        valid = valid & ((seq_lens[:, None, None, None] - 1) - pos <= sliding_window)
    scores = jnp.where(valid, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", probs.astype(vc.dtype), vc,
                     precision=jax.lax.Precision.HIGHEST)
    return out
