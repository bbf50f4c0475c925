"""Pallas TPU paged-attention decode kernel.

The gather-free core of the serving engine: single-token queries attend to a
sequence's KV pages directly from the HBM page pool — the TPU equivalent of
vLLM's PagedAttention CUDA kernel (reference
/root/reference/src/inference_vllm.py:109).

Design (round 2, bandwidth-first): grid (B,); each grid step owns one slot
and streams that sequence's pages HBM->VMEM with explicit double-buffered
async DMA, `block_pages` pages per compute block, all kv heads at once:

  * pages are scattered, so BlockSpec pipelining can't batch them — the
    kernel issues one async copy per page (a strided [Hkv, P, d] slice of the
    pool) and overlaps block i+1's copies with block i's flash update.  The
    round-1 kernel pushed one page per (slot, page) grid step through the
    implicit pipeline and paid ~6 us of fixed cost per step; this kernel
    amortizes that over whole sequences.
  * online-softmax state lives in loop carries ([Hkv, G, ...]), one batched
    dot per block — no per-head unrolled small ops.
  * sliding windows skip whole page-blocks below the window before any DMA.

Layout: q [B, Hkv, G, d] (queries grouped by kv head), page pool
[Hkv, N, P, d] (page slices stay DMA-contiguous per head; one descriptor
moves all heads of a page).
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


def _decode_kernel(
    # scalar prefetch
    page_table_ref,  # [B, maxp] int32
    seq_lens_ref,  # [B] int32 (valid kv count per slot)
    # blocks
    q_ref,  # [1, Hkv, G, d]  (this slot's queries)
    k_hbm,  # [Hkv, N, P, d] page pool, stays in HBM
    v_hbm,  # [Hkv, N, P, d]
    o_ref,  # [1, Hkv, G, d]
    # scratch
    k_buf,  # [2, Hkv, BLK, P, d] VMEM double buffer
    v_buf,  # [2, Hkv, BLK, P, d]
    k_sem,  # [2, BLK] DMA semaphores
    v_sem,  # [2, BLK]
    *,
    scale: float,
    page_size: int,
    window: Optional[int],
    block_pages: int,
    max_pages: int,
):
    bi = pl.program_id(0)
    kv_len = seq_lens_ref[bi]
    hkv, g, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    blk_tok = block_pages * page_size

    last_page = (kv_len - 1) // page_size
    if window is None:
        first_page = jnp.int32(0)
    else:
        first_page = jnp.maximum(kv_len - 1 - window, 0) // page_size
    first_blk = first_page // block_pages
    last_blk = last_page // block_pages
    n_blks = last_blk - first_blk + 1

    def page_dmas(slot, blk, j):
        """The j-th page copy of absolute block `blk` into buffer `slot`:
        one strided descriptor moves the page for every kv head."""
        pg = blk * block_pages + j
        pid = page_table_ref[bi, jnp.clip(pg, 0, max_pages - 1)]
        kd = pltpu.make_async_copy(
            k_hbm.at[:, pid], k_buf.at[slot, :, j], k_sem.at[slot, j]
        )
        vd = pltpu.make_async_copy(
            v_hbm.at[:, pid], v_buf.at[slot, :, j], v_sem.at[slot, j]
        )
        in_range = jnp.logical_and(pg >= first_page, pg <= last_page)
        return kd, vd, in_range

    def start_block(slot, blk):
        for j in range(block_pages):  # static unroll
            kd, vd, in_range = page_dmas(slot, blk, j)

            @pl.when(in_range)
            def _():
                kd.start()
                vd.start()

            @pl.when(jnp.logical_not(in_range))
            def _():
                # out-of-range pages are never copied: stale VMEM could hold
                # NaN bit patterns, and 0 * NaN = NaN survives the pv matmul
                # even under the probability mask — zero them.
                k_buf[slot, :, j] = jnp.zeros_like(k_buf[slot, :, j])
                v_buf[slot, :, j] = jnp.zeros_like(v_buf[slot, :, j])

    def wait_block(slot, blk):
        for j in range(block_pages):
            kd, vd, in_range = page_dmas(slot, blk, j)

            @pl.when(in_range)
            def _():
                kd.wait()
                vd.wait()

    start_block(0, first_blk)

    qv = q_ref[0]  # [Hkv, G, d]

    def body(i, carry):
        m, l, acc = carry
        blk = first_blk + i
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_blks)
        def _():
            start_block(1 - slot, blk + 1)

        wait_block(slot, blk)

        k = k_buf[slot].reshape(hkv, blk_tok, d)  # [Hkv, T, d]
        v = v_buf[slot].reshape(hkv, blk_tok, d)
        # batched over kv heads: [Hkv, G, d] x [Hkv, T, d] -> [Hkv, G, T]
        s = jax.lax.dot_general(
            qv, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale

        kv_pos = blk * blk_tok + jax.lax.broadcasted_iota(jnp.int32, (1, 1, blk_tok), 2)
        valid = kv_pos < kv_len
        if window is not None:
            valid = jnp.logical_and(valid, (kv_len - 1) - kv_pos <= window)
        # mask BEFORE any softmax math: out-of-range pages leave stale VMEM
        # whose dot products may be non-finite
        s = jnp.where(valid, s, NEG_INF)

        m_cur = jnp.max(s, axis=2, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        pexp = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        l_new = alpha * l + jnp.sum(pexp, axis=2, keepdims=True)
        # [Hkv, G, T] x [Hkv, T, d] -> [Hkv, G, d]
        pv = jax.lax.dot_general(
            pexp.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((hkv, g, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((hkv, g, 1), jnp.float32)
    acc0 = jnp.zeros((hkv, g, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_blks, body, (m0, l0, acc0))

    safe = jnp.where(l > 0.0, l, 1.0)
    o_ref[0] = (acc / safe).astype(o_ref.dtype)


def paged_decode_attention(
    q: jnp.ndarray,  # [B, Hkv, G, d]
    k_pages: jnp.ndarray,  # [Hkv, N, P, d]
    v_pages: jnp.ndarray,  # [Hkv, N, P, d]
    page_table: jnp.ndarray,  # [B, maxp] int32
    seq_lens: jnp.ndarray,  # [B] int32 valid kv count (incl. current token)
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    block_pages: int = 4,
) -> jnp.ndarray:
    """-> [B, Hkv, G, d] attention outputs.

    `block_pages` pages are DMA'd per compute block (double-buffered); the
    tail block's out-of-range pages are neither copied nor unmasked."""
    b, hkv, g, d = q.shape
    _, n, p, _ = k_pages.shape
    maxp = page_table.shape[1]
    scale = d**-0.5 if scale is None else scale
    # double buffers (k+v) must fit the ~16 MB VMEM alongside q/out blocks:
    # 2 slots * 2 arrays * Hkv * BLK * P * d * itemsize <= ~10 MB
    per_block = 4 * hkv * p * d * k_pages.dtype.itemsize
    block_pages = max(1, min(block_pages, maxp, (10 << 20) // per_block))

    kernel = functools.partial(
        _decode_kernel, scale=scale, page_size=p, window=sliding_window,
        block_pages=block_pages, max_pages=maxp,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, g, d), lambda bi, pt, sl: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((1, hkv, g, d), lambda bi, pt, sl: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, hkv, block_pages, p, d), k_pages.dtype),
            pltpu.VMEM((2, hkv, block_pages, p, d), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, block_pages)),
            pltpu.SemaphoreType.DMA((2, block_pages)),
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
