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
    *rest,  # quantized: ks_hbm, vs_hbm [N, Hkv, P] f32 (page-major: the
    #         per-page DMA slices the untiled leading axis), then out+scratch:
    #         o_ref [1, Hkv, G, d];
    #         k_buf / v_buf [2, Hkv, BLK, P, d] VMEM double buffers;
    #         (quantized: ks_buf / vs_buf [2, BLK, Hkv, P] f32 scale buffers;)
    #         k_sem / v_sem (/ ks_sem / vs_sem) [2, BLK] DMA semaphores
    scale: float,
    page_size: int,
    window: Optional[int],
    block_pages: int,
    max_pages: int,
    quantized: bool,
):
    if quantized:
        (ks_hbm, vs_hbm, o_ref, k_buf, v_buf, ks_buf, vs_buf,
         k_sem, v_sem, ks_sem, vs_sem) = rest
    else:
        o_ref, k_buf, v_buf, k_sem, v_sem = rest
        ks_hbm = vs_hbm = ks_buf = vs_buf = ks_sem = vs_sem = None
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
        dmas = [
            pltpu.make_async_copy(
                k_hbm.at[:, pid], k_buf.at[slot, :, j], k_sem.at[slot, j]
            ),
            pltpu.make_async_copy(
                v_hbm.at[:, pid], v_buf.at[slot, :, j], v_sem.at[slot, j]
            ),
        ]
        if quantized:
            dmas.append(pltpu.make_async_copy(
                ks_hbm.at[pid], ks_buf.at[slot, j], ks_sem.at[slot, j]
            ))
            dmas.append(pltpu.make_async_copy(
                vs_hbm.at[pid], vs_buf.at[slot, j], vs_sem.at[slot, j]
            ))
        in_range = jnp.logical_and(pg >= first_page, pg <= last_page)
        return dmas, in_range

    def start_block(slot, blk):
        for j in range(block_pages):  # static unroll
            dmas, in_range = page_dmas(slot, blk, j)

            @pl.when(in_range)
            def _():
                for d_ in dmas:
                    d_.start()

            @pl.when(jnp.logical_not(in_range))
            def _():
                # out-of-range pages are never copied: stale VMEM could hold
                # NaN bit patterns, and 0 * NaN = NaN survives the pv matmul
                # even under the probability mask — zero them.  (Stale f32
                # scales can be NaN too, and pexp * NaN-scale = NaN at masked
                # positions — zero the scale buffers as well.)
                k_buf[slot, :, j] = jnp.zeros_like(k_buf[slot, :, j])
                v_buf[slot, :, j] = jnp.zeros_like(v_buf[slot, :, j])
                if quantized:
                    ks_buf[slot, j] = jnp.zeros_like(ks_buf[slot, j])
                    vs_buf[slot, j] = jnp.zeros_like(vs_buf[slot, j])

    def wait_block(slot, blk):
        for j in range(block_pages):
            dmas, in_range = page_dmas(slot, blk, j)

            @pl.when(in_range)
            def _():
                for d_ in dmas:
                    d_.wait()

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
        if quantized:  # int8 pages: MXU-friendly cast, scales applied below
            k = k.astype(qv.dtype)
        # batched over kv heads: [Hkv, G, d] x [Hkv, T, d] -> [Hkv, G, T]
        s = jax.lax.dot_general(
            qv, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        if quantized:
            # per-(head, token) symmetric scales: q . (k_int * s_t) ==
            # (q . k_int) * s_t — one [Hkv, 1, T] broadcast on the scores
            # (scale buffers are page-major [BLK, Hkv, P]: transpose to token
            # order j*P+off matching the k/v reshape above)
            s = s * ks_buf[slot].transpose(1, 0, 2).reshape(hkv, 1, blk_tok)

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
        if quantized:
            # fold the v dequant into the probabilities: p . (v_int * s_t) ==
            # (p * s_t) . v_int  (scale is constant along d)
            pexp = pexp * vs_buf[slot].transpose(1, 0, 2).reshape(hkv, 1, blk_tok)
            v = v.astype(jnp.bfloat16)
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
    block_pages: Optional[int] = None,
    k_scales: Optional[jnp.ndarray] = None,  # [N, Hkv, P] f32 (int8 pools)
    v_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """-> [B, Hkv, G, d] attention outputs.

    `block_pages` pages are DMA'd per compute block (double-buffered); the
    tail block's out-of-range pages are neither copied nor unmasked.  With
    `k_scales`/`v_scales` the pools are int8 with per-(head, token) symmetric
    scales (engine.paged_ops.quant_kv_token): the kernel streams the scale
    rows alongside the pages and folds dequantization into the softmax —
    k-scales multiply the scores, v-scales multiply the probabilities — so
    the matmuls stay dense and the page traffic halves."""
    b, hkv, g, d = q.shape
    _, n, p, _ = k_pages.shape
    quantized = k_scales is not None
    maxp = page_table.shape[1]
    scale = d**-0.5 if scale is None else scale
    if block_pages is None:
        # normalize to ~1024 tokens per compute block regardless of page
        # size (the block-size sweep that picked 1024 ran at p=256; smaller
        # pages would otherwise get proportionally smaller blocks and pay
        # the per-block fixed cost more often)
        block_pages = max(1, 1024 // p)
    # double buffers (k+v [+ scales]) must fit the ~16 MB VMEM alongside
    # q/out blocks: 2 slots * sum(array bytes per block-page) <= ~10 MB
    per_block = 4 * hkv * p * d * k_pages.dtype.itemsize
    if quantized:
        per_block += 4 * hkv * p * 4  # two f32 scale rows, double-buffered
    block_pages = max(1, min(block_pages, maxp, (10 << 20) // per_block))

    kernel = functools.partial(
        _decode_kernel, scale=scale, page_size=p, window=sliding_window,
        block_pages=block_pages, max_pages=maxp, quantized=quantized,
    )

    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    in_specs = [
        pl.BlockSpec((1, hkv, g, d), lambda bi, pt, sl: (bi, 0, 0, 0)),
        any_spec,
        any_spec,
    ]
    inputs = [q, k_pages, v_pages]
    kv_scratch = [
        pltpu.VMEM((2, hkv, block_pages, p, d), k_pages.dtype),
        pltpu.VMEM((2, hkv, block_pages, p, d), v_pages.dtype),
    ]
    sem_scratch = [
        pltpu.SemaphoreType.DMA((2, block_pages)),
        pltpu.SemaphoreType.DMA((2, block_pages)),
    ]
    if quantized:
        in_specs += [any_spec, any_spec]
        inputs += [k_scales, v_scales]
        kv_scratch += [
            pltpu.VMEM((2, block_pages, hkv, p), jnp.float32),
            pltpu.VMEM((2, block_pages, hkv, p), jnp.float32),
        ]
        sem_scratch += [
            pltpu.SemaphoreType.DMA((2, block_pages)),
            pltpu.SemaphoreType.DMA((2, block_pages)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hkv, g, d), lambda bi, pt, sl: (bi, 0, 0, 0)),
        scratch_shapes=kv_scratch + sem_scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
    )(page_table.astype(jnp.int32), seq_lens.astype(jnp.int32), *inputs)


def paged_decode_attention_reference(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,  # [Hkv, N, P, d]
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,
    seq_lens: jnp.ndarray,
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    k_scales: Optional[jnp.ndarray] = None,  # [N, Hkv, P] f32 (int8 pools)
    v_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """jnp gather reference with identical semantics (used on CPU and as the
    kernel's golden model).  int8 pools dequantize after the gather."""
    b, hkv, g, d = q.shape
    _, n, p, _ = k_pages.shape
    scale = d**-0.5 if scale is None else scale
    kc = k_pages[:, page_table]  # [Hkv, B, maxp, P, d]
    vc = v_pages[:, page_table]
    if k_scales is not None:  # page-major scales [N, Hkv, P] -> head-major
        kc = kc.astype(jnp.float32) * jnp.moveaxis(
            k_scales[page_table], 2, 0)[..., None]
        vc = vc.astype(jnp.float32) * jnp.moveaxis(
            v_scales[page_table], 2, 0)[..., None]
        kc = kc.astype(q.dtype)
        vc = vc.astype(q.dtype)
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
