"""Pallas TPU flash attention with segment ids and sliding windows.

TPU-native replacement for the reference's flash_attn_varlen_func + cu_seqlens
packing (/root/reference/src/model.py:486-533): packing isolation is a
segment-id equality mask; Mistral's sliding window is a position-difference
bound.  Online-softmax accumulation in VMEM scratch; the kv-block grid
dimension iterates innermost so scratch persists across kv blocks.

GQA needs no K/V repetition: the K/V BlockSpec index map sends query-head h to
kv-head h // group, so each kv head's blocks are DMA'd once per group.

Forward kernel here; the memory-efficient backward uses the same blocking via
a jnp scan (flash-style recompute) in `_flash_bwd` — no [T, T] score tensor is
ever materialized in either direction.
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

# swept on v5e at the 8192-seq training shape (fwd+bwd, GQA 32/8, window
# 4096): 512/512 = 29.0 ms, 1024/1024 = 22.9 ms (-21%); 2048 exceeds VMEM.
# Short/odd shapes clamp to the sequence length, so small calls are unchanged.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
_LANES = 128


def _prec(dtype) -> jax.lax.Precision:
    """f32 inputs need HIGHEST (XLA's DEFAULT computes f32 dots at ~bf16
    accuracy); bf16 inputs use the MXU natively with f32 accumulation."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _alibi_slope_for_head(head_idx, n_heads: int):
    """Per-head ALiBi slope computed in-kernel: 2^{-(h+1)*8/H} — the
    power-of-2 closed form of the xformers slope table (networks.py:99-115)."""
    return jnp.exp2(-(head_idx.astype(jnp.float32) + 1.0) * (8.0 / n_heads))


def _alibi_term(slope, qp, kp):
    """Voicebox ALiBi (networks.py:319-325): -slope * |i - j|, with key
    position 0 (the time pseudo-token) exempt."""
    dist = jnp.abs(qp - kp).astype(jnp.float32)
    return -slope * dist * (kp != 0).astype(jnp.float32)


def _fwd_kernel(
    qpos_ref, kpos_ref, qseg_ref, kseg_ref,  # [1, 1, bq] / [1, 1, bk] int32
    q_ref,  # [1, 1, bq, d]
    k_ref,  # [1, 1, bk, d]
    v_ref,  # [1, 1, bk, d]
    o_ref,  # [1, 1, bq, d]
    lse_ref,  # [1, 1, bq, 8] f32 (log-sum-exp, lanes replicated)
    m_scratch,  # [bq, LANES] f32
    l_scratch,  # [bq, LANES] f32
    acc_scratch,  # [bq, d] f32
    *,
    scale: float,
    causal: bool,
    window: Optional[int],
    alibi: bool,
    n_heads: int,
    block_q: int,
    block_k: int,
):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # --- block-level skip on flat indices (valid for packed causal layouts:
    # within a segment, position deltas equal flat-index deltas) -------------
    qi = pl.program_id(2)
    q_start = qi * block_q
    q_end = q_start + block_q - 1
    k_start = ki * block_k
    k_end = k_start + block_k - 1

    should_run = jnp.bool_(True)
    if causal:
        should_run = jnp.logical_and(should_run, k_start <= q_end)
    if window is not None:
        should_run = jnp.logical_and(should_run, q_start - k_end <= window)
    # program_id must be read outside @pl.when bodies (interpret-mode rule)
    slope = _alibi_slope_for_head(pl.program_id(1), n_heads) if alibi else None

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(q.dtype),
        ) * scale  # [bq, bk]

        qp = qpos_ref[0, 0][:, None]
        kp = kpos_ref[0, 0][None, :]
        qs = qseg_ref[0, 0][:, None]
        ks = kseg_ref[0, 0][None, :]
        mask = jnp.logical_and(qs == ks, qs >= 0)
        if causal:
            mask = jnp.logical_and(mask, qp >= kp)
        if window is not None:
            mask = jnp.logical_and(mask, qp - kp <= window)
        if alibi:
            s = s + _alibi_term(slope, qp, kp)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:, :1]  # [bq, 1]
        l_prev = l_scratch[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # masked entries: exp(NEG_INF - m) = 0
        # fully-masked-so-far rows: m_new == NEG_INF -> p would be exp(0)=1;
        # zero them explicitly.
        p = jnp.where(mask, p, 0.0)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        v = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(v.dtype),
        )
        acc_scratch[...] = acc_scratch[...] * alpha + pv
        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scratch[:, :1]
        safe_l = jnp.where(l > 0.0, l, 1.0)
        o_ref[0, 0, :, :] = (acc_scratch[...] / safe_l).astype(o_ref.dtype)
        lse = m_scratch[:, :8] + jnp.log(jnp.maximum(l_scratch[:, :8], 1e-30))
        lse_ref[0, 0, :, :] = lse


def _fwd_call(
    q, k, v, q_positions, kv_positions, q_segment_ids, kv_segment_ids,
    scale, causal, window, alibi, block_q, block_k,
):
    """q: [B, H, Tq, d]; k/v: [B, Hkv, Tk, d]. Returns o: [B, H, Tq, d]."""
    b, h, tq, d = q.shape
    hkv, tk = k.shape[1], k.shape[2]
    g = h // hkv
    block_q = min(block_q, tq)
    block_k = min(block_k, tk)
    nq = pl.cdiv(tq, block_q)
    nk = pl.cdiv(tk, block_k)

    grid = (b, h, nq, nk)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, window=window, alibi=alibi,
        n_heads=h, block_q=block_q, block_k=block_k,
    )

    def clamp_k(qi, ki):
        # blocks outside the causal/window band repeat an in-range index;
        # Pallas skips the DMA when a block index repeats (compute is skipped
        # by the kernel's own should_run).  Valid for packed causal layouts
        # where in-segment position deltas equal flat-index deltas.
        last = (qi * block_q + block_q - 1) // block_k if causal else nk - 1
        first = jnp.maximum(qi * block_q - window, 0) // block_k if window is not None else 0
        return jnp.clip(ki, first, last)

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, tq, 8), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi, ki: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, clamp_k(qi, ki))),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi, ki: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, clamp_k(qi, ki))),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki, g=g: (bi, hi // g, clamp_k(qi, ki), 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki, g=g: (bi, hi // g, clamp_k(qi, ki), 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(q_positions[:, None], kv_positions[:, None], q_segment_ids[:, None], kv_segment_ids[:, None], q, k, v)


# ---------------------------------------------------------------------------
# Memory-efficient backward (flash-style recompute, jnp scan over kv blocks)
# ---------------------------------------------------------------------------


def _bwd_reference(res, g_out, *, scale, causal, window, alibi, block_k):
    """Chunked recompute backward: O(T * block) memory, pure XLA.

    Recomputes probabilities blockwise (standard flash backward identity:
    dS = P * (dP - rowsum(dO * O)) ) and accumulates dq/dk/dv per kv block.
    """
    q, k, v, o, lse, qpos, kpos, qseg, kseg = res
    b, h, tq, d = q.shape
    hkv, tk = k.shape[1], k.shape[2]
    g = h // hkv
    if alibi:
        head_ids = jnp.arange(h, dtype=jnp.float32)
        slopes_h = jnp.exp2(-(head_ids + 1.0) * (8.0 / h))

    prec = _prec(q.dtype)
    qf = q.astype(jnp.float32).reshape(b, hkv, g, tq, d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    go = g_out.astype(jnp.float32).reshape(b, hkv, g, tq, d)
    delta = jnp.sum(go * o.astype(jnp.float32).reshape(b, hkv, g, tq, d), axis=-1)  # [B,Hkv,G,Tq]
    lse_g = lse.reshape(b, hkv, g, tq)

    nk = tk // block_k

    def kv_block(ci, carry):
        dq = carry
        ks = jax.lax.dynamic_slice_in_dim(kf, ci * block_k, block_k, axis=2)
        vs = jax.lax.dynamic_slice_in_dim(vf, ci * block_k, block_k, axis=2)
        kp = jax.lax.dynamic_slice_in_dim(kpos, ci * block_k, block_k, axis=1)
        ksg = jax.lax.dynamic_slice_in_dim(kseg, ci * block_k, block_k, axis=1)

        # grouped scores (no KV repetition): [B, Hkv, G, Tq, bk]
        s = jnp.einsum("bhgqd,bhkd->bhgqk", qf, ks, preferred_element_type=jnp.float32, precision=prec) * scale
        if alibi:
            slope_g = slopes_h.reshape(hkv, g)
            # [B, Tq] x [B, bk] -> [B, Tq, bk]
            dist = jnp.abs(qpos[:, :, None] - kp[:, None, :]).astype(jnp.float32)
            zero_col = (kp != 0).astype(jnp.float32)[:, None, :]
            s = s - slope_g[None, :, :, None, None] * (dist * zero_col)[:, None, None, :, :]
        mask = (qseg[:, None, None, :, None] == ksg[:, None, None, None, :]) & (
            qseg[:, None, None, :, None] >= 0
        )
        if causal:
            mask = mask & (qpos[:, None, None, :, None] >= kp[:, None, None, None, :])
        if window is not None:
            mask = mask & (qpos[:, None, None, :, None] - kp[:, None, None, None, :] <= window)
        s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - lse_g[..., None])
        p = jnp.where(mask, p, 0.0)

        dp = jnp.einsum("bhgqd,bhkd->bhgqk", go, vs, preferred_element_type=jnp.float32, precision=prec)
        ds = p * (dp - delta[..., None]) * scale

        dq = dq + jnp.einsum("bhgqk,bhkd->bhgqd", ds, ks, preferred_element_type=jnp.float32, precision=prec)
        dk_b = jnp.einsum("bhgqk,bhgqd->bhkd", ds, qf, preferred_element_type=jnp.float32, precision=prec)
        dv_b = jnp.einsum("bhgqk,bhgqd->bhkd", p, go, preferred_element_type=jnp.float32, precision=prec)
        return dq, (dk_b, dv_b)

    dq0 = jnp.zeros_like(qf)
    dq, (dks, dvs) = jax.lax.scan(lambda c, ci: kv_block(ci, c), dq0, jnp.arange(nk))
    dk = jnp.moveaxis(dks, 0, 2).reshape(b, hkv, tk, d)
    dv = jnp.moveaxis(dvs, 0, 2).reshape(b, hkv, tk, d)
    return dq.reshape(b, h, tq, d).astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)




# ---------------------------------------------------------------------------
# Pallas backward kernels (dq and dk/dv; same blocking as the forward)
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    qpos_ref, kpos_ref, qseg_ref, kseg_ref,
    q_ref,  # [1, 1, bq, d]
    k_ref,  # [1, 1, bk, d]
    v_ref,  # [1, 1, bk, d]
    do_ref,  # [1, 1, bq, d]
    lse_ref,  # [1, 1, bq, 8]
    delta_ref,  # [1, 1, bq, 8]
    dq_ref,  # [1, 1, bq, d]
    acc_scratch,  # [bq, d] f32
    *,
    scale: float,
    causal: bool,
    window: Optional[int],
    alibi: bool,
    n_heads: int,
    block_q: int,
    block_k: int,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q_start = qi * block_q
    q_end = q_start + block_q - 1
    k_start = ki * block_k
    k_end = k_start + block_k - 1
    should_run = jnp.bool_(True)
    if causal:
        should_run = jnp.logical_and(should_run, k_start <= q_end)
    if window is not None:
        should_run = jnp.logical_and(should_run, q_start - k_end <= window)
    slope = _alibi_slope_for_head(pl.program_id(1), n_heads) if alibi else None

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, :, :1]  # [bq, 1]
        delta = delta_ref[0, 0, :, :1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(q.dtype),
        ) * scale  # [bq, bk]

        qp = qpos_ref[0, 0][:, None]
        kp = kpos_ref[0, 0][None, :]
        qs = qseg_ref[0, 0][:, None]
        ks = kseg_ref[0, 0][None, :]
        mask = jnp.logical_and(qs == ks, qs >= 0)
        if causal:
            mask = jnp.logical_and(mask, qp >= kp)
        if window is not None:
            mask = jnp.logical_and(mask, qp - kp <= window)
        if alibi:
            s = s + _alibi_term(slope, qp, kp)

        pexp = jnp.where(mask, jnp.exp(s - lse), 0.0)  # [bq, bk]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(v.dtype),
        )
        ds = pexp * (dp - delta) * scale  # [bq, bk] f32
        acc_scratch[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(k.dtype),
        )

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0, :, :] = acc_scratch[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    qpos_ref, kpos_ref, qseg_ref, kseg_ref,
    q_ref,  # [1, 1, bq, d]   (head hkv*G + g, via index map)
    k_ref,  # [1, 1, bk, d]
    v_ref,  # [1, 1, bk, d]
    do_ref,  # [1, 1, bq, d]
    lse_ref,  # [1, 1, bq, 8]
    delta_ref,  # [1, 1, bq, 8]
    dk_ref,  # [1, 1, bk, d]
    dv_ref,  # [1, 1, bk, d]
    dk_scratch,  # [bk, d] f32
    dv_scratch,  # [bk, d] f32
    *,
    scale: float,
    causal: bool,
    window: Optional[int],
    alibi: bool,
    n_heads: int,
    block_q: int,
    block_k: int,
    group: int,
):
    ki = pl.program_id(2)
    gi = pl.program_id(3)
    qi = pl.program_id(4)
    nq = pl.num_programs(4)

    @pl.when(jnp.logical_and(gi == 0, qi == 0))
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    q_start = qi * block_q
    q_end = q_start + block_q - 1
    k_start = ki * block_k
    k_end = k_start + block_k - 1
    should_run = jnp.bool_(True)
    if causal:
        should_run = jnp.logical_and(should_run, k_start <= q_end)
    if window is not None:
        should_run = jnp.logical_and(should_run, q_start - k_end <= window)
    if alibi:
        head = pl.program_id(1) * group + pl.program_id(3)
        slope = _alibi_slope_for_head(head, n_heads)
    else:
        slope = None

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, :, :1]
        delta = delta_ref[0, 0, :, :1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(q.dtype),
        ) * scale  # [bq, bk]

        qp = qpos_ref[0, 0][:, None]
        kp = kpos_ref[0, 0][None, :]
        qs = qseg_ref[0, 0][:, None]
        ks = kseg_ref[0, 0][None, :]
        mask = jnp.logical_and(qs == ks, qs >= 0)
        if causal:
            mask = jnp.logical_and(mask, qp >= kp)
        if window is not None:
            mask = jnp.logical_and(mask, qp - kp <= window)
        if alibi:
            s = s + _alibi_term(slope, qp, kp)

        pexp = jnp.where(mask, jnp.exp(s - lse), 0.0)  # [bq, bk]
        # dv += P^T @ dO
        dv_scratch[...] += jax.lax.dot_general(
            pexp.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(do.dtype),
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(v.dtype),
        )
        ds = pexp * (dp - delta) * scale
        # dk += dS^T @ Q
        dk_scratch[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(q.dtype),
        )

    @pl.when(jnp.logical_and(gi == pl.num_programs(3) - 1, qi == nq - 1))
    def _finalize():
        dk_ref[0, 0, :, :] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_scratch[...].astype(dv_ref.dtype)


def _bwd_pallas(res, g_out, *, scale, causal, window, alibi, block_q, block_k):
    """Pallas backward: dq over a (B,H,nq,nk) grid, dk/dv over a
    (B,Hkv,nk,G,nq) grid with scratch accumulation across the GQA group."""
    q, k, v, o, lse, qpos, kpos, qseg, kseg = res
    b, h, tq, d = q.shape
    hkv, tk = k.shape[1], k.shape[2]
    g = h // hkv
    block_q = min(block_q, tq)
    block_k = min(block_k, tk)
    nq = tq // block_q
    nk = tk // block_k

    do = g_out
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta8 = jnp.broadcast_to(delta[..., None], (*delta.shape, 8))
    lse8 = jnp.broadcast_to(lse[..., None], (*lse.shape, 8))

    dq_kernel = functools.partial(
        _bwd_dq_kernel, scale=scale, causal=causal, window=window, alibi=alibi,
        n_heads=h, block_q=block_q, block_k=block_k,
    )
    def clamp_k(qi, ki):
        last = (qi * block_q + block_q - 1) // block_k if causal else nk - 1
        first = jnp.maximum(qi * block_q - window, 0) // block_k if window is not None else 0
        return jnp.clip(ki, first, last)

    dq = pl.pallas_call(
        dq_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, tq, d), q.dtype),
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi, ki: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, clamp_k(qi, ki))),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, qi, ki: (bi, 0, qi)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, clamp_k(qi, ki))),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki, g=g: (bi, hi // g, clamp_k(qi, ki), 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki, g=g: (bi, hi // g, clamp_k(qi, ki), 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )(qpos[:, None], kpos[:, None], qseg[:, None], kseg[:, None], q, k, v, do, lse8, delta8)

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, scale=scale, causal=causal, window=window, alibi=alibi,
        n_heads=h, block_q=block_q, block_k=block_k, group=g,
    )
    def clamp_q(ki, qi):
        first = (ki * block_k) // block_q if causal else 0
        if window is not None:
            last_q = jnp.minimum((ki * block_k + block_k - 1 + window) // block_q, nq - 1)
        else:
            last_q = nq - 1
        return jnp.clip(qi, first, last_q)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, hkv, tk, d), k.dtype),
            jax.ShapeDtypeStruct((b, hkv, tk, d), v.dtype),
        ),
        grid=(b, hkv, nk, g, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, ki, gi, qi: (bi, 0, clamp_q(ki, qi))),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, ki, gi, qi: (bi, 0, ki)),
            pl.BlockSpec((1, 1, block_q), lambda bi, hi, ki, gi, qi: (bi, 0, clamp_q(ki, qi))),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, ki, gi, qi: (bi, 0, ki)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, gi, qi, g=g: (bi, hi * g + gi, clamp_q(ki, qi), 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, gi, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, gi, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, gi, qi, g=g: (bi, hi * g + gi, clamp_q(ki, qi), 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda bi, hi, ki, gi, qi, g=g: (bi, hi * g + gi, clamp_q(ki, qi), 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda bi, hi, ki, gi, qi, g=g: (bi, hi * g + gi, clamp_q(ki, qi), 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, gi, qi: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, gi, qi: (bi, hi, ki, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )(qpos[:, None], kpos[:, None], qseg[:, None], kseg[:, None], q, k, v, do, lse8, delta8)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12)
)
def _flash(q, k, v, qpos, kpos, qseg, kseg, scale, causal, window, alibi, block_q, block_k):
    o, _ = _fwd_call(q, k, v, qpos, kpos, qseg, kseg, scale, causal, window, alibi, block_q, block_k)
    return o


def _flash_fwd(q, k, v, qpos, kpos, qseg, kseg, scale, causal, window, alibi, block_q, block_k):
    o, lse8 = _fwd_call(q, k, v, qpos, kpos, qseg, kseg, scale, causal, window, alibi, block_q, block_k)
    # the kernel emits LSE (lanes-replicated x8) for free during the fwd pass
    return o, (q, k, v, o, lse8[..., 0], qpos, kpos, qseg, kseg)


def _flash_bwd(scale, causal, window, alibi, block_q, block_k, res, g_out):
    q = res[0]
    tq, tk = q.shape[2], res[1].shape[2]
    if tq % min(block_q, tq) == 0 and tk % min(block_k, tk) == 0:
        dq, dk, dv = _bwd_pallas(res, g_out, scale=scale, causal=causal,
                                 window=window, alibi=alibi,
                                 block_q=block_q, block_k=block_k)
    else:
        dq, dk, dv = _bwd_reference(res, g_out, scale=scale, causal=causal,
                                    window=window, alibi=alibi, block_k=block_k)
    return dq, dk, dv, None, None, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, T, H, d]
    k: jnp.ndarray,  # [B, T, Hkv, d]
    v: jnp.ndarray,
    q_segment_ids: jnp.ndarray,  # [B, Tq]
    kv_segment_ids: jnp.ndarray,  # [B, Tk]
    q_positions: jnp.ndarray,
    kv_positions: jnp.ndarray,
    causal: bool = True,
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    alibi: bool = False,  # Voicebox-style symmetric ALiBi, computed in-kernel
    # from the power-of-2 closed-form slopes (head count must be a power of 2)
    fwd_only: bool = False,  # skip the custom_vjp wrapper.  Historical: a
    # jax-0.9 lowering-cache bug made custom_vjp-wrapped pallas calls inside
    # fori_loop fail to lower; verified fixed (tests/test_flash_attention.py
    # canary), so no in-tree caller needs this anymore.
) -> jnp.ndarray:
    """[B, T, H, d] layout wrapper around the [B, H, T, d] kernel.

    Sequences are padded up to a block multiple with segment id -1 (pad rows
    attend nothing / are attended by nothing), so arbitrary lengths are safe.
    `alibi=True` enables the Voicebox-style symmetric ALiBi bias
    (-slope*|i-j|, key position 0 exempt) computed inside the kernel.
    """
    d = q.shape[-1]
    tq, tk = q.shape[1], k.shape[1]
    scale = d ** -0.5 if scale is None else scale
    block_q = min(block_q, max(128, 1 << (tq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (tk - 1).bit_length()))

    pq = (-tq) % block_q
    pk = (-tk) % block_k

    def pad_t(x, p):
        return jnp.pad(x, ((0, 0), (0, p)) + ((0, 0),) * (x.ndim - 2)) if p else x

    q, q_positions = pad_t(q, pq), pad_t(q_positions.astype(jnp.int32), pq)
    k, kv_positions = pad_t(k, pk), pad_t(kv_positions.astype(jnp.int32), pk)
    v = pad_t(v, pk)
    q_segment_ids = (
        jnp.pad(q_segment_ids.astype(jnp.int32), ((0, 0), (0, pq)), constant_values=-1) if pq else q_segment_ids.astype(jnp.int32)
    )
    kv_segment_ids = (
        jnp.pad(kv_segment_ids.astype(jnp.int32), ((0, 0), (0, pk)), constant_values=-2) if pk else kv_segment_ids.astype(jnp.int32)
    )

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    h = q.shape[2]
    if alibi:
        assert h & (h - 1) == 0, "in-kernel ALiBi needs a power-of-2 head count"
    if fwd_only:
        o, _ = _fwd_call(
            qt, kt, vt,
            q_positions, kv_positions, q_segment_ids, kv_segment_ids,
            scale, causal, sliding_window, alibi, block_q, block_k,
        )
    else:
        o = _flash(
            qt, kt, vt,
            q_positions, kv_positions, q_segment_ids, kv_segment_ids,
            scale, causal, sliding_window, alibi, block_q, block_k,
        )
    o = jnp.swapaxes(o, 1, 2)
    return o[:, :tq] if pq else o
