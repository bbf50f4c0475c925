"""Device-side jitted kernels of the paged continuous-batching engine.

All the single-dispatch building blocks the host scheduler
(`usdm_tpu.engine.paged.PagedEngine`) chains together: the paged KV pool,
decode / chained-decode steps, speculative verify + on-device acceptance,
chunked prefill, first-token sampling, and the fused multi-token loop.
Split from paged.py so device code reviews separately from the scheduler;
see that module's docstring for the engine design and docs/SERVING.md for
the full write-up.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from usdm_tpu.core.config import MistralConfig
from usdm_tpu.models import mistral as M
from usdm_tpu.models.quant import qmm
from usdm_tpu.ops.attention import mha
from usdm_tpu.ops.sampling import NEG_INF, sample_batched, split_keys

# ---------------------------------------------------------------------------
# Device-side paged KV
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PagedKV:
    """Pool layout [Hkv, L*N, P, hd]: the layer index is FOLDED INTO the page
    id (layer li's page p lives at li*N + p).  Two wins over the naive
    [L, Hkv, N, P, hd]: (1) the layer-stack scan carries ONE buffer updated
    in place by scatter — passing per-layer pools through scan xs/ys forced
    XLA to materialize a fresh full-pool copy every decode step (measured
    2.2 GB of temps per step at 2 slots, >half the step time); (2) the Pallas
    kernel needs no layer axis — callers just offset the page table by li*N.
    The host-side page table stays layer-relative (ids in [0, N)).

    With dtype=int8 (vLLM's quantized-KV-cache analog) the pools store
    symmetric per-(head, token) int8 values with f32 scales in k_scales /
    v_scales [L*N, Hkv, P]: half the page HBM (double the max context per
    pool) and half the attention-read traffic at large batch.  The scale
    pools are PAGE-MAJOR (page axis leading) so the kernel's per-page DMA
    slices an untiled leading axis — a [Hkv, L*N, P] layout would slice one
    element of the sublane-tiled page axis, which Mosaic rejects.  bf16
    pools leave the scale fields None."""

    k_pages: jnp.ndarray  # [Hkv, L*N, P, hd] (kv-head-major; see paged_attention)
    v_pages: jnp.ndarray  # [Hkv, L*N, P, hd]
    k_scales: Optional[jnp.ndarray] = None  # [L*N, Hkv, P] f32 (int8 pools)
    v_scales: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, cfg: MistralConfig, n_pages: int, page_size: int, dtype=None) -> "PagedKV":
        dtype = jnp.dtype(dtype or cfg.dtype)
        shape = (cfg.num_kv_heads, cfg.num_layers * n_pages, page_size, cfg.head_dim)
        if dtype == jnp.int8:
            sshape = (shape[1], shape[0], page_size)
            return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                       jnp.zeros(sshape, jnp.float32), jnp.zeros(sshape, jnp.float32))
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None


jax.tree_util.register_dataclass(
    PagedKV, data_fields=["k_pages", "v_pages", "k_scales", "v_scales"],
    meta_fields=[])


def quant_kv_token(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 over the last (head_dim) axis -> (q [..., hd] int8,
    scale [...] f32).  Per-(head, token) scales keep the quantization error
    ~0.4% regardless of K/V magnitude drift across positions."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _psum(x, tp_axis):
    return x if tp_axis is None else jax.lax.psum(x, tp_axis)


def _proj_dim(w) -> int:
    """Output dim of a projection weight (plain array or quantized dict)."""
    return (w["q"] if isinstance(w, dict) else w).shape[-1]


@partial(jax.jit, static_argnames=("cfg", "page_size", "do_sample", "tp_axis",
                                   "needs_filter", "logits_slice"),
         donate_argnums=(1,))
def paged_decode_step(
    params: M.Params,
    kv: PagedKV,
    cfg: MistralConfig,
    tokens: jnp.ndarray,  # [B] current token per slot
    seq_lens: jnp.ndarray,  # [B] tokens already in cache (position of this token)
    page_table: jnp.ndarray,  # [B, maxp]
    active: jnp.ndarray,  # [B] bool
    allow_masks: jnp.ndarray,  # [B, V] bool per-slot vocab masks
    page_size: int,
    keys: jnp.ndarray,  # [B, 2] uint32 per-slot PRNG keys
    top_k: jnp.ndarray,  # [B] int32
    top_p: jnp.ndarray,  # [B] f32
    temperature: jnp.ndarray,  # [B] f32
    do_sample: bool = False,
    tp_axis: Optional[str] = None,
    needs_filter: bool = True,
    logits_slice: Optional[Tuple[int, int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, PagedKV]:
    """One decode step for every active slot -> (next_token [B], keys', kv').

    With do_sample=False every slot is argmax and `keys` pass through
    untouched (the common greedy path compiles without the vocab sort).

    `logits_slice=(lo, hi, extra)` (greedy, single-device only) is a LOSSLESS
    bandwidth cut: every active slot's allow-mask is the interval [lo, hi)
    plus the optional `extra` column (the dialog stage masks,
    ops/sampling.stage_allow_mask), so the lm_head matvec only reads those
    columns — stage C touches 10k of 42k vocab columns, dropping ~260 MB of
    the per-token weight read.  The argmax is taken inside the slice and
    shifted back; `allow_masks` is still applied within the slice.

    With `tp_axis` set the body runs INSIDE a shard_map over that mesh axis
    (engine.tp): params/kv arrive as per-device shards (heads and ffn split),
    h/hkv/vocab are derived from local shapes, matmul partial sums psum, and
    the vocab-sharded logits all_gather before masking/sampling — the
    explicit-collective TP serving path (SURVEY §2.3).
    """
    if logits_slice is not None and (do_sample or tp_axis is not None):
        raise ValueError("logits_slice requires greedy single-device decode")
    b = tokens.shape[0]
    hd = cfg.head_dim
    # local head counts come from the (possibly sharded) weights, not cfg
    h = _proj_dim(params["layers"]["wq"]) // hd
    hkv = _proj_dim(params["layers"]["wk"]) // hd
    cdt = jnp.dtype(cfg.dtype)

    pos = seq_lens  # position of the incoming token
    x = params["embed"].astype(cdt)[tokens][:, None, :]
    cos, sin = M.rope_tables(pos[:, None], cfg.head_dim, cfg.rope_theta)

    n_pages = kv.k_pages.shape[1] // cfg.num_layers
    page_ids = page_table[jnp.arange(b), pos // page_size]  # [B] layer-relative
    # inactive slots must not scribble over pages that may have been freed
    # and reassigned: route their writes to the reserved trash page (last
    # page of each layer's region, never allocated).
    trash = n_pages - 1
    page_ids = jnp.where(active, page_ids, trash)
    offs = pos % page_size

    def body(carry, xs):
        x, kvp = carry
        k_pool, v_pool = kvp.k_pages, kvp.v_pages
        ks_pool, vs_pool = kvp.k_scales, kvp.v_scales
        lp, li = xs
        base = li * n_pages  # this layer's region of the folded page axis
        y = M.rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
        q = qmm(y, lp["wq"]).reshape(b, 1, h, hd)
        kk = qmm(y, lp["wk"]).reshape(b, hkv, hd)
        vv = qmm(y, lp["wv"]).reshape(b, hkv, hd)
        q = M.apply_rope(q, cos, sin)
        kk = M.apply_rope(kk[:, None], cos, sin)[:, 0]

        if ks_pool is not None:  # int8 pool: quantize per (head, token)
            kk, kk_s = quant_kv_token(kk)  # [B, Hkv] f32 scales
            vv, vv_s = quant_kv_token(vv)

        # write each slot's new kv at its (layer-offset) page/offset.  One
        # dynamic_update_slice per slot (static unroll, [Hkv, 1, 1, hd] each):
        # DUS on the scan carry updates the pool IN PLACE, where a batched
        # scatter made XLA materialize a fresh full-pool copy every step
        # (measured 2.2 GB of temps and ~10x the step time at 2 slots).
        upd_k = jnp.swapaxes(kk, 0, 1).astype(k_pool.dtype)  # [Hkv, B, hd]
        upd_v = jnp.swapaxes(vv, 0, 1).astype(v_pool.dtype)
        for bi in range(b):
            at = (jnp.int32(0), base + page_ids[bi], offs[bi], jnp.int32(0))
            k_pool = jax.lax.dynamic_update_slice(k_pool, upd_k[:, bi][:, None, None, :], at)
            v_pool = jax.lax.dynamic_update_slice(v_pool, upd_v[:, bi][:, None, None, :], at)
            if ks_pool is not None:  # page-major scale pools [L*N, Hkv, P]
                s_at = (at[1], jnp.int32(0), at[2])
                ks_pool = jax.lax.dynamic_update_slice(
                    ks_pool, kk_s[bi][None, :, None], s_at)
                vs_pool = jax.lax.dynamic_update_slice(
                    vs_pool, vv_s[bi][None, :, None], s_at)

        g = h // hkv
        qg = q[:, 0].reshape(b, hkv, g, hd)  # heads grouped per kv head
        # the manual-DMA kernel needs tile-aligned page slices (lane dim 128,
        # sublane mult of 8; int8 scale rows [Hkv, P] additionally want a
        # 128-multiple page); tiny test/demo geometries fall back to XLA gather
        kern_ok = hd % 128 == 0 and page_size % 8 == 0
        if ks_pool is not None:
            kern_ok = kern_ok and page_size % 128 == 0
        if jax.devices()[0].platform == "tpu" and kern_ok:
            from usdm_tpu.ops.paged_attention import paged_decode_attention

            attn = paged_decode_attention(
                qg, k_pool, v_pool, page_table + base, pos + 1,
                sliding_window=cfg.sliding_window,
                k_scales=ks_pool, v_scales=vs_pool,
            )
        else:
            from usdm_tpu.ops.paged_attention import paged_decode_attention_reference

            attn = paged_decode_attention_reference(
                qg, k_pool, v_pool, page_table + base, pos + 1,
                sliding_window=cfg.sliding_window,
                k_scales=ks_pool, v_scales=vs_pool,
            )
        attn = attn.reshape(b, 1, h * hd)
        x = x + _psum(qmm(attn, lp["wo"]), tp_axis)
        y = M.rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
        x = x + _psum(
            qmm(jax.nn.silu(qmm(y, lp["w_gate"])) * qmm(y, lp["w_up"]), lp["w_down"]),
            tp_axis,
        )
        return (x, PagedKV(k_pool, v_pool, ks_pool, vs_pool)), None

    (x, kv), _ = jax.lax.scan(
        body, (x, kv),
        (params["layers"], jnp.arange(cfg.num_layers, dtype=jnp.int32)),
    )
    x = M.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params["lm_head"].astype(x.dtype)
    if logits_slice is not None:
        lo, hi, extra = logits_slice
        logits = (x[:, 0] @ lm_head[:, lo:hi]).astype(jnp.float32)
        logits = jnp.where(allow_masks[:, lo:hi], logits, NEG_INF)
        best = jnp.argmax(logits, axis=-1)
        nxt = (best + lo).astype(jnp.int32)
        if extra >= 0:  # the stage-C space_id column outside the interval
            ev = (x[:, 0] @ lm_head[:, extra]).astype(jnp.float32)
            bv = jnp.take_along_axis(logits, best[:, None], axis=-1)[:, 0]
            # tie-break matches full-vocab argmax (first index wins)
            take = ev >= bv if extra < lo else ev > bv
            nxt = jnp.where(take, jnp.int32(extra), nxt)
        return jnp.where(active, nxt, 0), keys, kv
    logits = (x[:, 0] @ lm_head).astype(jnp.float32)
    if tp_axis is not None:  # lm_head is vocab-sharded: assemble full logits
        logits = jax.lax.all_gather(logits, tp_axis, axis=1, tiled=True)
    logits = jnp.where(allow_masks, logits, NEG_INF)
    if do_sample:
        new_keys, use = split_keys(keys)
        # a slot's key stream advances exactly once per token it actually
        # samples — NOT per dispatch.  Rows that are prefilling, EOS-frozen
        # in a chain, or otherwise inactive keep their key, so a sampled
        # request's output never depends on scheduler interleaving (mixed
        # vs alternating prefill, chain length, batch composition).
        keys = jnp.where(active[:, None], new_keys, keys)
        nxt = sample_batched(logits, use, top_k, top_p, temperature,
                             needs_filter=needs_filter)
    else:
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    nxt = jnp.where(active, nxt, 0)
    return nxt, keys, kv


@partial(jax.jit, static_argnames=("cfg", "page_size", "do_sample",
                                   "needs_filter", "tp_axis", "logits_slice"),
         donate_argnums=(1,))
def paged_decode_step_chained(
    params: M.Params,
    kv: PagedKV,
    cfg: MistralConfig,
    tokens: jnp.ndarray,  # [B] previous step's token
    seq_lens: jnp.ndarray,  # [B]
    page_table: jnp.ndarray,  # [B, maxp]
    active: jnp.ndarray,  # [B] bool (slot is DECODE this chain)
    done: jnp.ndarray,  # [B] bool (slot hit its EOS earlier in the chain)
    eos_ids: jnp.ndarray,  # [B]
    allow_masks: jnp.ndarray,
    page_size: int,
    keys: jnp.ndarray,
    top_k: jnp.ndarray,
    top_p: jnp.ndarray,
    temperature: jnp.ndarray,
    do_sample: bool = False,
    needs_filter: bool = True,
    tp_axis: Optional[str] = None,
    logits_slice: Optional[Tuple[int, int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, PagedKV]:
    """One chained decode step with the EOS-freeze bookkeeping folded in:
    -> (token [B], done' [B], seq_lens' [B], keys', kv').

    `step_chain` dispatches this N times back-to-back with ONE host sync at
    the end; folding the freeze/length updates into the jit makes each link
    a single dispatch instead of one decode call plus four elementwise ops
    (the extra dispatches cost ~1 ms/token over the tunnel).  With `tp_axis`
    the body runs inside a shard_map over that mesh axis (engine.tp) — the
    TP serving path chains links exactly like the single-device one.
    `logits_slice`: see paged_decode_step."""
    nxt, keys, kv = paged_decode_step.__wrapped__(
        params, kv, cfg, tokens, seq_lens, page_table,
        jnp.logical_and(active, ~done), allow_masks, page_size,
        keys, top_k, top_p, temperature,
        do_sample=do_sample, needs_filter=needs_filter, tp_axis=tp_axis,
        logits_slice=logits_slice,
    )
    nxt = jnp.where(done, 0, nxt)
    new_done = jnp.logical_or(done, nxt == eos_ids)
    new_lens = jnp.where(done, seq_lens, seq_lens + 1)
    return nxt, new_done, new_lens, keys, kv


@partial(jax.jit, static_argnames=("cfg", "page_size", "n_ctx_pages", "tp_axis",
                                   "logits_slice"),
         donate_argnums=(1,))
def paged_verify_step(
    params: M.Params,
    kv: PagedKV,
    cfg: MistralConfig,
    tokens: jnp.ndarray,  # [B, K+1]: [current, draft_0, ..., draft_{K-1}]
    seq_lens: jnp.ndarray,  # [B] position of tokens[:, 0]
    page_table: jnp.ndarray,  # [B, maxp]
    active: jnp.ndarray,  # [B] bool
    allow_masks: jnp.ndarray,  # [B, V]
    page_size: int,
    n_ctx_pages: int,  # static bucket: pages gathered as attention context
    tp_axis: Optional[str] = None,  # see paged_decode_step
    logits_slice: Optional[Tuple[int, int, int]] = None,  # see paged_decode_step
) -> Tuple[jnp.ndarray, PagedKV]:
    """Speculative-decoding verification: one target forward over K+1 tokens
    per slot -> greedy argmax at every position ([B, K+1]) and the target KV
    written into the pages.

    Column j's argmax is the target's prediction for position seq_lens+j+1;
    the scheduler accepts the draft prefix that matches and emits one bonus
    token — per-token cost is ~1/(accepted+1) target weight reads (the step
    is weight-read bound at 7B-int8).  Rejected positions leave stale KV in
    owned pages: kv-length masking hides it and the next round's writes
    overwrite it (the K+1-token write span always covers the previous
    round's rejected span).  Reference analog: vLLM's speculative decoding
    worker; greedy-only, like the reference's default decode.
    """
    b, k1 = tokens.shape
    hd = cfg.head_dim
    h = _proj_dim(params["layers"]["wq"]) // hd  # local (sharded) head counts
    hkv = _proj_dim(params["layers"]["wk"]) // hd
    cdt = jnp.dtype(cfg.dtype)
    p = page_size
    n_pages = kv.k_pages.shape[1] // cfg.num_layers
    s_ctx = n_ctx_pages * p

    positions = seq_lens[:, None] + jnp.arange(k1)[None]  # [B, K1]
    x = params["embed"].astype(cdt)[tokens]  # [B, K1, D]
    cos, sin = M.rope_tables(positions, cfg.head_dim, cfg.rope_theta)

    trash = n_pages - 1
    maxp = page_table.shape[1]
    # per-(slot, token) write targets; inactive slots go to the trash page
    w_pages = page_table[jnp.arange(b)[:, None],
                         jnp.minimum(positions // p, maxp - 1)]  # [B, K1]
    w_pages = jnp.where(active[:, None], w_pages, trash)
    w_offs = positions % p

    row_ids = page_table[:, :n_ctx_pages]  # [B, ncp] layer-relative
    kv_pos = jnp.arange(s_ctx)[None]  # [1, S_ctx]
    q_seg = jnp.where(active, 0, -1)[:, None] * jnp.ones((1, k1), jnp.int32)
    kv_seg = jnp.where(
        jnp.logical_and(kv_pos < (seq_lens + k1)[:, None], active[:, None]), 0, -1)

    def body(carry, xs):
        x, kvp = carry
        k_pool, v_pool = kvp.k_pages, kvp.v_pages
        ks_pool, vs_pool = kvp.k_scales, kvp.v_scales
        lp, li = xs
        base = li * n_pages
        y = M.rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
        q = qmm(y, lp["wq"]).reshape(b, k1, h, hd)
        kk = qmm(y, lp["wk"]).reshape(b, k1, hkv, hd)
        vv = qmm(y, lp["wv"]).reshape(b, k1, hkv, hd)
        q = M.apply_rope(q, cos, sin)
        kk = M.apply_rope(kk, cos, sin)

        kk_t = kk.transpose(2, 0, 1, 3)  # [Hkv, B, K1, hd]
        vv_t = vv.transpose(2, 0, 1, 3)
        if ks_pool is not None:  # int8 pool: quantize per (head, token)
            kk_t, ks_t = quant_kv_token(kk_t)  # scales [Hkv, B, K1]
            vv_t, vs_t = quant_kv_token(vv_t)
        else:
            kk_t = kk_t.astype(k_pool.dtype)
            vv_t = vv_t.astype(v_pool.dtype)
        for bi in range(b):
            for j in range(k1):
                at = (jnp.int32(0), base + w_pages[bi, j], w_offs[bi, j], jnp.int32(0))
                k_pool = jax.lax.dynamic_update_slice(
                    k_pool, kk_t[:, bi, j][:, None, None, :], at)
                v_pool = jax.lax.dynamic_update_slice(
                    v_pool, vv_t[:, bi, j][:, None, None, :], at)
                if ks_pool is not None:  # page-major scale pools
                    s_at = (at[1], jnp.int32(0), at[2])
                    ks_pool = jax.lax.dynamic_update_slice(
                        ks_pool, ks_t[:, bi, j][None, :, None], s_at)
                    vs_pool = jax.lax.dynamic_update_slice(
                        vs_pool, vs_t[:, bi, j][None, :, None], s_at)

        # context gather (includes the K+1 tokens just written)
        abs_ids = base + row_ids  # [B, ncp]
        kc = k_pool[:, abs_ids]  # [Hkv, B, ncp, P, hd]
        vc = v_pool[:, abs_ids]
        if ks_pool is not None:  # dequantize the gathered context
            kc = kc.astype(jnp.float32) * jnp.moveaxis(
                ks_pool[abs_ids], 2, 0)[..., None]
            vc = vc.astype(jnp.float32) * jnp.moveaxis(
                vs_pool[abs_ids], 2, 0)[..., None]
        kc = kc.transpose(1, 2, 3, 0, 4).reshape(b, s_ctx, hkv, hd)
        vc = vc.transpose(1, 2, 3, 0, 4).reshape(b, s_ctx, hkv, hd)
        attn = mha(
            q, kc.astype(cdt), vc.astype(cdt),
            q_segment_ids=q_seg, kv_segment_ids=kv_seg,
            q_positions=positions, kv_positions=jnp.broadcast_to(kv_pos, (b, s_ctx)),
            causal=True, sliding_window=cfg.sliding_window, impl="xla",
        )
        x = x + _psum(qmm(attn.reshape(b, k1, h * hd), lp["wo"]), tp_axis)
        y2 = M.rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
        x = x + _psum(
            qmm(jax.nn.silu(qmm(y2, lp["w_gate"])) * qmm(y2, lp["w_up"]),
                lp["w_down"]), tp_axis)
        return (x, PagedKV(k_pool, v_pool, ks_pool, vs_pool)), None

    (x, kv), _ = jax.lax.scan(
        body, (x, kv),
        (params["layers"], jnp.arange(cfg.num_layers, dtype=jnp.int32)),
    )
    x = M.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params["lm_head"].astype(x.dtype)
    if logits_slice is not None:  # greedy sliced tail (see paged_decode_step)
        lo, hi, extra = logits_slice
        logits = (x @ lm_head[:, lo:hi]).astype(jnp.float32)
        logits = jnp.where(allow_masks[:, None, lo:hi], logits, NEG_INF)
        best = jnp.argmax(logits, axis=-1)
        out = (best + lo).astype(jnp.int32)
        if extra >= 0:
            ev = (x @ lm_head[:, extra]).astype(jnp.float32)  # [B, K1]
            bv = jnp.take_along_axis(logits, best[..., None], axis=-1)[..., 0]
            take = ev >= bv if extra < lo else ev > bv
            out = jnp.where(take, jnp.int32(extra), out)
        return out, kv
    logits = (x @ lm_head).astype(jnp.float32)
    if tp_axis is not None:  # lm_head is vocab-sharded: assemble full logits
        logits = jax.lax.all_gather(logits, tp_axis, axis=2, tiled=True)
    logits = jnp.where(allow_masks[:, None, :], logits, NEG_INF)
    out = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, K1]
    return out, kv


@partial(jax.jit, static_argnames=("cfg", "page_size", "n_ctx_pages", "tp_axis",
                                   "logits_slice"),
         donate_argnums=(1,))
def paged_spec_accept(
    params: M.Params,
    kv: PagedKV,
    cfg: MistralConfig,
    ver_in: jnp.ndarray,  # [B, K+1]: [current, drafts...]
    seq_lens: jnp.ndarray,  # [B]
    done: jnp.ndarray,  # [B] bool: frozen (EOS'd earlier in this chain)
    eos_ids: jnp.ndarray,  # [B]
    page_table: jnp.ndarray,
    active: jnp.ndarray,
    allow_masks: jnp.ndarray,
    page_size: int,
    n_ctx_pages: int,
    tp_axis: Optional[str] = None,
    logits_slice: Optional[Tuple[int, int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, PagedKV]:
    """Verification + ON-DEVICE acceptance for a chained speculative round:
    -> (tokens [B, K+1], n_emit [B], next_cur [B], done' [B], seq_lens' [B],
    kv').

    Folding the accept/EOS/length logic into the jit lets the scheduler run
    R rounds back-to-back with ONE host sync (host round-trips otherwise
    dominate the round: 2 syncs cost more than the draft+verify compute).
    With `tp_axis` the verify forward runs tensor-parallel inside a shard_map
    (engine.tp); the acceptance math below is elementwise on replicated
    logits-argmax outputs, so it is identical on every device."""
    b, k1 = ver_in.shape
    live = jnp.logical_and(active, ~done)
    out, kv = paged_verify_step.__wrapped__(
        params, kv, cfg, ver_in, seq_lens, page_table, live, allow_masks,
        page_size, n_ctx_pages, tp_axis=tp_axis, logits_slice=logits_slice,
    )
    # accepted prefix: drafts d_j (= ver_in[:, j+1]) matching target out[:, j]
    matches = ver_in[:, 1:] == out[:, :-1]  # [B, K]
    n_acc = jnp.cumprod(matches.astype(jnp.int32), axis=1).sum(axis=1)  # [B]
    cols = jnp.arange(k1)[None]
    # emitted tokens are out[:, :n_acc+1]; truncate at the first EOS inside
    is_eos = jnp.logical_and(out == eos_ids[:, None], cols <= n_acc[:, None])
    has_eos = is_eos.any(axis=1)
    eos_pos = jnp.argmax(is_eos, axis=1)
    n_emit = jnp.where(has_eos, eos_pos + 1, n_acc + 1)
    n_emit = jnp.where(live, n_emit, 0)
    out = jnp.where((cols < n_emit[:, None]), out, 0)
    next_cur = jnp.where(
        live, out[jnp.arange(b), jnp.maximum(n_emit - 1, 0)], ver_in[:, 0])
    new_done = jnp.logical_or(done, has_eos)
    new_lens = seq_lens + n_emit
    return out, n_emit, next_cur, new_done, new_lens, kv


def ngram_propose(
    history: jnp.ndarray,  # [B, S] int32 token history (prompt + emitted)
    hist_len: jnp.ndarray,  # [B] valid tokens; history[:, hist_len-1] == cur
    cur: jnp.ndarray,  # [B] current token (last emitted)
    k: int,  # proposal length
    max_n: int,  # longest suffix n-gram to match
) -> jnp.ndarray:
    """Draft-free prompt-lookup proposal (vLLM's ngram speculative method,
    the engine behind the reference's serving path
    /root/reference/src/inference_vllm.py:109): propose the K tokens that
    followed the most recent, longest (<= max_n) occurrence of the current
    suffix in the sequence's OWN history.  Pure VPU work — a handful of
    [B, S] compares + one argmax — chained on device with the verify step.

    Falls back to repeating `cur` when no suffix recurs (or past the end of
    history): 50 Hz unit streams are never deduplicated (reference
    decoder/scripts/preprocess.py:40), so steady phonemes/silence emit long
    runs where repeat-current is exactly right.  Returns proposals [B, K];
    garbage rows for inactive slots are fine (verification masks them)."""
    b, s = history.shape
    pos = jnp.arange(s)[None]  # candidate continuation start i
    match_n = jnp.zeros((b, s), jnp.int32)
    all_eq = jnp.ones((b, s), bool)
    for j in range(1, max_n + 1):
        # history[:, i-j] for every i, via a left pad (static shift)
        shifted = jnp.pad(history, ((0, 0), (j, 0)))[:, :s]
        suf_j = jnp.take_along_axis(
            history, jnp.maximum(hist_len - j, 0)[:, None], axis=1)  # [B, 1]
        all_eq = jnp.logical_and(all_eq, shifted == suf_j)
        ok = jnp.logical_and(all_eq, pos >= j)
        ok = jnp.logical_and(ok, (hist_len > j)[:, None])
        match_n = jnp.where(ok, j, match_n)
    # i < hist_len: at least one real continuation token, and the trivial
    # self-match at i == hist_len is excluded
    valid = jnp.logical_and(pos < hist_len[:, None], match_n >= 1)
    # longest match wins; ties go to the most recent occurrence
    score = jnp.where(valid, match_n * s + pos, -1)
    best = jnp.argmax(score, axis=1)  # [B]
    found = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0] >= 0
    idx = best[:, None] + jnp.arange(k)[None]  # [B, K]
    cont = jnp.take_along_axis(history, jnp.minimum(idx, s - 1), axis=1)
    take = jnp.logical_and(idx < hist_len[:, None], found[:, None])
    return jnp.where(take, cont, cur[:, None])


@partial(jax.jit, static_argnames=("cfg", "page_size", "n_ctx_pages", "k",
                                   "max_n", "tp_axis", "logits_slice"),
         donate_argnums=(1, 3))
def paged_ngram_round(
    params: M.Params,
    kv: PagedKV,
    cfg: MistralConfig,
    history: jnp.ndarray,  # [B, S] int32 (S = max_pages_per_seq * page_size)
    cur: jnp.ndarray,  # [B] current token
    seq_lens: jnp.ndarray,  # [B]
    done: jnp.ndarray,  # [B] bool
    eos_ids: jnp.ndarray,  # [B]
    page_table: jnp.ndarray,
    active: jnp.ndarray,
    allow_masks: jnp.ndarray,
    page_size: int,
    n_ctx_pages: int,
    k: int,
    max_n: int,
    tp_axis: Optional[str] = None,
    logits_slice: Optional[Tuple[int, int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray, PagedKV]:
    """One draft-free speculative round: ngram-propose K tokens from the
    sequence's own history, verify + accept on device (paged_spec_accept),
    and append the emitted tokens to the history — all in ONE dispatch, so
    rounds chain back-to-back with a single host sync like step_spec rounds.
    -> (tokens [B, K+1], n_emit [B], next_cur [B], done', seq_lens',
    history', kv').  Per-round cost ~= one target decode step (the proposal
    is a few [B, S] compares); emitted tokens per round ∈ [1, K+1]."""
    b, s = history.shape
    hist_len = seq_lens + 1  # prompt + emitted tokens (cur is the last)
    props = ngram_propose(history, hist_len, cur, k, max_n)
    ver_in = jnp.concatenate([cur[:, None], props], axis=1)
    out, n_emit, next_cur, new_done, new_lens, kv = paged_spec_accept.__wrapped__(
        params, kv, cfg, ver_in, seq_lens, done, eos_ids, page_table, active,
        allow_masks, page_size, n_ctx_pages, tp_axis=tp_axis,
        logits_slice=logits_slice,
    )
    cols = jnp.arange(k + 1)[None]
    w_idx = jnp.where(cols < n_emit[:, None], hist_len[:, None] + cols, s)
    history = history.at[jnp.arange(b)[:, None], w_idx].set(out, mode="drop")
    return out, n_emit, next_cur, new_done, new_lens, history, kv


@partial(jax.jit, static_argnames=("cfg", "page_size", "n_ctx_pages", "tp_axis"),
         donate_argnums=(1,))
def paged_prefill_chunk(
    params: M.Params,
    kv: PagedKV,
    cfg: MistralConfig,
    chunk_ids: jnp.ndarray,  # [C] right-padded chunk of prompt tokens
    start: jnp.ndarray,  # [] int32: tokens already written for this slot
    n_valid: jnp.ndarray,  # [] int32: valid tokens in this chunk
    page_table_row: jnp.ndarray,  # [maxp] this request's pages
    page_size: int,
    n_ctx_pages: int,  # static: pages gathered as attention context
    tp_axis: Optional[str] = None,  # see paged_decode_step
) -> Tuple[jnp.ndarray, PagedKV]:
    """Prefill one chunk of one request into its pages.

    Chunk queries attend to the request's previously-written pages plus the
    chunk itself (causal); K/V land directly in the page pool, so a prompt of
    any length streams through in `C`-token slices interleaved with decode
    steps (vLLM chunked prefill; reference admission is monolithic,
    inference_vllm.py:109).  Returns (last-valid-token logits [V] f32, kv').
    """
    c = chunk_ids.shape[0]
    hd = cfg.head_dim
    h = _proj_dim(params["layers"]["wq"]) // hd
    hkv = _proj_dim(params["layers"]["wk"]) // hd
    cdt = jnp.dtype(cfg.dtype)
    p = page_size
    s_ctx = n_ctx_pages * p

    positions = (start + jnp.arange(c))[None]  # [1, C] absolute
    q_seg = jnp.where(jnp.arange(c)[None] < n_valid, 0, -1)
    x = params["embed"].astype(cdt)[chunk_ids][None]  # [1, C, D]
    cos, sin = M.rope_tables(positions, cfg.head_dim, cfg.rope_theta)

    # write targets: chunk token i lives at global index start+i
    n_pages = kv.k_pages.shape[1] // cfg.num_layers
    gidx = start + jnp.arange(c)
    pages_t = page_table_row[jnp.minimum(gidx // p, page_table_row.shape[0] - 1)]
    trash = n_pages - 1
    pages_t = jnp.where(jnp.arange(c) < n_valid, pages_t, trash)
    offs_t = gidx % p

    # context: the first n_ctx_pages of this row (covers start + C tokens);
    # rows beyond the allocation point at page 0 — masked out by kv_seg below.
    row_ids = page_table_row[:n_ctx_pages]
    kv_pos = jnp.arange(s_ctx)[None]  # [1, S_ctx]
    kv_seg = jnp.where(kv_pos < start + n_valid, 0, -1)

    def body(carry, xs):
        x, kvp = carry
        k_pool, v_pool = kvp.k_pages, kvp.v_pages
        ks_pool, vs_pool = kvp.k_scales, kvp.v_scales
        lp, li = xs
        base = li * n_pages
        y = M.rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
        q = qmm(y, lp["wq"]).reshape(1, c, h, hd)
        kk = qmm(y, lp["wk"]).reshape(1, c, hkv, hd)
        vv = qmm(y, lp["wv"]).reshape(1, c, hkv, hd)
        q = M.apply_rope(q, cos, sin)
        kk = M.apply_rope(kk, cos, sin)

        kk_t = kk[0].transpose(1, 0, 2)  # [Hkv, C, hd]
        vv_t = vv[0].transpose(1, 0, 2)
        if ks_pool is not None:  # int8 pool: quantize per (head, token)
            kk_t, ks_t = quant_kv_token(kk_t)  # scales [Hkv, C]
            vv_t, vs_t = quant_kv_token(vv_t)
        else:
            kk_t = kk_t.astype(k_pool.dtype)
            vv_t = vv_t.astype(v_pool.dtype)
        if c % p == 0:
            # chunk starts are always multiples of the (static) chunk size, so
            # when the page size divides the chunk, the chunk covers exactly
            # c/p whole pages: write each as one in-place dynamic_update_slice
            # (the batched scatter forces XLA to copy the full pool — see the
            # decode-step comment).  Fully-invalid pages (beyond n_valid, i.e.
            # past this prompt's page allocation) go to the trash page;
            # partially-valid pages keep their padding garbage, which kv_len
            # masking hides and later writes overwrite.
            kk_p = kk_t.reshape(hkv, c // p, p, hd)
            vv_p = vv_t.reshape(hkv, c // p, p, hd)
            if ks_pool is not None:  # page-major [c/p, Hkv, p] scale tiles
                ks_p = ks_t.reshape(hkv, c // p, p).transpose(1, 0, 2)
                vs_p = vs_t.reshape(hkv, c // p, p).transpose(1, 0, 2)
            maxp = page_table_row.shape[0]
            for j in range(c // p):
                pg = page_table_row[jnp.minimum(start // p + j, maxp - 1)]
                pg = jnp.where(j * p < n_valid, pg, trash)
                at = (jnp.int32(0), base + pg, jnp.int32(0), jnp.int32(0))
                k_pool = jax.lax.dynamic_update_slice(k_pool, kk_p[:, j][:, None], at)
                v_pool = jax.lax.dynamic_update_slice(v_pool, vv_p[:, j][:, None], at)
                if ks_pool is not None:
                    s_at = (at[1], jnp.int32(0), jnp.int32(0))
                    ks_pool = jax.lax.dynamic_update_slice(
                        ks_pool, ks_p[j][None], s_at)
                    vs_pool = jax.lax.dynamic_update_slice(
                        vs_pool, vs_p[j][None], s_at)
        else:  # unaligned (small-page test geometries): scatter fallback
            k_pool = k_pool.at[:, base + pages_t, offs_t].set(kk_t)
            v_pool = v_pool.at[:, base + pages_t, offs_t].set(vv_t)
            if ks_pool is not None:
                ks_pool = ks_pool.at[base + pages_t, :, offs_t].set(ks_t.T)
                vs_pool = vs_pool.at[base + pages_t, :, offs_t].set(vs_t.T)

        # gather this request's context (including the chunk just written)
        kc = k_pool[:, base + row_ids]  # [Hkv, ncp, P, hd]
        vc = v_pool[:, base + row_ids]
        if ks_pool is not None:  # dequantize the gathered context
            kc = kc.astype(jnp.float32) * jnp.moveaxis(
                ks_pool[base + row_ids], 1, 0)[..., None]
            vc = vc.astype(jnp.float32) * jnp.moveaxis(
                vs_pool[base + row_ids], 1, 0)[..., None]
        kc = kc.reshape(hkv, s_ctx, hd).transpose(1, 0, 2)[None]
        vc = vc.reshape(hkv, s_ctx, hd).transpose(1, 0, 2)[None]
        attn = mha(
            q, kc.astype(cdt), vc.astype(cdt),
            q_segment_ids=q_seg, kv_segment_ids=kv_seg,
            q_positions=positions, kv_positions=kv_pos,
            causal=True, sliding_window=cfg.sliding_window, impl="auto",
        )
        x = x + _psum(qmm(attn.reshape(1, c, h * hd), lp["wo"]), tp_axis)
        y2 = M.rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
        x = x + _psum(
            qmm(jax.nn.silu(qmm(y2, lp["w_gate"])) * qmm(y2, lp["w_up"]), lp["w_down"]),
            tp_axis,
        )
        return (x, PagedKV(k_pool, v_pool, ks_pool, vs_pool)), None

    (x, kv), _ = jax.lax.scan(
        body, (x, kv),
        (params["layers"], jnp.arange(cfg.num_layers, dtype=jnp.int32)),
    )
    x = M.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    last = jnp.clip(n_valid - 1, 0, c - 1)
    logits = (x[0, last] @ params["lm_head"].astype(x.dtype)).astype(jnp.float32)
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=0, tiled=True)
    return logits, kv


@partial(jax.jit, static_argnames=("cfg", "page_size", "n_ctx_pages", "c"),
         donate_argnums=(1,))
def paged_prefill_chunk_packed(
    params: M.Params,
    kv: PagedKV,
    cfg: MistralConfig,
    packed: jnp.ndarray,  # [c + 2 + maxp] int32: ids | start | n_valid | table row
    page_size: int,
    n_ctx_pages: int,
    c: int,
) -> Tuple[jnp.ndarray, PagedKV]:
    """paged_prefill_chunk with every per-chunk host input in ONE int32
    array: each jnp.asarray upload pays a tunnel round trip (~3-10 ms on a
    remote chip), so the four per-chunk arguments are packed host-side and
    sliced apart inside the jit."""
    ids = packed[:c]
    start = packed[c]
    n_valid = packed[c + 1]
    row = packed[c + 2 :]
    return paged_prefill_chunk.__wrapped__(
        params, kv, cfg, ids, start, n_valid, row, page_size, n_ctx_pages)


@partial(jax.jit, static_argnames=("cfg", "page_size", "n_ctx_pages", "c",
                                   "do_sample", "needs_filter", "sample_chunk",
                                   "tp_axis", "logits_slice"),
         donate_argnums=(1,))
def paged_mixed_step(
    params: M.Params,
    kv: PagedKV,
    cfg: MistralConfig,
    packed: jnp.ndarray,  # [NPF, c + 2 + maxp] int32 rows: ids | start | n_valid | table row
    tokens: jnp.ndarray,  # [B] decode input token per slot
    seq_lens: jnp.ndarray,  # [B]
    page_table: jnp.ndarray,  # [B, maxp]
    active: jnp.ndarray,  # [B] bool: slots decoding in this burst
    done: jnp.ndarray,  # [B] bool: EOS'd earlier in the burst
    eos_ids: jnp.ndarray,  # [B]
    allow_masks: jnp.ndarray,  # [B, V]
    page_size: int,
    n_ctx_pages: int,
    c: int,
    keys: jnp.ndarray,  # [B, 2] uint32
    top_k: jnp.ndarray,
    top_p: jnp.ndarray,
    temperature: jnp.ndarray,
    do_sample: bool = False,
    needs_filter: bool = True,
    sample_chunk: bool = False,
    tp_axis: Optional[str] = None,
    logits_slice: Optional[Tuple[int, int, int]] = None,
):
    """MIXED prefill+decode: one dispatch advances up to NPF prefill chunk
    rows AND every decoding slot by one token -> (chunk_logits [NPF, V] |
    None, token [B], done' [B], seq_lens' [B], keys', kv').

    vLLM's scheduler coalesces prefill chunks INTO decode batches so an
    admission never stalls in-flight decodes (the engine behind the
    reference's serving path, /root/reference/src/inference_vllm.py:109);
    the TPU shape of that idea: the NPF chunk rows' NPF*C tokens and the
    decode slots' B rows CONCATENATE into one [NPF*C+B, D] activation, so
    every projection / FFN weight matrix is read ONCE for all of it —
    decode is weight-read-bound (docs/STATUS.md), so its matmuls ride the
    chunks' for almost free, where the alternating scheduler paid a full
    extra weight stream per decode step between chunks.  Attention is the
    only part that splits: chunk rows run the masked-MHA-over-gathered-pages
    of paged_prefill_chunk, decode rows the Pallas paged kernel of
    paged_decode_step; both rejoin for the wo/FFN matmuls.

    Chunk rows may be DIFFERENT requests (batched prefill: the first client
    wave drains ~NPF-fold faster) or CONSECUTIVE chunks of the same prompt
    (row j's KV is written before the layer's context gather, and row j+1's
    kv-length mask covers row j's span, so in-link causality holds).  Fully
    padded rows (n_valid=0, trash-routed pages) make NPF a static bucket.

    The decode side carries the CHAINED bookkeeping (EOS freeze + length
    update, as paged_decode_step_chained) so a prefill burst of N links is
    N of these with ONE host sync at the end.  `sample_chunk=True` (static:
    some row completes its prompt — host knows at dispatch) also returns
    every row's last-valid-position logits [NPF, V] f32 for first-token
    sampling; otherwise chunk logits are never computed (the full-vocab
    lm_head read is ~29% of a decode step)."""
    if logits_slice is not None and (do_sample or tp_axis is not None):
        raise ValueError("logits_slice requires greedy single-device decode")
    npf = packed.shape[0]
    chunk_ids = packed[:, :c]  # [NPF, C]
    start = packed[:, c]  # [NPF]
    n_valid = packed[:, c + 1]  # [NPF]
    rows = packed[:, c + 2:]  # [NPF, maxp]

    b = tokens.shape[0]
    hd = cfg.head_dim
    h = _proj_dim(params["layers"]["wq"]) // hd
    hkv = _proj_dim(params["layers"]["wk"]) // hd
    cdt = jnp.dtype(cfg.dtype)
    p = page_size
    s_ctx = n_ctx_pages * p
    n_pages = kv.k_pages.shape[1] // cfg.num_layers
    trash = n_pages - 1
    live = jnp.logical_and(active, ~done)

    # --- chunk-side indexing (as paged_prefill_chunk, batched over NPF) ---
    pos_c = start[:, None] + jnp.arange(c)[None]  # [NPF, C] absolute
    q_seg = jnp.where(jnp.arange(c)[None] < n_valid[:, None], 0, -1)
    cos_c, sin_c = M.rope_tables(pos_c, hd, cfg.rope_theta)
    maxp = rows.shape[1]
    gidx = pos_c  # [NPF, C] global write indices
    pages_t = jnp.take_along_axis(rows, jnp.minimum(gidx // p, maxp - 1), axis=1)
    pages_t = jnp.where(jnp.arange(c)[None] < n_valid[:, None], pages_t, trash)
    offs_t = gidx % p
    row_ids = rows[:, :n_ctx_pages]  # [NPF, ncp]
    kv_pos = jnp.arange(s_ctx)[None]  # [1, S_ctx]
    kv_seg = jnp.where(kv_pos < (start + n_valid)[:, None], 0, -1)  # [NPF, S_ctx]

    # --- decode-side indexing (as paged_decode_step) ---
    pos_d = seq_lens
    cos_d, sin_d = M.rope_tables(pos_d[:, None], hd, cfg.rope_theta)
    d_pages = page_table[jnp.arange(b), pos_d // p]
    d_pages = jnp.where(live, d_pages, trash)
    d_offs = pos_d % p

    emb = params["embed"].astype(cdt)
    xa = jnp.concatenate([emb[chunk_ids].reshape(npf * c, -1), emb[tokens]],
                         axis=0)  # [NPF*C+B, D]

    def body(carry, xs):
        xa, kvp = carry
        k_pool, v_pool = kvp.k_pages, kvp.v_pages
        ks_pool, vs_pool = kvp.k_scales, kvp.v_scales
        lp, li = xs
        base = li * n_pages
        ya = M.rms_norm(xa, lp["ln1"], cfg.rms_norm_eps)
        qa = qmm(ya, lp["wq"])  # ONE weight read serves chunk + decode rows
        ka = qmm(ya, lp["wk"])
        va = qmm(ya, lp["wv"])

        nc = npf * c
        q_c = M.apply_rope(qa[:nc].reshape(npf, c, h, hd), cos_c, sin_c)
        k_c = M.apply_rope(ka[:nc].reshape(npf, c, hkv, hd), cos_c, sin_c)
        v_c = va[:nc].reshape(npf, c, hkv, hd)
        q_d = M.apply_rope(qa[nc:].reshape(b, 1, h, hd), cos_d, sin_d)
        k_d = M.apply_rope(ka[nc:].reshape(b, 1, hkv, hd), cos_d, sin_d)[:, 0]
        v_d = va[nc:].reshape(b, hkv, hd)

        # --- chunk KV writes (whole pages when aligned; scatter fallback) ---
        kk_t = k_c.transpose(2, 0, 1, 3)  # [Hkv, NPF, C, hd]
        vv_t = v_c.transpose(2, 0, 1, 3)
        if ks_pool is not None:
            kk_t, ks_t = quant_kv_token(kk_t)  # scales [Hkv, NPF, C]
            vv_t, vs_t = quant_kv_token(vv_t)
        else:
            kk_t = kk_t.astype(k_pool.dtype)
            vv_t = vv_t.astype(v_pool.dtype)
        if c % p == 0:
            kk_p = kk_t.reshape(hkv, npf, c // p, p, hd)
            vv_p = vv_t.reshape(hkv, npf, c // p, p, hd)
            if ks_pool is not None:
                # page-major [NPF, c/p, Hkv, p] scale tiles
                ks_p = ks_t.reshape(hkv, npf, c // p, p).transpose(1, 2, 0, 3)
                vs_p = vs_t.reshape(hkv, npf, c // p, p).transpose(1, 2, 0, 3)
            for ri in range(npf):
                for j in range(c // p):
                    pg = rows[ri, jnp.minimum(start[ri] // p + j, maxp - 1)]
                    pg = jnp.where(j * p < n_valid[ri], pg, trash)
                    at = (jnp.int32(0), base + pg, jnp.int32(0), jnp.int32(0))
                    k_pool = jax.lax.dynamic_update_slice(
                        k_pool, kk_p[:, ri, j][:, None], at)
                    v_pool = jax.lax.dynamic_update_slice(
                        v_pool, vv_p[:, ri, j][:, None], at)
                    if ks_pool is not None:
                        s_at = (at[1], jnp.int32(0), jnp.int32(0))
                        ks_pool = jax.lax.dynamic_update_slice(
                            ks_pool, ks_p[ri, j][None], s_at)
                        vs_pool = jax.lax.dynamic_update_slice(
                            vs_pool, vs_p[ri, j][None], s_at)
        else:  # unaligned (small-page test geometries)
            k_pool = k_pool.at[:, base + pages_t, offs_t].set(kk_t)
            v_pool = v_pool.at[:, base + pages_t, offs_t].set(vv_t)
            if ks_pool is not None:
                ks_pool = ks_pool.at[base + pages_t, :, offs_t].set(
                    ks_t.transpose(1, 2, 0))
                vs_pool = vs_pool.at[base + pages_t, :, offs_t].set(
                    vs_t.transpose(1, 2, 0))

        # --- decode KV writes (one token per live slot) ---
        kd_w = jnp.swapaxes(k_d, 0, 1)  # [Hkv, B, hd]
        vd_w = jnp.swapaxes(v_d, 0, 1)
        if ks_pool is not None:
            kd_w, kd_s = quant_kv_token(kd_w)  # scales [Hkv, B]
            vd_w, vd_s = quant_kv_token(vd_w)
        else:
            kd_w = kd_w.astype(k_pool.dtype)
            vd_w = vd_w.astype(v_pool.dtype)
        for bi in range(b):
            at = (jnp.int32(0), base + d_pages[bi], d_offs[bi], jnp.int32(0))
            k_pool = jax.lax.dynamic_update_slice(k_pool, kd_w[:, bi][:, None, None, :], at)
            v_pool = jax.lax.dynamic_update_slice(v_pool, vd_w[:, bi][:, None, None, :], at)
            if ks_pool is not None:
                s_at = (at[1], jnp.int32(0), at[2])
                ks_pool = jax.lax.dynamic_update_slice(ks_pool, kd_s[:, bi][None, :, None], s_at)
                vs_pool = jax.lax.dynamic_update_slice(vs_pool, vd_s[:, bi][None, :, None], s_at)

        # --- chunk attention over each row's gathered context ---
        abs_ids = base + row_ids  # [NPF, ncp]
        kc = k_pool[:, abs_ids]  # [Hkv, NPF, ncp, P, hd]
        vc = v_pool[:, abs_ids]
        if ks_pool is not None:
            kc = kc.astype(jnp.float32) * jnp.moveaxis(
                ks_pool[abs_ids], 2, 0)[..., None]
            vc = vc.astype(jnp.float32) * jnp.moveaxis(
                vs_pool[abs_ids], 2, 0)[..., None]
        kc = kc.transpose(1, 2, 3, 0, 4).reshape(npf, s_ctx, hkv, hd)
        vc = vc.transpose(1, 2, 3, 0, 4).reshape(npf, s_ctx, hkv, hd)
        attn_c = mha(
            q_c, kc.astype(cdt), vc.astype(cdt),
            q_segment_ids=q_seg, kv_segment_ids=kv_seg,
            q_positions=pos_c, kv_positions=jnp.broadcast_to(kv_pos, (npf, s_ctx)),
            causal=True, sliding_window=cfg.sliding_window, impl="auto",
        )

        # --- decode attention (paged kernel path, as paged_decode_step) ---
        g = h // hkv
        qg = q_d[:, 0].reshape(b, hkv, g, hd)
        kern_ok = hd % 128 == 0 and p % 8 == 0
        if ks_pool is not None:
            kern_ok = kern_ok and p % 128 == 0
        if jax.devices()[0].platform == "tpu" and kern_ok:
            from usdm_tpu.ops.paged_attention import paged_decode_attention

            attn_d = paged_decode_attention(
                qg, k_pool, v_pool, page_table + base, pos_d + 1,
                sliding_window=cfg.sliding_window,
                k_scales=ks_pool, v_scales=vs_pool,
            )
        else:
            from usdm_tpu.ops.paged_attention import paged_decode_attention_reference

            attn_d = paged_decode_attention_reference(
                qg, k_pool, v_pool, page_table + base, pos_d + 1,
                sliding_window=cfg.sliding_window,
                k_scales=ks_pool, v_scales=vs_pool,
            )

        attn_all = jnp.concatenate(
            [attn_c.reshape(npf * c, h * hd), attn_d.reshape(b, h * hd)], axis=0)
        xa = xa + _psum(qmm(attn_all, lp["wo"]), tp_axis)
        y2 = M.rms_norm(xa, lp["ln2"], cfg.rms_norm_eps)
        xa = xa + _psum(
            qmm(jax.nn.silu(qmm(y2, lp["w_gate"])) * qmm(y2, lp["w_up"]),
                lp["w_down"]), tp_axis)
        return (xa, PagedKV(k_pool, v_pool, ks_pool, vs_pool)), None

    (xa, kv), _ = jax.lax.scan(
        body, (xa, kv),
        (params["layers"], jnp.arange(cfg.num_layers, dtype=jnp.int32)),
    )
    xa = M.rms_norm(xa, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params["lm_head"].astype(xa.dtype)
    x_d = xa[npf * c:]  # [B, D] decode rows

    if logits_slice is not None:  # greedy sliced tail (see paged_decode_step)
        lo, hi, extra = logits_slice
        logits = (x_d @ lm_head[:, lo:hi]).astype(jnp.float32)
        logits = jnp.where(allow_masks[:, lo:hi], logits, NEG_INF)
        best = jnp.argmax(logits, axis=-1)
        nxt = (best + lo).astype(jnp.int32)
        if extra >= 0:
            ev = (x_d @ lm_head[:, extra]).astype(jnp.float32)
            bv = jnp.take_along_axis(logits, best[:, None], axis=-1)[:, 0]
            take = ev >= bv if extra < lo else ev > bv
            nxt = jnp.where(take, jnp.int32(extra), nxt)
    else:
        logits = (x_d @ lm_head).astype(jnp.float32)
        if tp_axis is not None:
            logits = jax.lax.all_gather(logits, tp_axis, axis=1, tiled=True)
        logits = jnp.where(allow_masks, logits, NEG_INF)
        if do_sample:
            new_keys, use = split_keys(keys)
            # advance a slot's key only when it actually samples a token
            # (see paged_decode_step) — keeps sampled outputs independent of
            # how prefill chunks interleave with decode
            keys = jnp.where(live[:, None], new_keys, keys)
            nxt = sample_batched(logits, use, top_k, top_p, temperature,
                                 needs_filter=needs_filter)
        else:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    nxt = jnp.where(live, nxt, 0)
    # chained bookkeeping (as paged_decode_step_chained)
    nxt = jnp.where(done, 0, nxt)
    new_done = jnp.logical_or(done, nxt == eos_ids)
    new_lens = jnp.where(done | ~active, seq_lens, seq_lens + 1)

    chunk_logits = None
    if sample_chunk:
        x_c = xa[: npf * c].reshape(npf, c, -1)
        last = jnp.clip(n_valid - 1, 0, c - 1)  # [NPF]
        x_last = jnp.take_along_axis(x_c, last[:, None, None], axis=1)[:, 0]
        chunk_logits = (x_last @ lm_head).astype(jnp.float32)  # [NPF, V]
        if tp_axis is not None:
            chunk_logits = jax.lax.all_gather(chunk_logits, tp_axis, axis=1,
                                              tiled=True)
    return chunk_logits, nxt, new_done, new_lens, keys, kv


@partial(jax.jit, static_argnames=("do_sample",))
def sample_next(
    logits: jnp.ndarray,  # [V] f32 unmasked
    allow: jnp.ndarray,  # [V] bool
    key: jnp.ndarray,  # [2] uint32
    top_k: jnp.ndarray,
    top_p: jnp.ndarray,
    temperature: jnp.ndarray,
    do_sample: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask + sample one token (first token after prefill) -> (token, key')."""
    masked = jnp.where(allow, logits, NEG_INF)[None]
    if do_sample:
        ks = jax.random.split(key, 2)
        tok = sample_batched(
            masked, ks[1][None],
            jnp.asarray(top_k, jnp.int32)[None],
            jnp.asarray(top_p, jnp.float32)[None],
            jnp.asarray(temperature, jnp.float32)[None],
        )[0]
        return tok, ks[0]
    return jnp.argmax(masked[0]).astype(jnp.int32), key




@partial(
    jax.jit,
    static_argnames=("cfg", "page_size", "n_steps", "do_sample"),
    donate_argnums=(1,),
)
def paged_decode_multi(
    params: M.Params,
    kv: PagedKV,
    cfg: MistralConfig,
    tokens: jnp.ndarray,  # [B]
    seq_lens: jnp.ndarray,  # [B]
    page_table: jnp.ndarray,  # [B, maxp]
    active: jnp.ndarray,  # [B] bool
    allow_masks: jnp.ndarray,  # [B, V]
    eos_ids: jnp.ndarray,  # [B]
    page_size: int,
    keys: jnp.ndarray,  # [B, 2] uint32
    top_k: jnp.ndarray,
    top_p: jnp.ndarray,
    temperature: jnp.ndarray,
    do_sample: bool = False,
    n_steps: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, PagedKV]:
    """Run up to `n_steps` decode steps fully on device.

    Cuts the per-token host round-trip of `step()` (over a tunneled TPU that
    RTT dominates): the scheduler only syncs every `n_steps` tokens.  Rows
    freeze at their own EOS; returns (tokens [B, n_steps], n_emitted [B],
    keys', kv).
    """
    b = tokens.shape[0]

    def body(i, carry):
        kv, tok, lens, done, keys, out = carry
        nxt, keys, kv = paged_decode_step.__wrapped__(
            params, kv, cfg, tok, lens, page_table,
            jnp.logical_and(active, ~done), allow_masks, page_size,
            keys, top_k, top_p, temperature, do_sample=do_sample,
        )
        nxt = jnp.where(done, 0, nxt)
        out = out.at[:, i].set(nxt)
        new_done = jnp.logical_or(done, nxt == eos_ids)
        lens = jnp.where(done, lens, lens + 1)
        return kv, nxt, lens, new_done, keys, out

    out0 = jnp.zeros((b, n_steps), jnp.int32)
    done0 = ~active
    kv, _, lens, done, keys, out = jax.lax.fori_loop(
        0, n_steps, body, (kv, tokens, seq_lens, done0, keys, out0)
    )
    is_eos = out == eos_ids[:, None]
    any_eos = jnp.any(is_eos, axis=1)
    eos_pos = jnp.argmax(is_eos, axis=1)
    n_emitted = jnp.where(active, jnp.where(any_eos, eos_pos + 1, n_steps), 0)
    return out, n_emitted, keys, kv
