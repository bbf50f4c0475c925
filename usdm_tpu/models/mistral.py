"""Mistral-7B speech-text LLM, pure-functional JAX.

TPU-first rebuild of the reference's CustomMistralForCausalLM
(/root/reference/src/model.py:49-602): same math (RoPE, GQA, RMSNorm, SiLU
MLP, sliding-window causal attention) but

  * packing isolation is expressed as *segment ids* instead of
    cu_seqlens/unpad (model.py:475-483) — static shapes, one fused mask;
  * the 32 decoder layers are a single `lax.scan` over stacked parameters
    (one compiled layer body, fast compiles, natural FSDP/TP sharding);
  * decode runs against a preallocated KV cache ring with
    `dynamic_update_slice` — no DynamicCache concat chains (model.py:349-377).

Params are a pytree of plain arrays; `param_specs()` gives PartitionSpecs for
a ('data','model') mesh: FSDP shards along 'data', tensor-parallel heads/FFN
along 'model'.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from usdm_tpu.core.config import MistralConfig
from usdm_tpu.ops.attention import decode_attention, mha
from usdm_tpu.models.quant import qmm

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(cfg: MistralConfig, key: jax.Array, dtype: Optional[str] = None) -> Params:
    dtype = jnp.dtype(dtype or cfg.dtype)
    k = iter(jax.random.split(key, 16))
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    h, hkv, hd, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    std = cfg.initializer_range

    def norm_init(*shape):
        return jnp.ones(shape, dtype)

    def dense(key, *shape):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    return {
        "embed": dense(next(k), v, d),
        "layers": {
            "ln1": norm_init(L, d),
            "ln2": norm_init(L, d),
            "wq": dense(next(k), L, d, h * hd),
            "wk": dense(next(k), L, d, hkv * hd),
            "wv": dense(next(k), L, d, hkv * hd),
            "wo": dense(next(k), L, h * hd, d),
            "w_gate": dense(next(k), L, d, f),
            "w_up": dense(next(k), L, d, f),
            "w_down": dense(next(k), L, f, d),
        },
        "final_norm": norm_init(d),
        "lm_head": dense(next(k), d, v),
    }


def param_specs(cfg: MistralConfig) -> Params:
    """PartitionSpecs: FSDP on 'data' (largest dim), TP on 'model'."""
    return {
        "embed": P("model", "data"),
        "layers": {
            "ln1": P(None, None),
            "ln2": P(None, None),
            "wq": P(None, "data", "model"),
            "wk": P(None, "data", "model"),
            "wv": P(None, "data", "model"),
            "wo": P(None, "model", "data"),
            "w_gate": P(None, "data", "model"),
            "w_up": P(None, "data", "model"),
            "w_down": P(None, "model", "data"),
        },
        "final_norm": P(None),
        "lm_head": P("data", "model"),
    }


# ---------------------------------------------------------------------------
# Core math
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * w.astype(jnp.float32)).astype(dt)


def rope_tables(positions: jnp.ndarray, head_dim: int, theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HF-convention cos/sin tables for given absolute positions [..., T]."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, d]; cos/sin: [B, T, d] (HF rotate_half convention)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos[:, :, None, :] + rotated.astype(jnp.float32) * sin[:, :, None, :]).astype(x.dtype)


def _lora_delta(y: jnp.ndarray, lw, name: str) -> jnp.ndarray:
    """Low-rank side path y@A@B * (alpha/r); 0 when `name` not adapted."""
    if lw is None or name not in lw:
        return 0.0
    a, bb, scale = lw[name]["a"], lw[name]["b"], lw[name]["scale"]
    return ((y @ a) @ bb) * scale


def _layer(
    cfg: MistralConfig,
    x: jnp.ndarray,  # [B, T, D]
    lp: Params,  # single-layer params (unstacked leaves)
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    segment_ids: jnp.ndarray,
    positions: jnp.ndarray,
    attn_impl: str,
    lw: Optional[Params] = None,  # per-layer LoRA weights
) -> jnp.ndarray:
    b, t, d = x.shape
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    y = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
    q = (qmm(y, lp["wq"]) + _lora_delta(y, lw, "wq")).reshape(b, t, h, hd)
    kk = (qmm(y, lp["wk"]) + _lora_delta(y, lw, "wk")).reshape(b, t, hkv, hd)
    vv = (qmm(y, lp["wv"]) + _lora_delta(y, lw, "wv")).reshape(b, t, hkv, hd)
    q = apply_rope(q, cos, sin)
    kk = apply_rope(kk, cos, sin)
    attn = mha(
        q, kk, vv,
        q_segment_ids=segment_ids,
        kv_segment_ids=segment_ids,
        q_positions=positions,
        kv_positions=positions,
        causal=True,
        sliding_window=cfg.sliding_window,
        impl=attn_impl,
    )
    ao = attn.reshape(b, t, h * hd)
    x = x + qmm(ao, lp["wo"]) + _lora_delta(ao, lw, "wo")

    y = rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
    x = x + qmm(jax.nn.silu(qmm(y, lp["w_gate"])) * qmm(y, lp["w_up"]), lp["w_down"])
    return x


def forward(
    params: Params,
    cfg: MistralConfig,
    input_ids: jnp.ndarray,  # [B, T]
    segment_ids: Optional[jnp.ndarray] = None,  # [B, T]; <0 marks padding
    positions: Optional[jnp.ndarray] = None,  # [B, T]; per-segment restart
    attn_impl: str = "auto",
    remat: bool = False,
    lora: Optional[Params] = None,  # stacked LoRA weights (see train.lora)
) -> jnp.ndarray:
    """Packed full-sequence forward -> logits [B, T, V] (f32).

    `positions` restart at each packed subsample (reference collator builds
    them via the BOS cummax trick, train_pt.py:49-58); `segment_ids` isolate
    subsamples exactly like subsample_start_idx->cu_seqlens did.
    """
    x = forward_hidden(params, cfg, input_ids, segment_ids, positions,
                       attn_impl, remat, lora)
    logits = x @ params["lm_head"].astype(x.dtype)
    return logits.astype(jnp.float32)


def forward_hidden(
    params: Params,
    cfg: MistralConfig,
    input_ids: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    lora: Optional[Params] = None,
) -> jnp.ndarray:
    """`forward` up to (and including) the final norm — [B, T, H] hidden,
    before the lm_head projection.  The training loss projects chunk-by-chunk
    (see `loss_fn`) so the full [T, vocab] f32 logits never materialize."""
    b, t = input_ids.shape
    if segment_ids is None:
        segment_ids = jnp.zeros((b, t), jnp.int32)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))

    x = params["embed"].astype(jnp.dtype(cfg.dtype))[input_ids]
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta)

    layer_fn = partial(_layer, cfg, attn_impl="auto" if attn_impl == "auto" else attn_impl)
    if remat:
        layer_fn = jax.checkpoint(layer_fn)

    def body(x, xs):
        lp, lw = xs
        return layer_fn(x, lp, cos, sin, segment_ids, positions, lw=lw), None

    x, _ = jax.lax.scan(body, x, (params["layers"], {} if lora is None else lora))
    return rms_norm(x, params["final_norm"], cfg.rms_norm_eps)


def loss_fn(
    params: Params,
    cfg: MistralConfig,
    input_ids: jnp.ndarray,
    labels: jnp.ndarray,  # [B, T]; -100 = ignore (reference IGNORE_INDEX)
    segment_ids: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    remat: bool = True,
    lora: Optional[Params] = None,
    ce_chunk: int = 1024,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Shifted mean cross-entropy, matching model.py:124-135.

    The lm_head projection + log-softmax run in `ce_chunk`-token sequence
    chunks under jax.checkpoint: the full [T, vocab] f32 logits (4 GB at
    7B/8192, ~12 bytes/element through fwd+bwd as measured by
    scripts/validate_memory_budget.py) never materialize — peak logits
    temps drop to one chunk's.  Identical numerics (log_softmax is
    per-token); ce_chunk=0 restores the unchunked path."""
    hidden = forward_hidden(params, cfg, input_ids, segment_ids, positions,
                            attn_impl, remat, lora)
    sh = hidden[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe_labels = jnp.where(valid, shift_labels, 0)
    n = jnp.maximum(valid.sum(), 1)
    w = params["lm_head"].astype(sh.dtype)

    b, t1, h = sh.shape
    if not ce_chunk or t1 <= ce_chunk:
        logits = (sh @ w).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
        loss = -(tok_ll * valid).sum() / n
        return loss, {"loss": loss, "ntokens": valid.sum()}

    pad = (-t1) % ce_chunk
    nc = (t1 + pad) // ce_chunk
    shp = jnp.pad(sh, ((0, 0), (0, pad), (0, 0)))
    lbp = jnp.pad(safe_labels, ((0, 0), (0, pad)))
    vdp = jnp.pad(valid, ((0, 0), (0, pad)))
    # chunk axis leading so lax.map scans over it
    shc = shp.reshape(b, nc, ce_chunk, h).swapaxes(0, 1)
    lbc = lbp.reshape(b, nc, ce_chunk).swapaxes(0, 1)
    vdc = vdp.reshape(b, nc, ce_chunk).swapaxes(0, 1)

    @jax.checkpoint
    def chunk_ll(args):
        hc, lc, vc = args
        logits = (hc @ w).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok = jnp.take_along_axis(logp, lc[..., None], axis=-1)[..., 0]
        return (tok * vc).sum()

    sums = jax.lax.map(chunk_ll, (shc, lbc, vdc))
    loss = -sums.sum() / n
    return loss, {"loss": loss, "ntokens": valid.sum()}


# ---------------------------------------------------------------------------
# KV-cache decode (dense cache; the paged engine lives in usdm_tpu.engine)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class KVCache:
    k: jnp.ndarray  # [L, B, S, Hkv, d]
    v: jnp.ndarray  # [L, B, S, Hkv, d]
    length: jnp.ndarray  # [B] valid entries

    @classmethod
    def create(cls, cfg: MistralConfig, batch: int, max_len: int, dtype=None) -> "KVCache":
        dtype = jnp.dtype(dtype or cfg.dtype)
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((batch,), jnp.int32))


jax.tree_util.register_dataclass(KVCache, data_fields=["k", "v", "length"], meta_fields=[])


def prefill(
    params: Params,
    cfg: MistralConfig,
    input_ids: jnp.ndarray,  # [B, T] right-padded
    input_len: jnp.ndarray,  # [B]
    cache: KVCache,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, KVCache]:
    """Run the prompt, fill the cache, return last-valid-token logits [B, V]."""
    b, t = input_ids.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    seg = jnp.where(positions < input_len[:, None], 0, -1)

    x = params["embed"].astype(jnp.dtype(cfg.dtype))[input_ids]
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def body(x, lp_and_idx):
        lp, _ = lp_and_idx
        y = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
        q = qmm(y, lp["wq"]).reshape(b, t, h, hd)
        kk = qmm(y, lp["wk"]).reshape(b, t, hkv, hd)
        vv = qmm(y, lp["wv"]).reshape(b, t, hkv, hd)
        q = apply_rope(q, cos, sin)
        kk = apply_rope(kk, cos, sin)
        attn = mha(
            q, kk, vv,
            q_segment_ids=seg, kv_segment_ids=seg,
            q_positions=positions, kv_positions=positions,
            causal=True, sliding_window=cfg.sliding_window, impl=attn_impl,
        )
        x = x + qmm(attn.reshape(b, t, h * hd), lp["wo"])
        y = rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
        x = x + qmm(jax.nn.silu(qmm(y, lp["w_gate"])) * qmm(y, lp["w_up"]), lp["w_down"])
        return x, (kk, vv)

    idx = jnp.arange(cfg.num_layers)
    x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], idx))

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    last = jnp.clip(input_len - 1, 0, t - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = (x_last @ params["lm_head"].astype(x.dtype)).astype(jnp.float32)

    new_k = jax.lax.dynamic_update_slice(cache.k, ks.astype(cache.k.dtype), (0, 0, 0, 0, 0))
    new_v = jax.lax.dynamic_update_slice(cache.v, vs.astype(cache.v.dtype), (0, 0, 0, 0, 0))
    return logits, KVCache(new_k, new_v, input_len)


def decode_step(
    params: Params,
    cfg: MistralConfig,
    token: jnp.ndarray,  # [B] token ids for this step
    cache: KVCache,
) -> Tuple[jnp.ndarray, KVCache]:
    """One greedy-loop step: token -> logits [B, V], cache advanced by one.

    The cache is a RING over its static slot axis: the new token writes at
    `pos % S`, and attention masks by each slot's absolute position, so a
    cache sized at the sliding window holds exactly the last S tokens — the
    reference's window slicing (src/model.py:337-373) with static shapes.
    While `pos < S` (cache big enough for the whole sequence) the ring is the
    identity and behavior is unchanged."""
    b = token.shape[0]
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    s = cache.k.shape[2]
    pos = cache.length  # [B] position of this token
    widx = pos % s  # ring write slot (== pos until the cache wraps)
    # slot i holds the most recent position p <= pos with p = i (mod S)
    slot = jnp.arange(s)[None]
    slot_pos = pos[:, None] - (pos[:, None] - slot) % s  # [B, S]; < 0 = unwritten
    x = params["embed"].astype(jnp.dtype(cfg.dtype))[token][:, None, :]  # [B, 1, D]
    cos, sin = rope_tables(pos[:, None], cfg.head_dim, cfg.rope_theta)

    def body(carry, layer_in):
        x = carry
        lp, k_l, v_l = layer_in
        y = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
        q = qmm(y, lp["wq"]).reshape(b, 1, h, hd)
        kk = qmm(y, lp["wk"]).reshape(b, 1, hkv, hd)
        vv = qmm(y, lp["wv"]).reshape(b, 1, hkv, hd)
        q = apply_rope(q, cos, sin)
        kk = apply_rope(kk, cos, sin)

        # insert new kv at per-sequence position
        def upd(cache_bshd, new_b1hd):
            return jax.vmap(
                lambda c, n, p: jax.lax.dynamic_update_slice(c, n.astype(c.dtype), (p, 0, 0))
            )(cache_bshd, new_b1hd, widx)

        k_l = upd(k_l, kk)
        v_l = upd(v_l, vv)

        attn = decode_attention(q, k_l, v_l, pos + 1, sliding_window=cfg.sliding_window,
                                kv_positions=slot_pos)
        x = x + qmm(attn.reshape(b, 1, h * hd), lp["wo"])
        y = rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
        x = x + qmm(jax.nn.silu(qmm(y, lp["w_gate"])) * qmm(y, lp["w_up"]), lp["w_down"])
        return x, (k_l, v_l)

    x, (new_k, new_v) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    logits = (x[:, 0] @ params["lm_head"].astype(x.dtype)).astype(jnp.float32)
    return logits, KVCache(new_k, new_v, cache.length + 1)


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------


def convert_hf_state_dict(state: Dict[str, np.ndarray], cfg: MistralConfig, dtype=None) -> Params:
    """Map a HF MistralForCausalLM state_dict (numpy arrays) to our params.

    HF nn.Linear stores [out, in]; we store [in, out] -> transpose.  Layer
    arrays are stacked on a leading L axis for the scan.
    """
    dtype = jnp.dtype(dtype or cfg.dtype)
    L = cfg.num_layers

    def get(name):
        return np.asarray(state[name])

    def stack(fmt, transpose=True):
        arrs = [get(fmt.format(i)) for i in range(L)]
        out = np.stack([a.T if transpose else a for a in arrs])
        return jnp.asarray(out, dtype)

    return {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "layers": {
            "ln1": stack("model.layers.{}.input_layernorm.weight", transpose=False),
            "ln2": stack("model.layers.{}.post_attention_layernorm.weight", transpose=False),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
            "w_gate": stack("model.layers.{}.mlp.gate_proj.weight"),
            "w_up": stack("model.layers.{}.mlp.up_proj.weight"),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(get("lm_head.weight").T, dtype),
    }


def extend_embeddings(params: Params, cfg: MistralConfig, new_vocab: int, key: jax.Array) -> Params:
    """Resize embed/lm_head to `new_vocab`, normal(0, initializer_range) init
    for the new rows (reference train_pt.py:128-140)."""
    old_v = params["embed"].shape[0]
    n_new = new_vocab - old_v
    if n_new <= 0:
        return params
    k1, k2 = jax.random.split(key)
    std = cfg.initializer_range
    dt = params["embed"].dtype
    new_in = (jax.random.normal(k1, (n_new, params["embed"].shape[1]), jnp.float32) * std).astype(dt)
    new_out = (jax.random.normal(k2, (params["lm_head"].shape[0], n_new), jnp.float32) * std).astype(dt)
    out = dict(params)
    out["embed"] = jnp.concatenate([params["embed"], new_in], axis=0)
    out["lm_head"] = jnp.concatenate([params["lm_head"], new_out], axis=1)
    return out


def prefill_extend(
    params: Params,
    cfg: MistralConfig,
    cache: KVCache,
    new_ids: jnp.ndarray,  # [B, T'] right-padded continuation tokens
    new_len: jnp.ndarray,  # [B] valid continuation tokens
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, KVCache]:
    """Extend an existing cache with a chunk of prompt tokens.

    Enables prefix reuse across the 3-stage dialog chain: the reference
    re-prefills the whole prompt at every stage (inference.py:62-82); here
    stage N+1 only runs its *suffix* against the cached prefix.  Also the
    building block for chunked prefill.  Returns last-valid-token logits.
    """
    b, t = new_ids.shape
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cdt = jnp.dtype(cfg.dtype)
    s = cache.k.shape[2]
    off = cache.length  # [B] existing tokens

    positions = off[:, None] + jnp.arange(t)[None, :]  # [B, T'] absolute
    q_seg = jnp.where(jnp.arange(t)[None, :] < new_len[:, None], 0, -1)
    kv_pos_full = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    kv_seg_full = jnp.where(kv_pos_full < (off + new_len)[:, None], 0, -1)

    x = params["embed"].astype(cdt)[new_ids]
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta)

    def upd(cache_bshd, new_btHd):
        return jax.vmap(
            lambda c, nvals, o: jax.lax.dynamic_update_slice(c, nvals.astype(c.dtype), (o, 0, 0))
        )(cache_bshd, new_btHd, off)

    def body(x, xs):
        lp, k_l, v_l = xs
        y = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
        q = qmm(y, lp["wq"]).reshape(b, t, h, hd)
        kk = qmm(y, lp["wk"]).reshape(b, t, hkv, hd)
        vv = qmm(y, lp["wv"]).reshape(b, t, hkv, hd)
        q = apply_rope(q, cos, sin)
        kk = apply_rope(kk, cos, sin)
        k_l = upd(k_l, kk)
        v_l = upd(v_l, vv)
        attn = mha(
            q, k_l, v_l,
            q_segment_ids=q_seg, kv_segment_ids=kv_seg_full,
            q_positions=positions, kv_positions=kv_pos_full,
            causal=True, sliding_window=cfg.sliding_window, impl=attn_impl,
        )
        x = x + qmm(attn.reshape(b, t, h * hd), lp["wo"])
        y = rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
        x = x + qmm(jax.nn.silu(qmm(y, lp["w_gate"])) * qmm(y, lp["w_up"]), lp["w_down"])
        return x, (k_l, v_l)

    x, (new_k, new_v) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    last = jnp.clip(new_len - 1, 0, t - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = (x_last @ params["lm_head"].astype(x.dtype)).astype(jnp.float32)
    return logits, KVCache(new_k, new_v, cache.length + new_len)
