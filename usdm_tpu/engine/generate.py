"""Jitted autoregressive generation loop (dense KV cache path).

Replaces the reference's HF `model.generate` greedy loops
(/root/reference/src/inference.py:64-82): the whole decode — embedding,
32-layer scan, cache update, logit mask, argmax/sample, stop check — runs
on-device inside one `lax.while_loop`; the host sees only the final token
buffer.  Early exit when every row has emitted its EOS.

The continuous-batching paged engine is usdm_tpu.engine.paged; this loop is
the simple, low-latency path used by the CLI and tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from usdm_tpu.core.config import MistralConfig
from usdm_tpu.models import mistral as M
from usdm_tpu.ops.sampling import apply_mask, sample_token


class GenState(NamedTuple):
    cache: M.KVCache
    tokens: jnp.ndarray  # [B, max_new] emitted tokens (pad after EOS)
    last: jnp.ndarray  # [B] last emitted token
    done: jnp.ndarray  # [B] bool
    n: jnp.ndarray  # scalar step counter
    key: jax.Array  # PRNG state (unused under greedy decoding)


def _pick(logits, allow_mask, key, top_k, top_p, temperature):
    """Constrained token selection; greedy when top_k == 1 (the reference
    default, inference.py:64-82), otherwise top-k/top-p sampling."""
    masked = apply_mask(logits, allow_mask[None])
    if top_k == 1:
        return jnp.argmax(masked, axis=-1).astype(jnp.int32)
    return sample_token(masked, key=key, top_k=top_k, top_p=top_p, temperature=temperature)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "cache_len", "attn_impl", "top_k",
                     "top_p", "temperature"),
)
def generate(
    params: M.Params,
    cfg: MistralConfig,
    input_ids: jnp.ndarray,  # [B, T] right-padded prompt
    input_len: jnp.ndarray,  # [B]
    allow_mask: jnp.ndarray,  # [V] bool; True = allowed
    eos_id: jnp.ndarray,  # scalar int32
    max_new_tokens: int = 256,
    cache_len: Optional[int] = None,
    attn_impl: str = "auto",
    top_k: int = 1,
    top_p: float = 1.0,
    temperature: float = 1.0,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Constrained generation: greedy by default, top-k/top-p sampled when
    requested (streamlit demo hparams, streamlit_demo.py:195-205).

    Returns (tokens [B, max_new_tokens] with EOS included then padding,
    lengths [B] = number of emitted tokens incl. EOS).
    """
    b, t = input_ids.shape
    if cache_len is None:
        total = t + max_new_tokens
        if cfg.sliding_window:
            # bound the cache at the sliding window (reference slices dense KV
            # at the window, src/model.py:337-373): decode_step's ring write +
            # position-masked attention keep exactly the last S tokens.  The
            # prompt still needs identity slots (prefill writes [0, t)), and
            # S = window+1 keeps every key the `qpos - pos <= window` mask
            # can reach.
            total = min(total, max(t, cfg.sliding_window + 1))
    else:
        total = cache_len
    cache = M.KVCache.create(cfg, b, total)
    key = jax.random.PRNGKey(0) if key is None else key

    logits, cache = M.prefill(params, cfg, input_ids, input_len, cache, attn_impl=attn_impl)
    key, k0 = jax.random.split(key)
    first = _pick(logits, allow_mask, k0, top_k, top_p, temperature)

    tokens0 = jnp.zeros((b, max_new_tokens), jnp.int32)
    tokens0 = tokens0.at[:, 0].set(first)
    state = GenState(
        cache=cache,
        tokens=tokens0,
        last=first,
        done=first == eos_id,
        n=jnp.asarray(1, jnp.int32),
        key=key,
    )

    def cond(s: GenState):
        return jnp.logical_and(s.n < max_new_tokens, ~jnp.all(s.done))

    def body(s: GenState):
        logits, cache = M.decode_step(params, cfg, s.last, s.cache)
        key, ks = jax.random.split(s.key)
        nxt = _pick(logits, allow_mask, ks, top_k, top_p, temperature)
        # frozen rows keep emitting pad(0) and stop advancing their cache len
        nxt = jnp.where(s.done, 0, nxt)
        cache = M.KVCache(cache.k, cache.v, jnp.where(s.done, s.cache.length, cache.length))
        tokens = jax.lax.dynamic_update_slice(s.tokens, nxt[:, None], (0, s.n))
        done = jnp.logical_or(s.done, nxt == eos_id)
        return GenState(cache, tokens, nxt, done, s.n + 1, key)

    state = jax.lax.while_loop(cond, body, state)

    # length = index of eos + 1 (or max_new if never stopped)
    is_eos = state.tokens == eos_id
    any_eos = jnp.any(is_eos, axis=1)
    eos_pos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, eos_pos + 1, state.n)
    return state.tokens, lengths


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "attn_impl", "top_k", "top_p", "temperature"))
def generate_with_cache(
    params: M.Params,
    cfg: MistralConfig,
    cache: M.KVCache,
    suffix_ids: jnp.ndarray,  # [B, T'] right-padded continuation of the prompt
    suffix_len: jnp.ndarray,  # [B]
    allow_mask: jnp.ndarray,
    eos_id: jnp.ndarray,
    max_new_tokens: int = 256,
    attn_impl: str = "auto",
    top_k: int = 1,
    top_p: float = 1.0,
    temperature: float = 1.0,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, M.KVCache]:
    """Constrained greedy generation continuing an existing KV cache.

    The prefix-reuse path of the 3-stage dialog chain: the cached stage-N
    prompt stays in HBM and only the stage-N+1 template suffix is prefixed
    (M.prefill_extend), unlike the reference which re-runs the whole prompt
    per stage (inference.py:62-82).  Returns (tokens, lengths, cache).
    """
    b = suffix_ids.shape[0]
    key = jax.random.PRNGKey(0) if key is None else key
    logits, cache = M.prefill_extend(params, cfg, cache, suffix_ids, suffix_len, attn_impl=attn_impl)
    key, k0 = jax.random.split(key)
    first = _pick(logits, allow_mask, k0, top_k, top_p, temperature)

    tokens0 = jnp.zeros((b, max_new_tokens), jnp.int32).at[:, 0].set(first)
    state = GenState(
        cache=cache, tokens=tokens0, last=first,
        done=first == eos_id, n=jnp.asarray(1, jnp.int32), key=key,
    )

    def cond(s: GenState):
        return jnp.logical_and(s.n < max_new_tokens, ~jnp.all(s.done))

    def body(s: GenState):
        logits, cache = M.decode_step(params, cfg, s.last, s.cache)
        key, ks = jax.random.split(s.key)
        nxt = _pick(logits, allow_mask, ks, top_k, top_p, temperature)
        nxt = jnp.where(s.done, 0, nxt)
        cache = M.KVCache(cache.k, cache.v, jnp.where(s.done, s.cache.length, cache.length))
        tokens = jax.lax.dynamic_update_slice(s.tokens, nxt[:, None], (0, s.n))
        done = jnp.logical_or(s.done, nxt == eos_id)
        return GenState(cache, tokens, nxt, done, s.n + 1, key)

    state = jax.lax.while_loop(cond, body, state)
    is_eos = state.tokens == eos_id
    any_eos = jnp.any(is_eos, axis=1)
    eos_pos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, eos_pos + 1, state.n)
    return state.tokens, lengths, state.cache
