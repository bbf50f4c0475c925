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
from usdm_tpu.ops.sampling import apply_mask


class GenState(NamedTuple):
    cache: M.KVCache
    tokens: jnp.ndarray  # [B, max_new] emitted tokens (pad after EOS)
    last: jnp.ndarray  # [B] last emitted token
    done: jnp.ndarray  # [B] bool
    n: jnp.ndarray  # scalar step counter


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "attn_impl"),
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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy constrained generation.

    Returns (tokens [B, max_new_tokens] with EOS included then padding,
    lengths [B] = number of emitted tokens incl. EOS).
    """
    b, t = input_ids.shape
    total = t + max_new_tokens if cache_len is None else cache_len
    cache = M.KVCache.create(cfg, b, total)

    logits, cache = M.prefill(params, cfg, input_ids, input_len, cache, attn_impl=attn_impl)
    first = jnp.argmax(apply_mask(logits, allow_mask[None]), axis=-1).astype(jnp.int32)

    tokens0 = jnp.zeros((b, max_new_tokens), jnp.int32)
    tokens0 = tokens0.at[:, 0].set(first)
    state = GenState(
        cache=cache,
        tokens=tokens0,
        last=first,
        done=first == eos_id,
        n=jnp.asarray(1, jnp.int32),
    )

    def cond(s: GenState):
        return jnp.logical_and(s.n < max_new_tokens, ~jnp.all(s.done))

    def body(s: GenState):
        logits, cache = M.decode_step(params, cfg, s.last, s.cache)
        nxt = jnp.argmax(apply_mask(logits, allow_mask[None]), axis=-1).astype(jnp.int32)
        # frozen rows keep emitting pad(0) and stop advancing their cache len
        nxt = jnp.where(s.done, 0, nxt)
        cache = M.KVCache(cache.k, cache.v, jnp.where(s.done, s.cache.length, cache.length))
        tokens = jax.lax.dynamic_update_slice(s.tokens, nxt[:, None], (0, s.n))
        done = jnp.logical_or(s.done, nxt == eos_id)
        return GenState(cache, tokens, nxt, done, s.n + 1)

    state = jax.lax.while_loop(cond, body, state)

    # length = index of eos + 1 (or max_new if never stopped)
    is_eos = state.tokens == eos_id
    any_eos = jnp.any(is_eos, axis=1)
    eos_pos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, eos_pos + 1, state.n)
    return state.tokens, lengths


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "attn_impl"))
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
) -> Tuple[jnp.ndarray, jnp.ndarray, M.KVCache]:
    """Constrained greedy generation continuing an existing KV cache.

    The prefix-reuse path of the 3-stage dialog chain: the cached stage-N
    prompt stays in HBM and only the stage-N+1 template suffix is prefixed
    (M.prefill_extend), unlike the reference which re-runs the whole prompt
    per stage (inference.py:62-82).  Returns (tokens, lengths, cache).
    """
    b = suffix_ids.shape[0]
    logits, cache = M.prefill_extend(params, cfg, cache, suffix_ids, suffix_len, attn_impl=attn_impl)
    first = jnp.argmax(apply_mask(logits, allow_mask[None]), axis=-1).astype(jnp.int32)

    tokens0 = jnp.zeros((b, max_new_tokens), jnp.int32).at[:, 0].set(first)
    state = GenState(
        cache=cache, tokens=tokens0, last=first,
        done=first == eos_id, n=jnp.asarray(1, jnp.int32),
    )

    def cond(s: GenState):
        return jnp.logical_and(s.n < max_new_tokens, ~jnp.all(s.done))

    def body(s: GenState):
        logits, cache = M.decode_step(params, cfg, s.last, s.cache)
        nxt = jnp.argmax(apply_mask(logits, allow_mask[None]), axis=-1).astype(jnp.int32)
        nxt = jnp.where(s.done, 0, nxt)
        cache = M.KVCache(cache.k, cache.v, jnp.where(s.done, s.cache.length, cache.length))
        tokens = jax.lax.dynamic_update_slice(s.tokens, nxt[:, None], (0, s.n))
        done = jnp.logical_or(s.done, nxt == eos_id)
        return GenState(cache, tokens, nxt, done, s.n + 1)

    state = jax.lax.while_loop(cond, body, state)
    is_eos = state.tokens == eos_id
    any_eos = jnp.any(is_eos, axis=1)
    eos_pos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, eos_pos + 1, state.n)
    return state.tokens, lengths, state.cache
