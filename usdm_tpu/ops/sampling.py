"""Logit masking and token sampling for the 3-stage dialog decode.

The reference constrains each stage with bad_words_ids lists of ~10k singleton
ids fed to HF generate (/root/reference/src/inference.py:41-53) or with vLLM
logits_processors (/root/reference/src/inference_vllm.py:70-84).  Here each
stage is a single static boolean allow-mask over the vocabulary applied as one
fused jnp.where — no per-token Python.

Stage contract (SURVEY.md §3):
  unit2text : ban [32000, 42003)            -> text only;  EOS "\n"
  text2text : ban [32002, 42003)            -> text + continue/correspond; EOS <|correspond|>
  text2unit : ban [0, 32002) except 28705   -> units only; EOS 28705 ("▁")
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from usdm_tpu.core.config import TokenSpace

NEG_INF = float(np.finfo(np.float32).min)

STAGE_UNIT2TEXT = "unit2text"
STAGE_TEXT2TEXT = "text2text"
STAGE_TEXT2UNIT = "text2unit"


@lru_cache(maxsize=16)
def stage_allow_mask(stage: str, ts: TokenSpace = TokenSpace()) -> np.ndarray:
    """Boolean [vocab] mask, True = token allowed during generation."""
    v = ts.vocab_size
    mask = np.ones(v, dtype=bool)
    if stage == STAGE_UNIT2TEXT:
        mask[ts.continue_id : v] = False
    elif stage == STAGE_TEXT2TEXT:
        mask[ts.unit_offset : v] = False
    elif stage == STAGE_TEXT2UNIT:
        mask[: ts.unit_offset] = False
        mask[ts.space_id] = True
    else:
        raise ValueError(f"unknown stage {stage}")
    return mask


def stage_eos(stage: str, ts: TokenSpace = TokenSpace()) -> int:
    return {
        STAGE_UNIT2TEXT: ts.newline_id,
        STAGE_TEXT2TEXT: ts.correspond_id,
        STAGE_TEXT2UNIT: ts.space_id,
    }[stage]


def apply_mask(logits: jnp.ndarray, allow: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(allow, logits, NEG_INF)


def sample_token(
    logits: jnp.ndarray,  # [B, V] f32, already masked
    key: Optional[jax.Array] = None,
    top_k: int = 1,
    top_p: float = 1.0,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Greedy / top-k / top-p sampling.  Reference default decode is greedy
    (`top_k=1, top_p=1.0, temperature=1.0`, inference.py:64-82)."""
    if top_k == 1:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits / jnp.maximum(temperature, 1e-6)
    if top_k > 1:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep smallest prefix with cumulative prob >= top_p (always keep 1st)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)  # [B]
        cutoff_val = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff_val, NEG_INF, logits)
    assert key is not None, "non-greedy sampling needs a PRNG key"
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample_batched(
    logits: jnp.ndarray,  # [B, V] f32, already masked
    keys: jnp.ndarray,  # [B, 2] uint32 per-row PRNG keys
    top_k: jnp.ndarray,  # [B] int32; 1 = greedy row, <=0 = no k-filter
    top_p: jnp.ndarray,  # [B] f32; >=1 = no p-filter
    temperature: jnp.ndarray,  # [B] f32
    needs_filter: bool = True,  # trace-time: False when no row filters
    # (top_k<=1 and top_p>=1 everywhere) — skips the vocab sort entirely
) -> jnp.ndarray:
    """Per-row dynamic top-k -> top-p -> categorical sampling.

    The vectorized form of `sample_token` for the continuous-batching engine:
    every slot carries its own sampling params and PRNG key (reference threads
    per-request SamplingParams through vLLM, inference_vllm.py:112-125).
    Filters apply sequentially (k then p, HF warper order) via one descending
    sort; rows with top_k == 1 take the argmax (contract of `sample_token`).
    """
    b, v = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    if not needs_filter:  # pure temperature sampling: no sort needed
        sampled = jax.vmap(jax.random.categorical)(keys, scaled).astype(jnp.int32)
        return jnp.where(top_k == 1, greedy, sampled)
    sdesc = jnp.sort(scaled, axis=-1)[:, ::-1]
    # top-k: in descending order the post-k-filter array just zeroes the tail,
    # so one sort serves both filters.
    idx = jnp.arange(v)[None]
    k_active = (top_k > 0)[:, None]
    kdesc = jnp.where(k_active & (idx >= top_k[:, None]), NEG_INF, sdesc)
    kth = jnp.where(
        k_active,
        jnp.take_along_axis(sdesc, jnp.clip(top_k - 1, 0, v - 1)[:, None], axis=-1),
        NEG_INF,
    )
    # top-p on the k-filtered distribution: smallest prefix with cum >= top_p
    probs = jax.nn.softmax(kdesc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.clip(jnp.sum(cum < top_p[:, None], axis=-1), 0, v - 1)
    pth = jnp.where(
        (top_p < 1.0)[:, None],
        jnp.take_along_axis(kdesc, cutoff_idx[:, None], axis=-1),
        NEG_INF,
    )
    filtered = jnp.where(scaled < jnp.maximum(kth, pth), NEG_INF, scaled)
    sampled = jax.vmap(jax.random.categorical)(keys, filtered).astype(jnp.int32)
    return jnp.where(top_k == 1, greedy, sampled)


def split_keys(keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, 2] uint32 -> (carry [B, 2], use [B, 2]): one split per row."""
    s = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
    return s[:, 0], s[:, 1]
