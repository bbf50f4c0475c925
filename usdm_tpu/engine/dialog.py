"""Three-stage chain-of-modality dialog policy.

Reference flow (/root/reference/src/inference.py:48-89): given user speech
units, run (A) unit2text ASR, (B) text2text response, (C) text2unit TTS —
three greedy decodes over the same model with stage-specific vocab masks and
stop tokens, re-templating the prompt between stages.

Templates reproduce `default_template` (inference.py:16-27) exactly; decoded-
text post-processing reproduces `strip_exact_multiple` splits
(inference.py:67,75,83).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from usdm_tpu.core.config import MistralConfig
from usdm_tpu.core.tokenizer import UsdmTokenizer
from usdm_tpu.audio.units import parse_units, units_to_string
from usdm_tpu.engine.generate import generate, generate_with_cache
from usdm_tpu.models import mistral as M
from usdm_tpu.ops.sampling import (
    STAGE_TEXT2TEXT,
    STAGE_TEXT2UNIT,
    STAGE_UNIT2TEXT,
    stage_allow_mask,
    stage_eos,
)

INSTRUCTION = (
    "Below is a conversation between the user and the agent. Each turn includes "
    "the user's speech and its corresponding transcript, along with the agent's "
    "response text and the corresponding speech.\n"
)


def default_template(user_unit: str, user_text: Optional[str] = None, agent_text: Optional[str] = None) -> str:
    template = INSTRUCTION + "\n### User\n" + f"{user_unit}<|correspond|>"
    if user_text:
        template += f"{user_text}\n### Agent\n"
    if agent_text:
        template += f"{agent_text}<|correspond|>"
    return template


def strip_exact_multiple(text: str, patterns: List[str]) -> str:
    for pattern in patterns:
        if text.startswith(pattern):
            text = text[len(pattern):]
        if text.endswith(pattern):
            text = text[: -len(pattern)]
    return text


@dataclasses.dataclass
class DialogResult:
    user_text: str
    agent_text: str
    agent_units: List[int]
    stage_tokens: dict


def run_dialog(tok: UsdmTokenizer, run_stage, user_units: List[int]) -> DialogResult:
    """The 3-stage chain-of-modality template/decode/post-process flow.

    `run_stage(stage, prompt) -> List[int]` supplies the decode backend —
    the dense prefix-reuse loop (DialogPolicy) or the continuous-batching
    paged engine (engine.server.PagedDialogPolicy).  Templating and
    post-processing reproduce inference.py:48-89 exactly.
    """
    user_unit_str = units_to_string(user_units)

    # Stage A: unit2text (ASR)
    out_a = run_stage(STAGE_UNIT2TEXT, default_template(user_unit_str))
    text_a = tok.decode(out_a)
    user_text = strip_exact_multiple(text_a.split("<|correspond|>")[-1], ["\n", " "])

    # Stage B: text2text (response)
    out_b = run_stage(STAGE_TEXT2TEXT, default_template(user_unit_str, user_text=user_text))
    text_b = tok.decode(out_b)
    agent_text = strip_exact_multiple(text_b.split("\n")[-1], ["\n", " ", "<|correspond|>"])

    # Stage C: text2unit (TTS in token space)
    out_c = run_stage(
        STAGE_TEXT2UNIT,
        default_template(user_unit_str, user_text=user_text, agent_text=agent_text),
    )
    text_c = tok.decode(out_c)
    agent_units = parse_units(text_c.split("<|correspond|>")[-1])

    return DialogResult(
        user_text=user_text,
        agent_text=agent_text,
        agent_units=agent_units,
        stage_tokens={"unit2text": out_a, "text2text": out_b, "text2unit": out_c},
    )


class DialogPolicy:
    """Drives the 3-stage decode against a params/config pair."""

    def __init__(
        self,
        params: M.Params,
        cfg: MistralConfig,
        tokenizer: UsdmTokenizer,
        max_new_tokens: Optional[int] = None,
        attn_impl: str = "auto",
        reuse_prefix: bool = True,
        cache_len: Optional[int] = None,
        top_k: int = 1,
        top_p: float = 1.0,
        temperature: float = 1.0,
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.ts = tokenizer.ts
        self.max_new_tokens = max_new_tokens
        self.attn_impl = attn_impl
        # prefix reuse: keep the KV cache across the 3 stages and only
        # prefill each stage's template suffix (the reference re-prefills
        # the full prompt per stage, inference.py:62-82)
        self.reuse_prefix = reuse_prefix
        self.cache_len = cache_len or min(cfg.max_seq_len, 8192)
        # sampling hparams (reference default greedy; demo exposes sliders,
        # streamlit_demo.py:195-205)
        self.top_k = top_k
        self.top_p = top_p
        self.temperature = temperature
        self._key = jax.random.PRNGKey(seed)
        self._cache = None
        self._cached_ids: List[int] = []
        self._masks = {
            s: jnp.asarray(stage_allow_mask(s, self.ts))
            for s in (STAGE_UNIT2TEXT, STAGE_TEXT2TEXT, STAGE_TEXT2UNIT)
        }

    def _stage_budget(self, n_prompt: int) -> int:
        """Per-stage token budget from tokenizer metadata: the reference caps
        every stage at tokenizer.model_max_length TOTAL length
        (inference.py:64 max_length=...; the vLLM path uses it as max_tokens,
        inference_vllm.py:113).  HF semantics: new tokens = max_length-prompt."""
        budget = self.tok.model_max_length - n_prompt - 1
        if self.max_new_tokens is not None:
            budget = min(budget, self.max_new_tokens)
        budget = max(budget, 1)
        # max_new_tokens is a static jit arg: bucket down to a 256 multiple so
        # varying prompt lengths reuse one compilation (EOS stops the
        # while_loop early regardless)
        return budget if budget < 256 else (budget // 256) * 256

    def _run_stage(self, stage: str, prompt: str, max_new: Optional[int] = None) -> List[int]:
        ids = self.tok.encode(prompt)
        max_new = max_new or self._stage_budget(len(ids))
        if self.reuse_prefix:
            return self._run_stage_cached(stage, ids, max_new)
        # bucket the prompt length to a 128 multiple so `generate` compiles
        # once per bucket, not once per prompt (the reference re-prefills and
        # re-traces per call; XLA jit makes padding the cheaper currency)
        bucket = max(128, -(-len(ids) // 128) * 128)
        padded = np.full((1, bucket), self.ts.pad_id, np.int32)
        padded[0, : len(ids)] = ids
        input_ids = jnp.asarray(padded)
        input_len = jnp.asarray([len(ids)], jnp.int32)
        tokens, lengths = generate(
            self.params,
            self.cfg,
            input_ids,
            input_len,
            self._masks[stage],
            jnp.asarray(stage_eos(stage, self.ts), jnp.int32),
            max_new_tokens=max_new,
            attn_impl=self.attn_impl,
            top_k=self.top_k, top_p=self.top_p, temperature=self.temperature,
            key=self._next_key(),
        )
        n = int(lengths[0])
        return np.asarray(tokens[0, :n]).tolist()

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _run_stage_cached(self, stage: str, ids: List[int], max_new: Optional[int] = None) -> List[int]:
        """Stage decode reusing the cached common prompt prefix."""
        max_new = max_new or self._stage_budget(len(ids))
        common = 0
        if self._cache is not None:
            limit = min(len(self._cached_ids), len(ids))
            while common < limit and self._cached_ids[common] == ids[common]:
                common += 1
        suffix = ids[common:]
        bucket = max(64, -(-len(suffix) // 64) * 64)
        # capacity must cover the BUCKET-PADDED suffix write: prefill_extend's
        # dynamic_update_slice would otherwise clamp its start index and
        # silently corrupt the cached prefix (XLA clamps OOB update offsets).
        budget = max_new + 1
        required = common + bucket + budget
        fresh_required = max(64, -(-len(ids) // 64) * 64) + budget
        if required > self.cache_len:
            # grow to the next 512 bucket; the old prefix is discarded
            self.cache_len = -(-max(required, fresh_required) // 512) * 512
            self._cache = None
            self._cached_ids = []
            common = 0
            suffix = ids
            bucket = max(64, -(-len(suffix) // 64) * 64)
        if self._cache is None or common == 0:
            self._cache = M.KVCache.create(self.cfg, 1, self.cache_len)
            common = 0
            suffix = ids
            bucket = max(64, -(-len(suffix) // 64) * 64)
        padded = np.full((1, bucket), self.ts.pad_id, np.int32)
        padded[0, : len(suffix)] = suffix
        # roll the cache back to the shared prefix, then extend with the suffix
        cache = M.KVCache(self._cache.k, self._cache.v, jnp.asarray([common], jnp.int32))
        tokens, lengths, cache = generate_with_cache(
            self.params, self.cfg, cache,
            jnp.asarray(padded), jnp.asarray([len(suffix)], jnp.int32),
            self._masks[stage],
            jnp.asarray(stage_eos(stage, self.ts), jnp.int32),
            max_new_tokens=max_new,
            attn_impl=self.attn_impl,
            top_k=self.top_k, top_p=self.top_p, temperature=self.temperature,
            key=self._next_key(),
        )
        self._cache = cache
        self._cached_ids = list(ids)  # generated tokens are NOT part of the
        # reusable prefix (the next stage's template re-derives them from text)
        n = int(lengths[0])
        return np.asarray(tokens[0, :n]).tolist()

    def respond_to_units(self, user_units: List[int]) -> DialogResult:
        self._cache = None  # fresh conversation
        self._cached_ids = []
        return run_dialog(self.tok, self._run_stage, user_units)
