"""Decode engine tests: stage masks, constrained generation, dialog chain."""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from usdm_tpu.core.config import MistralConfig, TokenSpace
from usdm_tpu.core.tokenizer import UsdmTokenizer
from usdm_tpu.engine.dialog import DialogPolicy, default_template
from usdm_tpu.engine.generate import generate
from usdm_tpu.models import mistral as M
from usdm_tpu.ops.sampling import (
    STAGE_TEXT2TEXT,
    STAGE_TEXT2UNIT,
    STAGE_UNIT2TEXT,
    sample_token,
    stage_allow_mask,
    stage_eos,
)


def test_stage_masks_reference_bounds():
    """Mask bounds must match inference.py:51-53 exactly."""
    ts = TokenSpace()
    m1 = stage_allow_mask(STAGE_UNIT2TEXT, ts)
    assert m1[31999] and not m1[32000] and not m1[42002]
    m2 = stage_allow_mask(STAGE_TEXT2TEXT, ts)
    assert m2[31999] and m2[32000] and m2[32001] and not m2[32002]
    m3 = stage_allow_mask(STAGE_TEXT2UNIT, ts)
    assert not m3[0] and not m3[32001] and m3[32002] and m3[42001]
    assert m3[28705]  # the "▁" escape hatch
    assert not m3[28704] and not m3[28706]
    assert stage_eos(STAGE_UNIT2TEXT, ts) == 13
    assert stage_eos(STAGE_TEXT2TEXT, ts) == 32001
    assert stage_eos(STAGE_TEXT2UNIT, ts) == 28705


def test_sample_token_greedy_and_topk(rng):
    logits = jnp.asarray(rng.standard_normal((2, 50)).astype(np.float32))
    greedy = sample_token(logits, top_k=1)
    np.testing.assert_array_equal(np.asarray(greedy), np.argmax(np.asarray(logits), -1))
    key = jax.random.PRNGKey(0)
    tk = sample_token(logits, key=key, top_k=5, temperature=0.8)
    # sampled token must be within the top-5 of each row
    top5 = np.argsort(np.asarray(logits), axis=-1)[:, -5:]
    for i in range(2):
        assert int(tk[i]) in top5[i]


@pytest.fixture(scope="module")
def tiny_lm():
    tok = UsdmTokenizer.build_test(num_units=8)
    cfg = MistralConfig.tiny(vocab_size=tok.vocab_size)
    params = M.init_params(cfg, jax.random.PRNGKey(0), dtype="float32")
    return tok, cfg, params


def test_generate_respects_mask_and_stops(tiny_lm):
    tok, cfg, params = tiny_lm
    ts = tok.ts
    ids = tok.encode("hello")
    allow = jnp.asarray(stage_allow_mask(STAGE_UNIT2TEXT, ts))
    tokens, lengths = generate(
        params, cfg,
        jnp.asarray(np.asarray(ids, np.int32)[None]),
        jnp.asarray([len(ids)], jnp.int32),
        allow,
        jnp.asarray(stage_eos(STAGE_UNIT2TEXT, ts), jnp.int32),
        max_new_tokens=16,
    )
    n = int(lengths[0])
    assert 1 <= n <= 16
    emitted = np.asarray(tokens[0, :n])
    # every emitted token obeys the stage mask
    assert all(bool(allow[t]) for t in emitted)
    # nothing after EOS (padding zeros)
    if n < 16:
        assert np.all(np.asarray(tokens[0, n:]) == 0)


def test_generate_batch_independent(tiny_lm):
    """Row results must not depend on other rows in the batch."""
    tok, cfg, params = tiny_lm
    ts = tok.ts
    a = tok.encode("hello there")
    b = tok.encode("bye")
    allow = jnp.asarray(stage_allow_mask(STAGE_TEXT2TEXT, ts))
    eos = jnp.asarray(stage_eos(STAGE_TEXT2TEXT, ts), jnp.int32)

    t = max(len(a), len(b))
    batch = np.zeros((2, t), np.int32)
    batch[0, : len(a)] = a
    batch[1, : len(b)] = b
    toks2, len2 = generate(params, cfg, jnp.asarray(batch), jnp.asarray([len(a), len(b)], jnp.int32),
                           allow, eos, max_new_tokens=8)
    solo = np.asarray(a, np.int32)[None]
    toks1, len1 = generate(params, cfg, jnp.asarray(solo), jnp.asarray([len(a)], jnp.int32),
                           allow, eos, max_new_tokens=8)
    n = int(len1[0])
    assert int(len2[0]) == n
    np.testing.assert_array_equal(np.asarray(toks1[0, :n]), np.asarray(toks2[0, :n]))


def test_dialog_policy_end_to_end(tiny_lm):
    tok, cfg, params = tiny_lm
    policy = DialogPolicy(params, cfg, tok, max_new_tokens=12)
    result = policy.respond_to_units([0, 3, 5, 2])
    ts = tok.ts
    # stage outputs obey constraints
    for t in result.stage_tokens["unit2text"][:-1]:
        assert t < ts.continue_id
    for t in result.stage_tokens["text2text"][:-1]:
        assert t < ts.unit_offset
    for t in result.stage_tokens["text2unit"][:-1]:
        assert t >= ts.unit_offset or t == ts.space_id
    assert all(0 <= u < ts.num_units for u in result.agent_units)
    assert isinstance(result.user_text, str) and isinstance(result.agent_text, str)


def test_default_template_matches_reference_shape():
    t = default_template("<|unit1|>", user_text="hi", agent_text="yo")
    assert t.startswith("Below is a conversation")
    assert "\n### User\n<|unit1|><|correspond|>hi\n### Agent\nyo<|correspond|>" in t


def test_prefix_reuse_matches_full_prefill(tiny_lm):
    """The KV-reuse chain must produce identical stage outputs to the
    reference-style full re-prefill chain."""
    tok, cfg, params = tiny_lm
    p_full = DialogPolicy(params, cfg, tok, max_new_tokens=12, reuse_prefix=False)
    p_reuse = DialogPolicy(params, cfg, tok, max_new_tokens=12, reuse_prefix=True, cache_len=512)
    units = [1, 4, 2, 7]
    import jax
    with jax.default_matmul_precision("highest"):
        r_full = p_full.respond_to_units(units)
        r_reuse = p_reuse.respond_to_units(units)
    assert r_full.stage_tokens == r_reuse.stage_tokens
    assert r_full.agent_units == r_reuse.agent_units


def test_prefix_reuse_near_cache_capacity(tiny_lm):
    """Regression: when the bucket-padded stage-B/C suffix would write past
    the cache end, XLA clamps dynamic_update_slice's start and silently
    corrupts the prefix.  The policy must grow the cache instead (round-1
    bug: 242-token stage-B prompt + 64-token bucket > 256-entry cache)."""
    tok, cfg, params = tiny_lm
    p_full = DialogPolicy(params, cfg, tok, max_new_tokens=12, reuse_prefix=False)
    # cache barely fits stage A; stages B/C must trigger a clean grow
    p_tight = DialogPolicy(params, cfg, tok, max_new_tokens=12, reuse_prefix=True,
                           cache_len=256)
    units = list(range(12))
    import jax
    with jax.default_matmul_precision("highest"):
        r_full = p_full.respond_to_units(units)
        r_tight = p_tight.respond_to_units(units)
    assert r_full.stage_tokens == r_tight.stage_tokens
    assert r_full.agent_units == r_tight.agent_units


def test_ring_bounded_cache_matches_full(tiny_lm):
    """The window-bounded ring cache (default sizing) must decode exactly like
    an oversized identity cache: out-of-window keys are masked either way, so
    evicting them (reference dense-KV slicing, src/model.py:337-373) cannot
    change any output."""
    tok, cfg, params = tiny_lm
    cfg = cfg.replace(sliding_window=6)  # ring S = max(t, 7) << t + max_new
    ts = tok.ts
    ids = tok.encode("hello world test")
    allow = jnp.asarray(stage_allow_mask(STAGE_TEXT2UNIT, ts))
    args = (
        params, cfg,
        jnp.asarray(np.asarray(ids, np.int32)[None]),
        jnp.asarray([len(ids)], jnp.int32),
        allow,
        jnp.asarray(-1, jnp.int32),  # unreachable EOS: decode all 24 tokens
    )
    with jax.default_matmul_precision("highest"):
        toks_ring, len_ring = generate(*args, max_new_tokens=24)
        toks_full, len_full = generate(*args, max_new_tokens=24,
                                       cache_len=len(ids) + 24)
    assert int(len_ring[0]) == int(len_full[0])
    assert np.array_equal(np.asarray(toks_ring), np.asarray(toks_full))
