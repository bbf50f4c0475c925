"""Int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usdm_tpu.core.config import EngineConfig, MistralConfig
from usdm_tpu.engine.paged import PagedEngine, Request
from usdm_tpu.models import mistral as M
from usdm_tpu.models.quant import dequantize_weight, qmm, quantize_llm_params, quantize_weight

CFG = MistralConfig.tiny(vocab_size=96)


def test_quantize_roundtrip_error(rng):
    w = jnp.asarray(rng.standard_normal((8, 64, 32)).astype(np.float32))
    qw = quantize_weight(w, axis=-2)
    assert qw["q"].dtype == jnp.int8 and qw["q"].shape == w.shape
    assert qw["s"].shape == (8, 32)
    back = dequantize_weight(qw, jnp.float32)
    # per-channel int8: relative error bounded by ~1/127 of the channel max
    err = np.abs(np.asarray(back) - np.asarray(w))
    bound = np.asarray(jnp.max(jnp.abs(w), axis=-2, keepdims=True)) / 127.0 + 1e-6
    assert (err <= bound + 1e-6).all()


def test_qmm_matches_dequant(rng):
    y = jnp.asarray(rng.standard_normal((3, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    qw = quantize_weight(w, axis=-2)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(qmm(y, qw))
        ref = np.asarray(y @ dequantize_weight(qw, jnp.float32))
    # W8A8: activation quantization adds ~1/127-of-row-max noise on top of
    # the weight error
    np.testing.assert_allclose(got, ref, rtol=6e-2, atol=0.25)
    # plain-array path is a plain matmul
    np.testing.assert_allclose(np.asarray(qmm(y, w)), np.asarray(y @ w), rtol=1e-5)


def test_quantized_engine_output_close_to_fp(rng):
    """Greedy decode with int8 weights should mostly agree with fp weights on
    a tiny random model (token-level agreement, not bit-exactness)."""
    params = M.init_params(CFG, jax.random.PRNGKey(0), dtype="float32")
    qparams = quantize_llm_params(params)
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=2)
    prompt = rng.integers(3, CFG.vocab_size, size=12).tolist()
    allow = np.ones(CFG.vocab_size, bool)

    def run(p):
        eng = PagedEngine(p, CFG, ecfg)
        req = Request(0, list(prompt), allow, eos_id=2, max_new_tokens=8)
        eng.run([req])
        return req.output_ids

    with jax.default_matmul_precision("highest"):
        fp = run(params)
        q8 = run(qparams)
    agree = sum(a == b for a, b in zip(fp, q8)) / max(len(fp), 1)
    assert agree >= 0.5, f"quantized decode diverged: {fp} vs {q8}"
