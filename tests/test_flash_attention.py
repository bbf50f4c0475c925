"""Flash-attention kernel vs the jnp reference path (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import usdm_tpu.ops.flash_attention as FA
from usdm_tpu.ops.attention import make_attention_mask, _xla_attention


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    """Run pallas kernels in interpreter mode on CPU."""
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


def _rand_inputs(rng, b=2, tq=128, tk=128, h=4, hkv=2, d=32):
    q = rng.standard_normal((b, tq, h, d)).astype(np.float32)
    k = rng.standard_normal((b, tk, hkv, d)).astype(np.float32)
    v = rng.standard_normal((b, tk, hkv, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def _ref(q, k, v, qseg, kseg, qpos, kpos, causal, window):
    mask = make_attention_mask(qseg, kseg, qpos, kpos, causal, window)
    return _xla_attention(q, k, v, mask)


def _run_case(rng, seg_fn=None, pos_fn=None, causal=True, window=None, t=128, block=64):
    q, k, v = _rand_inputs(rng, tq=t, tk=t)
    b = q.shape[0]
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t)) if pos_fn is None else pos_fn(b, t)
    seg = jnp.zeros((b, t), jnp.int32) if seg_fn is None else seg_fn(b, t)
    out = FA.flash_attention(
        q, k, v, seg, seg, pos, pos, causal=causal, sliding_window=window,
        block_q=block, block_k=block,
    )
    ref = _ref(q, k, v, seg, seg, pos, pos, causal, window)
    # zero out fully-masked (pad) rows in ref for comparison
    pad = seg < 0
    ref = jnp.where(pad[:, :, None, None], 0.0, ref)
    out = jnp.where(pad[:, :, None, None], 0.0, out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_causal(rng):
    _run_case(rng, causal=True)


def test_causal_multiblock(rng):
    _run_case(rng, causal=True, t=256, block=64)


def test_sliding_window(rng):
    _run_case(rng, causal=True, window=40, t=256, block=64)


def test_segments_packed(rng):
    def seg_fn(b, t):
        s = np.zeros((b, t), np.int32)
        s[:, t // 3:] = 1
        s[:, 2 * t // 3:] = 2
        return jnp.asarray(s)

    def pos_fn(b, t):
        p = np.concatenate([np.arange(t // 3), np.arange(t // 3, 2 * t // 3) - t // 3,
                            np.arange(2 * t // 3, t) - 2 * t // 3])
        return jnp.broadcast_to(jnp.asarray(p)[None], (b, t))

    _run_case(rng, seg_fn=seg_fn, pos_fn=pos_fn, t=129 - 1 + 128, block=64)


def test_padding_rows_zeroed(rng):
    def seg_fn(b, t):
        s = np.zeros((b, t), np.int32)
        s[:, -32:] = -1  # pad tail
        return jnp.asarray(s)

    _run_case(rng, seg_fn=seg_fn, t=128, block=64)


def test_grad_matches_xla(rng):
    t, block = 128, 64
    q, k, v = _rand_inputs(rng, b=1, tq=t, tk=t)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (1, t))
    seg = jnp.zeros((1, t), jnp.int32)

    def loss_flash(q, k, v):
        o = FA.flash_attention(q, k, v, seg, seg, pos, pos, causal=True,
                               sliding_window=50, block_q=block, block_k=block)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = _ref(q, k, v, seg, seg, pos, pos, True, 50)
        return jnp.sum(o * o)

    with jax.default_matmul_precision("highest"):
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4)
