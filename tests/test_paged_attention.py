"""Paged-attention kernel vs gather reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import usdm_tpu.ops.paged_attention as PA


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


def _setup(rng, b=3, hkv=2, g=4, d=32, n_pages=16, p=8, maxp=4):
    q = jnp.asarray(rng.standard_normal((b, hkv, g, d)).astype(np.float32))
    kp = jnp.asarray(rng.standard_normal((hkv, n_pages, p, d)).astype(np.float32))
    vp = jnp.asarray(rng.standard_normal((hkv, n_pages, p, d)).astype(np.float32))
    # distinct pages per slot
    table = rng.permutation(n_pages - 1)[: b * maxp].reshape(b, maxp).astype(np.int32)
    return q, kp, vp, jnp.asarray(table)


def test_matches_reference(rng):
    q, kp, vp, table = _setup(rng)
    lens = jnp.asarray([5, 17, 32], jnp.int32)  # partial page / multi page / full
    out = PA.paged_decode_attention(q, kp, vp, table, lens)
    ref = PA.paged_decode_attention_reference(q, kp, vp, table, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_sliding_window(rng):
    q, kp, vp, table = _setup(rng)
    lens = jnp.asarray([30, 25, 32], jnp.int32)
    out = PA.paged_decode_attention(q, kp, vp, table, lens, sliding_window=10)
    ref = PA.paged_decode_attention_reference(q, kp, vp, table, lens, sliding_window=10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_unused_pages_irrelevant(rng):
    """Garbage in pages beyond a sequence's length must not leak in."""
    q, kp, vp, table = _setup(rng)
    lens = jnp.asarray([9, 9, 9], jnp.int32)
    out1 = PA.paged_decode_attention(q, kp, vp, table, lens)
    # trash every page not referenced by the first two used pages
    used = set(np.asarray(table)[:, :2].ravel().tolist())
    mask = np.ones(kp.shape[1], bool)
    for u in used:
        mask[u] = False
    kp2 = kp.at[:, np.nonzero(mask)[0]].set(99.0)
    vp2 = vp.at[:, np.nonzero(mask)[0]].set(-99.0)
    out2 = PA.paged_decode_attention(q, kp2, vp2, table, lens)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6, atol=1e-6)
