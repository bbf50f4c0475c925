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


def _quant_pool(pool):
    """int8-quantize a [Hkv, N, P, d] pool -> (int8 pool, page-major scales
    [N, Hkv, P]) in the PagedKV layout."""
    from usdm_tpu.engine.paged_ops import quant_kv_token

    q, s = quant_kv_token(pool)  # scales [Hkv, N, P]
    return q, jnp.transpose(s, (1, 0, 2))


def test_int8_kernel_matches_reference(rng):
    """Quantized kernel path (int8 pages + f32 scale rows, dequant folded
    into the softmax) vs the gather reference over the same int8 pools."""
    q, kp, vp, table = _setup(rng)
    kq, ks = _quant_pool(kp)
    vq, vs = _quant_pool(vp)
    lens = jnp.asarray([5, 17, 32], jnp.int32)
    out = PA.paged_decode_attention(q, kq, vq, table, lens, k_scales=ks, v_scales=vs)
    ref = PA.paged_decode_attention_reference(
        q, kq, vq, table, lens, k_scales=ks, v_scales=vs)
    # kernel's pv matmul runs in bf16 after the v-scale fold -> loose rtol
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)

    # windowed variant
    out = PA.paged_decode_attention(q, kq, vq, table, lens, sliding_window=10,
                                    k_scales=ks, v_scales=vs)
    ref = PA.paged_decode_attention_reference(
        q, kq, vq, table, lens, sliding_window=10, k_scales=ks, v_scales=vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_int8_dequant_close_to_bf16(rng):
    """int8 per-(head, token) quantization keeps attention outputs within ~2%
    of the unquantized pools (the quality claim behind kv_dtype=int8)."""
    q, kp, vp, table = _setup(rng)
    kq, ks = _quant_pool(kp)
    vq, vs = _quant_pool(vp)
    lens = jnp.asarray([30, 25, 32], jnp.int32)
    full = PA.paged_decode_attention_reference(q, kp, vp, table, lens)
    quant = PA.paged_decode_attention_reference(
        q, kq, vq, table, lens, k_scales=ks, v_scales=vs)
    err = np.abs(np.asarray(quant) - np.asarray(full))
    denom = np.abs(np.asarray(full)).mean()
    assert err.mean() / denom < 0.02


def test_int8_reference_dequant_is_exact(rng):
    """The scaled reference must equal the plain reference run on manually
    dequantized pools bit-for-bit (same gather, same einsum)."""
    q, kp, vp, table = _setup(rng)
    kq, ks = _quant_pool(kp)
    vq, vs = _quant_pool(vp)
    lens = jnp.asarray([9, 20, 32], jnp.int32)
    deq_k = (kq.astype(jnp.float32)
             * jnp.transpose(ks, (1, 0, 2))[..., None]).astype(q.dtype)
    deq_v = (vq.astype(jnp.float32)
             * jnp.transpose(vs, (1, 0, 2))[..., None]).astype(q.dtype)
    a = PA.paged_decode_attention_reference(
        q, kq, vq, table, lens, k_scales=ks, v_scales=vs)
    b = PA.paged_decode_attention_reference(q, deq_k, deq_v, table, lens)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
