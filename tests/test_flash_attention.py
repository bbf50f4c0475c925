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


def test_pallas_bwd_matches_reference_bwd(rng):
    """The Pallas backward kernels must match the XLA chunked backward on a
    packed, GQA, sliding-window case."""
    t, block = 256, 64
    q, k, v = _rand_inputs(rng, b=2, tq=t, tk=t, h=4, hkv=2, d=32)
    seg_np = np.zeros((2, t), np.int32)
    seg_np[:, t // 2 :] = 1
    seg_np[:, -16:] = -1  # pad tail
    pos_np = np.concatenate([np.arange(t // 2), np.arange(t - t // 2)])[None].repeat(2, 0)
    seg, pos = jnp.asarray(seg_np), jnp.asarray(pos_np)

    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    o, lse8 = FA._fwd_call(qt, kt, vt, pos, pos, seg, seg,
                           32**-0.5, True, 40, False, block, block)
    res = (qt, kt, vt, o, lse8[..., 0], pos, pos, seg, seg)
    go = jnp.asarray(rng.standard_normal(o.shape).astype(np.float32))

    with jax.default_matmul_precision("highest"):
        dq_p, dk_p, dv_p = FA._bwd_pallas(res, go, scale=32**-0.5, causal=True,
                                          window=40, alibi=False, block_q=block, block_k=block)
        dq_r, dk_r, dv_r = FA._bwd_reference(res, go, scale=32**-0.5, causal=True,
                                             window=40, alibi=False, block_k=block)
    np.testing.assert_allclose(np.asarray(dq_p), np.asarray(dq_r), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk_p), np.asarray(dk_r), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_r), rtol=2e-4, atol=2e-4)


def test_alibi_flash_matches_voicebox_attention(rng):
    """flash(alibi_slopes) must reproduce the Voicebox XLA attention (masked
    symmetric ALiBi, col-0 exempt), fwd and grad."""
    from usdm_tpu.models.voicebox import alibi_slopes as vb_slopes

    b, t, h, d = 2, 192, 4, 32
    hdim = h * d
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    lengths = np.array([t, t - 50])
    seg = np.zeros((b, t), np.int32)
    for i, n in enumerate(lengths):
        seg[i, n:] = -1
    seg = jnp.asarray(seg)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    slopes = vb_slopes(h)

    def flash_fn(q, k, v):
        return FA.flash_attention(q, k, v, seg, seg, pos, pos, causal=False,
                                  sliding_window=None, scale=1.0,
                                  block_q=64, block_k=64, alibi=True)

    def ref_fn(q, k, v):
        # voicebox-style reference: bias = -slope*|i-j| (col0=0) + pad -inf
        dist = np.abs(np.arange(t)[None, :] - np.arange(t)[:, None]).astype(np.float32)
        bias = -slopes[:, None, None] * dist[None]
        bias[:, :, 0] = 0.0
        valid = np.asarray(seg) >= 0
        pad = np.where(valid[:, None, None, :], 0.0, -1e30)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            precision=jax.lax.Precision.HIGHEST) + jnp.asarray(bias)[None] + pad
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=jax.lax.Precision.HIGHEST)
        # zero pad rows like the kernel does
        return jnp.where(jnp.asarray(valid)[:, :, None, None], out, 0.0)

    with jax.default_matmul_precision("highest"):
        of = flash_fn(q, k, v)
        orf = ref_fn(q, k, v)
        np.testing.assert_allclose(np.asarray(of), np.asarray(orf), rtol=3e-5, atol=3e-5)

        gf = jax.grad(lambda *a: jnp.sum(flash_fn(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: jnp.sum(ref_fn(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4)


def test_custom_vjp_inside_fori_loop_canary(rng):
    """Canary for the jax-0.9 lowering-cache bug (custom_vjp-wrapped pallas
    calls inside fori_loop failed to lower).  Verified fixed on TPU
    2026-08-16; the voicebox inference `fwd_only` workaround was removed on
    the strength of this path working.  If this test ever breaks, restore
    fwd_only=True in voicebox._cfg_estimate."""
    b, t, h, d = 1, 128, 2, 64
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, 1, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, 1, d)).astype(np.float32))
    seg = jnp.zeros((b, t), jnp.int32)
    pos = jnp.arange(t)[None]

    def body(i, acc):
        o = FA.flash_attention(q, k, v, seg, seg, pos, pos)  # vjp-wrapped
        return acc + o.sum()

    out = jax.jit(lambda: jax.lax.fori_loop(0, 2, body, 0.0))()
    ref = 2 * FA.flash_attention(q, k, v, seg, seg, pos, pos, fwd_only=True).sum()
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
