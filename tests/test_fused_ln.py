"""Fused residual+mask+LayerNorm kernel vs the XLA reference (interpret mode).

The kernel (ops/fused_ln.py) fuses the estimator's post-LN sequence
  LN((x + r) * rowmask) * w + b   [optionally * rowmask]
into one HBM pass; these tests pin its numerics to the plain-XLA math the
Voicebox encoder blocks used before (models/voicebox.py _encoder_layer,
reference networks.py:236-266).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from usdm_tpu.ops import fused_ln


@pytest.fixture
def _interpret(monkeypatch):
    """Run pallas kernels in interpreter mode on CPU."""
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))


def _inputs(b, t, h, dtype, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(k[0], (b, t, h), dtype)
    r = jax.random.normal(k[1], (b, t, h), dtype)
    w = jax.random.normal(k[2], (h,), dtype) * 0.1 + 1.0
    bb = jax.random.normal(k[3], (h,), dtype) * 0.1
    lengths = jax.random.randint(k[4], (b,), 1, t + 1)
    return x, r, lengths, w, bb


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("post_mask", [False, True])
def test_forward_matches_xla(_interpret, dtype, post_mask):
    x, r, lengths, w, b = _inputs(3, 96, 256, dtype)
    got = fused_ln._pallas_impl(x, r, lengths, w, b, post_mask, 1e-5, blk_t=32)
    want = fused_ln._xla_ref(x, r, lengths, w, b, post_mask, 1e-5)
    tol = 1e-6 if dtype == jnp.float32 else 1e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol, rtol=tol
    )


def test_ragged_last_block(_interpret):
    """T not a multiple of blk_t: padded rows must not corrupt valid output."""
    x, r, lengths, w, b = _inputs(2, 100, 128, jnp.float32, seed=1)
    got = fused_ln._pallas_impl(x, r, lengths, w, b, True, 1e-5, blk_t=32)
    want = fused_ln._xla_ref(x, r, lengths, w, b, True, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_invalid_rows_defined(_interpret):
    """Rows >= lengths are b (no post_mask) / 0 (post_mask) — same as XLA."""
    x, r, lengths, w, b = _inputs(2, 64, 128, jnp.float32, seed=2)
    lengths = jnp.array([5, 64])
    got = fused_ln._pallas_impl(x, r, lengths, w, b, False, 1e-5, blk_t=32)
    np.testing.assert_allclose(
        np.asarray(got[0, 5:]), np.broadcast_to(np.asarray(b), (59, 128)), atol=1e-6
    )
    gotm = fused_ln._pallas_impl(x, r, lengths, w, b, True, 1e-5, blk_t=32)
    assert np.all(np.asarray(gotm[0, 5:]) == 0.0)


def test_custom_vjp_matches_xla_grad():
    """Backward (plain-XLA re-expression) == grad of the reference math."""
    x, r, lengths, w, b = _inputs(2, 48, 64, jnp.float32, seed=3)

    def f_fused(x, r, w, b):
        return jnp.sum(jnp.sin(fused_ln.add_mask_ln(x, r, lengths, w, b, True)))

    def f_ref(x, r, w, b):
        return jnp.sum(jnp.sin(fused_ln._xla_ref(x, r, lengths, w, b, True, 1e-5)))

    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, r, w, b)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, r, w, b)
    for a, e in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-5, rtol=1e-5)


def test_estimator_fused_flag_cpu_parity():
    """estimator(fused_ln=...) flag: on CPU both paths hit the same XLA math,
    so outputs must be bit-identical — guards the flag plumbing."""
    from usdm_tpu.models import voicebox as vb

    cfg = vb.VoiceboxConfig.tiny()
    params = vb.init_params(cfg, jax.random.PRNGKey(0))
    b, t = 2, 24
    k = jax.random.split(jax.random.PRNGKey(1), 3)
    units = jax.random.randint(k[0], (b, t), 0, cfg.n_tokens)
    z = jax.random.normal(k[1], (b, cfg.n_feats, t))
    cond = jax.random.normal(k[2], (b, cfg.n_feats, t))
    tt = jnp.array([0.3, 0.7])
    lengths = jnp.array([t, t - 5])
    out_a = vb.estimator(params, cfg, units, z, cond, tt, lengths, fused_ln="xla")
    out_b = vb.estimator(params, cfg, units, z, cond, tt, lengths, fused_ln="auto")
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
