"""Fused anti-aliased Snake sandwich kernel vs the XLA composition.

ops/fused_act.py computes BigVGAN's Activation1d — upsample2 -> snake ->
downsample2 (reference alias_free_torch/act.py:8-27) — in one Pallas pass.
These tests pin the kernel's numerics (interpret mode on CPU) to the plain
three-op composition the generator used before (models/bigvgan.py
upsample2/snake/snake_beta/downsample2), including the replicate-pad edges
the kernel recomputes, the custom_vjp backward, and the multi-block tiling
path the VMEM cap forces at BigVGAN's real stage widths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usdm_tpu.ops import fused_act


def _inputs(b, t, c, dtype=jnp.float32, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k[0], (b, t, c), dtype)
    alpha = jax.random.normal(k[1], (c,), jnp.float32) * 0.3
    beta = jax.random.normal(k[2], (c,), jnp.float32) * 0.3
    return x, alpha, beta


@pytest.mark.parametrize("snakebeta", [False, True])
@pytest.mark.parametrize("logscale", [False, True])
def test_forward_matches_xla(snakebeta, logscale):
    x, alpha, beta = _inputs(2, 200, 8)
    got = fused_act._fused_fwd_impl(
        x, alpha, beta if snakebeta else None, logscale, snakebeta,
        interpret=True)
    want = fused_act._xla_ref(
        x, alpha, beta if snakebeta else None, logscale, snakebeta)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("t", [64, 65, 100, 511])
def test_ragged_and_odd_lengths(t):
    """T not a block multiple / odd / at the >=64 fused gate boundary."""
    x, alpha, beta = _inputs(1, t, 8, seed=1)
    got = fused_act._fused_fwd_impl(x, alpha, beta, True, True,
                                    interpret=True)
    want = fused_act._xla_ref(x, alpha, beta, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_multi_block_tiling():
    """T spanning several tiles: the halo handoff between tiles is exact."""
    x, alpha, beta = _inputs(2, 300, 8, seed=2)
    got = fused_act._fused_fwd_impl(x, alpha, beta, True, True,
                                    interpret=True, bt_override=64)
    want = fused_act._xla_ref(x, alpha, beta, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_edges_exact():
    """The 3 outputs at each end (recomputed on a 64-sample crop) are
    bit-identical to the XLA composition — same ops on the same values."""
    x, alpha, beta = _inputs(1, 256, 8, seed=3)
    got = fused_act._fused_fwd_impl(x, alpha, beta, True, True,
                                    interpret=True)
    want = fused_act._xla_ref(x, alpha, beta, True, True)
    np.testing.assert_array_equal(np.asarray(got[:, :3]),
                                  np.asarray(want[:, :3]))
    np.testing.assert_array_equal(np.asarray(got[:, -3:]),
                                  np.asarray(want[:, -3:]))


def test_bfloat16_io():
    x, alpha, beta = _inputs(1, 128, 8, jnp.bfloat16, seed=4)
    # params live in the activation dtype on the product path (bench casts
    # the generator to bf16); mixed f32 params would promote the XLA ref
    alpha, beta = alpha.astype(jnp.bfloat16), beta.astype(jnp.bfloat16)
    got = fused_act._fused_fwd_impl(x, alpha, beta, True, True,
                                    interpret=True)
    assert got.dtype == jnp.bfloat16
    want = fused_act._xla_ref(x, alpha, beta, True, True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_vmem_tile_cap_at_real_widths():
    """At BigVGAN's widest activation1d stage (C=768) the auto tile shrinks
    so ~6 f32 working buffers stay under VMEM; numerics unchanged."""
    c = 768
    bt = fused_act._tile_bt(10_000, c)  # the kernel's own formula
    assert bt % 16 == 0  # halo block alignment
    assert bt * c * 4 * 6 < 16 * 2**20  # 6 bt*c f32 buffers < 16 MB VMEM
    x, alpha, beta = _inputs(1, 2 * bt + 37, c, seed=5)
    got = fused_act._fused_fwd_impl(x, alpha, beta, True, True,
                                    interpret=True)
    want = fused_act._xla_ref(x, alpha, beta, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("snakebeta", [False, True])
def test_custom_vjp_matches_xla_grad(snakebeta):
    """Backward (plain-XLA re-expression) == grad of the reference math."""
    x, alpha, beta = _inputs(1, 96, 8, seed=6)
    b = beta if snakebeta else None

    def f_fused(x, a, bb):
        y = fused_act.fused_activation1d(x, a, bb, True, snakebeta)
        return jnp.sum(jnp.sin(y))

    def f_ref(x, a, bb):
        return jnp.sum(jnp.sin(fused_act._xla_ref(x, a, bb, True, snakebeta)))

    if snakebeta:
        g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, alpha, b)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, alpha, b)
    else:
        g1 = jax.grad(f_fused, argnums=(0, 1))(x, alpha, b)
        g2 = jax.grad(f_ref, argnums=(0, 1))(x, alpha, b)
    for a, w in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)


def test_generator_config_flag_parity():
    """activation1d(cfg.fused_act=True) == activation1d(default) on CPU
    (the public gate falls back to XLA off-TPU) — guards the config wiring
    that broke at r4 HEAD."""
    from usdm_tpu.core.config import BigVGANConfig
    from usdm_tpu.models import bigvgan as BGV

    cfg = BigVGANConfig.tiny().replace(fused_act=False)
    cfg_f = cfg.replace(fused_act=True)
    params = BGV.init_generator(cfg, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.num_mels, 37))
    want = BGV.generator(params, cfg, mel)
    got = BGV.generator(params, cfg_f, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
