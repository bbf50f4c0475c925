"""int8 W8A8 Voicebox estimator (models/quant.quantize_voicebox_params).

The estimator stage is inference-only and matmul-bound; quantizing the
per-layer projection/FFN matrices + skip combiners to int8 runs those dots
at the MXU's 2x int8 rate.  These tests pin the numerics drift of the
quantized path against the f32 estimator (reference math: decoder/voicebox/
model/networks.py:250-266) and check the ODE sampler end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from usdm_tpu.core.config import VoiceboxConfig
from usdm_tpu.models import voicebox as VB
from usdm_tpu.models.quant import dequantize_weight, quantize_voicebox_params


def _setup(seed=0, b=2, t=48):
    cfg = VoiceboxConfig.tiny()
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    params = VB.init_params(cfg, ks[0])
    x = jax.random.randint(ks[1], (b, t), 0, cfg.n_tokens)
    y = jax.random.normal(ks[2], (b, cfg.n_feats, t))
    cond = jax.random.normal(ks[3], (b, cfg.n_feats, t)) * 0.3
    tt = jax.random.uniform(ks[4], (b,))
    lengths = jnp.asarray([t, t - 7])
    return cfg, params, x, y, cond, tt, lengths


def test_quantized_tree_structure():
    cfg, params, *_ = _setup()
    qp = quantize_voicebox_params(params)
    for name in ("wq", "wk", "wv", "wo", "ffn_w1", "ffn_w2"):
        leaf = qp["layers"][name]
        assert leaf["q"].dtype == jnp.int8
        assert leaf["q"].shape == params["layers"][name].shape
        assert leaf["s"].shape == params["layers"][name].shape[:-2] + (
            params["layers"][name].shape[-1],)
    assert qp["skip_w"]["q"].dtype == jnp.int8
    # non-quantized leaves untouched (I/O projections are quality-critical)
    assert qp["proj_in_w"] is params["proj_in_w"]
    assert qp["embed"] is params["embed"]
    # weight-only dequant round-trip is tight (per-channel symmetric int8)
    w = params["layers"]["ffn_w1"]
    wd = dequantize_weight(qp["layers"]["ffn_w1"], jnp.float32)
    err = np.abs(np.asarray(wd - w)).max() / np.abs(np.asarray(w)).max()
    assert err < 1e-2


def test_estimator_drift_vs_f32():
    """W8A8 output tracks the f32 estimator within the int8 regime's
    expected drift (normalized RMS; CFG subtracts two estimates, so per-call
    drift must stay well under the signal scale)."""
    cfg, params, x, y, cond, tt, lengths = _setup()
    qp = quantize_voicebox_params(params)
    want = VB.estimator(params, cfg, x, y, cond, tt, lengths, attn_impl="xla")
    got = VB.estimator(qp, cfg, x, y, cond, tt, lengths, attn_impl="xla")
    assert got.shape == want.shape
    num = float(jnp.sqrt(jnp.mean((got - want) ** 2)))
    den = float(jnp.sqrt(jnp.mean(want**2))) + 1e-9
    assert num / den < 0.05, f"normalized RMS drift {num / den:.4f}"


def test_generate_drift_end_to_end():
    """50-step Heun sample from the quantized estimator stays close to the
    f32 sample (same noise): the ODE integrates ~25 estimator calls, so this
    bounds accumulated drift where it matters."""
    cfg, params, x, y, cond, tt, lengths = _setup(seed=1)
    qp = quantize_voicebox_params(params)
    z = jax.random.normal(jax.random.PRNGKey(7), cond.shape)
    kw = dict(n_timesteps=50, solver="heun", gradient_scale=1.0, z=z)
    want = VB.generate(params, cfg, x, cond, lengths, jax.random.PRNGKey(0), **kw)
    got = VB.generate(qp, cfg, x, cond, lengths, jax.random.PRNGKey(0), **kw)
    num = float(jnp.sqrt(jnp.mean((got - want) ** 2)))
    den = float(jnp.sqrt(jnp.mean(want**2))) + 1e-9
    assert num / den < 0.10, f"normalized RMS drift after ODE {num / den:.4f}"


def test_bf16_params_quantized_path():
    """Product-path dtype: bf16 master weights, quantized projections."""
    cfg, params, x, y, cond, tt, lengths = _setup(seed=2)
    pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    qp = quantize_voicebox_params(pbf)
    out = VB.estimator(qp, cfg, x, y, cond, tt, lengths, attn_impl="xla")
    want = VB.estimator(params, cfg, x, y, cond, tt, lengths, attn_impl="xla")
    assert out.dtype == jnp.bfloat16
    num = float(jnp.sqrt(jnp.mean((out.astype(jnp.float32) - want) ** 2)))
    den = float(jnp.sqrt(jnp.mean(want**2))) + 1e-9
    assert num / den < 0.06, f"normalized RMS drift {num / den:.4f}"
