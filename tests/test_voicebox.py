"""token-Voicebox CFM tests: component golden values + solver invariants."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usdm_tpu.core.config import VoiceboxConfig
from usdm_tpu.models import voicebox as V

CFG = VoiceboxConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return V.init_params(CFG, jax.random.PRNGKey(0))


def test_alibi_slopes_power_of_two():
    s = V.alibi_slopes(16)
    # closed form: start=2^-0.5, ratio=2^-0.5
    expect = [2 ** (-0.5 * (i + 1)) for i in range(16)]
    np.testing.assert_allclose(s, expect, rtol=1e-6)
    s8 = V.alibi_slopes(8)
    np.testing.assert_allclose(s8, [2 ** (-(i + 1)) for i in range(8)], rtol=1e-6)


def test_alibi_slopes_non_power_of_two():
    s = V.alibi_slopes(12)
    assert len(s) == 12
    # first 8 = slopes(8); remainder = every other element of slopes(16)
    np.testing.assert_allclose(s[:8], V.alibi_slopes(8))
    np.testing.assert_allclose(s[8:], V.alibi_slopes(16)[0::2][:4])


def test_sinusoidal_time_emb_formula():
    dim = 32
    t = jnp.asarray([0.25, 0.9])
    emb = np.asarray(V.sinusoidal_time_emb(t, dim))
    half = dim // 2
    freqs = np.exp(np.arange(half) * -(math.log(10000.0) / (half - 1)))
    for bi, tv in enumerate([0.25, 0.9]):
        # f32 argument reduction of sin/cos at |x|~900 costs ~1e-4 absolute;
        # the point is catching sin/cos ordering and frequency-base errors.
        ang = (np.float32(1000.0 * tv) * freqs.astype(np.float32)).astype(np.float64)
        np.testing.assert_allclose(emb[bi, :half], np.sin(ang), atol=3e-3)
        np.testing.assert_allclose(emb[bi, half:], np.cos(ang), atol=3e-3)


def test_estimator_padding_invariance(params, rng):
    """Frames beyond `lengths` must not influence valid outputs, and padded
    output frames are zero."""
    b, T = 1, 24
    n_valid = 16
    x = jnp.asarray(rng.integers(0, CFG.n_tokens, (b, T)))
    y = jnp.asarray(rng.standard_normal((b, CFG.n_feats, T)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, CFG.n_feats, T)).astype(np.float32))
    t = jnp.asarray([0.5])
    lengths = jnp.asarray([n_valid])

    out1 = np.asarray(V.estimator(params, CFG, x, y, cond, t, lengths))
    # perturb everything in the padded tail
    y2 = y.at[:, :, n_valid:].add(10.0)
    c2 = cond.at[:, :, n_valid:].add(-3.0)
    x2 = x.at[:, n_valid:].set((x[:, n_valid:] + 1) % CFG.n_tokens)
    out2 = np.asarray(V.estimator(params, CFG, x2, y2, c2, t, lengths))

    np.testing.assert_allclose(out1[:, :, :n_valid], out2[:, :, :n_valid], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out1[:, :, n_valid:], 0.0, atol=1e-6)


def test_estimator_time_token_matters(params, rng):
    b, T = 1, 12
    x = jnp.asarray(rng.integers(0, CFG.n_tokens, (b, T)))
    y = jnp.asarray(rng.standard_normal((b, CFG.n_feats, T)).astype(np.float32))
    cond = jnp.zeros_like(y)
    lengths = jnp.asarray([T])
    o1 = np.asarray(V.estimator(params, CFG, x, y, cond, jnp.asarray([0.1]), lengths))
    o2 = np.asarray(V.estimator(params, CFG, x, y, cond, jnp.asarray([0.9]), lengths))
    assert np.abs(o1 - o2).max() > 1e-4


def test_cfg_formula(params, rng):
    """gradient_scale s must combine as c + s(c - u) (voicebox.py:69-71)."""
    b, T = 1, 10
    x = jnp.asarray(rng.integers(0, CFG.n_tokens, (b, T)))
    z = jnp.asarray(rng.standard_normal((b, CFG.n_feats, T)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, CFG.n_feats, T)).astype(np.float32))
    t = jnp.asarray([0.4])
    lengths = jnp.asarray([T])

    c = np.asarray(V.estimator(params, CFG, x, z, cond, t, lengths))
    u = np.asarray(
        V.estimator(params, CFG, jnp.full_like(x, CFG.n_tokens), z, jnp.zeros_like(cond), t, lengths)
    )
    got = np.asarray(V._cfg_estimate(params, CFG, x, z, cond, lengths, t, 1.0))
    np.testing.assert_allclose(got, 2 * c - u, rtol=1e-5, atol=1e-5)

    got0 = np.asarray(V._cfg_estimate(params, CFG, x, z, cond, lengths, t, 0.0))
    np.testing.assert_allclose(got0, c, rtol=1e-6, atol=1e-6)


def test_cfm_loss_manual(params, rng):
    """With injected (t, z), the loss equals the hand-computed OT-CFM MSE."""
    b, T = 2, 14
    x = jnp.asarray(rng.integers(0, CFG.n_tokens, (b, T)))
    x1 = jnp.asarray(rng.standard_normal((b, CFG.n_feats, T)).astype(np.float32))
    mask = np.zeros((b, 1, T), np.float32)
    mask[0, 0, :4] = 1.0  # first 4 frames are given context for sample 0
    lengths = jnp.asarray([T, 10])
    t = jnp.asarray([0.3, 0.8])
    z = jnp.asarray(rng.standard_normal((b, CFG.n_feats, T)).astype(np.float32))

    loss, _ = V.cfm_loss(
        params, CFG, x, jnp.asarray(mask), x1, lengths, jax.random.PRNGKey(0), t=t, z=z
    )

    sm = CFG.sigma_min
    t3 = np.asarray(t)[:, None, None]
    y = (1 - (1 - sm) * t3) * np.asarray(z) + t3 * np.asarray(x1)
    cond = np.asarray(x1) * mask
    u = np.asarray(x1) - (1 - sm) * np.asarray(z)
    ue = np.asarray(V.estimator(params, CFG, x, jnp.asarray(y), jnp.asarray(cond), t, lengths))
    lm = (np.arange(T)[None, :] < np.asarray(lengths)[:, None]).astype(np.float32)[:, None, :]
    lm = lm * (1 - mask)
    ref = np.sum(((ue - u) * lm) ** 2) / (lm.sum() * CFG.n_feats)
    assert abs(float(loss) - ref) < 1e-5


def test_generate_shapes_and_solvers(params, rng):
    b, T = 1, 16
    x = jnp.asarray(rng.integers(0, CFG.n_tokens, (b, T)))
    cond = jnp.zeros((b, CFG.n_feats, T), jnp.float32)
    lengths = jnp.asarray([T])
    key = jax.random.PRNGKey(7)
    for solver in ("euler", "heun"):
        mel = V.generate(params, CFG, x, cond, lengths, key, n_timesteps=4,
                         solver=solver, gradient_scale=1.0)
        assert mel.shape == (b, CFG.n_feats, T)
        assert bool(jnp.all(jnp.isfinite(mel)))


def test_generate_euler_single_step_manual(params, rng):
    """One Euler step with no CFG: z1 = z0 + estimator(x, z0, 0, t=0)."""
    b, T = 1, 8
    x = jnp.asarray(rng.integers(0, CFG.n_tokens, (b, T)))
    cond = jnp.zeros((b, CFG.n_feats, T), jnp.float32)
    lengths = jnp.asarray([T])
    key = jax.random.PRNGKey(3)
    out = V.generate(params, CFG, x, cond, lengths, key, n_timesteps=1,
                     solver="euler", gradient_scale=0.0)
    kz, _ = jax.random.split(key)
    z0 = jax.random.normal(kz, cond.shape, cond.dtype)
    dphi = V.estimator(params, CFG, x, z0, cond, jnp.zeros((b,)), lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(z0 + dphi), rtol=1e-5, atol=1e-5)


def test_prompt_renoising_keeps_prompt_region(params, rng):
    """With speech_prompt, the final prompt region equals the t=1 renoised
    cond (≈ cond itself at t=1 up to sigma_min noise)."""
    b, T, P = 1, 16, 6
    x = jnp.asarray(rng.integers(0, CFG.n_tokens, (b, T)))
    cond = np.zeros((b, CFG.n_feats, T), np.float32)
    cond[:, :, :P] = rng.standard_normal((b, CFG.n_feats, P)).astype(np.float32)
    cond = jnp.asarray(cond)
    lengths = jnp.asarray([T])
    out = V.generate(params, CFG, x, cond, lengths, jax.random.PRNGKey(1), n_timesteps=2,
                     solver="euler", gradient_scale=0.0, speech_prompt=True, prompt_len=P)
    # at t=1: prompt = sigma_min*noise + cond -> within ~4*sigma_min of cond
    np.testing.assert_allclose(np.asarray(out)[:, :, :P], np.asarray(cond)[:, :, :P],
                               atol=10 * CFG.sigma_min)


def test_convert_reference_state_dict_roundtrip(params):
    """Convert a synthetic reference-style state dict and check shapes."""
    import torch

    L, H, F, E, nf = CFG.num_layers, CFG.hidden_size, CFG.intermediate_size, CFG.embedding_dim, CFG.n_feats
    sd = {}
    sd["estimator.embed.weight"] = torch.randn(CFG.n_tokens + 1, E)
    sd["estimator.proj_in.weight"] = torch.randn(H, 2 * nf + E, 1)
    sd["estimator.proj_in.bias"] = torch.randn(H)
    sd["estimator.proj_out.weight"] = torch.randn(nf, H, 1)
    sd["estimator.proj_out.bias"] = torch.randn(nf)
    for i in range(CFG.convpos_depth):
        g = CFG.convpos_groups
        sd[f"estimator.pos_conv_embeds.{i}.conv.weight_g"] = torch.randn(1, 1, CFG.convpos_width)
        sd[f"estimator.pos_conv_embeds.{i}.conv.weight_v"] = torch.randn(H, H // g, CFG.convpos_width)
        sd[f"estimator.pos_conv_embeds.{i}.conv.bias"] = torch.randn(H)
    sd["estimator.layer_norm.weight"] = torch.randn(H)
    sd["estimator.layer_norm.bias"] = torch.randn(H)
    for i in range(L):
        for nm in ["q_proj", "k_proj", "v_proj", "out_proj"]:
            sd[f"estimator.layers.{i}.attention.{nm}.weight"] = torch.randn(H, H)
            sd[f"estimator.layers.{i}.attention.{nm}.bias"] = torch.randn(H)
        sd[f"estimator.layers.{i}.layer_norm.weight"] = torch.randn(H)
        sd[f"estimator.layers.{i}.layer_norm.bias"] = torch.randn(H)
        sd[f"estimator.layers.{i}.final_layer_norm.weight"] = torch.randn(H)
        sd[f"estimator.layers.{i}.final_layer_norm.bias"] = torch.randn(H)
        sd[f"estimator.layers.{i}.feed_forward.intermediate_dense.weight"] = torch.randn(F, H)
        sd[f"estimator.layers.{i}.feed_forward.intermediate_dense.bias"] = torch.randn(F)
        sd[f"estimator.layers.{i}.feed_forward.output_dense.weight"] = torch.randn(H, F)
        sd[f"estimator.layers.{i}.feed_forward.output_dense.bias"] = torch.randn(H)
    for i in range(L // 2):
        sd[f"estimator.skip_connections_layers.{i}.weight"] = torch.randn(H, 2 * H)
        sd[f"estimator.skip_connections_layers.{i}.bias"] = torch.randn(H)

    npsd = {k: v.numpy() for k, v in sd.items()}
    conv = V.convert_reference_state_dict(npsd, CFG)
    ref_tree = jax.tree.map(lambda a: a.shape, params)
    got_tree = jax.tree.map(lambda a: a.shape, conv)
    assert ref_tree == got_tree

    # weight-norm folding: ||folded[:, :, w]||_{dims 0,1} == |g[w]|
    wfold = np.asarray(conv["convpos_w"][0]).transpose(2, 1, 0)  # back to [out, in/g, w]
    g = npsd["estimator.pos_conv_embeds.0.conv.weight_g"]
    norms = np.sqrt((wfold * wfold).sum(axis=(0, 1)))
    np.testing.assert_allclose(norms, np.abs(g[0, 0]), rtol=1e-5)
