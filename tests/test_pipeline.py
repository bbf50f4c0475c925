"""Full-pipeline plumbing tests (tiny random models, CPU)."""

import numpy as np
import pytest

from usdm_tpu.audio.wav import read_wav, write_wav
from usdm_tpu.pipeline import UsdmPipeline


@pytest.fixture(scope="module")
def pipe():
    return UsdmPipeline.tiny_random()


@pytest.fixture
def user_wav(tmp_path, rng):
    path = str(tmp_path / "user.wav")
    write_wav(path, (rng.standard_normal(16000) * 0.1).astype(np.float32), 16000)
    return path


@pytest.fixture
def ref_wav(tmp_path, rng):
    path = str(tmp_path / "ref.wav")
    write_wav(path, (rng.standard_normal(22050) * 0.1).astype(np.float32), 22050)
    return path


def test_respond_without_reference(pipe, user_wav, tmp_path):
    out = str(tmp_path / "out.wav")
    result = pipe.respond(user_wav, out, None, n_timesteps=2)
    assert isinstance(result.user_text, str)
    assert all(0 <= u < pipe.tokenizer.ts.num_units for u in result.agent_units)
    if result.agent_units:
        wav, sr = read_wav(out)
        assert sr == 22050
        assert len(wav) > 0
        assert np.isfinite(wav).all()


def test_respond_with_speaker_reference(pipe, user_wav, ref_wav, tmp_path):
    """The speaker-adaptation path (reference model_util.py:77-94): reference
    units+mel become a renoised speech prompt that is sliced off the output."""
    out = str(tmp_path / "out_ref.wav")
    result = pipe.respond(user_wav, out, ref_wav, n_timesteps=2)
    assert isinstance(result.agent_text, str)
    if result.agent_units:
        wav, _ = read_wav(out)
        # output covers only the agent units, not the reference prompt
        expected = len(result.agent_units) * (22050 // 50) // 256 * pipe.decoder.vocoder_cfg.total_upsample
        assert abs(len(wav) - expected) <= pipe.decoder.vocoder_cfg.total_upsample


def test_extract_units_range(pipe, rng):
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    units = pipe.extract_units(wav)
    assert len(units) > 0
    assert all(0 <= u < pipe.xlsr_cfg.num_clusters for u in units)


def test_respond_with_speculation_matches_plain(tmp_path, user_wav):
    """respond() with enable_speculation('early-exit:N') writes the same
    greedy dialog as without (lossless speculation at the product surface)."""
    from usdm_tpu.pipeline import UsdmPipeline

    pipe = UsdmPipeline.tiny_random()
    out_a = str(tmp_path / "a.wav")
    res_a = pipe.respond(user_wav, out_a, n_timesteps=2, seed=0)
    pipe.enable_speculation("early-exit:1")
    out_b = str(tmp_path / "b.wav")
    res_b = pipe.respond(user_wav, out_b, n_timesteps=2, seed=0)
    assert pipe._server.engine.spec_rounds > 0
    pipe.close()
    assert res_a.stage_tokens == res_b.stage_tokens
    assert res_a.agent_units == res_b.agent_units


def test_synthesize_bucketing(pipe, rng):
    """Frame bucketing bounds the jitted ODE/vocoder compile set: every
    VB.generate/BV.generator call sees bucket-multiple frame counts, while
    the returned waveform keeps the EXACT sample count (n_pooled * hop)."""
    from unittest import mock

    from usdm_tpu.audio.units import expand_and_pool
    from usdm_tpu.models import bigvgan as BV
    from usdm_tpu.models import voicebox as VB

    dec = pipe.decoder
    assert dec.frame_bucket > 0  # serving default buckets
    mc = dec.mel_cfg
    shapes = []
    real_gen = VB.generate
    real_voc = BV.generator

    def spy_gen(params, cfg, x, cond, lengths, *a, **kw):
        shapes.append(("ode", x.shape[1]))
        return real_gen(params, cfg, x, cond, lengths, *a, **kw)

    def spy_voc(params, cfg, mel):
        shapes.append(("voc", mel.shape[-1]))
        return real_voc(params, cfg, mel)

    for n_units in (3, 7, 11):
        units = rng.integers(0, dec.voicebox_cfg.n_tokens, n_units).tolist()
        pooled, _ = expand_and_pool(np.asarray(units), mc.sampling_rate,
                                    mc.token_sr, mc.hop_size)
        with mock.patch.object(VB, "generate", spy_gen), \
                mock.patch.object(BV, "generator", spy_voc):
            import jax
            wav = dec.synthesize(units, jax.random.PRNGKey(0))
        assert len(wav) == len(pooled) * dec.vocoder_cfg.total_upsample
        assert np.isfinite(wav).all()
    assert all(t % dec.frame_bucket == 0 for _, t in shapes), shapes
    # identical inputs are deterministic (same bucket, same key)
    import jax
    w1 = dec.synthesize([5, 9, 4], jax.random.PRNGKey(3))
    w2 = dec.synthesize([5, 9, 4], jax.random.PRNGKey(3))
    np.testing.assert_array_equal(w1, w2)
    # frame_bucket=0 keeps EXACT shapes (the bit-matching-reference mode)
    import dataclasses
    exact = dataclasses.replace(dec, frame_bucket=0)
    units = rng.integers(0, dec.voicebox_cfg.n_tokens, 5).tolist()
    pooled, _ = expand_and_pool(np.asarray(units), mc.sampling_rate,
                                mc.token_sr, mc.hop_size)
    shapes.clear()
    with mock.patch.object(VB, "generate", spy_gen), \
            mock.patch.object(BV, "generator", spy_voc):
        wav = exact.synthesize(units, jax.random.PRNGKey(0))
    assert shapes == [("ode", len(pooled)), ("voc", len(pooled))], shapes
    assert len(wav) == len(pooled) * dec.vocoder_cfg.total_upsample
