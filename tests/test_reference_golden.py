"""Golden parity against the reference's OWN torch code.

The strongest fidelity oracle available in this zero-egress sandbox is
`/root/reference/src/decoder` itself: the decoder stack is pure torch and
importable.  These tests instantiate the reference modules at small but
nontrivial geometry with random weights, convert the state dict with OUR
converters, and assert full-module forward equality — a transpose, skip-order,
mask, or renoise-order conversion error that formula/round-trip tests cannot
see fails here.

Covered oracles (VERDICT r2 item 2):
  * Transformer estimator forward        (networks.py:270-374)
  * CFM loss                             (voicebox.py:28-49)
  * Euler / Heun sampling with CFG       (voicebox.py:74-150)
  * speech-prompt renoising              (voicebox.py:89-92,115-118)
  * BigVGAN generator forward            (vocoder/models.py:141-211)
  * mel_spectrogram                      (vocoder/meldataset.py:55-78)
  * process_unit + assembled units->wav  (util/model_util.py:50-105)

The reference imports `librosa`/`torchaudio` (absent here); minimal shims are
installed for exactly the symbols its import-time code touches — the math
under test (torch STFT, conv stacks, solvers) runs unmodified.  The mel
filterbank inside mel_spectrogram is supplied by OUR `mel_filterbank`, so that
one matrix is shared rather than oracled (librosa itself is unavailable);
everything around it (padding, STFT, window, compression) is the reference's.
"""

import sys
import types
import unittest.mock as mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/src/decoder"


def _install_shims():
    """librosa/torchaudio shims + CPU-safe .cuda for the read-only reference."""
    if "librosa" not in sys.modules:
        from usdm_tpu.audio.mel import mel_filterbank

        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")
        util = types.ModuleType("librosa.util")

        def _mel(*, sr, n_fft, n_mels, fmin, fmax):
            return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

        filters.mel = _mel
        util.normalize = lambda x, **kw: x / max(np.abs(x).max(), 1e-9)
        librosa.filters = filters
        librosa.util = util
        librosa.load = None  # only the with-reference path needs it
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
        sys.modules["librosa.util"] = util
    if "torchaudio" not in sys.modules:
        torchaudio = types.ModuleType("torchaudio")
        transforms = types.ModuleType("torchaudio.transforms")
        transforms.Resample = None  # only used when input sr mismatches
        torchaudio.transforms = transforms
        sys.modules["torchaudio"] = torchaudio
        sys.modules["torchaudio.transforms"] = transforms
    if REF not in sys.path:
        sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def ref():
    _install_shims()
    # networks.py materializes ALiBi slopes via .cuda(); run it on CPU
    with mock.patch.object(torch.Tensor, "cuda", lambda self, *a, **kw: self, create=True):
        import voicebox.model.voicebox as ref_vb  # noqa: F401
        import voicebox.vocoder.meldataset as ref_meldataset  # noqa: F401
        import voicebox.vocoder.models as ref_models  # noqa: F401
        import voicebox.util.model_util as ref_model_util  # noqa: F401
    ns = types.SimpleNamespace(
        vb=ref_vb, meldataset=ref_meldataset, models=ref_models, model_util=ref_model_util
    )
    yield ns
    # the shims must not outlive this module: transformers probes
    # sys.modules for librosa and would trust the stub in later tests
    for name in ("librosa", "librosa.filters", "librosa.util",
                 "torchaudio", "torchaudio.transforms"):
        sys.modules.pop(name, None)


# ---------------------------------------------------------------------------
# geometry + construction helpers
# ---------------------------------------------------------------------------

def _vb_cfg():
    from usdm_tpu.core.config import VoiceboxConfig

    return VoiceboxConfig(
        n_feats=8, n_tokens=12, embedding_dim=16, hidden_size=32,
        intermediate_size=48, num_heads=4, num_layers=4,
        convpos_width=7, convpos_groups=4, convpos_depth=2,
    )


def _make_ref_voicebox(ref, cfg, seed=0):
    torch.manual_seed(seed)
    model = ref.vb.Voicebox(
        n_feats=cfg.n_feats, n_tokens=cfg.n_tokens,
        embedding_dim=cfg.embedding_dim, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_attention_heads=cfg.num_heads, num_hidden_layers=cfg.num_layers,
        convpos_width=cfg.convpos_width, convpos_groups=cfg.convpos_groups,
        convpos_depth=cfg.convpos_depth,
        attention_dropout=0.0, activation_dropout=0.0, hidden_dropout=0.0,
        solver="heun", sigma_min=cfg.sigma_min,
    ).eval()
    return model


def _ours_from_ref(model, cfg):
    from usdm_tpu.models.voicebox import convert_reference_state_dict

    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return convert_reference_state_dict(state, cfg)


def _cpu_cuda():
    return mock.patch.object(torch.Tensor, "cuda", lambda self, *a, **kw: self, create=True)


def _inputs(cfg, b=2, T=33, seed=1):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, cfg.n_tokens, (b, T)).astype(np.int64)
    y = rng.standard_normal((b, cfg.n_feats, T)).astype(np.float32)
    cond = rng.standard_normal((b, cfg.n_feats, T)).astype(np.float32)
    t = rng.uniform(0.05, 0.95, (b,)).astype(np.float32)
    lengths = np.asarray([T, T - 12], np.int64)[:b]
    return x, y, cond, t, lengths


# ---------------------------------------------------------------------------
# estimator forward
# ---------------------------------------------------------------------------

def test_estimator_forward_golden(ref):
    import jax.numpy as jnp

    from usdm_tpu.models import voicebox as VB

    cfg = _vb_cfg()
    model = _make_ref_voicebox(ref, cfg)
    params = _ours_from_ref(model, cfg)
    x, y, cond, t, lengths = _inputs(cfg)

    with torch.no_grad(), _cpu_cuda():
        want = model.estimator(
            torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(cond),
            torch.from_numpy(t).reshape(-1, 1, 1), torch.from_numpy(lengths),
        ).numpy()
    got = np.asarray(VB.estimator(
        params, cfg, jnp.asarray(x), jnp.asarray(y), jnp.asarray(cond),
        jnp.asarray(t), jnp.asarray(lengths),
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_estimator_forward_golden_nonpow2_heads(ref):
    """6 heads exercises the non-power-of-two ALiBi slope branch."""
    import jax.numpy as jnp

    from usdm_tpu.models import voicebox as VB

    cfg = _vb_cfg().replace(num_heads=6, hidden_size=48, convpos_groups=6)
    model = _make_ref_voicebox(ref, cfg, seed=3)
    params = _ours_from_ref(model, cfg)
    x, y, cond, t, lengths = _inputs(cfg, seed=4)

    with torch.no_grad(), _cpu_cuda():
        want = model.estimator(
            torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(cond),
            torch.from_numpy(t).reshape(-1, 1, 1), torch.from_numpy(lengths),
        ).numpy()
    got = np.asarray(VB.estimator(
        params, cfg, jnp.asarray(x), jnp.asarray(y), jnp.asarray(cond),
        jnp.asarray(t), jnp.asarray(lengths),
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# CFM loss
# ---------------------------------------------------------------------------

def test_cfm_loss_golden(ref):
    import jax.numpy as jnp

    from usdm_tpu.models import voicebox as VB

    cfg = _vb_cfg()
    model = _make_ref_voicebox(ref, cfg, seed=5)
    params = _ours_from_ref(model, cfg)
    b, T = 2, 33
    rng = np.random.default_rng(7)
    x = rng.integers(0, cfg.n_tokens, (b, T)).astype(np.int64)
    x1 = rng.standard_normal((b, cfg.n_feats, T)).astype(np.float32)
    mask = (rng.uniform(size=(b, 1, T)) < 0.3).astype(np.float32)
    lengths = np.asarray([T, T - 9], np.int64)
    t = rng.uniform(0.1, 0.9, (b, 1, 1)).astype(np.float32)
    z = rng.standard_normal((b, cfg.n_feats, T)).astype(np.float32)

    with torch.no_grad(), _cpu_cuda(), \
            mock.patch.object(torch, "rand", lambda *a, **kw: torch.from_numpy(t)), \
            mock.patch.object(torch, "randn_like", lambda ref_t: torch.from_numpy(z)):
        want = model(
            torch.from_numpy(x), torch.from_numpy(mask), torch.from_numpy(x1),
            torch.from_numpy(lengths),
        ).item()

    import jax
    got, _ = VB.cfm_loss(
        params, cfg, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(x1),
        jnp.asarray(lengths), jax.random.PRNGKey(0),
        t=jnp.asarray(t[:, 0, 0]), z=jnp.asarray(z), remat=False,
    )
    np.testing.assert_allclose(float(got), want, rtol=2e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# ODE sampling (Euler / Heun, CFG, renoising)
# ---------------------------------------------------------------------------

def _golden_generate(ref, solver, speech_prompt, n_timesteps=8, gradient_scale=1.0):
    import jax
    import jax.numpy as jnp

    from usdm_tpu.models import voicebox as VB

    cfg = _vb_cfg()
    model = _make_ref_voicebox(ref, cfg, seed=11)
    params = _ours_from_ref(model, cfg)
    b, T = 1, 34
    n_prompt = 13
    rng = np.random.default_rng(13)
    x = rng.integers(0, cfg.n_tokens, (b, T)).astype(np.int64)
    cond = np.zeros((b, cfg.n_feats, T), np.float32)
    if speech_prompt:
        cond[:, :, :n_prompt] = rng.standard_normal((b, cfg.n_feats, n_prompt)).astype(np.float32)
    lengths = np.asarray([T], np.int64)

    n_steps = (n_timesteps + 1) // 2 if solver == "heun" else n_timesteps
    z0 = rng.standard_normal((b, cfg.n_feats, T)).astype(np.float32)
    # per-step renoise draws: [i, 0] after the predictor, [i, 1] after the
    # corrector (euler only ever uses [i, 0])
    pn = rng.standard_normal((n_steps, 2, b, cfg.n_feats, T)).astype(np.float32)

    # the reference draws torch.randn_like in this exact order: z first, then
    # (per step) predictor-renoise [, corrector-renoise]
    queue = [z0]
    if speech_prompt:
        for i in range(n_steps):
            queue.append(pn[i, 0])
            if solver == "heun" and i < n_steps - 1:
                queue.append(pn[i, 1])
    draws = iter([torch.from_numpy(q) for q in queue])

    with torch.no_grad(), _cpu_cuda(), \
            mock.patch.object(torch, "randn_like", lambda ref_t: next(draws)):
        want = model.generate(
            torch.from_numpy(x), torch.from_numpy(cond), torch.from_numpy(lengths),
            n_timesteps=n_timesteps, solver=solver, gradient_scale=gradient_scale,
            speech_prompt=speech_prompt,
            prompt_lengths=torch.LongTensor([n_prompt]) if speech_prompt else None,
        ).numpy()

    got = np.asarray(VB.generate(
        params, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(lengths),
        jax.random.PRNGKey(0), n_timesteps=n_timesteps, solver=solver,
        gradient_scale=gradient_scale, speech_prompt=speech_prompt,
        prompt_len=n_prompt if speech_prompt else 0,
        z=jnp.asarray(z0), prompt_noises=jnp.asarray(pn) if speech_prompt else None,
    ))
    # reference returns [:, :, prompt_length:] with prompt_length == 0 even
    # for speech prompts (sample() resets it); ours matches that contract
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
    if speech_prompt:
        # every queued draw must have been consumed (order mismatch guard)
        with pytest.raises(StopIteration):
            next(draws)


def test_generate_euler_golden(ref):
    _golden_generate(ref, "euler", speech_prompt=False)


def test_generate_heun_golden(ref):
    _golden_generate(ref, "heun", speech_prompt=False)


def test_generate_heun_prompt_renoise_golden(ref):
    _golden_generate(ref, "heun", speech_prompt=True)


def test_generate_euler_prompt_renoise_golden(ref):
    _golden_generate(ref, "euler", speech_prompt=True)


def test_generate_no_cfg_golden(ref):
    _golden_generate(ref, "heun", speech_prompt=False, gradient_scale=0.0)


# ---------------------------------------------------------------------------
# BigVGAN generator
# ---------------------------------------------------------------------------

def _bv_cfg():
    from usdm_tpu.core.config import BigVGANConfig

    return BigVGANConfig(
        num_mels=8, upsample_initial_channel=32,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3, 5), resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        resblock="1", activation="snakebeta", snake_logscale=True,
        sampling_rate=22050,
    )


def _make_ref_bigvgan(ref, cfg, seed=0, hop_size=256):
    from voicebox.vocoder.env import AttrDict

    torch.manual_seed(seed)
    h = AttrDict({
        "num_mels": cfg.num_mels,
        "upsample_initial_channel": cfg.upsample_initial_channel,
        "upsample_rates": list(cfg.upsample_rates),
        "upsample_kernel_sizes": list(cfg.upsample_kernel_sizes),
        "resblock_kernel_sizes": list(cfg.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(d) for d in cfg.resblock_dilation_sizes],
        "resblock": cfg.resblock,
        "activation": cfg.activation,
        "snake_logscale": cfg.snake_logscale,
        "sampling_rate": cfg.sampling_rate,
        "hop_size": hop_size,
    })
    model = ref.models.BigVGAN(h).eval()
    # randomize the snake parameters too (they init to 0 under logscale)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith(".alpha") or name.endswith(".beta"):
                p.copy_(torch.randn_like(p) * 0.3)
    return model


def test_bigvgan_generator_golden(ref):
    import jax.numpy as jnp

    from usdm_tpu.models import bigvgan as BV

    cfg = _bv_cfg()
    model = _make_ref_bigvgan(ref, cfg, seed=21)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = BV.convert_reference_state_dict(state, cfg)

    rng = np.random.default_rng(23)
    mel = rng.standard_normal((1, cfg.num_mels, 37)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(mel)).numpy()  # [1, 1, T*8]
    got = np.asarray(BV.generator(params, cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(np.squeeze(got), np.squeeze(want), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# mel_spectrogram
# ---------------------------------------------------------------------------

def test_mel_spectrogram_golden(ref):
    import jax.numpy as jnp

    from usdm_tpu.audio.mel import mel_spectrogram

    rng = np.random.default_rng(31)
    y = (rng.standard_normal((1, 4096)) * 0.2).clip(-1, 1).astype(np.float32)
    kw = dict(n_fft=1024, num_mels=80, sampling_rate=22050, hop_size=256,
              win_size=1024, fmin=0.0, fmax=8000.0)
    with torch.no_grad():
        want = ref.meldataset.mel_spectrogram(
            torch.from_numpy(y), kw["n_fft"], kw["num_mels"], kw["sampling_rate"],
            kw["hop_size"], kw["win_size"], kw["fmin"], kw["fmax"], center=False,
        ).numpy()
    got = np.asarray(mel_spectrogram(jnp.asarray(y), **kw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# process_unit + assembled units -> wav
# ---------------------------------------------------------------------------

def test_process_unit_golden(ref):
    from voicebox.vocoder.env import AttrDict

    from usdm_tpu.audio.units import expand_and_pool

    h = AttrDict({"sampling_rate": 22050, "hop_size": 256})
    rng = np.random.default_rng(41)
    units = rng.integers(0, 50, 64).astype(np.int64)
    want, want_len = ref.model_util.process_unit(torch.from_numpy(units), h, "cpu")
    got, got_len = expand_and_pool(units, 22050, 50, 256)
    assert got_len == want_len
    np.testing.assert_array_equal(got, want.numpy()[0])


def test_reconstruct_speech_golden(ref):
    """The assembled units->wav path (model_util.py:73-105, no-reference
    branch) against our SpeechDecoder math: process_unit -> Heun CFM ->
    de-normalize -> BigVGAN -> clamp."""
    import jax
    import jax.numpy as jnp

    from usdm_tpu.audio.units import expand_and_pool
    from usdm_tpu.core.config import MelConfig
    from usdm_tpu.models import bigvgan as BV
    from usdm_tpu.models import voicebox as VB

    vcfg = _vb_cfg().replace(n_tokens=50)
    bcfg = _bv_cfg().replace(num_mels=vcfg.n_feats)
    vb_model = _make_ref_voicebox(ref, vcfg, seed=51)
    bv_model = _make_ref_bigvgan(ref, bcfg, seed=52)
    vb_params = _ours_from_ref(vb_model, vcfg)
    bv_params = BV.convert_reference_state_dict(
        {k: v.detach().numpy() for k, v in bv_model.state_dict().items()}, bcfg)

    rng = np.random.default_rng(53)
    units = rng.integers(0, vcfg.n_tokens, 20).astype(np.int64)
    n_timesteps = 6
    pooled, _ = expand_and_pool(units, 22050, 50, 256)
    T = len(pooled)
    z0 = rng.standard_normal((1, vcfg.n_feats, T)).astype(np.float32)
    draws = iter([torch.from_numpy(z0)])

    with torch.no_grad(), _cpu_cuda(), \
            mock.patch.object(torch, "randn_like", lambda t: next(draws)):
        want = ref.model_util.reconstruct_speech(
            torch.from_numpy(units), "cpu", None, None, vb_model, bv_model,
            n_timesteps=n_timesteps,
        )

    mc = MelConfig()
    mel = VB.generate(
        vb_params, vcfg, jnp.asarray(pooled[None].astype(np.int32)),
        jnp.zeros((1, vcfg.n_feats, T), jnp.float32), jnp.asarray([T]),
        jax.random.PRNGKey(0), n_timesteps=n_timesteps, solver="heun",
        gradient_scale=1.0, speech_prompt=False, z=jnp.asarray(z0),
    )
    wav = BV.generator(bv_params, bcfg, mel * mc.mel_std + mc.mel_mean)
    got = np.clip(np.squeeze(np.asarray(wav)), -1.0, 1.0)
    np.testing.assert_allclose(got, np.squeeze(want), rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# export round-trips: our save_* -> strict load_state_dict into the reference
# ---------------------------------------------------------------------------

def test_voicebox_export_strict_loads_into_reference(ref, tmp_path):
    """save_voicebox_hub's weight-norm-split export must strict-load into a
    freshly constructed reference Voicebox and reproduce our forward."""
    import jax
    import jax.numpy as jnp

    from usdm_tpu.core.checkpoint import save_voicebox_hub
    from usdm_tpu.models import voicebox as VB

    cfg = _vb_cfg()
    params = VB.init_params(cfg, jax.random.PRNGKey(61))
    save_voicebox_hub(str(tmp_path / "vb"), params, cfg)

    model = _make_ref_voicebox(ref, cfg, seed=0)
    sd = torch.load(str(tmp_path / "vb" / "pytorch_model.bin"), weights_only=True)
    missing, unexpected = model.load_state_dict(sd, strict=True)
    assert not missing and not unexpected

    x, y, cond, t, lengths = _inputs(cfg, seed=62)
    with torch.no_grad(), _cpu_cuda():
        want = model.estimator(
            torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(cond),
            torch.from_numpy(t).reshape(-1, 1, 1), torch.from_numpy(lengths),
        ).numpy()
    got = np.asarray(VB.estimator(
        params, cfg, jnp.asarray(x), jnp.asarray(y), jnp.asarray(cond),
        jnp.asarray(t), jnp.asarray(lengths),
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_bigvgan_export_strict_loads_into_reference(ref, tmp_path):
    import jax
    import jax.numpy as jnp

    from usdm_tpu.core.checkpoint import save_bigvgan_generator
    from usdm_tpu.models import bigvgan as BV

    cfg = _bv_cfg()
    params = BV.init_generator(cfg, jax.random.PRNGKey(63))
    save_bigvgan_generator(str(tmp_path / "bv"), params, cfg)

    model = _make_ref_bigvgan(ref, cfg, seed=0)
    blob = torch.load(str(tmp_path / "bv" / "bigvgan_generator.pt"), weights_only=True)
    missing, unexpected = model.load_state_dict(blob["generator"], strict=True)
    assert not missing and not unexpected

    rng = np.random.default_rng(64)
    mel = rng.standard_normal((1, cfg.num_mels, 29)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(mel)).numpy()
    got = np.asarray(BV.generator(params, cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(np.squeeze(got), np.squeeze(want), rtol=1e-4, atol=1e-5)
