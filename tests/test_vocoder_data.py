"""Vocoder training data path (reference meldataset.py:92-174) + end-to-end
trainability of the GAN recipe via the CLI."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usdm_tpu.audio.mel import mel_for_config
from usdm_tpu.audio.wav import write_wav
from usdm_tpu.core.config import BigVGANConfig, MelConfig
from usdm_tpu.data.mel_dataset import (
    MelAudioDataset, collate_mel_batch, dump_base_mels, loss_mel_config,
    peak_normalize, read_vocoder_filelist,
)


@pytest.fixture(scope="module")
def wav_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(3)
    names = []
    for i, n in enumerate([22050, 4096, 9000] + [16384] * 6):
        name = f"clip{i}"
        write_wav(str(wavs / f"{name}.wav"), (rng.standard_normal(n) * 0.2).astype(np.float32), 22050)
        names.append(name)
    train_list = root / "train.txt"
    train_list.write_text("\n".join(f"{n}|unused transcript" for n in names))
    return str(wavs), str(train_list), names


def test_filelist_and_crop(wav_corpus):
    wavs_dir, train_list, names = wav_corpus
    files = read_vocoder_filelist(train_list, wavs_dir)
    assert len(files) == 9 and all(os.path.exists(f) for f in files)

    mc = MelConfig()
    ds = MelAudioDataset(files, segment_size=8192, mel_cfg=mc)
    rng = np.random.default_rng(0)
    wav, base = ds.__getitem__(0, rng)
    assert base is None and wav.shape == (8192,) and wav.dtype == np.float32
    # peak normalization to 0.95 happens before the crop (meldataset.py:128)
    assert np.abs(wav).max() <= 0.95 + 1e-6
    # short file: zero-padded to segment_size
    wav_short, _ = ds.__getitem__(1, rng)
    assert wav_short.shape == (8192,) and np.all(wav_short[4096:] == 0)


def test_peak_normalize():
    x = np.array([0.1, -0.5, 0.25], np.float32)
    y = peak_normalize(x)
    assert np.isclose(np.abs(y).max(), 0.95)
    assert np.allclose(peak_normalize(np.zeros(4, np.float32)), 0.0)


def test_collate_matches_device_mel(wav_corpus):
    wavs_dir, train_list, _ = wav_corpus
    files = read_vocoder_filelist(train_list, wavs_dir)
    mc = MelConfig()
    ds = MelAudioDataset(files, segment_size=8192, mel_cfg=mc)
    rng = np.random.default_rng(1)
    batch = collate_mel_batch([ds.__getitem__(i, rng) for i in range(2)], mc)
    assert batch["wav"].shape == (2, 1, 8192)
    assert batch["mel"].shape == (2, mc.num_mels, 8192 // mc.hop_size)
    ref = mel_for_config(batch["wav"][:, 0, :], mc)
    np.testing.assert_allclose(np.asarray(batch["mel"]), np.asarray(ref), atol=1e-5)


def test_loss_mel_config_fullband():
    mc = MelConfig()
    assert loss_mel_config(mc).fmax == mc.sampling_rate / 2.0


def test_fine_tuning_alignment(wav_corpus, tmp_path):
    wavs_dir, train_list, _ = wav_corpus
    files = read_vocoder_filelist(train_list, wavs_dir)
    mc = MelConfig()
    n = dump_base_mels(files, str(tmp_path / "mels"), mc)
    assert n == 9
    ds = MelAudioDataset(files, segment_size=8192, mel_cfg=mc,
                         fine_tuning=True, base_mels_path=str(tmp_path / "mels"))
    rng = np.random.default_rng(2)
    wav, mel = ds.__getitem__(0, rng)
    assert wav.shape == (8192,) and mel.shape == (mc.num_mels, 8192 // mc.hop_size)
    # the precomputed mel crop must equal the mel of the aligned audio crop
    # except at the crop boundaries, where STFT reflect-padding sees different
    # context (pad = (n_fft-hop)/2 = 384 samples -> 2 frames each side); the
    # reference's npy mels have the same property
    ref = np.asarray(mel_for_config(jnp.asarray(wav[None]), mc))[0]
    np.testing.assert_allclose(mel[:, 2:-2], ref[:, 2:-2], atol=2e-2)
    # short file: padded, no crash
    wav_s, mel_s = ds.__getitem__(1, rng)
    assert wav_s.shape == (8192,) and mel_s.shape[-1] == 8192 // mc.hop_size


def test_gan_mel_loss_decreases(wav_corpus):
    """VERDICT item 6 'done' bar: the GAN trainer is runnable end-to-end and
    learning (mel L1 falls on a fixed synthetic batch)."""
    from usdm_tpu.core.mesh import create_mesh
    from usdm_tpu.train import vocoder as VG

    cfg = BigVGANConfig.tiny()
    mc = MelConfig().replace(num_mels=cfg.num_mels, n_fft=64, win_size=64,
                             hop_size=cfg.total_upsample)
    wavs_dir, train_list, _ = wav_corpus
    files = read_vocoder_filelist(train_list, wavs_dir)
    ds = MelAudioDataset(files, segment_size=1024, mel_cfg=mc)
    rng = np.random.default_rng(0)
    batch = collate_mel_batch([ds.__getitem__(i % 3, rng) for i in range(8)], mc)

    mesh = create_mesh(dp=-1, tp=1)
    state, gopt, dopt = VG.init_state(cfg, jax.random.PRNGKey(0), periods=(2, 3))
    disc_step, gen_step = VG.make_train_steps(
        cfg, mesh, gopt, dopt, mel_cfg=loss_mel_config(mc),
        resolutions=((256, 64, 128),), periods=(2, 3))
    mel_l1 = []
    for _ in range(8):
        state, _ = disc_step(state, batch)
        state, g = gen_step(state, batch)
        mel_l1.append(float(g["gen_mel_l1"]))
    assert np.isfinite(mel_l1).all()
    assert mel_l1[-1] < mel_l1[0]


def test_train_vocoder_cli_smoke(wav_corpus, tmp_path):
    from usdm_tpu.cli.train_vocoder import main

    wavs_dir, train_list, _ = wav_corpus
    out = str(tmp_path / "run")
    exp = str(tmp_path / "exported")
    rc = main([
        "--output_dir", out, "--input_wavs_dir", wavs_dir,
        "--input_training_file", train_list, "--input_validation_file", train_list,
        "--tiny", "--batch_size", "8", "--segment_size", "1024",
        "--max_steps", "2", "--n_epochs", "1", "--export", exp,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "checkpoints"))
    # exported generator is loadable (reference bigvgan_generator.pt layout)
    from usdm_tpu.core import checkpoint as ckpt

    params, _ = ckpt.load_bigvgan(exp)
    assert "conv_pre_w" in params
