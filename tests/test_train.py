"""Trainer tests on the 8-virtual-device CPU mesh: FSDP LM, LoRA, CFM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usdm_tpu.core.config import CfmTrainConfig, MistralConfig, TrainConfig, VoiceboxConfig
from usdm_tpu.core.mesh import create_mesh
from usdm_tpu.data.collators import pack_collate
from usdm_tpu.models import mistral as M
from usdm_tpu.train import cfm as C
from usdm_tpu.train import lm as T
from usdm_tpu.train import lora as LO

CFG = MistralConfig.tiny(vocab_size=128)
TC = TrainConfig(batch_size=4, max_steps=8, remat=True)


def _batch(rng, b=4, t=32):
    bos = 1
    rows = []
    for _ in range(b):
        a = rng.integers(2, CFG.vocab_size, size=t // 2 - 1)
        c = rng.integers(2, CFG.vocab_size, size=t // 2 - 1)
        rows.append([bos] + a.tolist() + [bos] + c.tolist())
    out = pack_collate(rows, pad_id=0, bos_id=bos)
    return {k: jnp.asarray(v) for k, v in out.items()}


def test_fsdp_train_step_decreases_loss(rng):
    mesh = create_mesh(dp=4, tp=2)
    state, _ = T.init_state(CFG, TC, mesh, jax.random.PRNGKey(0))
    step = T.make_train_step(CFG, TC, mesh, attn_impl="xla")
    batch = _batch(rng)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses}"
    # params actually sharded: a big weight should span multiple devices
    wq = state.params["layers"]["wq"]
    assert len(wq.sharding.device_set) > 1


def test_fsdp_matches_single_device(rng):
    """The 4x2-sharded step must produce the same loss trajectory as dp=1."""
    batch = _batch(rng)
    mesh8 = create_mesh(dp=4, tp=2)
    mesh1 = create_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    with jax.default_matmul_precision("highest"):
        s8, _ = T.init_state(CFG, TC, mesh8, jax.random.PRNGKey(0))
        s1, _ = T.init_state(CFG, TC, mesh1, jax.random.PRNGKey(0))
        step8 = T.make_train_step(CFG, TC, mesh8, attn_impl="xla")
        step1 = T.make_train_step(CFG, TC, mesh1, attn_impl="xla")
        l8, l1 = [], []
        for _ in range(3):
            s8, m8 = step8(s8, batch)
            s1, m1 = step1(s1, batch)
            l8.append(float(m8["loss"]))
            l1.append(float(m1["loss"]))
    np.testing.assert_allclose(l8, l1, rtol=2e-3, atol=2e-3)


def test_lora_step_only_updates_adapters(rng):
    mesh = create_mesh(dp=8, tp=1)
    base = M.init_params(CFG, jax.random.PRNGKey(0), dtype="float32")
    lora = LO.init_lora(CFG, jax.random.PRNGKey(1), r=4, alpha=8)
    step, opt = LO.make_lora_train_step(CFG, TC, mesh, attn_impl="xla")
    opt_state = opt.init(lora)
    batch = _batch(rng, b=8)
    l0 = None
    for i in range(4):
        lora, opt_state, metrics = step(base, lora, opt_state, batch)
        if i == 0:
            l0 = float(metrics["loss"])
    assert float(metrics["loss"]) < l0
    # B starts at zero -> first-step loss equals base-model loss
    base_loss, _ = M.loss_fn(base, CFG, batch["input_ids"], batch["labels"],
                             batch["segment_ids"], batch["positions"],
                             attn_impl="xla", remat=False)
    assert abs(l0 - float(base_loss)) < 1e-4


def test_lora_merge_equivalence(rng):
    """merge_lora(base, lora) forward == forward with lora side paths."""
    base = M.init_params(CFG, jax.random.PRNGKey(0), dtype="float32")
    lora = LO.init_lora(CFG, jax.random.PRNGKey(1), r=4, alpha=8)
    # make B nonzero so the test is non-trivial
    lora = jax.tree.map(lambda a: a + 0.01, lora)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 16)))
    with jax.default_matmul_precision("highest"):
        out_side = M.forward(base, CFG, ids, attn_impl="xla", lora=lora)
        merged = LO.merge_lora(base, lora)
        out_merged = M.forward(merged, CFG, ids, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(out_side), np.asarray(out_merged), rtol=2e-4, atol=2e-4)


def test_cfm_train_step(rng):
    mesh = create_mesh(dp=8, tp=1)
    vcfg = VoiceboxConfig.tiny()
    tc = CfmTrainConfig(batch_size=8)
    state, opt = C.init_state(vcfg, tc, mesh, jax.random.PRNGKey(0))
    step = C.make_train_step(vcfg, tc, mesh, opt, compute_dtype="float32")
    b, t = 8, 24
    batch = {
        "x": jnp.asarray(rng.integers(0, vcfg.n_tokens, (b, t))),
        "mask": jnp.asarray(np.zeros((b, 1, t), np.float32)),
        "y": jnp.asarray(rng.standard_normal((b, vcfg.n_feats, t)).astype(np.float32)),
        "y_lengths": jnp.asarray(np.full(b, t, np.int32)),
    }
    losses = []
    # fixed key -> deterministic (t, z) so the loss trajectory is comparable
    key = jax.random.PRNGKey(1)
    for i in range(5):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_vocoder_gan_steps(rng):
    from usdm_tpu.core.config import BigVGANConfig, MelConfig
    from usdm_tpu.train import vocoder as VG

    cfg = BigVGANConfig.tiny().replace(num_mels=80)
    mel_cfg = MelConfig()
    mesh = create_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    state, gopt, dopt = VG.init_state(cfg, jax.random.PRNGKey(0), periods=(2, 3))
    disc_step, gen_step = VG.make_train_steps(cfg, mesh, gopt, dopt, mel_cfg,
                                              resolutions=((256, 64, 128),),
                                              periods=(2, 3))
    frames = 32
    mel = jnp.asarray(rng.standard_normal((1, 80, frames)).astype(np.float32) - 5.0)
    wav = jnp.asarray(rng.standard_normal((1, 1, frames * cfg.total_upsample)).astype(np.float32) * 0.1)
    batch = {"mel": mel, "wav": wav}

    state, dmetrics = disc_step(state, batch)
    state, gmetrics = gen_step(state, batch)
    assert np.isfinite(float(dmetrics["disc_loss"]))
    assert np.isfinite(float(gmetrics["gen_loss"]))
    # a couple more alternating steps: discriminator loss should move
    d0 = float(dmetrics["disc_loss"])
    for _ in range(2):
        state, dmetrics = disc_step(state, batch)
        state, gmetrics = gen_step(state, batch)
    assert float(dmetrics["disc_loss"]) != d0
