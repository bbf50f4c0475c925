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


def test_distill_draft_learns_target(rng):
    """Distilling a 1-layer draft against a random tiny target: loss drops
    and argmax agreement rises over a fixed batch; a full-depth early-exit
    'draft' (== the target itself) starts at agreement 1.0."""
    from usdm_tpu.train import distill as D

    mesh = create_mesh(dp=4, tp=2)
    tgt = M.init_params(CFG, jax.random.PRNGKey(7), dtype="float32")
    tc = TrainConfig(batch_size=4, max_steps=40, learning_rate=3e-3, remat=True)
    batch = _batch(rng)

    # sanity oracle: a "draft" that IS the target nearly always agrees (the
    # loss fn runs the draft in bf16 compute, so random-logit near-ties can
    # flip a few argmaxes; exactness would hide nothing this checks for)
    full, cfg_full = D.init_draft_from_target(tgt, CFG, CFG.num_layers)
    with jax.default_matmul_precision("highest"):
        _, aux = D.distill_loss_fn(full, tgt, cfg_full, CFG, batch, chunk=16,
                                   attn_impl="xla")
        assert float(aux["agree"]) > 0.95
        assert float(aux["loss"]) < 0.05

        draft, cfg_d = D.init_draft_from_target(tgt, CFG, 1)
        opt = T.make_optimizer(tc)
        state, shardings = T.init_state(cfg_d, tc, mesh, jax.random.PRNGKey(0), opt)
        state = T.TrainState(params=jax.device_put(draft, shardings.params),
                             opt_state=state.opt_state, step=state.step)
        step = D.make_distill_step(cfg_d, CFG, tc, mesh, opt, chunk=16,
                                   attn_impl="xla")
        hist = []
        for _ in range(12):
            state, metrics = step(state, tgt, batch)
            hist.append((float(metrics["loss"]), float(metrics["agree"])))
    losses = [h[0] for h in hist]
    agrees = [h[1] for h in hist]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"distill loss flat: {losses}"
    assert agrees[-1] >= agrees[0], f"agreement fell: {agrees}"


def test_distill_top1_mode_and_quantized_target(rng):
    """top1 (argmax-CE) mode trains, and the target forward accepts int8
    serving weights (the one-chip 7B-target + draft configuration)."""
    from usdm_tpu.models.quant import quantize_llm_params
    from usdm_tpu.train import distill as D

    mesh = create_mesh(dp=4, tp=2)
    tgt = M.init_params(CFG, jax.random.PRNGKey(7), dtype="float32")
    qtgt = jax.jit(quantize_llm_params)(tgt)
    tc = TrainConfig(batch_size=4, max_steps=20, learning_rate=3e-3, remat=False)
    batch = _batch(rng)
    with jax.default_matmul_precision("highest"):
        draft, cfg_d = D.init_draft_from_target(qtgt, CFG, 1)
        assert draft["layers"]["wq"].dtype == jnp.float32  # dequantized copy
        opt = T.make_optimizer(tc)
        state, shardings = T.init_state(cfg_d, tc, mesh, jax.random.PRNGKey(0), opt)
        state = T.TrainState(params=jax.device_put(draft, shardings.params),
                             opt_state=state.opt_state, step=state.step)
        step = D.make_distill_step(cfg_d, CFG, tc, mesh, opt, mode="top1",
                                   chunk=16, attn_impl="xla")
        losses = []
        for _ in range(8):
            state, metrics = step(state, qtgt, batch)
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"top1 distill flat: {losses}"


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


def test_manual_adamw_matches_optax(rng):
    """The offload path's manual AdamW (train/lm.py:manual_adamw_update) must
    be numerically identical to the optax chain the default trainer uses
    (clip_by_global_norm -> adamw(schedule)) so --offload changes placement,
    not training math."""
    import optax

    tc = TrainConfig(batch_size=4, max_steps=20, learning_rate=3e-3)
    opt = T.make_optimizer(tc)
    # the same schedule make_optimizer builds
    total = tc.max_steps
    warmup = max(int(total * tc.warmup_ratio), 1)
    schedule = optax.warmup_cosine_decay_schedule(0.0, tc.learning_rate, warmup, max(total, warmup + 1))

    params = {
        "a": jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32)),
        "b": {"w": jnp.asarray(rng.standard_normal((4,)).astype(np.float32))},
    }
    opt_state = opt.init(params)
    manual_state = T.AdamWState(
        m=jax.tree.map(jnp.zeros_like, params),
        v=jax.tree.map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
    )
    p_opt, p_man = params, params
    for step in range(4):
        grads = jax.tree.map(
            lambda a: jnp.asarray(rng.standard_normal(a.shape).astype(np.float32)) * (10.0 if step == 1 else 0.1),
            params,
        )
        updates, opt_state = opt.update(grads, opt_state, p_opt)
        p_opt = optax.apply_updates(p_opt, updates)
        p_man, manual_state, gnorm = T.manual_adamw_update(p_man, grads, manual_state, schedule, tc)
        assert np.isfinite(float(gnorm))
        for l1, l2 in zip(jax.tree.flatten(p_opt)[0], jax.tree.flatten(p_man)[0]):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-5, atol=2e-7)


def test_memory_budget_7b_v5e():
    """docs/MEMORY.md table: 7B FSDP doesn't fit a 16GB v5e chip at dp=8
    without optimizer offload, fits with it, and fits without at dp=16."""
    full = MistralConfig()
    assert not T.memory_budget(full, dp=8, offload=False)["fits"]
    with_off = T.memory_budget(full, dp=8, offload=True)
    assert with_off["fits"] and with_off["host_gb"] > 5.0
    assert T.memory_budget(full, dp=16, offload=False)["fits"]
    # tp also divides the states
    assert T.memory_budget(full, dp=8, tp=2, offload=False)["device_gb"] < \
           T.memory_budget(full, dp=8, tp=1, offload=False)["device_gb"]


def test_offload_shardings_are_pinned_host():
    mesh = create_mesh(dp=8, tp=1)
    state_sh, host_flat = T._offload_shardings(CFG, mesh)
    assert all(s.memory_kind == "pinned_host" for s in host_flat)
    assert all(s.memory_kind == "pinned_host"
               for s in jax.tree.flatten(state_sh.opt_state.v)[0])
    assert state_sh.params["embed"].memory_kind == "device"
