"""BigVGAN vocoder GAN training: alternating generator/discriminator steps.

The reference ships BigVGAN's discriminators and GAN losses
(/root/reference/src/decoder/voicebox/vocoder/models.py:316-488) as the
training side of the vocoder; this module turns them into two jitted
data-parallel steps following the published BigVGAN recipe: LSGAN adversarial
losses over MPD+MRD, feature-matching loss x2, and L1 mel-spectrogram loss
x45, AdamW(0.8, 0.99) with exponential decay.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from usdm_tpu.audio.mel import mel_spectrogram
from usdm_tpu.core.config import BigVGANConfig, MelConfig
from usdm_tpu.core.mesh import DATA_AXIS
from usdm_tpu.models import bigvgan as BV


@dataclasses.dataclass
class GanTrainState:
    gen_params: Any
    mpd: Any
    mrd: Any
    gen_opt: Any
    disc_opt: Any
    step: jnp.ndarray


jax.tree_util.register_dataclass(
    GanTrainState,
    data_fields=["gen_params", "mpd", "mrd", "gen_opt", "disc_opt", "step"],
    meta_fields=[],
)

MEL_LOSS_WEIGHT = 45.0
FM_LOSS_WEIGHT = 2.0  # feature_loss already multiplies by 2 (models.py:464)


def make_optimizer(lr: float = 2e-4, decay: float = 0.999) -> optax.GradientTransformation:
    sched = optax.exponential_decay(lr, transition_steps=1000, decay_rate=decay**1000)
    return optax.adamw(sched, b1=0.8, b2=0.99, weight_decay=0.01)


def init_state(
    cfg: BigVGANConfig,
    key: jax.Array,
    lr: float = 2e-4,
    periods=(2, 3, 5, 7, 11),
) -> Tuple[GanTrainState, optax.GradientTransformation, optax.GradientTransformation]:
    k1, k2, k3 = jax.random.split(key, 3)
    gen = BV.init_generator(cfg, k1)
    mpd = BV.init_mpd(k2, periods=periods)
    mrd = BV.init_mrd(k3)
    gopt = make_optimizer(lr)
    dopt = make_optimizer(lr)
    state = GanTrainState(
        gen_params=gen, mpd=mpd, mrd=mrd,
        gen_opt=gopt.init(gen), disc_opt=dopt.init((mpd, mrd)),
        step=jnp.zeros((), jnp.int32),
    )
    return state, gopt, dopt


def _mel(wav_b1t: jnp.ndarray, mc: MelConfig) -> jnp.ndarray:
    return mel_spectrogram(
        wav_b1t[:, 0, :], mc.n_fft, mc.num_mels, mc.sampling_rate,
        mc.hop_size, mc.win_size, mc.fmin, mc.fmax,
    )


def make_train_steps(
    cfg: BigVGANConfig,
    mesh: Mesh,
    gopt: optax.GradientTransformation,
    dopt: optax.GradientTransformation,
    mel_cfg: MelConfig = MelConfig(),
    resolutions=BV.DEFAULT_RESOLUTIONS,
    periods=BV.DEFAULT_PERIODS,
):
    """Returns (disc_step, gen_step); call disc first, then gen (HiFi-GAN
    ordering)."""
    repl = NamedSharding(mesh, P())
    b_sh = {
        "mel": NamedSharding(mesh, P(DATA_AXIS, None, None)),
        "wav": NamedSharding(mesh, P(DATA_AXIS, None, None)),
    }

    def disc_loss_fn(discs, gen_params, batch):
        mpd, mrd = discs
        fake = BV.generator(gen_params, cfg, batch["mel"])
        fake = jax.lax.stop_gradient(fake)
        t = min(fake.shape[-1], batch["wav"].shape[-1])
        y_r, y_g, _, _ = BV.discriminate(mpd, mrd, resolutions, batch["wav"][..., :t], fake[..., :t], periods)
        loss, _, _ = BV.discriminator_loss(y_r, y_g)
        return loss

    def disc_step(state: GanTrainState, batch):
        loss, grads = jax.value_and_grad(disc_loss_fn)((state.mpd, state.mrd), state.gen_params, batch)
        updates, new_opt = dopt.update(grads, state.disc_opt, (state.mpd, state.mrd))
        mpd, mrd = optax.apply_updates((state.mpd, state.mrd), updates)
        return dataclasses.replace(state, mpd=mpd, mrd=mrd, disc_opt=new_opt), {"disc_loss": loss}

    def gen_loss_fn(gen_params, discs, batch):
        mpd, mrd = discs
        fake = BV.generator(gen_params, cfg, batch["mel"])
        t = min(fake.shape[-1], batch["wav"].shape[-1])
        real, fake = batch["wav"][..., :t], fake[..., :t]
        y_r, y_g, f_r, f_g = BV.discriminate(mpd, mrd, resolutions, real, fake, periods)
        adv, _ = BV.generator_loss(y_g)
        fm = BV.feature_loss(f_r, f_g)
        mel_l1 = jnp.mean(jnp.abs(_mel(real, mel_cfg) - _mel(fake, mel_cfg)))
        loss = adv + fm + MEL_LOSS_WEIGHT * mel_l1
        return loss, {"gen_adv": adv, "gen_fm": fm, "gen_mel_l1": mel_l1}

    def gen_step(state: GanTrainState, batch):
        (loss, aux), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params, (state.mpd, state.mrd), batch
        )
        updates, new_opt = gopt.update(grads, state.gen_opt, state.gen_params)
        gen = optax.apply_updates(state.gen_params, updates)
        aux["gen_loss"] = loss
        return dataclasses.replace(state, gen_params=gen, gen_opt=new_opt, step=state.step + 1), aux

    disc_jit = jax.jit(disc_step, in_shardings=(repl, b_sh), out_shardings=(repl, repl),
                       donate_argnums=(0,))
    gen_jit = jax.jit(gen_step, in_shardings=(repl, b_sh), out_shardings=(repl, repl),
                      donate_argnums=(0,))
    return disc_jit, gen_jit
