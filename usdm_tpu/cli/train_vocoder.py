"""CLI: BigVGAN vocoder GAN training / fine-tuning.

Equivalent of the reference BigVGAN `train.py` recipe the vocoder checkpoints
were produced with (discriminators + losses shipped in
/root/reference/src/decoder/voicebox/vocoder/models.py:316-488, data in
meldataset.py:92-174): filelist-driven random waveform crops, alternating
MPD+MRD discriminator / generator steps (LSGAN + 2x feature-matching + 45x
mel L1 at full-band fmax), AdamW(0.8, 0.99) with exponential decay, periodic
validation mel error, orbax checkpoints with latest-step resume, and a
fine-tuning mode conditioned on precomputed (Voicebox-domain) mels.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--input_wavs_dir", required=True)
    p.add_argument("--input_training_file", required=True,
                   help="lines of 'name|...'; first field resolved against input_wavs_dir")
    p.add_argument("--input_validation_file", default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--segment_size", type=int, default=8192)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--lr_decay", type=float, default=0.999)
    p.add_argument("--n_epochs", type=int, default=3100)
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--save_every", type=int, default=1, help="epochs between checkpoints")
    p.add_argument("--eval_every", type=int, default=1, help="epochs between validation passes")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init_from", default=None,
                   help="warm-start the generator from a converted BigVGAN dir (fine-tuning)")
    p.add_argument("--fine_tuning", action="store_true",
                   help="condition on precomputed mels from --base_mels_path (meldataset.py:150)")
    p.add_argument("--base_mels_path", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--export", default=None,
                   help="after training, export the generator as config.json "
                        "+ bigvgan_generator.pt (reference layout)")
    from usdm_tpu.core import distributed as D
    D.add_cli_args(p)
    args = p.parse_args(argv)
    if args.num_slices > 1:
        p.error("this trainer is plain DP: multi-host needs no replica axis "
                "(a single `data` axis spans slices; grads all-reduce over "
                "DCN automatically) — drop --num_slices")
    D.initialize_from_args(args)

    import jax
    import jax.numpy as jnp

    from usdm_tpu.core import checkpoint as ckpt
    from usdm_tpu.core.config import BigVGANConfig, MelConfig
    from usdm_tpu.core.logging import MetricsLogger
    from usdm_tpu.core.mesh import create_mesh
    from usdm_tpu.data.mel_dataset import (
        MelAudioDataset, collate_mel_batch, loss_mel_config, read_vocoder_filelist,
    )
    from usdm_tpu.train import vocoder as V

    from usdm_tpu.models import bigvgan as BV

    cfg = BigVGANConfig.tiny() if args.tiny else BigVGANConfig()
    mel_cfg = MelConfig()
    resolutions = BV.DEFAULT_RESOLUTIONS
    if args.tiny:
        # hop must equal the generator's upsample factor so wav/mel lengths
        # stay aligned; shrink the analysis windows to match
        mel_cfg = mel_cfg.replace(num_mels=cfg.num_mels, n_fft=64, win_size=64,
                                  hop_size=cfg.total_upsample)
        resolutions = ((256, 64, 128),)
    if args.segment_size % mel_cfg.hop_size:
        p.error(f"--segment_size must be a multiple of the hop {mel_cfg.hop_size}")

    mesh = create_mesh(dp=-1, tp=1)
    key = jax.random.PRNGKey(args.seed)
    periods = (2, 3) if args.tiny else (2, 3, 5, 7, 11)
    state, gopt, dopt = V.init_state(cfg, key, lr=args.learning_rate, periods=periods)
    if args.init_from:
        import dataclasses

        gen, _ = ckpt.load_bigvgan(args.init_from, cfg)
        state = dataclasses.replace(state, gen_params=gen)

    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    start_epoch = 0
    if args.resume:
        latest = ckpt.latest_step(ckpt_dir)
        if latest is not None:
            print(f"resuming from epoch {latest}")
            state = ckpt.restore_train_state(ckpt_dir, state, latest)
            start_epoch = latest

    disc_step, gen_step = V.make_train_steps(
        cfg, mesh, gopt, dopt, mel_cfg=loss_mel_config(mel_cfg),
        resolutions=resolutions, periods=periods,
    )

    train_files = read_vocoder_filelist(args.input_training_file, args.input_wavs_dir)
    dataset = MelAudioDataset(
        train_files, args.segment_size, mel_cfg,
        fine_tuning=args.fine_tuning, base_mels_path=args.base_mels_path,
    )
    val = None
    if args.input_validation_file:
        val_files = read_vocoder_filelist(args.input_validation_file, args.input_wavs_dir)
        val = MelAudioDataset(
            val_files, args.segment_size, mel_cfg,
            fine_tuning=args.fine_tuning, base_mels_path=args.base_mels_path,
        )

    logger = MetricsLogger(args.output_dir)
    rng = np.random.default_rng(args.seed)
    gstep = 0
    for epoch in range(start_epoch, args.n_epochs):
        order = rng.permutation(len(dataset))
        for i in range(0, len(order) - args.batch_size + 1, args.batch_size):
            items = [dataset.__getitem__(j, rng) for j in order[i : i + args.batch_size]]
            batch = collate_mel_batch(items, mel_cfg)
            state, d_metrics = disc_step(state, batch)
            state, g_metrics = gen_step(state, batch)
            gstep += 1
            if gstep % 20 == 0:
                logger.log(gstep, {**d_metrics, **g_metrics})
                print(
                    f"epoch {epoch} step {gstep}: gen={float(g_metrics['gen_loss']):.4f}"
                    f" disc={float(d_metrics['disc_loss']):.4f}"
                    f" mel_l1={float(g_metrics['gen_mel_l1']):.4f}"
                )
            if args.max_steps and gstep >= args.max_steps:
                break
        if args.max_steps and gstep >= args.max_steps:
            break
        if val is not None and (epoch + 1) % max(args.eval_every, 1) == 0 and len(val):
            from usdm_tpu.audio.mel import mel_for_config
            from usdm_tpu.models import bigvgan as BV

            # cycle if the validation set is smaller than a (dp-sharded) batch
            items = [val.__getitem__(j % len(val), np.random.default_rng(0)) for j in range(args.batch_size)]
            batch = collate_mel_batch(items, mel_cfg)
            fake = BV.generator(state.gen_params, cfg, batch["mel"])
            t = min(fake.shape[-1], batch["wav"].shape[-1])
            lc = loss_mel_config(mel_cfg)
            err = jnp.mean(jnp.abs(mel_for_config(batch["wav"][:, 0, :t], lc) - mel_for_config(fake[:, 0, :t], lc)))
            logger.log(gstep, {"val_mel_l1": float(err)}, prefix="eval")
            print(f"epoch {epoch}: val_mel_l1={float(err):.4f}")
        if (epoch + 1) % args.save_every == 0:
            ckpt.save_train_state(ckpt_dir, state, epoch + 1)
    ckpt.save_train_state(ckpt_dir, state, args.n_epochs if not args.max_steps else gstep)
    if args.export:
        ckpt.save_bigvgan_generator(args.export, jax.device_get(state.gen_params), cfg)
        print(f"exported generator: {args.export}")
    logger.close()
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
