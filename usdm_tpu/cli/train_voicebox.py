"""CLI: token-Voicebox CFM training.

Equivalent of `accelerate launch src/decoder/scripts/train.py` (reference
decoder/scripts/train.py:25-246): unit-mel filelist dataset, CFG/infilling
collate, data-parallel train loop, per-epoch eval loss + audible smoke test
(mel synthesis logged as audio), dual-purpose orbax checkpoints with
latest-step resume.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--train_filelist", required=True,
                   help="lines of 'wav_path|units|durations' (reference filelist format)")
    p.add_argument("--valid_filelist", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--n_epochs", type=int, default=10000)
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--out_size_second", type=int, default=16)
    p.add_argument("--p_uncond", type=float, default=0.2)
    p.add_argument("--p_drop", type=float, default=0.3)
    p.add_argument("--r_min", type=float, default=0.7)
    p.add_argument("--r_max", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=37)
    p.add_argument("--save_every", type=int, default=1, help="epochs between checkpoints")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthesize_every", type=int, default=1,
                   help="epochs between audio smoke tests (0 = off)")
    p.add_argument("--export_hub", default=None,
                   help="after training, export params as a HubMixin dir "
                        "(loadable by our inference / load_voicebox)")
    p.add_argument("--bigvgan_dir", default=None,
                   help="vocode eval mels into audible smoke tests "
                        "(reference scripts/train.py:277-302)")
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
    from usdm_tpu.core.config import CfmTrainConfig, MelConfig, VoiceboxConfig
    from usdm_tpu.core.logging import MetricsLogger
    from usdm_tpu.core.mesh import create_mesh
    from usdm_tpu.data.unit_mel import UnitMelDataset, UnitMelCollate
    from usdm_tpu.models import voicebox as VB
    from usdm_tpu.train import cfm as C

    cfg = VoiceboxConfig.tiny().replace(n_feats=80) if args.tiny else VoiceboxConfig()
    mel_cfg = MelConfig()
    tc = CfmTrainConfig(
        learning_rate=args.learning_rate, batch_size=args.batch_size,
        out_size_seconds=args.out_size_second, p_uncond=args.p_uncond,
        p_drop=args.p_drop, r_min=args.r_min, r_max=args.r_max,
        seed=args.seed, n_epochs=args.n_epochs, save_every=args.save_every,
    )

    mesh = create_mesh(dp=-1, tp=1)
    key = jax.random.PRNGKey(args.seed)
    state, opt = C.init_state(cfg, tc, mesh, key)

    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    start_epoch = 0
    if args.resume:
        latest = ckpt.latest_step(ckpt_dir)
        if latest is not None:
            print(f"resuming from epoch {latest}")
            state = ckpt.restore_train_state(ckpt_dir, state, latest)
            start_epoch = latest

    step_fn = C.make_train_step(cfg, tc, mesh, opt)
    eval_fn = C.make_eval_step(cfg, mesh)
    logger = MetricsLogger(args.output_dir)

    vocoder = None
    if args.bigvgan_dir:
        from usdm_tpu.models import bigvgan as BGV

        bv_params, bv_cfg = ckpt.load_bigvgan(args.bigvgan_dir)
        vocoder = (bv_params, bv_cfg)

    dataset = UnitMelDataset(args.train_filelist, mel_cfg, n_tokens=cfg.n_tokens)
    collate = UnitMelCollate(tc, mel_cfg, n_tokens=cfg.n_tokens)
    val = UnitMelDataset(args.valid_filelist, mel_cfg, n_tokens=cfg.n_tokens) if args.valid_filelist else None

    rng = np.random.default_rng(args.seed)
    gstep = 0
    for epoch in range(start_epoch, args.n_epochs):
        order = rng.permutation(len(dataset))
        for i in range(0, len(order) - args.batch_size + 1, args.batch_size):
            items = [dataset[j] for j in order[i : i + args.batch_size]]
            batch = collate(items, rng)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, batch, jax.random.fold_in(key, gstep))
            gstep += 1
            if gstep % 20 == 0:
                logger.log(gstep, metrics)
                print(f"epoch {epoch} step {gstep}: loss={float(metrics['loss']):.4f}")
            if args.max_steps and gstep >= args.max_steps:
                break
        if args.max_steps and gstep >= args.max_steps:
            break
        if val is not None:
            items = [val[j] for j in range(min(len(val), args.batch_size))]
            batch = {k: jnp.asarray(v) for k, v in collate(items, rng, evaluation=True).items()}
            ev = eval_fn(state.params, batch, jax.random.PRNGKey(0))
            logger.log(gstep, ev, prefix="eval")
        if args.synthesize_every and (epoch + 1) % args.synthesize_every == 0 and len(dataset):
            # audible smoke test: synthesize the first sample's mel
            unit, mel = dataset[0]
            n = min(len(unit), 200)
            out = VB.generate(
                state.params, cfg, jnp.asarray(unit[None, :n].astype(np.int32)),
                jnp.zeros((1, cfg.n_feats, n), jnp.float32), jnp.asarray([n]),
                jax.random.PRNGKey(epoch), n_timesteps=10, solver="euler",
                gradient_scale=1.0,
            )
            logger.log(gstep, {"synth_mel_mean": float(out.mean())}, prefix="smoke")
            if vocoder is not None:
                bv_params, bv_cfg = vocoder
                from usdm_tpu.models import bigvgan as BGV

                wav = BGV.generator(bv_params, bv_cfg, out * mel_cfg.mel_std + mel_cfg.mel_mean)
                logger.log_audio(gstep, "smoke/audio", np.asarray(wav)[0, 0],
                                 mel_cfg.sampling_rate)
        if (epoch + 1) % args.save_every == 0:
            ckpt.save_train_state(ckpt_dir, state, epoch + 1)
    ckpt.save_train_state(ckpt_dir, state, args.n_epochs if not args.max_steps else gstep)
    if args.export_hub:
        # reference training saves a HubMixin dir alongside raw .pt every
        # epoch (decoder/scripts/train.py:305-318)
        ckpt.save_voicebox_hub(args.export_hub, jax.device_get(state.params), cfg)
        print(f"exported HubMixin dir: {args.export_hub}")
    logger.close()
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
