"""CLI: DailyTalk SFT (USDM phase).

Equivalent of /root/reference/src/train_sft.py: loads the USTM checkpoint,
reads `ids|labels` lines (the DailyTalk preprocessing output), pads per batch,
trains with randomized order, optional LoRA.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def read_sft_file(path: str):
    """'ids|labels' lines -> [(ids, labels)] (reference train_sft.py:29-36)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            ids_s, labels_s = line.split("|")
            out.append(([int(t) for t in ids_s.split()], [int(t) for t in labels_s.split()]))
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_dir", default=None, help="USTM checkpoint (HF dir)")
    p.add_argument("--train_path", required=True)
    p.add_argument("--eval_path", default=None)
    p.add_argument("--train_batch_size", type=int, default=2)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--num_train_epochs", type=int, default=3)
    p.add_argument("--max_steps", type=int, default=0, help="override epoch-based stopping")
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lora", action="store_true")
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--lora_alpha", type=int, default=64)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--export_hf", default=None,
                   help="after training, export final params (LoRA merged if "
                        "--lora) as an HF-Mistral dir")
    from usdm_tpu.core import distributed as D
    D.add_cli_args(p)
    args = p.parse_args(argv)
    D.initialize_from_args(args)

    import jax
    import jax.numpy as jnp

    from usdm_tpu.core import checkpoint as ckpt
    from usdm_tpu.core.config import MistralConfig, TrainConfig
    from usdm_tpu.core.logging import MetricsLogger
    from usdm_tpu.core.mesh import create_mesh
    from usdm_tpu.data.collators import sft_collate
    from usdm_tpu.models import mistral as M
    from usdm_tpu.train import lm as T
    from usdm_tpu.train import lora as LO

    key = jax.random.PRNGKey(args.seed)
    data = read_sft_file(args.train_path)
    if args.tiny:
        cfg = MistralConfig.tiny(vocab_size=512)
        base = M.init_params(cfg, key, dtype="float32")
    else:
        base, cfg = ckpt.load_mistral(args.model_dir, dtype="float32")

    steps_per_epoch = max(len(data) // args.train_batch_size, 1)
    max_steps = args.max_steps or steps_per_epoch * args.num_train_epochs
    tc = TrainConfig(learning_rate=args.learning_rate, batch_size=args.train_batch_size,
                     max_steps=max_steps, seed=args.seed, dp=args.dp, tp=args.tp)
    mesh = D.make_cli_mesh(args)
    logger = MetricsLogger(args.output_dir)
    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    pad_id = cfg.vocab_size - 1

    rng = np.random.default_rng(args.seed)

    def batches():
        while True:
            order = rng.permutation(len(data))  # RandomTrainer ordering
            for i in range(0, len(order) - args.train_batch_size + 1, args.train_batch_size):
                chunk = [data[j] for j in order[i : i + args.train_batch_size]]
                out = sft_collate(chunk, pad_id=pad_id)
                yield {k: jnp.asarray(v) for k, v in out.items()}

    it = batches()

    if args.lora:
        lora = LO.init_lora(cfg, key, r=args.lora_r, alpha=args.lora_alpha)
        step_fn, opt = LO.make_lora_train_step(cfg, tc, mesh)
        opt_state = opt.init(lora)
        base_dev = jax.device_put(base)
        for step in range(max_steps):
            lora, opt_state, metrics = step_fn(base_dev, lora, opt_state, next(it))
            if (step + 1) % args.logging_steps == 0 or step == 0:
                logger.log(step + 1, metrics)
                print(f"step {step + 1}: loss={float(metrics['loss']):.4f}")
            if (step + 1) % args.save_steps == 0 or step + 1 == max_steps:
                ckpt.save_train_state(ckpt_dir, {"lora": lora}, step + 1)
        if args.export_hf:
            from usdm_tpu.train.lora import merge_lora

            merged = merge_lora(jax.device_get(base_dev), jax.device_get(lora))
            ckpt.save_mistral_hf(args.export_hf, merged, cfg)
            print(f"exported HF dir (LoRA merged): {args.export_hf}")
    else:
        opt = T.make_optimizer(tc)
        state, shardings = T.init_state(cfg, tc, mesh, key, opt)
        state = T.TrainState(
            params=jax.device_put(jax.tree.map(lambda a: a.astype(jnp.float32), base),
                                  shardings.params),
            opt_state=state.opt_state, step=state.step,
        )
        step_fn = T.make_train_step(cfg, tc, mesh, opt)
        for step in range(max_steps):
            state, metrics = step_fn(state, next(it))
            if (step + 1) % args.logging_steps == 0 or step == 0:
                logger.log(step + 1, metrics)
                print(f"step {step + 1}: loss={float(metrics['loss']):.4f}")
            if (step + 1) % args.save_steps == 0 or step + 1 == max_steps:
                ckpt.save_train_state(ckpt_dir, state, step + 1, keep=tc.keep_checkpoints)
        if args.export_hf:
            ckpt.save_mistral_hf(
                args.export_hf,
                jax.device_get(jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                                            state.params)), cfg)
            print(f"exported HF dir: {args.export_hf}")

    logger.close()
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
