"""CLI: distill a speculative-decoding draft model from a USDM target.

The serving engine's speculative decoding (engine/paged.py) is lossless for
any draft but only pays off when the draft's greedy argmax agrees with the
target's (~2.3 tokens/round breakeven, docs/STATUS.md).  The reference
ships no draft model; this trains one: a small Mistral (the target's first
N layers as warm start, or random) distilled against the target's own
next-token distribution on packed training rows — then served with
`--draft_dir` on infer/serve.

Data format matches train_pt: part*.txt of space-separated ids or an HF
datasets cache dir.  Every logged step reports `agree`, the argmax match
rate that directly predicts speculative acceptance.

Usage:
  python -m usdm_tpu.cli.train_draft --output_dir out --model_dir TARGET \\
      --data_path packed/ --draft_layers 8 --max_steps 2000 \\
      --export_hf out/draft_hf
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_dir", default=None,
                   help="target checkpoint (HF-Mistral dir); random 7B if omitted")
    p.add_argument("--data_path", required=True)
    p.add_argument("--draft_layers", type=int, default=8,
                   help="draft depth; init copies the target's first N layers")
    p.add_argument("--init", choices=["early-exit", "random"], default="early-exit")
    p.add_argument("--mode", choices=["kl", "top1"], default="kl",
                   help="kl: Hinton distillation at --temperature; top1: CE "
                        "against the target argmax (the greedy-acceptance "
                        "objective)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--quantize_target", action="store_true",
                   help="run the target forward in int8 serving mode "
                        "(fits 7B target + draft training on one chip)")
    p.add_argument("--train_batch_size", type=int, default=2)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--max_input_length", type=int, default=4096)
    p.add_argument("--chunk", type=int, default=512,
                   help="sequence chunk for the dual-logits loss (neither "
                        "model's full [T, vocab] logits materialize)")
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--save_total_limit", type=int, default=2)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random target (plumbing test)")
    p.add_argument("--export_hf", default=None,
                   help="after training, export the draft as an HF-Mistral "
                        "dir, ready for --draft_dir on serve/infer")
    from usdm_tpu.core import distributed as dist
    dist.add_cli_args(p)
    args = p.parse_args(argv)
    dist.initialize_from_args(args)

    import jax
    import jax.numpy as jnp

    from usdm_tpu.core import checkpoint as ckpt
    from usdm_tpu.core.config import MistralConfig, TrainConfig
    from usdm_tpu.core.logging import MetricsLogger
    from usdm_tpu.data.collators import pack_collate
    from usdm_tpu.models import mistral as M
    from usdm_tpu.train import distill as D
    from usdm_tpu.train import lm as T
    from usdm_tpu.cli.train_pt import iter_packed_rows

    key = jax.random.PRNGKey(args.seed)

    if args.tiny:
        cfg_t = MistralConfig.tiny(vocab_size=512)
        target = M.init_params(cfg_t, key, dtype="float32")
    elif args.model_dir:
        target, cfg_t = ckpt.load_mistral(args.model_dir, dtype="bfloat16")
    else:
        cfg_t = MistralConfig()
        target = M.init_params(cfg_t, key)
    if args.quantize_target:
        from usdm_tpu.models.quant import quantize_llm_params

        target = jax.jit(quantize_llm_params)(target)

    n_layers = min(args.draft_layers, cfg_t.num_layers)
    if args.init == "early-exit":
        draft, cfg_d = D.init_draft_from_target(target, cfg_t, n_layers)
    else:
        cfg_d = cfg_t.replace(num_layers=n_layers)
        draft = M.init_params(cfg_d, jax.random.fold_in(key, 1), dtype="float32")

    tc = TrainConfig(
        learning_rate=args.learning_rate, warmup_ratio=args.warmup_ratio,
        batch_size=args.train_batch_size, max_steps=args.max_steps,
        seed=args.seed, dp=args.dp, tp=args.tp,
        save_every=args.save_steps, keep_checkpoints=args.save_total_limit,
    )
    mesh = dist.make_cli_mesh(args)
    opt = T.make_optimizer(tc)
    state, shardings = T.init_state(cfg_d, tc, mesh, key, opt)
    state = T.TrainState(
        params=jax.device_put(draft, shardings.params),
        opt_state=state.opt_state, step=state.step)
    del draft

    start_step = 0
    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    if args.resume:
        latest = ckpt.latest_step(ckpt_dir)
        if latest is not None:
            print(f"resuming from step {latest}")
            state = ckpt.restore_train_state(ckpt_dir, state, latest)
            start_step = latest

    step_fn = D.make_distill_step(
        cfg_d, cfg_t, tc, mesh, opt,
        temperature=args.temperature, mode=args.mode, chunk=args.chunk)
    logger = MetricsLogger(args.output_dir)

    rows = iter_packed_rows(args.data_path)
    pad_id = cfg_t.vocab_size - 1

    def next_batch():
        nonlocal rows
        batch_rows = []
        while len(batch_rows) < tc.batch_size:
            try:
                r = next(rows)
            except StopIteration:
                rows = iter_packed_rows(args.data_path)  # next epoch
                r = next(rows)
            batch_rows.append(r[: args.max_input_length])
        out = pack_collate(batch_rows, pad_id=pad_id, pad_to=None)
        return {k: jnp.asarray(v) for k, v in out.items()}

    for step in range(start_step, args.max_steps):
        state, metrics = step_fn(state, target, next_batch())
        if (step + 1) % args.logging_steps == 0 or step == start_step:
            logger.log(step + 1, metrics)
            print(f"step {step + 1}: loss={float(metrics['loss']):.4f} "
                  f"agree={float(metrics['agree']):.3f}")
        if (step + 1) % tc.save_every == 0:
            ckpt.save_train_state(ckpt_dir, state, step + 1, keep=tc.keep_checkpoints)

    ckpt.save_train_state(ckpt_dir, state, args.max_steps, keep=tc.keep_checkpoints)
    if args.export_hf:
        ckpt.save_mistral_hf(args.export_hf, jax.device_get(state.params), cfg_d)
        print(f"exported draft HF dir: {args.export_hf}")
    logger.close()
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
