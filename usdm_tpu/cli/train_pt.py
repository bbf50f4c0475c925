"""CLI: interleaved speech-text pre-training (USTM phase).

TPU-native equivalent of `accelerate launch train_pt.py ...`
(/root/reference/src/train_pt.py): loads base Mistral weights, extends the
vocabulary by 10,003 speech tokens with normal(0, initializer_range) init,
trains on packed interleaved sequences with segment-isolated attention under
pjit FSDP(+TP), orbax checkpoints with resume-by-latest-step.

Data format: text files of space-separated token ids, one packed row per line
(the output of the stage-3 packer), or an HF datasets cache dir with an
`input_ids` column.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def iter_packed_rows(data_path: str):
    """Yield rows of token ids from part*.txt files or a datasets cache."""
    if os.path.isdir(data_path) and glob.glob(os.path.join(data_path, "*.txt")):
        files = sorted(glob.glob(os.path.join(data_path, "*.txt")))
        for fp in files:
            with open(fp) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        yield [int(t) for t in line.split()]
    else:
        import datasets

        ds = datasets.load_from_disk(data_path)
        if hasattr(ds, "keys") and "train" in ds:
            ds = ds["train"]
        for ex in ds:
            ids = ex["input_ids"]
            if isinstance(ids, str):
                ids = [int(t) for t in ids.split()]
            yield ids


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model_dir", default=None, help="base Mistral HF dir; random init if omitted")
    p.add_argument("--data_path", required=True)
    p.add_argument("--eval_data_path", default=None,
                   help="held-out packed rows; evaluated every --eval_steps")
    p.add_argument("--eval_steps", type=int, default=1000)
    p.add_argument("--eval_batches", type=int, default=8)
    p.add_argument("--tokenizer_dir", default=None,
                   help="tokenizer saved alongside every checkpoint "
                        "(reference EvalSaveCallback, utils.py:32-45)")
    p.add_argument("--num_unit_tokens", type=int, default=10000)
    p.add_argument("--train_batch_size", type=int, default=2)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--max_input_length", type=int, default=8192)
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--save_total_limit", type=int, default=2)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--lora", action="store_true")
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--lora_alpha", type=int, default=64)
    p.add_argument("--tiny", action="store_true", help="tiny random model (plumbing test)")
    p.add_argument("--offload", action="store_true",
                   help="Adam moments in pinned host memory (ZeRO offload analog; "
                        "needed for 7B on v5e-8 — see docs/MEMORY.md)")
    p.add_argument("--export_hf", default=None,
                   help="after training, export the final params as an "
                        "HF-Mistral dir (loadable by our inference CLIs and "
                        "any HF-layout consumer)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace for the first N steps")
    from usdm_tpu.core import distributed as D
    D.add_cli_args(p)
    args = p.parse_args(argv)
    D.initialize_from_args(args)

    import jax
    import jax.numpy as jnp

    from usdm_tpu.core import checkpoint as ckpt
    from usdm_tpu.core.config import MistralConfig, TokenSpace, TrainConfig
    from usdm_tpu.core.logging import MetricsLogger, profile_trace
    from usdm_tpu.core.mesh import create_mesh
    from usdm_tpu.data.collators import pack_collate
    from usdm_tpu.models import mistral as M
    from usdm_tpu.train import lm as T

    key = jax.random.PRNGKey(args.seed)

    if args.tiny:
        cfg = MistralConfig.tiny(vocab_size=512)
        base = None
    elif args.model_dir:
        base, cfg = ckpt.load_mistral(args.model_dir, dtype="float32")
        ts = TokenSpace(base_vocab_size=cfg.vocab_size, num_units=args.num_unit_tokens)
        base = M.extend_embeddings(base, cfg, ts.vocab_size, key)
        cfg = cfg.replace(vocab_size=ts.vocab_size)
    else:
        cfg = MistralConfig()
        base = None

    tc = TrainConfig(
        learning_rate=args.learning_rate, warmup_ratio=args.warmup_ratio,
        batch_size=args.train_batch_size, max_steps=args.max_steps,
        seed=args.seed, dp=args.dp, tp=args.tp,
        save_every=args.save_steps, keep_checkpoints=args.save_total_limit,
    )

    mesh = D.make_cli_mesh(args)
    # replica (multi-slice) replication doesn't change per-chip param memory;
    # the budget depends on the intra-slice (data, model) factors only
    budget = T.memory_budget(cfg, dp=mesh.shape["data"], tp=mesh.shape["model"],
                             seq_len=args.max_input_length,
                             batch_per_chip=max(tc.batch_size // mesh.shape["data"], 1),
                             offload=args.offload)
    print(f"memory budget: device {budget['device_gb']:.2f} GB"
          f" host {budget['host_gb']:.2f} GB (fits 16GB: {budget['fits']})")
    if not budget["fits"] and not args.offload and not args.tiny:
        print("[warning] layout exceeds a v5e chip's HBM — consider --offload or more chips"
              " (docs/MEMORY.md)")

    opt = T.make_optimizer(tc)
    if args.offload:
        state, shardings = T.init_offload_state(cfg, tc, mesh, key)
    else:
        state, shardings = T.init_state(cfg, tc, mesh, key, opt)
    if base is not None:
        state = T.TrainState(
            params=jax.device_put(jax.tree.map(lambda a: a.astype(jnp.float32), base),
                                  shardings.params),
            opt_state=state.opt_state, step=state.step,
        )

    start_step = 0
    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    if args.resume:
        latest = ckpt.latest_step(ckpt_dir)
        if latest is not None:
            print(f"resuming from step {latest}")
            state = ckpt.restore_train_state(ckpt_dir, state, latest)
            start_step = latest
        else:
            print(f"[warning] no checkpoints under {ckpt_dir}")

    step_fn = (T.make_offload_train_step(cfg, tc, mesh) if args.offload
               else T.make_train_step(cfg, tc, mesh, opt))
    eval_fn = T.make_eval_step(cfg, tc, mesh) if args.eval_data_path else None
    logger = MetricsLogger(args.output_dir)

    tokenizer = None
    if args.tokenizer_dir:
        from usdm_tpu.core.tokenizer import UsdmTokenizer

        tokenizer = UsdmTokenizer.load(args.tokenizer_dir, num_units=args.num_unit_tokens)

    def save_ckpt(step):
        ckpt.save_train_state(ckpt_dir, state, step, keep=tc.keep_checkpoints)
        if tokenizer is not None:
            # tokenizer per checkpoint (reference EvalSaveCallback.on_save)
            tokenizer.save(os.path.join(ckpt_dir, f"tokenizer-{step}"))

    last_eval = [-1]

    def run_eval(step):
        if eval_fn is None or last_eval[0] == step:
            return
        last_eval[0] = step
        rows_it = iter_packed_rows(args.eval_data_path)
        losses, toks = [], 0
        for _ in range(args.eval_batches):
            batch_rows = []
            try:
                for _ in range(tc.batch_size):
                    batch_rows.append(next(rows_it)[: args.max_input_length])
            except StopIteration:
                break
            out = pack_collate(batch_rows, pad_id=pad_id)
            m = eval_fn(state.params, {k: jnp.asarray(v) for k, v in out.items()})
            losses.append(float(m["loss"]))
            toks += int(m["ntokens"])
        if losses:
            logger.log(step, {"loss": float(np.mean(losses)), "ntokens": toks}, prefix="eval")
            print(f"eval @ {step}: loss={np.mean(losses):.4f}")

    rows = iter_packed_rows(args.data_path)
    pad_id = cfg.vocab_size - 1

    def next_batch():
        batch_rows = []
        nonlocal rows
        while len(batch_rows) < tc.batch_size:
            try:
                r = next(rows)
            except StopIteration:
                rows = iter_packed_rows(args.data_path)  # next epoch
                r = next(rows)
            batch_rows.append(r[: args.max_input_length])
        out = pack_collate(batch_rows, pad_id=pad_id, pad_to=None)
        return {k: jnp.asarray(v) for k, v in out.items()}

    with profile_trace(os.path.join(args.output_dir, "trace"), args.profile_steps > 0):
        for step in range(start_step, args.max_steps):
            batch = next_batch()
            state, metrics = step_fn(state, batch)
            if args.profile_steps and step - start_step + 1 == args.profile_steps:
                jax.block_until_ready(metrics["loss"])
                break
            if (step + 1) % args.logging_steps == 0 or step == start_step:
                logger.log(step + 1, metrics)
                print(f"step {step + 1}: loss={float(metrics['loss']):.4f} "
                      f"gnorm={float(metrics['grad_norm']):.3f}")
            if (step + 1) % args.eval_steps == 0:
                run_eval(step + 1)
            if (step + 1) % tc.save_every == 0:
                save_ckpt(step + 1)

    run_eval(args.max_steps)
    save_ckpt(args.max_steps)
    if args.export_hf:
        # reference training emits HF-layout checkpoints (HF Trainer +
        # stage3_gather_16bit_weights_on_model_save); this closes the loop so
        # our trained weights feed our own (or any HF) inference directly
        ckpt.save_mistral_hf(args.export_hf, jax.device_get(state.params), cfg,
                             tokenizer=tokenizer)
        print(f"exported HF dir: {args.export_hf}")
    logger.close()
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
