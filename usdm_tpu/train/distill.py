"""Draft-model distillation for speculative decoding.

Speculative decoding is output-lossless for any draft, but its speedup is
acceptance-bound: the measured ceiling is 169 tok/s with a 0.1B draft at
100% agreement vs 86 plain, and the floor is 30 tok/s with a worthless one
(docs/STATUS.md) — so a draft is only worth running if its greedy argmax
usually matches the target's.  The reference stack rides vLLM, where
speculative serving likewise needs a separately-provided small model
(/root/reference/src/inference_vllm.py:109 serves without one); this module
is the missing trainer: it distills the target's next-token distribution
into a small Mistral with the same tokenizer/vocab.

Design:
  * init from the target's own first N layers (`init_draft_from_target`) —
    the training-free early-exit self-draft (models/quant.py) as a warm
    start — or from scratch.
  * loss = tau^2 * KL(target || draft) at temperature tau (Hinton
    distillation), or plain CE against the target argmax (`mode="top1"`,
    directly the greedy-acceptance objective), over positions labeled for
    training (labels != -100, the packed-PT convention).
  * both [T, vocab] logit tensors are computed chunk-by-chunk under
    jax.checkpoint (the loss_fn ce_chunk trick, models/mistral.py:253-279),
    so distilling against a 42k vocab never materializes full logits.
  * `agree` (argmax match rate on labeled positions) is logged every step —
    it is the direct predictor of speculative acceptance.

One jitted SPMD program per step; the target forward runs under
stop_gradient with the serving int8 weights (qmm handles quantized leaves),
so a 7B target + 1B draft fit one chip.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from usdm_tpu.core.config import MistralConfig, TrainConfig
from usdm_tpu.models import mistral as M
from usdm_tpu.train.lm import TrainState, batch_spec, state_specs


def init_draft_from_target(
    params: dict, cfg: MistralConfig, n_layers: int
) -> Tuple[dict, MistralConfig]:
    """Early-exit warm start: a draft made of the target's first `n_layers`
    decoder layers plus its embed/final-norm/lm_head, as trainable f32
    copies (unlike models.quant.early_exit_draft, which shares the target's
    leaves for inference).  Quantized {"q","s"} leaves are dequantized."""
    from usdm_tpu.models.quant import dequantize_weight

    def deq(leaf):
        if isinstance(leaf, dict) and "q" in leaf:
            return dequantize_weight(leaf, jnp.float32)
        # jnp.array copies: astype on an f32 leaf would ALIAS the target's
        # buffer, and the train step donates the draft state while the target
        # rides along as an argument (f(donate(a), a) => runtime error)
        return jnp.array(leaf, jnp.float32)

    layers = {}
    for name, leaf in params["layers"].items():
        if isinstance(leaf, dict) and "q" in leaf:  # slice, then dequantize
            leaf = {k: v[:n_layers] for k, v in leaf.items()}
        else:
            leaf = leaf[:n_layers]
        layers[name] = deq(leaf)
    draft = {
        "embed": deq(params["embed"]),
        "layers": layers,
        "final_norm": deq(params["final_norm"]),
        "lm_head": deq(params["lm_head"]),
    }
    return draft, cfg.replace(num_layers=n_layers)


def distill_loss_fn(
    draft_params: dict,
    target_params: dict,
    cfg_d: MistralConfig,
    cfg_t: MistralConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    temperature: float = 1.0,
    mode: str = "kl",
    chunk: int = 512,
    attn_impl: str = "auto",
    remat: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Distillation loss + argmax-agreement on one packed batch."""
    ids, labels = batch["input_ids"], batch["labels"]
    seg = batch.get("segment_ids")
    pos = batch.get("positions")

    ht = jax.lax.stop_gradient(
        M.forward_hidden(target_params, cfg_t, ids, seg, pos, attn_impl, remat=False))
    dp_c = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if (a.dtype == jnp.float32 and a.ndim >= 2) else a,
        draft_params)
    hd = M.forward_hidden(dp_c, cfg_d, ids, seg, pos, attn_impl, remat=remat)

    # both models predict position i+1 from prefix <= i; align on [:, :-1]
    sht = ht[:, :-1].astype(jnp.bfloat16)
    shd = hd[:, :-1]
    valid = labels[:, 1:] != -100
    n = jnp.maximum(valid.sum(), 1)
    wt = target_params["lm_head"].astype(sht.dtype)
    wd = dp_c["lm_head"].astype(shd.dtype)
    tau = jnp.float32(temperature)

    b, t1, _ = sht.shape
    pad = (-t1) % chunk
    nc = (t1 + pad) // chunk
    pad3 = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0)))  # noqa: E731
    shtc = pad3(sht).reshape(b, nc, chunk, -1).swapaxes(0, 1)
    shdc = pad3(shd).reshape(b, nc, chunk, -1).swapaxes(0, 1)
    vc = jnp.pad(valid, ((0, 0), (0, pad))).reshape(b, nc, chunk).swapaxes(0, 1)

    @jax.checkpoint
    def chunk_terms(args):
        hct, hcd, v = args
        zt = (hct @ wt).astype(jnp.float32) / tau
        zd = (hcd @ wd).astype(jnp.float32) / tau
        lpt = jax.nn.log_softmax(zt, axis=-1)
        lpd = jax.nn.log_softmax(zd, axis=-1)
        top_t = jnp.argmax(zt, axis=-1)
        agree = ((top_t == jnp.argmax(zd, axis=-1)) * v).sum()
        if mode == "top1":
            tok = jnp.take_along_axis(lpd, top_t[..., None], axis=-1)[..., 0]
            return (-tok * v).sum(), agree
        kl = (jnp.exp(lpt) * (lpt - lpd)).sum(-1)
        return (kl * v).sum(), agree

    sums, agrees = jax.lax.map(chunk_terms, (shtc, shdc, vc))
    scale = tau * tau if mode == "kl" else 1.0
    loss = scale * sums.sum() / n
    return loss, {"loss": loss, "agree": agrees.sum() / n, "ntokens": valid.sum()}


def make_distill_step(
    cfg_d: MistralConfig,
    cfg_t: MistralConfig,
    tc: TrainConfig,
    mesh: Mesh,
    opt: Optional[optax.GradientTransformation] = None,
    *,
    temperature: float = 1.0,
    mode: str = "kl",
    chunk: int = 512,
    attn_impl: str = "auto",
):
    """Jitted SPMD distill step: (state, target_params, batch) -> (state, metrics).

    The draft's TrainState shards like the LM trainer (FSDP specs); the
    target's weights pass through with whatever (usually replicated serving)
    layout they arrived in."""
    from usdm_tpu.train.lm import make_optimizer

    opt = opt or make_optimizer(tc)
    specs = state_specs(cfg_d, opt)
    state_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                            is_leaf=lambda x: isinstance(x, P))
    batch_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), batch_spec(),
                            is_leaf=lambda x: isinstance(x, P))

    def loss_fn(dparams, tparams, batch):
        return distill_loss_fn(
            dparams, tparams, cfg_d, cfg_t, batch,
            temperature=temperature, mode=mode, chunk=chunk,
            attn_impl=attn_impl, remat=tc.remat)

    def step(state: TrainState, tparams, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, tparams, batch)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt, state.step + 1),
            {"loss": loss, "agree": aux["agree"],
             "grad_norm": optax.global_norm(grads), "ntokens": aux["ntokens"]},
        )

    return jax.jit(
        step,
        in_shardings=(state_sh, None, batch_sh),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
