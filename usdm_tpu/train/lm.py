"""LLM training: pjit FSDP/TP trainer for the packed speech-text objective.

TPU-native replacement for the reference's HF-Trainer + DeepSpeed ZeRO-3
stack (/root/reference/src/train_pt.py:151-221, configs/ds_config_zero3_bf16.json):

  * ZeRO-3 param/optimizer sharding  ->  `NamedSharding` over the ('data',
    'model') mesh from `mistral.param_specs`; XLA inserts the all-gathers /
    reduce-scatters over ICI that DeepSpeed did over NCCL.
  * bf16 compute + fp32 master weights ->  params and Adam moments live in
    f32 shards; the forward pass casts to bf16 at use.
  * gradient checkpointing           ->  `jax.checkpoint` around each decoder
    layer inside the `lax.scan` (remat=True).
  * cosine schedule, AdamW(0.9, 0.95), wd 0.01, 3% warmup (train_pt.py:159-171)

The whole optimizer step (forward, backward, clip, update) is ONE jitted SPMD
program; nothing touches the host between steps.
"""

from __future__ import annotations

import dataclasses

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from usdm_tpu.core.config import MistralConfig, TrainConfig
from usdm_tpu.core.mesh import DATA_AXIS
from usdm_tpu.models import mistral as M


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


jax.tree_util.register_dataclass(TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[])


def make_optimizer(tc: TrainConfig, total_steps: Optional[int] = None) -> optax.GradientTransformation:
    total = total_steps or tc.max_steps
    warmup = max(int(total * tc.warmup_ratio), 1)
    if tc.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, tc.learning_rate, warmup, max(total, warmup + 1)
        )
    else:
        sched = optax.linear_schedule(tc.learning_rate, 0.0, max(total - warmup, 1), warmup)
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(sched, b1=tc.adam_b1, b2=tc.adam_b2, weight_decay=tc.weight_decay),
    )


def batch_spec() -> Dict[str, P]:
    s = P(DATA_AXIS, None)
    return {"input_ids": s, "labels": s, "segment_ids": s, "positions": s}


def state_specs(cfg: MistralConfig, opt: optax.GradientTransformation) -> TrainState:
    """PartitionSpec pytree for TrainState (opt state mirrors param specs)."""
    pspecs = M.param_specs(cfg)
    params_shape = jax.eval_shape(lambda: M.init_params(cfg, jax.random.PRNGKey(0), dtype="float32"))
    opt_shape = jax.eval_shape(opt.init, params_shape)

    def spec_like(tree_shape):
        # map every array leaf of the opt state: param-shaped leaves get the
        # param spec (by matching shapes via tree structure), scalars replicate
        flat_params, pdef = jax.tree.flatten(params_shape)
        flat_specs = jax.tree.flatten(pspecs)[0]
        shape_to_spec = {}
        for sh, sp in zip(flat_params, flat_specs):
            shape_to_spec.setdefault(sh.shape, sp)

        def one(leaf):
            return shape_to_spec.get(leaf.shape, P())

        return jax.tree.map(one, tree_shape)

    return TrainState(
        params=pspecs,
        opt_state=spec_like(opt_shape),
        step=P(),
    )


def init_state(
    cfg: MistralConfig,
    tc: TrainConfig,
    mesh: Mesh,
    key: jax.Array,
    opt: Optional[optax.GradientTransformation] = None,
) -> Tuple[TrainState, Any]:
    """Initialize params/opt-state directly sharded over the mesh (no single-
    host materialization — each device only allocates its shard)."""
    opt = opt or make_optimizer(tc)
    specs = state_specs(cfg, opt)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )

    def _init(key):
        params = M.init_params(cfg, key, dtype="float32")
        return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))

    state = jax.jit(_init, out_shardings=shardings)(key)
    return state, shardings


def make_train_step(
    cfg: MistralConfig,
    tc: TrainConfig,
    mesh: Mesh,
    opt: Optional[optax.GradientTransformation] = None,
    attn_impl: str = "auto",
):
    """Build the jitted SPMD train step: (state, batch) -> (state, metrics)."""
    opt = opt or make_optimizer(tc)
    specs = state_specs(cfg, opt)
    state_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P))
    batch_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), batch_spec(), is_leaf=lambda x: isinstance(x, P))

    def loss_fn(params, batch):
        # bf16 compute over f32 masters; norms stay f32 inside rms_norm
        p_c = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if (a.dtype == jnp.float32 and a.ndim >= 2) else a,
            params,
        )
        return M.loss_fn(
            p_c, cfg,
            batch["input_ids"], batch["labels"],
            batch.get("segment_ids"), batch.get("positions"),
            attn_impl=attn_impl, remat=tc.remat,
        )

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(new_params, new_opt, state.step + 1),
            {"loss": loss, "grad_norm": gnorm, "ntokens": aux["ntokens"]},
        )

    return jax.jit(
        step,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )


def make_eval_step(cfg: MistralConfig, tc: TrainConfig, mesh: Mesh, attn_impl: str = "auto"):
    batch_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), batch_spec(), is_leaf=lambda x: isinstance(x, P))

    def step(params, batch):
        p_c = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if (a.dtype == jnp.float32 and a.ndim >= 2) else a,
            params,
        )
        loss, aux = M.loss_fn(
            p_c, cfg, batch["input_ids"], batch["labels"],
            batch.get("segment_ids"), batch.get("positions"),
            attn_impl=attn_impl, remat=False,
        )
        return {"loss": loss, "ntokens": aux["ntokens"]}

    return jax.jit(step, in_shardings=(None, batch_sh))
