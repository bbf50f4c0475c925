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
import numpy as np
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


@dataclasses.dataclass
class AdamWState:
    """Manual AdamW moments for the host-offload path (ZeRO CPU-offload
    analog, reference configs/ds_config_zero3_bf16.json:5-16).  Kept as a
    params-shaped pytree so each leaf can be streamed host<->HBM
    independently."""

    m: Any
    v: Any
    count: jnp.ndarray


jax.tree_util.register_dataclass(AdamWState, data_fields=["m", "v", "count"], meta_fields=[])


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


def batch_spec(mesh: Optional[Mesh] = None) -> Dict[str, P]:
    """Batch rows shard over `data` — and, on a multi-slice (replica, data,
    model) mesh (core.mesh.create_dcn_mesh), over (replica, data): each slice
    takes a contiguous batch block, so the only cross-slice (DCN) collective
    the train step needs is the per-step gradient all-reduce."""
    from usdm_tpu.core.mesh import REPLICA_AXIS

    axes: Any = DATA_AXIS
    if mesh is not None and REPLICA_AXIS in mesh.axis_names:
        axes = (REPLICA_AXIS, DATA_AXIS)
    s = P(axes, None)
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


def manual_adamw_update(params, grads, st: AdamWState, sched, tc: TrainConfig,
                        place_in=None, place_out=None):
    """One AdamW step, leaf by leaf, numerically matching
    `make_optimizer` (clip_by_global_norm -> optax.adamw(sched)).

    `place_in(leaf, path)` / `place_out(leaf, path)` hooks move each moment
    leaf between memory spaces (pinned_host <-> HBM) so only one leaf's
    moments are device-resident at a time — the streaming that makes
    host offload a capacity win rather than a relabeling.
    """
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, tc.grad_clip / jnp.maximum(gnorm, 1e-12))
    c = st.count
    lr = sched(c)
    c1 = c + 1
    bc1 = 1.0 - tc.adam_b1 ** c1.astype(jnp.float32)
    bc2 = 1.0 - tc.adam_b2 ** c1.astype(jnp.float32)

    flat_p, tdef = jax.tree.flatten(params)
    flat_g = jax.tree.flatten(grads)[0]
    flat_m = jax.tree.flatten(st.m)[0]
    flat_v = jax.tree.flatten(st.v)[0]

    new_p, new_m, new_v = [], [], []
    for i, (p, g, m, v) in enumerate(zip(flat_p, flat_g, flat_m, flat_v)):
        if place_in is not None:
            m, v = place_in(m, i), place_in(v, i)
        g = g * scale
        m = tc.adam_b1 * m + (1.0 - tc.adam_b1) * g
        v = tc.adam_b2 * v + (1.0 - tc.adam_b2) * (g * g)
        update = (m / bc1) / (jnp.sqrt(v / bc2) + 1e-8) + tc.weight_decay * p
        new_p.append(p - lr * update)
        if place_out is not None:
            m, v = place_out(m, i), place_out(v, i)
        new_m.append(m)
        new_v.append(v)

    return (
        jax.tree.unflatten(tdef, new_p),
        AdamWState(jax.tree.unflatten(tdef, new_m), jax.tree.unflatten(tdef, new_v), c1),
        gnorm,
    )


def offload_state_specs(cfg: MistralConfig) -> TrainState:
    pspecs = M.param_specs(cfg)
    return TrainState(params=pspecs, opt_state=AdamWState(m=pspecs, v=pspecs, count=P()), step=P())


def _offload_shardings(cfg: MistralConfig, mesh: Mesh):
    """(state shardings with pinned_host moments, flat list of host moment
    shardings in tree order)."""
    specs = offload_state_specs(cfg)
    sh = jax.tree.map(lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P))
    host_m = jax.tree.map(lambda s: s.with_memory_kind("pinned_host"), sh.opt_state.m)
    host_v = jax.tree.map(lambda s: s.with_memory_kind("pinned_host"), sh.opt_state.v)
    state_sh = TrainState(
        params=sh.params,
        opt_state=AdamWState(m=host_m, v=host_v, count=sh.opt_state.count),
        step=sh.step,
    )
    return state_sh, jax.tree.flatten(host_m)[0]


def init_offload_state(cfg: MistralConfig, tc: TrainConfig, mesh: Mesh, key: jax.Array,
                       total_steps: Optional[int] = None) -> Tuple[TrainState, Any]:
    """Like init_state but Adam moments live in pinned host memory
    (TPU-only: the CPU backend cannot execute memory-kind annotations)."""
    state_sh, _ = _offload_shardings(cfg, mesh)

    def _init(key):
        params = M.init_params(cfg, key, dtype="float32")
        zeros = jax.tree.map(jnp.zeros_like, params)
        return TrainState(
            params=params,
            opt_state=AdamWState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                                 count=jnp.zeros((), jnp.int32)),
            step=jnp.zeros((), jnp.int32),
        )

    state = jax.jit(_init, out_shardings=state_sh)(key)
    return state, state_sh


def make_offload_train_step(
    cfg: MistralConfig,
    tc: TrainConfig,
    mesh: Mesh,
    total_steps: Optional[int] = None,
    attn_impl: str = "auto",
):
    """FSDP train step with AdamW moments offloaded to pinned host memory.

    Covers the reference's DeepSpeed ZeRO-3 offload_optimizer
    (configs/ds_config_zero3_bf16.json:5-16): v5e chips have 16 GB HBM, and
    full-7B f32 masters + f32 moments + grads do not fit at dp=8
    (see `memory_budget` / docs/MEMORY.md).  Moments stream leaf-by-leaf
    HBM<->host inside the one jitted program; XLA overlaps the PCIe DMAs with
    the next leaf's update."""
    total = total_steps or tc.max_steps
    warmup = max(int(total * tc.warmup_ratio), 1)
    if tc.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(0.0, tc.learning_rate, warmup, max(total, warmup + 1))
    else:
        sched = optax.linear_schedule(tc.learning_rate, 0.0, max(total - warmup, 1), warmup)

    state_sh, host_m_flat = _offload_shardings(cfg, mesh)
    batch_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), batch_spec(mesh), is_leaf=lambda x: isinstance(x, P))
    dev_flat = [s.with_memory_kind("device") for s in host_m_flat]

    def loss_fn(params, batch):
        p_c = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if (a.dtype == jnp.float32 and a.ndim >= 2) else a,
            params,
        )
        return M.loss_fn(
            p_c, cfg, batch["input_ids"], batch["labels"],
            batch.get("segment_ids"), batch.get("positions"),
            attn_impl=attn_impl, remat=tc.remat, ce_chunk=tc.ce_chunk,
        )

    def step(state: TrainState, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        new_params, new_opt, gnorm = manual_adamw_update(
            state.params, grads, state.opt_state, sched, tc,
            place_in=lambda leaf, i: jax.device_put(leaf, dev_flat[i]),
            place_out=lambda leaf, i: jax.device_put(leaf, host_m_flat[i]),
        )
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
    batch_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), batch_spec(mesh), is_leaf=lambda x: isinstance(x, P))

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
            attn_impl=attn_impl, remat=tc.remat, ce_chunk=tc.ce_chunk,
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


def memory_budget(
    cfg: MistralConfig,
    dp: int = 8,
    tp: int = 1,
    seq_len: int = 8192,
    batch_per_chip: int = 1,
    offload: bool = False,
    hbm_gb: float = 16.0,
    ce_chunk: int = 1024,
) -> Dict[str, float]:
    """Per-chip training memory arithmetic (GB) for the FSDP/TP layout.

    The reference fits 7B on 8x A100-40GB only with DeepSpeed ZeRO-3 +
    optimizer offload (configs/ds_config_zero3_bf16.json); a v5e chip has
    16 GB HBM, so this is the fits/doesn't-fit check behind
    `make_offload_train_step`.  Documented in docs/MEMORY.md; asserted by
    __graft_entry__.dryrun_multichip.

    Calibrated against `compiled.memory_analysis()` on the real chip
    (scripts/validate_memory_budget.py): logits carry ~12 bytes/element
    through fwd+bwd (f32 logits + grad + softmax temps), and with the
    seq-chunked cross-entropy (models.mistral.loss_fn ce_chunk) only one
    chunk's logits are ever live; per-layer temps are the modeled
    grads + bf16 copy + 2-byte activation checkpoints.  The model tracks
    XLA within ~15% (conservative side) across layer/seq sweeps.
    """
    axis_size = {"data": dp, "model": tp}

    def shard_factor(spec: P) -> int:
        f = 1
        for part in spec:
            if part is None:
                continue
            for ax in part if isinstance(part, tuple) else (part,):
                f *= axis_size[ax]
        return f

    params_shape = jax.eval_shape(lambda: M.init_params(cfg, jax.random.PRNGKey(0), dtype="float32"))
    flat_p = jax.tree.flatten(params_shape)[0]
    flat_s = jax.tree.flatten(M.param_specs(cfg))[0]
    shard_bytes = [int(np.prod(l.shape)) * 4 // shard_factor(s) for l, s in zip(flat_p, flat_s)]

    gb = 1 / (1 << 30)
    masters = sum(shard_bytes) * gb                    # f32 masters (sharded)
    grads = masters                                    # f32 grads, same layout
    moments = 2.0 * masters                            # Adam m + v
    bf16_copy = masters / 2.0                          # cast tree for compute
    # remat checkpoints one hidden per layer (bf16); logits are ~12 B/elem
    # through fwd+bwd (measured), but the chunked CE keeps only one
    # ce_chunk-token slice of them live at a time
    acts = cfg.num_layers * batch_per_chip * seq_len * cfg.hidden_size * 2 * gb
    logits_tokens = min(seq_len, ce_chunk) if ce_chunk else seq_len
    logits = batch_per_chip * logits_tokens * cfg.vocab_size * 12 * gb
    # offload streams one leaf's moments at a time: m+v+update of the largest
    streamed = 3 * max(shard_bytes) * gb if offload else 0.0

    # fwd/bwd and the optimizer update don't coexist; HBM peak is the larger
    # phase.  Moments are HBM-resident throughout unless offloaded.
    resident = masters + (0.0 if offload else moments)
    fwd_bwd_peak = resident + bf16_copy + acts + logits + grads
    update_peak = resident + grads + streamed
    device = max(fwd_bwd_peak, update_peak)
    host = moments if offload else 0.0
    return {
        "masters_gb": masters, "grads_gb": grads, "moments_gb": moments,
        "bf16_copy_gb": bf16_copy, "activations_gb": acts, "logits_gb": logits,
        "streamed_gb": streamed, "fwd_bwd_peak_gb": fwd_bwd_peak,
        "update_peak_gb": update_peak,
        "device_gb": device, "host_gb": host,
        "hbm_gb": hbm_gb, "fits": device <= 0.9 * hbm_gb,  # 10% allocator slack
    }


def make_eval_step(cfg: MistralConfig, tc: TrainConfig, mesh: Mesh, attn_impl: str = "auto"):
    batch_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), batch_spec(mesh), is_leaf=lambda x: isinstance(x, P))

    def step(params, batch):
        p_c = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if (a.dtype == jnp.float32 and a.ndim >= 2) else a,
            params,
        )
        loss, aux = M.loss_fn(
            p_c, cfg, batch["input_ids"], batch["labels"],
            batch.get("segment_ids"), batch.get("positions"),
            attn_impl=attn_impl, remat=False, ce_chunk=tc.ce_chunk,
        )
        return {"loss": loss, "ntokens": aux["ntokens"]}

    return jax.jit(step, in_shardings=(None, batch_sh))
