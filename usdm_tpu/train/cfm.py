"""token-Voicebox CFM trainer: data-parallel pjit over the mesh.

Replaces the reference's hand-rolled multi-node DDP loop
(/root/reference/src/decoder/scripts/train.py:48-246): rank env plumbing +
NCCL allreduce become a NamedSharding'd batch over the 'data' axis with XLA
gradient reduction; fp16 AMP + GradScaler (train.py:222-234) becomes bf16
compute over f32 masters (no scaler needed on TPU); grad-clip 0.2 and
Adam(1e-4) match config.json:33-49.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from usdm_tpu.core.config import CfmTrainConfig, VoiceboxConfig
from usdm_tpu.core.mesh import DATA_AXIS
from usdm_tpu.models import voicebox as VB


@dataclasses.dataclass
class CfmTrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


jax.tree_util.register_dataclass(
    CfmTrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)


def make_optimizer(tc: CfmTrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adam(tc.learning_rate),
    )


def batch_sharding(mesh: Mesh) -> Dict[str, NamedSharding]:
    d = lambda *rest: NamedSharding(mesh, P(DATA_AXIS, *rest))
    return {
        "x": d(None),          # [B, T] units
        "mask": d(None, None),  # [B, 1, T] context mask
        "y": d(None, None),    # [B, n_feats, T] target mel
        "y_lengths": d(),      # [B]
    }


def init_state(cfg: VoiceboxConfig, tc: CfmTrainConfig, mesh: Mesh, key: jax.Array):
    opt = make_optimizer(tc)
    repl = NamedSharding(mesh, P())

    def _init(key):
        params = VB.init_params(cfg, key)
        return CfmTrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    # CFM params are small (~350M f32); replicate (plain DP, like the
    # reference's DDP) — FSDP is unnecessary at this size.
    state = jax.jit(_init, out_shardings=repl)(key)
    return state, opt


def make_train_step(cfg: VoiceboxConfig, tc: CfmTrainConfig, mesh: Mesh,
                    opt: Optional[optax.GradientTransformation] = None,
                    compute_dtype: str = "bfloat16"):
    opt = opt or make_optimizer(tc)
    repl = NamedSharding(mesh, P())
    b_sh = batch_sharding(mesh)

    def loss_fn(params, batch, key):
        p_c = jax.tree.map(
            lambda a: a.astype(jnp.dtype(compute_dtype)) if (a.dtype == jnp.float32 and a.ndim >= 2) else a,
            params,
        )
        return VB.cfm_loss(
            p_c, cfg, batch["x"], batch["mask"].astype(jnp.float32),
            batch["y"], batch["y_lengths"], key,
        )

    def step(state: CfmTrainState, batch, key) -> Tuple[CfmTrainState, Dict[str, jnp.ndarray]]:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch, key)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            CfmTrainState(new_params, new_opt, state.step + 1),
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
        )

    return jax.jit(
        step,
        in_shardings=(repl, b_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_step(cfg: VoiceboxConfig, mesh: Mesh, compute_dtype: str = "float32"):
    repl = NamedSharding(mesh, P())
    b_sh = batch_sharding(mesh)

    def step(params, batch, key):
        loss, aux = VB.cfm_loss(
            params, cfg, batch["x"], batch["mask"].astype(jnp.float32),
            batch["y"], batch["y_lengths"], key,
        )
        return {"loss": loss}

    return jax.jit(step, in_shardings=(repl, b_sh, repl))
