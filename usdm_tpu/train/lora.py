"""LoRA: low-rank adaptation for the speech-text LM.

Covers the reference's peft option (/root/reference/src/train_pt.py:142-148,
train_sft.py: --lora, r=8, alpha=64, targets q_proj/v_proj — peft's causal-LM
default for Mistral).  LoRA weights are *stacked over layers* like the base
params, so they ride the same `lax.scan`; the base stays frozen (bf16) and
only the adapters receive gradients.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from usdm_tpu.core.config import MistralConfig, TrainConfig

from usdm_tpu.models import mistral as M

Params = Dict[str, Any]

DEFAULT_TARGETS = ("wq", "wv")  # peft Mistral causal-LM default (q_proj, v_proj)


def init_lora(
    cfg: MistralConfig,
    key: jax.Array,
    r: int = 8,
    alpha: int = 64,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype: str = "float32",
) -> Params:
    """{target: {a: [L, in, r], b: [L, r, out], scale: [L]}}; A ~ N(0, 1/r),
    B = 0 (standard LoRA init: adapter starts as identity)."""
    dims = {
        "wq": (cfg.hidden_size, cfg.num_heads * cfg.head_dim),
        "wk": (cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim),
        "wv": (cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim),
        "wo": (cfg.num_heads * cfg.head_dim, cfg.hidden_size),
    }
    out: Params = {}
    keys = jax.random.split(key, len(targets))
    L = cfg.num_layers
    for k, name in zip(keys, targets):
        din, dout = dims[name]
        out[name] = {
            "a": (jax.random.normal(k, (L, din, r), jnp.float32) / (r**0.5)).astype(dtype),
            "b": jnp.zeros((L, r, dout), jnp.dtype(dtype)),
            "scale": jnp.full((L,), alpha / r, jnp.dtype(dtype)),
        }
    return out


def merge_lora(params: Params, lora: Params) -> Params:
    """Fold adapters into the base weights (for export/serving)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name, lw in lora.items():
        delta = jnp.einsum("lir,lro->lio", lw["a"], lw["b"]) * lw["scale"][:, None, None]
        layers[name] = layers[name] + delta.astype(layers[name].dtype)
    out["layers"] = layers
    return out


def count_lora_params(lora: Params) -> int:
    import numpy as np

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(lora))


def make_lora_train_step(
    cfg: MistralConfig,
    tc: TrainConfig,
    mesh: Mesh,
    opt: Optional[optax.GradientTransformation] = None,
    attn_impl: str = "auto",
):
    """(base_params, lora, opt_state, batch) -> (lora', opt_state', metrics).
    Base params are frozen (closed over as a donated const input)."""
    from usdm_tpu.train.lm import batch_spec, make_optimizer

    opt = opt or make_optimizer(tc)
    repl = NamedSharding(mesh, P())
    b_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), batch_spec(mesh), is_leaf=lambda x: isinstance(x, P))

    def loss_fn(lora, base, batch):
        return M.loss_fn(
            base, cfg, batch["input_ids"], batch["labels"],
            batch.get("segment_ids"), batch.get("positions"),
            attn_impl=attn_impl, remat=tc.remat, lora=lora,
        )

    def step(base, lora, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora, base, batch)
        updates, new_opt = opt.update(grads, opt_state, lora)
        new_lora = optax.apply_updates(lora, updates)
        return new_lora, new_opt, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, b_sh),
        out_shardings=(repl, repl, repl),
        donate_argnums=(1, 2),
    ), opt
