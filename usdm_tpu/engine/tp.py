"""Tensor-parallel serving: explicit-collective shard_map over a device mesh.

The reference serves its 7B through vLLM tensor parallelism (SURVEY §2.3);
here TP is expressed the TPU way: a 1-D `jax.sharding.Mesh` over the 'model'
axis, attention heads / FFN / vocab split per device, and the paged
decode/prefill bodies run inside `shard_map` with psum after the row-sharded
matmuls and one all_gather for the vocab-sharded logits (collectives ride
ICI).  The Pallas paged-attention kernel runs per device on its local kv
heads — shard_map composes with manual-DMA kernels where XLA's automatic
partitioner cannot.

Constraints: num_kv_heads % tp == 0 (GQA groups stay device-local) and
intermediate_size % tp == 0.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from usdm_tpu.core.config import MistralConfig
from usdm_tpu.engine import paged as PG
from usdm_tpu.models import mistral as M

try:  # jax>=0.4.35 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

AXIS = "model"


def make_tp_mesh(tp: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())[:tp]
    if len(devices) < tp:
        raise ValueError(f"need {tp} devices for tp={tp}, have {len(devices)}")
    return Mesh(np.asarray(devices), (AXIS,))


def tp_param_specs() -> M.Params:
    """Inference-TP PartitionSpecs: heads/ffn column-split, wo/w_down
    row-split (partial sums psum'd), vocab-sharded lm_head, replicated
    embed/norms (embed is a gather; replication costs ~170 MB bf16 at 7B)."""
    col = P(None, None, AXIS)
    row = P(None, AXIS, None)
    return {
        "embed": P(None, None),
        "layers": {
            "ln1": P(None, None),
            "ln2": P(None, None),
            "wq": col, "wk": col, "wv": col,
            "wo": row,
            "w_gate": col, "w_up": col,
            "w_down": row,
        },
        "final_norm": P(None),
        "lm_head": P(None, AXIS),
    }


def _spec_tree(params: M.Params):
    """Match quantized {"q","s"} leaves: both shard like the plain weight."""
    specs = tp_param_specs()

    def expand(spec, leaf):
        if isinstance(leaf, dict) and "q" in leaf:
            # scale s is [..., 1, out] or [out]-like: shard its last dim too
            return {"q": spec, "s": P(*([None] * (leaf["s"].ndim - 1) + [spec[-1]]))}
        return spec

    return {
        "embed": specs["embed"],
        "layers": {k: expand(specs["layers"][k], params["layers"][k])
                   for k in params["layers"]},
        "final_norm": specs["final_norm"],
        "lm_head": specs["lm_head"],
    }


KV_SPEC = P(AXIS, None, None, None)  # [Hkv, L*N, P, d] pool split over kv heads


def shard_params(params: M.Params, mesh: Mesh, cfg: MistralConfig) -> M.Params:
    tp = mesh.shape[AXIS]
    if cfg.num_kv_heads % tp or cfg.intermediate_size % tp or cfg.vocab_size % tp:
        raise ValueError(
            f"tp={tp} must divide num_kv_heads={cfg.num_kv_heads}, "
            f"intermediate_size={cfg.intermediate_size}, vocab={cfg.vocab_size}"
        )
    specs = _spec_tree(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray) or hasattr(x, "shape"),
    )


def _kv_specs(kv: PG.PagedKV) -> PG.PagedKV:
    """PartitionSpec tree matching `kv`'s structure (int8 pools carry
    per-(head, token) scale arrays that shard over kv heads like the pages)."""
    sp = None if kv.k_scales is None else P(None, AXIS, None)  # [L*N, Hkv, P]
    return PG.PagedKV(KV_SPEC, KV_SPEC, sp, sp)


def shard_kv(kv: PG.PagedKV, mesh: Mesh) -> PG.PagedKV:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), kv, _kv_specs(kv))


def make_decode_step(mesh: Mesh, cfg: MistralConfig, page_size: int):
    """jitted shard_map'd paged_decode_step with the same call shape as the
    single-device one (params/kv pre-sharded; scalars replicated)."""
    rep = P()

    def run(params, kv, tokens, seq_lens, page_table, active, allow, keys,
            top_k, top_p, temp, do_sample):
        def inner(p, k, tok, sl, pt, act, al, ky, tk, tp_, tmp):
            return PG.paged_decode_step.__wrapped__(
                p, k, cfg, tok, sl, pt, act, al, page_size,
                ky, tk, tp_, tmp, do_sample, AXIS,
            )

        specs = _spec_tree(params)
        kv_specs = _kv_specs(kv)
        fn = shard_map(
            inner, mesh=mesh,
            in_specs=(specs, kv_specs, rep, rep, rep, rep, rep, rep, rep, rep, rep),
            out_specs=(rep, rep, kv_specs),
            check_vma=False,
        )
        return fn(params, kv, tokens, seq_lens, page_table, active, allow,
                  keys, top_k, top_p, temp)

    return jax.jit(run, static_argnames=("do_sample",), donate_argnums=(1,))


def make_decode_step_chained(mesh: Mesh, cfg: MistralConfig, page_size: int):
    """jitted shard_map'd paged_decode_step_chained: the TP serving path
    chains multi-token decodes exactly like the single-device engine (one
    host sync per horizon) instead of syncing per token (VERDICT r2 item 3).
    """
    rep = P()

    def run(params, kv, tokens, seq_lens, page_table, active, done, eos_ids,
            allow, keys, top_k, top_p, temp, do_sample, needs_filter):
        def inner(p, k, tok, sl, pt, act, dn, eo, al, ky, tk, tp_, tmp):
            return PG.paged_decode_step_chained.__wrapped__(
                p, k, cfg, tok, sl, pt, act, dn, eo, al, page_size,
                ky, tk, tp_, tmp, do_sample=do_sample,
                needs_filter=needs_filter, tp_axis=AXIS,
            )

        specs = _spec_tree(params)
        kv_specs = _kv_specs(kv)
        fn = shard_map(
            inner, mesh=mesh,
            in_specs=(specs, kv_specs, rep, rep, rep, rep, rep, rep, rep, rep,
                      rep, rep, rep),
            out_specs=(rep, rep, rep, rep, kv_specs),
            check_vma=False,
        )
        return fn(params, kv, tokens, seq_lens, page_table, active, done,
                  eos_ids, allow, keys, top_k, top_p, temp)

    return jax.jit(run, static_argnames=("do_sample", "needs_filter"),
                   donate_argnums=(1,))


def make_spec_accept(mesh: Mesh, cfg: MistralConfig, page_size: int):
    """jitted shard_map'd paged_spec_accept: speculative verification +
    on-device acceptance under TP (the draft runs through the TP decode step;
    acceptance math is replicated)."""
    rep = P()

    def run(params, kv, ver_in, seq_lens, done, eos_ids, page_table, active,
            allow, n_ctx_pages):
        def inner(p, k, vi, sl, dn, eo, pt, act, al):
            return PG.paged_spec_accept.__wrapped__(
                p, k, cfg, vi, sl, dn, eo, pt, act, al, page_size,
                n_ctx_pages, tp_axis=AXIS,
            )

        specs = _spec_tree(params)
        kv_specs = _kv_specs(kv)
        fn = shard_map(
            inner, mesh=mesh,
            in_specs=(specs, kv_specs, rep, rep, rep, rep, rep, rep, rep),
            out_specs=(rep, rep, rep, rep, rep, kv_specs),
            check_vma=False,
        )
        return fn(params, kv, ver_in, seq_lens, done, eos_ids, page_table,
                  active, allow)

    return jax.jit(run, static_argnames=("n_ctx_pages",), donate_argnums=(1,))


def make_ngram_round(mesh: Mesh, cfg: MistralConfig, page_size: int):
    """jitted shard_map'd paged_ngram_round: draft-free prompt-lookup
    speculation under TP.  The proposal/history math is elementwise on
    replicated arrays (identical on every device); the verify forward runs
    tensor-parallel like paged_spec_accept."""
    rep = P()

    def run(params, kv, history, cur, seq_lens, done, eos_ids, page_table,
            active, allow, n_ctx_pages, k, max_n):
        def inner(p, kvs, h, c, sl, dn, eo, pt, act, al):
            return PG.paged_ngram_round.__wrapped__(
                p, kvs, cfg, h, c, sl, dn, eo, pt, act, al, page_size,
                n_ctx_pages, k, max_n, tp_axis=AXIS,
            )

        specs = _spec_tree(params)
        kv_specs = _kv_specs(kv)
        fn = shard_map(
            inner, mesh=mesh,
            in_specs=(specs, kv_specs, rep, rep, rep, rep, rep, rep, rep, rep),
            out_specs=(rep, rep, rep, rep, rep, rep, kv_specs),
            check_vma=False,
        )
        return fn(params, kv, history, cur, seq_lens, done, eos_ids,
                  page_table, active, allow)

    return jax.jit(run, static_argnames=("n_ctx_pages", "k", "max_n"),
                   donate_argnums=(1, 2))


def make_prefill_chunk(mesh: Mesh, cfg: MistralConfig, page_size: int):
    rep = P()

    def run(params, kv, chunk_ids, start, n_valid, page_table_row,
            n_ctx_pages):
        def inner(p, k, ids, st, nv, row):
            return PG.paged_prefill_chunk.__wrapped__(
                p, k, cfg, ids, st, nv, row, page_size, n_ctx_pages, AXIS
            )

        specs = _spec_tree(params)
        kv_specs = _kv_specs(kv)
        fn = shard_map(
            inner, mesh=mesh,
            in_specs=(specs, kv_specs, rep, rep, rep, rep),
            out_specs=(rep, kv_specs),
            check_vma=False,
        )
        return fn(params, kv, chunk_ids, start, n_valid, page_table_row)

    return jax.jit(run, static_argnames=("n_ctx_pages",), donate_argnums=(1,))
