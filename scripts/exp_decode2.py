"""Decode-step ablations, round 2: chained dispatches (32 per sync) so the
tunnel dispatch floor (~1.8 ms/call measured) amortizes away, and params are
jit ARGUMENTS so zero weights cannot constant-fold.

Variants of the b=1 7B-int8 decode step (cfg geometry = production):
  full          - the shipped paged_decode_step
  no_head       - stop at final_norm (isolates lm_head+mask+argmax epilogue)
  no_attn       - attention result replaced by q (kernel + gather isolated)
  no_write      - KV DUS writes skipped
  fused         - qkv and gate|up fused into 2 matmuls (4 matmuls/layer)
  fused_nohead  - fused + no epilogue (combined ceiling)
  head_int8     - full step with int8-quantized lm_head

Writes /tmp/exp_decode2.json.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from usdm_tpu.core.config import EngineConfig, MistralConfig
from usdm_tpu.engine.paged_ops import PagedKV, paged_decode_step
from usdm_tpu.models import mistral as M
from usdm_tpu.models.quant import qmm, quantize_llm_params, quantize_weight
from usdm_tpu.ops.sampling import NEG_INF


def _zeros_like_shapes(shapes):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


@partial(jax.jit, static_argnames=("cfg", "page_size", "use_attn", "use_write",
                                   "fuse", "head"),
         donate_argnums=(1,))
def step_variant(
    params, kv, cfg, tokens, seq_lens, page_table, active, allow_masks,
    page_size, use_attn=True, use_write=True, fuse=False, head="bf16",
):
    """Ablatable copy of paged_decode_step's body (greedy path)."""
    b = tokens.shape[0]
    hd = cfg.head_dim
    h = cfg.num_heads
    hkv = cfg.num_kv_heads
    cdt = jnp.dtype(cfg.dtype)
    F = cfg.intermediate_size
    qdim = h * hd

    pos = seq_lens
    x = params["embed"].astype(cdt)[tokens][:, None, :]
    cos, sin = M.rope_tables(pos[:, None], cfg.head_dim, cfg.rope_theta)

    n_pages = kv.k_pages.shape[1] // cfg.num_layers
    page_ids = page_table[jnp.arange(b), pos // page_size]
    trash = n_pages - 1
    page_ids = jnp.where(active, page_ids, trash)
    offs = pos % page_size

    def body(carry, xs):
        x, k_pool, v_pool = carry
        lp, li = xs
        base = li * n_pages
        y = M.rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
        if fuse:
            qkv = qmm(y, lp["wqkv"])
            q = qkv[..., :qdim].reshape(b, 1, h, hd)
            kk = qkv[..., qdim:qdim + hkv * hd].reshape(b, hkv, hd)
            vv = qkv[..., qdim + hkv * hd:].reshape(b, hkv, hd)
        else:
            q = qmm(y, lp["wq"]).reshape(b, 1, h, hd)
            kk = qmm(y, lp["wk"]).reshape(b, hkv, hd)
            vv = qmm(y, lp["wv"]).reshape(b, hkv, hd)
        q = M.apply_rope(q, cos, sin)
        kk = M.apply_rope(kk[:, None], cos, sin)[:, 0]

        if use_write:
            upd_k = jnp.swapaxes(kk, 0, 1).astype(k_pool.dtype)
            upd_v = jnp.swapaxes(vv, 0, 1).astype(v_pool.dtype)
            for bi in range(b):
                at = (jnp.int32(0), base + page_ids[bi], offs[bi], jnp.int32(0))
                k_pool = jax.lax.dynamic_update_slice(k_pool, upd_k[:, bi][:, None, None, :], at)
                v_pool = jax.lax.dynamic_update_slice(v_pool, upd_v[:, bi][:, None, None, :], at)

        g = h // hkv
        qg = q[:, 0].reshape(b, hkv, g, hd)
        if use_attn:
            from usdm_tpu.ops.paged_attention import paged_decode_attention

            attn = paged_decode_attention(
                qg, k_pool, v_pool, page_table + base, pos + 1,
                sliding_window=cfg.sliding_window,
            )
            attn = attn.reshape(b, 1, h * hd)
        else:
            attn = q.reshape(b, 1, h * hd)
        x = x + qmm(attn, lp["wo"])
        y2 = M.rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
        if fuse:
            gu = qmm(y2, lp["w_gu"])
            x = x + qmm(jax.nn.silu(gu[..., :F]) * gu[..., F:], lp["w_down"])
        else:
            x = x + qmm(jax.nn.silu(qmm(y2, lp["w_gate"])) * qmm(y2, lp["w_up"]), lp["w_down"])
        return (x, k_pool, v_pool), None

    (x, new_k, new_v), _ = jax.lax.scan(
        body, (x, kv.k_pages, kv.v_pages),
        (params["layers"], jnp.arange(cfg.num_layers, dtype=jnp.int32)),
    )
    x = M.rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if head == "none":
        nxt = x[:, 0, :1].astype(jnp.float32).sum(-1).astype(jnp.int32)
    else:
        if head == "int8":
            logits = qmm(x[:, 0], params["lm_head_q"]).astype(jnp.float32)
        else:
            logits = (x[:, 0] @ params["lm_head"].astype(x.dtype)).astype(jnp.float32)
        logits = jnp.where(allow_masks, logits, NEG_INF)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    nxt = jnp.where(active, nxt, 0)
    return nxt, PagedKV(new_k, new_v)


def main():
    cfg = MistralConfig()
    params = _zeros_like_shapes(jax.eval_shape(
        lambda: quantize_llm_params(M.init_params(cfg, jax.random.PRNGKey(0)))))
    # fused + int8-head weights live alongside (same tree passed to all jits)
    lw = params["layers"]
    params["layers"] = dict(
        lw,
        wqkv={"q": jnp.concatenate([lw["wq"]["q"], lw["wk"]["q"], lw["wv"]["q"]], axis=-1),
              "s": jnp.concatenate([lw["wq"]["s"], lw["wk"]["s"], lw["wv"]["s"]], axis=-1)},
        w_gu={"q": jnp.concatenate([lw["w_gate"]["q"], lw["w_up"]["q"]], axis=-1),
              "s": jnp.concatenate([lw["w_gate"]["s"], lw["w_up"]["s"]], axis=-1)},
    )
    params["lm_head_q"] = _zeros_like_shapes(jax.eval_shape(
        partial(quantize_weight, axis=-2), params["lm_head"]))

    ecfg = EngineConfig(page_size=256, max_pages_per_seq=6, max_batch_size=1)
    b = 1
    tok = jnp.zeros(b, jnp.int32)
    lens = jnp.full(b, 1219, jnp.int32)
    table = jnp.asarray(np.arange(ecfg.max_pages_per_seq, dtype=np.int32)[None])
    act = jnp.ones(b, bool)
    allow = jnp.ones((b, cfg.vocab_size), bool)

    report = {}
    n = 32

    def run(name, **kw):
        kv = PagedKV.create(cfg, ecfg.max_pages_per_seq + 1, ecfg.page_size)
        nxt = tok
        for _ in range(4):  # warm-up/compile
            nxt, kv = step_variant(params, kv, cfg, nxt * 0, lens, table, act,
                                   allow, ecfg.page_size, **kw)
        jax.device_get(nxt)
        t0 = time.time()
        for _ in range(n):
            nxt, kv = step_variant(params, kv, cfg, nxt * 0, lens, table, act,
                                   allow, ecfg.page_size, **kw)
        jax.device_get(nxt)
        report[name] = round((time.time() - t0) / n * 1000.0, 3)
        del kv
        print(name, report[name], flush=True)

    run("full_ms")
    run("no_head_ms", head="none")
    run("no_attn_ms", use_attn=False)
    run("no_write_ms", use_write=False)
    run("fused_ms", fuse=True)
    run("fused_nohead_ms", fuse=True, head="none")
    run("head_int8_ms", head="int8")
    run("fused_int8head_ms", fuse=True, head="int8")

    print(json.dumps(report, indent=1))
    with open("/tmp/exp_decode2.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
