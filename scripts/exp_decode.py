"""Decode-step ablations on one TPU chip: where do the 11.5 ms go?

Times variants of the 7B-int8 b=1 paged decode step built from the production
building blocks, each hard-synced via jax.device_get:

  full        - paged_decode_step as shipped
  no_lm_head  - stop at final_norm (isolates the bf16 lm_head matmul)
  no_attn     - attention replaced by zeros (isolates the paged kernel)
  mm_only     - just the 7 per-layer qmm matmuls in a scan (weight-read floor)
  mm_fused    - 4 fused matmuls per layer (qkv | wo | gate+up | down)
  lm_head     - the lone [1,4096]x[4096,42004] bf16 matmul
  lm_head_q   - the same matmul int8-quantized

Writes /tmp/exp_decode.json.
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


def timeit(fn, *args, n=32, **kw):
    out = fn(*args, **kw)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.time() - t0) / n * 1000.0


def main():
    cfg = MistralConfig()
    params = _zeros_like_shapes(jax.eval_shape(
        lambda: quantize_llm_params(M.init_params(cfg, jax.random.PRNGKey(0)))))
    ecfg = EngineConfig(page_size=256, max_pages_per_seq=6, max_batch_size=1)
    kv = PagedKV.create(cfg, ecfg.max_pages_per_seq + 1, ecfg.page_size)
    report = {}

    b = 1
    tok = jnp.zeros(b, jnp.int32)
    lens = jnp.full(b, 1219, jnp.int32)
    table = jnp.asarray(np.arange(ecfg.max_pages_per_seq, dtype=np.int32)[None])
    act = jnp.ones(b, bool)
    allow = jnp.ones((b, cfg.vocab_size), bool)
    keys = jnp.zeros((b, 2), jnp.uint32)
    ones_i = jnp.ones(b, jnp.int32)
    ones_f = jnp.ones(b, jnp.float32)

    # paged_decode_step donates kv: thread it through the timing loop
    def run_full(kv, n):
        nxt = tok
        for _ in range(n):
            nxt, _, kv = paged_decode_step(params, kv, cfg, nxt, lens, table, act,
                                           allow, ecfg.page_size, keys, ones_i,
                                           ones_f, ones_f)
        jax.device_get(nxt)
        return kv

    kv = run_full(kv, 2)  # warm-up/compile
    n = 32
    t0 = time.time()
    kv = run_full(kv, n)
    report["full_ms"] = round((time.time() - t0) / n * 1000.0, 3)

    # ---- layer-stack variants (no KV write, no attention) ----
    hd, h, hkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads

    @jax.jit
    def mm_only(x):
        def body(x, lp):
            y = M.rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
            q = qmm(y, lp["wq"])
            k = qmm(y, lp["wk"])
            v = qmm(y, lp["wv"])
            attn = q + jnp.tile(k + v, (1, 1, h // hkv))
            x = x + qmm(attn, lp["wo"])
            y = M.rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
            x = x + qmm(jax.nn.silu(qmm(y, lp["w_gate"])) * qmm(y, lp["w_up"]), lp["w_down"])
            return x, None
        x, _ = jax.lax.scan(body, x, params["layers"])
        return x

    x0 = jnp.zeros((b, 1, cfg.hidden_size), jnp.bfloat16)
    report["mm_only_ms"] = round(timeit(mm_only, x0), 3)

    # fused weights: qkv [D, (h+2hkv)*hd], gate_up [D, 2F]
    lw = params["layers"]
    fused = {
        "ln1": lw["ln1"], "ln2": lw["ln2"],
        "wqkv": {"q": jnp.concatenate([lw["wq"]["q"], lw["wk"]["q"], lw["wv"]["q"]], axis=-1),
                 "s": jnp.concatenate([lw["wq"]["s"], lw["wk"]["s"], lw["wv"]["s"]], axis=-1)},
        "wo": lw["wo"],
        "w_gu": {"q": jnp.concatenate([lw["w_gate"]["q"], lw["w_up"]["q"]], axis=-1),
                 "s": jnp.concatenate([lw["w_gate"]["s"], lw["w_up"]["s"]], axis=-1)},
        "w_down": lw["w_down"],
    }
    F = cfg.intermediate_size
    qdim = cfg.num_heads * hd

    @jax.jit
    def mm_fused(x):
        def body(x, lp):
            y = M.rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
            qkv = qmm(y, lp["wqkv"])
            q = qkv[..., :qdim]
            kvv = qkv[..., qdim:]
            attn = q + jnp.tile(kvv[..., :hkv * hd] + kvv[..., hkv * hd:], (1, 1, h // hkv))
            x = x + qmm(attn, lp["wo"])
            y = M.rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
            gu = qmm(y, lp["w_gu"])
            x = x + qmm(jax.nn.silu(gu[..., :F]) * gu[..., F:], lp["w_down"])
            return x, None
        x, _ = jax.lax.scan(body, x, fused)
        return x

    report["mm_fused_ms"] = round(timeit(mm_fused, x0), 3)

    # ---- lm_head ----
    lm_head = params["lm_head"]

    @jax.jit
    def head_bf16(x):
        return jnp.argmax((x @ lm_head.astype(x.dtype)).astype(jnp.float32), axis=-1)

    xh = jnp.zeros((b, cfg.hidden_size), jnp.bfloat16)
    report["lm_head_bf16_ms"] = round(timeit(head_bf16, xh), 3)

    lm_head_q = _zeros_like_shapes(jax.eval_shape(partial(quantize_weight, axis=-2), lm_head))

    @jax.jit
    def head_int8(x):
        return jnp.argmax(qmm(x, lm_head_q).astype(jnp.float32), axis=-1)

    report["lm_head_int8_ms"] = round(timeit(head_int8, xh), 3)

    # ---- sampling epilogue (mask + argmax over 42k) ----
    @jax.jit
    def epilogue(logits):
        return jnp.argmax(jnp.where(allow, logits, NEG_INF), axis=-1)

    lg = jnp.zeros((b, cfg.vocab_size), jnp.float32)
    report["mask_argmax_ms"] = round(timeit(epilogue, lg), 3)

    # ---- attention kernel alone at the bench context ----
    from usdm_tpu.ops.paged_attention import paged_decode_attention

    qg = jnp.zeros((b, hkv, h // hkv, hd), jnp.bfloat16)
    n_pages_tot = kv.k_pages.shape[1] // cfg.num_layers

    @jax.jit
    def attn_only(kv):
        out = []
        for li in range(4):  # 4 layers' worth, scaled up in report
            out.append(paged_decode_attention(
                qg, kv.k_pages, kv.v_pages, table + li * n_pages_tot, lens + 1,
                sliding_window=cfg.sliding_window))
        return jnp.stack(out).sum()

    report["attn_x4_ms"] = round(timeit(attn_only, kv), 3)
    report["attn_per_layer_us"] = round(report["attn_x4_ms"] / 4 * 1000, 1)

    print(json.dumps(report, indent=1))
    with open("/tmp/exp_decode.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
