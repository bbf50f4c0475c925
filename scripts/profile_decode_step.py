"""Decompose the 7B-int8 b=1 paged decode step on the real chip.

Times the full `paged_decode_step` at the dialog geometry (page_size=64,
ctx ~1219) against its parts: the weights-only matmul scan, the lm_head
matvec, the paged-attention kernel, and the argmax/mask tail — to locate
the gap between the measured step and the ~9 ms int8 weight-read roofline.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _sync(out):
    """block_until_ready is NOT a reliable sync over the tunnel: force a
    device->host copy of a small leaf that depends on the computation."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, n=30, **kw):
    out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    from usdm_tpu.core.config import EngineConfig, MistralConfig
    from usdm_tpu.engine.paged_ops import PagedKV, paged_decode_step
    from usdm_tpu.models import mistral as M
    from usdm_tpu.models.quant import qmm, quantize_llm_params

    cfg = MistralConfig()
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: quantize_llm_params(M.init_params(cfg, jax.random.PRNGKey(0)))))

    ps, maxp = 64, 24  # dialog-server page size; ctx 1219 -> 20 pages
    ctx = 1219
    for kv_dtype in (None, jnp.int8):
        kv = PagedKV.create(cfg, maxp + 1, ps, dtype=kv_dtype)
        table = jnp.asarray(np.arange(maxp, dtype=np.int32)[None])
        tok = jnp.zeros(1, jnp.int32)
        lens = jnp.asarray([ctx], jnp.int32)
        act = jnp.ones(1, bool)
        am = jnp.ones((1, cfg.vocab_size), bool)
        keys = jnp.zeros((1, 2), jnp.uint32)
        i1, f1 = jnp.ones(1, jnp.int32), jnp.ones(1, jnp.float32)

        def step(kv):
            nxt, k2, kv2 = paged_decode_step(params, kv, cfg, tok, lens, table,
                                             act, am, ps, keys, i1, f1, f1)
            return nxt, kv2

        nxt, kv = step(kv)
        np.asarray(nxt)
        t0 = time.perf_counter()
        n = 30
        for _ in range(n):
            nxt, kv = step(kv)
        np.asarray(nxt)  # real device->host sync
        dt = (time.perf_counter() - t0) / n
        name = "bf16" if kv_dtype is None else "int8"
        print(f"decode step (kv={name}): {dt*1e3:.2f} ms  ({1/dt:.1f} tok/s)", flush=True)
        if kv_dtype is None:
            # stage-C sliced lm_head variant (lossless greedy tail)
            def step_sl(kv):
                nxt, _, kv2 = paged_decode_step(
                    params, kv, cfg, tok, lens, table, act, am, ps,
                    keys, i1, f1, f1, logits_slice=(32002, 42003, 31999))
                return nxt, kv2

            nxt, kv = step_sl(kv)
            np.asarray(nxt)
            t0 = time.perf_counter()
            for _ in range(n):
                nxt, kv = step_sl(kv)
            np.asarray(nxt)
            dt = (time.perf_counter() - t0) / n
            print(f"decode step (kv={name}, sliced lm_head): {dt*1e3:.2f} ms  "
                  f"({1/dt:.1f} tok/s)", flush=True)
        del kv

    # ---- parts -----------------------------------------------------------
    # IMPORTANT: calls must CHAIN (each output feeds the next input) — the
    # tunnel runtime executes lazily, so independent repeated dispatches are
    # dead-code-eliminated and only dispatch overhead gets measured.
    lp = params["layers"]

    def chain_time(fn, x0, n=30, label=""):
        x = fn(x0)
        _sync(x)
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x)
        _sync(x)
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)
        return dt

    @jax.jit
    def weights_only(x):
        def body(x, lw):
            y = qmm(x, lw["wq"])  # [1,1,4096]
            kk = qmm(x, lw["wk"])  # [1,1,1024]
            vv = qmm(x, lw["wv"])
            y = y + jnp.pad(kk + vv, ((0, 0), (0, 0), (0, 3072)))
            x = x + qmm(y, lw["wo"])
            x = x + qmm(jax.nn.silu(qmm(x, lw["w_gate"])) * qmm(x, lw["w_up"]),
                        lw["w_down"])
            return x, None

        x, _ = jax.lax.scan(body, x, lp)
        return x

    x0 = jnp.zeros((1, 1, 4096), jnp.bfloat16)
    chain_time(weights_only, x0, label="weights-only scan (7 matmuls x 32)")

    @jax.jit
    def lm_head_chain(x):
        logits = x[:, 0] @ params["lm_head"].astype(x.dtype)
        return x + logits[:, None, :4096]

    chain_time(lm_head_chain, x0, label="lm_head matvec")

    @jax.jit
    def tail_chain(x):
        logits = (x[:, 0] @ params["lm_head"].astype(x.dtype)).astype(jnp.float32)
        logits = jnp.where(am, logits, -1e30)
        nxt = jnp.argmax(logits, axis=-1)
        return x + (nxt % 7)[:, None, None].astype(x.dtype)

    chain_time(tail_chain, x0, label="lm_head+mask+argmax tail")

    from usdm_tpu.ops.paged_attention import paged_decode_attention

    hkv, g, d = cfg.num_kv_heads, cfg.num_heads // cfg.num_kv_heads, cfg.head_dim
    kp = jnp.zeros((hkv, cfg.num_layers * (maxp + 1), ps, d), jnp.bfloat16)
    table32 = jnp.asarray(np.arange(maxp, dtype=np.int32)[None])

    @jax.jit
    def attn_chain(q):
        return paged_decode_attention(q, kp, kp, table32, jnp.asarray([ctx]),
                                      sliding_window=cfg.sliding_window)

    q0 = jnp.zeros((1, hkv, g, d), jnp.bfloat16)
    t_attn = chain_time(attn_chain, q0, label="attention kernel (1 layer)")
    print(f"  -> x32 layers = {t_attn*32*1e3:.2f} ms", flush=True)

    @jax.jit
    def embed_rope_chain(tok):
        x = params["embed"].astype(jnp.bfloat16)[tok][:, None, :]
        cos, sin = M.rope_tables(lens[:, None], cfg.head_dim, cfg.rope_theta)
        return (tok + x[0, 0, 0].astype(jnp.int32) + cos[0, 0, 0].astype(jnp.int32)) % 7

    chain_time(embed_rope_chain, tok, label="embed+rope")


if __name__ == "__main__":
    main()
