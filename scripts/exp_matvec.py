"""int8 matvec bandwidth microbench: XLA formulations vs Pallas streaming.

The b=1 decode step floor is the weight read (~7 GB int8).  This times a
realistic MLP chain (up [D,F] then down [F,D], output feeds the next layer so
nothing can be sliced or dead-code-eliminated) under different matvec
formulations, reporting effective HBM GB/s over the int8 weight bytes.

Run: python scripts/exp_matvec.py   (on the chip)
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

D, F, L = 4096, 14336, 16  # 2 x 56 MB int8 per layer; x16 = 1.84 GB
BYTES = 2 * D * F * L


def timeit(fn, *args, n=16):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])  # axon: block_until_ready is a no-op
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def gbps(ms):
    return BYTES / (ms / 1e3) / 1e9


def quant_act(y):
    yf = y.astype(jnp.float32)
    amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
    ys = jnp.maximum(amax / 127.0, 1e-8)
    qy = jnp.clip(jnp.round(yf / ys), -127, 127).astype(jnp.int8)
    return qy, ys


def main():
    key = jax.random.PRNGKey(0)
    up = jax.random.randint(key, (L, D, F), -127, 127, jnp.int8)
    dn = jax.random.randint(key, (L, F, D), -127, 127, jnp.int8)
    upT = jnp.transpose(up, (0, 2, 1)).copy()  # [L, F, D] "oi" layout
    dnT = jnp.transpose(dn, (0, 2, 1)).copy()  # [L, D, F]
    s_up = jnp.ones((L, F), jnp.bfloat16) * (1 / 127)
    s_dn = jnp.ones((L, D), jnp.bfloat16) * (1 / 127)
    x = jax.random.normal(key, (1, D), jnp.bfloat16)

    results = {}

    def run(name, fn, *args):
        try:
            ms = timeit(fn, *args)
            results[name] = dict(ms=round(ms, 3), gbps=round(gbps(ms), 1))
        except Exception as e:  # noqa
            results[name] = dict(error=str(e)[:400])
        print(name, results[name], flush=True)

    # --- production recipe: W8A8 einsum io layout ---
    @jax.jit
    def w8a8_io(x, up, dn, s_up, s_dn):
        def body(y, ws):
            u, d, su, sd = ws
            qy, ys = quant_act(y)
            h = jnp.einsum("bi,io->bo", qy, u, preferred_element_type=jnp.int32)
            h = jax.nn.silu(h.astype(jnp.float32) * ys * su.astype(jnp.float32))
            qh, hs = quant_act(h)
            o = jnp.einsum("bi,io->bo", qh, d, preferred_element_type=jnp.int32)
            o = (o.astype(jnp.float32) * hs * sd.astype(jnp.float32)).astype(y.dtype)
            return o, None

        y, _ = jax.lax.scan(body, x, (up, dn, s_up, s_dn))
        return y

    run("w8a8_io", w8a8_io, x, up, dn, s_up, s_dn)

    # --- W8A8, "oi" (transposed) weight layout ---
    @jax.jit
    def w8a8_oi(x, upT, dnT, s_up, s_dn):
        def body(y, ws):
            u, d, su, sd = ws
            qy, ys = quant_act(y)
            h = jnp.einsum("bi,oi->bo", qy, u, preferred_element_type=jnp.int32)
            h = jax.nn.silu(h.astype(jnp.float32) * ys * su.astype(jnp.float32))
            qh, hs = quant_act(h)
            o = jnp.einsum("bi,oi->bo", qh, d, preferred_element_type=jnp.int32)
            o = (o.astype(jnp.float32) * hs * sd.astype(jnp.float32)).astype(y.dtype)
            return o, None

        y, _ = jax.lax.scan(body, x, (upT, dnT, s_up, s_dn))
        return y

    run("w8a8_oi", w8a8_oi, x, upT, dnT, s_up, s_dn)

    # --- bf16 dequant inside the dot ---
    @jax.jit
    def bf16_deq(x, up, dn, s_up, s_dn):
        def body(y, ws):
            u, d, su, sd = ws
            h = jnp.einsum("bi,io->bo", y, u.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            h = jax.nn.silu(h * su.astype(jnp.float32)).astype(jnp.bfloat16)
            o = jnp.einsum("bi,io->bo", h, d.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            o = (o * sd.astype(jnp.float32)).astype(y.dtype)
            return o, None

        y, _ = jax.lax.scan(body, x, (up, dn, s_up, s_dn))
        return y

    run("bf16_deq", bf16_deq, x, up, dn, s_up, s_dn)

    # --- batch=8 rows through the same weights (amortization check) ---
    x8 = jax.random.normal(key, (8, D), jnp.bfloat16)
    run("w8a8_io_b8", w8a8_io, x8, up, dn, s_up, s_dn)

    for k, v in results.items():
        print(k, v)
    with open("/tmp/exp_matvec.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

# ---------------------------------------------------------------- pallas ----
from jax.experimental import pallas as pl  # noqa: E402


def _mv_bf16_kernel(x_ref, q_ref, s_ref, o_ref):
    xb = x_ref[...]
    qb = q_ref[...].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(xb, qb, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)


def _mv_i8_kernel(x_ref, q_ref, s_ref, o_ref):
    acc = jax.lax.dot_general(x_ref[...], q_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[...] = (acc.astype(jnp.float32) * s_ref[...].astype(jnp.float32)
                  ).astype(jnp.bfloat16)


def make_mv(kernel, din, dout, bf, in_dtype):
    def mv(x, qi, si):
        return pl.pallas_call(
            kernel,
            grid=(dout // bf,),
            in_specs=[
                pl.BlockSpec((1, din), lambda j: (0, 0)),
                pl.BlockSpec((din, bf), lambda j: (0, j)),
                pl.BlockSpec((1, bf), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, bf), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((1, dout), jnp.bfloat16),
        )(x.astype(in_dtype), qi, si)
    return mv


def pallas_main():
    key = jax.random.PRNGKey(0)
    up = jax.random.randint(key, (L, D, F), -127, 127, jnp.int8)
    dn = jax.random.randint(key, (L, F, D), -127, 127, jnp.int8)
    s_up = jnp.ones((L, F), jnp.bfloat16) * (1 / 127)
    s_dn = jnp.ones((L, D), jnp.bfloat16) * (1 / 127)
    x = jax.random.normal(key, (1, D), jnp.bfloat16)
    results = {}

    for bf in (512, 1024):
        mv_up = make_mv(_mv_bf16_kernel, D, F, bf, jnp.bfloat16)
        mv_dn = make_mv(_mv_bf16_kernel, F, D, bf, jnp.bfloat16)

        @jax.jit
        def p_bf16(x, up, dn, s_up, s_dn, mv_up=mv_up, mv_dn=mv_dn):
            def body(y, ws):
                u, d, su, sd = ws
                h = jax.nn.silu(mv_up(y, u, su[None]).astype(jnp.float32)
                                ).astype(jnp.bfloat16)
                return mv_dn(h, d, sd[None]), None
            y, _ = jax.lax.scan(body, x, (up, dn, s_up, s_dn))
            return y

        mvq_up = make_mv(_mv_i8_kernel, D, F, bf, jnp.int8)
        mvq_dn = make_mv(_mv_i8_kernel, F, D, bf, jnp.int8)

        @jax.jit
        def p_i8(x, up, dn, s_up, s_dn, mv_up=mvq_up, mv_dn=mvq_dn):
            def body(y, ws):
                u, d, su, sd = ws
                qy, ys = quant_act(y)
                h = jax.nn.silu(mv_up(qy, u, su[None]).astype(jnp.float32) * ys
                                ).astype(jnp.bfloat16)
                qh, hs = quant_act(h)
                o = (mv_dn(qh, d, sd[None]).astype(jnp.float32) * hs
                     ).astype(jnp.bfloat16)
                return o, None
            y, _ = jax.lax.scan(body, x, (up, dn, s_up, s_dn))
            return y

        for name, fn in ((f"pallas_bf16_{bf}", p_bf16), (f"pallas_i8_{bf}", p_i8)):
            try:
                ms = timeit(fn, x, up, dn, s_up, s_dn)
                results[name] = dict(ms=round(ms, 3), gbps=round(gbps(ms), 1))
            except Exception as e:  # noqa
                results[name] = dict(error=str(e)[:200])
            print(name, results[name], flush=True)
    with open("/tmp/exp_matvec_pallas.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    pallas_main()
