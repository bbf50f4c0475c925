"""int4 weight matvec probe: can the chip stream half the bytes?

The b=1 decode step is weight-read-bound: 7.2 GB int8 at ~620 GB/s effective
(whole-model XLA, docs/STATUS.md).  If int4 weights reach a similar effective
rate the decode step halves.  This times the exp_matvec.py MLP chain with:

  w8a8_io      - production int8 recipe (baseline)
  w4a8_native  - weights as jnp.int4, int8 activations, XLA dot
  w4a4_native  - both operands int4 (speed probe only)
  w4a8_unpack  - packed 2-per-byte uint8, XLA-level unpack to int8 + dot
  w4a8_pallas  - Pallas grid-pipelined: packed tiles stream HBM->VMEM,
                 unpack + int8 MXU dot in-kernel

Run: python scripts/exp_int4.py   (on the chip)
"""

import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

D, F, L = 4096, 14336, 16
BYTES_I8 = 2 * D * F * L
BYTES_I4 = D * F * L


def timeit(fn, *args, n=16):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def quant_act(y):
    yf = y.astype(jnp.float32)
    amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
    ys = jnp.maximum(amax / 127.0, 1e-8)
    qy = jnp.clip(jnp.round(yf / ys), -127, 127).astype(jnp.int8)
    return qy, ys


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, D), jnp.bfloat16)
    results = {}

    def run(name, fn, *args, bytes_=BYTES_I4):
        try:
            ms = timeit(fn, *args)
            results[name] = dict(ms=round(ms, 3), gbps=round(bytes_ / (ms / 1e3) / 1e9, 1))
        except Exception as e:  # noqa
            results[name] = dict(error=str(e)[:300])
        print(name, results[name], flush=True)

    # ---------- baseline: int8 ----------
    up8 = jax.random.randint(key, (L, D, F), -127, 127, jnp.int8)
    dn8 = jax.random.randint(key, (L, F, D), -127, 127, jnp.int8)
    s_up = jnp.ones((L, F), jnp.bfloat16) * (1 / 127)
    s_dn = jnp.ones((L, D), jnp.bfloat16) * (1 / 127)

    @jax.jit
    def w8a8_io(x, up, dn, s_up, s_dn):
        def body(y, ws):
            u, d, su, sd = ws
            qy, ys = quant_act(y)
            h = jnp.einsum("bi,io->bo", qy, u, preferred_element_type=jnp.int32)
            h = jax.nn.silu(h.astype(jnp.float32) * ys * su.astype(jnp.float32))
            qh, hs = quant_act(h)
            o = jnp.einsum("bi,io->bo", qh, d, preferred_element_type=jnp.int32)
            return (o.astype(jnp.float32) * hs * sd.astype(jnp.float32)).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, (up, dn, s_up, s_dn))
        return y

    run("w8a8_io", w8a8_io, x, up8, dn8, s_up, s_dn, bytes_=BYTES_I8)

    # ---------- native int4 ----------
    up4 = jax.random.randint(key, (L, D, F), -8, 8, jnp.int8).astype(jnp.int4)
    dn4 = jax.random.randint(key, (L, F, D), -8, 8, jnp.int8).astype(jnp.int4)

    @jax.jit
    def w4a8_native(x, up, dn, s_up, s_dn):
        def body(y, ws):
            u, d, su, sd = ws
            qy, ys = quant_act(y)
            h = jnp.einsum("bi,io->bo", qy, u, preferred_element_type=jnp.int32)
            h = jax.nn.silu(h.astype(jnp.float32) * ys * su.astype(jnp.float32))
            qh, hs = quant_act(h)
            o = jnp.einsum("bi,io->bo", qh, d, preferred_element_type=jnp.int32)
            return (o.astype(jnp.float32) * hs * sd.astype(jnp.float32)).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, (up, dn, s_up, s_dn))
        return y

    run("w4a8_native", w4a8_native, x, up4, dn4, s_up, s_dn)

    @jax.jit
    def w4a4_native(x, up, dn, s_up, s_dn):
        def body(y, ws):
            u, d, su, sd = ws
            qy, ys = quant_act(y)
            qy = jnp.clip(qy // 16, -8, 7).astype(jnp.int4)
            h = jnp.einsum("bi,io->bo", qy, u, preferred_element_type=jnp.int32)
            h = jax.nn.silu(h.astype(jnp.float32) * ys * su.astype(jnp.float32))
            qh, hs = quant_act(h)
            qh = jnp.clip(qh // 16, -8, 7).astype(jnp.int4)
            o = jnp.einsum("bi,io->bo", qh, d, preferred_element_type=jnp.int32)
            return (o.astype(jnp.float32) * hs * sd.astype(jnp.float32)).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, (up, dn, s_up, s_dn))
        return y

    run("w4a4_native", w4a4_native, x, up4, dn4, s_up, s_dn)

    # ---------- packed uint8, XLA unpack ----------
    def pack(q):  # int8 in [-8,7], pairs along the IN axis -> uint8
        lo = (q[..., 0::2, :] & 0xF).astype(jnp.uint8)
        hi = (q[..., 1::2, :] & 0xF).astype(jnp.uint8)
        return lo | (hi << 4)

    def unpack(p):  # uint8 -> int8 [..., 2k, :]
        lo = (p & 0xF).astype(jnp.int8)
        hi = (p >> 4).astype(jnp.int8)
        lo = jnp.where(lo >= 8, lo - 16, lo)
        hi = jnp.where(hi >= 8, hi - 16, hi)
        return jnp.stack([lo, hi], axis=-2).reshape(*p.shape[:-2], -1, p.shape[-1])

    up4i8 = jax.random.randint(key, (L, D, F), -8, 8, jnp.int8)
    dn4i8 = jax.random.randint(key, (L, F, D), -8, 8, jnp.int8)
    upp = pack(up4i8)
    dnp_ = pack(dn4i8)

    @jax.jit
    def w4a8_unpack(x, upp, dnp_, s_up, s_dn):
        def body(y, ws):
            up_, dp_, su, sd = ws
            qy, ys = quant_act(y)
            h = jnp.einsum("bi,io->bo", qy, unpack(up_), preferred_element_type=jnp.int32)
            h = jax.nn.silu(h.astype(jnp.float32) * ys * su.astype(jnp.float32))
            qh, hs = quant_act(h)
            o = jnp.einsum("bi,io->bo", qh, unpack(dp_), preferred_element_type=jnp.int32)
            return (o.astype(jnp.float32) * hs * sd.astype(jnp.float32)).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, (upp, dnp_, s_up, s_dn))
        return y

    run("w4a8_unpack", w4a8_unpack, x, upp, dnp_, s_up, s_dn)

    # ---------- Pallas grid-pipelined, "oi" layout, packed along IN ----------
    # tiles of [BF, Din/2] uint8 stream through VMEM; unpack + dot in-kernel.
    # NOTE: this variant predates the working one in exp_int4_pallas.py —
    # the fixed 2048-row tile over-budgets VMEM on the down projections and
    # the interleaved unpack needs an 8-bit reshape Mosaic can't do; kept as
    # the record of what failed.
    BF = 2048

    def qmv4_kernel(x_ref, w_ref, s_ref, o_ref):
        p = w_ref[...]  # [BF, Din/2] uint8: lo nibble = w[:, :Din/2], hi = w[:, Din/2:]
        lo = (p & 0xF).astype(jnp.int8)
        hi = (p >> 4).astype(jnp.int8)
        lo = jnp.where(lo >= 8, lo - 16, lo)
        hi = jnp.where(hi >= 8, hi - 16, hi)
        x = x_ref[...]
        dh = p.shape[1]
        acc = jax.lax.dot_general(
            x[:, :dh], lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc += jax.lax.dot_general(
            x[:, dh:], hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[...] = acc.astype(jnp.float32) * s_ref[...].astype(jnp.float32)

    def qmv4(qy, wp, s):  # wp [Dout, Din/2] uint8 (pairs adjacent along IN)
        dout, dh = wp.shape
        din = dh * 2
        nt = dout // BF
        return pl.pallas_call(
            qmv4_kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, din), lambda i: (0, 0)),
                pl.BlockSpec((BF, dh), lambda i: (i, 0)),
                pl.BlockSpec((1, BF), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((1, BF), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((1, BF * nt), jnp.float32),
        )(qy, wp, s)

    def pack_adj(q):  # [.., Dout, Din] int8 -> [.., Dout, Din/2] uint8, halves in nibbles
        dh = q.shape[-1] // 2
        lo = (q[..., :dh] & 0xF).astype(jnp.uint8)
        hi = (q[..., dh:] & 0xF).astype(jnp.uint8)
        return lo | (hi << 4)

    upT = jnp.transpose(up4i8, (0, 2, 1))  # [L, F, D] oi
    dnT = jnp.transpose(dn4i8, (0, 2, 1))  # [L, D, F] oi
    uppT = jax.jit(pack_adj)(upT)
    dnpT = jax.jit(pack_adj)(dnT)

    @jax.jit
    def w4a8_pallas(x, uppT, dnpT, s_up, s_dn):
        def body(y, ws):
            up_, dp_, su, sd = ws
            qy, ys = quant_act(y)
            h = qmv4(qy, up_, su[None])
            h = jax.nn.silu(h * ys)
            qh, hs = quant_act(h)
            o = qmv4(qh, dp_, sd[None])
            return (o * hs).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, (uppT, dnpT, s_up, s_dn))
        return y

    run("w4a8_pallas", w4a8_pallas, x, uppT, dnpT,
        s_up * 1.0, s_dn * 1.0)

    # correctness spot-check: pallas vs unpack reference on one matmul
    qy, ys = quant_act(x)
    ref = (qy.astype(jnp.int32) @ up4i8[0].astype(jnp.int32)).astype(jnp.float32)
    got = qmv4(qy, uppT[0], (s_up[0] * 0 + 1.0)[None])
    err = float(jnp.max(jnp.abs(ref - got)))
    print("pallas max abs err vs int32 ref:", err, flush=True)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
