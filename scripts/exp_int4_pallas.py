"""int4-packed Pallas matvec chain: measure the halved weight read on chip.

Native jnp.int4 buffers break over the axon tunnel (recursive-jit bug on
transfer AND on-device cast), and an XLA-level unpack measures 13 GB/s
(exp_int4.py) — so int4 decode needs a Pallas kernel: weights stored packed
two-nibbles-per-uint8 with the two halves of the input axis in lo/hi nibbles
(no interleave reshape, which Mosaic can't do on 8-bit), unpacked in VMEM,
int8 MXU dot per half, summed.

What looked like a flaky remote-compile helper was a VMEM over-budget: fixed
[1024, dh] tiles double-buffer to 14.7 MB on the down projections.  Tiles are
now sized per shape; the retry loop stays as a belt against real helper
flakes.

Run: python scripts/exp_int4_pallas.py   (on the chip)
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

D, F, L = 4096, 14336, 16


def pick_bf(dout: int, dh: int, budget: int = 4 << 20) -> int:
    """Largest power-of-two tile height whose double buffer fits the VMEM
    budget (tiles of [bf, dh] uint8): [1024, 7168] x2 = 14.7 MB over-budgets
    the down projections and crashes the compile helper."""
    bf = 2048
    while bf > 128 and (2 * bf * dh > budget or dout % bf):
        bf //= 2
    return bf


def qmv4_kernel(x_ref, w_ref, s_ref, o_ref):
    p32 = w_ref[...].astype(jnp.int32)
    lo = p32 & 15
    hi = p32 >> 4
    lo = (lo - 16 * (lo >= 8)).astype(jnp.int8)
    hi = (hi - 16 * (hi >= 8)).astype(jnp.int8)
    x = x_ref[...]
    dh = w_ref.shape[1]
    acc = jax.lax.dot_general(x[:, :dh], lo, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc += jax.lax.dot_general(x[:, dh:], hi, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)
    o_ref[...] = acc.astype(jnp.float32) * s_ref[...].astype(jnp.float32)


def qmv4(qy, wp, s):
    """qy [B, Din] int8 @ packed W [Dout, Din/2] uint8 -> [B, Dout] f32*scale."""
    dout, dh = wp.shape
    din = dh * 2
    bf = pick_bf(dout, dh)
    nt = dout // bf
    b = qy.shape[0]
    return pl.pallas_call(
        qmv4_kernel, grid=(nt,),
        in_specs=[pl.BlockSpec((b, din), lambda i: (0, 0)),
                  pl.BlockSpec((bf, dh), lambda i: (i, 0)),
                  pl.BlockSpec((1, bf), lambda i: (0, i))],
        out_specs=pl.BlockSpec((b, bf), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, bf * nt), jnp.float32),
    )(qy, wp, s)


def quant_act(y):
    yf = y.astype(jnp.float32)
    amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
    ys = jnp.maximum(amax / 127.0, 1e-8)
    return jnp.clip(jnp.round(yf / ys), -127, 127).astype(jnp.int8), ys


def main():
    k = jax.random.PRNGKey(0)

    # correctness
    w = jax.random.randint(k, (F, D), -8, 8, jnp.int8)
    dh = D // 2
    wp = (w[:, :dh] & 0xF).astype(jnp.uint8) | ((w[:, dh:] & 0xF).astype(jnp.uint8) << 4)
    qy = jax.random.randint(k, (1, D), -127, 127, jnp.int8)
    ref = (qy.astype(jnp.int32) @ w.T.astype(jnp.int32)).astype(jnp.float32)
    got = qmv4(qy, wp, jnp.ones((1, F), jnp.float32))
    print("max abs err:", float(jnp.max(jnp.abs(ref - got))), flush=True)

    up = jax.random.randint(k, (L, F, D // 2), 0, 255, jnp.int32).astype(jnp.uint8)
    dn = jax.random.randint(k, (L, D, F // 2), 0, 255, jnp.int32).astype(jnp.uint8)
    s_up = jnp.ones((L, F), jnp.float32) * (1 / 127)
    s_dn = jnp.ones((L, D), jnp.float32) * (1 / 127)
    x = jax.random.normal(k, (1, D), jnp.bfloat16)

    @jax.jit
    def chain(x, up, dn, s_up, s_dn):
        def body(y, ws):
            u, d, su, sd = ws
            qy, ys = quant_act(y)
            h = jax.nn.silu(qmv4(qy, u, su[None]) * ys)
            qh, hs = quant_act(h)
            return (qmv4(qh, d, sd[None]) * hs).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, (up, dn, s_up, s_dn))
        return y

    out = None
    for attempt in range(6):
        try:
            out = chain(x, up, dn, s_up, s_dn)
            jax.device_get(out.ravel()[0])
            break
        except Exception as e:  # noqa
            print(f"compile attempt {attempt}: {str(e)[:120]}", flush=True)
            time.sleep(3)
    if out is None:
        print("chain never compiled")
        return

    t0 = time.perf_counter()
    for _ in range(16):
        out = chain(x, up, dn, s_up, s_dn)
    jax.device_get(out.ravel()[0])
    ms = (time.perf_counter() - t0) / 16 * 1e3
    bytes_ = D * F * L
    print(f"w4a8_pallas chain: {ms:.3f} ms  {bytes_/(ms/1e3)/1e9:.1f} GB/s of int4 bytes "
          f"({2*bytes_/(ms/1e3)/1e9:.1f} int8-equivalent)", flush=True)


if __name__ == "__main__":
    main()
