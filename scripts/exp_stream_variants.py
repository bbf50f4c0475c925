"""Isolate the stream_qmv bottleneck: DMA-only vs compute formulations.

Variants of the manual-DMA streaming loop over L x [F, D] int8 weights:
  dma_only   - copies every tile, computes nothing (pure HBM read rate)
  dot_b1     - int8 dot (1,K)x(BF,K) per tile (current stream_qmv)
  dot_b8     - x padded to 8 rows (MXU row pipelining check)
  dot_b32    - x padded to 32 rows
  wlhs       - dot (BF,K)x(K,1): weights stream as LHS
  vpu        - upcast+multiply+lane-reduce on the VPU (no MXU)
  dot_bf16   - upcast tile to bf16, bf16 dot
"""

import sys
import os
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

D, F, L = 4096, 14336, 16
BYTES = D * F * L  # one matrix per layer this time
BF = 1024
NT = F // BF


def timeit(fn, *args, n=16):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def make_kernel(mode, bpad):
    def kernel(x_ref, w_hbm, o_ref, w_buf, sem):
        def start(slot, i):
            pltpu.make_async_copy(
                w_hbm.at[pl.dslice(i * BF, BF)], w_buf.at[slot], sem.at[slot]
            ).start()

        start(0, 0)
        x = x_ref[...]

        def body(i, acc):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < NT)
            def _():
                start(1 - slot, i + 1)

            pltpu.make_async_copy(
                w_hbm.at[pl.dslice(0, BF)], w_buf.at[slot], sem.at[slot]
            ).wait()
            w = w_buf[slot]
            if mode == "dma_only":
                return acc + w[0:1, 0:128].astype(jnp.float32)
            if mode in ("dot_b1", "dot_b8", "dot_b32"):
                o = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                return acc + o[0:1, 0:128].astype(jnp.float32)
            if mode == "wlhs":
                o = jax.lax.dot_general(w, x.T, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                return acc + o[0:128, 0:1].T.astype(jnp.float32)
            if mode == "vpu":
                prod = w.astype(jnp.float32) * x[0].astype(jnp.float32)[None, :]
                o = jnp.sum(prod, axis=1)
                return acc + o[None, 0:128]
            if mode == "dot_bf16":
                o = jax.lax.dot_general(
                    x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
                return acc + o[0:1, 0:128]
            raise ValueError(mode)

        acc = jax.lax.fori_loop(0, NT, body, jnp.zeros((1, 128), jnp.float32))
        o_ref[...] = acc

    return kernel


def run_mode(mode, bpad=1):
    kernel = make_kernel(mode, bpad)

    def one(x, w):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((bpad, D), lambda i: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, BF, D), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(x, w)

    @jax.jit
    def chain(x, ws):
        def body(c, w):
            return c + one(x, w), None
        y, _ = jax.lax.scan(body, jnp.zeros((1, 128), jnp.float32), ws)
        return y

    key = jax.random.PRNGKey(0)
    ws = jax.random.randint(key, (L, F, D), -127, 127, jnp.int8)
    x = jax.random.randint(key, (bpad, D), -127, 127, jnp.int8)
    try:
        ms = timeit(chain, x, ws)
        print(f"{mode:10s} {ms:7.3f} ms  {BYTES/(ms/1e3)/1e9:7.1f} GB/s", flush=True)
    except Exception as e:  # noqa
        print(f"{mode:10s} ERROR {str(e)[:150]}", flush=True)


if __name__ == "__main__" and False:
    run_mode("dma_only")
    run_mode("dot_b1", 1)
    run_mode("dot_b8", 8)
    run_mode("dot_b32", 32)
    run_mode("wlhs", 1)
    run_mode("vpu", 1)
    run_mode("dot_bf16", 1)


def run_multi_dma(nch, mode="dma_only", bpad=1, bf=BF):
    """Split each [bf, D] tile into nch concurrent row-chunk DMAs."""
    nt = F // bf
    rows = bf // nch

    def kernel(x_ref, w_hbm, o_ref, w_buf, sem):
        def start(slot, i):
            for c in range(nch):
                pltpu.make_async_copy(
                    w_hbm.at[pl.dslice(i * bf + c * rows, rows)],
                    w_buf.at[slot, pl.dslice(c * rows, rows)],
                    sem.at[slot, c],
                ).start()

        def wait(slot):
            for c in range(nch):
                pltpu.make_async_copy(
                    w_hbm.at[pl.dslice(0, rows)],
                    w_buf.at[slot, pl.dslice(c * rows, rows)],
                    sem.at[slot, c],
                ).wait()

        start(0, 0)
        x = x_ref[...]

        def body(i, acc):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < nt)
            def _():
                start(1 - slot, i + 1)

            wait(slot)
            w = w_buf[slot]
            if mode == "dma_only":
                return acc + w[0:1, 0:128].astype(jnp.float32)
            o = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return acc + o[0:1, 0:128].astype(jnp.float32)

        acc = jax.lax.fori_loop(0, nt, body, jnp.zeros((1, 128), jnp.float32))
        o_ref[...] = acc

    def one(x, w):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((bpad, D), lambda i: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, bf, D), jnp.int8),
                pltpu.SemaphoreType.DMA((2, nch)),
            ],
        )(x, w)

    @jax.jit
    def chain(x, ws):
        def body(c, w):
            return c + one(x, w), None
        y, _ = jax.lax.scan(body, jnp.zeros((1, 128), jnp.float32), ws)
        return y

    key = jax.random.PRNGKey(0)
    ws = jax.random.randint(key, (L, F, D), -127, 127, jnp.int8)
    x = jax.random.randint(key, (bpad, D), -127, 127, jnp.int8)
    try:
        ms = timeit(chain, x, ws)
        print(f"{mode}_c{nch}_bf{bf} {ms:7.3f} ms  {BYTES/(ms/1e3)/1e9:7.1f} GB/s",
              flush=True)
    except Exception as e:  # noqa
        print(f"{mode}_c{nch}_bf{bf} ERROR {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    for nch in (2, 4, 8):
        run_multi_dma(nch, "dma_only")
    for nch in (4, 8):
        run_multi_dma(nch, "dot")
    run_multi_dma(8, "dma_only", bf=2048)
    run_multi_dma(8, "dot", bf=2048)
