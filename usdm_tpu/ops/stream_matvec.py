"""Pallas TPU weight-streaming matvec for bandwidth-bound decode.

The b<=8 decode step is a weight-read problem: every generated token streams
the full ~7 GB of int8 projection weights through HBM.  XLA's W8A8 matvecs
measure ~390-450 GB/s on chip (scripts/exp_matvec.py) while the manual-DMA
paged-attention kernel reaches ~714 GB/s — this kernel applies the same
double-buffered explicit-DMA recipe to the projection matmuls (the TPU
counterpart of the fused GEMV kernels GPU serving stacks use; reference
decode path /root/reference/src/inference_vllm.py:109 rides vLLM's).

Layout contract: weights are "oi" transposed — `w` is [Dout, Din] int8 with
per-output-channel scales [Dout] — so one output tile [BF, Din] is a single
contiguous (or large-row strided) HBM region per DMA descriptor.

Numerics match models.quant.qmm exactly: activations are dynamically
quantized per row (symmetric int8), the dot runs int8 x int8 -> int32 on the
MXU, and the result is rescaled by act_scale * weight_scale in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmv_kernel(
    x_ref,      # [B, Din] int8 (VMEM)
    w_hbm,      # [Dout, Din] int8 (stays in HBM)
    s_ref,      # [1, Dout] bf16 (VMEM)
    o_ref,      # [B, Dout] f32 (VMEM)
    w_buf,      # [2, BF, Din] int8 VMEM double buffer
    sem,        # [2] DMA semaphores
    *,
    bf: int,
    n_tiles: int,
):
    def start(slot, i):
        pltpu.make_async_copy(
            w_hbm.at[pl.dslice(i * bf, bf)], w_buf.at[slot], sem.at[slot]
        ).start()

    start(0, 0)
    x = x_ref[...]

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_tiles)
        def _():
            start(1 - slot, i + 1)

        pltpu.make_async_copy(
            w_hbm.at[pl.dslice(0, bf)], w_buf.at[slot], sem.at[slot]
        ).wait()
        # [B, Din] x [BF, Din] -> [B, BF] int32 on the MXU
        acc = jax.lax.dot_general(
            x, w_buf[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        sc = s_ref[:, pl.dslice(i * bf, bf)]
        o = acc.astype(jnp.float32) * sc.astype(jnp.float32)
        o_ref[:, pl.dslice(i * bf, bf)] = o
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0, unroll=False)


def _pick_bf(dout: int, din: int, vmem_budget: int = 9 << 20) -> int:
    """Largest power-of-two tile height whose double buffer fits the scoped
    VMEM budget (int8: 1 byte/elt), at least 256 rows, dividing dout."""
    bf = 1 << 12
    while bf > 256 and (2 * bf * din > vmem_budget or dout % bf):
        bf //= 2
    while dout % bf:
        bf //= 2
    return max(bf, 8)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def stream_qmv(y: jnp.ndarray, w: dict, out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """y @ W for an "oi"-layout quantized weight {"q": [Dout, Din] int8,
    "s": [Dout] bf16}; y is [B, Din] bf16/f32.  W8A8, numerics == quant.qmm."""
    q, s = w["q"], w["s"]
    dout, din = q.shape
    b = y.shape[0]
    yf = y.astype(jnp.float32)
    amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
    ys = jnp.maximum(amax / 127.0, 1e-8)
    qy = jnp.clip(jnp.round(yf / ys), -127, 127).astype(jnp.int8)

    bf = _pick_bf(dout, din)
    n_tiles = dout // bf
    kernel = functools.partial(_qmv_kernel, bf=bf, n_tiles=n_tiles)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, din), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((1, dout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((b, dout), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, dout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, bf, din), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(qy, q, s[None].astype(jnp.bfloat16))
    return (out * ys * 1.0).astype(out_dtype)
