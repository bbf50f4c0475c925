"""Fused residual+mask+LayerNorm Pallas kernel (Voicebox estimator hot path).

The estimator is LayerNorm/elementwise-bound on TPU, not matmul-bound: the
r3 device trace (docs/STATUS.md, scripts/trace_estimator.py) shows the f32
LayerNorm reductions costing as much as ALL the matmuls — XLA materializes
the residual add, the pad-mask multiply, and the two-pass f32 reduction as
separate HBM round trips.  This kernel computes

    out = LN((x + r) * rowmask) * w + b        (optionally * rowmask again)

in ONE pass over the activations with f32 statistics — numerics identical
to models.voicebox._layer_norm (the reference's post-LN encoder blocks,
/root/reference/src/decoder/voicebox/model/networks.py:236-266).  The pad
mask is PER ROW (frame), so it is computed in-kernel from `lengths`
(row t of batch b is valid iff t < lengths[b]) instead of streaming a mask
tensor from HBM.

Training still works: a custom_vjp re-expresses the forward in plain XLA
for the backward pass (the kernel is inference-hot; the train step is
matmul-bound and remat'd anyway).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _xla_ref(x, r, lengths, w, b, post_mask, eps):
    """Reference math (exactly models.voicebox's masked post-LN sequence)."""
    t = x.shape[1]
    m = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)[:, :, None]
    s = (x + r) * m
    dt = s.dtype
    xf = s.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    d = xf - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    y = ((d * jax.lax.rsqrt(var + eps)).astype(dt)) * w + b
    return y * m if post_mask else y


def _kernel(len_ref, x_ref, r_ref, w_ref, b_ref, o_ref, *, blk_t, eps,
            post_mask):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    x = x_ref[0]  # [blk_t, H]
    r = r_ref[0]
    h = x.shape[-1]
    row = ti * blk_t + jax.lax.broadcasted_iota(jnp.int32, (blk_t, h), 0)
    m = row < len_ref[bi]  # [blk_t, H] row-validity mask
    s = jnp.where(m, x + r, jnp.zeros_like(x))
    xf = s.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    d = xf - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    y = (d * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    y = y * w_ref[0, 0] + b_ref[0, 0]
    if post_mask:
        y = jnp.where(m, y, jnp.zeros_like(y))
    o_ref[0] = y


def _pallas_impl(x, r, lengths, w, b, post_mask, eps, blk_t=256):
    bsz, t, h = x.shape
    blk_t = min(blk_t, max(8, t))
    grid = (bsz, pl.cdiv(t, blk_t))
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        partial(_kernel, blk_t=blk_t, eps=eps, post_mask=post_mask),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, blk_t, h), lambda bi, ti, lens: (bi, ti, 0)),
                pl.BlockSpec((1, blk_t, h), lambda bi, ti, lens: (bi, ti, 0)),
                pl.BlockSpec((1, 1, h), lambda bi, ti, lens: (0, 0, 0)),
                pl.BlockSpec((1, 1, h), lambda bi, ti, lens: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, blk_t, h), lambda bi, ti, lens: (bi, ti, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, t, h), x.dtype),
    )(lengths.astype(jnp.int32), x, r, w.reshape(1, 1, h), b.reshape(1, 1, h))


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def add_mask_ln(x, r, lengths, w, b, post_mask=False, eps=1e-5):
    """LN((x + r) * rowmask) * w + b  (optionally * rowmask), f32 stats.

    x, r: [B, T, H] (compute dtype); lengths: [B] valid row counts;
    w, b: [H].  One fused HBM pass on TPU (Pallas); identical XLA math
    elsewhere and for the backward pass.
    """
    h = x.shape[-1]
    if jax.devices()[0].platform == "tpu" and h % 128 == 0:
        return _pallas_impl(x, r, lengths, w, b, post_mask, eps)
    return _xla_ref(x, r, lengths, w, b, post_mask, eps)


def _fwd(x, r, lengths, w, b, post_mask, eps):
    return add_mask_ln(x, r, lengths, w, b, post_mask, eps), (x, r, lengths, w, b)


def _bwd(post_mask, eps, res, g):
    x, r, lengths, w, b = res
    _, vjp = jax.vjp(lambda x, r, w, b: _xla_ref(x, r, lengths, w, b,
                                                 post_mask, eps), x, r, w, b)
    dx, dr, dw, db = vjp(g)
    return dx, dr, None, dw, db


add_mask_ln.defvjp(_fwd, _bwd)
