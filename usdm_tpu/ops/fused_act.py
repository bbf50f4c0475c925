"""Fused anti-aliased Snake activation (BigVGAN hot path): one Pallas pass.

BigVGAN spends its whole budget in Activation1d sandwiches — upsample(2x,
12-tap kaiser sinc) -> snake -> downsample(2x, 12-tap) (reference
alias_free_torch/act.py:8-27) — which XLA executes as three depthwise convs
plus transcendentals with an HBM round trip between each (the r3 device
trace is a wall of ~4 ms multiply-add fusions; docs/STATUS.md).  This
kernel computes the whole sandwich in ONE pass: each output sample is a
static-window function of 11 input samples, so a time-block loads once from
HBM, produces the 2x-rate intermediate in VMEM registers (phase-split: the
even/odd upsample phases are two 6-tap FIRs of the SAME input window — the
zero-stuffed 2x stream is never materialized), applies snake in f32, and
runs the 12-tap downsample as two 6-tap phase sums.  HBM traffic drops from
~10 T*C elements (3 convs' reads+writes) to ~2 T*C (read x, write y).

Derivation (matches models.bigvgan.upsample2/downsample2 exactly):
  xp = edge_pad(x, 5, 5)
  up[2s]   = sum_j 2f[2j]   * xp[s+2+j]     (j = 0..5)
  up[2s+1] = sum_j 2f[2j+1] * xp[s+3+j]
  y[t]     = sum_j g[2j] * snake(up)[2(t+j)+1 - 5 .. ]  -- phase-resolved:
           = sum_j g[2j]*sO[t+j] + sum_j g[2j+1]*sE[t+j+1]
  where sE/sO are snake of the even/odd phases, E[m] = up[2(t0-3+m)],
  O[m] = up[2(t0-3+m)+1] for a block starting at output t0.

Boundary: the reference replicate-pads in UP space for the downsample
(resample.py:36-48), which crosses phases at the array ends.  The kernel
computes interior outputs only; the 3 leftmost / 3 rightmost samples (the
only ones that touch the up-space clamp) are recomputed with the unfused
XLA path on a 64-sample crop — exact, because those outputs depend only on
x within 5 samples of the true edge.

Training works through it: a custom_vjp re-expresses the backward with the
plain XLA composition (the kernel is inference-hot; vocoder training is
conv-bound).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_BT = 512  # output samples per block


def _filters():
    from usdm_tpu.models.bigvgan import kaiser_sinc_filter1d

    f = kaiser_sinc_filter1d(0.25, 0.3, 12)  # up (ratio 2, kernel 12)
    g = kaiser_sinc_filter1d(0.25, 0.3, 12)  # down
    return (2.0 * f[0::2], 2.0 * f[1::2], g[0::2], g[1::2])


def _snake_f32(x, a_ref, b_ref, logscale, snakebeta):
    a = a_ref[0].astype(jnp.float32)
    if snakebeta:
        b = b_ref[0].astype(jnp.float32)
    else:
        b = a
    if logscale:
        a = jnp.exp(a)
        b = jnp.exp(b)
    s = jnp.sin(x * a[None, :])
    return x + (1.0 / (b[None, :] + 1e-9)) * (s * s)


def _kernel(x0_ref, x1_ref, a_ref, b_ref, o_ref, *, bt, fe, fo, ge, go,
            logscale, snakebeta):
    # block ti's window is its own bt-tile plus a 16-sample halo block taken
    # from the head of tile ti+1 (two block-aligned views of the same padded
    # input; the halo view's block is only 16 samples, so each input sample
    # streams from HBM ~once, not twice)
    w = jnp.concatenate([x0_ref[0], x1_ref[0]], axis=0).astype(jnp.float32)
    n = bt + 6
    e = fe[0] * w[0:n]
    o = fo[0] * w[1 : 1 + n]
    for j in range(1, 6):
        e = e + fe[j] * w[j : j + n]
        o = o + fo[j] * w[j + 1 : j + 1 + n]
    se = _snake_f32(e, a_ref, b_ref, logscale, snakebeta)
    so = _snake_f32(o, a_ref, b_ref, logscale, snakebeta)
    y = ge[0] * so[0:bt] + go[0] * se[1 : 1 + bt]
    for j in range(1, 6):
        y = y + ge[j] * so[j : j + bt] + go[j] * se[j + 1 : j + 1 + bt]
    o_ref[0] = y.astype(o_ref.dtype)


def _tile_bt(t: int, c: int) -> int:
    """Output samples per block: capped so the f32 working set (window + 4
    snake phases + output, ~6 bt*c-sized f32 buffers) stays well under the
    ~16 MB VMEM even at BigVGAN's widest activation1d stage (C=768); a
    multiple of 16 (>= 16) so the 16-sample halo is exactly one (1, 16, c)
    block of the neighbor tile."""
    return max(16, min(_BT, t, (1 << 17) // c) // 16 * 16)


def _pallas_core(x, alpha, beta, logscale, snakebeta, interpret=False,
                 bt_override=None):
    """Fused sandwich over [B, T, C]; outputs t in [3, T-4] are exact,
    the 3 samples at each end are computed under interior (no up-space
    clamp) assumptions and must be patched by the caller."""
    bsz, t, c = x.shape
    bt = bt_override or _tile_bt(t, c)
    assert bt % 16 == 0, bt  # halo block alignment (see _tile_bt)
    n = pl.cdiv(t, bt)
    fe, fo, ge, go = _filters()
    # X[i] = xp[i-1] = x[i-6] (xp = pad5(x)); right pad to (n+1) whole tiles
    # so every block's halo tile ti+1 exists (covers the last block's 16-
    # sample halo plus the round-up)
    xe = jnp.pad(x, ((0, 0), (6, (n + 1) * bt - t - 6), (0, 0)), mode="edge")
    kern = partial(
        _kernel, bt=bt, fe=tuple(np.float32(v) for v in fe),
        fo=tuple(np.float32(v) for v in fo),
        ge=tuple(np.float32(v) for v in ge),
        go=tuple(np.float32(v) for v in go),
        logscale=logscale, snakebeta=snakebeta,
    )
    if beta is None:
        beta = alpha  # unused when snakebeta=False; keeps the arity static
    y = pl.pallas_call(
        kern,
        grid=(bsz, n),
        in_specs=[
            pl.BlockSpec((1, bt, c), lambda bi, ti: (bi, ti, 0)),
            # 16-sample halo: the head of tile ti+1, addressed in 16-row
            # block units (bt % 16 == 0 makes the offset block-aligned)
            pl.BlockSpec((1, 16, c),
                         lambda bi, ti, r=bt // 16: (bi, (ti + 1) * r, 0)),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, c), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, n * bt, c), x.dtype),
        interpret=interpret,
    )(xe, xe, alpha.reshape(1, c), beta.reshape(1, c))
    return y[:, :t]


def _xla_ref(x, alpha, beta, logscale, snakebeta):
    from usdm_tpu.models import bigvgan as BG

    y = BG.upsample2(x)
    if snakebeta:
        y = BG.snake_beta(y, alpha, beta, logscale)
    else:
        y = BG.snake(y, alpha, logscale)
    return BG.downsample2(y)


def _fused_fwd_impl(x, alpha, beta, logscale, snakebeta, interpret=False,
                    bt_override=None):
    t = x.shape[1]
    core = _pallas_core(x, alpha, beta, logscale, snakebeta, interpret,
                        bt_override)
    # exact edge recompute: outputs t<3 / t>=T-3 touch the up-space
    # replicate clamp the kernel skips; they depend only on x within 5
    # samples of the true edge, so a 64-sample crop reproduces them exactly
    el = _xla_ref(x[:, : min(64, t)], alpha, beta, logscale, snakebeta)
    er = _xla_ref(x[:, -min(64, t) :], alpha, beta, logscale, snakebeta)
    return jnp.concatenate([el[:, :3], core[:, 3:-3], er[:, -3:]], axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_activation1d(x, alpha, beta, logscale, snakebeta):
    """Anti-aliased snake sandwich up(2x)->snake->down(2x) in one Pallas
    pass on TPU (f32 compute); plain XLA composition elsewhere and for
    gradients.  x: [B, T, C]; alpha/beta: [C] (beta ignored for plain
    snake).  Matches models.bigvgan.activation1d.
    """
    if jax.devices()[0].platform == "tpu" and x.shape[1] >= 64:
        return _fused_fwd_impl(x, alpha, beta, logscale, snakebeta)
    return _xla_ref(x, alpha, beta, logscale, snakebeta)


def _vjp_fwd(x, alpha, beta, logscale, snakebeta):
    return (fused_activation1d(x, alpha, beta, logscale, snakebeta),
            (x, alpha, beta))


def _vjp_bwd(logscale, snakebeta, res, g):
    x, alpha, beta = res
    if beta is None:
        _, vjp = jax.vjp(
            lambda xx, aa: _xla_ref(xx, aa, None, logscale, snakebeta),
            x, alpha)
        dx, da = vjp(g)
        return dx, da, None
    _, vjp = jax.vjp(
        lambda xx, aa, bb: _xla_ref(xx, aa, bb, logscale, snakebeta),
        x, alpha, beta)
    return vjp(g)


fused_activation1d.defvjp(_vjp_fwd, _vjp_bwd)
