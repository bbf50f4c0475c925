"""token-Voicebox: conditional-flow-matching mel generator, pure-functional JAX.

TPU-first rebuild of the reference decoder (/root/reference/src/decoder/
voicebox/model/voicebox.py + networks.py): a non-causal transformer estimator
(unit embedding ⊕ noisy mel ⊕ cond mel -> 1x1 conv in; sinusoidal timestep
*prepended as a pseudo-token*; two grouped-conv positional embeddings;
symmetric ALiBi with column 0 zeroed; 24 post-LN layers with UNet-style skip
connections through 12 linear combiners) and an OT-CFM objective with Euler /
Heun ODE sampling, classifier-free guidance by batch doubling, and per-step
speech-prompt renoising.

Differences from the reference implementation (same math):
  * internal layout is [B, T, C] (TPU-friendly; channels last), converted at
    the public API which keeps the reference's [B, n_feats, T] contract;
  * the 24 layers run as two `lax.scan`s (down path collecting skips, up path
    consuming them) instead of a Python loop;
  * solvers are `lax.fori_loop`s with threaded PRNG keys — the whole ODE
    solve jit-compiles to one XLA program.

Numeric contract (SURVEY.md §3): sigma_min=1e-4; CFG `(1+s)·c − s·u` with
s=1.0; Heun uses (n+1)//2 outer steps; prompt frames are renoised after every
solver update (voicebox.py:89-92,115-118).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from usdm_tpu.core.config import VoiceboxConfig
from usdm_tpu.models.quant import qmm

Params = Dict[str, Any]

_PREC = jax.lax.Precision.HIGHEST  # f32 model; keep dots exact


# ---------------------------------------------------------------------------
# Pieces
# ---------------------------------------------------------------------------


def alibi_slopes(n_heads: int) -> np.ndarray:
    """ALiBi head slopes (press et al. / xformers formula;
    reference networks.py:99-115)."""

    def pow2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * start**i for i in range(n)]

    if math.log2(n_heads).is_integer():
        return np.asarray(pow2(n_heads), np.float32)
    closest = 2 ** math.floor(math.log2(n_heads))
    base = pow2(closest)
    extra = alibi_slopes(2 * closest)[0::2][: n_heads - closest]
    return np.asarray(base + list(extra), np.float32)


def sinusoidal_time_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """[B] -> [B, dim]; matches reference SinusoidalPosEmb (networks.py:13-28):
    freq base log(10000)/(dim/2 - 1), concat(sin, cos)."""
    half = dim // 2
    freqs = jnp.exp(np.arange(half, dtype=np.float32) * -(math.log(10000.0) / (half - 1)))
    ang = scale * t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _gelu(x):
    # erf-form GELU (reference uses nn.functional.gelu default)
    return 0.5 * x * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def _layer_norm(x, w, b, eps=1e-5):
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)).astype(dt)) * w + b


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(cfg: VoiceboxConfig, key: jax.Array) -> Params:
    ks = iter(jax.random.split(key, 64))
    H, F, E, nf = cfg.hidden_size, cfg.intermediate_size, cfg.embedding_dim, cfg.n_feats
    L = cfg.num_layers

    def dense(k, fan_in, *shape):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    def layer_stack(fan_in, *shape):
        return dense(next(ks), fan_in, L, *shape)

    nheads = cfg.num_heads
    return {
        "embed": jax.random.normal(next(ks), (cfg.n_tokens + 1, E), jnp.float32),
        # 1x1 convs as dense [Cin, Cout] (+bias)
        "proj_in_w": dense(next(ks), 2 * nf + E, 2 * nf + E, H),
        "proj_in_b": jnp.zeros((H,), jnp.float32),
        "proj_out_w": dense(next(ks), H, H, nf),
        "proj_out_b": jnp.zeros((nf,), jnp.float32),
        # convpos: depth x grouped conv [width, H/groups, H] (+bias)
        "convpos_w": dense(next(ks), H * cfg.convpos_width // cfg.convpos_groups,
                           cfg.convpos_depth, cfg.convpos_width, H // cfg.convpos_groups, H),
        "convpos_b": jnp.zeros((cfg.convpos_depth, H), jnp.float32),
        "ln0_w": jnp.ones((H,), jnp.float32),
        "ln0_b": jnp.zeros((H,), jnp.float32),
        "layers": {
            "wq": layer_stack(H, H, H), "bq": jnp.zeros((L, H)),
            "wk": layer_stack(H, H, H), "bk": jnp.zeros((L, H)),
            "wv": layer_stack(H, H, H), "bv": jnp.zeros((L, H)),
            "wo": layer_stack(H, H, H), "bo": jnp.zeros((L, H)),
            "ln1_w": jnp.ones((L, H)), "ln1_b": jnp.zeros((L, H)),
            "ffn_w1": layer_stack(H, H, F), "ffn_b1": jnp.zeros((L, F)),
            "ffn_w2": layer_stack(F, F, H), "ffn_b2": jnp.zeros((L, H)),
            "ln2_w": jnp.ones((L, H)), "ln2_b": jnp.zeros((L, H)),
        },
        # 12 skip combiners [2H -> H]
        "skip_w": dense(next(ks), 2 * H, L // 2, 2 * H, H),
        "skip_b": jnp.zeros((L // 2, H)),
    }


# ---------------------------------------------------------------------------
# Estimator
# ---------------------------------------------------------------------------


def _attention(lp, x, bias, n_heads):
    """Post-LN wav2vec2-style MHA (reference networks.py:119-210): q scaled
    before the dot, additive bias = masked ALiBi + pad penalty."""
    b, t, hdim = x.shape
    d = hdim // n_heads
    q = (qmm(x, lp["wq"]) + lp["bq"]) * (d**-0.5)
    k = qmm(x, lp["wk"]) + lp["bk"]
    v = qmm(x, lp["wv"]) + lp["bv"]
    q = q.reshape(b, t, n_heads, d)
    k = k.reshape(b, t, n_heads, d)
    v = v.reshape(b, t, n_heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=_PREC,
                        preferred_element_type=jnp.float32)
    scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=_PREC)
    return qmm(out.reshape(b, t, hdim), lp["wo"]) + lp["bo"]


def _attention_flash(lp, x, seg, pos, n_heads):
    """Flash-kernel attention path: ALiBi/pad masking computed in-kernel from
    positions + per-head slopes — no [B, H, T, T] bias materialization."""
    from usdm_tpu.ops.flash_attention import flash_attention

    b, t, hdim = x.shape
    d = hdim // n_heads
    q = (qmm(x, lp["wq"]) + lp["bq"]).reshape(b, t, n_heads, d)
    k = (qmm(x, lp["wk"]) + lp["bk"]).reshape(b, t, n_heads, d)
    v = (qmm(x, lp["wv"]) + lp["bv"]).reshape(b, t, n_heads, d)
    out = flash_attention(
        q, k, v, seg, seg, pos, pos, causal=False, sliding_window=None,
        scale=d**-0.5, alibi=True,
    )
    return qmm(out.reshape(b, t, hdim), lp["wo"]) + lp["bo"]


def _encoder_layer(cfg, lp, x, y_mask, bias, flash_ctx=None, ln_lengths=None):
    """Post-LN block (networks.py:250-266): residual attn -> mask -> LN ->
    +FFN -> mask -> final LN -> mask.

    With `ln_lengths` set (TPU, large activations), the residual-add +
    pad-mask + f32 LayerNorm sequences run as ONE fused Pallas pass each
    (ops.fused_ln.add_mask_ln).  XLA already fuses the LN reduction into the
    matmul epilogues, so this only wins where the residual+mask
    materialization's extra HBM pass dominates (see estimator()'s auto
    gate).  Same numerics — f32 statistics, bf16 scale/shift."""
    x = x * y_mask
    if flash_ctx is not None:
        seg, pos = flash_ctx
        attn = _attention_flash(lp, x, seg, pos, cfg.num_heads)
    else:
        attn = _attention(lp, x, bias, cfg.num_heads)
    if ln_lengths is not None:
        from usdm_tpu.ops.fused_ln import add_mask_ln

        h = add_mask_ln(x, attn, ln_lengths, lp["ln1_w"], lp["ln1_b"])
        ff = qmm(_gelu(qmm(h, lp["ffn_w1"]) + lp["ffn_b1"]), lp["ffn_w2"]) + lp["ffn_b2"]
        return add_mask_ln(h, ff, ln_lengths, lp["ln2_w"], lp["ln2_b"],
                           post_mask=True)
    h = x + attn
    h = h * y_mask
    h = _layer_norm(h, lp["ln1_w"], lp["ln1_b"])
    ff = qmm(_gelu(qmm(h, lp["ffn_w1"]) + lp["ffn_b1"]), lp["ffn_w2"]) + lp["ffn_b2"]
    h = h + ff
    h = h * y_mask
    h = _layer_norm(h, lp["ln2_w"], lp["ln2_b"])
    return h * y_mask


def _conv_pos_embed(w, b, x, y_mask, groups, width):
    """Grouped same-conv + erf-GELU + mask (networks.py:67-95).
    x: [B, T, H]; w: [width, H/groups, H]."""
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(width // 2, width // 2 - (1 if width % 2 == 0 else 0))],
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=groups,
        precision=_PREC,
    ) + b
    return _gelu(out) * y_mask


def estimator(
    params: Params,
    cfg: VoiceboxConfig,
    x_units: jnp.ndarray,  # [B, T] int unit ids (n_tokens = null/CFG token)
    y: jnp.ndarray,  # [B, n_feats, T] noisy mel
    cond: jnp.ndarray,  # [B, n_feats, T] conditioning mel (zeros when unconditioned)
    t: jnp.ndarray,  # [B] flow time in [0, 1]
    lengths: jnp.ndarray,  # [B] valid frames
    remat: bool = False,  # checkpoint each layer (training at 16 s crops
    # needs it: the scan otherwise saves [L/2, B, H, T, T] attention probs)
    attn_impl: str = "auto",  # auto | flash | xla
    fused_ln: str = "auto",  # auto | fused | xla: fused residual+mask+LN
    # Pallas pass (ops.fused_ln) — auto uses it on TPU when H tiles
) -> jnp.ndarray:
    """Vector-field estimate u(x, y, cond, t) -> [B, n_feats, T]."""
    b, T = x_units.shape
    H = cfg.hidden_size
    cdt = params["proj_in_w"].dtype  # compute dtype follows the params
    # normalize every floating leaf (biases, norms) to the compute dtype so
    # mixed-precision callers can cast only the big weights
    params = jax.tree.map(
        lambda a: a.astype(cdt) if jnp.issubdtype(a.dtype, jnp.floating) else a, params
    )

    emb = params["embed"][x_units] * math.sqrt(cfg.embedding_dim)  # [B, T, E]
    feats = jnp.concatenate(
        [emb, jnp.swapaxes(y, 1, 2).astype(cdt), jnp.swapaxes(cond, 1, 2).astype(cdt)], axis=-1
    )
    h = feats @ params["proj_in_w"] + params["proj_in_b"]  # [B, T, H]

    # prepend timestep pseudo-token (networks.py:312-313)
    t_tok = sinusoidal_time_emb(t.reshape(b), H).astype(cdt)[:, None, :]  # [B, 1, H]
    h = jnp.concatenate([t_tok, h], axis=1)  # [B, T+1, H]
    T1 = T + 1
    lengths1 = lengths + 1

    frame_idx = jnp.arange(T1)[None, :]
    valid = frame_idx < lengths1[:, None]  # [B, T+1]
    y_mask = valid.astype(h.dtype)[:, :, None]  # [B, T+1, 1]

    # zero padded frames before the conv position embedding (networks.py:332-333)
    h = h * y_mask

    # symmetric ALiBi, column 0 zeroed (networks.py:319-325), pad columns
    # masked.  On TPU the bias is computed inside the flash kernel from
    # positions + per-head slopes; the XLA path materializes it
    # ([B, Hh, T1, T1]) as the reference does (networks.py:337-341).
    pow2_heads = cfg.num_heads & (cfg.num_heads - 1) == 0
    if attn_impl == "auto":
        use_flash = jax.devices()[0].platform == "tpu" and T1 >= 128 and pow2_heads
    else:
        use_flash = attn_impl == "flash"
    flash_ctx = None
    bias = None
    if use_flash:
        seg = jnp.where(valid, 0, -1).astype(jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(T1)[None], (b, T1))
        flash_ctx = (seg, pos)
    else:
        slopes = -alibi_slopes(cfg.num_heads)
        dist = np.abs(np.arange(T1)[None, :] - np.arange(T1)[:, None]).astype(np.float32)
        alibi = jnp.asarray(slopes)[:, None, None] * jnp.asarray(dist)[None]  # [Hh, T1, T1]
        alibi = alibi.at[:, :, 0].set(0.0)
        alibi_bias = alibi[None] * y_mask[:, None, :, 0][:, :, None, :]  # [B, Hh, T1, T1]
        pad_bias = jnp.where(valid[:, None, None, :], 0.0, jnp.finfo(h.dtype).min)
        bias = alibi_bias + pad_bias

    pos_res = h
    for i in range(cfg.convpos_depth):
        h = _conv_pos_embed(
            params["convpos_w"][i], params["convpos_b"][i], h, y_mask,
            cfg.convpos_groups, cfg.convpos_width,
        )
    h = h + pos_res
    h = _layer_norm(h, params["ln0_w"], params["ln0_b"])
    h = h * y_mask

    half = cfg.num_layers // 2
    lp_all = params["layers"]
    lp_down = jax.tree.map(lambda a: a[:half], lp_all)
    lp_up = jax.tree.map(lambda a: a[half:], lp_all)

    from functools import partial as _partial

    if fused_ln == "auto":
        # Measured on v5e (scripts/trace_estimator.py methodology): XLA
        # already fuses the f32 LN reductions into the matmul epilogues
        # (convert_reduce_fusion = FFN matmul + LN), so the kernel only wins
        # once activations are large enough that the extra HBM pass XLA
        # spends on the residual+mask materialization dominates its launch
        # cost: b4/t897 -2.3%, b8/t897 -4.1%; b2-4/t449 -1.5% (worse).
        use_fused = (
            jax.devices()[0].platform == "tpu"
            and H % 128 == 0
            and b * (T + 1) >= 3072
        )
    else:
        use_fused = fused_ln == "fused"
    ln_lengths = lengths1 if use_fused else None

    layer_fn = _partial(_encoder_layer, cfg, ln_lengths=ln_lengths)
    if remat:
        layer_fn = jax.checkpoint(layer_fn)

    # down path: emit each layer's INPUT as its skip entry, so the stack is
    # [h_pre, out_0, ..., out_{half-2}] exactly as the reference builds it
    # (networks.py:352-360); popping LIFO == consuming in reverse order.
    def down_step(h, lp):
        new_h = layer_fn(lp, h, y_mask, bias, flash_ctx)
        return new_h, h

    h, skips = jax.lax.scan(down_step, h, lp_down)

    def up_step(h, xs):
        lp, sw, sb, skip = xs
        h = qmm(jnp.concatenate([h, skip], axis=-1), sw) + sb
        h = layer_fn(lp, h, y_mask, bias, flash_ctx)
        return h, None

    rev_skips = jax.tree.map(lambda a: a[::-1], skips)
    h, _ = jax.lax.scan(up_step, h, (lp_up, params["skip_w"], params["skip_b"], rev_skips))

    h = h * y_mask
    out = h @ params["proj_out_w"] + params["proj_out_b"]  # [B, T+1, n_feats]
    out = out * y_mask
    return jnp.swapaxes(out, 1, 2)[:, :, 1:]  # drop the time token


# ---------------------------------------------------------------------------
# CFM objective + ODE sampling
# ---------------------------------------------------------------------------


def cfm_loss(
    params: Params,
    cfg: VoiceboxConfig,
    x_units: jnp.ndarray,  # [B, T]
    mask: jnp.ndarray,  # [B, 1, T] 1 = frame given as infilling context
    x1: jnp.ndarray,  # [B, n_feats, T] target mel
    lengths: jnp.ndarray,  # [B]
    key: jax.Array,
    t: Optional[jnp.ndarray] = None,
    z: Optional[jnp.ndarray] = None,
    remat: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """OT-CFM loss on non-context frames (reference voicebox.py:28-49):
    y = (1-(1-σ)t)z + t·x1, target u = x1 - (1-σ)z, cond = x1·mask,
    MSE over valid ∧ ¬context frames."""
    kt, kz = jax.random.split(key)
    b, nf, T = x1.shape
    if t is None:
        t = jax.random.uniform(kt, (b,), x1.dtype)
    if z is None:
        z = jax.random.normal(kz, x1.shape, x1.dtype)
    t3 = t[:, None, None]

    loss_mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x1.dtype)[:, None, :]
    y = (1.0 - (1.0 - cfg.sigma_min) * t3) * z + t3 * x1
    cond = x1 * mask
    u = x1 - (1.0 - cfg.sigma_min) * z

    ue = estimator(params, cfg, x_units, y, cond, t, lengths, remat=remat)

    loss_mask = loss_mask * (1.0 - mask)
    diff = (ue - u) * loss_mask
    denom = jnp.maximum(jnp.sum(loss_mask) * nf, 1.0)
    loss = jnp.sum(diff * diff) / denom
    return loss, {"loss": loss, "nframes": jnp.sum(loss_mask)}


def _cfg_estimate(params, cfg, x, z, cond, lengths, t, gradient_scale,
                  fused_ln="auto"):
    """CFG by batch doubling (voicebox.py:60-71): row block 0 = unconditional
    (null units, zero cond), block 1 = conditional; combine (1+s)c - s·u."""
    if gradient_scale <= 0:
        return estimator(params, cfg, x, z, cond, t, lengths, fused_ln=fused_ln)
    b = x.shape[0]
    x2 = jnp.concatenate([jnp.full_like(x, cfg.n_tokens), x], axis=0)
    z2 = jnp.concatenate([z, z], axis=0)
    c2 = jnp.concatenate([jnp.zeros_like(cond), cond], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    l2 = jnp.concatenate([lengths, lengths], axis=0)
    d = estimator(params, cfg, x2, z2, c2, t2, l2, fused_ln=fused_ln)
    d_un, d_cond = d[:b], d[b:]
    return d_cond + gradient_scale * (d_cond - d_un)


def _renoise_prompt(z, cond, t, prompt_len, sigma_min, noise):
    """Re-noise the prompt region to flow-time t (voicebox.py:89-92)."""
    prompt = (1.0 - (1.0 - sigma_min) * t) * noise + t * cond
    frame = jnp.arange(z.shape[-1])[None, None, :]
    return jnp.where(frame < prompt_len, prompt, z)


@partial(
    jax.jit,
    static_argnames=("cfg", "n_timesteps", "solver", "gradient_scale", "speech_prompt",
                     "fused_ln"),
)
def generate(
    params: Params,
    cfg: VoiceboxConfig,
    x_units: jnp.ndarray,  # [B, T]
    cond: jnp.ndarray,  # [B, n_feats, T]; ref mel in prompt region, zeros after
    lengths: jnp.ndarray,  # [B]
    key: jax.Array,
    n_timesteps: int = 50,
    solver: str = "heun",
    gradient_scale: float = 1.0,
    speech_prompt: bool = False,
    prompt_len: int | jnp.ndarray = 0,
    z: Optional[jnp.ndarray] = None,
    prompt_noises: Optional[jnp.ndarray] = None,
    fused_ln: str = "auto",  # see estimator()
) -> jnp.ndarray:
    """Sample mel by solving the probability-flow ODE from z ~ N(0, I).

    Matches reference CFM.generate (voicebox.py:140-150): heun halves the
    step count ((n+1)//2); without a speech prompt `cond` is zeroed.

    `z` (initial noise, cond-shaped) and `prompt_noises` ([n_steps, 2] +
    cond.shape renoise draws — [i, 0] after the predictor, [i, 1] after the
    corrector) override the PRNG draws; the golden-parity tests inject the
    reference torch implementation's exact noise sequence through them.
    """
    kz, kloop = jax.random.split(key)
    # ODE state stays f32 regardless of the parameter dtype; the estimator
    # casts its inputs to the compute dtype internally.
    cond = cond.astype(jnp.float32)
    if z is None:
        z = jax.random.normal(kz, cond.shape, jnp.float32)
    z = z.astype(jnp.float32)
    if solver == "heun":
        n_steps = (n_timesteps + 1) // 2
    else:
        n_steps = n_timesteps
    ts = jnp.linspace(0.0, 1.0, n_steps + 1)

    if not speech_prompt:
        cond = jnp.zeros_like(cond)
        prompt_len = 0
    prompt_len = jnp.asarray(prompt_len)

    sm = cfg.sigma_min

    def _prompt_noise(key, i, j):
        if prompt_noises is not None:
            return prompt_noises[i, j].astype(jnp.float32)
        return jax.random.normal(key, cond.shape, jnp.float32)

    def euler_step(i, carry):
        z, key = carry
        key, k1 = jax.random.split(key)
        t0, t1 = ts[i], ts[i + 1]
        dt = t1 - t0
        tb = jnp.full((z.shape[0],), t0, z.dtype)
        dphi = _cfg_estimate(params, cfg, x_units, z, cond, lengths, tb, gradient_scale, fused_ln)
        z = z + dt * dphi.astype(jnp.float32)
        if speech_prompt:
            z = _renoise_prompt(z, cond, t1, prompt_len, sm, _prompt_noise(k1, i, 0))
        return z, key

    def heun_step(i, carry):
        z, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        t0, t1 = ts[i], ts[i + 1]
        dt = t1 - t0
        tb0 = jnp.full((z.shape[0],), t0, z.dtype)
        dphi = _cfg_estimate(params, cfg, x_units, z, cond, lengths, tb0, gradient_scale, fused_ln).astype(jnp.float32)
        z_hat = z + dt * dphi
        if speech_prompt:
            z_hat = _renoise_prompt(z_hat, cond, t1, prompt_len, sm, _prompt_noise(k1, i, 0))

        def correct(z_hat):
            tb1 = jnp.full((z.shape[0],), t1, z.dtype)
            dphi_hat = _cfg_estimate(params, cfg, x_units, z_hat, cond, lengths, tb1, gradient_scale, fused_ln).astype(jnp.float32)
            out = z + dt * (dphi + dphi_hat) / 2.0
            if speech_prompt:
                out = _renoise_prompt(out, cond, t1, prompt_len, sm, _prompt_noise(k2, i, 1))
            return out

        # reference skips the corrector on the final step (voicebox.py:120-129)
        z = jax.lax.cond(i < n_steps - 1, correct, lambda zh: zh, z_hat)
        return z, key

    step = heun_step if solver == "heun" else euler_step
    z, _ = jax.lax.fori_loop(0, n_steps, step, (z, kloop))
    return z


# ---------------------------------------------------------------------------
# Reference checkpoint conversion (HubMixin Voicebox state dict)
# ---------------------------------------------------------------------------


def _fold_weight_norm(state: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    """Fold torch weight_norm(conv, dim=2): w = g * v / ||v||_{dims 0,1}."""
    if f"{prefix}.weight" in state:
        return np.asarray(state[f"{prefix}.weight"])
    if f"{prefix}.weight_g" in state:
        g = np.asarray(state[f"{prefix}.weight_g"])
        v = np.asarray(state[f"{prefix}.weight_v"])
    else:
        g = np.asarray(state[f"{prefix}.parametrizations.weight.original0"])
        v = np.asarray(state[f"{prefix}.parametrizations.weight.original1"])
    norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def convert_reference_state_dict(state: Dict[str, np.ndarray], cfg: VoiceboxConfig) -> Params:
    """Map the reference Voicebox state dict (estimator.* naming from
    networks.py:270-300) to our params.

    torch Linear [out, in] -> ours [in, out]; torch Conv1d [out, in/g, w] ->
    ours [w, in/g, out]; 1x1 convs become dense matrices.
    """
    pre = "estimator."

    def lin(name):
        return np.asarray(state[pre + name + ".weight"]).T.astype(np.float32)

    def bias(name):
        return np.asarray(state[pre + name + ".bias"]).astype(np.float32)

    def conv1x1(name):
        w = np.asarray(state[pre + name + ".weight"])  # [out, in, 1]
        return w[:, :, 0].T.astype(np.float32)

    L = cfg.num_layers

    def stack_lin(fmt):
        return jnp.asarray(np.stack([lin(fmt.format(i)) for i in range(L)]))

    def stack_bias(fmt):
        return jnp.asarray(np.stack([bias(fmt.format(i)) for i in range(L)]))

    def stack_raw(fmt, field):
        return jnp.asarray(
            np.stack([np.asarray(state[pre + fmt.format(i) + "." + field]).astype(np.float32) for i in range(L)])
        )

    convpos_w = np.stack(
        [
            _fold_weight_norm(state, pre + f"pos_conv_embeds.{i}.conv").transpose(2, 1, 0).astype(np.float32)
            for i in range(cfg.convpos_depth)
        ]
    )
    convpos_b = np.stack(
        [np.asarray(state[pre + f"pos_conv_embeds.{i}.conv.bias"]).astype(np.float32) for i in range(cfg.convpos_depth)]
    )

    nh = L // 2
    return {
        "embed": jnp.asarray(np.asarray(state[pre + "embed.weight"]).astype(np.float32)),
        "proj_in_w": jnp.asarray(conv1x1("proj_in")),
        "proj_in_b": jnp.asarray(bias("proj_in")),
        "proj_out_w": jnp.asarray(conv1x1("proj_out")),
        "proj_out_b": jnp.asarray(bias("proj_out")),
        "convpos_w": jnp.asarray(convpos_w),
        "convpos_b": jnp.asarray(convpos_b),
        "ln0_w": jnp.asarray(np.asarray(state[pre + "layer_norm.weight"]).astype(np.float32)),
        "ln0_b": jnp.asarray(np.asarray(state[pre + "layer_norm.bias"]).astype(np.float32)),
        "layers": {
            "wq": stack_lin("layers.{}.attention.q_proj"),
            "bq": stack_bias("layers.{}.attention.q_proj"),
            "wk": stack_lin("layers.{}.attention.k_proj"),
            "bk": stack_bias("layers.{}.attention.k_proj"),
            "wv": stack_lin("layers.{}.attention.v_proj"),
            "bv": stack_bias("layers.{}.attention.v_proj"),
            "wo": stack_lin("layers.{}.attention.out_proj"),
            "bo": stack_bias("layers.{}.attention.out_proj"),
            "ln1_w": stack_raw("layers.{}.layer_norm", "weight"),
            "ln1_b": stack_raw("layers.{}.layer_norm", "bias"),
            "ffn_w1": stack_lin("layers.{}.feed_forward.intermediate_dense"),
            "ffn_b1": stack_bias("layers.{}.feed_forward.intermediate_dense"),
            "ffn_w2": stack_lin("layers.{}.feed_forward.output_dense"),
            "ffn_b2": stack_bias("layers.{}.feed_forward.output_dense"),
            "ln2_w": stack_raw("layers.{}.final_layer_norm", "weight"),
            "ln2_b": stack_raw("layers.{}.final_layer_norm", "bias"),
        },
        "skip_w": jnp.asarray(np.stack([lin(f"skip_connections_layers.{i}") for i in range(nh)])),
        "skip_b": jnp.asarray(np.stack([bias(f"skip_connections_layers.{i}") for i in range(nh)])),
    }
