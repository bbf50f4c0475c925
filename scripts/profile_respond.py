"""Phase-by-phase profile of the REAL product path (`UsdmPipeline.respond()`)
at full 7B-int8/1B geometry on one TPU chip.

Two passes:
  1. UNINSTRUMENTED: total wall (same as bench.py e2e_pipeline_rtf).
  2. INSTRUMENTED: hard device syncs after each phase so every term is
     attributed — XLS-R, per-stage prefill ticks, per-stage decode chains,
     host templating/handoff gaps, Voicebox ODE, BigVGAN.

Writes a JSON report to /tmp/profile_respond.json and prints it.
"""

import json
import os
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _zeros_like_shapes(shapes, dtype=None):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, dtype or s.dtype), shapes)


def build_pipe():
    from usdm_tpu.core.config import (BigVGANConfig, MelConfig, MistralConfig,
                                      VoiceboxConfig, XlsrConfig)
    from usdm_tpu.core.tokenizer import UsdmTokenizer
    from usdm_tpu.engine.synthesis import SpeechDecoder
    from usdm_tpu.models import bigvgan as BGV
    from usdm_tpu.models import mistral as M
    from usdm_tpu.models import voicebox as VB
    from usdm_tpu.models import xlsr as XL
    from usdm_tpu.models.quant import quantize_llm_params
    from usdm_tpu.pipeline import UsdmPipeline

    tok = UsdmTokenizer.build_synthetic_full()
    lm_cfg = MistralConfig()
    lm = _zeros_like_shapes(jax.eval_shape(
        lambda: quantize_llm_params(M.init_params(lm_cfg, jax.random.PRNGKey(0)))))
    xl_cfg = XlsrConfig()
    xl = _zeros_like_shapes(
        jax.eval_shape(lambda: XL.init_params(xl_cfg, jax.random.PRNGKey(1))), jnp.bfloat16)
    vb_cfg = VoiceboxConfig()
    vb = _zeros_like_shapes(
        jax.eval_shape(lambda: VB.init_params(vb_cfg, jax.random.PRNGKey(2))), jnp.bfloat16)
    bv_cfg = BigVGANConfig()
    bv = _zeros_like_shapes(
        jax.eval_shape(lambda: BGV.init_generator(bv_cfg, jax.random.PRNGKey(3))), jnp.bfloat16)
    return UsdmPipeline(tok, lm, lm_cfg, xl, xl_cfg,
                        SpeechDecoder(vb, vb_cfg, bv, bv_cfg, MelConfig()))


def make_policy(pipe, seed):
    from usdm_tpu.engine.server import PagedDialogPolicy
    from usdm_tpu.ops.sampling import STAGE_TEXT2TEXT, STAGE_TEXT2UNIT, STAGE_UNIT2TEXT

    budgets = {STAGE_UNIT2TEXT: 48, STAGE_TEXT2TEXT: 32, STAGE_TEXT2UNIT: 256}

    class BudgetedPolicy(PagedDialogPolicy):
        def _run_stage(self, stage, prompt):
            self.max_new_tokens = budgets[stage]
            return super()._run_stage(stage, prompt)

    return BudgetedPolicy(pipe._dialog_server(), pipe.tokenizer, top_k=0,
                          temperature=1.0, seed=seed)


def main():
    report = {}
    pipe = build_pipe()

    wav_path = os.path.join(tempfile.mkdtemp(), "user.wav")
    from usdm_tpu.audio.wav import write_wav
    write_wav(wav_path, (np.random.default_rng(0).standard_normal(48000) * 0.1).astype(np.float32), 16000)

    # ---- pass 1: uninstrumented total (warm-up + timed, same seed) ----
    def once(seed):
        policy = make_policy(pipe, seed)
        t0 = time.time()
        res = pipe.respond_with_policy(policy, wav_path, n_timesteps=50, seed=seed)
        return time.time() - t0, res

    t_warm0 = time.time()
    _, res0 = once(1)
    report["warmup_s"] = round(time.time() - t_warm0, 3)
    wall, res = once(1)
    n_units = len(res.agent_units)
    report["total_wall_s"] = round(wall, 4)
    report["n_units"] = n_units
    audio_s = n_units * round(22050 / 50) / 22050.0
    report["audio_s"] = round(audio_s, 3)
    report["rtf_uninstrumented"] = round(wall / audio_s, 4)
    report["stage_tokens"] = {k: len(v) for k, v in res.stage_tokens.items()}

    # ---- pass 2: instrumented (syncs added per phase) ----
    from usdm_tpu.engine import paged as P

    eng = pipe._dialog_server().engine
    phases = {"prefill": 0.0, "chain": 0.0, "admit": 0.0}
    counters = {"prefill_ticks": 0, "chains": 0, "chain_steps": 0, "ticks": 0,
                "chain_lens": []}

    def sync(x=None):
        jax.device_get(jnp.zeros(()) if x is None else x)

    orig_prefill = P.PagedEngine._prefill_tick
    orig_chain = P.PagedEngine.step_chain
    orig_admit = P.PagedEngine._try_admit

    def prefill_tick(self):
        had = bool(self.prefill_order)
        t0 = time.time()
        orig_prefill(self)
        if had:
            sync(self.kv.k_pages[0, 0, 0, 0])
            phases["prefill"] += time.time() - t0
            counters["prefill_ticks"] += 1

    def step_chain(self, n):
        t0 = time.time()
        out = orig_chain(self, n)
        phases["chain"] += time.time() - t0  # orig_chain ends with a host sync
        counters["chains"] += 1
        counters["chain_steps"] += int(self.steps) - counters.get("_last_steps", 0)
        counters["_last_steps"] = int(self.steps)
        counters["chain_lens"].append(int(self.steps))
        return out

    def try_admit(self):
        t0 = time.time()
        orig_admit(self)
        phases["admit"] += time.time() - t0

    P.PagedEngine._prefill_tick = prefill_tick
    P.PagedEngine.step_chain = step_chain
    P.PagedEngine._try_admit = try_admit

    # stage-level timing: wrap the policy's generate calls
    stage_times = {}
    gaps = {"pre_generate_host": 0.0}

    policy = make_policy(pipe, 1)
    orig_gen = policy.server.generate

    def gen_wrap(*a, **kw):
        t0 = time.time()
        out = orig_gen(*a, **kw)
        stage_times.setdefault("stages", []).append(round(time.time() - t0, 4))
        return out

    policy.server.generate = gen_wrap

    from usdm_tpu.audio.wav import load_wav
    t_all0 = time.time()
    wav, _ = load_wav(wav_path, sr=pipe.xlsr_cfg.sample_rate)
    t0 = time.time()
    user_units = pipe.extract_units(wav)
    report["xlsr_s"] = round(time.time() - t0, 4)

    from usdm_tpu.engine.dialog import run_dialog
    t0 = time.time()
    result = run_dialog(pipe.tokenizer, policy._run_stage, user_units)
    # respond_to_units adds session mgmt; replicate
    report["dialog_s"] = round(time.time() - t0, 4)

    t0 = time.time()
    from usdm_tpu.models import voicebox as VB
    from usdm_tpu.models import bigvgan as BGV
    from usdm_tpu.audio.units import expand_and_pool
    mc = pipe.decoder.mel_cfg
    agent_units, _ = expand_and_pool(np.asarray(result.agent_units), mc.sampling_rate,
                                     mc.token_sr, mc.hop_size)
    x = jnp.asarray(agent_units[None].astype(np.int32))
    cond = jnp.zeros((1, mc.num_mels, len(agent_units)), jnp.float32)
    mel = VB.generate(pipe.decoder.voicebox_params, pipe.decoder.voicebox_cfg, x, cond,
                      jnp.asarray([len(agent_units)]), jax.random.PRNGKey(1),
                      n_timesteps=50, solver="heun", gradient_scale=1.0)
    sync(mel[0, 0, 0])
    report["voicebox_s"] = round(time.time() - t0, 4)
    t0 = time.time()
    from usdm_tpu.audio.mel import denormalize_mel
    wav_out = BGV.generator(pipe.decoder.vocoder_params, pipe.decoder.vocoder_cfg,
                            denormalize_mel(mel, mc).astype(jnp.bfloat16))
    np.asarray(wav_out.astype(jnp.float32))
    report["bigvgan_s"] = round(time.time() - t0, 4)
    report["instrumented_total_s"] = round(time.time() - t_all0, 4)

    report["engine_phases"] = {k: round(v, 4) for k, v in phases.items()}
    counters.pop("chain_lens", None)
    counters.pop("_last_steps", None)
    report["engine_counters"] = counters
    report["stage_generate_s"] = stage_times.get("stages", [])
    report["engine_stats"] = eng.stats()

    # decode accounting: chain time vs tokens
    steps = report["engine_stats"]["steps"]
    if steps:
        report["ms_per_decode_token"] = round(1000.0 * phases["chain"] / max(steps, 1), 3)

    pipe.close()
    print(json.dumps(report, indent=1))
    with open("/tmp/profile_respond.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
