"""Phase-by-phase profile of the REAL product path on one TPU chip.

Reproduces bench.py's `bench_pipeline` setup (full 7B-int8/1B geometry, zero
weights, pinned stage budgets) but times every phase of
`UsdmPipeline.respond()` separately: wav load, XLS-R unit extraction, each
dialog stage (split into engine prefill vs decode wall time), the host gaps
between stages, Voicebox ODE, BigVGAN, wav write.  Feeds VERDICT r2 item 1
(publish the breakdown, then attack the biggest terms).

Run:  python scripts/profile_respond.py  (on the real chip)
"""

import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _zeros_like_shapes(shapes, dtype=None):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, dtype or s.dtype), shapes)


def main():
    from usdm_tpu.audio.wav import load_wav, write_wav
    from usdm_tpu.core.config import (BigVGANConfig, MelConfig, MistralConfig,
                                      VoiceboxConfig, XlsrConfig)
    from usdm_tpu.core.tokenizer import UsdmTokenizer
    from usdm_tpu.engine.server import PagedDialogPolicy
    from usdm_tpu.engine.synthesis import SpeechDecoder
    from usdm_tpu.models import bigvgan as BGV
    from usdm_tpu.models import mistral as M
    from usdm_tpu.models import voicebox as VB
    from usdm_tpu.models import xlsr as XL
    from usdm_tpu.models.quant import quantize_llm_params
    from usdm_tpu.ops.sampling import (STAGE_TEXT2TEXT, STAGE_TEXT2UNIT,
                                       STAGE_UNIT2TEXT)
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
    pipe = UsdmPipeline(tok, lm, lm_cfg, xl, xl_cfg,
                        SpeechDecoder(vb, vb_cfg, bv, bv_cfg, MelConfig()))

    budgets = {STAGE_UNIT2TEXT: 48, STAGE_TEXT2TEXT: 32, STAGE_TEXT2UNIT: 256}
    phases = {}
    stats_holder = {}

    class TimedPolicy(PagedDialogPolicy):
        def _run_stage(self, stage, prompt):
            self.max_new_tokens = budgets[stage]
            ids = self.tok.encode(prompt)
            eng = self.server.engine
            s0, e0 = eng.steps, eng.total_emitted
            t0 = time.time()
            out = super()._run_stage(stage, prompt)
            dt = time.time() - t0
            key = {STAGE_UNIT2TEXT: "stageA_unit2text",
                   STAGE_TEXT2TEXT: "stageB_text2text",
                   STAGE_TEXT2UNIT: "stageC_text2unit"}[stage]
            phases[key] = phases.get(key, 0.0) + dt
            phases.setdefault("_detail", []).append(
                dict(stage=key, s=round(dt, 3), prompt_toks=len(ids),
                     new_toks=len(out), steps=eng.steps - s0))
            return out

    def once(seed, record):
        eng_server = pipe._dialog_server()
        policy = TimedPolicy(eng_server, tok, top_k=0, temperature=1.0, seed=seed)
        wav_path = os.path.join(tempfile.mkdtemp(), "user.wav")
        write_wav(wav_path, (np.random.default_rng(0).standard_normal(48000) * 0.1
                             ).astype(np.float32), 16000)
        t_all = time.time()
        t0 = time.time()
        wav, _ = load_wav(wav_path, sr=pipe.xlsr_cfg.sample_rate)
        record["load_wav"] = time.time() - t0
        t0 = time.time()
        units = pipe.extract_units(wav)
        record["xlsr_units"] = time.time() - t0
        t0 = time.time()
        res = policy.respond_to_units(units)
        record["dialog_total"] = time.time() - t0
        stats_holder.update(eng_server.engine.stats())
        t0 = time.time()
        audio = pipe.decoder.synthesize(res.agent_units, jax.random.PRNGKey(seed),
                                        n_timesteps=50)
        np.asarray(audio.astype(jnp.float32))
        record["synthesis"] = time.time() - t0
        record["wall_total"] = time.time() - t_all
        record["n_units"] = len(res.agent_units)
        return res

    # warm-up (compiles); then the measured run with the same seed
    warm = {}
    once(1, warm)
    phases.clear()
    pipe._dialog_server().engine.perf.clear()
    rec = {}
    once(1, rec)
    pipe.close()

    n_units = rec["n_units"]
    audio_s = n_units * round(22050 / 50) / 22050.0
    stages = {k: v for k, v in phases.items() if not k.startswith("_")}
    host_gap = rec["dialog_total"] - sum(stages.values())
    print("\n=== respond() phase profile (seconds, steady-state) ===")
    for k in ("load_wav", "xlsr_units"):
        print(f"{k:24s} {rec[k]:7.3f}")
    for k, v in stages.items():
        print(f"{k:24s} {v:7.3f}")
    print(f"{'dialog host gap':24s} {host_gap:7.3f}")
    print(f"{'synthesis (VB+BGV)':24s} {rec['synthesis']:7.3f}")
    print(f"{'TOTAL':24s} {rec['wall_total']:7.3f}   audio {audio_s:.2f}s  "
          f"RTF {rec['wall_total'] / audio_s:.3f}")
    print("\nper-stage detail:")
    for d in phases.get("_detail", []):
        print(" ", d)
    print("\nengine perf_s:", stats_holder.get("perf_s"))


if __name__ == "__main__":
    main()
