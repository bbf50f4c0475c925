"""Draft-free ngram (prompt-lookup) speculation vs plain chained decode.

Measures the b=1 7B-int8 engine at stage-C-like geometry (1219-token
context, 256 new tokens — the unit stage is 2.80 s of the 4.67 s turn) in
three weight regimes, because ngram acceptance is entirely a property of
how repetitive the DECODED stream is (vLLM's prompt-lookup analog —
reference inference_vllm.py:109; unit streams are 50 Hz with no dedup, so
real checkpoints repeat heavily — SURVEY §3, decoder/scripts/preprocess.py:40):

  zero    — zero weights: greedy emits a constant token (maximal repetition;
            the acceptance CEILING and the bench.py weight regime)
  random  — random weights: greedy usually falls into a short attractor
            cycle; acceptance is whatever the cycle structure gives

The worthless-proposal FLOOR stays the bench_spec_degraded number (30 tok/s
of pure round overhead with a model draft; ngram rounds are cheaper — no
draft forward — so their floor is higher).

Losslessness on chip: exact token identity is asserted for the zero regime.
In the random regime the two paths CAN diverge: the single-query Pallas
decode kernel and the batched verify forward round attention differently,
and over 32 layers at 1.2k context the accumulated difference shifts
logits by a noticeable fraction of their spread — random weights leave
top-1 margins of the same order, so argmax flips.  Measured on chip
(2026-08-19): first divergence at emitted index 2; the cross-impl logit
noise at that position is RMS 0.37 (logit std 1.27), and two DENSE
forwards differing only in attention impl (xla vs flash) flip argmax
between the very same two tokens (flash sides with the decode kernel's
choice, xla with verify's) — the divergence is ordinary cross-kernel
rounding, with no speculation machinery involved.  Real checkpoints have peaked logits (margins of
units, not tenths), so flips are far rarer there; CPU tests pin exact
equality under matched kernels/precision (tests/test_paged.py
test_ngram_output_equals_greedy).  vLLM's greedy spec decode carries the
same matched-kernel caveat.  The random regime therefore VERIFIES any
divergence is a tie-flip (under an independent dense forward, both tokens
must sit within 0.5 logit-std of the argmax — inside the measured
cross-kernel noise band) instead of asserting bit-equality — a real
acceptance bug emits a token far below the top and fails that check.

Run: python scripts/bench_ngram.py            (on the real chip)
"""

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    import jax.numpy as jnp

    from usdm_tpu.core.config import EngineConfig, MistralConfig
    from usdm_tpu.engine.paged import PagedEngine, Request
    from usdm_tpu.models import mistral as M
    from usdm_tpu.models.quant import quantize_llm_params

    cfg = MistralConfig()
    rng = np.random.default_rng(0)
    allow = np.ones(cfg.vocab_size, bool)
    allow[:3] = False  # EOS unreachable: measure the budget-bound steady state
    plen, n_new = 1219, 256
    prompt = rng.integers(3, 32000, plen).tolist()

    rand_params = jax.jit(lambda: quantize_llm_params(
        M.init_params(cfg, jax.random.PRNGKey(0))))()
    zero_params = jax.tree.map(lambda x: jnp.zeros_like(x), rand_params)

    def run(params, draft, spec_k=4, reps=2):
        ecfg = EngineConfig(page_size=64, max_pages_per_seq=24,
                            max_batch_size=1, prefill_chunk=512,
                            decode_horizon=16, spec_k=spec_k)
        eng = PagedEngine(params, cfg, ecfg, draft=draft)
        warm = Request(0, prompt, allow, eos_id=2, max_new_tokens=16)
        eng.run([warm])
        # acceptance must cover ONLY the timed reps, not the 16-token warmup
        # (ADVICE r4): reset the engine's cumulative spec counters here
        eng.spec_rounds, eng.spec_emitted = 0, 0
        best, out = float("inf"), None
        for i in range(reps):
            r = Request(10 + i, prompt, allow, eos_id=2, max_new_tokens=n_new)
            t0 = time.perf_counter()
            eng.run([r])
            best = min(best, time.perf_counter() - t0)
            out = r.output_ids
        acc = (eng.spec_emitted / eng.spec_rounds) if eng.spec_rounds else None
        return best, out, acc

    for name, params in (("zero", zero_params), ("random", rand_params)):
        t_plain, out_plain, _ = run(params, draft=None)
        t_ng, out_ng, acc = run(params, draft="ngram")
        if name == "zero":
            assert out_ng == out_plain, "zero: ngram output != plain greedy"
            match = "exact"
        else:
            div = next((i for i, (a, b) in enumerate(zip(out_plain, out_ng))
                        if a != b), None)
            if div is None:
                match = "exact"
            else:
                # a divergence is only acceptable if it IS a cross-kernel
                # tie-flip: under an independent DENSE forward at the
                # divergent position, BOTH tokens must sit within the
                # cross-kernel noise band of the argmax (noise RMS measures
                # ~0.29 of the logit std here, so near-max ranks are
                # meaningless — gap-from-top is the discriminating
                # statistic).  A real acceptance bug (e.g. emitting the
                # draft token instead of the target argmax at a rejected
                # position) emits an arbitrary token, which over a 10k
                # vocab sits ~3+ std below the top — far outside the band.
                ids = jnp.asarray([prompt + out_plain[:div]], jnp.int32)
                logits = np.asarray(
                    M.forward(params, cfg, ids)[0, -1], np.float64)
                logits[~allow] = -np.inf
                a, b = out_plain[div], out_ng[div]
                std = float(np.std(logits[allow]))
                top = float(logits.max())
                gaps = {t: top - float(logits[t]) for t in (a, b)}
                order = np.argsort(logits)[::-1]
                ra, rb = (int(np.where(order == t)[0][0]) for t in (a, b))
                worst = max(gaps.values())
                assert worst < 0.5 * std, (
                    f"divergence@{div} is NOT a tie-flip: plain tok {a} "
                    f"(rank {ra}, {gaps[a]:.3f} below top), ngram tok {b} "
                    f"(rank {rb}, {gaps[b]:.3f} below top), logit std "
                    f"{std:.3f} — a token {worst / std:.2f} std off the "
                    f"argmax suggests a real speculation acceptance bug")
                match = (f"tie-flip@{div} verified (ranks {{{ra},{rb}}}, "
                         f"both within {worst / std:.2f} std of argmax)")
        # repetition diagnostic: longest tail period of the decoded stream
        tail = out_plain[-128:]
        period = next((p for p in range(1, 65)
                       if tail[p:] == tail[:-p]), None)
        print(f"{name:7s} plain {n_new / t_plain:6.1f} tok/s | "
              f"ngram {n_new / t_ng:6.1f} tok/s "
              f"({t_plain / t_ng:4.2f}x) | accept/round "
              f"{acc if acc is None else round(acc, 2)} | "
              f"tail period {period} | vs plain: {match}", flush=True)


if __name__ == "__main__":
    main()
