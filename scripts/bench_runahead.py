"""Chain-length x run-ahead sweep for b=1 engine decode on the real chip.

Motivation (round 3): each chain sync over a tunneled TPU costs ~25 ms of
host RTT.  Depth-1 run-ahead (engine/paged.py step_chain) dispatches chain
k+1 from carried device state before syncing chain k, hiding that RTT behind
device compute — after which SHORT chains are strictly better (same
throughput, tighter EOS-overshoot bound and streaming granularity).

Measured 2026-08-18 (v5e over tunnel, 7B-int8, 1219-token context, 256 new):

    horizon   8 runahead=1: 90.0 tok/s
    horizon  16 runahead=1: 90.0 tok/s
    horizon  32 runahead=1: 84.5 tok/s
    horizon  64 runahead=1: 86.5 tok/s
    horizon  32 runahead=0: 83.0 tok/s

and the EOS-overshoot check (--eos; EOS fires at token 101 of a 200 budget):

    EOS-ended (101 toks) runahead=1: 73.8 tok/s
    EOS-ended (101 toks) runahead=0: 71.8 tok/s

-> run-ahead wins even for EOS-ended requests at horizon 16 (the bounded
overshoot costs less than the per-chain sync savings); the single-caller
pipeline (pipeline._dialog_server) runs horizon 16.

Run: python scripts/bench_runahead.py
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
    from usdm_tpu.core.config import EngineConfig, MistralConfig
    from usdm_tpu.engine.paged import PagedEngine, Request
    from usdm_tpu.models import mistral as M
    from usdm_tpu.models.quant import quantize_llm_params

    cfg = MistralConfig()
    params = jax.jit(lambda: quantize_llm_params(
        M.init_params(cfg, jax.random.PRNGKey(0))))()
    rng = np.random.default_rng(0)
    allow = np.ones(cfg.vocab_size, bool)
    allow[:3] = False  # EOS unreachable: measure the budget-bound steady state

    def run(horizon, runahead, n_new=256, plen=1219, reps=2):
        ecfg = EngineConfig(page_size=64, max_pages_per_seq=24,
                            max_batch_size=1, prefill_chunk=256,
                            decode_horizon=horizon, runahead=runahead)
        eng = PagedEngine(params, cfg, ecfg)
        warm = Request(0, rng.integers(3, 32000, plen).tolist(), allow,
                       eos_id=2, max_new_tokens=16)
        eng.run([warm])
        best = float("inf")
        for i in range(reps):
            r = Request(10 + i, rng.integers(3, 32000, plen).tolist(), allow,
                        eos_id=2, max_new_tokens=n_new)
            t0 = time.perf_counter()
            eng.run([r])
            best = min(best, time.perf_counter() - t0)
        print(f"horizon {horizon:3d} runahead={int(runahead)}: "
              f"best {best:.3f}s = {n_new / best:.1f} tok/s", flush=True)

    for h in (8, 16, 32, 64):
        run(h, True)
    run(32, False)




def eos_overshoot():
    """Measure the run-ahead EOS-overshoot cost: requests that stop at EOS
    (not their budget) leave the in-flight successor chain's links computing
    frozen no-ops.  Uses a probe run to find a token whose FIRST greedy
    occurrence is mid-budget, then re-runs with it as the EOS."""
    import jax
    import numpy as np

    from usdm_tpu.core.config import EngineConfig, MistralConfig
    from usdm_tpu.engine.paged import PagedEngine, Request
    from usdm_tpu.models import mistral as M
    from usdm_tpu.models.quant import quantize_llm_params

    cfg = MistralConfig()
    params = jax.jit(lambda: quantize_llm_params(
        M.init_params(cfg, jax.random.PRNGKey(0))))()
    rng = np.random.default_rng(7)
    allow = np.ones(cfg.vocab_size, bool)
    allow[:3] = False
    prompt = rng.integers(3, 32000, 1219).tolist()

    def engine(runahead):
        return PagedEngine(params, cfg, EngineConfig(
            page_size=64, max_pages_per_seq=24, max_batch_size=1,
            prefill_chunk=256, decode_horizon=16, runahead=runahead))

    eng = engine(True)
    probe = Request(0, list(prompt), allow, eos_id=2, max_new_tokens=200)
    eng.run([probe])
    first_at = {}
    for i, t in enumerate(probe.output_ids):
        first_at.setdefault(t, i)
    # a token first emitted mid-run: re-running with it as EOS stops there
    eos_tok, stop_at = min(((t, i) for t, i in first_at.items() if i >= 100),
                           key=lambda p: p[1])
    print(f"probe: eos candidate {eos_tok} first at position {stop_at}")

    import time
    for runahead in (True, False):
        eng = engine(runahead)
        warm = Request(1, list(prompt), allow, eos_id=eos_tok, max_new_tokens=200)
        eng.run([warm])
        best = float("inf")
        for i in range(2):
            r = Request(2 + i, list(prompt), allow, eos_id=eos_tok,
                        max_new_tokens=200)
            t0 = time.perf_counter()
            eng.run([r])
            best = min(best, time.perf_counter() - t0)
        n = len(r.output_ids)
        print(f"EOS-ended ({n} toks) runahead={int(runahead)}: {best:.3f}s "
              f"= {n / best:.1f} tok/s", flush=True)


if __name__ == "__main__":
    eos_overshoot() if "--eos" in sys.argv else main()
