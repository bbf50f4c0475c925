"""Speculative decoding with imperfect drafts on the real chip.

Round-2 quoted 169 tok/s (0.1B draft) and 131 (early-exit:8) as CEILINGS at
100% draft agreement (zero weights make every argmax agree).  This script
measures the real overhead of REJECTED rounds: random-init target + an
independently random-init draft (~0% agreement), the same-weights draft
(100%), and plain chained decode, at full 7B geometry (VERDICT r2 weak-4:
"one full-size on-chip run with a deliberately degraded draft").

Run: python scripts/bench_spec_degraded.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def run_one(label, params, cfg, draft, n_new=96):
    from usdm_tpu.core.config import EngineConfig
    from usdm_tpu.engine.paged import PagedEngine, Request

    ecfg = EngineConfig(page_size=256, max_pages_per_seq=3, max_batch_size=1,
                        decode_horizon=32, spec_k=4)
    eng = PagedEngine(params, cfg, ecfg, draft=draft)
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 32000, 384).tolist()
    allow = np.ones(cfg.vocab_size, bool)
    allow[:3] = False  # EOS unreachable: fixed-length run

    def once():
        req = Request(0, list(prompt), allow, eos_id=2, max_new_tokens=n_new)
        t0 = time.time()
        eng.run([req])
        return time.time() - t0, len(req.output_ids)

    once()  # warm-up/compile
    wall, toks = once()
    acc = (eng.spec_emitted / eng.spec_rounds) if eng.spec_rounds else None
    print(f"{label:28s}: {toks/wall:6.1f} tok/s  "
          f"(rounds={eng.spec_rounds}, accept/round={acc and round(acc, 2)})",
          flush=True)


def main():
    from usdm_tpu.core.config import MistralConfig
    from usdm_tpu.models import mistral as M
    from usdm_tpu.models.quant import early_exit_draft, quantize_llm_params

    cfg = MistralConfig()

    # RANDOM weights (not zeros): argmax disagreement between independently
    # initialized models is real, so rejection paths actually execute.
    # Leaves are synthesized host-side from the quantized tree's shapes —
    # init_params would materialize the f32 7B tree on-device (28 GB > HBM).
    def random_quantized(c, seed):
        shapes = jax.eval_shape(
            lambda: quantize_llm_params(M.init_params(c, jax.random.PRNGKey(0))))
        rng = np.random.default_rng(seed)

        def fill(s):
            if s.dtype == jnp.int8:
                return jnp.asarray(rng.integers(-127, 128, s.shape, np.int8))
            return jnp.asarray(
                rng.standard_normal(s.shape, np.float32) * 0.02, s.dtype)

        return jax.tree.map(fill, shapes)

    params = random_quantized(cfg, 0)
    small_cfg = cfg.replace(num_layers=4)
    draft_same4 = (early_exit_draft(params, 4), small_cfg)
    draft_rand = (random_quantized(small_cfg, 7), small_cfg)

    run_one("plain chained (no draft)", params, cfg, None)
    run_one("early-exit:4 self-draft", params, cfg, draft_same4)
    run_one("random 4-layer draft", params, cfg, draft_rand)


if __name__ == "__main__":
    main()
