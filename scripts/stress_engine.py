"""Extended on-chip scheduler stress at kernel-eligible geometry.

The CPU-mesh fuzz test (tests/test_paged.py) runs tiny shapes through the
XLA-gather attention fallback; this script drives the REAL Pallas decode
kernel path (page_size 128, head_dim 128) on the TPU with the full
scheduler feature set interacting: randomized staggered arrivals, greedy +
sampled requests, sessions with prefix reuse and releases, run-ahead
chains, int8 KV pages, and window reclaim.  Invariants checked per round:

  * greedy outputs equal a fresh solo engine's (batching/run-ahead/session
    invisibility)
  * every page returns to the pool after all sessions release
  * no request left unfinished

Run: python scripts/stress_engine.py [rounds]  (default 6, ~5 min)
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


def main(rounds: int = 6):
    from usdm_tpu.core.config import EngineConfig, MistralConfig
    from usdm_tpu.engine.paged import PagedEngine, Request
    from usdm_tpu.models import mistral as M

    # small-but-kernel-eligible model: head_dim 128, page_size 128
    cfg = MistralConfig.tiny(vocab_size=512).replace(
        hidden_size=256, num_heads=2, num_kv_heads=2, head_dim=128,
        num_layers=2, intermediate_size=512, sliding_window=384,
        max_seq_len=768)
    assert cfg.head_dim == 128, cfg.head_dim
    params = M.init_params(cfg, jax.random.PRNGKey(0), dtype="float32")
    ecfg = EngineConfig(page_size=128, max_pages_per_seq=6, max_batch_size=4,
                        prefill_chunk=128, decode_horizon=8,
                        kv_dtype="int8")
    rng = np.random.default_rng(0)

    def mk(rid, n, max_new, sampled=False, session=None, eos=2):
        allow = np.ones(cfg.vocab_size, bool)
        allow[:3] = False
        return Request(rid, rng.integers(3, cfg.vocab_size, n).tolist(),
                       allow, eos_id=eos, max_new_tokens=max_new,
                       top_k=8 if sampled else 1,
                       temperature=1.2 if sampled else 1.0,
                       seed=rid, session=session)

    # every third round attaches a DRAFT: even rounds a perfect one (the
    # target itself -> high acceptance), odd a random-weight one (constant
    # rejections) — speculative verify/accept interleaving with sessions,
    # staggered arrivals and int8 KV on the real kernel path.  Output must
    # STILL equal the plain-greedy solo baselines (spec is lossless).
    draft_perfect = params
    draft_random = M.init_params(cfg, jax.random.PRNGKey(9), dtype="float32")

    t0 = time.time()
    for rnd in range(rounds):
        draft = None
        if rnd % 3 == 2:
            draft = (draft_perfect if rnd % 2 == 0 else draft_random, cfg)
        eng = PagedEngine(params, cfg, ecfg, draft=draft)
        total_pages = len(eng.free_pages)
        reqs, solos = [], []
        sessions = []
        rid = 0
        for i in range(6):
            # sessions and sampled requests disjoint: the solo baseline
            # replays session predecessors greedily
            sampled = i in (1, 5)
            session = None
            if i % 2 == 0:
                session = 100 + i
                sessions.append(session)
            r = mk(rid, int(rng.integers(40, 400)), int(rng.integers(8, 48)),
                   sampled=sampled, session=session)
            reqs.append(r)
            rid += 1
        # staggered arrival: submit a few, tick, submit the rest
        for r in reqs[:3]:
            eng.submit(r)
        for _ in range(int(rng.integers(1, 6))):
            if eng.busy:
                eng.tick()
        for r in reqs[3:]:
            eng.submit(r)
        while eng.busy:
            eng.tick()
        # session follow-ups reuse prefixes
        for s in sessions:
            prev = next(r for r in reqs if r.session == s)
            r = mk(rid, 0, int(rng.integers(8, 32)), session=s)
            r.prompt_ids = list(prev.prompt_ids) + list(prev.output_ids) \
                + rng.integers(3, cfg.vocab_size, 37).tolist()
            reqs.append(r)
            eng.submit(r)
            rid += 1
        while eng.busy:
            eng.tick()
        assert all(r.finished for r in reqs), "unfinished request"
        # greedy outputs must equal solo runs with the SAME KV provenance:
        # session follow-ups replay their predecessor first, because reused
        # KV (written by the decode kernel) and re-prefilled KV (chunked
        # prefill path) differ in low bits — kernel reduction orders, int8
        # rounding — which can flip a greedy argmax (vLLM prefix caching has
        # the same property; a fresh-prefill baseline is NOT the invariant)
        for r in reqs:
            if r.sampled or r.error or draft is not None:
                # DRAFT rounds skip exact-token comparison: speculative
                # verify computes target logits through the XLA-attention
                # verify forward while plain decode uses the Pallas kernel,
                # and scheduler fallbacks interleave the two paths per
                # token — low-bit path differences can flip an argmax, so
                # spec-vs-plain exactness is a numerics property on TPU
                # (every emitted token is still the target's argmax under
                # the path that computed it).  Scheduler-level losslessness
                # is proven by the CPU fuzz at high precision; here draft
                # rounds check the structural invariants only.
                continue
            solo_eng = PagedEngine(params, cfg, ecfg)
            if r.session is not None and r.req_id >= 6:  # follow-up
                prev = next(p for p in reqs if p.session == r.session
                            and p.req_id < r.req_id)
                replay = Request(998, list(prev.prompt_ids), prev.allow_mask,
                                 prev.eos_id, prev.max_new_tokens,
                                 session=r.session)
                solo_eng.run([replay])
                assert replay.output_ids == prev.output_ids
            clone = Request(999, list(r.prompt_ids), r.allow_mask, r.eos_id,
                            r.max_new_tokens, session=r.session)
            solo_eng.run([clone])
            assert clone.output_ids == r.output_ids, (
                f"round {rnd} req {r.req_id}: batched != solo")
        for s in sessions:
            eng.release_session(s)
        assert len(eng.free_pages) == total_pages, (
            f"round {rnd}: leaked {total_pages - len(eng.free_pages)} pages")
        print(f"round {rnd}: {len(reqs)} requests ok "
              f"({sum(len(r.output_ids) for r in reqs)} tokens)", flush=True)
    print(f"STRESS OK ({rounds} rounds, {time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
