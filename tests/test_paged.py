"""Paged-KV continuous-batching engine tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from usdm_tpu.core.config import EngineConfig, MistralConfig
from usdm_tpu.engine.generate import generate
from usdm_tpu.engine.paged import PagedEngine, Request
from usdm_tpu.models import mistral as M

CFG = MistralConfig.tiny(vocab_size=96)
ECFG = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=4)


@pytest.fixture(scope="module")
def setup():
    params = M.init_params(CFG, jax.random.PRNGKey(0), dtype="float32")
    return params


def _req(rng, rid, n=12, max_new=10, eos=2):
    prompt = rng.integers(3, CFG.vocab_size, size=n).tolist()
    allow = np.ones(CFG.vocab_size, bool)
    return Request(rid, prompt, allow, eos_id=eos, max_new_tokens=max_new)


def test_paged_matches_dense_generate(setup, rng):
    """Paged engine greedy output must equal the dense-cache generate loop."""
    params = setup
    prompt = rng.integers(3, CFG.vocab_size, size=10).tolist()
    allow = np.ones(CFG.vocab_size, bool)
    eos = 2
    max_new = 8

    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ECFG)
        req = Request(0, prompt, allow, eos_id=eos, max_new_tokens=max_new)
        eng.run([req])

        toks, lens = generate(
            params, CFG,
            jnp.asarray(np.asarray(prompt, np.int32)[None]),
            jnp.asarray([len(prompt)], jnp.int32),
            jnp.asarray(allow), jnp.asarray(eos, jnp.int32),
            max_new_tokens=max_new, attn_impl="xla",
        )
    dense = np.asarray(toks[0, : int(lens[0])]).tolist()
    assert req.output_ids[: len(dense)] == dense


def test_continuous_batching_oversubscribed(setup, rng):
    """More requests than slots: all finish, outputs independent of batching."""
    params = setup
    with jax.default_matmul_precision("highest"):
        reqs = [_req(rng, i, n=8 + i, max_new=6) for i in range(7)]
        # solo baselines
        solo_outputs = []
        for r in reqs:
            eng = PagedEngine(params, CFG, ECFG)
            clone = Request(r.req_id, list(r.prompt_ids), r.allow_mask, r.eos_id, r.max_new_tokens)
            eng.run([clone])
            solo_outputs.append(clone.output_ids)

        eng = PagedEngine(params, CFG, ECFG)
        eng.run(reqs)
    for r, solo in zip(reqs, solo_outputs):
        assert r.finished
        assert r.output_ids == solo, f"req {r.req_id} differs batched vs solo"


def test_pages_freed_after_completion(setup, rng):
    params = setup
    eng = PagedEngine(params, CFG, ECFG)
    total_pages = len(eng.free_pages)
    reqs = [_req(rng, i, n=10, max_new=4) for i in range(6)]
    eng.run(reqs)
    assert len(eng.free_pages) == total_pages  # everything returned
    assert all(r.finished for r in reqs)


def test_per_slot_masks(setup, rng):
    """Two concurrent requests with different vocab masks each respect
    their own constraint."""
    params = setup
    allow_a = np.zeros(CFG.vocab_size, bool)
    allow_a[10:30] = True
    allow_b = np.zeros(CFG.vocab_size, bool)
    allow_b[50:70] = True
    ra = Request(0, rng.integers(3, 96, size=6).tolist(), allow_a, eos_id=11, max_new_tokens=6)
    rb = Request(1, rng.integers(3, 96, size=9).tolist(), allow_b, eos_id=51, max_new_tokens=6)
    eng = PagedEngine(params, CFG, ECFG)
    eng.run([ra, rb])
    assert all(10 <= t < 30 for t in ra.output_ids)
    assert all(50 <= t < 70 for t in rb.output_ids)


def test_sampled_decode_deterministic(setup, rng):
    """Same seed -> identical sampled outputs; different seed -> (almost
    surely) different; every token respects the slot's allow mask."""
    params = setup
    allow = np.zeros(CFG.vocab_size, bool)
    allow[20:80] = True
    prompt = rng.integers(3, CFG.vocab_size, size=9).tolist()

    def run_once(seed):
        eng = PagedEngine(params, CFG, ECFG)
        r = Request(0, list(prompt), allow, eos_id=1, max_new_tokens=12,
                    top_k=20, top_p=0.95, temperature=1.3, seed=seed)
        eng.run([r])
        return r.output_ids

    a = run_once(7)
    b = run_once(7)
    c = run_once(8)
    assert a == b
    assert all(20 <= t < 80 for t in a)
    assert a != c  # 12 tokens from a 20-wide top-k: collision ~ impossible


def test_sampled_matches_solo_when_batched(setup, rng):
    """A sampling request's output must not depend on what shares the batch
    (per-slot PRNG streams)."""
    params = setup
    allow = np.ones(CFG.vocab_size, bool)
    mk = lambda rid, seed: Request(  # noqa: E731
        rid, rng.integers(3, CFG.vocab_size, size=8).tolist(), allow,
        eos_id=1, max_new_tokens=8, top_k=10, temperature=0.9, seed=seed)
    r_solo = mk(0, 5)
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ECFG)
        eng.run([r_solo])

        r_same = Request(0, list(r_solo.prompt_ids), allow, 1, 8,
                         top_k=10, temperature=0.9, seed=5)
        greedy_mates = [_req(rng, i, n=6 + i, max_new=8) for i in range(1, 4)]
        eng2 = PagedEngine(params, CFG, ECFG)
        eng2.run([r_same] + greedy_mates)
    assert r_solo.output_ids == r_same.output_ids


def test_chunked_prefill_matches_monolithic(setup, rng):
    """A prompt longer than prefill_chunk must produce the same greedy output
    as one that fits in a single chunk."""
    params = setup
    prompt = rng.integers(3, CFG.vocab_size, size=40).tolist()
    allow = np.ones(CFG.vocab_size, bool)
    with jax.default_matmul_precision("highest"):
        big = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=4,
                           prefill_chunk=64)  # one chunk
        small = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=4,
                             prefill_chunk=16)  # 3 chunks
        r1 = Request(0, list(prompt), allow, eos_id=1, max_new_tokens=6)
        r2 = Request(0, list(prompt), allow, eos_id=1, max_new_tokens=6)
        PagedEngine(params, CFG, big).run([r1])
        PagedEngine(params, CFG, small).run([r2])
    assert r1.output_ids == r2.output_ids


def test_prefill_does_not_stall_decode(setup, rng):
    """While a long prompt prefills chunk-by-chunk, an in-flight request must
    keep emitting one token per engine step (no head-of-line stall)."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=4,
                        prefill_chunk=16)
    eng = PagedEngine(params, CFG, ecfg)
    allow = np.ones(CFG.vocab_size, bool)
    ra = Request(0, rng.integers(3, 96, size=8).tolist(), allow, eos_id=1,
                 max_new_tokens=20)
    eng.submit(ra)
    eng.step()  # admit + prefill (1 chunk) + first decode happens next step
    base = len(ra.output_ids)
    # now a long prompt arrives: 64 tokens = 4 chunks of prefill
    rb = Request(1, rng.integers(3, 96, size=64).tolist(), allow, eos_id=1,
                 max_new_tokens=4)
    eng.submit(rb)
    for i in range(4):  # every step during rb's 4-chunk prefill...
        got = len(ra.output_ids)
        eng.step()
        assert len(ra.output_ids) == got + 1  # ...ra still emits a token
        # rb emits nothing until its last chunk lands (then first token +
        # same-step decode = 2)
        assert len(rb.output_ids) == (2 if i == 3 else 0)
    eng.run([])  # drain
    assert ra.finished and rb.finished
    assert 1 <= len(rb.output_ids) <= 4


def test_admission_skips_too_big_head(setup, rng):
    """With an HBM-bounded page pool, a queue head that doesn't fit must not
    block smaller requests behind it (round-1 broke here: `break`)."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=3,
                        prefill_chunk=32, n_pages=10)
    allow = np.ones(CFG.vocab_size, bool)
    big = Request(0, rng.integers(3, 96, size=48).tolist(), allow, eos_id=0,
                  max_new_tokens=60)  # ceil(108/16)=7 pages -> 3 left
    head = Request(1, rng.integers(3, 96, size=60).tolist(), allow, eos_id=0,
                   max_new_tokens=60)  # needs 8 pages: can't fit yet
    tiny = Request(2, rng.integers(3, 96, size=6).tolist(), allow, eos_id=0,
                   max_new_tokens=4)  # 1 page: fits now
    eng = PagedEngine(params, CFG, ecfg)
    eng.submit(big)
    eng.step()
    eng.submit(head)
    eng.submit(tiny)
    for _ in range(8):
        eng.step()
    assert tiny.finished  # admitted past the stuck head
    eng.run([])
    assert big.finished and head.finished


def test_multi_step_matches_single_step(setup, rng):
    """decode_horizon=8 device-side loop must emit exactly what per-token
    stepping emits."""
    params = setup
    reqs_a = [_req(rng, i, n=8 + i, max_new=7) for i in range(3)]
    reqs_b = [Request(r.req_id, list(r.prompt_ids), r.allow_mask, r.eos_id, r.max_new_tokens)
              for r in reqs_a]
    with jax.default_matmul_precision("highest"):
        eng1 = PagedEngine(params, CFG, ECFG)
        eng1.decode_horizon = 1
        for r in reqs_a:
            eng1.submit(r)
        while eng1.waiting or eng1.active.any():
            eng1.step()

        eng8 = PagedEngine(params, CFG, ECFG)
        eng8.decode_horizon = 8
        eng8.run(reqs_b)
    for a, b in zip(reqs_a, reqs_b):
        assert a.output_ids == b.output_ids, f"req {a.req_id}: {a.output_ids} vs {b.output_ids}"


def test_tp_engine_matches_single_device(setup, rng):
    """PagedEngine over a tp=2 virtual mesh must emit exactly what the
    single-device engine emits (greedy + sampled slots), closing SURVEY §2.3
    TP for the serving path (tiny config has 2 kv heads -> tp=2 max)."""
    from usdm_tpu.engine.tp import make_tp_mesh

    params = setup
    mesh = make_tp_mesh(2)
    prompts = [rng.integers(3, CFG.vocab_size, size=7 + i).tolist() for i in range(3)]
    allow = np.ones(CFG.vocab_size, bool)

    def mk(i):
        return Request(i, list(prompts[i]), allow, eos_id=1, max_new_tokens=8,
                       top_k=(1 if i % 2 else 12), temperature=1.1, seed=i)

    with jax.default_matmul_precision("highest"):
        eng1 = PagedEngine(params, CFG, ECFG)
        base = [mk(i) for i in range(3)]
        eng1.run(base)

        engtp = PagedEngine(params, CFG, ECFG, mesh=mesh)
        chain_calls = []
        orig_chain = engtp.step_chain
        engtp.step_chain = lambda n: (chain_calls.append(n), orig_chain(n))[1]
        tp_reqs = [mk(i) for i in range(3)]
        engtp.run(tp_reqs)

    for a, b in zip(base, tp_reqs):
        assert a.output_ids == b.output_ids, (a.req_id, a.output_ids, b.output_ids)
    # the TP engine must have used the CHAINED multi-token path, not the
    # per-token special case it had in round 2 (VERDICT r2 item 3)
    assert chain_calls


def test_tp_speculative_matches_single_device(setup, rng):
    """Speculative decoding composes with TP: draft decode, verification and
    on-device acceptance all run inside shard_maps; output still equals the
    single-device plain-greedy engine (vLLM composes the two; round-2 raised
    ValueError on draft + mesh)."""
    from usdm_tpu.engine.tp import make_tp_mesh

    params = setup
    mesh = make_tp_mesh(2)
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=2,
                        prefill_chunk=16, spec_k=3)
    allow = np.ones(CFG.vocab_size, bool)
    prompts = [rng.integers(3, CFG.vocab_size, size=9 + i).tolist() for i in range(2)]

    with jax.default_matmul_precision("highest"):
        e1 = PagedEngine(params, CFG, ecfg.replace(spec_k=0))
        base = [Request(i, list(prompts[i]), allow, eos_id=1, max_new_tokens=9)
                for i in range(2)]
        e1.run(base)
        # draft == target: perfect agreement exercises full-acceptance rounds
        etp = PagedEngine(params, CFG, ecfg, mesh=mesh, draft=(params, CFG))
        tp_reqs = [Request(i, list(prompts[i]), allow, eos_id=1, max_new_tokens=9)
                   for i in range(2)]
        etp.run(tp_reqs)
    for a, b in zip(base, tp_reqs):
        assert a.output_ids == b.output_ids, (a.req_id, a.output_ids, b.output_ids)
    assert etp.spec_rounds > 0  # speculation actually ran under TP


def test_sliding_window_page_reclaim(rng):
    """Pages wholly below the sliding window are returned to the pool
    mid-flight (reference slices dense KV at the window, model.py:337-373)
    and the retargeted table entries don't corrupt decode: output still
    equals the dense generate loop."""
    cfg = CFG.replace(sliding_window=16)
    ecfg = EngineConfig(page_size=8, max_pages_per_seq=16, max_batch_size=2)
    params = M.init_params(cfg, jax.random.PRNGKey(1), dtype="float32")
    prompt = rng.integers(3, cfg.vocab_size, size=20).tolist()
    allow = np.ones(cfg.vocab_size, bool)
    max_new = 40

    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, cfg, ecfg)
        free0 = len(eng.free_pages)
        req = Request(0, prompt, allow, eos_id=2, max_new_tokens=max_new)
        eng.submit(req)
        reclaimed_seen = 0
        occupied_min = ecfg.max_pages_per_seq
        while eng.busy:
            eng.step()
            if eng.status[0] != 0 and eng.slot_pages[0]:
                reclaimed_seen = max(reclaimed_seen, int(eng.released[0]))
                occupied_min = min(
                    occupied_min, len(eng.slot_pages[0]) - int(eng.released[0]))
        assert reclaimed_seen >= 4, f"expected mid-flight reclaim, saw {reclaimed_seen}"
        # steady-state live footprint is O(window), not O(total)
        assert occupied_min <= (cfg.sliding_window // ecfg.page_size) + 2
        assert len(eng.free_pages) == free0  # all returned exactly once

        toks, lens = generate(
            params, cfg,
            jnp.asarray(np.asarray(prompt, np.int32)[None]),
            jnp.asarray([len(prompt)], jnp.int32),
            jnp.asarray(allow), jnp.asarray(2, jnp.int32),
            max_new_tokens=max_new, attn_impl="xla",
        )
    dense = np.asarray(toks[0, : int(lens[0])]).tolist()
    assert req.output_ids[: len(dense)] == dense


@pytest.mark.parametrize("impl", ["chain", "fused"])
def test_multi_impl_matches_single_step(setup, rng, impl):
    """Both multi-token backends (chained dispatches / fused fori_loop) must
    emit exactly what per-token stepping emits."""
    params = setup
    reqs_a = [_req(rng, 10 + i, n=8 + i, max_new=7) for i in range(3)]
    reqs_b = [Request(r.req_id, list(r.prompt_ids), r.allow_mask, r.eos_id, r.max_new_tokens)
              for r in reqs_a]
    with jax.default_matmul_precision("highest"):
        eng1 = PagedEngine(params, CFG, ECFG)
        eng1.decode_horizon = 1
        eng1.run(reqs_a)
        engm = PagedEngine(params, CFG, ECFG)
        engm.decode_horizon = 8
        engm.multi_impl = impl
        engm.run(reqs_b)
    for a, b in zip(reqs_a, reqs_b):
        assert a.output_ids == b.output_ids, f"req {a.req_id}: {a.output_ids} vs {b.output_ids}"


def test_multi_horizon_respects_allocation(setup, rng):
    """A slot whose remaining budget is smaller than the horizon must NOT
    decode past its page allocation (those writes would land on page 0 and
    corrupt whichever request owns it)."""
    params = setup
    with jax.default_matmul_precision("highest"):
        # victim owns the lowest page ids (admitted first)
        victim = _req(rng, 0, n=10, max_new=24)
        victim_solo = Request(99, list(victim.prompt_ids), victim.allow_mask,
                              victim.eos_id, victim.max_new_tokens)
        # short has max_new=2 but the engine runs horizon=8
        short = Request(1, rng.integers(3, CFG.vocab_size, size=14).tolist(),
                        np.ones(CFG.vocab_size, bool), eos_id=2, max_new_tokens=2)
        eng = PagedEngine(params, CFG, ECFG)
        eng.decode_horizon = 8
        eng.run([victim, short])
        assert len(short.output_ids) <= 2

        solo = PagedEngine(params, CFG, ECFG)
        solo.decode_horizon = 1
        solo.run([victim_solo])
    assert victim.output_ids == victim_solo.output_ids


def test_capacity_wait_still_chains(setup, rng):
    """A request waiting only for capacity (no admittable work) must not
    degrade the running slots to per-token stepping: once prefill work is
    exhausted, a tick advances multiple decode tokens (chained), and the
    waiter is admitted after a slot frees.  Both requests' outputs equal
    their solo runs."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=1,
                        decode_horizon=8)
    solo = []
    for seed in (0, 1):
        eng = PagedEngine(params, CFG, ecfg)
        r = _req(np.random.default_rng(seed), seed, max_new=24)
        eng.run([r])
        solo.append(r.output_ids)

    eng = PagedEngine(params, CFG, ecfg)
    ra = _req(np.random.default_rng(0), 0, max_new=24)
    rb = _req(np.random.default_rng(1), 1, max_new=24)
    eng.submit(ra)
    eng.submit(rb)
    while eng.prefill_order or (eng.waiting and not ra.output_ids):
        eng.tick()  # drain ra's prefill; rb now waits on capacity only
    chained_ticks = 0
    steps0 = eng.steps
    while not ra.finished:
        eng.tick()
        chained_ticks += 1
    assert eng.steps - steps0 > chained_ticks, (
        "capacity wait fell back to per-token stepping")
    while eng.busy:
        eng.tick()
    assert [ra.output_ids, rb.output_ids] == solo


def test_session_prefix_reuse_matches_fresh(setup, rng):
    """A 3-request session chain (each prompt extends the previous prompt +
    output, like the dialog stages) must emit exactly what independent
    no-session requests emit, while actually skipping the common chunks."""
    params = setup
    # chunk 16 == page 16 so a 3-stage chain crosses chunk boundaries
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=16, max_batch_size=2,
                        prefill_chunk=16)
    base = rng.integers(3, CFG.vocab_size, size=40).tolist()
    suffixes = [rng.integers(3, CFG.vocab_size, size=5).tolist() for _ in range(3)]
    allow = np.ones(CFG.vocab_size, bool)

    def chain(eng, session):
        prompt = list(base)
        outs, prefill_ticks = [], []
        for k in range(3):
            req = Request(100 + k, list(prompt), allow, eos_id=2,
                          max_new_tokens=6, session=session)
            eng.submit(req)
            n0 = eng.prefill_chunks
            while eng.prefill_order or eng.waiting:
                eng.tick()
            while eng.busy:
                eng.tick()
            outs.append(list(req.output_ids))
            prefill_ticks.append(eng.prefill_chunks - n0)
            # next stage: previous prompt + output + fixed suffix tokens
            prompt = prompt + req.output_ids + suffixes[k]
        return outs, prefill_ticks

    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ecfg)
        fresh_outs, fresh_ticks = chain(eng, session=None)
        assert not eng.session_slots
        eng2 = PagedEngine(params, CFG, ecfg)
        total_pages = len(eng2.free_pages)
        sess_outs, sess_ticks = chain(eng2, session=7)
        eng2.release_session(7)
        assert not eng2.session_slots and (eng2.status == 0).all()
        # all pages back in the pool
        assert len(eng2.free_pages) == total_pages

    assert sess_outs == fresh_outs
    # stages 2/3 prefill fewer chunks than the fresh path (prefix skipped)
    assert sess_ticks[1] < fresh_ticks[1]
    assert sess_ticks[2] < fresh_ticks[2]


def test_session_reuse_is_page_granular(setup, rng):
    """Prefix reuse must resume at a PAGE boundary, not a prefill-chunk
    boundary: with pages smaller than the chunk, a common prefix below one
    chunk still skips its whole pages (the dialog's stage-B prompt reuse
    depended on this; chunk-floor rounded it to zero)."""
    params = setup
    ecfg = EngineConfig(page_size=8, max_pages_per_seq=16, max_batch_size=2,
                        prefill_chunk=16)
    allow = np.ones(CFG.vocab_size, bool)
    base = rng.integers(3, CFG.vocab_size, size=13).tolist()

    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ecfg)
        r1 = Request(0, list(base), allow, eos_id=2, max_new_tokens=5, session=9)
        eng.run([r1])
        # follow-up prompt: previous prompt + output + a short suffix
        # -> common prefix = 13 + 5 = 18 tokens = 2 whole pages + 2
        prompt2 = base + r1.output_ids + rng.integers(3, CFG.vocab_size, size=3).tolist()
        r2 = Request(1, list(prompt2), allow, eos_id=2, max_new_tokens=5, session=9)
        eng.submit(r2)
        eng._try_admit()
        slot = eng.session_slots.get(9)
        assert slot is None  # consumed by the resume
        (slot,) = [s for s, rq in enumerate(eng.slot_req) if rq is r2]
        assert int(eng.prefill_pos[slot]) == 16  # 18 rounded down to page 8
        eng.run([])  # drain
        # equality with a fresh engine
        eng2 = PagedEngine(params, CFG, ecfg)
        r3 = Request(2, list(prompt2), allow, eos_id=2, max_new_tokens=5)
        eng2.run([r3])
    assert r2.output_ids == r3.output_ids


def test_session_hold_evicted_under_pressure(setup, rng):
    """HOLD pages must yield to new requests when the pool runs dry."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=4, max_batch_size=2,
                        n_pages=4, prefill_chunk=16)
    allow = np.ones(CFG.vocab_size, bool)
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ecfg)
        a = Request(0, rng.integers(3, CFG.vocab_size, size=30).tolist(), allow,
                    eos_id=2, max_new_tokens=4, session=1)
        eng.run([a])
        assert a.finished and eng.session_slots.get(1) is not None
        held = len(eng.free_pages)
        # a big request that needs the held pages
        b = Request(1, rng.integers(3, CFG.vocab_size, size=40).tolist(), allow,
                    eos_id=2, max_new_tokens=8)
        eng.run([b])
        assert b.finished and not b.error
        assert 1 not in eng.session_slots  # hold was evicted
        assert len(eng.free_pages) > held


def test_session_mismatched_prefix_falls_back(setup, rng):
    """A session request whose prompt does NOT extend the held history must
    produce the same output as a fresh request (stale hold released)."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=2,
                        prefill_chunk=16)
    allow = np.ones(CFG.vocab_size, bool)
    p1 = rng.integers(3, CFG.vocab_size, size=34).tolist()
    p2 = rng.integers(3, CFG.vocab_size, size=34).tolist()  # unrelated
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ecfg)
        eng.run([Request(0, p1, allow, eos_id=2, max_new_tokens=4, session=3)])
        r_sess = Request(1, list(p2), allow, eos_id=2, max_new_tokens=6, session=3)
        eng.run([r_sess])

        eng2 = PagedEngine(params, CFG, ecfg)
        r_fresh = Request(2, list(p2), allow, eos_id=2, max_new_tokens=6)
        eng2.run([r_fresh])
    assert r_sess.output_ids == r_fresh.output_ids


# ---------------------------------------------------------------- speculative


def _spec_engines(params, draft_params, ecfg, spec_k):
    e_plain = PagedEngine(params, CFG, ecfg.replace(spec_k=0))
    e_spec = PagedEngine(params, CFG, ecfg.replace(spec_k=spec_k),
                         draft=(draft_params, CFG))
    return e_plain, e_spec


@pytest.mark.parametrize("draft_kind", ["same", "random"])
def test_speculative_output_equals_greedy(setup, rng, draft_kind):
    """THE speculative-decoding invariant: for ANY draft model the emitted
    tokens equal plain greedy decode — only the speed depends on the draft.
    draft=same (100% acceptance) and draft=random (near-0 acceptance) probe
    both extremes."""
    params = setup
    draft = params if draft_kind == "same" else M.init_params(
        CFG, jax.random.PRNGKey(99), dtype="float32")
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=2,
                        prefill_chunk=16)
    with jax.default_matmul_precision("highest"):
        e_plain, e_spec = _spec_engines(params, draft, ecfg, spec_k=3)
        reqs_a = [_req(rng, i, n=11 + i, max_new=13) for i in range(2)]
        reqs_b = [Request(r.req_id, list(r.prompt_ids), r.allow_mask,
                          r.eos_id, r.max_new_tokens) for r in reqs_a]
        e_plain.run(reqs_a)
        e_spec.run(reqs_b)
    for a, b in zip(reqs_a, reqs_b):
        assert a.output_ids == b.output_ids, (a.output_ids, b.output_ids)
    if draft_kind == "same":
        # perfect agreement: every round accepts the full K+1 tokens per
        # participating slot (multi-slot rounds emit more; tails where the
        # budget remainder < K+1 fall back to plain steps)
        assert e_spec.spec_rounds > 0
        assert e_spec.spec_emitted >= e_spec.spec_rounds * (3 + 1) - 2


def test_speculative_respects_eos_and_budget(setup, rng):
    """EOS inside an accepted run truncates the round; outputs still match
    plain greedy including the stop position."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=1,
                        prefill_chunk=16)
    prompt = rng.integers(3, CFG.vocab_size, size=9).tolist()
    allow = np.ones(CFG.vocab_size, bool)
    with jax.default_matmul_precision("highest"):
        # pick an eos that the model actually emits: run greedy first, use
        # its 4th output token as the eos for both runs
        probe = Request(0, list(prompt), allow, eos_id=-1, max_new_tokens=12)
        PagedEngine(params, CFG, ecfg).run([probe])
        eos = probe.output_ids[3]
        e_plain, e_spec = _spec_engines(params, params, ecfg, spec_k=4)
        ra = Request(1, list(prompt), allow, eos_id=eos, max_new_tokens=12)
        rb = Request(2, list(prompt), allow, eos_id=eos, max_new_tokens=12)
        e_plain.run([ra])
        e_spec.run([rb])
    assert ra.output_ids == rb.output_ids
    assert ra.output_ids[-1] == eos


def test_speculative_sampled_requests_fall_back(setup, rng):
    """Sampled requests must NOT speculate (greedy-only) but still finish
    correctly on a spec-enabled engine."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=2,
                        prefill_chunk=16)
    allow = np.ones(CFG.vocab_size, bool)
    prompt = rng.integers(3, CFG.vocab_size, size=12).tolist()
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ecfg.replace(spec_k=3), draft=(params, CFG))
        r = Request(0, list(prompt), allow, eos_id=2, max_new_tokens=8,
                    top_k=0, top_p=1.0, temperature=0.7, seed=5)
        eng.run([r])
        assert eng.spec_rounds == 0
        eng2 = PagedEngine(params, CFG, ecfg)
        r2 = Request(1, list(prompt), allow, eos_id=2, max_new_tokens=8,
                     top_k=0, top_p=1.0, temperature=0.7, seed=5)
        eng2.run([r2])
    assert r.output_ids == r2.output_ids


def test_draft_engine_never_chains_without_mirroring(setup, rng):
    """With a draft attached, non-speculating turns must single-step (which
    mirrors decode into the draft pool) — step_chain/step_multi would leave
    draft-KV holes that collapse later rounds' acceptance (ADVICE r2)."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=2,
                        prefill_chunk=16, decode_horizon=8)
    allow = np.ones(CFG.vocab_size, bool)
    prompt = rng.integers(3, CFG.vocab_size, size=12).tolist()
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ecfg.replace(spec_k=3), draft=(params, CFG))

        def boom(*a, **kw):  # pragma: no cover - failure path
            raise AssertionError("chain path used with a draft attached")

        eng.step_chain = boom
        eng.step_multi = boom
        # sampled request disables speculation -> must fall back to step()
        r = Request(0, list(prompt), allow, eos_id=2, max_new_tokens=6,
                    top_k=0, top_p=1.0, temperature=0.8, seed=3)
        eng.run([r])
        assert r.finished and len(r.output_ids) == 6
        assert eng.spec_rounds == 0


# ------------------------------------------------------- ngram speculation


def test_ngram_propose_matches_and_falls_back():
    """Unit test of the prompt-lookup proposal: longest-suffix match wins,
    continuation comes from history, and a no-match suffix falls back to
    repeating the current token."""
    from usdm_tpu.engine.paged_ops import ngram_propose

    hist = np.zeros((2, 16), np.int32)
    hist[0, :6] = [10, 11, 12, 13, 10, 11]  # suffix [10, 11] recurs at 0..1
    hist[1, :4] = [1, 2, 3, 4]  # token 4 never recurs
    hist_len = jnp.asarray([6, 4], jnp.int32)
    cur = jnp.asarray([11, 4], jnp.int32)
    props = np.asarray(ngram_propose(jnp.asarray(hist), hist_len, cur,
                                     k=3, max_n=3))
    assert props[0].tolist() == [12, 13, 10]  # continuation after the match
    assert props[1].tolist() == [4, 4, 4]  # repeat-current fallback


def test_ngram_propose_prefers_longest_then_latest():
    """A longer suffix match beats a more recent shorter one; equal lengths
    tie-break to the most recent occurrence."""
    from usdm_tpu.engine.paged_ops import ngram_propose

    # suffix is [7, 8, 9]; [8, 9] occurs later (at 6..7) but [7, 8, 9]
    # occurs earlier (at 0..2) — the 3-gram must win
    hist = np.zeros((1, 20), np.int32)
    hist[0, :12] = [7, 8, 9, 50, 0, 0, 8, 9, 60, 7, 8, 9]
    props = np.asarray(ngram_propose(
        jnp.asarray(hist), jnp.asarray([12]), jnp.asarray([9]), k=2, max_n=3))
    assert props[0].tolist() == [50, 0]


@pytest.mark.parametrize("prompt_kind", ["cyclic", "random"])
def test_ngram_output_equals_greedy(setup, rng, prompt_kind):
    """Draft-free prompt-lookup speculation is LOSSLESS: outputs equal plain
    greedy decode whether the history repeats (high acceptance) or not
    (pure fallback proposals)."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=2,
                        prefill_chunk=16, spec_k=4)
    if prompt_kind == "cyclic":
        base_p = (list(rng.integers(3, CFG.vocab_size, size=4)) * 4)[:14]
        prompts = [base_p, (list(rng.integers(3, 96, size=3)) * 5)[:13]]
    else:
        prompts = [rng.integers(3, CFG.vocab_size, size=11 + i).tolist()
                   for i in range(2)]
    with jax.default_matmul_precision("highest"):
        e_plain = PagedEngine(params, CFG, ecfg.replace(spec_k=0))
        e_ng = PagedEngine(params, CFG, ecfg, draft="ngram")
        reqs_a = [Request(i, list(p), np.ones(CFG.vocab_size, bool), 2, 13)
                  for i, p in enumerate(prompts)]
        reqs_b = [Request(i, list(p), np.ones(CFG.vocab_size, bool), 2, 13)
                  for i, p in enumerate(prompts)]
        e_plain.run(reqs_a)
        e_ng.run(reqs_b)
    for a, b in zip(reqs_a, reqs_b):
        assert a.output_ids == b.output_ids, (a.output_ids, b.output_ids)
    assert e_ng.spec_rounds > 0  # the ngram path actually ran
    assert e_ng.draft_params is None  # no draft model involved


def test_ngram_respects_eos_and_budget(setup, rng):
    """EOS inside an accepted ngram run truncates exactly like plain greedy."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=1,
                        prefill_chunk=16, spec_k=4)
    prompt = rng.integers(3, CFG.vocab_size, size=9).tolist()
    allow = np.ones(CFG.vocab_size, bool)
    with jax.default_matmul_precision("highest"):
        probe = Request(0, list(prompt), allow, eos_id=-1, max_new_tokens=12)
        PagedEngine(params, CFG, ecfg.replace(spec_k=0)).run([probe])
        eos = probe.output_ids[3]
        ra = Request(1, list(prompt), allow, eos_id=eos, max_new_tokens=12)
        rb = Request(2, list(prompt), allow, eos_id=eos, max_new_tokens=12)
        PagedEngine(params, CFG, ecfg.replace(spec_k=0)).run([ra])
        PagedEngine(params, CFG, ecfg, draft="ngram").run([rb])
    assert ra.output_ids == rb.output_ids
    assert ra.output_ids[-1] == eos


def test_ngram_high_acceptance_on_cyclic_model_output(setup, rng):
    """On a stream whose continuation IS a repeat of history (forced by a
    2-token allow mask so greedy decode cycles), lookup proposals accept
    nearly everything: emitted-per-round must clearly beat 1 (the plain-step
    floor).  This is the stage-C unit-stream shape (50 Hz, no dedup)."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=1,
                        prefill_chunk=16, spec_k=4)
    allow = np.zeros(CFG.vocab_size, bool)
    allow[40:42] = True  # binary stream -> short cycle, heavy repeats
    prompt = rng.integers(3, CFG.vocab_size, size=8).tolist()
    with jax.default_matmul_precision("highest"):
        e_ng = PagedEngine(params, CFG, ecfg, draft="ngram")
        r = Request(0, list(prompt), allow, eos_id=2, max_new_tokens=30)
        e_ng.run([r])
    assert r.finished and len(r.output_ids) == 30
    assert e_ng.spec_rounds > 0
    accept = e_ng.spec_emitted / e_ng.spec_rounds
    assert accept > 2.0, f"acceptance {accept} too low on a cyclic stream"


def test_ngram_mixed_paths_history_stays_consistent(setup, rng):
    """Staggered arrivals force transitions between prefill / chained decode
    / ngram rounds; the device history must be rebuilt across them (stale
    history would still be lossless but this asserts outputs AND that
    speculation re-engages after a non-spec interlude)."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=2,
                        prefill_chunk=16, spec_k=3)
    allow = np.ones(CFG.vocab_size, bool)
    prompts = [rng.integers(3, CFG.vocab_size, size=10 + i).tolist()
               for i in range(3)]
    with jax.default_matmul_precision("highest"):
        solo = []
        for i, p in enumerate(prompts):
            e = PagedEngine(params, CFG, ecfg.replace(spec_k=0))
            r = Request(i, list(p), allow, 2, 11)
            e.run([r])
            solo.append(r.output_ids)
        eng = PagedEngine(params, CFG, ecfg, draft="ngram")
        reqs = [Request(i, list(p), allow, 2, 11) for i, p in enumerate(prompts)]
        eng.submit(reqs[0])
        eng.tick()  # prefill r0
        eng.submit(reqs[1])  # arrives mid-flight: forces a non-spec interlude
        while eng.busy and not reqs[1].finished:
            eng.tick()
        eng.submit(reqs[2])
        while eng.busy:
            eng.tick()
        eng.drain_inflight()
    for r, s in zip(reqs, solo):
        assert r.output_ids == s, (r.req_id, r.output_ids, s)
    assert eng.spec_rounds > 0


def test_tp_ngram_matches_single_device(setup, rng):
    """ngram speculation composes with TP: proposal/history math is
    replicated, verification runs inside the shard_map."""
    from usdm_tpu.engine.tp import make_tp_mesh

    params = setup
    mesh = make_tp_mesh(2)
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=2,
                        prefill_chunk=16, spec_k=3)
    allow = np.ones(CFG.vocab_size, bool)
    prompts = [(list(rng.integers(3, 96, size=4)) * 4)[:13],
               rng.integers(3, CFG.vocab_size, size=9).tolist()]
    with jax.default_matmul_precision("highest"):
        e1 = PagedEngine(params, CFG, ecfg.replace(spec_k=0))
        base = [Request(i, list(prompts[i]), allow, eos_id=1, max_new_tokens=9)
                for i in range(2)]
        e1.run(base)
        etp = PagedEngine(params, CFG, ecfg, mesh=mesh, draft="ngram")
        tp_reqs = [Request(i, list(prompts[i]), allow, eos_id=1, max_new_tokens=9)
                   for i in range(2)]
        etp.run(tp_reqs)
    for a, b in zip(base, tp_reqs):
        assert a.output_ids == b.output_ids, (a.req_id, a.output_ids, b.output_ids)
    assert etp.spec_rounds > 0


def test_tp4_gqa_engine_matches_single_device(rng):
    """tp=4 at the PRODUCTION head geometry ratio (GQA 4:1, the 7B's 32q/8kv —
    here 16q/4kv so one kv head lands per device): the paged engine over a
    4-way 'model' mesh must emit exactly what the single-device engine emits,
    with chained decode + run-ahead + speculation all live.  The tiny 2-kv-head
    config used elsewhere caps TP at 2, so v5e-8-style shardings (kv heads
    split to 1/device, q groups device-local) were never exercised before this
    (VERDICT r3 item 5)."""
    from usdm_tpu.engine.tp import make_tp_mesh

    cfg = MistralConfig(
        vocab_size=96, hidden_size=256, intermediate_size=128,
        num_layers=2, num_heads=16, num_kv_heads=4, head_dim=16,
        sliding_window=64, max_seq_len=256, dtype="float32",
    )
    params = M.init_params(cfg, jax.random.PRNGKey(7), dtype="float32")
    mesh = make_tp_mesh(4)
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=3,
                        prefill_chunk=16, spec_k=3)
    allow = np.ones(cfg.vocab_size, bool)
    prompts = [rng.integers(3, cfg.vocab_size, size=8 + 3 * i).tolist()
               for i in range(3)]

    def mk(i):
        # all-greedy: speculation engages only for greedy batches, and greedy
        # is what stresses the sharded head geometry (sampling happens on the
        # replicated logits and is tp=2-covered above)
        return Request(i, list(prompts[i]), allow, eos_id=1, max_new_tokens=8)

    with jax.default_matmul_precision("highest"):
        e1 = PagedEngine(params, cfg, ecfg.replace(spec_k=0))
        base = [mk(i) for i in range(3)]
        e1.run(base)

        etp = PagedEngine(params, cfg, ecfg, mesh=mesh, draft=(params, cfg))
        tp_reqs = [mk(i) for i in range(3)]
        etp.run(tp_reqs)

    for a, b in zip(base, tp_reqs):
        assert a.output_ids == b.output_ids, (a.req_id, a.output_ids, b.output_ids)
    assert etp.spec_rounds > 0, "speculation must run under tp=4"


def test_scheduler_fuzz_invariants(setup):
    """Randomized scheduler stress: staggered arrivals, mixed greedy/sampled
    requests, sessions, a spec draft, a tight page pool forcing eviction.
    Invariants: every request finishes (or errors cleanly), greedy outputs
    equal their solo runs, all pages return to the pool, no slot stays busy."""
    params = setup
    fuzz = np.random.default_rng(1234)
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=6, max_batch_size=3,
                        n_pages=14, prefill_chunk=16, spec_k=2)
    allow = np.ones(CFG.vocab_size, bool)

    reqs = []
    for i in range(14):
        n = int(fuzz.integers(4, 40))
        max_new = int(fuzz.integers(1, 10))
        kw = {}
        if fuzz.random() < 0.3:
            kw = dict(top_k=int(fuzz.integers(2, 12)), temperature=0.8,
                      seed=int(fuzz.integers(0, 100)))
        if fuzz.random() < 0.4:
            kw["session"] = int(fuzz.integers(0, 3))
        reqs.append(Request(i, fuzz.integers(3, CFG.vocab_size, size=n).tolist(),
                            allow, eos_id=2, max_new_tokens=max_new, **kw))

    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ecfg, draft=(params, CFG))
        total_pages = len(eng.free_pages)
        i = 0
        while i < len(reqs) or eng.busy:
            if i < len(reqs) and fuzz.random() < 0.5:
                eng.submit(reqs[i])
                i += 1
            eng.tick()
        for s in range(3):
            eng.release_session(s)
        assert len(eng.free_pages) == total_pages
        assert (eng.status == 0).all() and not eng.session_slots
        st = eng.stats()
        assert st["total_finished"] == sum(1 for r in reqs if not r.error)

        for r in reqs:
            assert r.finished
            if r.error:
                continue
            solo = PagedEngine(params, CFG, ecfg)
            clone = Request(r.req_id, list(r.prompt_ids), r.allow_mask,
                            r.eos_id, r.max_new_tokens, top_k=r.top_k,
                            top_p=r.top_p, temperature=r.temperature, seed=r.seed)
            solo.run([clone])
            assert r.output_ids == clone.output_ids, (
                r.req_id, r.output_ids, clone.output_ids)


# ---------------------------------------------------------------------------
# int8 KV pages (EngineConfig.kv_dtype="int8")
# ---------------------------------------------------------------------------

ECFG_I8 = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=4,
                       kv_dtype="int8")


def test_int8_engine_batched_matches_solo(setup, rng):
    """Quantization must be deterministic and batching-invariant: the same
    request decodes identically solo and continuous-batched (exercises the
    int8 write paths of prefill, decode, and chained decode)."""
    params = setup
    with jax.default_matmul_precision("highest"):
        reqs = [_req(rng, i, n=8 + i, max_new=6) for i in range(5)]
        solo_outputs = []
        for r in reqs:
            eng = PagedEngine(params, CFG, ECFG_I8)
            assert eng.kv.quantized and eng.kv.k_pages.dtype == jnp.int8
            clone = Request(r.req_id, list(r.prompt_ids), r.allow_mask,
                            r.eos_id, r.max_new_tokens)
            eng.run([clone])
            solo_outputs.append(clone.output_ids)

        eng = PagedEngine(params, CFG, ECFG_I8)
        eng.run(reqs)
    for r, solo in zip(reqs, solo_outputs):
        assert r.finished
        assert r.output_ids == solo, f"req {r.req_id} differs batched vs solo"


def test_int8_speculative_equals_greedy(setup, rng):
    """Speculative decoding over int8 pools: verification rewrites the same
    quantized KV the sequential path would, so output stays exactly greedy."""
    params = setup
    with jax.default_matmul_precision("highest"):
        base = PagedEngine(params, CFG, ECFG_I8)
        req0 = _req(rng, 0, n=10, max_new=8)
        plain = Request(0, list(req0.prompt_ids), req0.allow_mask,
                        req0.eos_id, req0.max_new_tokens)
        base.run([plain])

        eng = PagedEngine(params, CFG, ECFG_I8, draft=(params, CFG))
        eng.run([req0])
    assert req0.output_ids == plain.output_ids
    assert eng.spec_rounds > 0


def test_int8_engine_close_to_bf16(setup, rng):
    """int8 pages change logits by ~0.4%: greedy outputs should mostly agree
    with the bf16 engine (identical until the first sub-noise-margin argmax)."""
    params = setup
    with jax.default_matmul_precision("highest"):
        r8 = _req(rng, 0, n=12, max_new=10)
        r16 = Request(0, list(r8.prompt_ids), r8.allow_mask, r8.eos_id,
                      r8.max_new_tokens)
        PagedEngine(params, CFG, ECFG_I8).run([r8])
        PagedEngine(params, CFG, ECFG).run([r16])
    agree = sum(a == b for a, b in zip(r8.output_ids, r16.output_ids))
    assert agree >= min(len(r8.output_ids), len(r16.output_ids)) * 0.5


# ---------------------------------------------------------------------------
# sliced lm_head greedy decode (logits_slice)
# ---------------------------------------------------------------------------


def test_mask_slice_detection():
    from usdm_tpu.engine.paged import _mask_slice

    v = 96
    m = np.zeros(v, bool)
    m[40:90] = True
    assert _mask_slice(m) == (40, 90, -1)
    m[5] = True  # isolated low extra (stage-C shape)
    assert _mask_slice(m) == (40, 90, 5)
    m[5] = False
    m[94] = True  # isolated high extra
    assert _mask_slice(m) == (40, 90, 94)
    m[7] = True  # two extras -> no slice
    assert _mask_slice(m) is None
    assert _mask_slice(np.ones(v, bool)) is None  # everything allowed
    assert _mask_slice(np.zeros(v, bool)) is None


def test_sliced_decode_matches_full_vocab(setup, rng):
    """A stage-C-shaped mask (interval + isolated extra) triggers the sliced
    lm_head path in the engine; output must equal the dense full-vocab
    generate loop token for token."""
    params = setup
    mask = np.zeros(CFG.vocab_size, bool)
    mask[40:90] = True
    mask[5] = True  # extra column outside the interval; also the EOS
    prompt = rng.integers(40, 90, size=10).tolist()

    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ECFG)
        req = Request(0, list(prompt), mask, eos_id=5, max_new_tokens=12)
        eng.run([req])
        # admission recorded the sliceable mask structure
        assert eng.slot_slice[0] == (40, 90, 5)

        toks, lens = generate(
            params, CFG,
            jnp.asarray(np.asarray(prompt, np.int32)[None]),
            jnp.asarray([len(prompt)], jnp.int32),
            jnp.asarray(mask), jnp.asarray(5, jnp.int32),
            max_new_tokens=12, attn_impl="xla",
        )
    dense = np.asarray(toks[0, : int(lens[0])]).tolist()
    assert req.output_ids[: len(dense)] == dense


def test_runahead_matches_no_runahead(setup, rng):
    """Depth-1 chain run-ahead (dispatch chain k+1 before syncing chain k)
    must be output-invisible: EOS mid-chain, budget-bound endings, and
    session-chained requests all emit exactly the non-run-ahead tokens."""
    params = setup
    base = dict(page_size=16, max_pages_per_seq=8, max_batch_size=2,
                decode_horizon=8)
    prompts = [rng.integers(3, CFG.vocab_size, size=n).tolist()
               for n in (9, 14, 11)]
    allow = np.ones(CFG.vocab_size, bool)

    def run(runahead):
        eng = PagedEngine(params, CFG, EngineConfig(runahead=runahead, **base))
        outs = []
        # greedy long (budget-bound), then session chain (stage-B/C shape)
        r1 = Request(0, prompts[0], allow, eos_id=2, max_new_tokens=20, session=7)
        eng.run([r1])
        r2 = Request(1, prompts[0] + r1.output_ids + prompts[1], allow,
                     eos_id=2, max_new_tokens=12, session=7)
        eng.run([r2])
        eng.release_session(7)
        # EOS mid-chain: pick the greedy continuation's 3rd token as the EOS
        probe = Request(2, prompts[2], allow, eos_id=2, max_new_tokens=16)
        eng.run([probe])
        eos = probe.output_ids[2] if len(probe.output_ids) > 3 else 2
        r3 = Request(3, prompts[2], allow, eos_id=eos, max_new_tokens=16)
        eng.run([r3])
        outs = [r1.output_ids, r2.output_ids, probe.output_ids, r3.output_ids]
        # free-pool invariant: nothing leaked across inflight chains
        assert len(eng.free_pages) == eng.n_pages - 1
        return outs

    with jax.default_matmul_precision("highest"):
        assert run(True) == run(False)


def test_runahead_engages(setup, rng):
    """The run-ahead path must actually engage for a quiet long decode (a
    regression here would silently fall back to synced chains)."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=1,
                        decode_horizon=8, runahead=True)
    eng = PagedEngine(params, CFG, ecfg)
    seen_inflight = False
    eng.submit(_req(rng, 0, n=10, max_new=40))
    while eng.busy:
        eng.tick()
        seen_inflight = seen_inflight or eng._inflight is not None
    assert seen_inflight


def test_defer_first_gate(setup):
    """First-token deferral must be off for streaming consumers, drafts,
    fused multi-impl, per-token mode, and any loaded state."""
    params = setup
    eng = PagedEngine(params, CFG, EngineConfig(page_size=16, max_pages_per_seq=8,
                                                max_batch_size=2, decode_horizon=8))
    allow = np.ones(CFG.vocab_size, bool)
    plain = Request(0, [5, 6, 7], allow, eos_id=2)
    streaming = Request(1, [5, 6, 7], allow, eos_id=2, stream=True)
    assert eng._defer_first_ok(plain)
    assert not eng._defer_first_ok(streaming)
    eng.multi_impl = "fused"
    assert not eng._defer_first_ok(plain)
    eng.multi_impl = "chain"
    eng.waiting.append(plain)
    assert not eng._defer_first_ok(plain)
    eng.waiting.clear()
    eng.decode_horizon = 1
    assert not eng._defer_first_ok(plain)


def test_tp_runahead_matches_single_device(setup, rng):
    """Chain run-ahead must engage under TP (the mesh gate was removed) and
    stay output-invisible: a tp=2 virtual-mesh engine with run-ahead emits
    exactly what the single-device no-run-ahead engine emits."""
    from usdm_tpu.engine.tp import make_tp_mesh

    params = setup
    mesh = make_tp_mesh(2)
    prompt = rng.integers(3, CFG.vocab_size, size=9).tolist()
    allow = np.ones(CFG.vocab_size, bool)
    base_cfg = dict(page_size=16, max_pages_per_seq=8, max_batch_size=1,
                    decode_horizon=8)

    with jax.default_matmul_precision("highest"):
        solo = PagedEngine(params, CFG, EngineConfig(runahead=False, **base_cfg))
        a = Request(0, list(prompt), allow, eos_id=2, max_new_tokens=24)
        solo.run([a])

        engtp = PagedEngine(params, CFG, EngineConfig(runahead=True, **base_cfg),
                            mesh=mesh)
        b = Request(1, list(prompt), allow, eos_id=2, max_new_tokens=24)
        engtp.submit(b)
        seen_inflight = False
        while engtp.busy:
            engtp.tick()
            seen_inflight = seen_inflight or engtp._inflight is not None
    assert seen_inflight, "run-ahead never engaged under TP"
    assert a.output_ids == b.output_ids


def test_release_session_before_followup_admits(setup, rng):
    """Releasing a session while its follow-up is still WAITING must fall
    back to a clean full prefill (no stale-hold reuse), with output equal to
    a fresh solo run."""
    params = setup
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ECFG)
        p1 = rng.integers(3, CFG.vocab_size, size=9).tolist()
        r1 = Request(0, list(p1), np.ones(CFG.vocab_size, bool), eos_id=2,
                     max_new_tokens=6, session=42)
        eng.run([r1])
        p2 = p1 + r1.output_ids + rng.integers(3, CFG.vocab_size, size=5).tolist()
        r2 = Request(1, list(p2), np.ones(CFG.vocab_size, bool), eos_id=2,
                     max_new_tokens=6, session=42)
        eng.submit(r2)
        eng.release_session(42)  # before r2 is admitted
        while eng.busy:
            eng.tick()

        solo = PagedEngine(params, CFG, ECFG)
        c = Request(2, list(p2), np.ones(CFG.vocab_size, bool), eos_id=2,
                    max_new_tokens=6)
        solo.run([c])
    assert r2.finished and r2.error is None
    assert r2.output_ids == c.output_ids
    eng.release_session(42)  # idempotent no-op
    assert len(eng.free_pages) == eng.n_pages - 1


def test_window_reclaimed_hold_not_reused(rng):
    """A held session whose leading pages were window-reclaimed must NOT be
    prefix-reused (a shorter successor's window could reach below the freed
    region): the follow-up full-prefills and still matches a fresh solo run."""
    cfg = CFG.replace(sliding_window=16)
    ecfg = EngineConfig(page_size=8, max_pages_per_seq=16, max_batch_size=2)
    params = M.init_params(cfg, jax.random.PRNGKey(1), dtype="float32")
    prompt = rng.integers(3, cfg.vocab_size, size=20).tolist()
    allow = np.ones(cfg.vocab_size, bool)

    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, cfg, ecfg)
        r1 = Request(0, list(prompt), allow, eos_id=2, max_new_tokens=40,
                     session=9)
        eng.run([r1])
        assert int(eng.released[eng.session_slots[9]]) > 0, (
            "geometry no longer triggers reclaim; test needs updating")
        p2 = prompt + r1.output_ids + rng.integers(3, cfg.vocab_size, size=4).tolist()
        r2 = Request(1, list(p2), allow, eos_id=2, max_new_tokens=6, session=9)
        chunks0 = eng.prefill_chunks
        eng.run([r2])
        # full prefill (no chunk-skipping reuse): every chunk of p2 ran
        c = ecfg.prefill_chunk
        assert eng.prefill_chunks - chunks0 >= -(-len(p2) // c)

        solo = PagedEngine(params, cfg, ecfg)
        sc = Request(2, list(p2), allow, eos_id=2, max_new_tokens=6)
        solo.run([sc])
    assert r2.output_ids == sc.output_ids
    eng.release_session(9)
    assert len(eng.free_pages) == eng.n_pages - 1


# ---------------------------------------------------------------------------
# Mixed prefill+decode dispatch (EngineConfig.mixed_prefill)
# ---------------------------------------------------------------------------


def _staggered(params, ecfg, prompts, allow, kws):
    """Submit prompts[0], tick until it decodes, then burst-submit the rest."""
    eng = PagedEngine(params, CFG, ecfg)
    reqs = [Request(i, list(p), allow, eos_id=1, max_new_tokens=10, **kw)
            for i, (p, kw) in enumerate(zip(prompts, kws))]
    eng.submit(reqs[0])
    for _ in range(3):
        eng.tick()
    for r in reqs[1:]:
        eng.submit(r)
    while eng.busy:
        eng.tick()
    eng.drain_inflight()
    return eng, [r.output_ids for r in reqs]


@pytest.mark.parametrize("sampled,rows", [(False, 4), (True, 4), (False, 2),
                                          (False, 1)])
def test_mixed_prefill_matches_alternating(setup, rng, sampled, rows):
    """mixed_prefill=True (prefill chunks coalesced into the decode batch,
    paged_ops.paged_mixed_step) must emit exactly what the alternating
    scheduler emits, greedy and sampled, at every row-batching width, under
    a staggered prefill burst."""
    params = setup
    prompts = [rng.integers(3, CFG.vocab_size, size=n).tolist()
               for n in (20, 35, 18, 40)]
    allow = np.ones(CFG.vocab_size, bool)
    kws = [dict(top_k=12, temperature=0.9, seed=i) if sampled else {}
           for i in range(4)]
    with jax.default_matmul_precision("highest"):
        ecfg_m = EngineConfig(page_size=16, max_pages_per_seq=8,
                              max_batch_size=4, prefill_chunk=16,
                              mixed_prefill=True, mixed_min_decode=1, mixed_prefill_rows=rows)
        ecfg_a = EngineConfig(page_size=16, max_pages_per_seq=8,
                              max_batch_size=4, prefill_chunk=16,
                              mixed_prefill=False)
        eng_m, out_m = _staggered(params, ecfg_m, prompts, allow, kws)
        eng_a, out_a = _staggered(params, ecfg_a, prompts, allow, kws)
    assert out_m == out_a
    assert "mixed_dispatch" in eng_m.perf, "mixed path never engaged"
    assert "mixed_dispatch" not in eng_a.perf
    assert len(eng_m.free_pages) == eng_m.n_pages - 1  # pool fully recovered


def test_mixed_prefill_advances_decode_during_burst(setup, rng):
    """During a prefill burst, every mixed link must ALSO advance the
    decoding slot (the r3 alternating drain gave it zero until the burst
    ended), and batched chunk rows must drain a multi-chunk prompt in one
    link (mixed_prefill_rows)."""
    params = setup
    allow = np.ones(CFG.vocab_size, bool)
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=4,
                        prefill_chunk=16, prefill_chunks_per_tick=4,
                        mixed_prefill=True, mixed_min_decode=1, mixed_prefill_rows=4)
    eng = PagedEngine(params, CFG, ecfg)
    ra = Request(0, rng.integers(3, 96, size=8).tolist(), allow, eos_id=1,
                 max_new_tokens=30)
    eng.submit(ra)
    for _ in range(3):
        eng.tick()
    eng.drain_inflight()
    base = len(ra.output_ids)
    chunks0 = eng.prefill_chunks
    # a 64-token prompt = 4 chunks of prefill: all 4 rows batch into ONE
    # mixed link, and the decoding slot still gains its token that tick
    rb = Request(1, rng.integers(3, 96, size=64).tolist(), allow, eos_id=1,
                 max_new_tokens=4)
    eng.submit(rb)
    eng.tick()
    assert len(ra.output_ids) >= base + 1  # decode rode the burst
    assert eng.prefill_chunks - chunks0 == 4  # whole prompt in one tick
    eng.run([])
    assert ra.finished and rb.finished

    # rows=1 degenerates to one chunk per link: decode gains ~1 token/chunk
    ecfg1 = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=4,
                         prefill_chunk=16, prefill_chunks_per_tick=4,
                         mixed_prefill=True, mixed_min_decode=1, mixed_prefill_rows=1)
    eng = PagedEngine(params, CFG, ecfg1)
    ra = Request(0, rng.integers(3, 96, size=8).tolist(), allow, eos_id=1,
                 max_new_tokens=30)
    eng.submit(ra)
    for _ in range(3):
        eng.tick()
    eng.drain_inflight()
    base = len(ra.output_ids)
    rb = Request(1, rng.integers(3, 96, size=64).tolist(), allow, eos_id=1,
                 max_new_tokens=4)
    eng.submit(rb)
    eng.tick()
    assert len(ra.output_ids) >= base + 3  # one token per chunk link
    eng.run([])
    assert ra.finished and rb.finished


def test_mixed_prefill_streaming_first_token_is_eager(setup, rng):
    """A streaming request completing its prompt mid-burst must have its
    first token recorded at that link (not deferred to the burst sync)."""
    params = setup
    allow = np.ones(CFG.vocab_size, bool)
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=4,
                        prefill_chunk=16, mixed_prefill=True, mixed_min_decode=1)
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ecfg)
        ra = _req(rng, 0, n=8, max_new=20)
        eng.submit(ra)
        for _ in range(3):
            eng.tick()
        rb = Request(1, rng.integers(3, 96, size=30).tolist(), allow, eos_id=1,
                     max_new_tokens=6, stream=True)
        eng.submit(rb)
        while not rb.output_ids:
            eng.tick()
        assert rb.ttft_s is not None  # recorded eagerly, mid-burst
        eng.run([])

        solo = PagedEngine(params, CFG, ecfg)
        clone = Request(2, list(rb.prompt_ids), allow, eos_id=1,
                        max_new_tokens=6)
        solo.run([clone])
    assert rb.output_ids == clone.output_ids


def test_mixed_prefill_with_ngram_engine(setup, rng):
    """draft='ngram' engines take the mixed path too (history rebuilds
    lazily after the burst); outputs stay equal to plain greedy."""
    params = setup
    allow = np.ones(CFG.vocab_size, bool)
    prompts = [rng.integers(3, CFG.vocab_size, size=n).tolist()
               for n in (20, 35, 18)]
    kws = [{}] * 3
    with jax.default_matmul_precision("highest"):
        ecfg = EngineConfig(page_size=16, max_pages_per_seq=8,
                            max_batch_size=4, prefill_chunk=16,
                            mixed_prefill=True, mixed_min_decode=1, spec_k=3)
        eng_n = PagedEngine(params, CFG, ecfg, draft="ngram")
        reqs = [Request(i, list(p), allow, eos_id=1, max_new_tokens=10)
                for i, p in enumerate(prompts)]
        eng_n.submit(reqs[0])
        for _ in range(3):
            eng_n.tick()
        for r in reqs[1:]:
            eng_n.submit(r)
        while eng_n.busy:
            eng_n.tick()
        eng_n.drain_inflight()

        _, out_plain = _staggered(params, ecfg, prompts, allow, kws)
    assert [r.output_ids for r in reqs] == out_plain


def test_mixed_prefill_int8_kv(setup, rng):
    """Mixed dispatch through int8 KV pools: batched == solo (exercises the
    quantized chunk-write + decode-write paths inside paged_mixed_step)."""
    params = setup
    allow = np.ones(CFG.vocab_size, bool)
    prompts = [rng.integers(3, CFG.vocab_size, size=n).tolist()
               for n in (20, 35)]
    with jax.default_matmul_precision("highest"):
        ecfg = EngineConfig(page_size=16, max_pages_per_seq=8,
                            max_batch_size=4, prefill_chunk=16,
                            mixed_prefill=True, mixed_min_decode=1, kv_dtype="int8")
        eng, outs = _staggered(params, ecfg, prompts, allow, [{}] * 2)
        solos = []
        for i, p in enumerate(prompts):
            solo = PagedEngine(params, CFG, ecfg)
            c = Request(i, list(p), allow, eos_id=1, max_new_tokens=10)
            solo.run([c])
            solos.append(c.output_ids)
    assert outs == solos


# ---------------------------------------------------------------- cancel


def test_cancel_waiting_request(setup, rng):
    """Cancelling a queued (never-admitted) request drops it without compute;
    everything else completes and the page pool recovers."""
    params = setup
    # 1-slot engine: the second submit must wait behind the first
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=1)
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ecfg)
        r1 = _req(rng, 0, max_new=8)
        r2 = _req(rng, 1, max_new=8)
        eng.submit(r1)
        eng.submit(r2)
        eng.tick()  # admits + prefills r1; r2 stays waiting
        assert eng.cancel(1) is True
        while eng.busy:
            eng.tick()
        eng.drain_inflight()
    assert r2.cancelled and r2.finished and r2.error is None
    assert r2.output_ids == []
    assert r1.finished and len(r1.output_ids) > 0
    assert eng.stats()["total_cancelled"] == 1
    assert len(eng.free_pages) == eng.n_pages - 1


def test_cancel_mid_decode_frees_slot(setup, rng):
    """Cancelling a decoding request finishes it immediately: slot FREE,
    pages back in the pool, engine idle; a later request reuses the slot."""
    from usdm_tpu.engine.paged import FREE

    params = setup
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ECFG)
        r = _req(rng, 0, max_new=64)
        eng.submit(r)
        eng.tick()  # prefill + first decode work
        assert eng.busy
        assert eng.cancel(0) is True
        eng.drain_inflight()
    assert r.cancelled and r.finished
    assert not eng.busy
    assert (eng.status == FREE).all()
    assert len(eng.free_pages) == eng.n_pages - 1
    # unknown / already-finished ids are a no-op
    assert eng.cancel(0) is False
    assert eng.cancel(99) is False
    with jax.default_matmul_precision("highest"):
        r2 = _req(rng, 1, max_new=6)
        eng.run([r2])
        solo = PagedEngine(params, CFG, ECFG)
        c = Request(1, list(r2.prompt_ids), np.ones(CFG.vocab_size, bool),
                    eos_id=2, max_new_tokens=6)
        solo.run([c])
    assert r2.output_ids == c.output_ids


def test_cancel_mid_prefill_session_hold_is_safe(setup, rng):
    """Cancelling a SESSION request mid-prefill leaves a HOLD that advertises
    only the kv-written prefix: the session follow-up reuses at most that
    prefix and its output equals a fresh solo run."""
    from usdm_tpu.engine.paged import HOLD

    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=4,
                        prefill_chunk=32)
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ecfg)
        prompt = rng.integers(3, CFG.vocab_size, size=56).tolist()
        r1 = Request(0, list(prompt), np.ones(CFG.vocab_size, bool), eos_id=2,
                     max_new_tokens=6, session=7)
        eng.submit(r1)
        eng._try_admit()
        assert eng._prefill_tick() is None  # 32 of 56 tokens written
        assert eng.cancel(0) is True
        assert r1.cancelled and r1.finished
        slot = eng.session_slots[7]
        assert eng.status[slot] == HOLD
        assert int(eng.seq_lens[slot]) == 32  # only the kv-written prefix
        # follow-up on the same session with the same prompt: must NOT trust
        # KV beyond the written 32 tokens
        r2 = Request(1, list(prompt), np.ones(CFG.vocab_size, bool), eos_id=2,
                     max_new_tokens=6, session=7)
        eng.run([r2])
        eng.release_session(7)

        solo = PagedEngine(params, CFG, ecfg)
        c = Request(2, list(prompt), np.ones(CFG.vocab_size, bool), eos_id=2,
                    max_new_tokens=6)
        solo.run([c])
    assert r2.output_ids == c.output_ids
    assert len(eng.free_pages) == eng.n_pages - 1


def test_cancel_during_runahead_chain(setup, rng):
    """cancel() with a dispatched run-ahead chain in flight syncs it first;
    if the sync already EOS/budget-finished the request, cancel reports
    False and the absorbed output stands."""
    params = setup
    ecfg = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=4,
                        runahead=True, decode_horizon=4)
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ecfg)
        r = _req(rng, 0, max_new=32)
        eng.submit(r)
        for _ in range(40):
            if r.finished or eng._inflight is not None:
                break
            eng.tick()
        got = eng.cancel(0)
        eng.drain_inflight()
        while eng.busy:
            eng.tick()
    assert r.finished
    assert got in (True, False)
    if not got:
        # sync finished it: output must equal the plain solo run
        with jax.default_matmul_precision("highest"):
            solo = PagedEngine(params, CFG, ecfg)
            c = Request(1, list(r.prompt_ids), np.ones(CFG.vocab_size, bool),
                        eos_id=2, max_new_tokens=32)
            solo.run([c])
        assert r.output_ids == c.output_ids
    assert len(eng.free_pages) == eng.n_pages - 1
