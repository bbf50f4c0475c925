"""EngineServer / PagedDialogPolicy concurrency tests (tiny model, CPU)."""

import threading

import jax
import numpy as np
import pytest

from usdm_tpu.core.config import EngineConfig, MistralConfig
from usdm_tpu.engine.paged import PagedEngine, Request
from usdm_tpu.engine.server import EngineServer, PagedDialogPolicy
from usdm_tpu.models import mistral as M

CFG = MistralConfig.tiny(vocab_size=96)
ECFG = EngineConfig(page_size=16, max_pages_per_seq=8, max_batch_size=4,
                    prefill_chunk=32)


@pytest.fixture(scope="module")
def params():
    return M.init_params(CFG, jax.random.PRNGKey(0), dtype="float32")


def test_concurrent_generate_matches_solo(params, rng):
    """N caller threads' outputs must equal their solo-engine runs, and the
    shared engine must batch them (fewer total steps than the solo sum)."""
    prompts = [rng.integers(3, 96, size=7 + i).tolist() for i in range(4)]
    allow = np.ones(CFG.vocab_size, bool)

    with jax.default_matmul_precision("highest"):
        solo = []
        solo_steps = 0
        for prm in prompts:
            eng = PagedEngine(params, CFG, ECFG)
            r = Request(0, list(prm), allow, eos_id=1, max_new_tokens=10)
            eng.run([r])
            solo.append(r.output_ids)
            solo_steps += eng.steps

        eng = PagedEngine(params, CFG, ECFG)
        server = EngineServer(eng)
        outs = {}

        def call(i):
            outs[i] = server.generate(prompts[i], allow, eos_id=1, max_new_tokens=10)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(300)
        server.close()

    for i in range(4):
        assert outs[i] == solo[i], f"prompt {i}: {outs[i]} vs {solo[i]}"
    assert eng.steps < solo_steps  # continuous batching actually shared steps


def test_server_rejects_after_close(params):
    server = EngineServer(PagedEngine(params, CFG, ECFG))
    server.close()
    with pytest.raises(RuntimeError):
        server.generate([3, 4, 5], np.ones(CFG.vocab_size, bool), 1, 4)
    with pytest.raises(RuntimeError):
        list(server.generate_stream([3, 4, 5], np.ones(CFG.vocab_size, bool), 1, 4))


def test_generate_stream_matches_generate(params, rng):
    """The streaming generator's concatenated yields equal generate()'s
    return, arrive progressively (more than one yield for a long decode),
    and the request is cleaned up from the server's tables afterwards."""
    prompt = rng.integers(3, 96, size=9).tolist()
    allow = np.ones(CFG.vocab_size, bool)
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ECFG)
        server = EngineServer(eng)
        try:
            plain = server.generate(prompt, allow, eos_id=1, max_new_tokens=24)
            yields = list(server.generate_stream(
                prompt, allow, eos_id=1, max_new_tokens=24, timeout=300))
        finally:
            server.close()
    assert sum(yields, []) == plain
    assert all(len(d) > 0 for d in yields)
    if len(plain) > 8:  # chains ramp 4->8->..., so a long decode yields >1 batch
        assert len(yields) >= 2
    assert not server._reqs and not server._events


def test_dialog_policy_streams_progress(rng):
    """on_tokens sees all three stages in order and every decoded token; the
    result is identical to a non-streaming policy run."""
    from usdm_tpu.core.tokenizer import UsdmTokenizer

    tok = UsdmTokenizer.build_test(num_units=32)
    cfg = MistralConfig.tiny(vocab_size=tok.vocab_size)
    prm = M.init_params(cfg, jax.random.PRNGKey(1), dtype="float32")
    units = rng.integers(0, 32, size=12).tolist()
    ecfg = EngineConfig(page_size=32, max_pages_per_seq=32, max_batch_size=2,
                        prefill_chunk=64)

    deltas = []
    with jax.default_matmul_precision("highest"):
        server = EngineServer(PagedEngine(prm, cfg, ecfg))
        plain = PagedDialogPolicy(server, tok, max_new_tokens=12).respond_to_units(units)
        streamed = PagedDialogPolicy(
            server, tok, max_new_tokens=12,
            on_tokens=lambda stage, ids: deltas.append((stage, list(ids))),
        ).respond_to_units(units)
        server.close()

    assert streamed.stage_tokens == plain.stage_tokens
    assert streamed.agent_text == plain.agent_text
    assert streamed.agent_units == plain.agent_units
    # stages appear in dialog order, each delta non-empty, and the per-stage
    # concatenation is exactly that stage's decoded tokens
    stages_seen = [s for s, _ in deltas]
    order = [s for i, s in enumerate(stages_seen) if i == 0 or s != stages_seen[i - 1]]
    assert order == ["unit2text", "text2text", "text2unit"]
    per_stage = {}
    for s, ids in deltas:
        assert ids
        per_stage.setdefault(s, []).extend(ids)
    assert per_stage == streamed.stage_tokens


def test_paged_dialog_policy_matches_dense(params, rng):
    """The 3-stage chain through the shared engine must equal the dense
    DialogPolicy's greedy outputs (same templates, same masks)."""
    from usdm_tpu.core.tokenizer import UsdmTokenizer
    from usdm_tpu.engine.dialog import DialogPolicy

    tok = UsdmTokenizer.build_test(num_units=32)
    cfg = MistralConfig.tiny(vocab_size=tok.vocab_size)
    prm = M.init_params(cfg, jax.random.PRNGKey(1), dtype="float32")
    units = rng.integers(0, 32, size=12).tolist()

    with jax.default_matmul_precision("highest"):
        dense = DialogPolicy(prm, cfg, tok, max_new_tokens=12,
                             attn_impl="xla").respond_to_units(units)
        server = EngineServer(PagedEngine(prm, cfg, EngineConfig(
            page_size=32, max_pages_per_seq=32, max_batch_size=2,
            prefill_chunk=64)))
        paged = PagedDialogPolicy(server, tok, max_new_tokens=12).respond_to_units(units)
        server.close()

    assert paged.stage_tokens == dense.stage_tokens
    assert paged.user_text == dense.user_text
    assert paged.agent_text == dense.agent_text
    assert paged.agent_units == dense.agent_units


def test_stage_budget_from_tokenizer_metadata(params):
    """Per-stage max tokens derive from tokenizer.model_max_length clipped to
    the engine page capacity (reference inference_vllm.py:113)."""
    from usdm_tpu.core.tokenizer import UsdmTokenizer

    tok = UsdmTokenizer.build_test(num_units=32)
    tok.model_max_length = 64
    server = EngineServer(PagedEngine(params, CFG, ECFG))
    pol = PagedDialogPolicy(server, tok)
    assert pol._budget(10) == 64 - 10 - 1
    # page capacity caps it: 8 pages * 16 = 128
    tok.model_max_length = 100000
    assert pol._budget(10) == 128 - 10 - 1
    # explicit max_new_tokens wins when smaller
    pol2 = PagedDialogPolicy(server, tok, max_new_tokens=5)
    assert pol2._budget(10) == 5
    server.close()


def test_dialog_through_spec_server_matches_plain():
    """A serving engine with a draft model (speculative decoding) produces
    exactly the plain engine's greedy 3-stage dialog result."""
    from usdm_tpu.core.config import EngineConfig
    from usdm_tpu.engine.server import PagedDialogPolicy
    from usdm_tpu.pipeline import UsdmPipeline

    pipe = UsdmPipeline.tiny_random()
    ecfg = EngineConfig(page_size=32, max_pages_per_seq=64, max_batch_size=2,
                        prefill_chunk=256)
    units = list(range(40))

    plain = pipe.make_server(ecfg)
    try:
        res_a = PagedDialogPolicy(plain, pipe.tokenizer, max_new_tokens=12,
                                  seed=0).respond_to_units(units)
    finally:
        plain.close()
    # draft = the target itself (perfect agreement; any draft gives the
    # same tokens, this also exercises full-acceptance chaining)
    spec = pipe.make_server(ecfg.replace(spec_k=3),
                            draft=(pipe.lm_params, pipe.lm_cfg))
    try:
        res_b = PagedDialogPolicy(spec, pipe.tokenizer, max_new_tokens=12,
                                  seed=0).respond_to_units(units)
        assert spec.engine.spec_rounds > 0
    finally:
        spec.close()
    assert res_a.stage_tokens == res_b.stage_tokens
    assert res_a.agent_units == res_b.agent_units


def test_early_exit_self_draft_matches_plain():
    """draft='early-exit:N' (first N layers of the target, no training, no
    extra checkpoint) must also emit exactly the plain greedy dialog."""
    from usdm_tpu.core.config import EngineConfig
    from usdm_tpu.engine.server import PagedDialogPolicy
    from usdm_tpu.pipeline import UsdmPipeline

    pipe = UsdmPipeline.tiny_random()
    ecfg = EngineConfig(page_size=32, max_pages_per_seq=64, max_batch_size=2,
                        prefill_chunk=256, spec_k=3)
    units = list(range(30))

    plain = pipe.make_server(ecfg)
    try:
        res_a = PagedDialogPolicy(plain, pipe.tokenizer, max_new_tokens=10,
                                  seed=0).respond_to_units(units)
    finally:
        plain.close()
    spec = pipe.make_server(ecfg, draft="early-exit:1")
    try:
        res_b = PagedDialogPolicy(spec, pipe.tokenizer, max_new_tokens=10,
                                  seed=0).respond_to_units(units)
        assert spec.engine.spec_rounds > 0
        assert spec.engine.draft_cfg.num_layers == 1
        st = spec.engine.stats()
        assert st["total_finished"] == 3 and st["free_pages"] > 0
    finally:
        spec.close()
    assert res_a.stage_tokens == res_b.stage_tokens


def test_ttft_reported(params, rng):
    """Time-to-first-token is recorded per request and aggregated in stats."""
    eng = PagedEngine(params, CFG, ECFG)
    reqs = [_mk_req(rng, i) for i in range(2)]
    eng.run(reqs)
    for r in reqs:
        assert r.ttft_s is not None and 0 <= r.ttft_s < 60
    st = eng.stats()
    assert st["ttft_mean_s"] is not None and st["ttft_max_s"] >= st["ttft_mean_s"] - 1e-9


def _mk_req(rng, rid):
    return Request(rid, rng.integers(3, CFG.vocab_size, size=10).tolist(),
                   np.ones(CFG.vocab_size, bool), eos_id=1, max_new_tokens=4)


def test_submit_never_blocks_behind_tick(params, rng):
    """The loop must tick the engine OUTSIDE the condition lock: a caller's
    generate() submission during a long decode chain (~0.4 s at horizon 32 on
    the chip) enqueues immediately instead of waiting for the chain to end
    (VERDICT r2 weak-3).  A 0.25 s artificial tick stands in for the chain."""
    import time

    eng = PagedEngine(params, CFG, ECFG.replace(decode_horizon=16))
    server = EngineServer(eng)
    orig_tick = eng.tick
    in_tick = threading.Event()

    def slow_tick():
        in_tick.set()
        time.sleep(0.25)
        return orig_tick()

    eng.tick = slow_tick
    allow = np.ones(CFG.vocab_size, bool)
    prompt = rng.integers(3, CFG.vocab_size, size=12).tolist()
    t1 = threading.Thread(
        target=lambda: server.generate(list(prompt), allow, 1, 12, timeout=60))
    t1.start()
    assert in_tick.wait(10)
    time.sleep(0.05)  # loop thread is now sleeping inside the slow tick
    t0 = time.time()
    with server._cv:  # generate()'s enqueue takes exactly this lock
        lock_wait = time.time() - t0
    assert lock_wait < 0.1, f"submission path blocked {lock_wait:.3f}s behind tick"
    # and a request submitted mid-tick still completes correctly
    out = server.generate(list(prompt), allow, 1, 12, timeout=60)
    t1.join(timeout=60)
    solo = PagedEngine(params, CFG, ECFG)
    sr = Request(0, list(prompt), allow, eos_id=1, max_new_tokens=12)
    solo.run([sr])
    assert out == sr.output_ids
    server.close()


def test_release_session_routed_to_loop_thread(params, rng):
    """release_session from a caller thread must not mutate engine state
    concurrently with a tick — it queues and the loop thread applies it."""
    eng = PagedEngine(params, CFG, ECFG)
    server = EngineServer(eng)
    allow = np.ones(CFG.vocab_size, bool)
    sess = server.new_session()
    server.generate(rng.integers(3, CFG.vocab_size, size=8).tolist(),
                    allow, 1, 4, session=sess, timeout=60)
    total = eng.n_pages - 1
    server.release_session(sess)
    deadline = __import__("time").time() + 10
    while len(eng.free_pages) != total and __import__("time").time() < deadline:
        __import__("time").sleep(0.01)
    assert len(eng.free_pages) == total
    assert not eng.session_slots
    server.close()


def test_engine_failure_fails_requests_not_callers(params):
    import time
    """A tick() exception (device OOM, XLA error) must surface as request
    errors promptly — not kill the loop thread and hang callers until their
    timeout — and later submissions must fail fast with the cause."""
    eng = PagedEngine(params, CFG, ECFG)
    server = EngineServer(eng)
    try:
        def boom():
            raise RuntimeError("injected device failure")
        eng.tick = boom
        allow = np.ones(CFG.vocab_size, bool)
        t0 = time.time()
        with pytest.raises(RuntimeError, match="injected device failure"):
            server.generate([5, 6, 7], allow, eos_id=2, max_new_tokens=4,
                            timeout=30)
        assert time.time() - t0 < 10, "caller waited out its timeout"
        with pytest.raises(RuntimeError, match="EngineServer failed"):
            server.generate([5, 6, 7], allow, eos_id=2, max_new_tokens=4,
                            timeout=30)
    finally:
        server.close()


def test_stream_first_yield_is_eager(params):
    """A quiet streaming request must surface its FIRST token promptly (one
    token in the first delta) — streaming requests opt out of first-token
    deferral, which would otherwise hold it for a whole decode chain."""
    eng = PagedEngine(params, CFG, EngineConfig(page_size=16, max_pages_per_seq=8,
                                                max_batch_size=2, decode_horizon=8))
    server = EngineServer(eng)
    try:
        allow = np.ones(CFG.vocab_size, bool)
        deltas = list(server.generate_stream([5, 6, 7, 8], allow, eos_id=2,
                                             max_new_tokens=20, timeout=60))
        assert len(deltas[0]) == 1, deltas
        assert sum(len(d) for d in deltas) == len(
            server.generate([5, 6, 7, 8], allow, eos_id=2, max_new_tokens=20,
                            timeout=60))
    finally:
        server.close()


# ---------------------------------------------------------------- cancel


def test_stream_close_cancels_request(params, rng):
    """Closing generate_stream early (SSE client disconnect) cancels the
    request on the engine: slot + pages free long before the token budget,
    and the engine goes idle."""
    import time

    prompt = rng.integers(3, 96, size=9).tolist()
    allow = np.ones(CFG.vocab_size, bool)
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ECFG)
        with EngineServer(eng) as server:
            gen = server.generate_stream(prompt, allow, eos_id=1,
                                         max_new_tokens=100, timeout=300)
            first = next(gen)
            assert first
            gen.close()  # caller vanishes
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline:
                if not eng.busy and eng.stats()["total_cancelled"] == 1:
                    break
                time.sleep(0.02)
            assert eng.stats()["total_cancelled"] == 1
            assert not eng.busy
            assert len(eng.free_pages) == eng.n_pages - 1


def test_generate_timeout_cancels(params, rng):
    """generate() raising TimeoutError also aborts the request instead of
    decoding its full budget for a caller that gave up."""
    import time

    prompt = rng.integers(3, 96, size=9).tolist()
    allow = np.ones(CFG.vocab_size, bool)
    with jax.default_matmul_precision("highest"):
        eng = PagedEngine(params, CFG, ECFG)
        with EngineServer(eng) as server:
            with pytest.raises(TimeoutError):
                server.generate(prompt, allow, eos_id=1, max_new_tokens=100,
                                timeout=0.01)
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline:
                if not eng.busy and eng.stats()["total_cancelled"] == 1:
                    break
                time.sleep(0.02)
            assert eng.stats()["total_cancelled"] == 1
            assert not eng.busy


def test_cancel_under_load_fuzz(params, rng):
    """Mixed full generations and mid-stream abandons under concurrent load:
    survivors' outputs equal their solo runs, every abandoned request is
    cancelled, and the page pool fully recovers."""
    import time

    allow = np.ones(CFG.vocab_size, bool)
    prompts = [rng.integers(3, 96, size=6 + i).tolist() for i in range(6)]
    abandon = {1, 3, 4}  # these streams stop reading after the first yield

    with jax.default_matmul_precision("highest"):
        solo = {}
        for i, prm in enumerate(prompts):
            if i in abandon:
                continue
            e = PagedEngine(params, CFG, ECFG)
            r = Request(0, list(prm), allow, eos_id=1, max_new_tokens=12)
            e.run([r])
            solo[i] = r.output_ids

        eng = PagedEngine(params, CFG, ECFG)
        outs = {}
        errs = {}

        def call(i):
            try:
                if i in abandon:
                    gen = server.generate_stream(prompts[i], allow, eos_id=1,
                                                 max_new_tokens=100, timeout=300)
                    next(gen)
                    gen.close()
                else:
                    outs[i] = server.generate(prompts[i], allow, eos_id=1,
                                              max_new_tokens=12, timeout=300)
            except Exception as e:  # noqa: BLE001
                errs[i] = e

        with EngineServer(eng) as server:
            threads = [threading.Thread(target=call, args=(i,))
                       for i in range(len(prompts))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(300)
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline:
                if not eng.busy and not eng.waiting:
                    break
                time.sleep(0.02)
            eng_stats = eng.stats()

    assert not errs, errs
    for i, want in solo.items():
        assert outs[i] == want, f"prompt {i}: {outs[i]} vs {want}"
    # every abandoned stream was either cancelled or had already finished;
    # nothing leaks: all pages home (session-less requests leave no HOLDs)
    assert eng_stats["total_cancelled"] >= 1
    assert len(eng.free_pages) == eng.n_pages - 1
