"""Paged-KV continuous-batching decode engine.

TPU-native replacement for the reference's vLLM path
(/root/reference/src/inference_vllm.py:109: continuous batching + PagedAttention
CUDA kernels + per-stage logits processors / SamplingParams).  Design:

  * KV memory is a pool of fixed-size pages in HBM:
    k_pages/v_pages [Hkv, L*N, P, hd].  A host-side free list assigns pages;
    sequences own scattered pages via a page table [slots, max_pages].
    Admission never reshapes device buffers.
  * Decode is one jitted step over all active slots: embed, 32-layer scan,
    per-slot page-table attention (Pallas kernel on TPU), per-slot logit
    masks, per-slot top-k/top-p/temperature sampling with per-request PRNG
    keys (vLLM SamplingParams, inference_vllm.py:112-125) — the host sees one
    token per slot per step.
  * Prefill is CHUNKED and non-blocking: each engine step advances at most
    one waiting prompt by `prefill_chunk` tokens, writing K/V straight into
    the request's pages, while every decoding slot still emits its token that
    step — an admission can never stall in-flight requests by more than one
    chunk (vLLM chunked-prefill scheduling).
  * Continuous batching: finished slots free their pages and are refilled
    from the waiting queue between steps with best-fit admission (no
    head-of-line blocking).  The scheduler is host Python; the hot loop never
    leaves the device.

Per-request logit masks + stop ids implement the 3-stage dialog constraints
(inference_vllm.py:70-84,112-125) as vectorized jnp ops.
"""

from __future__ import annotations

import dataclasses
import time as _time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from usdm_tpu.core.config import EngineConfig, MistralConfig
from usdm_tpu.models import mistral as M

# Device-side jitted pieces live in paged_ops; re-exported here so existing
# imports (tests, bench, tp) keep working.
from usdm_tpu.engine.paged_ops import (  # noqa: F401
    paged_prefill_chunk_packed,
    PagedKV,
    paged_decode_multi,
    paged_decode_step,
    paged_decode_step_chained,
    paged_mixed_step,
    paged_ngram_round,
    paged_prefill_chunk,
    paged_spec_accept,
    paged_verify_step,
    sample_next,
)

# slot states (HOLD: finished request whose pages are retained for prefix
# reuse by the next request of the same session — vLLM prefix caching)
FREE, PREFILL, DECODE, HOLD = 0, 1, 2, 3

# ---------------------------------------------------------------------------
# Host-side scheduler (continuous batching)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Request:
    req_id: int
    prompt_ids: List[int]
    allow_mask: np.ndarray  # [V] bool
    eos_id: int
    max_new_tokens: int = 256
    # sampling (vLLM SamplingParams analog; top_k=1 -> greedy)
    top_k: int = 1
    top_p: float = 1.0
    temperature: float = 1.0
    seed: int = 0
    # prefix-reuse session (vLLM prefix caching analog): requests sharing a
    # session id reuse the KV of their longest common token prefix with the
    # session's previous request — the 3-stage dialog chain re-prefills only
    # each stage's new suffix instead of the whole conversation so far.
    session: Optional[int] = None
    # a streaming consumer reads output_ids incrementally (EngineServer
    # generate_stream): the engine then avoids latency-for-throughput trades
    # that would delay the first visible token (first-token deferral)
    stream: bool = False
    # filled by the engine:
    output_ids: List[int] = dataclasses.field(default_factory=list)
    finished: bool = False
    t_submit: float = 0.0  # set by PagedEngine.submit
    ttft_s: Optional[float] = None  # submit -> first token latency
    error: Optional[str] = None  # set instead of raising (scheduler runs on a
    # background thread in EngineServer; an exception there would hang callers)
    cancelled: bool = False  # aborted via PagedEngine.cancel (vLLM abort analog)

    @property
    def sampled(self) -> bool:
        return self.top_k != 1


def _mask_slice(mask) -> Optional[tuple]:
    """(lo, hi, extra) if `mask` is an interval of allowed ids plus at most
    one isolated extra column (the dialog stage masks,
    ops/sampling.stage_allow_mask) — enables the lossless sliced-lm_head
    greedy decode (paged_ops.paged_decode_step logits_slice).  None if the
    mask has no such structure or allows everything (slice wouldn't help)."""
    import numpy as _np

    idx = _np.flatnonzero(_np.asarray(mask))
    n = len(idx)
    v = len(mask)
    if n == 0 or n > 0.9 * v:
        return None
    if idx[-1] - idx[0] + 1 == n:  # pure interval
        return (int(idx[0]), int(idx[-1]) + 1, -1)
    if n >= 2 and idx[-1] - idx[1] + 1 == n - 1:  # isolated low + interval
        return (int(idx[1]), int(idx[-1]) + 1, int(idx[0]))
    if n >= 2 and idx[-2] - idx[0] + 1 == n - 1:  # interval + isolated high
        return (int(idx[0]), int(idx[-2]) + 1, int(idx[-1]))
    return None


def _ctx_pages_bucket(n_pages: int, maxp: int) -> int:
    """Round the context-gather page count up to a power of two (bounds the
    number of compiled paged_prefill_chunk variants to log2(maxp))."""
    b = 1
    while b < n_pages:
        b *= 2
    return min(b, maxp) if n_pages <= maxp else maxp


@jax.jit
def _admit_slot_update(allow_dev, keys_dev, slot, mask, key):
    """One dispatch for the per-admission device-state writes (separate
    .at[].set() calls each pay a tunnel round trip)."""
    return allow_dev.at[slot].set(mask), keys_dev.at[slot].set(key)


@jax.jit
def _inject_first(tok_vec, done_vec, slot, first_tok, eos_vec):
    """Fold a deferred post-prefill first token into a chain's input state:
    the token becomes the slot's chain input, and the done flag is set on
    device if it already IS the slot's stage EOS (the host hasn't seen the
    token yet, so the check must happen here)."""
    return (tok_vec.at[slot].set(first_tok),
            done_vec.at[slot].set(first_tok == eos_vec[slot]))


class PagedEngine:
    """Continuous-batching engine over the paged KV pool.

    Pass `mesh` (a 1-D Mesh over the 'model' axis, engine.tp.make_tp_mesh) to
    shard the LM and KV pool tensor-parallel across devices: decode/prefill
    then run as shard_maps with explicit ICI collectives (SURVEY §2.3 TP
    serving).  The host-side scheduler is identical either way.
    """

    def __init__(self, params: M.Params, cfg: MistralConfig, ecfg: EngineConfig,
                 mesh=None, draft=None):
        """`draft=(draft_params, draft_cfg)` enables greedy speculative
        decoding (ecfg.spec_k tokens drafted per round, verified by one
        target forward).  The draft model shares page tables with the target
        and keeps its own KV pool; output is IDENTICAL to plain greedy
        decode for any draft — only speed depends on draft agreement.

        `draft="ngram"` enables DRAFT-FREE prompt-lookup speculation (vLLM's
        ngram method): proposals come from matching the current suffix
        against the sequence's own token history on device — no draft model,
        no draft KV pool, and non-speculating turns keep full chained decode
        (a model draft forces per-token mirroring instead)."""
        self.ngram = draft == "ngram"
        if self.ngram:
            draft = None
        self.cfg = cfg
        self.ecfg = ecfg
        self.mesh = mesh
        ps = ecfg.page_size
        # +1: the last page is a reserved scratch target for inactive slots
        n_pages = (ecfg.n_pages or ecfg.max_batch_size * ecfg.max_pages_per_seq) + 1
        self.n_pages = n_pages
        if ecfg.kv_dtype not in (None, "int8"):
            raise ValueError(f"kv_dtype must be None or 'int8', got {ecfg.kv_dtype!r}")
        kv_dtype = jnp.int8 if ecfg.kv_dtype == "int8" else None
        self.kv = PagedKV.create(cfg, n_pages, ps, dtype=kv_dtype)
        if mesh is not None:
            from usdm_tpu.engine import tp as TP

            params = TP.shard_params(params, mesh, cfg)
            self.kv = TP.shard_kv(self.kv, mesh)
            self._tp_decode = TP.make_decode_step(mesh, cfg, ps)
            self._tp_prefill = TP.make_prefill_chunk(mesh, cfg, ps)
            self._tp_chained = TP.make_decode_step_chained(mesh, cfg, ps)
            self._tp_spec = TP.make_spec_accept(mesh, cfg, ps)
            self._tp_ngram = TP.make_ngram_round(mesh, cfg, ps)
        self.params = params
        self.free_pages: List[int] = list(range(n_pages - 1))
        b = ecfg.max_batch_size
        self.page_table = np.zeros((b, ecfg.max_pages_per_seq), np.int32)
        self.seq_lens = np.zeros(b, np.int32)
        self.tokens = np.zeros(b, np.int32)
        self.status = np.zeros(b, np.int32)  # FREE / PREFILL / DECODE
        self.top_k = np.ones(b, np.int32)
        self.top_p = np.ones(b, np.float32)
        self.temp = np.ones(b, np.float32)
        self.eos = np.zeros(b, np.int32)
        # device-resident per-slot state, rewritten only on admission (the
        # [B, V] mask upload per step would dominate tunnel traffic otherwise)
        self._allow_dev = jnp.ones((b, cfg.vocab_size), bool)
        self._keys_dev = jnp.zeros((b, 2), jnp.uint32)
        # device mirrors of slot state that only changes at admission /
        # window-reclaim: re-uploading table/eos/sampling params on every
        # chain link adds up over a tunneled TPU (dozens of tiny transfers
        # per decoded token otherwise)
        self._dev_dirty = True
        self._slot_dev = None  # (table, eos, top_k, top_p, temp)
        # device copies of per-stage allow masks (the dialog cycles the same
        # 3 masks forever; re-uploading 42 KB per admission costs a round
        # trip each time)
        self._mask_cache: dict = {}
        # device-resident (tokens, seq_lens) carried between chains: the
        # previous chain's outputs ARE the next chain's inputs, so steady-
        # state decode needs no host->device upload at all.  None = host
        # state changed; re-upload.
        self._hot = None
        # deferred post-prefill first tokens: slot -> device scalar.  The
        # host sync on the first sampled token costs an RTT AND idle-waits
        # for the whole prefill compute tail; deferring it lets the next
        # chain take the device scalar as its input and the host learns the
        # token at the chain's one sync.  Consumed by step_chain; any other
        # decode path flushes synchronously first (_flush_pending).
        self._pending_first: dict = {}
        # depth-1 chain run-ahead: the last dispatched-but-unsynced chain's
        # metadata (see _dispatch_chain).  While it is in flight, the next
        # tick dispatches its successor from the carried device state BEFORE
        # syncing it, so the sync's host RTT and absorb overlap the
        # successor's device compute (~25 ms/chain on a tunneled chip).
        self._inflight: Optional[dict] = None
        # per-slot admission generation: bumped on every _admit_into, so a
        # chain dispatched for generation g is never absorbed into a slot
        # re-admitted at generation g+1 (its frozen links emit zeros there)
        self.slot_gen = np.zeros(b, np.int64)
        # ngram speculation: device-resident token history [B, S] for
        # prompt-lookup proposals.  Rebuilt lazily from host state whenever a
        # non-ngram path emitted tokens or a slot was (re)admitted
        # (_ensure_hist); chained ngram rounds update it on device.
        self._hist_dev = None
        self._hist_dirty = True
        self.slot_req: List[Optional[Request]] = [None] * b
        self.slot_slice: List[Optional[tuple]] = [None] * b  # lm_head slice
        self.slot_pages: List[List[int]] = [[] for _ in range(b)]
        # sliding-window reclaim: count of leading pages already returned to
        # the pool (their tokens fell out of the attention window)
        self.released = np.zeros(b, np.int32)
        self.prefill_pos = np.zeros(b, np.int32)  # prompt tokens written so far
        self.prefill_order: List[int] = []  # FCFS queue of PREFILL slots
        self.waiting: List[Request] = []
        # prefix reuse: session -> HOLD slot, and per-slot token history whose
        # KV the held pages cover (kv-written length = seq_lens[slot])
        self.session_slots: dict = {}
        self.slot_history: List[List[int]] = [[] for _ in range(b)]
        self._hold_order: List[int] = []  # LRU for eviction under pressure
        self.steps = 0
        self.prefill_chunks = 0  # chunk dispatches (telemetry + reuse tests)
        # device-side decode horizon: sync with the host every N tokens when
        # no admissions are pending.  multi_impl="chain" (step_chain) runs
        # back-to-back single-step dispatches with one sync per horizon; the
        # fused fori_loop ("fused", paged_decode_multi) lowers the same math
        # in one dispatch.  Measured b=1 7B-int8 on a tunneled v5e (post
        # pool-layout fix): per-token sync ~57 tok/s, chain16 79, chain32 86,
        # fused32 75 — chain wins slightly and is the default.
        self.decode_horizon = ecfg.decode_horizon
        self.multi_impl = "chain"
        self._chain_streak = 0  # consecutive chains with a stable decode set
        self.draft_params = self.draft_cfg = self.draft_kv = None
        if draft is not None:
            self.draft_params, self.draft_cfg = draft
            if self.draft_cfg.vocab_size != cfg.vocab_size:
                raise ValueError("draft vocab must match the target's")
            self.draft_kv = PagedKV.create(self.draft_cfg, n_pages, ps)
            if mesh is not None:  # draft shards TP like the target
                from usdm_tpu.engine import tp as TP

                self.draft_params = TP.shard_params(self.draft_params, mesh,
                                                    self.draft_cfg)
                self.draft_kv = TP.shard_kv(self.draft_kv, mesh)
                self._tp_decode_draft = TP.make_decode_step(mesh, self.draft_cfg, ps)
                self._tp_prefill_draft = TP.make_prefill_chunk(mesh, self.draft_cfg, ps)
        from collections import deque

        self._ttfts = deque(maxlen=200)  # recent time-to-first-token samples
        self.spec_rounds = 0  # telemetry: rounds run / tokens accepted
        self.spec_emitted = 0
        self.total_emitted = 0  # all tokens emitted across requests
        self.total_finished = 0
        self.total_cancelled = 0
        self._t0 = __import__("time").time()
        # wall-time accounting per scheduler phase (stats()["perf_s"]):
        # where a tick actually spends time on a tunneled chip — dispatch
        # vs host sync vs scheduler bookkeeping
        self.perf: dict = {}

    def _acc(self, key: str, dt: float) -> None:
        self.perf[key] = self.perf.get(key, 0.0) + dt

    @property
    def active(self) -> np.ndarray:
        """[B] bool: slots currently decoding (PREFILL slots excluded)."""
        return self.status == DECODE

    @property
    def busy(self) -> bool:
        """Work pending (HOLD slots are idle capacity, not work)."""
        return bool(self.waiting
                    or ((self.status == PREFILL) | (self.status == DECODE)).any())

    # ------------------------------------------------------------ scheduling
    def submit(self, req: Request) -> None:
        import time as _t

        if not req.t_submit:  # EngineServer stamps at caller submit time
            req.t_submit = _t.time()
        self.waiting.append(req)

    def _pages_needed(self, n_tokens: int) -> int:
        return -(-n_tokens // self.ecfg.page_size)

    def _free_slots(self) -> List[int]:
        return [s for s in range(self.ecfg.max_batch_size) if self.status[s] == FREE]

    def _reuse_start(self, req: Request) -> int:
        """Page-aligned prefill resume point for a session request against
        its held predecessor, or 0 (full prefill).

        The longest common token prefix of the new prompt and the held
        (prompt + output) history, clipped to the kv-written length, then
        rounded DOWN to a PAGE multiple — the page-aligned prefill write path
        only needs `start % page_size == 0` (it writes whole pages from
        `start // page_size`), and the re-prefilled tail below `common`
        rewrites bit-identical KV (same tokens, positions, weights).  Page
        granularity beats the old chunk granularity: the 3-stage dialog's
        stage-B prompt shares ~250 tokens with stage A's history, which a
        256-token chunk floor rounded to ZERO reuse (full re-prefill) while
        64-token pages keep 192 of them."""
        slot = self.session_slots.get(req.session)
        if slot is None or self.status[slot] != HOLD:
            return 0
        if int(self.released[slot]) != 0:
            # window-reclaimed leading pages are gone; a shorter successor
            # sequence's attention window could reach below the reclaimed
            # region, so only an intact prefix is reusable
            return 0
        hist = self.slot_history[slot]
        limit = min(len(req.prompt_ids), len(hist), int(self.seq_lens[slot]))
        common = 0
        while common < limit and req.prompt_ids[common] == hist[common]:
            common += 1
        # page-aligned start satisfies both write paths: the whole-page DUS
        # branch (start % page == 0, chunk a page multiple) and the scatter
        # fallback (any start)
        ps = self.ecfg.page_size
        return (common // ps) * ps

    def _admit_into(self, req: Request, slot: int, start: int, extra: List[int]) -> None:
        """Bind `req` to `slot`, prefilling from `start` (pages already owned
        plus `extra` fresh ones)."""
        self.slot_pages[slot] = self.slot_pages[slot] + extra
        self.slot_gen[slot] += 1
        row = np.full(self.ecfg.max_pages_per_seq, self.n_pages - 1, np.int32)
        row[: len(self.slot_pages[slot])] = self.slot_pages[slot]
        # leading pages already reclaimed by the sliding window stay trashed
        row[: int(self.released[slot])] = self.n_pages - 1
        self.page_table[slot] = row
        self.slot_req[slot] = req
        self.slot_history[slot] = []
        self.status[slot] = PREFILL
        self._chain_streak = 0
        self.prefill_pos[slot] = start
        self.prefill_order.append(slot)
        self.top_k[slot] = req.top_k
        self.top_p[slot] = req.top_p
        self.temp[slot] = req.temperature
        self.eos[slot] = req.eos_id
        self.slot_slice[slot] = _mask_slice(req.allow_mask)
        mk = req.allow_mask.tobytes()
        mask_dev = self._mask_cache.get(mk)
        if mask_dev is None:
            mask_dev = jnp.asarray(req.allow_mask)
            if len(self._mask_cache) < 16:
                self._mask_cache[mk] = mask_dev
        # threefry PRNGKey(seed) is just [0, seed & 0xffffffff] (x64 off) —
        # build it host-side instead of a device dispatch + readback
        key = np.array([0, req.seed & 0xFFFFFFFF], np.uint32)
        self._allow_dev, self._keys_dev = _admit_slot_update(
            self._allow_dev, self._keys_dev, slot, mask_dev, key)
        self._dev_dirty = True
        self._hot = None
        self._hist_dirty = True

    def _try_admit(self) -> None:
        """Assign waiting requests to free slots + pages (no compute here).

        FCFS with skip: a request that doesn't fit right now doesn't block
        smaller ones behind it (the round-1 head-of-line `break` is gone).
        Session requests resume on their held slot when the prefix matches;
        HOLD slots are evicted LRU when capacity is needed.
        """
        i = 0
        while i < len(self.waiting):
            req = self.waiting[i]
            need = self._pages_needed(len(req.prompt_ids) + req.max_new_tokens)
            if need > self.ecfg.max_pages_per_seq:
                # can never fit: fail it instead of wedging the queue
                req.error = (
                    f"request needs {need} pages > "
                    f"max_pages_per_seq={self.ecfg.max_pages_per_seq}"
                )
                req.finished = True
                self.waiting.pop(i)
                continue

            # session fast path: resume on the held slot, prefill the suffix
            start = self._reuse_start(req) if req.session is not None else 0
            if start > 0:
                slot = self.session_slots[req.session]
                extra_need = need - len(self.slot_pages[slot])
                if extra_need <= len(self.free_pages):
                    del self.session_slots[req.session]
                    self._hold_order.remove(slot)
                    extra = [self.free_pages.pop() for _ in range(max(extra_need, 0))]
                    self.waiting.pop(i)
                    self._admit_into(req, slot, start, extra)
                    continue

            slots = self._free_slots()
            if not slots and self._hold_order:
                self._release_hold(self._hold_order[0])  # LRU eviction
                slots = self._free_slots()
            while need > len(self.free_pages) and self._hold_order:
                self._release_hold(self._hold_order[0])
            if not slots or need > len(self.free_pages):
                i += 1
                continue
            if req.session is not None:  # stale hold that didn't match
                slot_h = self.session_slots.get(req.session)
                if slot_h is not None:
                    self._release_hold(slot_h)
            self.waiting.pop(i)
            slot = slots[0]
            self.released[slot] = 0
            self.slot_pages[slot] = []
            extra = [self.free_pages.pop() for _ in range(need)]
            self._admit_into(req, slot, 0, extra)

    def _prefill_tick(self) -> Optional[int]:
        """Advance the oldest prefilling request by one chunk.  Returns the
        slot index when this call COMPLETED a prompt (first token sampled),
        else None."""
        if not self.prefill_order:
            return None
        self.prefill_chunks += 1
        slot = self.prefill_order[0]
        req = self.slot_req[slot]
        start = int(self.prefill_pos[slot])
        n = min(self.ecfg.prefill_chunk, len(req.prompt_ids) - start)
        c = self.ecfg.prefill_chunk
        ncp = _ctx_pages_bucket(
            self._pages_needed(start + c), self.ecfg.max_pages_per_seq
        )
        # every per-chunk input rides ONE upload (tunnel round trip each
        # otherwise): ids | start | n_valid | page-table row
        packed = np.empty(c + 2 + self.page_table.shape[1], np.int32)
        packed[:c] = 0
        packed[:n] = req.prompt_ids[start : start + n]
        packed[c] = start
        packed[c + 1] = n
        packed[c + 2 :] = self.page_table[slot]
        if self.mesh is not None:
            logits, self.kv = self._tp_prefill(
                self.params, self.kv,
                jnp.asarray(packed[:c]), jnp.asarray(start, jnp.int32),
                jnp.asarray(n, jnp.int32), jnp.asarray(self.page_table[slot]), ncp,
            )
        else:
            logits, self.kv = paged_prefill_chunk_packed(
                self.params, self.kv, self.cfg, jnp.asarray(packed),
                self.ecfg.page_size, ncp, c,
            )
        if self.draft_params is not None:
            # the draft model prefills the same chunk into ITS pool — without
            # a prompt-conditioned draft cache, proposals are garbage and
            # speculative acceptance collapses (outputs would still be
            # correct via verification, just slow)
            if self.mesh is not None:
                _, self.draft_kv = self._tp_prefill_draft(
                    self.draft_params, self.draft_kv,
                    jnp.asarray(packed[:c]), jnp.asarray(start, jnp.int32),
                    jnp.asarray(n, jnp.int32), jnp.asarray(self.page_table[slot]), ncp,
                )
            else:
                _, self.draft_kv = paged_prefill_chunk_packed(
                    self.draft_params, self.draft_kv, self.draft_cfg,
                    jnp.asarray(packed), self.ecfg.page_size, ncp, c,
                )
        self.prefill_pos[slot] = start + n
        if start + n < len(req.prompt_ids):
            return None  # more chunks to go; logits discarded
        # prompt complete: sample the first generated token
        self.prefill_order.pop(0)
        tok, new_key = sample_next(
            logits, self._allow_dev[slot], self._keys_dev[slot],
            req.top_k, req.top_p, req.temperature, do_sample=req.sampled,
        )
        self._keys_dev = self._keys_dev.at[slot].set(new_key)
        self.seq_lens[slot] = len(req.prompt_ids)
        self.status[slot] = DECODE
        self._hot = None
        if self._defer_first_ok(req):
            # DEFER the host sync: int(tok) here would idle-wait the whole
            # prefill compute tail plus an RTT before any decode work could
            # even be dispatched.  The next chain injects the device scalar
            # as this slot's input token (_inject_first) and the host learns
            # it at the chain's single sync.  Paths that need self.tokens
            # host-side flush synchronously first (_flush_pending).
            self._pending_first[slot] = tok
            return slot
        t_sync = _time.perf_counter()
        first = int(tok)
        self._acc("first_tok_sync", _time.perf_counter() - t_sync)
        self._record_first(slot, first)
        return slot

    def _multi_next(self) -> bool:
        """Next tick's decode will be multi-token (chain or fused): deferring
        a post-prefill per-token decode step to it saves the per-token host
        sync either way.  Shared by step()'s and tick()'s defer branches so
        the predicate can't drift between copies.  ngram mode also defers
        nothing: the next tick is a spec round, which flushes eagerly."""
        return (self.decode_horizon > 1 and self.draft_params is None
                and not self.ngram)

    def _defer_first_ok(self, req: Request) -> bool:
        """Deferred-first-token gate: only the CHAIN path can absorb a
        pending device token without an extra sync (step_multi/step flush
        eagerly, costing what the deferral saved); only in the quiet state
        (under load the scheduler keeps prefilling other prompts first, so a
        deferred sync would sit on this request's TTFT for several chunks);
        and never for streaming consumers, whose first visible token would
        otherwise wait a full chain (~0.1-0.2 s)."""
        return (self._multi_next() and self.multi_impl == "chain"
                and not self.waiting and not self.prefill_order
                and not req.stream)

    def _record_first(self, slot: int, first: int) -> None:
        """Host bookkeeping for a post-prefill first token (sync path and
        pending flush share it)."""
        import time as _t

        req = self.slot_req[slot]
        req.ttft_s = _t.time() - req.t_submit
        self._ttfts.append(req.ttft_s)
        req.output_ids.append(first)
        self.tokens[slot] = first
        self._hist_dirty = True
        if first == req.eos_id or len(req.output_ids) >= req.max_new_tokens:
            self._finish(slot)

    def _flush_pending(self) -> None:
        """Synchronously absorb deferred first tokens — decode paths that
        read self.tokens host-side (step/step_multi/step_spec) call this
        before dispatching."""
        for slot, tok in list(self._pending_first.items()):
            t0 = _time.perf_counter()
            first = int(tok)
            self._acc("first_tok_sync", _time.perf_counter() - t0)
            self._record_first(slot, first)
        self._pending_first.clear()

    def _slot_state_dev(self):
        """(table, eos, top_k, top_p, temp) device arrays, re-uploaded only
        when host-side slot state changed."""
        if self._dev_dirty or self._slot_dev is None:
            self._slot_dev = (
                jnp.asarray(self.page_table), jnp.asarray(self.eos),
                jnp.asarray(self.top_k), jnp.asarray(self.top_p),
                jnp.asarray(self.temp),
            )
            self._dev_dirty = False
        return self._slot_dev

    def stats(self) -> dict:
        """Serving telemetry (vLLM metrics analog): device steps, tokens
        emitted, request counts, speculation acceptance, pool occupancy."""
        import time as _t

        return {
            "uptime_s": round(_t.time() - self._t0, 1),
            "steps": self.steps,
            "prefill_chunks": self.prefill_chunks,
            "total_emitted": self.total_emitted,
            "total_finished": self.total_finished,
            "total_cancelled": self.total_cancelled,
            "active_slots": int(((self.status == PREFILL) | (self.status == DECODE)).sum()),
            "held_sessions": len(self.session_slots),
            "waiting": len(self.waiting),
            "free_pages": len(self.free_pages),
            "spec_rounds": self.spec_rounds,
            "spec_emitted": self.spec_emitted,
            "spec_accept_per_round": round(self.spec_emitted / self.spec_rounds, 3)
            if self.spec_rounds else None,
            "ttft_mean_s": round(sum(self._ttfts) / len(self._ttfts), 4)
            if self._ttfts else None,
            "ttft_max_s": round(max(self._ttfts), 4) if self._ttfts else None,
            "perf_s": {k: round(v, 4) for k, v in sorted(self.perf.items())},
        }

    def _finish(self, slot: int) -> None:
        req = self.slot_req[slot]
        self._chain_streak = 0
        self._hot = None
        if req is not None:
            req.finished = True
            self.total_finished += 1
            self.total_emitted += len(req.output_ids)
        if req is not None and req.session is not None:
            # retain the pages: the session's next request reuses the KV of
            # its common prefix with (prompt + output).  seq_lens[slot] stays
            # as the kv-written length (the last emitted token has no KV).
            self.slot_history[slot] = list(req.prompt_ids) + list(req.output_ids)
            old = self.session_slots.get(req.session)
            if old is not None and old != slot:
                self._release_hold(old)
            self.session_slots[req.session] = slot
            self.status[slot] = HOLD
            self.slot_req[slot] = None
            self._hold_order.append(slot)
            return
        # pages before self.released[slot] were already reclaimed mid-flight
        self.free_pages.extend(self.slot_pages[slot][int(self.released[slot]):])
        self.slot_pages[slot] = []
        self.released[slot] = 0
        self.status[slot] = FREE
        self.slot_req[slot] = None

    def _release_hold(self, slot: int) -> None:
        """Drop a HOLD slot's retained pages back to the free pool."""
        if self.status[slot] != HOLD:
            return
        self.free_pages.extend(self.slot_pages[slot][int(self.released[slot]):])
        self.slot_pages[slot] = []
        self.released[slot] = 0
        self.slot_history[slot] = []
        self.status[slot] = FREE
        if slot in self._hold_order:
            self._hold_order.remove(slot)
        for s, sl in list(self.session_slots.items()):
            if sl == slot:
                del self.session_slots[s]

    def release_session(self, session: int) -> None:
        """Dialog over: free the session's held pages (no-op if none)."""
        slot = self.session_slots.get(session)
        if slot is not None:
            self._release_hold(slot)

    def cancel(self, req_id: int) -> bool:
        """Abort one request (the vLLM `abort_request` analog — the engine
        behind reference inference_vllm.py:109 frees an aborted request's
        blocks the same way).

        Must run on the thread that ticks the engine (EngineServer queues
        cancels to its loop thread).  A waiting request is dropped from the
        queue; a slot-resident one is finished immediately — its pages
        return to the pool (or go to session HOLD advertising only the
        kv-written prefix as reusable).  Returns True when a live request
        was cancelled, False if it already finished (e.g. the in-flight
        run-ahead chain's sync EOS-ended it) or is unknown."""
        for i, r in enumerate(self.waiting):
            if r.req_id == req_id:
                self.waiting.pop(i)
                r.cancelled = True
                r.finished = True
                self.total_cancelled += 1
                return True
        for slot, r in enumerate(self.slot_req):
            if r is None or r.req_id != req_id:
                continue
            # a dispatched run-ahead chain writes into this slot at sync:
            # absorb it first so the finish below retires consistent state
            self.drain_inflight()
            if self.slot_req[slot] is not r or r.finished:
                return False  # the sync finished it first
            r.cancelled = True
            if self.status[slot] == PREFILL:
                if slot in self.prefill_order:
                    self.prefill_order.remove(slot)
                # only [0, prefill_pos) is kv-written; a session HOLD must
                # not advertise unwritten KV to _reuse_start (seq_lens is
                # otherwise stale until prefill completes)
                self.seq_lens[slot] = int(self.prefill_pos[slot])
            self._pending_first.pop(slot, None)
            self._finish(slot)
            self._dev_dirty = True
            self.total_cancelled += 1
            return True
        return False

    def _reclaim_window(self, slot: int) -> None:
        """Return pages wholly below the sliding window to the free pool.

        The reference slices dense KV at the window (src/model.py:337-373);
        here a page whose last token is below `next_pos - window` can never be
        read again (both paged-attention paths mask by absolute position), so
        it is freed for other requests and its table entry retargeted at the
        trash page.  Bounds per-sequence HBM at O(window), not O(total)."""
        w = self.cfg.sliding_window
        if not w:
            return
        ps = self.ecfg.page_size
        # the next decode step (kv_len = seq_lens+1) reads positions
        # >= kv_len-1-w = seq_lens-w (kernel: ops/paged_attention.py:71,141)
        first_needed = max(int(self.seq_lens[slot]) - w, 0) // ps
        trash = self.n_pages - 1
        r = int(self.released[slot])
        while r < first_needed and r < len(self.slot_pages[slot]):
            self.free_pages.append(self.slot_pages[slot][r])
            self.page_table[slot, r] = trash
            r += 1
        if r != int(self.released[slot]):
            self._dev_dirty = True
        self.released[slot] = r

    def _do_sample(self) -> bool:
        return any(
            r is not None and r.sampled and self.status[s] == DECODE
            for s, r in enumerate(self.slot_req)
        )

    def _needs_filter(self) -> bool:
        """Any decoding slot with an actual top-k/top-p filter (pure
        temperature sampling skips the vocab sort — a static jit arg)."""
        return any(
            r is not None and self.status[s] == DECODE
            and (r.top_k > 1 or r.top_p < 1.0)
            for s, r in enumerate(self.slot_req)
        )

    def _active_slice(self, dec: np.ndarray, do_sample: bool) -> Optional[tuple]:
        """The shared lm_head slice of the decoding set, when one exists
        (greedy + single-device only; slots in different dialog stages or a
        sampled batch fall back to the full-vocab tail)."""
        if do_sample or self.mesh is not None:
            return None
        slices = {self.slot_slice[i] for i in np.flatnonzero(dec)}
        return slices.pop() if len(slices) == 1 else None

    # ------------------------------------------------------------------ run
    def step(self, _defer_chain: bool = False) -> int:
        """Admit + one prefill chunk + one decode step.

        Returns the number of occupied (prefilling or decoding) slots.
        `_defer_chain` is set only by tick(): when this step's prefill chunk
        drains the queue, skip the per-token-sync decode and let the next
        tick run a chained decode instead.  Direct callers keep the
        one-token-per-step contract."""
        if self._inflight is not None:  # absorb any run-ahead chain first
            fl, self._inflight = self._inflight, None
            self._sync_chain(fl)
        t0 = _time.perf_counter()
        self._try_admit()
        self._acc("admit", _time.perf_counter() - t0)
        t0 = _time.perf_counter()
        done_slot = self._prefill_tick()
        self._acc("prefill", _time.perf_counter() - t0)
        dec = self.status == DECODE
        if not dec.any():
            return int((self.status != FREE).sum())
        if (_defer_chain and done_slot is not None and not self.prefill_order
                and not self.waiting and self._multi_next()):
            # the queue just drained: let the next tick run a multi-token
            # decode instead of paying this step's per-token host sync
            return int((self.status != FREE).sum())
        self._flush_pending()  # the decode below reads self.tokens host-side
        dec = self.status == DECODE  # a pending EOS may have finished a slot
        if not dec.any():
            return int((self.status != FREE).sum())
        t0 = _time.perf_counter()
        if self.mesh is not None:
            nxt, self._keys_dev, self.kv = self._tp_decode(
                self.params, self.kv,
                jnp.asarray(self.tokens), jnp.asarray(self.seq_lens),
                jnp.asarray(self.page_table), jnp.asarray(dec),
                self._allow_dev, self._keys_dev,
                jnp.asarray(self.top_k), jnp.asarray(self.top_p),
                jnp.asarray(self.temp), do_sample=self._do_sample(),
            )
        else:
            table, eos, tk, tp_, tmp = self._slot_state_dev()
            nxt, self._keys_dev, self.kv = paged_decode_step(
                self.params, self.kv, self.cfg,
                jnp.asarray(self.tokens), jnp.asarray(self.seq_lens),
                table, jnp.asarray(dec),
                self._allow_dev, self.ecfg.page_size,
                self._keys_dev, tk, tp_,
                tmp, do_sample=self._do_sample(),
                needs_filter=self._needs_filter(),
                logits_slice=self._active_slice(dec, self._do_sample()),
            )
        if self.draft_params is not None:
            # mirror the step into the draft pool (token discarded) so the
            # draft cache has no holes when speculative rounds resume
            ones_i = jnp.ones(self.ecfg.max_batch_size, jnp.int32)
            ones_f = jnp.ones(self.ecfg.max_batch_size, jnp.float32)
            table, _, _, _, _ = self._slot_state_dev()
            zero_keys = jnp.zeros((self.ecfg.max_batch_size, 2), jnp.uint32)
            if self.mesh is not None:
                _, _, self.draft_kv = self._tp_decode_draft(
                    self.draft_params, self.draft_kv,
                    jnp.asarray(self.tokens), jnp.asarray(self.seq_lens),
                    table, jnp.asarray(dec), self._allow_dev, zero_keys,
                    ones_i, ones_f, ones_f, do_sample=False,
                )
            else:
                _, _, self.draft_kv = paged_decode_step(
                    self.draft_params, self.draft_kv, self.draft_cfg,
                    jnp.asarray(self.tokens), jnp.asarray(self.seq_lens),
                    table, jnp.asarray(dec),
                    self._allow_dev, self.ecfg.page_size,
                    zero_keys,
                    ones_i, ones_f, ones_f, do_sample=False,
                )
        self._acc("step_dispatch", _time.perf_counter() - t0)
        t0 = _time.perf_counter()
        nxt = np.asarray(nxt)
        self._acc("step_sync", _time.perf_counter() - t0)
        self.steps += 1
        for slot in range(self.ecfg.max_batch_size):
            if not dec[slot]:
                continue
            self.seq_lens[slot] += 1
            tok = int(nxt[slot])
            req = self.slot_req[slot]
            req.output_ids.append(tok)
            self.tokens[slot] = tok
            total = int(self.seq_lens[slot]) + 1
            if (
                tok == req.eos_id
                or len(req.output_ids) >= req.max_new_tokens
                or total >= self.ecfg.max_pages_per_seq * self.ecfg.page_size
            ):
                self._finish(slot)
            else:
                self._reclaim_window(slot)
        self._hot = None
        self._hist_dirty = True
        return int((self.status != FREE).sum())

    def _safe_horizon(self, n_steps: int, dec: np.ndarray) -> int:
        """Clamp a multi-token horizon so no slot can decode past its token
        budget or its page allocation (writes would land on page-table zeros
        = someone else's page 0)."""
        n = n_steps
        ps = self.ecfg.page_size
        for slot in range(self.ecfg.max_batch_size):
            if not dec[slot]:
                continue
            req = self.slot_req[slot]
            # a deferred first token (not yet in output_ids) spends one unit
            # of the budget when the chain absorbs it
            pend = 1 if slot in self._pending_first else 0
            n = min(n, req.max_new_tokens - len(req.output_ids) - pend)
            cap = len(self.slot_pages[slot]) * ps - (int(self.seq_lens[slot]) + 1)
            n = min(n, cap)
        return max(n, 1)

    def step_multi(self, n_steps: int) -> int:
        """One prefill chunk, then decode up to n_steps tokens on device."""
        if self.mesh is not None:  # TP path always syncs per token
            return self.step()
        if self._inflight is not None:  # absorb any run-ahead chain first
            fl, self._inflight = self._inflight, None
            self._sync_chain(fl)
        self._try_admit()
        self._prefill_tick()
        self._flush_pending()  # the fused loop reads self.tokens host-side
        dec = self.status == DECODE
        if not dec.any():
            return int((self.status != FREE).sum())
        if self.waiting:
            n_steps = min(n_steps, 8)  # same capacity-wait cap as step_chain
        n_steps = self._safe_horizon(n_steps, dec)
        table, eos, tk_d, tp_d, tmp_d = self._slot_state_dev()
        toks, n_emitted, self._keys_dev, self.kv = paged_decode_multi(
            self.params, self.kv, self.cfg,
            jnp.asarray(self.tokens), jnp.asarray(self.seq_lens),
            table, jnp.asarray(dec),
            self._allow_dev, eos,
            self.ecfg.page_size,
            self._keys_dev, tk_d, tp_d,
            tmp_d, do_sample=self._do_sample(),
            n_steps=n_steps,
        )
        toks = np.asarray(toks)
        n_emitted = np.asarray(n_emitted)
        self.steps += n_steps
        self._hot = None
        return self._absorb_multi(dec, toks, n_emitted)

    def step_chain(self, n_steps: int) -> int:
        """Multi-token decode as n_steps CHAINED single-step dispatches with
        one host sync at the end.

        Keeps the back-to-back dispatch schedule XLA runs ~2x faster than the
        fused fori_loop (`paged_decode_multi`, measured on v5e) while still
        amortizing the host round-trip over n_steps tokens: each link is ONE
        dispatch of `paged_decode_step_chained` (EOS freeze + length update
        folded into the jit).  Chains RAMP 8 -> 16 -> ... up to n_steps while
        the decoding set is unchanged: steady-state pays one sync per
        n_steps tokens, but a request that hits EOS early wastes at most the
        current (short) chain's tail, not a full horizon.  In the quiet
        single-flow state the chain is additionally RUN AHEAD depth-1: the
        successor is dispatched from carried device state before this
        chain's sync, so the sync RTT and absorb overlap device compute
        (_dispatch_chain/_sync_chain; ecfg.runahead)."""
        t0 = _time.perf_counter()
        self._try_admit()
        self._acc("admit", _time.perf_counter() - t0)
        t0 = _time.perf_counter()
        self._prefill_tick()
        self._acc("prefill", _time.perf_counter() - t0)
        # ramp 8 -> 16 -> 32 ... : each chain link costs ~11.5 ms at 7B-int8
        # but each SYNC costs ~13 ms over a tunneled chip, so short chains are
        # sync-bound; starting at 8 keeps the worst-case EOS overshoot at
        # ~0.09 s while halving the ramp's sync count vs starting at 4
        n_steps = min(n_steps, 8 << min(self._chain_streak, 8))
        self._chain_streak += 1
        if self.waiting:
            # hold the ramp at its floor while requests queue for capacity: a
            # slot freed by this chain gets admitted ~one short chain later
            # instead of after a full 32+-link horizon
            n_steps = min(n_steps, 8)
        dec = self.status == DECODE
        fl, self._inflight = self._inflight, None
        if not dec.any():
            if fl is not None:
                self._sync_chain(fl)  # tail chain of a drained decode set
            return int((self.status != FREE).sum())
        # run-ahead is only safe/useful in the quiet single-flow state: no
        # admissions or prefills pending (their per-token responsiveness
        # path must not race an unsynced chain) and no draft (spec rounds
        # read host tokens).  TP chains run ahead too: the carried state
        # (tokens/lens/done) is replicated and the shard_map'd links queue
        # per device exactly like single-device dispatches.
        quiet = (self.ecfg.runahead and not self.waiting
                 and not self.prefill_order and self.draft_params is None)
        if fl is not None:
            meta = None
            if quiet and self._hot is not None:
                # dispatch the successor from the carried device state BEFORE
                # syncing the in-flight chain: the sync's host RTT + absorb
                # then overlap the successor's device compute.  Length uses
                # assumed-FULL emission of the in-flight chain (if it actually
                # emitted less it hit EOS, and `done` freezes on device).
                n = self._runahead_len(n_steps, dec, fl)
                if n > 0:
                    meta = self._dispatch_chain(n, dec)
            self._sync_chain(fl)
            if meta is not None:
                self._inflight = meta
                return int((self.status != FREE).sum())
            # nothing was run ahead (fresh prefill/pending state or budget
            # tail): fall through and dispatch from the just-absorbed state
            dec = self.status == DECODE
            if not dec.any():
                return int((self.status != FREE).sum())
        n_steps = self._safe_horizon(n_steps, dec)
        meta = self._dispatch_chain(n_steps, dec)
        if quiet and self._runahead_len(self.decode_horizon, dec, meta) > 0:
            # a successor exists: leave this chain in flight; the next tick
            # dispatches the successor and then syncs this one
            self._inflight = meta
            return int((self.status != FREE).sum())
        self._sync_chain(meta)
        return int((self.status != FREE).sum())

    def _runahead_len(self, n_steps: int, dec: np.ndarray, fl: dict) -> int:
        """Longest chain dispatchable AFTER the in-flight chain `fl`,
        assuming it emits fully: like _safe_horizon but with the in-flight
        emissions/KV-writes added.  <= 0 means no run-ahead (some slot's
        budget or page allocation would be exhausted)."""
        n = n_steps
        ps = self.ecfg.page_size
        for slot in range(self.ecfg.max_batch_size):
            if not dec[slot]:
                continue
            req = self.slot_req[slot]
            n = min(n, req.max_new_tokens - len(req.output_ids)
                    - int(fl["full_emit"][slot]))
            cap = (len(self.slot_pages[slot]) * ps
                   - (int(self.seq_lens[slot]) + fl["n_steps"] + 1))
            n = min(n, cap)
        return n

    def _dispatch_chain(self, n_steps: int, dec: np.ndarray) -> dict:
        """Dispatch one decode chain of `n_steps` links (no host sync) and
        return the metadata _sync_chain needs to absorb it later."""
        t0 = _time.perf_counter()
        do_sample = self._do_sample()
        needs_filter = self._needs_filter()
        lslice = self._active_slice(dec, do_sample)
        if self._hot is not None:
            # previous chain's device outputs; `done` carries EOS freezes the
            # host may not have absorbed yet (run-ahead)
            tok, lens, done = self._hot
        else:
            tok = jnp.asarray(self.tokens)
            lens = jnp.asarray(self.seq_lens)
            done = None
        table, eos, tk, tp_, tmp = self._slot_state_dev()
        active = jnp.asarray(dec)
        if done is None:
            done = ~active
        # deferred post-prefill first tokens ride this chain: the device
        # scalar becomes the slot's input token (and sets done if it is
        # already the EOS); the host learns it at the sync, where it is
        # emitted as the slot's column 0
        pend = sorted(self._pending_first)
        for slot in pend:
            tok, done = _inject_first(tok, done, slot,
                                      self._pending_first[slot], eos)
        self._pending_first.clear()
        tok_in = tok  # chain input vector (column 0 for pending slots)
        outs = []
        for _ in range(n_steps):
            if self.mesh is not None:
                tok, done, lens, self._keys_dev, self.kv = self._tp_chained(
                    self.params, self.kv, tok, lens, table,
                    active, done, eos, self._allow_dev,
                    self._keys_dev, tk, tp_, tmp,
                    do_sample=do_sample, needs_filter=needs_filter,
                )
            else:
                tok, done, lens, self._keys_dev, self.kv = paged_decode_step_chained(
                    self.params, self.kv, self.cfg, tok, lens, table,
                    active, done, eos, self._allow_dev,
                    self.ecfg.page_size, self._keys_dev, tk, tp_, tmp,
                    do_sample=do_sample, needs_filter=needs_filter,
                    logits_slice=lslice,
                )
            outs.append(tok)
        self._hot = (tok, lens, done)
        stacked = jnp.stack([tok_in] + outs, axis=1)  # still on device
        self._acc("chain_dispatch", _time.perf_counter() - t0)
        full = np.where(dec, n_steps, 0)
        for slot in pend:
            full[slot] += 1
        return {
            "stacked": stacked, "dec": dec, "pend": pend, "n_steps": n_steps,
            "gen": self.slot_gen.copy(), "full_emit": full,
        }

    def _sync_chain(self, meta: dict) -> int:
        """ONE host sync for a dispatched chain, then absorb its tokens.

        Slots re-admitted since the dispatch (generation bump) or finished by
        an earlier chain's absorb are skipped — their links were frozen /
        trash-routed on device and emitted nothing meaningful."""
        t0 = _time.perf_counter()
        toks_all = np.asarray(meta["stacked"])  # ONE host sync
        self._acc("chain_sync", _time.perf_counter() - t0)
        return self._absorb_chain(meta, toks_all)

    def _absorb_chain(self, meta: dict, toks_all: np.ndarray) -> int:
        """Post-sync half of _sync_chain (split out so step_mixed_burst can
        fold extra device scalars into the same single sync)."""
        n_steps = meta["n_steps"]
        pend = meta["pend"]
        self.steps += n_steps
        dec = (meta["dec"] & (self.status == DECODE)
               & (self.slot_gen == meta["gen"]))
        b = self.ecfg.max_batch_size
        # pending slots emit their deferred first token as column 0 (their
        # chain INPUT); everyone else's column 0 was already emitted by the
        # previous chain/prefill, so their window starts at column 1
        em = np.zeros((b, n_steps + 1), np.int32)
        em[:, :n_steps] = toks_all[:, 1:]
        valid = np.full(b, n_steps)
        for slot in pend:
            em[slot] = toks_all[slot]
            valid[slot] = n_steps + 1
        cols = np.arange(n_steps + 1)[None]
        is_eos = (em == self.eos[:, None]) & (cols < valid[:, None])
        any_eos = is_eos.any(axis=1)
        eos_pos = is_eos.argmax(axis=1)
        n_emitted = np.where(dec, np.where(any_eos, eos_pos + 1, valid), 0)
        t0 = _time.perf_counter()
        try:
            return self._absorb_multi(dec, em, n_emitted, pend_slots=pend)
        finally:
            self._acc("absorb", _time.perf_counter() - t0)

    def step_mixed_burst(self) -> int:
        """Drain prefill chunks where EVERY chunk dispatch ALSO advances all
        decoding slots by one chained token (paged_ops.paged_mixed_step): the
        decode rows ride the chunk's weight reads, so a prefill burst no
        longer stalls in-flight decodes for its duration (vLLM coalesces
        prefill chunks into decode batches the same way — the r3 scheduler
        alternated them, measured as most of the 16-client gap).  The burst's
        decode tokens absorb with ONE host sync, like a chain."""
        if self._inflight is not None:
            fl, self._inflight = self._inflight, None
            self._sync_chain(fl)
        dec = self.status == DECODE
        # budget in LINKS, keeping prefill_chunks_per_tick's chunks-per-tick
        # meaning under row batching; one-link bursts sync (and admit) after
        # every dispatch, which measures best for both TTFT and throughput
        # (the per-link sync RTT is small next to an npf-row link's compute).
        # _safe_horizon runs BEFORE pend injection (it reads _pending_first).
        links = -(-self.ecfg.prefill_chunks_per_tick
                  // max(1, self.ecfg.mixed_prefill_rows))
        budget = self._safe_horizon(links, dec)
        gen = self.slot_gen.copy()
        do_sample = self._do_sample()
        needs_filter = self._needs_filter()
        lslice = self._active_slice(dec, do_sample)
        # burst device state: fresh upload (prefill_order non-empty implies an
        # admission since the last chain, which nulled _hot)
        tok = jnp.asarray(self.tokens)
        lens = jnp.asarray(self.seq_lens)
        active = jnp.asarray(dec)
        done = ~active
        table, eos, tk, tp_, tmp = self._slot_state_dev()
        pend = sorted(self._pending_first)
        for slot in pend:
            tok, done = _inject_first(tok, done, slot,
                                      self._pending_first[slot], eos)
        self._pending_first.clear()
        tok_in = tok
        outs: list = []
        # first tokens of prompts that complete mid-burst: carried as a
        # device vector and folded into the burst's one sync
        pf_vec = jnp.zeros(self.ecfg.max_batch_size, jnp.int32)
        pf_slots: list = []
        c = self.ecfg.prefill_chunk
        maxp = self.ecfg.max_pages_per_seq
        npf_max = max(1, self.ecfg.mixed_prefill_rows)
        t0 = _time.perf_counter()
        while self.prefill_order and len(outs) < budget:
            # pack up to npf_max chunk rows FCFS; consecutive chunks of the
            # SAME prompt may share a link (in-link causality holds: row j's
            # KV is written before the layer's context gather — see
            # paged_ops.paged_mixed_step), so the first client wave's prefill
            # queue drains ~npf-fold faster than one-chunk links
            rows_meta: list = []  # (slot, req, start, n, completes)
            oi = 0
            while len(rows_meta) < npf_max and oi < len(self.prefill_order):
                slot = self.prefill_order[oi]
                req = self.slot_req[slot]
                start = int(self.prefill_pos[slot])
                n = min(c, len(req.prompt_ids) - start)
                completes = start + n >= len(req.prompt_ids)
                rows_meta.append((slot, req, start, n, completes))
                self.prefill_pos[slot] = start + n
                if completes:
                    oi += 1  # next row serves the next queued prompt
            npf = 1
            while npf < len(rows_meta):
                npf *= 2
            npf = min(npf, npf_max)
            packed = np.zeros((npf, c + 2 + self.page_table.shape[1]), np.int32)
            packed[:, c + 2 :] = self.n_pages - 1  # dummy rows: trash pages
            ncp = 1
            for ri, (slot, req, start, n, _) in enumerate(rows_meta):
                packed[ri, :n] = req.prompt_ids[start : start + n]
                packed[ri, c] = start
                packed[ri, c + 1] = n
                packed[ri, c + 2 :] = self.page_table[slot]
                ncp = max(ncp, _ctx_pages_bucket(
                    self._pages_needed(start + c), maxp))
            any_completes = any(m[4] for m in rows_meta)
            (chunk_logits, tok, done, lens, self._keys_dev,
             self.kv) = paged_mixed_step(
                self.params, self.kv, self.cfg, jnp.asarray(packed),
                tok, lens, table, active, done, eos, self._allow_dev,
                self.ecfg.page_size, ncp, c, self._keys_dev, tk, tp_, tmp,
                do_sample=do_sample, needs_filter=needs_filter,
                sample_chunk=any_completes, logits_slice=lslice,
            )
            outs.append(tok)
            self.prefill_chunks += len(rows_meta)
            for ri, (slot, req, start, n, completes) in enumerate(rows_meta):
                if not completes:
                    continue
                assert self.prefill_order[0] == slot
                self.prefill_order.pop(0)
                first, new_key = sample_next(
                    chunk_logits[ri], self._allow_dev[slot],
                    self._keys_dev[slot], req.top_k, req.top_p,
                    req.temperature, do_sample=req.sampled,
                )
                self._keys_dev = self._keys_dev.at[slot].set(new_key)
                self.seq_lens[slot] = len(req.prompt_ids)
                self.status[slot] = DECODE
                if req.stream:
                    # a streaming consumer's first visible token must not
                    # wait for the burst's end sync
                    ts = _time.perf_counter()
                    fint = int(first)
                    self._acc("first_tok_sync", _time.perf_counter() - ts)
                    self._record_first(slot, fint)
                else:
                    # rides the burst's one sync as an extra stacked column
                    # (below) — TTFT records at THIS burst's end, with no
                    # extra host round trip
                    pf_vec = pf_vec.at[slot].set(first)
                    pf_slots.append(slot)
            self._try_admit()  # a completed prompt may free pages
            if self._dev_dirty:
                table, eos, tk, tp_, tmp = self._slot_state_dev()
        self._acc("mixed_dispatch", _time.perf_counter() - t0)
        full = np.where(dec, len(outs), 0)
        for slot in pend:
            full[slot] += 1
        n_steps = len(outs)
        meta = {
            "stacked": None, "dec": dec, "pend": pend, "n_steps": n_steps,
            "gen": gen, "full_emit": full,
        }
        # ONE sync for the burst: decode emissions + mid-burst first tokens
        stacked = jnp.concatenate(
            [jnp.stack([tok_in] + outs, axis=1), pf_vec[:, None]], axis=1)
        t0 = _time.perf_counter()
        arr = np.asarray(stacked)
        self._acc("chain_sync", _time.perf_counter() - t0)
        self._absorb_chain(meta, arr[:, : n_steps + 1])
        # carried rows for slots whose prompts completed mid-burst are stale;
        # host state is authoritative after the sync — force a re-upload
        self._hot = None
        for slot in pf_slots:
            self._record_first(slot, int(arr[slot, n_steps + 1]))
        return int((self.status != FREE).sum())

    def _absorb_multi(self, dec: np.ndarray, toks: np.ndarray, n_emitted: np.ndarray,
                      pend_slots=(), hist_synced: bool = False) -> int:
        import time as _t

        if not hist_synced:
            # these tokens were not appended to the device ngram history
            # (only chained ngram rounds update it in-jit)
            self._hist_dirty = True
        for slot in range(self.ecfg.max_batch_size):
            if not dec[slot]:
                continue
            n = int(n_emitted[slot])
            req = self.slot_req[slot]
            emitted = toks[slot, :n].tolist()
            if req.ttft_s is None and emitted:  # deferred-first-token slots
                req.ttft_s = _t.time() - req.t_submit
                self._ttfts.append(req.ttft_s)
            req.output_ids.extend(emitted)
            # a pending slot's column 0 was its chain INPUT: its KV was
            # written by the chain, but it never counted toward seq_lens
            # (seq_lens = kv-written length; the first token's KV lands when
            # it is consumed as input) — so its kv increment is n - 1
            self.seq_lens[slot] += n - (1 if slot in pend_slots and n > 0 else 0)
            if emitted:
                self.tokens[slot] = emitted[-1]
            total = int(self.seq_lens[slot]) + 1
            hit_eos = n > 0 and emitted[-1] == req.eos_id
            if (
                hit_eos
                or len(req.output_ids) >= req.max_new_tokens
                or total >= self.ecfg.max_pages_per_seq * self.ecfg.page_size
            ):
                if len(req.output_ids) > req.max_new_tokens:
                    del req.output_ids[req.max_new_tokens :]
                self._finish(slot)
            else:
                self._reclaim_window(slot)
        return int((self.status != FREE).sum())

    def _can_spec(self) -> bool:
        """Speculate only when: a draft (model or ngram) is configured,
        spec_k > 0, no admissions or prefills pending, and every decoding
        slot is greedy with room for a full K+1-token round (tails fall back
        to plain steps)."""
        if ((self.draft_params is None and not self.ngram)
                or self.ecfg.spec_k < 1
                or self.waiting or self.prefill_order):
            return False
        dec = self.status == DECODE
        if not dec.any():
            return False
        k1 = self.ecfg.spec_k + 1
        ps = self.ecfg.page_size
        for slot in range(self.ecfg.max_batch_size):
            if not dec[slot]:
                continue
            req = self.slot_req[slot]
            if req.sampled:
                return False  # greedy-only speculation
            if req.max_new_tokens - len(req.output_ids) < k1:
                return False
            if len(self.slot_pages[slot]) * ps - (int(self.seq_lens[slot]) + k1) < 0:
                return False
        return True

    def _spec_rounds_cap(self, dec: np.ndarray) -> int:
        """How many full K+1-token speculative rounds every decoding slot can
        run without exceeding its token budget or page allocation."""
        k1 = self.ecfg.spec_k + 1
        ps = self.ecfg.page_size
        cap = 1 << 30
        for slot in range(self.ecfg.max_batch_size):
            if not dec[slot]:
                continue
            req = self.slot_req[slot]
            cap = min(cap, (req.max_new_tokens - len(req.output_ids)) // k1)
            cap = min(cap,
                      (len(self.slot_pages[slot]) * ps - int(self.seq_lens[slot])) // k1)
        return max(cap, 0)

    def step_spec(self) -> int:
        """R chained speculative rounds with ONE host sync.

        Each round: K+1 draft steps (the last writes the draft KV of the
        final proposal so full acceptance leaves no cache hole) + one target
        verification over K+1 positions with ON-DEVICE acceptance
        (`paged_spec_accept`) — the accepted count, EOS freeze, next input
        token and length updates all stay on device, so rounds chain
        back-to-back like `step_chain` links.  Output is exactly the greedy
        decode's for any draft (tests assert this); tokens/s scales with
        draft agreement because the target — the weight-read-bound model —
        runs once per round instead of once per token."""
        if self._inflight is not None:  # absorb any run-ahead chain first
            fl, self._inflight = self._inflight, None
            self._sync_chain(fl)
        self._flush_pending()  # reads self.tokens (no-op: drafts disable deferral)
        k = self.ecfg.spec_k
        dec = self.status == DECODE
        rounds = min(self._spec_rounds_cap(dec),
                     max(1, self.decode_horizon // (k + 1)),
                     1 << min(self._chain_streak, 5))
        self._chain_streak += 1
        if rounds < 1:
            return self.step()
        lslice = self._active_slice(dec, False)
        active = jnp.asarray(dec)
        lens = jnp.asarray(self.seq_lens)
        table, eos, _, _, _ = self._slot_state_dev()
        cur = jnp.asarray(self.tokens)
        done = jnp.asarray(~dec)
        keys = self._keys_dev
        ones_i = jnp.ones(self.ecfg.max_batch_size, jnp.int32)
        ones_f = jnp.ones(self.ecfg.max_batch_size, jnp.float32)
        max_tok = (int(self.seq_lens[dec].max()) if dec.any() else 0) + rounds * (k + 1)
        ncp = _ctx_pages_bucket(self._pages_needed(max_tok), self.ecfg.max_pages_per_seq)

        outs, emits = [], []
        for _ in range(rounds):
            cols = [cur]
            d = cur
            for i in range(k + 1):
                if self.mesh is not None:
                    d, keys, self.draft_kv = self._tp_decode_draft(
                        self.draft_params, self.draft_kv,
                        d, lens + i, table, jnp.logical_and(active, ~done),
                        self._allow_dev, keys, ones_i, ones_f, ones_f,
                        do_sample=False,
                    )
                else:
                    d, keys, self.draft_kv = paged_decode_step(
                        self.draft_params, self.draft_kv, self.draft_cfg,
                        d, lens + i, table, jnp.logical_and(active, ~done),
                        self._allow_dev, self.ecfg.page_size, keys,
                        ones_i, ones_f, ones_f, do_sample=False,
                        logits_slice=lslice,
                    )
                if i < k:
                    cols.append(d)
            ver_in = jnp.stack(cols, axis=1)  # [B, K+1]
            if self.mesh is not None:
                otok, n_emit, cur, done, lens, self.kv = self._tp_spec(
                    self.params, self.kv, ver_in, lens, done, eos,
                    table, active, self._allow_dev, ncp,
                )
            else:
                otok, n_emit, cur, done, lens, self.kv = paged_spec_accept(
                    self.params, self.kv, self.cfg, ver_in, lens, done, eos,
                    table, active, self._allow_dev, self.ecfg.page_size, ncp,
                    logits_slice=lslice,
                )
            outs.append(otok)
            emits.append(n_emit)
        packed = np.asarray(jnp.concatenate(
            [jnp.concatenate(outs, axis=1),
             jnp.stack(emits, axis=1)], axis=1))  # ONE host sync
        toks = packed[:, : rounds * (k + 1)].reshape(-1, rounds, k + 1)
        n_emits = packed[:, rounds * (k + 1):]
        self.steps += rounds
        self.spec_rounds += rounds

        b = self.ecfg.max_batch_size
        flat = np.zeros((b, rounds * (k + 1)), np.int32)
        total = np.zeros(b, np.int32)
        for slot in range(b):
            if not dec[slot]:
                continue
            for r in range(rounds):
                n = int(n_emits[slot, r])
                flat[slot, int(total[slot]): int(total[slot]) + n] = toks[slot, r, :n]
                total[slot] += n
            self.spec_emitted += int(total[slot])
        self._hot = None
        return self._absorb_multi(dec, flat, total)

    def _ensure_hist(self) -> None:
        """Device token history [B, S] for prompt-lookup proposals, rebuilt
        from host state (prompt + output ids per decoding slot) when stale.
        ONE upload per transition into ngram rounds; consecutive rounds keep
        it device-resident (paged_ngram_round appends in-jit)."""
        if not self._hist_dirty and self._hist_dev is not None:
            return
        b = self.ecfg.max_batch_size
        s = self.ecfg.max_pages_per_seq * self.ecfg.page_size
        hist = np.zeros((b, s), np.int32)
        for slot in range(b):
            req = self.slot_req[slot]
            if req is None or self.status[slot] != DECODE:
                continue
            row = req.prompt_ids + req.output_ids
            hist[slot, : min(len(row), s)] = row[:s]
        self._hist_dev = jnp.asarray(hist)
        self._hist_dirty = False

    def step_spec_ngram(self) -> int:
        """R chained DRAFT-FREE speculative rounds with ONE host sync.

        vLLM's prompt-lookup / ngram speculation, TPU-shaped: each round
        proposes ecfg.spec_k tokens by matching the current suffix against
        the sequence's own token history ON DEVICE (paged_ops.ngram_propose)
        and verifies them with one target forward + on-device acceptance
        (paged_spec_accept) — no draft model, no draft KV pool, no KV
        mirroring on non-speculating turns.  Output equals plain greedy
        decode exactly (tests assert it).  Per-round cost ≈ one decode step
        (the proposal is a few [B, S] compares), so any acceptance beats
        per-token stepping; 50 Hz unit streams (stage C: 2.8 s of the 4.7 s
        turn, never deduplicated — reference decoder/scripts/preprocess.py:40)
        repeat heavily, which is exactly where lookup acceptance is high."""
        if self._inflight is not None:  # absorb any run-ahead chain first
            fl, self._inflight = self._inflight, None
            self._sync_chain(fl)
        self._flush_pending()  # history/lens invariants read host tokens
        k = self.ecfg.spec_k
        dec = self.status == DECODE
        # a round costs ~1 target step (not k+1 like a model draft), so the
        # rounds-per-sync budget mirrors step_chain's link ramp
        rounds = min(self._spec_rounds_cap(dec),
                     max(1, self.decode_horizon),
                     2 << min(self._chain_streak, 5))
        self._chain_streak += 1
        if rounds < 1:
            return self.step()
        self._ensure_hist()
        lslice = self._active_slice(dec, False)
        active = jnp.asarray(dec)
        lens = jnp.asarray(self.seq_lens)
        table, eos, _, _, _ = self._slot_state_dev()
        cur = jnp.asarray(self.tokens)
        done = jnp.asarray(~dec)
        max_tok = (int(self.seq_lens[dec].max()) if dec.any() else 0) + rounds * (k + 1)
        ncp = _ctx_pages_bucket(self._pages_needed(max_tok), self.ecfg.max_pages_per_seq)

        outs, emits = [], []
        for _ in range(rounds):
            if self.mesh is not None:
                (otok, n_emit, cur, done, lens,
                 self._hist_dev, self.kv) = self._tp_ngram(
                    self.params, self.kv, self._hist_dev, cur, lens, done,
                    eos, table, active, self._allow_dev, ncp, k,
                    self.ecfg.ngram_max_n,
                )
            else:
                (otok, n_emit, cur, done, lens,
                 self._hist_dev, self.kv) = paged_ngram_round(
                    self.params, self.kv, self.cfg, self._hist_dev, cur,
                    lens, done, eos, table, active, self._allow_dev,
                    self.ecfg.page_size, ncp, k, self.ecfg.ngram_max_n,
                    logits_slice=lslice,
                )
            outs.append(otok)
            emits.append(n_emit)
        packed = np.asarray(jnp.concatenate(
            [jnp.concatenate(outs, axis=1),
             jnp.stack(emits, axis=1)], axis=1))  # ONE host sync
        toks = packed[:, : rounds * (k + 1)].reshape(-1, rounds, k + 1)
        n_emits = packed[:, rounds * (k + 1):]
        self.steps += rounds
        self.spec_rounds += rounds

        b = self.ecfg.max_batch_size
        flat = np.zeros((b, rounds * (k + 1)), np.int32)
        total = np.zeros(b, np.int32)
        for slot in range(b):
            if not dec[slot]:
                continue
            for r in range(rounds):
                n = int(n_emits[slot, r])
                flat[slot, int(total[slot]): int(total[slot]) + n] = toks[slot, r, :n]
                total[slot] += n
            self.spec_emitted += int(total[slot])
        self._hot = None
        return self._absorb_multi(dec, flat, total, hist_synced=True)

    def tick(self) -> int:
        """One scheduler turn: per-token stepping while admissions/prefills
        are pending, speculative rounds when a draft is loaded and
        applicable, multi-token (chained) decode otherwise — single-device
        and TP take the same paths (TP chains shard_map'd links)."""
        if self.waiting and self._inflight is not None:
            # A pending run-ahead sync may free pages/slots (EOS/budget ends
            # absorbed at sync time).  Admission below can only see capacity
            # that exists NOW, so sync first — otherwise a waiting request is
            # admitted one tick later than necessary under load.
            fl, self._inflight = self._inflight, None
            self._sync_chain(fl)
        if self.waiting or self.prefill_order:
            self._try_admit()  # host-side bookkeeping only — no compute
            if (self.prefill_order and self.ecfg.mixed_prefill
                    and self.draft_params is None and self.mesh is None
                    and int((self.status == DECODE).sum())
                    >= max(1, self.ecfg.mixed_min_decode)):
                # decodes in flight: coalesce the prefill chunks INTO the
                # decode batch — each chunk dispatch also advances every
                # decoding slot one token on shared weight reads (vLLM
                # scheduler behavior; the alternating drain below stalls all
                # decode for the burst's duration)
                return self.step_mixed_burst()
            if self.prefill_order:
                # real prefill work pending: drain up to a budget of chunks
                # back-to-back (one decode token between chunks costs a full
                # per-token host sync — with staggered arrivals the engine
                # otherwise spends most of a loaded run in that slow mode),
                # then step() runs the last chunk and, if the queue drained,
                # defers decode to next tick's chain.  (Chaining 8 decode
                # links here instead was MEASURED WORSE — 435 -> 399 tok/s,
                # p95 TTFT 0.86 -> 1.06 s at 8 closed-loop clients: the
                # longer tick slows the admission cadence, which costs more
                # batching than the extra decode tokens buy.)
                t0 = _time.perf_counter()
                deferred = False
                for _ in range(self.ecfg.prefill_chunks_per_tick - 1):
                    done_slot = self._prefill_tick()
                    self._try_admit()  # a completed prompt may free pages
                    if (done_slot is not None and not self.prefill_order
                            and not self.waiting and self._multi_next()):
                        # the queue drained INSIDE the drain loop: defer to
                        # the next tick's multi-token decode, same as
                        # step(_defer_chain) (falling through to step() here
                        # would pay a per-token-synced decode for nothing)
                        deferred = True
                        break
                    if not self.prefill_order:
                        break
                self._acc("prefill", _time.perf_counter() - t0)
                if deferred:
                    return int((self.status != FREE).sum())
                return self.step(_defer_chain=True)
            # requests are waiting but nothing is admittable (slot/page
            # bound): fall through to CHAINED decode — running requests
            # finishing sooner is exactly what frees capacity.  (The old
            # behavior single-stepped here, collapsing aggregate decode ~4x
            # for the entire slot-bound stretch of a loaded serving run.)
        if self._can_spec():
            return self.step_spec_ngram() if self.ngram else self.step_spec()
        if self.draft_params is not None:
            # a draft is loaded but this step can't speculate (sampled slot /
            # budget tail): single-step so the draft pool mirrors the decode —
            # step_chain/step_multi skip the mirror and would leave draft-KV
            # holes that collapse later rounds' acceptance
            return self.step()
        if self.decode_horizon == 1:
            return self.step()
        if self.multi_impl == "chain":
            return self.step_chain(self.decode_horizon)
        return self.step_multi(self.decode_horizon)

    def drain_inflight(self) -> None:
        """Sync and absorb any pending run-ahead chain.

        The last request of a burst can EOS-finish at the in-flight chain's
        *sync* — busy goes False with the successor chain still dispatched.
        Its tokens are all frozen/trash-routed (nothing user-visible), but
        until it is absorbed `self.steps`/perf telemetry undercount and the
        stacked device buffer stays live.  run() and an idling EngineServer
        call this when work drains."""
        if self._inflight is not None:
            fl, self._inflight = self._inflight, None
            self._sync_chain(fl)

    def run(self, requests: List[Request]) -> List[Request]:
        for r in requests:
            self.submit(r)
        while self.busy:
            self.tick()
        self.drain_inflight()
        return requests


