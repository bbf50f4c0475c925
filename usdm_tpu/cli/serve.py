"""Dependency-free concurrent HTTP serving (stdlib http.server).

A minimal web UI + JSON API over the full speech-to-speech pipeline — the
zero-dependency sibling of the streamlit demo (reference
/root/reference/src/streamlit_demo.py).  LLM decoding goes through the
continuous-batching PagedEngine (the reference serves through vLLM,
streamlit_demo.py:64): concurrent requests interleave their 3-stage decodes
on one chip instead of queuing behind a lock.  Endpoints:

  GET  /           upload page
  POST /respond    multipart (fields: `wav` = user speech, optional
                   `reference` = speaker-reference wav for voice adaptation,
                   streamlit_demo.py:96-205) or raw wav body -> JSON
                   {user_text, agent_text, n_units, audio_b64};
                   ?audio=1 returns the raw wav instead.
                   ?stream=1 returns Server-Sent Events instead (paged engine
                   only): `stage` events carry per-chain decode progress (the
                   text2text events include the agent text so far — the vLLM
                   streaming analog), then one `result` event with the final
                   JSON above.  Errors after the stream opens arrive as an
                   `error` event.
                   Query params: top_k, top_p, temperature, seed, n_timesteps
  GET  /health     liveness probe
  GET  /stats     engine telemetry JSON (tokens, slots, pool, speculation)

Usage:
  python -m usdm_tpu.cli.serve --demo --port 8600
  python -m usdm_tpu.cli.serve --model_dir ... --xlsr_dir ... --kmeans ... \
      --voicebox_dir ... --bigvgan_dir ...
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_PAGE = b"""<!doctype html>
<title>usdm-tpu demo</title>
<h1>usdm-tpu spoken dialog</h1>
<form method=post action="/respond?audio=1" enctype=multipart/form-data>
  <p>User speech wav: <input type=file name=wav></p>
  <p>Speaker reference wav (optional): <input type=file name=reference></p>
  <p><button>Respond</button></p>
</form>
"""

# request-body cap: a minute of 48 kHz float32 stereo is ~23 MB; anything
# bigger than this is not a dialog turn
MAX_BODY_BYTES = 64 * 1024 * 1024


def _qnum(q, name, cast, default):
    try:
        return cast(q[name][0])
    except (KeyError, ValueError, IndexError):
        return default


def _parse_multipart(body: bytes, ctype: str) -> dict:
    """Parse a multipart/form-data body into {field name: bytes}.

    Minimal but correct per RFC 7578 for our two file fields: honors the
    declared boundary (quoted or not), parses each part's headers for the
    Content-Disposition `name`, and strips exactly the CRLF framing — unlike
    the round-2 "first filename= wins" splitter, which broke on multi-field
    forms and on filenames containing `filename=`."""
    boundary = ""
    for param in ctype.split(";")[1:]:
        k, _, v = param.strip().partition("=")
        if k.lower() == "boundary":
            boundary = v.strip('"')
    if not boundary:
        raise ValueError("multipart body without a boundary parameter")
    delim = b"--" + boundary.encode()
    fields: dict = {}
    for part in body.split(delim)[1:]:
        if part.startswith(b"--"):  # closing delimiter
            break
        part = part.lstrip(b"\r\n")
        head, sep, payload = part.partition(b"\r\n\r\n")
        if not sep:
            continue
        name = None
        for line in head.split(b"\r\n"):
            k, _, v = line.decode("latin-1").partition(":")
            if k.strip().lower() != "content-disposition":
                continue
            for item in v.split(";"):
                ik, _, iv = item.strip().partition("=")
                if ik.lower() == "name":
                    name = iv.strip('"')
        if name is not None:
            # payload ends with CRLF before the next delimiter
            fields[name] = payload[:-2] if payload.endswith(b"\r\n") else payload
    return fields


def make_handler(pipe, server, n_timesteps: int):
    """`server` is an EngineServer (paged, concurrent) or None (dense path:
    one request at a time behind a lock — kept for --dense debugging)."""
    from usdm_tpu.engine.server import PagedDialogPolicy

    dense_lock = threading.Lock()
    # XLS-R / Voicebox+BigVGAN are their own jitted programs; serialize each
    # so concurrent turns can't double their HBM workspaces on one chip.
    xlsr_lock = threading.Lock()
    synth_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            sys.stderr.write("serve: " + fmt % args + "\n")

        def do_GET(self):
            if self.path.startswith("/health"):
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")
                return
            if self.path.startswith("/stats"):
                body = json.dumps(
                    server.engine.stats() if server is not None
                    else {"engine": "dense"}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(_PAGE)

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/respond":
                self.send_response(404)
                self.end_headers()
                return
            q = parse_qs(url.query)
            length = int(self.headers.get("Content-Length", 0))
            if length > MAX_BODY_BYTES:
                self.send_response(413)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps(
                    {"error": f"body exceeds {MAX_BODY_BYTES} bytes"}).encode())
                return
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            ref_bytes = b""
            if "multipart/form-data" in ctype:
                try:
                    fields = _parse_multipart(body, ctype)
                except ValueError as e:
                    self.send_response(400)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(json.dumps({"error": str(e)}).encode())
                    return
                wav_bytes = fields.get("wav", b"")
                ref_bytes = fields.get("reference", b"")
            else:
                wav_bytes = body

            with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                f.write(wav_bytes)
                in_path = f.name
            out_path = in_path + ".out.wav"
            ref_path = None
            if ref_bytes:
                with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                    f.write(ref_bytes)
                    ref_path = f.name

            steps = _qnum(q, "n_timesteps", int, n_timesteps)
            seed = _qnum(q, "seed", int, 0)
            stream = bool(_qnum(q, "stream", int, 0))
            if stream and server is None:
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps(
                    {"error": "stream=1 requires the paged engine (not --dense)"}
                ).encode())
                return
            if stream:
                self._respond_stream(q, in_path, out_path, ref_path, steps, seed)
                return
            try:
                if server is not None:
                    result = self._run_paged_turn(
                        q, in_path, out_path, ref_path, steps, seed)
                else:
                    with dense_lock:  # --dense: one request at a time
                        result = pipe.respond(
                            in_path, out_path, ref_path, n_timesteps=steps,
                            seed=seed,
                            top_k=_qnum(q, "top_k", int, 1),
                            top_p=_qnum(q, "top_p", float, 1.0),
                            temperature=_qnum(q, "temperature", float, 1.0),
                        )
            except Exception as e:  # noqa: BLE001
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)}).encode())
                return

            audio_bytes = self._collect_audio(result, in_path, out_path, ref_path)
            if "audio=1" in (url.query or "") and result.agent_units:
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("X-User-Text", result.user_text[:512])
                self.send_header("X-Agent-Text", result.agent_text[:512])
                self.end_headers()
                self.wfile.write(audio_bytes)
            else:
                # audio ships inline: the round-2 API returned the server's
                # temp path, which leaked filesystem layout and was unreadable
                # for remote callers
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps(
                    _result_json(result, audio_bytes)).encode())

        # ------------------------------------------------------ paged helpers
        def _run_paged_turn(self, q, in_path, out_path, ref_path, steps, seed,
                            on_tokens=None, abort_check=None):
            """One dialog turn through the shared engine: unit extraction,
            3-stage decode (optionally streaming progress via `on_tokens`),
            synthesis to `out_path`.  LLM stages continuous-batch across
            threads; unit extraction and synthesis serialize on their locks."""
            import jax

            from usdm_tpu.audio.wav import load_wav, write_wav

            policy = PagedDialogPolicy(
                server, pipe.tokenizer,
                max_new_tokens=pipe.max_new_tokens,
                top_k=_qnum(q, "top_k", int, 1),
                top_p=_qnum(q, "top_p", float, 1.0),
                temperature=_qnum(q, "temperature", float, 1.0),
                seed=seed,
                on_tokens=on_tokens,
                abort_check=abort_check,
            )
            wav, _ = load_wav(in_path, sr=pipe.xlsr_cfg.sample_rate)
            reference = None
            with xlsr_lock:
                units = pipe.extract_units(wav)
                if ref_path is not None:
                    # speaker adaptation via a reference prompt
                    # (streamlit_demo.py:96-205); XLS-R inside the lock
                    from usdm_tpu.engine.synthesis import prepare_reference

                    reference = prepare_reference(
                        ref_path, pipe.xlsr_params, pipe.xlsr_cfg,
                        pipe.decoder.mel_cfg)
            result = policy.respond_to_units(units)
            if result.agent_units:
                with synth_lock:
                    audio = pipe.decoder.synthesize(
                        result.agent_units, jax.random.PRNGKey(seed),
                        reference=reference, n_timesteps=steps,
                    )
                write_wav(out_path, audio, pipe.decoder.mel_cfg.sampling_rate)
            return result

        def _respond_stream(self, q, in_path, out_path, ref_path, steps, seed):
            """?stream=1: Server-Sent Events.  Emits a `stage` event per
            synced decode chain (text2text events carry the decoded agent
            text so far — a live preview; the `result` event is
            authoritative, post template-strip), then `result`, then closes.
            A vanished client ABORTS the turn: the in-flight stage request
            cancels on the engine (slot + pages free within one chain — the
            vLLM abort_request analog) instead of decoding its full budget
            for nobody."""
            from usdm_tpu.engine.server import DialogAborted
            from usdm_tpu.ops.sampling import STAGE_TEXT2TEXT

            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()
            gone = False
            text_ids: list = []

            def emit(event, obj):
                nonlocal gone
                if gone:
                    return
                try:
                    self.wfile.write(
                        f"event: {event}\ndata: {json.dumps(obj)}\n\n".encode())
                    self.wfile.flush()
                except OSError:
                    gone = True  # client went away; finish the turn quietly

            def on_tokens(stage, delta):
                payload = {"stage": stage, "n_new": len(delta)}
                if stage == STAGE_TEXT2TEXT:
                    text_ids.extend(delta)
                    payload["text"] = pipe.tokenizer.decode(text_ids)
                emit("stage", payload)

            try:
                result = self._run_paged_turn(
                    q, in_path, out_path, ref_path, steps, seed, on_tokens,
                    abort_check=lambda: gone)
            except DialogAborted:
                self._unlink_turn_files(in_path, out_path, ref_path)
                return  # nobody is listening; the engine slot is freed
            except Exception as e:  # noqa: BLE001
                emit("error", {"error": str(e)})
                self._unlink_turn_files(in_path, out_path, ref_path)
                return
            audio_bytes = self._collect_audio(result, in_path, out_path, ref_path)
            emit("result", _result_json(result, audio_bytes))

        @staticmethod
        def _unlink_turn_files(*paths) -> None:
            import os

            for p in paths:
                if p and os.path.exists(p):
                    os.unlink(p)

        def _collect_audio(self, result, in_path, out_path, ref_path) -> bytes:
            import os

            audio_bytes = b""
            if result.agent_units and os.path.exists(out_path):
                with open(out_path, "rb") as f:
                    audio_bytes = f.read()
            self._unlink_turn_files(in_path, out_path, ref_path)
            return audio_bytes

    return Handler


def _result_json(result, audio_bytes: bytes) -> dict:
    import base64

    return {
        "user_text": result.user_text,
        "agent_text": result.agent_text,
        "n_units": len(result.agent_units),
        "audio_b64": base64.b64encode(audio_bytes).decode(),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=8600)
    p.add_argument("--model_dir")
    p.add_argument("--xlsr_dir")
    p.add_argument("--kmeans")
    p.add_argument("--voicebox_dir")
    p.add_argument("--bigvgan_dir")
    p.add_argument("--tokenizer_dir")
    p.add_argument("--n_timesteps", type=int, default=15)
    p.add_argument("--demo", action="store_true")
    p.add_argument("--dense", action="store_true",
                   help="serve on the dense single-request path instead of the engine")
    p.add_argument("--page_size", type=int, default=256)
    p.add_argument("--max_pages_per_seq", type=int, default=32)
    p.add_argument("--max_batch_size", type=int, default=8)
    p.add_argument("--prefill_chunk", type=int, default=256)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree: shard the LM over the first "
                        "N devices (requires num_kv_heads %% tp == 0)")
    p.add_argument("--draft_dir",
                   help="HF-Mistral dir of a small draft LM: enables greedy "
                        "speculative decoding (output identical to plain "
                        "greedy; speed scales with draft agreement)")
    p.add_argument("--draft",
                   help="training-free draft: 'early-exit:8' = self-draft "
                        "from the target's first 8 layers, or 'ngram' = "
                        "draft-free prompt-lookup speculation (proposals "
                        "from the sequence's own history; best on the "
                        "repetition-heavy unit stage)")
    p.add_argument("--spec_k", type=int, default=4,
                   help="draft tokens per speculative round")
    p.add_argument("--kv_dtype", choices=["bf16", "int8"], default="bf16",
                   help="KV page pool dtype: int8 halves page HBM (capacity "
                        "lever; vLLM fp8-KV analog)")
    p.add_argument("--int8", action="store_true",
                   help="quantize the LLM to W8A8 int8 (faster decode)")
    p.add_argument("--no_vb_int8", action="store_true",
                   help="keep the Voicebox estimator matmuls in float "
                        "(default quantizes them to W8A8 int8: 1.30x ODE, "
                        "drift nRMS ~1e-4)")
    p.add_argument("--no_runahead", action="store_true",
                   help="disable depth-1 chain run-ahead (debug: serializes "
                        "each decode chain's host sync)")
    args = p.parse_args(argv)

    from usdm_tpu.core.config import EngineConfig
    from usdm_tpu.pipeline import UsdmPipeline

    if args.demo:
        pipe = UsdmPipeline.tiny_random()
    else:
        pipe = UsdmPipeline.from_pretrained(
            args.model_dir, args.xlsr_dir, args.kmeans,
            args.voicebox_dir, args.bigvgan_dir, args.tokenizer_dir,
            lm_int8=args.int8, vb_int8=not args.no_vb_int8,
        )

    draft = None
    if args.draft_dir:
        from usdm_tpu.core import checkpoint as ckpt

        draft = ckpt.load_mistral(args.draft_dir, dtype="bfloat16")
    elif args.draft:
        draft = args.draft  # resolved by make_server (e.g. early-exit:N)

    server = None
    if not args.dense:
        server = pipe.make_server(EngineConfig(
            page_size=args.page_size,
            max_pages_per_seq=args.max_pages_per_seq,
            max_batch_size=args.max_batch_size,
            prefill_chunk=args.prefill_chunk,
            spec_k=args.spec_k,
            kv_dtype=None if args.kv_dtype == "bf16" else args.kv_dtype,
            runahead=not args.no_runahead,
        ), tp=args.tp, draft=draft)

    httpd = ThreadingHTTPServer(
        ("0.0.0.0", args.port), make_handler(pipe, server, args.n_timesteps)
    )
    print(f"serving on :{args.port} (demo={args.demo}, "
          f"engine={'paged' if server else 'dense'})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        if server is not None:
            server.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
