"""CLI-surface regression tests (tiny pipeline, CPU)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from usdm_tpu.audio.wav import write_wav


@pytest.fixture(scope="module")
def user_wav(tmp_path_factory):
    rng = np.random.default_rng(0)
    path = str(tmp_path_factory.mktemp("cli") / "user.wav")
    write_wav(path, (rng.standard_normal(16000) * 0.1).astype(np.float32), 16000)
    return path


def test_infer_cli_demo(user_wav, tmp_path, capsys):
    from usdm_tpu.cli.infer import main

    out = str(tmp_path / "out.wav")
    rc = main(["--demo", "--input_path", user_wav, "--output_path", out,
               "--n_timesteps", "2"])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "agent_text:" in captured and "agent_units:" in captured


def test_serve_http_concurrent_paged(user_wav):
    """Serving rides the continuous-batching engine: two simultaneous POSTs
    both complete (no global request lock), sampling params via query."""
    from http.server import ThreadingHTTPServer

    from usdm_tpu.cli.serve import make_handler
    from usdm_tpu.core.config import EngineConfig
    from usdm_tpu.pipeline import UsdmPipeline

    pipe = UsdmPipeline.tiny_random()
    eng_server = pipe.make_server(EngineConfig(
        page_size=32, max_pages_per_seq=64, max_batch_size=4, prefill_chunk=256))
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(pipe, eng_server, n_timesteps=2))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=30) as r:
            assert r.read() == b"ok"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=30) as r:
            assert b"usdm-tpu" in r.read()
        body = open(user_wav, "rb").read()

        results = {}

        def post(name, qs=""):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/respond{qs}", data=body, method="POST")
            with urllib.request.urlopen(req, timeout=600) as r:
                results[name] = json.loads(r.read())

        th1 = threading.Thread(target=post, args=("a",))
        th2 = threading.Thread(target=post, args=("b", "?top_k=5&temperature=1.2&seed=3"))
        th1.start()
        th2.start()
        th1.join(600)
        th2.join(600)
        assert "agent_text" in results["a"] and "n_units" in results["a"]
        assert "agent_text" in results["b"] and "n_units" in results["b"]
        # garbage body -> clean JSON error, not a crash
        req = urllib.request.Request(f"http://127.0.0.1:{port}/respond", data=b"garbage", method="POST")
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                payload = json.loads(r.read())
        except urllib.error.HTTPError as e:
            payload = json.loads(e.read())
        assert "error" in payload
    finally:
        server.shutdown()
        eng_server.close()


def test_serve_http_sse_stream(user_wav):
    """POST /respond?stream=1 returns Server-Sent Events: per-chain `stage`
    progress (text2text events carry the agent-text preview) and a final
    `result` event identical to the non-streaming JSON for the same seed."""
    from http.server import ThreadingHTTPServer

    from usdm_tpu.cli.serve import make_handler
    from usdm_tpu.core.config import EngineConfig
    from usdm_tpu.pipeline import UsdmPipeline

    pipe = UsdmPipeline.tiny_random()
    eng_server = pipe.make_server(EngineConfig(
        page_size=32, max_pages_per_seq=64, max_batch_size=4, prefill_chunk=256))
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(pipe, eng_server, n_timesteps=2))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = open(user_wav, "rb").read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/respond?stream=1&seed=5",
            data=body, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            raw = r.read().decode()
        events = []
        for block in raw.split("\n\n"):
            lines = dict(line.split(": ", 1) for line in block.splitlines() if ": " in line)
            if "event" in lines:
                events.append((lines["event"], json.loads(lines["data"])))
        kinds = [k for k, _ in events]
        assert kinds[-1] == "result" and "stage" in kinds[:-1]
        stages = [d["stage"] for k, d in events if k == "stage"]
        assert stages[0] == "unit2text" and "text2unit" in stages
        text_previews = [d["text"] for k, d in events
                         if k == "stage" and d["stage"] == "text2text"]
        assert text_previews and all(isinstance(t, str) for t in text_previews)
        streamed_result = events[-1][1]

        # the non-streaming endpoint with the same wav + seed agrees
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/respond?seed=5", data=body, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            plain = json.loads(r.read())
        assert streamed_result == plain

        # stream=1 on the dense path is a clean 400
        dense_srv = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(pipe, None, n_timesteps=2))
        dport = dense_srv.server_address[1]
        threading.Thread(target=dense_srv.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{dport}/respond?stream=1", data=body, method="POST")
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=60)
            assert exc.value.code == 400
        finally:
            dense_srv.shutdown()
    finally:
        server.shutdown()
        eng_server.close()


def test_serve_http_dense_fallback(user_wav):
    """--dense path (server=None) still serves one request at a time."""
    from http.server import ThreadingHTTPServer

    from usdm_tpu.cli.serve import make_handler
    from usdm_tpu.pipeline import UsdmPipeline

    pipe = UsdmPipeline.tiny_random()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(pipe, None, n_timesteps=2))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = open(user_wav, "rb").read()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/respond", data=body, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            payload = json.loads(r.read())
        assert "agent_text" in payload and "n_units" in payload
    finally:
        server.shutdown()


def _multipart_body(fields):
    """Build a multipart/form-data (body, content_type) from {name: bytes}."""
    boundary = "usdmtpuboundary42"
    out = b""
    for name, data in fields.items():
        out += (
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="{name}"; filename="{name}.wav"\r\n'
            f"Content-Type: audio/wav\r\n\r\n"
        ).encode() + data + b"\r\n"
    out += f"--{boundary}--\r\n".encode()
    return out, f'multipart/form-data; boundary="{boundary}"'


def test_serve_http_multipart_reference(user_wav):
    """POST /respond with named multipart fields: `wav` + optional speaker
    `reference` (streamlit_demo.py:96-205 parity for the HTTP API).  The
    response inlines audio as base64 instead of leaking a server temp path;
    oversized bodies are rejected with 413."""
    from http.server import ThreadingHTTPServer

    from usdm_tpu.cli.serve import make_handler
    from usdm_tpu.core.config import EngineConfig
    from usdm_tpu.pipeline import UsdmPipeline

    pipe = UsdmPipeline.tiny_random()
    eng_server = pipe.make_server(EngineConfig(
        page_size=32, max_pages_per_seq=64, max_batch_size=2, prefill_chunk=256))
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(pipe, eng_server, n_timesteps=2))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        wav_bytes = open(user_wav, "rb").read()
        body, ctype = _multipart_body({"reference": wav_bytes, "wav": wav_bytes})
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/respond", data=body, method="POST",
            headers={"Content-Type": ctype})
        with urllib.request.urlopen(req, timeout=600) as r:
            payload = json.loads(r.read())
        assert "agent_text" in payload and "audio_b64" in payload
        assert "audio_path" not in payload
        if payload["n_units"]:
            import base64

            assert base64.b64decode(payload["audio_b64"])[:4] == b"RIFF"

        # over-limit Content-Length -> 413 without reading the body
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/respond", data=b"x", method="POST",
            headers={"Content-Length": str(100 * 1024 * 1024)})
        try:
            urllib.request.urlopen(req, timeout=60)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 413
        except urllib.error.URLError:
            raised = True  # server closed the connection on the bogus length
        assert raised
    finally:
        server.shutdown()
        eng_server.close()
