"""Dependency-free HTTP serving demo (stdlib http.server).

A minimal web UI + JSON API over the full speech-to-speech pipeline — the
zero-dependency sibling of the streamlit demo (reference
/root/reference/src/streamlit_demo.py).  Endpoints:

  GET  /           upload page
  POST /respond    multipart or raw wav body -> JSON {user_text, agent_text,
                   n_units} + X-Audio-Path header; ?audio=1 returns the wav
  GET  /health     liveness probe

Usage:
  python -m usdm_tpu.cli.serve --demo --port 8600
  python -m usdm_tpu.cli.serve --model_dir ... --xlsr_dir ... --kmeans ... \
      --voicebox_dir ... --bigvgan_dir ...
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = b"""<!doctype html>
<title>usdm-tpu demo</title>
<h1>usdm-tpu spoken dialog</h1>
<form method=post action="/respond?audio=1" enctype=multipart/form-data>
  <p>User speech wav: <input type=file name=wav></p>
  <p><button>Respond</button></p>
</form>
"""


def make_handler(pipe, n_timesteps: int):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            sys.stderr.write("serve: " + fmt % args + "\n")

        def do_GET(self):
            if self.path.startswith("/health"):
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(_PAGE)

        def do_POST(self):
            if not self.path.startswith("/respond"):
                self.send_response(404)
                self.end_headers()
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            if "multipart/form-data" in ctype:
                # crude multipart extraction of the first file part
                boundary = ctype.split("boundary=")[-1].encode()
                parts = body.split(b"--" + boundary)
                wav_bytes = b""
                for part in parts:
                    if b"filename=" in part:
                        wav_bytes = part.split(b"\r\n\r\n", 1)[1].rsplit(b"\r\n", 1)[0]
                        break
            else:
                wav_bytes = body

            with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                f.write(wav_bytes)
                in_path = f.name
            out_path = in_path + ".out.wav"

            try:
                with lock:  # one TPU, one request at a time
                    result = pipe.respond(in_path, out_path, None, n_timesteps=n_timesteps)
            except Exception as e:  # noqa: BLE001
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)}).encode())
                return

            if "audio=1" in self.path and result.agent_units:
                with open(out_path, "rb") as f:
                    audio = f.read()
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("X-User-Text", result.user_text[:512])
                self.send_header("X-Agent-Text", result.agent_text[:512])
                self.end_headers()
                self.wfile.write(audio)
            else:
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({
                    "user_text": result.user_text,
                    "agent_text": result.agent_text,
                    "n_units": len(result.agent_units),
                    "audio_path": out_path,
                }).encode())

    return Handler


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
    args = p.parse_args(argv)

    from usdm_tpu.pipeline import UsdmPipeline

    if args.demo:
        pipe = UsdmPipeline.tiny_random()
    else:
        pipe = UsdmPipeline.from_pretrained(
            args.model_dir, args.xlsr_dir, args.kmeans,
            args.voicebox_dir, args.bigvgan_dir, args.tokenizer_dir,
        )

    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(pipe, args.n_timesteps))
    print(f"serving on :{args.port} (demo={args.demo})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
