"""bench.py failure isolation (VERDICT r4 item 3).

The round-4 record was lost because one broken tier (bench_pipeline) took
down the whole bench: the exception traceback pinned its HBM while the
fallback allocated a fresh param set, and the last fallback was unwrapped.
These tests pin the contract: any single tier failing still yields a JSON
line from a later tier with rc=0, every tier's failure is recorded, and
device memory is released between attempts.
"""

import io
import json
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

import bench


def _run_main(monkeypatch, **tiers):
    for name, impl in tiers.items():
        monkeypatch.setattr(bench, name, impl)
    monkeypatch.setattr(bench, "_free_device_memory", lambda: None)
    buf = io.StringIO()
    rc = 0
    try:
        with redirect_stdout(buf):
            bench.main()
    except SystemExit as e:
        rc = int(e.code or 0)
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got {lines}"
    return rc, json.loads(lines[0])


def _boom(*a, **k):
    raise RuntimeError("tier exploded")


def test_primary_ok(monkeypatch):
    rc, out = _run_main(
        monkeypatch,
        bench_pipeline=lambda: 0.9,
        bench_serving=lambda n_clients=8, **k: {"tok_s": 100.0 * n_clients / 8},
    )
    assert rc == 0
    assert out["metric"] == "e2e_pipeline_rtf" and out["value"] == 0.9
    assert out["serving"]["tok_s"] == 100.0
    assert out["serving_16"]["tok_s"] == 200.0


def test_pipeline_fails_e2e_survives(monkeypatch):
    rc, out = _run_main(
        monkeypatch,
        bench_pipeline=_boom,
        bench_e2e=lambda: (0.7, "e2e_speech_to_speech_rtf"),
    )
    assert rc == 0
    assert out["metric"] == "e2e_speech_to_speech_rtf" and out["value"] == 0.7
    assert "tier exploded" in out["e2e_pipeline_error"]


def test_two_tiers_fail_last_survives(monkeypatch):
    rc, out = _run_main(
        monkeypatch,
        bench_pipeline=_boom,
        bench_e2e=_boom,
        bench_decoder_only=lambda: (0.4, "decoder_rtf"),
    )
    assert rc == 0
    assert out["metric"] == "decoder_rtf"
    assert "e2e_pipeline_error" in out and "e2e_component_error" in out


def test_all_tiers_fail_still_one_json_line_rc1(monkeypatch):
    rc, out = _run_main(
        monkeypatch,
        bench_pipeline=_boom,
        bench_e2e=_boom,
        bench_decoder_only=_boom,
    )
    assert rc == 1
    assert "decoder_only_error" in out and "value" not in out


def test_serving_failure_does_not_kill_primary(monkeypatch):
    rc, out = _run_main(
        monkeypatch,
        bench_pipeline=lambda: 0.9,
        bench_serving=_boom,
    )
    assert rc == 0
    assert out["value"] == 0.9
    assert "tier exploded" in out["serving_error"]
    assert "tier exploded" in out["serving_16_error"]


def test_free_device_memory_releases_live_arrays():
    """The real _free_device_memory (NOT the no-op patch the tier tests use)
    must delete every live device array and never raise — it is the function
    that keeps a failed tier's pinned HBM from starving the next one, and a
    regression in it (e.g. a jax API rename) must fail in CI, not first
    on-chip inside bench.main's failure path."""
    import jax
    import jax.numpy as jnp

    a = jnp.arange(1024.0)
    b = jnp.ones((64, 64))
    (a[:64] + b[0]).block_until_ready()
    assert len(jax.live_arrays()) >= 2
    bench._free_device_memory()
    assert len(jax.live_arrays()) == 0
    with pytest.raises(RuntimeError):
        _ = np.asarray(a)  # deleted buffer
    del b
    bench._free_device_memory()  # idempotent on an empty set
