"""Metrics logging + profiling hooks.

The reference logs through HF Trainer -> TensorBoard and a hand SummaryWriter
(/root/reference/src/train_pt.py:174, decoder/scripts/train.py:167-178).  Here:
a JSONL metrics stream (always), optional TensorBoard (via torch's
SummaryWriter when available), and `jax.profiler` trace capture around chosen
steps — the TPU answer to "tracing/profiling: none first-party" (SURVEY.md §6).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, out_dir: str, use_tensorboard: bool = True):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self._jsonl = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, Any], prefix: str = "train") -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[f"{prefix}/{k}"] = float(v)
            except (TypeError, ValueError):
                continue
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, step)

    def log_audio(self, step: int, tag: str, wav, sample_rate: int) -> None:
        """Per-epoch audible smoke test (reference scripts/train.py:277-302)."""
        import numpy as np

        if self._tb is not None:
            import torch

            self._tb.add_audio(tag, torch.from_numpy(np.asarray(wav))[None], step, sample_rate)
        else:
            from usdm_tpu.audio.wav import write_wav

            path = os.path.join(self.out_dir, f"audio_{tag.replace('/', '_')}_{step}.wav")
            write_wav(path, np.asarray(wav), sample_rate)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(out_dir: Optional[str], enabled: bool = True):
    """Capture a jax.profiler trace (view in TensorBoard / xprof)."""
    if not enabled or out_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
