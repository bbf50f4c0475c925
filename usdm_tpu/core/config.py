"""Typed configuration for every model / subsystem in the framework.

The reference scatters configuration across argparse, DeepSpeed JSON, HParams
attr-dicts and BigVGAN AttrDicts (see /root/reference/src/train_pt.py:225-264,
src/decoder/voicebox/util/train_util.py:78-144, vocoder/env.py:8).  Here it is
one module of frozen dataclasses so that configs hash, compare, and can be used
as jit static arguments.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


class _Base:
    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_dict(cls, d: dict):
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


# ---------------------------------------------------------------------------
# Token space (reference contract: src/train_pt.py:104-123, SURVEY.md §3)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TokenSpace(_Base):
    """The extended-vocabulary contract of the speech-text LLM.

    Base Mistral vocab (32,000) is extended *in order* with `<|continue|>`,
    `<|correspond|>`, `<|unit0|>`..`<|unit9999|>`, `<pad>` for a total of
    42,003 ids (reference: src/train_pt.py:104-123; mask bound at
    src/inference.py:51).
    """

    base_vocab_size: int = 32000
    num_units: int = 10000
    bos_id: int = 1
    eos_id: int = 2
    # The id of the bare "▁" (metaspace) token in the Mistral vocabulary;
    # used as the EOS of the text2unit stage (src/inference.py:82).
    space_id: int = 28705
    newline_id: int = 13  # id of "\n" continuation piece in Mistral vocab

    @property
    def continue_id(self) -> int:
        return self.base_vocab_size

    @property
    def correspond_id(self) -> int:
        return self.base_vocab_size + 1

    @property
    def unit_offset(self) -> int:
        return self.base_vocab_size + 2

    @property
    def pad_id(self) -> int:
        return self.base_vocab_size + 2 + self.num_units

    @property
    def vocab_size(self) -> int:
        return self.base_vocab_size + 2 + self.num_units + 1

    def unit_id(self, unit: int) -> int:
        return self.unit_offset + unit


# ---------------------------------------------------------------------------
# LLM (Mistral-7B-v0.1 + extended vocab)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MistralConfig(_Base):
    """Mistral-7B-v0.1 geometry with the USDM extended vocabulary."""

    vocab_size: int = 42003
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    sliding_window: int = 4096
    max_seq_len: int = 8192
    dtype: str = "bfloat16"
    # initializer_range of the reference HF config; used to re-init the new
    # token embeddings (src/train_pt.py:130-140).
    initializer_range: float = 0.02

    @classmethod
    def tiny(cls, vocab_size: int = 256 + 2 + 32 + 1) -> "MistralConfig":
        """A small config for tests: same structure, toy sizes."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=16,
            sliding_window=64,
            max_seq_len=256,
            dtype="float32",
        )


# ---------------------------------------------------------------------------
# Audio / mel (vocoder h; reference configs .../config.json:6-16)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MelConfig(_Base):
    sampling_rate: int = 22050
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    num_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    # normalization constants of the USDM token-Voicebox
    # (src/decoder/voicebox/util/model_util.py:18-19)
    mel_mean: float = -5.5419
    mel_std: float = 2.1575
    # unit token rate of the XLS-R tokenizer
    token_sr: int = 50


# ---------------------------------------------------------------------------
# token-Voicebox CFM decoder (reference config.json "model")
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class VoiceboxConfig(_Base):
    n_feats: int = 80
    n_tokens: int = 10000  # unit vocab; embedding table has n_tokens+1 rows
    embedding_dim: int = 1280
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_heads: int = 16
    num_layers: int = 24
    convpos_width: int = 31
    convpos_groups: int = 16
    convpos_depth: int = 2
    sigma_min: float = 1e-4
    dtype: str = "float32"

    @classmethod
    def tiny(cls) -> "VoiceboxConfig":
        return cls(
            n_feats=8,
            n_tokens=32,
            embedding_dim=16,
            hidden_size=32,
            intermediate_size=64,
            num_heads=4,
            num_layers=4,
            convpos_width=7,
            convpos_groups=4,
            convpos_depth=2,
        )


# ---------------------------------------------------------------------------
# BigVGAN vocoder (nvidia/bigvgan_22khz_80band geometry)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BigVGANConfig(_Base):
    num_mels: int = 80
    upsample_initial_channel: int = 1536
    upsample_rates: Sequence[int] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (8, 8, 4, 4, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock: str = "1"
    activation: str = "snakebeta"
    snake_logscale: bool = True
    sampling_rate: int = 22050
    # Run the up->snake->down anti-aliasing sandwich as one fused Pallas pass
    # (ops/fused_act.py) instead of the three-op XLA composition.  Measured
    # 2.2x on BigVGAN at full 22khz_80band geometry on one chip (RTF 0.0578
    # -> 0.0263, scripts/bench_fused_act.py); falls back to the XLA
    # composition off-TPU and for gradients.
    fused_act: bool = True

    @classmethod
    def tiny(cls) -> "BigVGANConfig":
        return cls(
            num_mels=8,
            upsample_initial_channel=32,
            upsample_rates=(4, 2),
            upsample_kernel_sizes=(8, 4),
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),),
        )

    @property
    def total_upsample(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


# ---------------------------------------------------------------------------
# XLS-R speech tokenizer (SeamlessM4T UnitExtractor equivalent)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class XlsrConfig(_Base):
    """wav2vec2 XLS-R 1B geometry (fairseq2 xlsr2_1b_v2).

    Conv feature extractor: 7 layers (512 ch), strides 5,2,2,2,2,2,2 and
    kernels 10,3,3,3,3,2,2 -> 320x downsample = 50 Hz at 16 kHz input.
    Transformer: 48 layers, hidden 1280, ffn 5120, 16 heads; features are
    tapped at layer 35 (0-indexed 34; every call site passes 35-1, e.g.
    /root/reference/src/inference.py:59) and assigned to 10,000 k-means
    centroids.
    """

    conv_channels: int = 512
    conv_kernels: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_heads: int = 16
    num_layers: int = 48
    output_layer: int = 35  # tap features after this many layers (1-indexed)
    num_clusters: int = 10000
    conv_pos_width: int = 128
    conv_pos_groups: int = 16
    layer_norm_first: bool = True
    sample_rate: int = 16000
    dtype: str = "float32"

    @classmethod
    def tiny(cls) -> "XlsrConfig":
        return cls(
            conv_channels=16,
            conv_kernels=(10, 3, 2),
            conv_strides=(5, 2, 2),
            hidden_size=32,
            intermediate_size=64,
            num_heads=4,
            num_layers=4,
            output_layer=3,
            num_clusters=64,
            conv_pos_width=16,
            conv_pos_groups=4,
        )


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TrainConfig(_Base):
    learning_rate: float = 2e-5
    lr_schedule: str = "cosine"
    warmup_ratio: float = 0.03
    adam_b1: float = 0.9
    adam_b2: float = 0.95
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    batch_size: int = 2
    grad_accum: int = 1
    max_steps: int = 1000
    seed: int = 42
    # parallelism
    dp: int = 1         # data-parallel (FSDP-sharded) axis size
    tp: int = 1         # tensor-parallel axis size
    remat: bool = True  # jax.checkpoint each decoder layer
    # lm_head + CE computed per ce_chunk tokens (jax.checkpoint'd) so the
    # full [T, vocab] f32 logits never materialize; 0 = unchunked
    ce_chunk: int = 1024
    # checkpointing
    save_every: int = 1000
    keep_checkpoints: int = 2


@dataclass(frozen=True)
class CfmTrainConfig(_Base):
    """token-Voicebox training (reference config.json "train")."""

    learning_rate: float = 1e-4
    grad_clip: float = 0.2
    batch_size: int = 8
    out_size_seconds: int = 16
    p_uncond: float = 0.2
    p_drop: float = 0.3
    r_min: float = 0.7
    r_max: float = 1.0
    seed: int = 37
    n_epochs: int = 10000
    save_every: int = 1
    dp: int = 1


# ---------------------------------------------------------------------------
# Decode engine
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class EngineConfig(_Base):
    page_size: int = 256          # tokens per KV page (bench-tuned on v5e)
    max_pages_per_seq: int = 32   # per-sequence budget (page_size * this)
    max_batch_size: int = 8
    prefill_chunk: int = 256      # tokens prefilled per engine step: bounds how
    # long an admission can stall in-flight decodes (vLLM chunked prefill)
    prefill_chunks_per_tick: int = 4  # chunks drained per scheduler tick while
    # prompts are pending: higher drains admissions faster (better TTFT and
    # less time in the slow per-token decode mode between chunks), lower
    # keeps in-flight decodes' latency tighter during a prefill burst
    n_pages: Optional[int] = None  # KV pool size; None = max_batch_size *
    # max_pages_per_seq (never page-constrained).  Set lower to bound HBM like
    # vLLM's gpu_memory_utilization-derived pool.
    spec_k: int = 4               # draft tokens per speculative round (used
    # only when the engine is built with a draft model; greedy requests only)
    ngram_max_n: int = 3          # draft="ngram" (prompt-lookup) speculation:
    # longest current-suffix n-gram matched against the sequence's own token
    # history when proposing spec_k tokens (engine.paged_ops.ngram_propose)
    decode_horizon: int = 8       # tokens decoded per host sync when no
    # admission/prefill is pending (chained dispatches; see
    # engine.paged.step_chain).  v5e-over-tunnel b=1 7B-int8: 21 tok/s at 1,
    # 56 at 8, 66 at 16; raise for single-caller use, lower for tighter
    # admission latency under concurrent load.
    kv_dtype: Optional[str] = None  # KV page pool dtype: None = model dtype
    # (bf16), "int8" = quantized pages with per-(head, token) f32 scales
    # (vLLM's fp8 KV cache analog) — half the page HBM and attention-read
    # traffic; outputs may differ from bf16 by ~0.4% logit noise.
    mixed_prefill: bool = True    # coalesce prefill chunks INTO the decode
    # batch (vLLM scheduler behavior): each chunk dispatch also advances every
    # decoding slot by one token, sharing the layer weight reads
    # (engine.paged_ops.paged_mixed_step) — a prefill burst no longer stalls
    # in-flight decodes for its whole duration.  False = alternate (r3
    # behavior): drain chunks back-to-back, decode between bursts.
    mixed_min_decode: int = 3     # engage the mixed path only when at least
    # this many slots are decoding: with a near-empty decode set there is
    # nothing to ride the chunk's weight reads and the fused link only adds
    # overhead (8-client wave-synchronized load measured 373 tok/s mixed vs
    # 439 alternating when waves left dec ~empty; 16-client staggered load
    # measured 808 vs 563 with dec ~full).
    mixed_prefill_rows: int = 8   # max prefill chunk rows batched per mixed
    # dispatch (different requests AND consecutive chunks of one prompt both
    # allowed): the first client wave's prefill queue drains ~rows-fold
    # faster, cutting p95 TTFT under concurrent load.  Rows bucket to powers
    # of two (padded rows are masked + trash-routed).  16-client 7B-int8
    # sweep on one v5e: rows=1 653 tok/s p95 1.73 s, rows=4 759/0.77,
    # rows=8 817/0.70, rows=16 801/0.69 (vs alternating 570-585/1.5-1.6).
    runahead: bool = True         # depth-1 chain run-ahead: dispatch the next
    # decode chain from carried device state BEFORE syncing the previous one,
    # hiding the per-chain host RTT (~25 ms tunneled) behind device compute.
    # Only engages in the quiet single-flow state (no admissions/prefills
    # pending, no draft, single device); outputs are identical either way.
