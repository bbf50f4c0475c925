"""End-to-end spoken dialog pipeline: user wav -> agent wav.

The TPU-native equivalent of the reference's `src/inference.py` `sample()`
flow (/root/reference/src/inference.py:48-89): XLS-R unit extraction, the
3-stage unit->text->text->unit LLM chain, token-Voicebox mel synthesis (with
optional speaker reference prompt), and BigVGAN vocoding — every compute stage
jit-compiled on device; the host only does templating/regex between stages.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from usdm_tpu.audio.wav import load_wav, write_wav
from usdm_tpu.core import checkpoint as ckpt
from usdm_tpu.core.config import (
    BigVGANConfig,
    MelConfig,
    MistralConfig,
    VoiceboxConfig,
    XlsrConfig,
)
from usdm_tpu.core.tokenizer import UsdmTokenizer
from usdm_tpu.engine.dialog import DialogPolicy, DialogResult
from usdm_tpu.engine.synthesis import SpeechDecoder, prepare_reference
from usdm_tpu.models import bigvgan as BV
from usdm_tpu.models import mistral as LM
from usdm_tpu.models import voicebox as VB
from usdm_tpu.models import xlsr as XL


@dataclasses.dataclass
class UsdmPipeline:
    tokenizer: UsdmTokenizer
    lm_params: LM.Params
    lm_cfg: MistralConfig
    xlsr_params: XL.Params
    xlsr_cfg: XlsrConfig
    decoder: SpeechDecoder
    # per-stage cap; None = derive from tokenizer.model_max_length metadata
    # like the reference (inference.py:64, inference_vllm.py:113)
    max_new_tokens: Optional[int] = None
    # lazy single-caller serving engine backing respond() (paged decode costs
    # O(actual tokens); the dense fallback pays O(cache_len) per step)
    _server: Optional[object] = dataclasses.field(default=None, repr=False, compare=False)
    # speculative-decoding draft for respond(): (params, cfg) or "early-exit:N"
    _draft: Optional[object] = dataclasses.field(default=None, repr=False, compare=False)

    @classmethod
    def from_pretrained(
        cls,
        llm_dir: str,
        xlsr_dir: str,
        kmeans_path: str,
        voicebox_dir: str,
        bigvgan_dir: str,
        tokenizer_dir: Optional[str] = None,
        lm_dtype: str = "bfloat16",
        lm_int8: bool = False,
        vb_int8: bool = True,
    ) -> "UsdmPipeline":
        """Assemble the full stack from local checkpoint directories.

        `lm_int8=True` quantizes the LLM projections to W8A8 int8, halving
        decode HBM traffic (~1.7x tokens/s on one chip).  `vb_int8=True`
        (the default — inference-only, earned by the asserted drift gate)
        quantizes the Voicebox estimator's projection/FFN matmuls to W8A8
        — the estimator is matmul-bound and the MXU runs int8 at 2x bf16
        (measured 1.30x on the 50-step ODE, drift nRMS 1e-4:
        scripts/bench_vb_int8.py; drift bounds in
        tests/test_voicebox_quant.py)."""
        lm_params, lm_cfg = ckpt.load_mistral(llm_dir, dtype=lm_dtype)
        if lm_int8:
            from usdm_tpu.models.quant import quantize_llm_params

            lm_params = quantize_llm_params(lm_params)
        xlsr_params, xlsr_cfg = ckpt.load_xlsr(xlsr_dir, kmeans_path)
        vb_params, vb_cfg = ckpt.load_voicebox(voicebox_dir)
        if vb_int8:
            from usdm_tpu.models.quant import quantize_voicebox_params

            vb_params = quantize_voicebox_params(vb_params)
        bv_params, bv_cfg = ckpt.load_bigvgan(bigvgan_dir)
        tokenizer = UsdmTokenizer.load(tokenizer_dir or llm_dir)
        decoder = SpeechDecoder(vb_params, vb_cfg, bv_params, bv_cfg)
        return cls(tokenizer, lm_params, lm_cfg, xlsr_params, xlsr_cfg, decoder)

    @classmethod
    def tiny_random(cls, seed: int = 0) -> "UsdmPipeline":
        """A structurally-complete random pipeline for tests/demo plumbing."""
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        tok = UsdmTokenizer.build_test(num_units=32)
        lm_cfg = MistralConfig.tiny(vocab_size=tok.vocab_size)
        xl_cfg = XlsrConfig.tiny().replace(num_clusters=32)
        vb_cfg = VoiceboxConfig.tiny().replace(n_tokens=32, n_feats=80)
        bv_cfg = BigVGANConfig.tiny().replace(num_mels=80)
        decoder = SpeechDecoder(
            VB.init_params(vb_cfg, k1), vb_cfg,
            BV.init_generator(bv_cfg, k2), bv_cfg,
            MelConfig(),
        )
        return cls(tok, LM.init_params(lm_cfg, k3), lm_cfg,
                   XL.init_params(xl_cfg, k4), xl_cfg, decoder, max_new_tokens=16)

    # ------------------------------------------------------------------ api
    def extract_units(self, wav: np.ndarray) -> list[int]:
        # bucketed: serving sees arbitrary upload lengths (see
        # xlsr.extract_units_bucketed — lossless, bounded compile set)
        return XL.extract_units_bucketed(self.xlsr_params, self.xlsr_cfg, wav)

    def make_server(self, ecfg=None, tp: int = 1, draft=None):
        """Spin up the continuous-batching serving engine over the LM.

        Returns an `EngineServer` (background step-loop thread); build one
        `PagedDialogPolicy` per conversation on top of it.  This is the
        concurrent serving path (reference: vLLM engine in
        streamlit_demo.py:64) — `respond()` below is the single-caller
        prefix-reuse path.  `tp > 1` shards the LM + KV pool tensor-parallel
        across the first `tp` devices (engine.tp shard_map serving).
        `draft` enables greedy speculative decoding: `(params, cfg)` of a
        separate small LM, the string `"early-exit:N"` for a training-free
        self-draft built from the target's first N layers, or `"ngram"` for
        DRAFT-FREE prompt-lookup speculation (proposals from the sequence's
        own history; no extra model or KV pool).  Output is identical to
        plain greedy in every case."""
        from usdm_tpu.core.config import EngineConfig
        from usdm_tpu.engine.paged import PagedEngine
        from usdm_tpu.engine.server import EngineServer

        mesh = None
        if tp > 1:
            from usdm_tpu.engine.tp import make_tp_mesh

            mesh = make_tp_mesh(tp)
        if isinstance(draft, str) and draft != "ngram":
            if not draft.startswith("early-exit:"):
                raise ValueError(f"unknown draft spec {draft!r}")
            from usdm_tpu.models.quant import early_exit_draft

            n = int(draft.split(":", 1)[1])
            draft = (early_exit_draft(self.lm_params, n),
                     self.lm_cfg.replace(num_layers=n))
        return EngineServer(PagedEngine(self.lm_params, self.lm_cfg,
                                        ecfg or EngineConfig(), mesh=mesh,
                                        draft=draft))

    def enable_speculation(self, draft) -> None:
        """Attach a speculative-decoding draft to the respond() path:
        `(params, cfg)` of a small LM, `"early-exit:N"`, or `"ngram"`
        (draft-free prompt-lookup — the stage-C default lever).  Output
        is unchanged (greedy speculation is lossless); only speed depends on
        draft agreement.  Rebuilds the lazy dialog server if one exists."""
        self.close()
        self._draft = draft

    def _dialog_server(self):
        """Lazy EngineServer for the single-caller respond() path (small
        2-slot pool; concurrent serving builds its own via make_server)."""
        if self._server is None:
            from usdm_tpu.core.config import EngineConfig

            # single caller: one slot (each extra slot pads every decode
            # dispatch); horizon 16 — with depth-1 chain run-ahead the sync
            # RTT is hidden regardless of chain length, and SHORT chains
            # measure faster (90 tok/s at 8/16 vs 84.5 at 32 on v5e, b=1
            # 7B-int8) while bounding the EOS-overshoot waste at <=2 short
            # chains; 64-token pages so the stage-B/C prefix reuse keeps most
            # of the previous stage's KV (256-token pages rounded stage B's
            # ~250-token common prefix down to zero)
            # prefill_chunk 512: the single caller has no admission-latency
            # concern, and halving the chunk dispatches cuts stage-A/B
            # prefill wall time (measured round 3, scripts/profile_respond)
            self._server = self.make_server(
                EngineConfig(max_batch_size=1, decode_horizon=16,
                             page_size=64, max_pages_per_seq=128,
                             prefill_chunk=512),
                draft=self._draft)
        return self._server

    def close(self) -> None:
        if self._server is not None:
            self._server.close()
            self._server = None

    def respond(
        self,
        input_path: str,
        output_path: Optional[str] = None,
        reference_path: Optional[str] = None,
        n_timesteps: int = 50,
        seed: int = 0,
        top_k: int = 1,
        top_p: float = 1.0,
        temperature: float = 1.0,
        use_paged: bool = True,
    ) -> DialogResult:
        """Full speech-to-speech turn; writes the agent waveform if
        `output_path` is given and returns the intermediate text/units.
        Sampling defaults to greedy like the reference (inference.py:64-82);
        the demo exposes top_k/top_p/temperature (streamlit_demo.py:195-205).

        `use_paged=True` (default) decodes through the paged engine — cost
        scales with actual sequence length like the reference's vLLM driver.
        `use_paged=False` is the dense prefix-reuse path (reference
        inference.py HF-generate parity)."""
        if use_paged:
            from usdm_tpu.engine.server import PagedDialogPolicy

            policy = PagedDialogPolicy(
                self._dialog_server(), self.tokenizer,
                max_new_tokens=self.max_new_tokens,
                top_k=top_k, top_p=top_p, temperature=temperature, seed=seed)
        else:
            policy = DialogPolicy(self.lm_params, self.lm_cfg, self.tokenizer,
                                  max_new_tokens=self.max_new_tokens,
                                  top_k=top_k, top_p=top_p, temperature=temperature,
                                  seed=seed)
        return self.respond_with_policy(
            policy, input_path, output_path, reference_path, n_timesteps, seed
        )

    def respond_with_policy(
        self,
        policy,
        input_path: str,
        output_path: Optional[str] = None,
        reference_path: Optional[str] = None,
        n_timesteps: int = 50,
        seed: int = 0,
    ) -> DialogResult:
        """Speech-to-speech turn with a caller-supplied dialog policy (any
        object with respond_to_units), e.g. a PagedDialogPolicy sharing a
        serving engine across conversations."""
        wav, _ = load_wav(input_path, sr=self.xlsr_cfg.sample_rate)
        user_units = self.extract_units(wav)
        result = policy.respond_to_units(user_units)

        reference = None
        if reference_path:
            reference = prepare_reference(
                reference_path, self.xlsr_params, self.xlsr_cfg, self.decoder.mel_cfg
            )

        if result.agent_units:
            audio = self.decoder.synthesize(
                result.agent_units, jax.random.PRNGKey(seed),
                reference=reference, n_timesteps=n_timesteps,
            )
        else:
            audio = np.zeros(0, np.float32)

        if output_path is not None and len(audio):
            write_wav(output_path, audio, self.decoder.mel_cfg.sampling_rate)
        return result
