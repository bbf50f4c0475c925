"""USDM tokenizer: a Mistral-style BPE with the 10,003-token speech extension.

Reference contract (/root/reference/src/train_pt.py:104-123): base Mistral
vocab (32,000) extended in order with `<|continue|>` (32000), `<|correspond|>`
(32001), `<|unit0|>`..`<|unit9999|>` (32002..42001), `<pad>` (42002).

Backed by the HF `tokenizers` runtime (no sentencepiece dependency):
  * `UsdmTokenizer.load(path)` loads a real tokenizer.json (e.g. converted
    from the naver-ai/USDM-DailyTalk checkpoint) and appends the specials.
  * `UsdmTokenizer.build_test(...)` constructs a tiny offline character-BPE
    with identical structure for hermetic tests (no network).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

from tokenizers import AddedToken, Tokenizer, decoders, models, pre_tokenizers

from usdm_tpu.core.config import TokenSpace

_METASPACE = "▁"  # ▁


class UsdmTokenizer:
    def __init__(
        self,
        tok: Tokenizer,
        ts: TokenSpace,
        add_bos: bool = True,
        model_max_length: int = 8192,
    ):
        self._tok = tok
        self.ts = ts
        self.add_bos = add_bos
        # per-stage decode budget for serving (reference threads
        # tokenizer.model_max_length into vLLM SamplingParams.max_tokens,
        # inference_vllm.py:113)
        self.model_max_length = model_max_length

    # ------------------------------------------------------------------ load
    @classmethod
    def load(cls, path: str, num_units: int = 10000) -> "UsdmTokenizer":
        """Load tokenizer.json from a directory or file and extend the vocab."""
        if os.path.isdir(path):
            path = os.path.join(path, "tokenizer.json")
        model_max_length = 8192
        cfg_path = os.path.join(os.path.dirname(path), "tokenizer_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                mml = json.load(f).get("model_max_length")
            if isinstance(mml, (int, float)) and 0 < mml < 1e9:  # HF sentinel ~1e30
                model_max_length = int(mml)
        tok = Tokenizer.from_file(path)
        base = tok.get_vocab_size()
        specials = ["<|continue|>", "<|correspond|>"]
        specials += [f"<|unit{i}|>" for i in range(num_units)]
        specials += ["<pad>"]
        existing = tok.get_vocab()
        missing = [s for s in specials if s not in existing]
        if missing:
            tok.add_special_tokens([AddedToken(s, normalized=False, special=True) for s in missing])
            base_vocab = base
        else:
            base_vocab = base - len(specials)
        space_id = tok.token_to_id(_METASPACE)
        nl = tok.encode("\n", add_special_tokens=False).ids[-1]
        ts = TokenSpace(
            base_vocab_size=base_vocab,
            num_units=num_units,
            bos_id=tok.token_to_id("<s>") if tok.token_to_id("<s>") is not None else 1,
            eos_id=tok.token_to_id("</s>") if tok.token_to_id("</s>") is not None else 2,
            space_id=space_id if space_id is not None else 28705,
            newline_id=nl,
        )
        return cls(tok, ts, model_max_length=model_max_length)

    # ------------------------------------------------------------- test build
    @classmethod
    def build_test(cls, num_units: int = 32) -> "UsdmTokenizer":
        """A small hermetic char-level BPE mimicking Mistral's structure:
        metaspace pre-tokenization, <unk>/<s>/</s> at 0/1/2, a bare "▁" token,
        then the speech extension in the canonical order."""
        chars = [chr(c) for c in range(32, 127)] + ["\n"]
        vocab = {"<unk>": 0, "<s>": 1, "</s>": 2, _METASPACE: 3}
        for ch in chars:
            if ch not in vocab and ch != " ":
                vocab[ch] = len(vocab)
        model = models.BPE(vocab=vocab, merges=[], unk_token="<unk>")
        tok = Tokenizer(model)
        tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement=_METASPACE, prepend_scheme="first")
        tok.decoder = decoders.Metaspace(replacement=_METASPACE, prepend_scheme="first")
        base = tok.get_vocab_size()
        specials = ["<|continue|>", "<|correspond|>"]
        specials += [f"<|unit{i}|>" for i in range(num_units)]
        specials += ["<pad>"]
        tok.add_special_tokens([AddedToken(s, normalized=False, special=True) for s in specials])
        ts = TokenSpace(
            base_vocab_size=base,
            num_units=num_units,
            bos_id=1,
            eos_id=2,
            space_id=3,
            newline_id=vocab["\n"],
        )
        return cls(tok, ts)

    @classmethod
    def build_synthetic_full(cls, base_vocab_size: int = 32000, num_units: int = 10000
                             ) -> "UsdmTokenizer":
        """Real USDM token-space geometry (32,000 base + 10,003 specials =
        42,003) with a hermetic char-level BPE padded by filler tokens: for
        full-size benchmarking (bench.py e2e_pipeline mode) and synthetic
        full-geometry checkpoint round-trips, where the id LAYOUT and vocab
        SIZE must match the reference but real weights don't exist."""
        chars = [chr(c) for c in range(32, 127)] + ["\n"]
        vocab = {"<unk>": 0, "<s>": 1, "</s>": 2, _METASPACE: 3}
        for ch in chars:
            if ch not in vocab and ch != " ":
                vocab[ch] = len(vocab)
        i = 0
        while len(vocab) < base_vocab_size:
            vocab[f"<fill{i}>"] = len(vocab)
            i += 1
        model = models.BPE(vocab=vocab, merges=[], unk_token="<unk>")
        tok = Tokenizer(model)
        tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement=_METASPACE, prepend_scheme="first")
        tok.decoder = decoders.Metaspace(replacement=_METASPACE, prepend_scheme="first")
        specials = ["<|continue|>", "<|correspond|>"]
        specials += [f"<|unit{i}|>" for i in range(num_units)]
        specials += ["<pad>"]
        tok.add_special_tokens([AddedToken(s, normalized=False, special=True) for s in specials])
        ts = TokenSpace(
            base_vocab_size=base_vocab_size,
            num_units=num_units,
            bos_id=1,
            eos_id=2,
            space_id=3,
            newline_id=vocab["\n"],
        )
        return cls(tok, ts)

    # ------------------------------------------------------------------- api
    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def encode(self, text: str, add_bos: Optional[bool] = None) -> List[int]:
        ids = self._tok.encode(text, add_special_tokens=False).ids
        add_bos = self.add_bos if add_bos is None else add_bos
        return ([self.ts.bos_id] + ids) if add_bos else ids

    def decode(self, ids: Sequence[int], skip_special: bool = False) -> str:
        return self._tok.decode(list(int(i) for i in ids), skip_special_tokens=skip_special)

    def token_to_id(self, token: str) -> Optional[int]:
        return self._tok.token_to_id(token)

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        self._tok.save(os.path.join(path, "tokenizer.json"))
        with open(os.path.join(path, "token_space.json"), "w") as f:
            json.dump(self.ts.__dict__, f, indent=2)
