"""Interleaver + DailyTalk SFT preprocessing tests."""

import random

import numpy as np
import pytest

from usdm_tpu.core.tokenizer import UsdmTokenizer
from usdm_tpu.data.dailytalk import (
    IGNORE_INDEX,
    build_single_turn_samples,
    group_dialogs,
    mask_labels,
    speech_template,
)
from usdm_tpu.data.interleave import (
    Interval,
    interleave_tokens,
    merge_zero_width,
    normalize_transcript,
    parse_textgrid_words,
    prepare_alignment,
    redistribute_blanks,
    scale_to_frames,
)

TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 2.5
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.5
        intervals: size = 5
        intervals [1]:
            xmin = 0
            xmax = 0.3
            text = ""
        intervals [2]:
            xmin = 0.3
            xmax = 0.9
            text = "hello"
        intervals [3]:
            xmin = 0.9
            xmax = 1.1
            text = ""
        intervals [4]:
            xmin = 1.1
            xmax = 1.8
            text = "there"
        intervals [5]:
            xmin = 1.8
            xmax = 2.5
            text = "friend"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 2.5
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 2.5
            text = "x"
"""


@pytest.fixture
def tg_file(tmp_path):
    p = tmp_path / "a.TextGrid"
    p.write_text(TG)
    return str(p)


def test_parse_textgrid(tg_file):
    iv = parse_textgrid_words(tg_file)
    assert len(iv) == 5
    assert iv[1].mark == "hello"
    assert iv[-1].max_time == 2.5


def test_redistribute_blanks(tg_file):
    iv = redistribute_blanks(parse_textgrid_words(tg_file))
    assert [i.mark for i in iv] == ["hello", "there", "friend"]
    assert iv[0].min_time == 0.0  # leading blank absorbed
    assert iv[0].max_time == 1.0  # half of the middle blank
    assert iv[1].min_time == 1.0


def test_scale_and_merge(tg_file):
    iv = redistribute_blanks(parse_textgrid_words(tg_file))
    scaled = scale_to_frames(iv, n_units=125, total_time=2.5)
    assert scaled[-1].max_time == 125
    merged = merge_zero_width(scaled)
    assert " ".join(i.mark for i in merged) == "hello there friend"


def test_merge_zero_width_middle():
    iv = [Interval("a", 0, 5), Interval("b", 5, 5), Interval("c", 5, 9)]
    out = merge_zero_width(iv)
    assert len(out) == 1
    assert out[0].mark == "a b c"
    assert out[0].max_time == 9


def test_prepare_alignment(tg_file):
    res = prepare_alignment(tg_file, n_units=125)
    assert res is not None
    merged, transcript = res
    assert transcript == "hello there friend"


def test_interleave_tokens_roundtrip(tg_file):
    tok = UsdmTokenizer.build_test(num_units=32)
    ts = tok.ts
    merged, _ = prepare_alignment(tg_file, n_units=125)
    rng_units = np.random.default_rng(0).integers(0, 32, 125)
    unit_ids = [ts.unit_id(int(u)) for u in rng_units]

    def encode_text(s):
        return tok.encode(s, add_bos=False)

    cont = [ts.continue_id]
    corr = [ts.correspond_id]
    for seed in range(5):
        seq = interleave_tokens(merged, unit_ids, encode_text, cont, corr,
                                ts.bos_id, ts.eos_id, random.Random(seed))
        assert seq[0] == ts.bos_id and seq[-1] == ts.eos_id
        assert all(t < ts.vocab_size for t in seq)
        # any unit run must be a contiguous slice of the source frames
        in_units = [t - ts.unit_offset for t in seq if ts.unit_offset <= t < ts.pad_id]
        src = [int(u) for u in rng_units]
        # each emitted unit appears in source (weak sanity)
        assert all(0 <= u < 32 for u in in_units)


def test_group_dialogs_drops_same_speaker_runs():
    meta = [
        "0_1_d7|x|hi there|y",
        "1_0_d7|x|hello|y",
        "0_1_d9|x|a|y",
        "1_1_d9|x|b|y",  # same speaker twice -> dialog dropped
    ]
    d = group_dialogs(meta)
    assert "d7" in d and "d9" not in d


def test_mask_labels_spans():
    tok = UsdmTokenizer.build_test(num_units=16)
    ts = tok.ts
    uu = "".join(f"<|unit{i}|>" for i in [1, 2, 3])
    au = "".join(f"<|unit{i}|>" for i in [4, 5])
    text = (
        "Instruction line.\n"
        + speech_template(uu, "user words", "agent reply", au)
        + "</s>"
    )
    ids = tok.encode(text)
    labels = mask_labels(ids, ts.newline_id, ts.correspond_id)
    trained = [(i, t) for i, (t, l) in enumerate(zip(ids, labels)) if l != IGNORE_INDEX]
    trained_ids = [t for _, t in trained]
    # agent units are trained
    assert ts.unit_id(4) in trained_ids and ts.unit_id(5) in trained_ids
    # user units are NOT trained
    assert ts.unit_id(1) not in trained_ids
    # the agent <|correspond|> is trained (inside the agent line)
    assert trained_ids.count(ts.correspond_id) == 1
    # decoded trained text includes the user transcript and agent reply
    text_trained = tok.decode([t for t in trained_ids if t < ts.continue_id])
    assert "user words" in text_trained
    assert "agent reply" in text_trained
    assert "Instruction" not in text_trained


def test_build_single_turn_samples():
    tok = UsdmTokenizer.build_test(num_units=16)
    ts = tok.ts
    turns = [
        ("0_0_d1", "<|unit1|>", "Hi"),
        ("1_1_d1", "<|unit2|>", "Hello"),
        ("2_0_d1", "<|unit3|>", "Bye"),
        ("3_1_d1", "<|unit4|>", "See ya"),
    ]
    out = build_single_turn_samples(turns, tok.encode, ts.newline_id, ts.correspond_id)
    assert len(out) == 2
    for ids, labels in out:
        assert len(ids) == len(labels)
        assert any(l != IGNORE_INDEX for l in labels)


def test_normalize_transcript():
    assert normalize_transcript("Hello, World! It's ME.") == "hello world it's me"


def test_stage2_cli_parallel_matches_serial(tmp_path):
    """cmd_stage2 --workers N produces byte-identical outputs to serial
    (per-file deterministic rngs; reference stage2 is a Pool map)."""
    import os

    from usdm_tpu.cli.preprocess import main as pp_main

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        (data / f"utt{i}.TextGrid").write_text(TG)
        units = " ".join(str(u) for u in rng.integers(0, 32, size=125))
        (data / f"utt{i}_unit.txt").write_text(units)

    outs = {}
    for label, workers in [("serial", 0), ("par", 2)]:
        out = tmp_path / label
        pp_main(["stage2", "--data_path", str(data), "--output_path", str(out),
                 "--num_unit_tokens", "32", "--epoch", "2", "--seed", "7",
                 "--workers", str(workers)])
        outs[label] = {
            f: (out / f).read_text()
            for f in sorted(os.listdir(out))
        }
    assert outs["serial"] == outs["par"]
    assert any(f.endswith("epoch2.txt") for f in outs["serial"])
