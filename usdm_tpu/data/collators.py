"""Batch collators for LM pre-training and SFT.

Pre-training (reference DataCollator, /root/reference/src/train_pt.py:35-69):
each packed row concatenates many subsamples; position ids restart at every
BOS via the cummax trick, and the restart points become flash-attention
cu_seqlens.  Here the same information is carried as (positions, segment_ids)
— segment id increments at every BOS — which our segmented attention consumes
directly (no flat-index plumbing).

SFT (reference train_sft.py:38-59): plain right-padding of pre-tokenized
(input_ids, labels) pairs; labels already carry -100 masks from the DailyTalk
preprocessing.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

IGNORE_INDEX = -100


def pack_collate(
    batch_ids: Sequence[Sequence[int]],
    pad_id: int,
    bos_id: int = 1,
    pad_to: int | None = None,
) -> Dict[str, np.ndarray]:
    """Packed rows -> {input_ids, labels, positions, segment_ids}.

    positions restart at each BOS (train_pt.py:49-58); segment_ids number the
    subsamples 0,1,2,... per row; padding gets segment -1 (masked everywhere)
    and label IGNORE_INDEX.
    """
    b = len(batch_ids)
    t = max(len(x) for x in batch_ids)
    if pad_to:
        t = max(t, pad_to)
    input_ids = np.full((b, t), pad_id, np.int32)
    labels = np.full((b, t), IGNORE_INDEX, np.int32)
    positions = np.ones((b, t), np.int32)  # reference pads positions with 1
    segment_ids = np.full((b, t), -1, np.int32)

    for i, ids in enumerate(batch_ids):
        ids = np.asarray(ids, np.int32)
        n = len(ids)
        input_ids[i, :n] = ids
        labels[i, :n] = ids
        is_bos = ids == bos_id
        # segment id = number of BOS seen so far (first token counts as a
        # start even if it isn't BOS)
        seg = np.cumsum(is_bos)
        if not is_bos[0]:
            seg = seg + 1
        segment_ids[i, :n] = seg - seg[0]
        # positions restart at each BOS: index - (index of last BOS <= index)
        idx = np.arange(n)
        last_bos = np.maximum.accumulate(np.where(is_bos, idx, 0))
        positions[i, :n] = idx - last_bos
    return {
        "input_ids": input_ids,
        "labels": labels,
        "positions": positions,
        "segment_ids": segment_ids,
    }


def sft_collate(
    batch: Sequence[Tuple[Sequence[int], Sequence[int]]],
    pad_id: int,
    pad_to: int | None = None,
) -> Dict[str, np.ndarray]:
    """(input_ids, labels) pairs -> padded batch; single segment per row."""
    b = len(batch)
    t = max(len(ids) for ids, _ in batch)
    if pad_to:
        t = max(t, pad_to)
    input_ids = np.full((b, t), pad_id, np.int32)
    labels = np.full((b, t), IGNORE_INDEX, np.int32)
    positions = np.zeros((b, t), np.int32)
    segment_ids = np.full((b, t), -1, np.int32)
    for i, (ids, labs) in enumerate(batch):
        n = len(ids)
        input_ids[i, :n] = np.asarray(ids, np.int32)
        labels[i, :n] = np.asarray(labs, np.int32)
        positions[i, :n] = np.arange(n)
        segment_ids[i, :n] = 0
    return {
        "input_ids": input_ids,
        "labels": labels,
        "positions": positions,
        "segment_ids": segment_ids,
    }
