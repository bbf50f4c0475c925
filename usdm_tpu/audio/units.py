"""Speech-unit <-> mel-rate resampling and unit-string parsing.

Reference contract (SURVEY.md §3): units are 50 Hz ids in [0, 10000).  To
condition the mel decoder they are expanded by sr//50 (=441 at 22.05 kHz),
truncated to a hop multiple, and per-hop *mode*-pooled to the 86.13 Hz mel
frame rate (/root/reference/src/decoder/voicebox/util/model_util.py:50-54,
src/decoder/voicebox/util/data_util.py:40-57).
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_UNIT_RE = re.compile(r"<\|unit(\d+)\|>")


def units_to_string(units: Sequence[int]) -> str:
    return "".join(f"<|unit{int(u)}|>" for u in units)


def parse_units(text: str) -> List[int]:
    """Extract `<|unitN|>` ids from decoded text (reference inference.py:85)."""
    return [int(x) for x in _UNIT_RE.findall(text)]


def rowwise_mode(rows: jnp.ndarray) -> jnp.ndarray:
    """Mode of each row of an int array [N, W] -> [N].

    Ties resolve to the smallest value (matching torch.Tensor.mode, whose
    kthvalue-based CPU path returns the smallest of the most frequent values).
    Implemented by sorting each row and taking the value whose ascending run
    is longest; argmax picks the first (=smallest) maximal run.
    """
    s = jnp.sort(rows, axis=-1)
    n, w = s.shape
    # run_start[i, j] = 1 where a new value begins
    first = jnp.ones((n, 1), dtype=jnp.int32)
    starts = jnp.concatenate([first, (s[:, 1:] != s[:, :-1]).astype(jnp.int32)], axis=1)
    # run id per position, then count positions per run via segment trick:
    run_id = jnp.cumsum(starts, axis=1) - 1  # [N, W] in [0, W)
    one_hot = (run_id[:, :, None] == jnp.arange(w)[None, None, :]).astype(jnp.int32)
    run_len = one_hot.sum(axis=1)  # [N, W] length of each run id
    # value of each run = value at the run's first position
    # first position of run r = argmax over j of (run_id==r) (first True)
    first_pos = jnp.argmax(one_hot, axis=1)  # [N, W]
    run_val = jnp.take_along_axis(s, first_pos, axis=1)  # [N, W]
    best = jnp.argmax(run_len, axis=1)  # first maximal run -> smallest value
    return jnp.take_along_axis(run_val, best[:, None], axis=1)[:, 0]


def expand_and_pool(units: np.ndarray, sample_rate: int = 22050, token_sr: int = 50, hop: int = 256) -> Tuple[np.ndarray, int]:
    """50 Hz units -> mel-rate units by repeat_interleave + per-hop mode.

    Returns (pooled_units [n_frames], new_length_in_samples).  Mirrors
    model_util.py:50-54: repeat by sr//50, floor-truncate to a hop multiple,
    reshape (-1, hop), rowwise mode.
    """
    units = np.asarray(units, dtype=np.int32)
    reps = sample_rate // token_sr
    expanded = np.repeat(units, reps)
    new_length = len(expanded) // hop * hop
    rows = expanded[:new_length].reshape(-1, hop)
    pooled = np.asarray(rowwise_mode(jnp.asarray(rows)))
    return pooled, new_length


def expand_durations_and_pool(
    units: Sequence[int],
    durations: Sequence[int],
    sample_rate: int = 22050,
    token_sr: int = 50,
    hop: int = 256,
) -> Tuple[np.ndarray, int]:
    """Duration-weighted variant used by the training dataset
    (data_util.py:40-57): each unit u with duration d occupies
    d*round(sr/token_sr) samples."""
    reps = int(round(sample_rate / token_sr))
    units = np.asarray(units, dtype=np.int32)
    durations = np.asarray(durations, dtype=np.int64) * reps
    expanded = np.repeat(units, durations)
    new_length = len(expanded) // hop * hop
    rows = expanded[:new_length].reshape(-1, hop)
    pooled = np.asarray(rowwise_mode(jnp.asarray(rows)))
    return pooled, new_length


def dedup_units(units: Sequence[int]) -> Tuple[List[int], List[int]]:
    """Run-length encode a unit stream -> (unique-run units, durations).

    The reference pipeline does NOT dedup (durations are all 1,
    decoder/scripts/preprocess.py:40); this optional utility produces the
    (units, durations) form for duration-aware decoder training data and for
    compact unit transport.  `expand_durations_and_pool` inverts it."""
    units = [int(u) for u in units]
    if not units:
        return [], []
    out_u = [units[0]]
    out_d = [1]
    for u in units[1:]:
        if u == out_u[-1]:
            out_d[-1] += 1
        else:
            out_u.append(u)
            out_d.append(1)
    return out_u, out_d
