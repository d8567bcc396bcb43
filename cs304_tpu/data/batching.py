"""Padded/bucketed device batching.

The reference fans utterances out one-per-process (hidden_markov_model.py:300-305);
here ragged utterance lists become dense (B, T, D) device batches with length
masks, bucketed by length so jit recompiles stay bounded (SURVEY.md §7
"ragged utterance lengths").
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@dataclass
class PaddedBatch:
    """Dense batch of ragged sequences.

    data:    (B, T_pad, D) float32
    lengths: (B,) int32 true sequence lengths
    """

    data: np.ndarray
    lengths: np.ndarray

    def __len__(self) -> int:
        return self.data.shape[0]

    def unpad(self) -> List[np.ndarray]:
        return [self.data[i, : self.lengths[i]] for i in range(len(self))]


def pad_batch(
    sequences: Sequence[np.ndarray],
    length_multiple: int = 128,
    pad_value: float = 0.0,
) -> PaddedBatch:
    """Stack (T_i, D) arrays into (B, T_pad, D) with T_pad rounded up so XLA
    sees few distinct shapes."""
    lengths = np.array([s.shape[0] for s in sequences], np.int32)
    t_pad = round_up(int(lengths.max()), length_multiple)
    d = sequences[0].shape[1] if sequences[0].ndim > 1 else 1
    shape = (len(sequences), t_pad, d) if sequences[0].ndim > 1 else (len(sequences), t_pad)
    out = np.full(shape, pad_value, np.float32)
    for i, s in enumerate(sequences):
        out[i, : s.shape[0]] = s
    return PaddedBatch(out, lengths)


def pad_signals(
    signals: Sequence[np.ndarray], length_multiple: int = 2048
) -> PaddedBatch:
    """1-D raw-audio variant of pad_batch."""
    lengths = np.array([len(s) for s in signals], np.int32)
    l_pad = round_up(int(lengths.max()), length_multiple)
    out = np.zeros((len(signals), l_pad), np.float32)
    for i, s in enumerate(signals):
        out[i, : len(s)] = s
    return PaddedBatch(out, lengths)
