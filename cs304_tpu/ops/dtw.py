"""Multi-template dynamic time warping as a columnwise lax.scan.

The reference's DTW (dynamic_time_wrapping.py) concatenates all template MFCCs
into one trellis with per-word start rows, moves {insertion (same row),
diagonal, super-diagonal skipping one template row}, per-column beam pruning at
column_min * (1 + pruning_factor) using the PREVIOUS column's min
(dynamic_time_wrapping.py:89-95), and scores each word at its final row in the
last column. Here the frame-distance matrix is one batched matmul
(||a-b||^2 = ||a||^2 + ||b||^2 - 2ab) and the column loop is a lax.scan whose
body updates ALL template rows at once on the VPU.

Documented divergences from the reference's literal code (both are defects we
do not replicate, SURVEY.md §2 #15):
- its row loop starts one row early, overwriting each word's boundary row with
  a distance computed against the PREVIOUS word's last frame (and for the first
  word, sequences[-1] — Python wraparound) (dynamic_time_wrapping.py:79-81);
- its final score reads row start+length-1 of the (H+1)-row matrix, i.e. the
  second-to-last frame of each template (:110-113).
Here each word's rows are exactly its template frames and the score is its
true last row.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

INF = np.float32(np.inf)  # numpy: no device touch at import


def pairwise_euclidean(templates: jax.Array, sample: jax.Array) -> jax.Array:
    """(H, D) x (L, D) -> (H, L) Euclidean distances via one matmul."""
    t2 = jnp.sum(templates * templates, axis=1)[:, None]
    s2 = jnp.sum(sample * sample, axis=1)[None, :]
    cross = jnp.dot(
        templates, sample.T, precision=jax.lax.Precision.HIGHEST
    )
    sq = jnp.maximum(t2 + s2 - 2.0 * cross, 0.0)
    return jnp.sqrt(sq)


@partial(jax.jit, static_argnames=("pruning",))
def dtw_multi_template(
    dist: jax.Array,
    is_first: jax.Array,
    is_second: jax.Array,
    end_rows: jax.Array,
    pruning: bool = True,
    pruning_factor: float = 4.0,
):
    """Run the multi-template trellis over a (H, L) distance matrix.

    is_first/is_second: (H,) bools marking each word's first/second row.
    end_rows: (W,) int32 last row of each word.
    Returns (W,) accumulated distances (word w aligned over the full sample).
    """
    h, l = dist.shape

    def column(carry, inputs):
        prev_col, prev_min = carry
        j, dist_j = inputs
        # Fresh word starts are only allowed at the first sample column.
        boundary_prev = jnp.where(j == 0, 0.0, INF)
        level = prev_col
        diag = jnp.where(is_first, boundary_prev, jnp.roll(prev_col, 1))
        superdiag = jnp.where(
            is_first, INF, jnp.where(is_second, boundary_prev, jnp.roll(prev_col, 2))
        )
        best = jnp.minimum(level, jnp.minimum(diag, superdiag))
        new_col = dist_j + best
        if pruning:
            threshold = prev_min * (1.0 + pruning_factor)
            new_col = jnp.where(new_col > threshold, INF, new_col)
        new_min = jnp.min(new_col)
        return (new_col, new_min), None

    init_col = jnp.full((h,), INF)
    (final_col, _), _ = jax.lax.scan(
        column,
        (init_col, INF),
        (jnp.arange(l, dtype=jnp.int32), dist.T),
    )
    return final_col[end_rows]


@dataclass
class DTWRecognizer:
    """Template-based isolated-word recognizer (reference DynamicTimeWarping).

    Build once from per-word template feature sequences, then `search` samples.
    """

    word_lengths: List[int]
    templates: np.ndarray  # (H, D) concatenated template features
    pruning: bool = True
    pruning_factor: float = 4.0

    @classmethod
    def from_features(
        cls, template_features: Sequence[np.ndarray], **kwargs
    ) -> "DTWRecognizer":
        lengths = [int(f.shape[0]) for f in template_features]
        return cls(
            word_lengths=lengths,
            templates=np.concatenate(
                [np.asarray(f, np.float32) for f in template_features]
            ),
            **kwargs,
        )

    def __post_init__(self) -> None:
        starts = np.cumsum([0] + self.word_lengths[:-1])
        h = sum(self.word_lengths)
        self._is_first = np.zeros(h, bool)
        self._is_first[starts] = True
        seconds = starts + 1
        self._is_second = np.zeros(h, bool)
        self._is_second[seconds[seconds < h]] = True
        self._end_rows = (starts + np.asarray(self.word_lengths) - 1).astype(np.int32)

    def distances(self, sample_features: np.ndarray) -> np.ndarray:
        """(W,) alignment costs of the sample against every template word."""
        dist = pairwise_euclidean(
            jnp.asarray(self.templates), jnp.asarray(sample_features)
        )
        out = dtw_multi_template(
            dist,
            jnp.asarray(self._is_first),
            jnp.asarray(self._is_second),
            jnp.asarray(self._end_rows),
            pruning=self.pruning,
            pruning_factor=self.pruning_factor,
        )
        return np.asarray(out)

    def search(self, sample_features: np.ndarray):
        """Best (word index, distance), like DynamicTimeWarping.search
        (dynamic_time_wrapping.py:66-116)."""
        d = self.distances(sample_features)
        idx = int(np.argmin(d))
        return idx, float(d[idx])
