"""Isolated-word classifier: score a clip under every word model, argmax.

The reference loops 11 models per clip and ships clips to worker processes
(model_collection.py:23-28, scripts/project3_predict_simple.py:23-27). Here all
models' states stack into one (M*S) Gaussian set, so the whole (B clips x M
models) score table is one batched emission matmul + one vmapped scan.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import pad_batch
from ..ops.gaussian import gaussian_log_pdf, make_gaussian_params
from ..ops.viterbi import viterbi_banded
from .hmm import WordHMM

logger = logging.getLogger(__name__)


@dataclass
class ModelCollection:
    """Ordered set of word models with equal state counts."""

    labels: List[str]
    means: np.ndarray  # (M, S, D)
    covariances: np.ndarray  # (M, S, D, D)
    log_a: np.ndarray  # (M, S, S)

    @classmethod
    def from_models(cls, models: Sequence[WordHMM]) -> "ModelCollection":
        counts = {m.num_states for m in models}
        if len(counts) != 1:
            raise ValueError(f"state counts differ across models: {counts}")
        return cls(
            labels=[m.label for m in models],
            means=np.stack([m.means for m in models]),
            covariances=np.stack([m.covariances for m in models]),
            log_a=np.stack([m.log_a for m in models]),
        )

    @property
    def num_models(self) -> int:
        return self.means.shape[0]

    @property
    def num_states(self) -> int:
        return self.means.shape[1]

    def score_batch(self, features: Sequence[np.ndarray]) -> np.ndarray:
        """(B clips) -> (B, M) Viterbi scores under every model."""
        padded = pad_batch(features, 128)
        scores = _score_all(
            jnp.asarray(self.means),
            jnp.asarray(self.covariances),
            jnp.asarray(self.log_a),
            jnp.asarray(padded.data),
            jnp.asarray(padded.lengths),
        )
        return np.asarray(scores)

    def predict_batch(self, features: Sequence[np.ndarray]) -> List[str]:
        """argmax label per clip; ties go to the first (lowest-index) label,
        matching the reference's stable sort over the label dict
        (model_collection.py:24-28)."""
        scores = self.score_batch(features)
        return [self.labels[i] for i in np.argmax(scores, axis=1)]

    def predict(self, features) -> str:
        return self.predict_batch([np.asarray(features)])[0]


@jax.jit
def _score_all(means, covs, log_a, batch, lengths):
    """means (M,S,D), covs (M,S,D,D), log_a (M,S,S), batch (B,T,D) -> (B,M)."""
    m, s, d = means.shape
    flat = make_gaussian_params(means.reshape(m * s, d), covs.reshape(m * s, d, d))

    def one_clip(x, length):
        log_b = gaussian_log_pdf(flat, x).reshape(-1, m, s)  # (T, M, S)
        def one_model(lb, la):
            score, _ = viterbi_banded(lb, la, length)
            return score
        return jax.vmap(one_model, in_axes=(1, 0))(log_b, log_a)  # (M,)

    return jax.vmap(one_clip)(batch, lengths)  # (B, M)
