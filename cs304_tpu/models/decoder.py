"""Continuous-speech decoder over the flattened composite state space.

Equivalent of HiddenMarkovModelInference (reference hidden_markov_model.py:413-581):
loads word models (optionally including the silence model "S"), flattens them,
runs the composite Viterbi, and converts the state path to a digit string. The
inter-word penalty is a first-class parameter (the reference pokes the private
attribute from scripts, e.g. project5_test_ndigits_with_sil.py:62).
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import pad_batch
from ..ops.gaussian import gaussian_log_pdf, make_gaussian_params
from ..ops.viterbi import viterbi_composite_batch
from .hmm import DEFAULT_WORD_PENALTY, CompositeHMM, WordHMM, stack_word_models

logger = logging.getLogger(__name__)


class ContinuousDecoder:
    """Batched continuous decoding with optional silence handling."""

    def __init__(
        self,
        models: Sequence[WordHMM] | Dict[str, WordHMM],
        penalty: float = DEFAULT_WORD_PENALTY,
        sort_labels: bool = True,
        backend: str = "fast",
    ) -> None:
        if isinstance(models, dict):
            models = list(models.values())
        if sort_labels:
            # The reference walks the checkpoint dir in sorted order
            # (hidden_markov_model.py:431), which fixes tie-break order.
            models = sorted(models, key=lambda m: m.label)
        if backend not in ("scan", "fast", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.composite = stack_word_models(models, penalty)

    @property
    def penalty(self) -> float:
        return self.composite.penalty

    @penalty.setter
    def penalty(self, value: float) -> None:
        self.composite.penalty = value

    def predict(self, features, skip_silence: bool = True) -> str:
        return self.predict_batch([np.asarray(features)], skip_silence)[0]

    def predict_batch(
        self, features: Sequence[np.ndarray], skip_silence: bool = True
    ) -> List[str]:
        """Decode a ragged list of (T_i, D) features to digit strings."""
        scores, paths, lengths = self.viterbi_batch(features)
        out = []
        for i in range(len(features)):
            labels = self.composite.path_to_labels(
                paths[i, : lengths[i]], skip_silence=skip_silence
            )
            out.append("".join(labels))
        return out

    def viterbi_batch(self, features: Sequence[np.ndarray]):
        """Returns (scores (B,), paths (B, T) np.int32, lengths (B,))."""
        c = self.composite
        padded = pad_batch(features, 128)
        scores, paths = _decode_batch(
            jnp.asarray(c.means),
            jnp.asarray(c.covariances),
            jnp.asarray(c.log_a),
            jnp.asarray(c.lower_of_state),
            jnp.asarray(c.is_entry),
            jnp.asarray(c.is_exit),
            jnp.float32(c.penalty),
            jnp.asarray(padded.data),
            jnp.asarray(padded.lengths),
            self.backend,
        )
        return np.asarray(scores), np.asarray(paths), padded.lengths


@partial(jax.jit, static_argnames=("backend",))
def _decode_batch(
    means, covs, log_a, lower_of_state, is_entry, is_exit, penalty, batch, lengths,
    backend: str = "scan",
):
    from ..ops.viterbi import (
        viterbi_composite_batch_fast,
        viterbi_composite_batch_pallas,
    )

    params = make_gaussian_params(means, covs)
    log_b = jax.vmap(lambda x: gaussian_log_pdf(params, x))(batch)  # (B, T, S)
    impl = {
        "scan": viterbi_composite_batch,
        "fast": viterbi_composite_batch_fast,
        "pallas": viterbi_composite_batch_pallas,
    }[backend]
    return impl(
        log_b, log_a, lower_of_state, is_entry, is_exit, penalty, lengths
    )
