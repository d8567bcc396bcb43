"""Chunked (online) composite Viterbi decoding.

The reference can only decode a finished utterance (mic capture ends at the
silence endpoint, THEN the whole clip is decoded —
scripts/project6_interactive.py:29-39). This module decodes incrementally:
feed fixed-size feature chunks as they arrive, keep the (S,) alpha carry and
the backpointer history on device, and read a partial hypothesis at any time.
`finalize()` reproduces the offline decoder's result exactly (standard
backtrace; the chunk boundary is invisible to the recursion).

Streaming operates at the FEATURE level: the reference MFCC normalization is
utterance-global (power_to_db ref=max, per-frame coefficient normalization),
i.e. non-causal, so bit-parity features require the full utterance. A causal
front-end variant is future work; endpoint-then-decode remains the parity path.
"""
from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .viterbi import composite_transition_matrix


@partial(jax.jit, static_argnames=())
def _stream_chunk(alpha, trans, log_b, start_t, valid):
    """Continue the recursion over one (C, S) emission chunk.

    start_t: absolute index of the chunk's first frame (0 => seed frame).
    valid: number of real frames in the chunk (rest are padding no-ops).
    Returns (new_alpha, bp (C, S) int32).
    """
    c, s = log_b.shape

    def step(carry, inputs):
        alpha, t_abs = carry
        i, log_b_t = inputs
        live = i < valid
        scores = alpha[:, None] + trans
        new_alpha = jnp.max(scores, axis=0) + log_b_t
        bp = jnp.argmax(scores, axis=0).astype(jnp.int32)
        # The very first absolute frame is the seed (already in alpha).
        is_seed = t_abs + i == 0
        new_alpha = jnp.where(is_seed, alpha, new_alpha)
        bp = jnp.where(is_seed, jnp.full((s,), -1, jnp.int32), bp)
        alpha = jnp.where(live, new_alpha, alpha)
        return (alpha, t_abs), bp

    (alpha, _), bps = jax.lax.scan(
        step, (alpha, jnp.asarray(start_t, jnp.int32)),
        (jnp.arange(c, dtype=jnp.int32), log_b),
    )
    return alpha, bps


class StreamingComposite:
    """Online continuous decoding over a CompositeHMM.

    >>> stream = StreamingComposite(composite, chunk_size=64)
    >>> for feats_chunk in source:          # (c, D) arrays, c <= chunk_size
    ...     stream.feed(feats_chunk)
    ...     print(stream.partial_labels())  # best hypothesis so far
    >>> score, path = stream.finalize()
    """

    def __init__(self, composite, chunk_size: int = 64,
                 gmm_params=None) -> None:
        """gmm_params: optional ops.gaussian.GMMParams over the composite's
        state space — emissions become K-mixture log-densities (the composite
        itself only carries the single-Gaussian boundary view). Build with
        from_models() for a mixed WordHMM/GMMWordHMM dict."""
        self.composite = composite
        self.chunk_size = chunk_size
        c = composite
        self._trans = composite_transition_matrix(
            jnp.asarray(c.log_a), jnp.asarray(c.lower_of_state),
            jnp.asarray(c.is_entry), jnp.asarray(c.is_exit),
            jnp.float32(c.penalty),
        )
        self._gmm_params = gmm_params
        self._emission_params = None if gmm_params is not None else c.emission_params()
        diag = np.diagonal(c.log_a)
        self._seed_diag = np.where(np.isfinite(diag), diag, 0.0).astype(np.float32)
        self.reset()

    @classmethod
    def from_models(cls, models, penalty: float = -100.0,
                    chunk_size: int = 64) -> "StreamingComposite":
        """Streaming decoder from a model dict/list, GMM-aware: K-mixture
        models stream with their true GMM densities (the same lift as
        ContinuousDecoder, models/decoder.py:_lift_to_gmm)."""
        from ..models.decoder import _lift_to_gmm
        from ..models.gmm_hmm import GMMWordHMM
        from ..models.hmm import stack_word_models
        from .gaussian import make_gmm_params

        if isinstance(models, dict):
            models = list(models.values())
        models = sorted(models, key=lambda m: m.label)
        if any(isinstance(m, GMMWordHMM) for m in models):
            views, (means, covs, weights) = _lift_to_gmm(models)
            composite = stack_word_models(views, penalty)
            gmm_params = make_gmm_params(
                jnp.asarray(means), jnp.asarray(covs), jnp.asarray(weights)
            )
            return cls(composite, chunk_size, gmm_params=gmm_params)
        return cls(stack_word_models(models, penalty), chunk_size)

    def reset(self) -> None:
        s = self.composite.num_states
        self._alpha = None  # set on first feed
        self._bp_chunks: List[np.ndarray] = []
        self._t = 0

    def feed(self, features: np.ndarray) -> None:
        """Feed a (c, D) feature chunk, c <= chunk_size."""
        from .gaussian import gaussian_log_pdf, gmm_log_pdf

        features = np.asarray(features, np.float32)
        c = features.shape[0]
        if c == 0:
            return
        if c > self.chunk_size:
            for start in range(0, c, self.chunk_size):
                self.feed(features[start : start + self.chunk_size])
            return
        padded = np.zeros((self.chunk_size, features.shape[1]), np.float32)
        padded[:c] = features
        if self._gmm_params is not None:
            log_b = gmm_log_pdf(self._gmm_params, jnp.asarray(padded))
        else:
            log_b = gaussian_log_pdf(self._emission_params, jnp.asarray(padded))

        if self._alpha is None:
            comp = self.composite
            alpha = np.full(comp.num_states, -np.inf, np.float32)
            entries = comp.lowers
            first = np.asarray(log_b[0])
            alpha[entries] = first[entries] + self._seed_diag[entries]
            self._alpha = jnp.asarray(alpha)

        self._alpha, bps = _stream_chunk(
            self._alpha, self._trans, log_b, self._t, c
        )
        self._bp_chunks.append(np.asarray(bps[:c]))
        self._t += c

    def _backtrace(self, best: int) -> np.ndarray:
        bp = np.concatenate(self._bp_chunks, axis=0)  # (t, S)
        path = np.zeros(self._t, np.int64)
        path[-1] = best
        state = best
        for t in range(self._t - 1, 0, -1):
            state = bp[t, state]
            path[t - 1] = state
        return path

    def partial_scores(self) -> np.ndarray:
        """Current per-exit-state scores (running hypothesis strengths)."""
        alpha = np.asarray(self._alpha)
        return np.where(self.composite.is_exit, alpha, -np.inf)

    def partial_labels(self, skip_silence: bool = True) -> str:
        """Best decode of everything fed so far (any state may end it)."""
        if self._t == 0:
            return ""
        alpha = np.asarray(self._alpha)
        best = int(np.argmax(alpha))
        return "".join(
            self.composite.path_to_labels(self._backtrace(best), skip_silence)
        )

    def finalize(self):
        """(score, path) with the offline decoder's termination (best exit)."""
        scores = self.partial_scores()
        best = int(np.argmax(scores))
        return float(scores[best]), self._backtrace(best)
