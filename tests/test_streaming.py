"""Streaming composite decoding == offline decoding, regardless of chunking."""
import numpy as np
import pytest

from cs304_tpu.models.hmm import WordHMM, stack_word_models, uniform_forward_log_a
from cs304_tpu.ops.gaussian import gaussian_log_pdf
from cs304_tpu.ops.streaming import StreamingComposite
from cs304_tpu.ops.viterbi import viterbi_composite

import jax.numpy as jnp


@pytest.fixture
def composite(rng):
    def mk(label, s):
        a = rng.normal(size=(s, 4, 2)).astype(np.float32)
        covs = a @ a.transpose(0, 2, 1) + np.eye(4, dtype=np.float32)
        return WordHMM(
            label=label,
            means=rng.normal(size=(s, 4)).astype(np.float32) * 2,
            covariances=covs,
            log_a=uniform_forward_log_a(s),
        )

    return stack_word_models([mk("A", 4), mk("B", 3), mk("S", 2)], penalty=-4.0)


def offline(composite, feats):
    log_b = composite.log_likelihoods(feats)
    return viterbi_composite(
        log_b, jnp.asarray(composite.log_a),
        jnp.asarray(composite.lower_of_state), jnp.asarray(composite.is_entry),
        jnp.asarray(composite.is_exit), composite.penalty,
        quirk_backtrace=False,
    )


@pytest.mark.parametrize("chunking", [[37], [10, 10, 10, 7], [1] * 37, [20, 17]])
def test_streaming_matches_offline(rng, composite, chunking):
    feats = (rng.normal(size=(37, 4)) * 2).astype(np.float32)
    want_score, want_path = offline(composite, feats)

    stream = StreamingComposite(composite, chunk_size=16)
    start = 0
    for c in chunking:
        stream.feed(feats[start : start + c])
        start += c
    score, path = stream.finalize()
    assert np.allclose(score, float(want_score), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(path, np.asarray(want_path))


def test_partial_labels_progress(rng, composite):
    feats = (rng.normal(size=(24, 4)) * 2).astype(np.float32)
    stream = StreamingComposite(composite, chunk_size=8)
    hyps = []
    for start in range(0, 24, 8):
        stream.feed(feats[start : start + 8])
        hyps.append(stream.partial_labels(skip_silence=False))
    assert all(isinstance(h, str) for h in hyps)
    assert hyps[-1] != ""
    stream.reset()
    assert stream.partial_labels() == ""
