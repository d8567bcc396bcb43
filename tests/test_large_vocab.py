"""Composite decoding beyond 127 states — the reference's int8 tracer
(hidden_markov_model.py:175,498-501) would overflow here; our int32
backpointers must not (SURVEY.md §7 'known defects')."""
import numpy as np

from cs304_tpu.models.decoder import ContinuousDecoder
from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a


def test_decode_with_168_states(rng):
    """28 words x 6 states = 168 composite states (> int8 range)."""
    labels = [f"w{i:02d}" for i in range(28)]
    models = {}
    for i, label in enumerate(labels):
        means = np.zeros((6, 3), np.float32)
        means[:, 0] = i * 3.0  # well-separated per-word clusters
        means[:, 1] = np.arange(6)
        models[label] = WordHMM(
            label=label, means=means,
            covariances=np.tile(np.eye(3, dtype=np.float32) * 0.3, (6, 1, 1)),
            log_a=uniform_forward_log_a(6),
        )
    dec = ContinuousDecoder(models, penalty=-5.0, sort_labels=False)
    assert dec.composite.num_states == 168

    # An utterance visiting word 25 then word 3 (states far beyond 127).
    frames = []
    for w in (25, 3):
        for s_ in range(6):
            for _ in range(3):
                frames.append([w * 3.0, s_, 0.0])
    feats = (np.asarray(frames, np.float32)
             + rng.normal(0, 0.05, (len(frames), 3)).astype(np.float32))
    pred = dec.predict(feats)
    assert pred == "w25w03", pred

    # Path states genuinely exceed 127.
    _, paths, lengths = dec.viterbi_batch([feats])
    assert paths[0][: lengths[0]].max() > 127
