"""Generated word vocabularies + tuple-transcript plumbing.

The reference is an 11-word digit task (ti_digits.py:13-26); these tests
cover the scale substrate: 100+-word generated vocabularies
(data/wordvocab.py), multi-char labels through the decoder, and tuple
transcripts through the embedded trainer (data/synthetic.join_transcript,
train_continuous.insert_silence).
"""
import numpy as np
import pytest

from cs304_tpu.data.synthetic import join_transcript
from cs304_tpu.data.wordvocab import (
    make_phone_inventory,
    make_vocabulary,
    make_word_corpus,
    word_labels,
)
from cs304_tpu.models.train_continuous import insert_silence


def test_word_labels_fixed_width_unique():
    labels = word_labels(200)
    assert len(labels) == 200
    assert len(set(labels)) == 200
    assert all(len(l) == 3 for l in labels)
    assert "S" not in labels


def test_word_labels_limit():
    with pytest.raises(ValueError):
        word_labels(2000)


def test_vocabulary_deterministic_and_unique():
    v1 = make_vocabulary(120, seed=7)
    v2 = make_vocabulary(120, seed=7)
    assert v1 == v2
    assert len(v1) == 120
    # Phone sequences are unique per word.
    assert len({tuple(t) for t in v1.values()}) == 120
    # Words draw from a SHARED inventory (confusability): far fewer distinct
    # phones than total phone slots.
    inventory = set(make_phone_inventory(24, seed=7))
    for template in v1.values():
        assert 3 <= len(template) <= 5
        assert set(template) <= inventory


def test_join_transcript_types():
    assert join_transcript(["4", "Z", "2"]) == "4Z2"
    assert join_transcript(["bak", "tes"]) == ("bak", "tes")
    # np.str_ inputs come out as plain str.
    out = join_transcript(np.array(["bak", "tes"]))
    assert out == ("bak", "tes")
    assert all(type(w) is str for w in out)


def test_insert_silence_tuple():
    assert insert_silence("4Z2") == "S4SZS2S"  # reference parity
    assert insert_silence(("bak", "tes")) == ("S", "bak", "S", "tes", "S")
    assert insert_silence(()) == ("S",)


def test_word_corpus_surface():
    corpus = make_word_corpus(
        8, num_train_speakers=2, num_test_speakers=1, takes_per_digit=2
    )
    assert len(corpus.labels) == 8
    train = corpus.train_dataset
    assert sorted(train.labels) == sorted(corpus.labels)
    assert all(len(train[l]) == 4 for l in corpus.labels)  # 2 spk x 2 takes
    # Regeneration is deterministic.
    again = make_word_corpus(
        8, num_train_speakers=2, num_test_speakers=1, takes_per_digit=2
    )
    np.testing.assert_array_equal(
        train[corpus.labels[3]][1], again.train_dataset[corpus.labels[3]][1]
    )


def test_word_sentences_ground_truth_segments():
    corpus = make_word_corpus(6, num_train_speakers=1, num_test_speakers=1)
    tr = tuple(corpus.labels[:3])
    audio, segments = corpus.sentence_audio_with_segments(tr, 0)
    assert [s[0] for s in segments] == list(tr)
    assert all(0 <= a < b <= len(audio) for _, a, b in segments)


def test_decoder_multichar_labels(rng):
    """Multi-char word labels decode to an unambiguous concatenation."""
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a

    labels = word_labels(10)
    models = {}
    for i, label in enumerate(labels):
        means = np.zeros((4, 3), np.float32)
        means[:, 0] = i * 3.0
        means[:, 1] = np.arange(4)
        models[label] = WordHMM(
            label=label, means=means,
            covariances=np.tile(np.eye(3, dtype=np.float32) * 0.3, (4, 1, 1)),
            log_a=uniform_forward_log_a(4),
        )
    dec = ContinuousDecoder(models, penalty=-5.0)
    frames = []
    for w in (7, 2, 7):
        for s in range(4):
            for _ in range(3):
                frames.append([w * 3.0, s, 0.0])
    feats = (np.asarray(frames, np.float32)
             + rng.normal(0, 0.05, (len(frames), 3)).astype(np.float32))
    assert dec.predict(feats) == labels[7] + labels[2] + labels[7]


@pytest.mark.slow
def test_word_corpus_end_to_end():
    """Tuple transcripts through boot -> embedded training -> decode."""
    from cs304_tpu.audio.endpointing import SignalSeparation
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.train_continuous import (
        ContinuousTrainConfig,
        ContinuousTrainer,
    )
    from cs304_tpu.models.train_kmeans import (
        SegmentalKMeansConfig,
        train_digit_models,
        train_word_hmm,
    )
    from cs304_tpu.ops.mfcc import mfcc_batch

    corpus = make_word_corpus(
        10, num_train_speakers=3, num_test_speakers=1, takes_per_digit=2
    )
    labels = corpus.labels
    sep = SignalSeparation()
    feats = {
        l: mfcc_batch(sep.remove_empty_batch(corpus.train_dataset[l]))
        for l in labels
    }
    boot = train_digit_models(
        feats,
        SegmentalKMeansConfig(num_states=5, max_iterations=8,
                              length_multiple=32),
    )
    noises = [n for n in sep.get_all_noises() if len(n) >= 9 * sep.frame_size]
    boot["S"] = train_word_hmm(
        "S", mfcc_batch(noises),
        SegmentalKMeansConfig(num_states=3, max_iterations=8,
                              length_multiple=32),
    ).model

    rng = np.random.default_rng(0)
    transcripts = [
        join_transcript(rng.choice(labels, size=n)) for n in (2, 3, 3, 4)
    ]
    assert all(isinstance(tr, tuple) for tr in transcripts)
    labeled = {
        tr: mfcc_batch([
            corpus.sentence_audio(tr, spk, jitter_seed=t)
            for spk in range(3) for t in range(2)
        ])
        for tr in transcripts
    }
    trainer = ContinuousTrainer(
        boot, ContinuousTrainConfig(max_iterations=3, cov_reg=0.1)
    )
    trainer.train(labeled)
    dec = ContinuousDecoder(trainer.models(), penalty=-100.0)
    assert dec.composite.num_states == 10 * 5 + 3

    truths, clips = [], []
    for tr in transcripts:  # held-out speaker 3
        truths.append("".join(tr))
        clips.append(corpus.sentence_audio(tr, 3, jitter_seed=9))
    preds = dec.predict_batch(mfcc_batch(clips))
    acc = np.mean([p == t for p, t in zip(preds, truths)])
    assert acc >= 0.5, (preds, truths)


def test_vocabulary_capacity_guard():
    """An infeasible unique-pronunciation request raises instead of
    spinning forever in rejection sampling (review finding)."""
    from cs304_tpu.data.wordvocab import make_vocabulary

    with pytest.raises(ValueError):
        make_vocabulary(30, phones_per_word=(1, 1), num_phones=5)
