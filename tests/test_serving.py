"""Raw-audio serving sessions (cs304_tpu/serving.py).

Gates: per-session endpointing finds each spoken utterance in a continuous
audio feed (speech, pause, speech, ...); finals are offline-parity (equal to
decoding the endpointed signal through ContinuousDecoder); partials appear
during speech; sessions are independent and recycle slots across utterances.
"""
import numpy as np
import pytest

from cs304_tpu.models.decoder import ContinuousDecoder
from cs304_tpu.ops.mfcc import mfcc_batch
from cs304_tpu.serving import ServingSessionPool

SR = 16000


def _silence(seconds, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 20.0, int(seconds * SR)).astype(np.float32)


def _session_audio(corpus, transcripts, speaker, gap=0.5):
    """Continuous mic feed: leading silence, utterances separated by long
    silence (well past the 0.2 s endpoint threshold)."""
    pieces = [_silence(0.3, seed=speaker)]
    for i, tr in enumerate(transcripts):
        pieces.append(corpus.sentence_audio(tr, speaker, jitter_seed=i))
        pieces.append(_silence(gap, seed=speaker * 7 + i))
    return np.concatenate(pieces)


def _drain(pool, feeds_by_session, chunk=1600):
    """Feed each session its audio in chunk-size pieces; collect results."""
    results = {s: [] for s in feeds_by_session}
    partial_seen = {s: [] for s in feeds_by_session}
    cursors = {s: 0 for s in feeds_by_session}
    while any(cursors[s] < len(a) for s, a in feeds_by_session.items()):
        step = {}
        for s, audio in feeds_by_session.items():
            if cursors[s] < len(audio):
                step[s] = audio[cursors[s] : cursors[s] + chunk]
                cursors[s] += chunk
        done = pool.feed(step)
        for s, rs in done.items():
            results[s].extend(rs)
        live = pool.partials(list(feeds_by_session))
        for s, p in live.items():
            if p:
                partial_seen[s].append(p)
    return results, partial_seen


def test_multi_utterance_sessions_offline_parity(trained_system):
    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    pool = ServingSessionPool(models, num_slots=4)
    decoder = ContinuousDecoder(models, penalty=-100.0)

    a, b = pool.open(), pool.open()
    audio = {
        a: _session_audio(corpus, ["375", "12"], speaker=0),
        b: _session_audio(corpus, ["186Z"], speaker=1),
    }
    results, partials = _drain(pool, audio)

    assert [r.text for r in results[a]] == ["375", "12"]
    assert [r.text for r in results[b]] == ["186Z"]
    # Finals are offline-parity: decoding each endpointed utterance length
    # must agree with the pool's text (by construction the pool decodes the
    # endpointed signal; cross-check the first utterance end-to-end).
    assert all(r.num_samples > 0 for r in results[a] + results[b])
    # Partials appeared while speaking, and the last partial is recorded.
    assert partials[a] and partials[b]
    assert all(isinstance(r.last_partial, str) for r in results[a])

    pool.close(a)
    pool.close(b)
    with pytest.raises(KeyError):
        pool.feed({a: _silence(0.1)})


def test_final_equals_direct_decode_of_endpointed_signal(trained_system):
    """The serving final must equal ContinuousDecoder.predict on the SAME
    endpointed samples — the parity contract with project6_interactive."""
    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    from cs304_tpu.audio.capture import Segmentation, SegmentationDone

    audio = _session_audio(corpus, ["54321"], speaker=0)
    seg = Segmentation(stream=None)
    seg.audio_cache.put(audio)
    with pytest.raises(SegmentationDone):
        seg.routine()
    endpointed = seg.result_signal()
    expected = ContinuousDecoder(models, penalty=-100.0).predict(
        mfcc_batch([endpointed])[0]
    )

    pool = ServingSessionPool(models, num_slots=2)
    s = pool.open()
    results, _ = _drain(pool, {s: audio})
    assert len(results[s]) == 1
    assert results[s][0].text == expected
    assert results[s][0].num_samples == len(endpointed)


def test_single_feed_spanning_two_utterances(trained_system):
    """Audio after an endpoint inside one feed() chunk must flow into the
    next utterance, not be dropped (frames are run one at a time and the
    remainder carries into the fresh session state)."""
    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    pool = ServingSessionPool(models, num_slots=2)
    s = pool.open()
    audio = _session_audio(corpus, ["375", "12"], speaker=0)
    # Everything in ONE call, with a length that is NOT a frame multiple.
    done = pool.feed({s: audio[: len(audio) - 13]})
    texts = [r.text for r in done.get(s, [])]
    # Trailing silence may leave the 2nd endpoint for a later feed; flush it.
    done2 = pool.feed({s: audio[len(audio) - 13 :]})
    texts += [r.text for r in done2.get(s, [])]
    assert texts == ["375", "12"]


def test_pool_exhaustion_degrades_gracefully(trained_system):
    """With ONE slot, a feed spanning two utterances momentarily exhausts
    the pool (endpoint release is deferred past the batched rounds): the
    successor's partials start late instead of feed() crashing, and finals
    stay correct."""
    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    pool = ServingSessionPool(models, num_slots=1)
    s = pool.open()
    audio = _session_audio(corpus, ["375", "12"], speaker=0)
    texts = []
    done = pool.feed({s: audio})  # everything in one call
    texts += [r.text for r in done.get(s, [])]
    done = pool.feed({s: _silence(0.5)})  # flush any pending endpoint
    texts += [r.text for r in done.get(s, [])]
    assert texts == ["375", "12"]


def test_ring_overflow_degrades_gracefully(trained_system):
    """An utterance whose speech outruns the streaming ring (max_frames)
    must NOT abort feed() for every session (advisor finding: pool.step()
    raised ValueError out of feed()). The overflowing utterance goes
    finals-only; streaming resumes with the next utterance."""
    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    # 48 frames = 0.48 s of speech: every corpus sentence overflows this.
    pool = ServingSessionPool(models, num_slots=2, max_frames=48)
    s = pool.open()
    audio = _session_audio(corpus, ["375", "12"], speaker=0)
    results, _partials = _drain(pool, {s: audio})
    texts = [r.text for r in results[s]]
    done = pool.feed({s: _silence(0.5)})  # flush any pending endpoint
    texts += [r.text for r in done.get(s, [])]
    assert texts == ["375", "12"]


def test_silence_only_session_yields_nothing(trained_system):
    models = trained_system["embedded_models"]
    pool = ServingSessionPool(models, num_slots=2)
    s = pool.open()
    results, partials = _drain(pool, {s: _silence(1.0)})
    assert results[s] == []
    assert partials[s] == []


def test_predict_signal_batch_parity(trained_system):
    """The fused raw-audio decode (one program: MFCC+trellis+words) must
    equal the two-stage mfcc_batch -> predict_batch path exactly."""
    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    decoder = ContinuousDecoder(models, penalty=-100.0)
    signals = [
        corpus.sentence_audio("375", 0, jitter_seed=0),
        corpus.sentence_audio("186Z", 1, jitter_seed=1),
        corpus.sentence_audio("54321", 0, jitter_seed=2),
    ]
    fused = decoder.predict_signal_batch(signals)
    staged = decoder.predict_batch(mfcc_batch(signals))
    assert fused == staged

    from cs304_tpu.models.train_continuous_gmm import promote_to_gmm

    gmm_decoder = ContinuousDecoder(
        promote_to_gmm(models, 2), penalty=-100.0
    )
    fused_g = gmm_decoder.predict_signal_batch(signals[:2])
    staged_g = gmm_decoder.predict_batch(mfcc_batch(signals[:2]))
    assert fused_g == staged_g


def test_confidence_scoring(trained_system):
    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    pool = ServingSessionPool(models, num_slots=2, confidences=True)
    s = pool.open()
    audio = _session_audio(corpus, ["375"], speaker=0)
    results, _ = _drain(pool, {s: audio})
    assert [r.text for r in results[s]] == ["375"]
    conf = results[s][0].confidence
    assert conf is not None and 0.0 <= conf <= 1.0
    # A clean, correctly decoded utterance should be high-confidence.
    assert conf > 0.5
    # Default mode leaves confidence unset.
    pool2 = ServingSessionPool(models, num_slots=2)
    s2 = pool2.open()
    results2, _ = _drain(pool2, {s2: audio})
    assert results2[s2][0].confidence is None


def test_gmm_checkpoint_sessions(trained_system):
    """GMM model dicts serve end-to-end (lifted emissions in both the
    streaming pool and the fused finals path)."""
    from cs304_tpu.models.train_continuous_gmm import promote_to_gmm

    corpus = trained_system["corpus"]
    # jitter=0: both mixtures identical, so the GMM densities equal the K=1
    # model's exactly — this tests the GMM serving PLUMBING (lifted
    # emissions in the pool and the fused finals) without the model-quality
    # noise of an unrefined mixture split (which measurably degrades decode
    # until GMMContinuousTrainer re-estimates it).
    models = promote_to_gmm(trained_system["embedded_models"], 2, jitter=0.0)
    pool = ServingSessionPool(models, num_slots=2)
    s = pool.open()
    audio = _session_audio(corpus, ["375"], speaker=0)
    results, partials = _drain(pool, {s: audio})
    assert [r.text for r in results[s]] == ["375"]
    assert partials[s]


def test_mesh_sharded_sessions_match_single(trained_system):
    """ServingSessionPool with the streaming pool sharded over the 8-device
    virtual mesh produces identical finals and partials to the unsharded
    pool — the multi-chip serving story end-to-end."""
    import jax
    from jax.sharding import Mesh

    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    audio = _session_audio(corpus, ["375", "12"], speaker=0)

    def run(mesh_arg):
        pool = ServingSessionPool(models, num_slots=8, mesh=mesh_arg)
        s = pool.open()
        results, partials = _drain(pool, {s: audio})
        return [r.text for r in results[s]], partials[s]

    sharded, single = run(mesh), run(None)
    assert sharded[0] == single[0] == ["375", "12"]
    assert sharded[1] == single[1]


def test_partials_disabled_mode(trained_system):
    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    pool = ServingSessionPool(models, num_slots=2, partials=False)
    s = pool.open()
    audio = _session_audio(corpus, ["375"], speaker=0)
    results, partials = _drain(pool, {s: audio})
    assert [r.text for r in results[s]] == ["375"]
    assert partials[s] == []
    assert results[s][0].last_partial == ""


def test_bigram_serving_sessions(trained_system):
    """Sessions under a word-bigram LM: finals decode with the offline
    bigram measure (partials run through the LM-aware banded pool step)."""
    from cs304_tpu.ops.lm import train_word_bigram

    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    bigram = train_word_bigram(
        trained_system["train_transcripts"], sorted(models),
        insert_silence=True,
    )
    pool = ServingSessionPool(
        models, num_slots=2, bigram=bigram, lm_weight=1.0
    )
    offline = ContinuousDecoder(
        models, penalty=-100.0, bigram=bigram, lm_weight=1.0
    )
    a = pool.open()
    results, partials = _drain(
        pool, {a: _session_audio(corpus, ["375"], speaker=0)}
    )
    assert len(results[a]) == 1
    final = results[a][0]
    assert final.text == "375"
    assert partials[a]
    # The same audio through the offline LM decoder agrees.
    from cs304_tpu.ops.mfcc import mfcc_batch

    feats = mfcc_batch([corpus.sentence_audio("375", 0)])
    assert offline.predict_batch(feats) == [final.text]
