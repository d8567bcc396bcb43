"""Batched live-stream serving (ops/streaming_batch.py).

Gates: per-stream results must be OFFLINE-EXACT (score and text identical to
the offline composite decode with the standard backtrace) under staggered
starts, uneven chunking, idle steps, and slot recycling; the int8 ring must
engage for S <= 127; GMM models must stream with their true densities.
"""
import numpy as np
import pytest

from cs304_tpu.models.hmm import WordHMM, stack_word_models, uniform_forward_log_a
from cs304_tpu.ops.streaming_batch import BatchedStreamingComposite, ring_dtype
from cs304_tpu.ops.viterbi import viterbi_composite


def _models(seed=0, labels=("1", "2", "S")):
    rng = np.random.default_rng(seed)
    models = {}
    for label in sorted(labels):
        s = 2 if label == "S" else 3
        means = rng.normal(size=(s, 6)).astype(np.float32) * 2.0
        covs = np.tile(np.eye(6, dtype=np.float32), (s, 1, 1))
        models[label] = WordHMM(label=label, means=means, covariances=covs,
                                log_a=uniform_forward_log_a(s))
    return models


def _offline(composite, feats):
    log_b = composite.log_likelihoods(feats)
    score, path = viterbi_composite(
        log_b, np.asarray(composite.log_a),
        np.asarray(composite.lower_of_state), np.asarray(composite.is_entry),
        np.asarray(composite.is_exit), composite.penalty,
        quirk_backtrace=False,
    )
    text = "".join(composite.path_to_labels(np.asarray(path)))
    return float(score), text


def _utterances(models, n, rng):
    """Feature sequences that wander near the models' state means."""
    all_means = np.concatenate([m.means for m in models.values()])
    out = []
    for _ in range(n):
        t = int(rng.integers(12, 40))
        picks = all_means[rng.integers(0, len(all_means), t)]
        out.append((picks + rng.normal(0, 0.3, picks.shape)).astype(np.float32))
    return out


def test_offline_exact_staggered_and_uneven_chunks(rng):
    models = _models()
    pool = BatchedStreamingComposite.from_models(
        models, penalty=-5.0, num_slots=4, chunk_size=8, max_frames=64,
    )
    comp = pool.composite
    utts = _utterances(models, 3, rng)
    slots = [pool.start() for _ in utts]
    cursors = [0, 0, 0]
    step_i = 0
    while any(cursors[i] < len(utts[i]) for i in range(3)):
        feeds = {}
        for i, slot in enumerate(slots):
            # Slot i starts at step i (staggered) and feeds uneven chunks.
            if step_i < i or cursors[i] >= len(utts[i]):
                continue
            c = int(rng.integers(1, 9))
            feeds[slot] = utts[i][cursors[i] : cursors[i] + c]
            cursors[i] += len(feeds[slot])
        pool.step(feeds)
        step_i += 1

    assert pool.fill() == {slots[i]: len(utts[i]) for i in range(3)}
    results = pool.finalize(slots)
    for i, slot in enumerate(slots):
        score, text = results[slot]
        off_score, off_text = _offline(comp, utts[i])
        assert score == pytest.approx(off_score, rel=1e-5), f"slot {slot}"
        assert text == off_text, f"slot {slot}"


def test_slot_recycling_is_exact(rng):
    models = _models(seed=3)
    pool = BatchedStreamingComposite.from_models(
        models, penalty=-5.0, num_slots=1, chunk_size=8, max_frames=64,
    )
    first, second = _utterances(models, 2, rng)

    slot = pool.start()
    for start in range(0, len(first), 8):
        pool.step({slot: first[start : start + 8]})
    s1, t1 = pool.finalize([slot])[slot]
    pool.release(slot)

    slot2 = pool.start()
    assert slot2 == slot  # recycled
    for start in range(0, len(second), 8):
        pool.step({slot2: second[start : start + 8]})
    s2, t2 = pool.finalize([slot2])[slot2]

    off1, off2 = _offline(pool.composite, first), _offline(pool.composite, second)
    assert (s1, t1) == (pytest.approx(off1[0], rel=1e-5), off1[1])
    assert (s2, t2) == (pytest.approx(off2[0], rel=1e-5), off2[1])


def test_partial_text_progresses(rng):
    models = _models(seed=5)
    pool = BatchedStreamingComposite.from_models(
        models, penalty=-5.0, num_slots=2, chunk_size=4, max_frames=64,
    )
    utt = _utterances(models, 1, rng)[0]
    slot = pool.start()
    assert pool.partial_text(slot) == ""
    seen = []
    for start in range(0, len(utt), 4):
        pool.step({slot: utt[start : start + 4]})
        seen.append(pool.partial_text(slot))
    assert all(isinstance(s, str) for s in seen)
    # The final partial under best-exit termination equals finalize's text
    # up to the termination rule; finalize itself must be offline-exact.
    _score, text = pool.finalize([slot])[slot]
    assert text == _offline(pool.composite, utt)[1]


def test_gmm_streaming(rng):
    from cs304_tpu.models.train_continuous_gmm import promote_to_gmm

    models = promote_to_gmm(_models(seed=7), 2, jitter=0.3)
    pool = BatchedStreamingComposite.from_models(
        models, penalty=-5.0, num_slots=2, chunk_size=8, max_frames=64,
    )
    assert pool._gmm_params is not None
    base = {l: m for l, m in _models(seed=7).items()}
    utt = _utterances(base, 1, rng)[0]
    slot = pool.start()
    pool.step({slot: utt[:8]})
    pool.step({slot: utt[8:16]})
    score, text = pool.finalize([slot])[slot]
    assert np.isfinite(score)
    assert isinstance(text, str)

    # GMM result matches the single-stream GMM decoder on the same frames.
    from cs304_tpu.ops.streaming import StreamingComposite

    single = StreamingComposite.from_models(models, penalty=-5.0, chunk_size=8)
    single.feed(utt[:16])
    s_score, s_path = single.finalize()
    assert score == pytest.approx(s_score, rel=1e-5)
    assert text == "".join(pool.composite.path_to_labels(s_path))


def test_ring_dtype_and_capacity_errors(rng):
    import jax.numpy as jnp

    assert ring_dtype(58) == jnp.int8
    assert ring_dtype(127) == jnp.int8
    assert ring_dtype(128) == jnp.int32

    models = _models()
    pool = BatchedStreamingComposite.from_models(
        models, penalty=-5.0, num_slots=1, chunk_size=4, max_frames=8,
    )
    assert pool._ring.dtype == jnp.int8
    slot = pool.start()
    with pytest.raises(RuntimeError, match="slots busy"):
        pool.start()
    utt = _utterances(models, 1, rng)[0]
    with pytest.raises(ValueError, match="exceeds chunk_size"):
        pool.step({slot: utt[:6]})
    pool.step({slot: utt[:4]})
    pool.step({slot: utt[4:8]})
    with pytest.raises(ValueError, match="max_frames"):
        pool.step({slot: utt[8:12]})
    with pytest.raises(KeyError):
        pool.step({slot + 1: utt[:2]})
    pool.release(slot)
    with pytest.raises(KeyError):
        pool.partial_text(slot)


def test_mesh_sharded_matches_single(rng):
    """Slots sharded over the 8-device virtual mesh (conftest) decode
    identically to the unsharded pool — the multi-chip serving path."""
    import jax
    from jax.sharding import Mesh

    models = _models(seed=11)
    utts = _utterances(models, 4, rng)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))

    def run(mesh_arg):
        pool = BatchedStreamingComposite.from_models(
            models, penalty=-5.0, num_slots=8, chunk_size=8, max_frames=64,
            mesh=mesh_arg,
        )
        slots = [pool.start() for _ in utts]
        for start in range(0, 40, 8):
            pool.step({
                s: utts[i][start : start + 8]
                for i, s in enumerate(slots)
                if start < len(utts[i])
            })
        return pool.finalize(slots)

    sharded, single = run(mesh), run(None)
    assert set(sharded) == set(single)
    for slot in single:
        assert sharded[slot][0] == pytest.approx(single[slot][0], rel=1e-5)
        assert sharded[slot][1] == single[slot][1]

    with pytest.raises(ValueError, match="divide evenly"):
        BatchedStreamingComposite.from_models(
            models, penalty=-5.0, num_slots=9, mesh=mesh,
        )


def test_idle_steps_do_not_disturb_state(rng):
    models = _models(seed=9)
    pool = BatchedStreamingComposite.from_models(
        models, penalty=-5.0, num_slots=2, chunk_size=8, max_frames=64,
    )
    utt = _utterances(models, 1, rng)[0]
    a, b = pool.start(), pool.start()
    pool.step({a: utt[:8]})
    # b idles through several steps with other slots active; an empty step
    # is a no-op.
    pool.step({})
    pool.step({a: utt[8:16]})
    pool.step({b: utt[:8]})
    pool.step({b: utt[8:16]})
    ra = pool.finalize([a])[a]
    rb = pool.finalize([b])[b]
    off = _offline(pool.composite, utt[:16])
    assert ra == (pytest.approx(off[0], rel=1e-5), off[1])
    assert rb == (pytest.approx(off[0], rel=1e-5), off[1])


def test_banded_step_offline_exact(rng):
    """The O(S) banded step (auto-selected past 127 states, forceable at
    any S) must stay offline-exact under staggered starts and recycling."""
    models = _models(seed=3, labels=("1", "2", "3", "S"))
    pool = BatchedStreamingComposite.from_models(
        models, penalty=-5.0, num_slots=3, chunk_size=8, max_frames=64,
        step_impl="banded",
    )
    assert pool.step_impl == "banded"
    comp = pool.composite
    utts = _utterances(models, 3, rng)
    slots = [pool.start() for _ in utts]
    cursors = [0] * 3
    step_i = 0
    while any(cursors[i] < len(utts[i]) for i in range(3)):
        feeds = {}
        for i, slot in enumerate(slots):
            if step_i < i or cursors[i] >= len(utts[i]):
                continue
            c = int(rng.integers(1, 9))
            feeds[slot] = utts[i][cursors[i] : cursors[i] + c]
            cursors[i] += len(feeds[slot])
        pool.step(feeds)
        step_i += 1
    results = pool.finalize(slots)
    for i, slot in enumerate(slots):
        score, text = results[slot]
        off_score, off_text = _offline(comp, utts[i])
        assert score == pytest.approx(off_score, rel=1e-5), f"slot {slot}"
        assert text == off_text, f"slot {slot}"
    # Recycle a slot: a fresh stream through the banded step still matches.
    pool.release(slots[0])
    fresh = pool.start()
    u = _utterances(models, 1, rng)[0]
    for lo in range(0, len(u), 8):
        pool.step({fresh: u[lo : lo + 8]})
    score, text = pool.finalize([fresh])[fresh]
    off_score, off_text = _offline(comp, u)
    assert score == pytest.approx(off_score, rel=1e-5)
    assert text == off_text


def test_step_impl_auto_selection():
    models = _models()
    small = BatchedStreamingComposite.from_models(
        models, num_slots=2, max_frames=32
    )
    assert small.step_impl == "dense"  # 11 states: dense is optimal
    import numpy as _np

    big = {}
    rng = _np.random.default_rng(0)
    for i in range(30):
        label = f"w{i:02d}"
        means = rng.normal(size=(5, 4)).astype(_np.float32)
        big[label] = WordHMM(
            label=label, means=means,
            covariances=_np.tile(_np.eye(4, dtype=_np.float32), (5, 1, 1)),
            log_a=uniform_forward_log_a(5),
        )
    pool = BatchedStreamingComposite.from_models(
        big, num_slots=2, max_frames=32
    )
    assert pool.composite.num_states == 150
    assert pool.step_impl == "banded"
    assert pool._ring.dtype == ring_dtype(150)
    with pytest.raises(ValueError):
        BatchedStreamingComposite.from_models(
            models, num_slots=2, step_impl="nope"
        )


def test_bigram_streaming_matches_offline_lm_decode(rng):
    """Online decoding under a bigram LM == the offline bigram decoder:
    the banded step's (W, W) entry matvec carries the same measure."""
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.ops.lm import train_word_bigram

    models = _models(seed=9, labels=("1", "2", "3", "S"))
    bigram = train_word_bigram(
        ["12", "123", "31"], labels=sorted(models), insert_silence=True
    )
    offline = ContinuousDecoder(
        models, penalty=-5.0, bigram=bigram, lm_weight=1.5
    )
    pool = BatchedStreamingComposite(
        offline.composite, num_slots=3, chunk_size=8, max_frames=64,
        bigram=bigram, lm_weight=1.5,
    )
    assert pool.step_impl == "banded"
    utts = _utterances(models, 3, rng)
    slots = [pool.start() for _ in utts]
    for i, s in enumerate(slots):
        for lo in range(0, len(utts[i]), 8):
            pool.step({s: utts[i][lo : lo + 8]})
    streamed = pool.finalize(slots)
    want = offline.predict_batch(utts)
    for i, s in enumerate(slots):
        assert streamed[s][1] == want[i], (i, streamed[s][1], want[i])


def test_quad_streaming_matches_quad_offline(rng):
    """emissions='quad' in the pool: transcripts match the offline
    quad-emissions decoder (same densities, same trellis)."""
    from cs304_tpu.models.decoder import ContinuousDecoder

    models = _models(seed=5, labels=("1", "2", "3", "S"))
    offline = ContinuousDecoder(models, penalty=-5.0, emissions="quad")
    pool = BatchedStreamingComposite(
        offline.composite, num_slots=2, chunk_size=8, max_frames=64,
        step_impl="banded", emissions="quad",
    )
    utts = _utterances(models, 2, rng)
    slots = [pool.start() for _ in utts]
    for i, s in enumerate(slots):
        for lo in range(0, len(utts[i]), 8):
            pool.step({s: utts[i][lo : lo + 8]})
    streamed = pool.finalize(slots)
    want = offline.predict_batch(utts)
    for i, s in enumerate(slots):
        assert streamed[s][1] == want[i]
    with pytest.raises(ValueError):
        BatchedStreamingComposite(
            offline.composite, num_slots=2, step_impl="dense",
            emissions="quad",
        )


@pytest.mark.parametrize("step_impl", ["dense", "banded"])
def test_sparse_upload_bitwise_matches_dense(rng, step_impl):
    """The compact+scatter step (sparse_upload, VERDICT r3 #3) must leave
    alpha and the backpointer ring BIT-IDENTICAL to the dense full-pool
    step under the same staggered feed sequence — the sparse path is an
    upload-shape optimization, not a different decoder."""
    models = _models(seed=11)
    pools = {
        name: BatchedStreamingComposite.from_models(
            models, penalty=-5.0, num_slots=8, chunk_size=8, max_frames=64,
            step_impl=step_impl, sparse_upload=sparse,
        )
        for name, sparse in (("dense", False), ("sparse", True))
    }
    assert pools["sparse"]._sparse and not pools["dense"]._sparse
    utts = _utterances(models, 3, rng)
    slots = {}
    for name, pool in pools.items():
        slots[name] = [pool.start() for _ in utts]
    cursors = [0, 0, 0]
    step_i = 0
    feed_plan = []
    while any(cursors[i] < len(utts[i]) for i in range(3)):
        feeds = {}
        for i in range(3):
            if step_i < i or cursors[i] >= len(utts[i]):
                continue
            c = int(rng.integers(1, 9))
            feeds[i] = utts[i][cursors[i] : cursors[i] + c]
            cursors[i] += len(feeds[i])
        feed_plan.append(feeds)
        step_i += 1
    for feeds in feed_plan:
        for name, pool in pools.items():
            pool.step({slots[name][i]: f for i, f in feeds.items()})
    np.testing.assert_array_equal(
        np.asarray(pools["dense"]._alpha), np.asarray(pools["sparse"]._alpha)
    )
    np.testing.assert_array_equal(
        np.asarray(pools["dense"]._ring), np.asarray(pools["sparse"]._ring)
    )
    fin_d = pools["dense"].finalize(slots["dense"])
    fin_s = pools["sparse"].finalize(slots["sparse"])
    assert fin_d == fin_s


def test_sparse_upload_few_of_many_slots(rng):
    """The motivating serving shape: a large pool where only a few slots
    talk per step — fed slots decode offline-exact, idle slots untouched."""
    models = _models(seed=7)
    pool = BatchedStreamingComposite.from_models(
        models, penalty=-5.0, num_slots=64, chunk_size=8, max_frames=64,
        sparse_upload=True,
    )
    utts = _utterances(models, 3, rng)
    slots = [pool.start() for _ in utts]
    # park an idle slot mid-utterance to prove non-fed rows are untouched
    idle = pool.start()
    pool.step({idle: utts[0][:6]})
    idle_alpha = np.asarray(pool._alpha[idle]).copy()
    for i, slot in enumerate(slots):
        for start in range(0, len(utts[i]), 8):
            pool.step({slot: utts[i][start : start + 8]})
    np.testing.assert_array_equal(np.asarray(pool._alpha[idle]), idle_alpha)
    results = pool.finalize(slots)
    for i, slot in enumerate(slots):
        score, text = results[slot]
        off_score, off_text = _offline(pool.composite, utts[i])
        assert score == pytest.approx(off_score, rel=1e-5)
        assert text == off_text


def test_sparse_auto_picks_per_step(rng):
    """sparse_upload='auto' routes per step: the compact path only when the
    fed set is sparse (<= half the slots after power-of-two padding); a
    fully-fed pool keeps the dense upload (the capacity regime, where the
    gather/scatter is pure overhead). Results are identical either way."""
    models = _models(seed=9)
    pool = BatchedStreamingComposite.from_models(
        models, penalty=-5.0, num_slots=16, chunk_size=8, max_frames=64,
        sparse_upload="auto",
    )
    assert pool._sparse and not pool._sparse_forced
    calls = []
    orig = pool._step_sparse
    pool._step_sparse = lambda checked: (calls.append(len(checked)),
                                         orig(checked))[1]
    utts = _utterances(models, 16, rng)
    slots = [pool.start() for _ in utts]
    pool.step({slots[0]: utts[0][:8]})           # 1 fed -> sparse
    assert calls == [1]
    pool.step({s: utts[i][:8] for i, s in enumerate(slots)})  # all fed
    assert calls == [1]                           # -> dense, no new call
    pool.step({s: utts[i][8:16] for i, s in
               enumerate(slots) if i < 4})        # 4 of 16 -> sparse
    assert calls == [1, 4]


def test_step_fused_partials_match_eager(rng):
    """step(partials=True) pre-dispatches the any-state finalize; the poll
    must return exactly what an eager partial_texts computes, across chunked
    feeds, a stale snapshot (a later step WITHOUT partials), and a released
    + reused slot (stream-id guard)."""
    models = _models()
    pool = BatchedStreamingComposite.from_models(
        models, penalty=-5.0, num_slots=4, chunk_size=8, max_frames=64,
    )
    eager = BatchedStreamingComposite.from_models(
        models, penalty=-5.0, num_slots=4, chunk_size=8, max_frames=64,
    )
    utts = _utterances(models, 2, rng)
    slots = [pool.start() for _ in utts]
    eslots = [eager.start() for _ in utts]
    for off in range(0, max(len(u) for u in utts), 4):
        feeds = {
            slots[i]: u[off : off + 4]
            for i, u in enumerate(utts) if off < len(u)
        }
        pool.step(feeds, partials=True)
        eager.step({eslots[i]: feeds[slots[i]]
                    for i in range(len(utts)) if slots[i] in feeds})
        got = pool.partial_texts(slots)
        want = eager.partial_texts(eslots)
        assert [got[s] for s in slots] == [want[s] for s in eslots]
    # Stale snapshot: advance one slot WITHOUT the fused dispatch — the poll
    # must detect the per-slot fill mismatch and recompute, not serve stale.
    extra = _utterances(models, 1, rng)[0][:4]
    pool.step({slots[0]: extra}, partials=False)
    eager.step({eslots[0]: extra})
    got = pool.partial_texts(slots)
    want = eager.partial_texts(eslots)
    assert [got[s] for s in slots] == [want[s] for s in eslots]
    # Released + reused slot: the pending snapshot belongs to the PREVIOUS
    # stream; the stream-id guard must force a recompute for the new one.
    pool.step({slots[1]: extra[:2]}, partials=True)
    pool.release(slots[1])
    reused = pool.start()
    assert reused == slots[1]
    fresh = _utterances(models, 1, rng)[0][:6]
    pool.step({reused: fresh}, partials=False)
    erel = eager.start()
    eager.release(eslots[1])
    del erel
    e2 = BatchedStreamingComposite.from_models(
        models, penalty=-5.0, num_slots=4, chunk_size=8, max_frames=64,
    )
    es = e2.start()
    e2.step({es: fresh})
    assert pool.partial_texts([reused])[reused] == e2.partial_texts([es])[es]


def test_serving_pool_fused_partials(rng):
    """ServingSessionPool(partials="exact"): after the first partials()
    poll, feed() rounds pre-dispatch hypotheses; polls must stay identical
    to a pool that never fuses (the eager baseline) on the same audio.
    The default pipelined mode must deliver the same final results with
    each poll equal to the current OR previous round's eager hypothesis."""
    from cs304_tpu.data.synthetic import SyntheticTIDigits
    from cs304_tpu.models.train_kmeans import (
        SegmentalKMeansConfig, train_digit_models, train_word_hmm,
    )
    from cs304_tpu.audio.endpointing import SignalSeparation
    from cs304_tpu.ops.mfcc import mfcc_batch
    from cs304_tpu.serving import ServingSessionPool

    corpus = SyntheticTIDigits(num_train_speakers=2, num_test_speakers=1,
                               takes_per_digit=2)
    sep = SignalSeparation()
    feats = {
        l: mfcc_batch(sep.remove_empty_batch(corpus.train_dataset[l]))
        for l in ("1", "2", "3")
    }
    models = train_digit_models(feats, SegmentalKMeansConfig(
        num_states=3, max_iterations=2, length_multiple=32))
    noises = [n for n in sep.get_all_noises() if len(n) >= 9 * sep.frame_size]
    models["S"] = train_word_hmm(
        "S", mfcc_batch(noises),
        SegmentalKMeansConfig(num_states=2, max_iterations=2,
                              length_multiple=32),
    ).model

    audio = np.concatenate([
        np.random.default_rng(0).normal(0, 20.0, 4800).astype(np.float32),
        corpus.sentence_audio("312", 0, jitter_seed=1),
        np.random.default_rng(1).normal(0, 20.0, 6400).astype(np.float32),
    ])
    fused = ServingSessionPool(models, num_slots=4, partials="exact")
    piped = ServingSessionPool(models, num_slots=4)  # default: pipelined
    plain = ServingSessionPool(models, num_slots=4)
    sf, si, sp = fused.open(), piped.open(), plain.open()
    chunk = 1600
    finals_f, finals_i, finals_p = [], [], []
    prev_eager = ""
    for off in range(0, len(audio), chunk):
        piece = audio[off : off + chunk]
        done_f = fused.feed({sf: piece})
        pf = fused.partials()[sf]  # arms fused dispatch from round 1
        done_i = piped.feed({si: piece})
        pi = piped.partials()[si]
        done_p = plain.feed({sp: piece})
        pp = plain._pool.partial_texts(
            [plain._sessions[sp]["slot"]]
        ) if plain._sessions[sp]["slot"] is not None else {}
        finals_f += [r.text for r in done_f.get(sf, [])]
        finals_i += [r.text for r in done_i.get(si, [])]
        finals_p += [r.text for r in done_p.get(sp, [])]
        if plain._sessions[sp]["slot"] is not None:
            eager = pp[plain._sessions[sp]["slot"]]
            assert pf == eager
            # Pipelined: this round's OR the previous round's hypothesis.
            assert pi in (eager, prev_eager), (pi, eager, prev_eager)
            prev_eager = eager
        else:
            assert pf == "" or fused._sessions[sf]["slot"] is not None
            prev_eager = ""
    assert finals_f == finals_p == finals_i and finals_f == ["312"]
