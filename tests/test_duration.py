"""Duration-constrained composite Viterbi (ops/viterbi_duration.py).

Verified two independent ways: min_dur=1/max_dur=inf reproduces the
unconstrained composite decoder on random topologies, and the constrained
semantics match exhaustive path enumeration on tiny HMMs (every state visit
>= min_dur and <= max_dur frames, including the final one).
"""
import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from cs304_tpu.ops.viterbi import (
    composite_transition_matrix,
    viterbi_composite_batch,
)
from cs304_tpu.ops.viterbi_duration import (
    UNBOUNDED,
    duration_arrays,
    viterbi_composite_duration,
    viterbi_composite_duration_batch,
)


def _random_composite(rng, n_words=(2, 5), states=(2, 5)):
    n = int(rng.integers(*n_words))
    counts = [int(rng.integers(*states)) for _ in range(n)]
    s_total = sum(counts)
    log_a = np.full((s_total, s_total), -np.inf, np.float32)
    lowers, uppers, base = [], [], 0
    for c in counts:
        block = np.zeros((c, c))
        for i in range(c):
            row = rng.random(c - i) + 0.1
            block[i, i:] = row / row.sum()
        with np.errstate(divide="ignore"):
            log_a[base : base + c, base : base + c] = np.log(block)
        lowers.append(base)
        uppers.append(base + c - 1)
        base += c
    lower_of = np.zeros(s_total, np.int32)
    for lo in lowers:
        lower_of[lo:] = lo
    entry = np.zeros(s_total, bool)
    entry[lowers] = True
    exit_ = np.zeros(s_total, bool)
    exit_[uppers] = True
    return s_total, log_a, lower_of, entry, exit_


@pytest.mark.parametrize("seed", [31, 32, 33, 34])
def test_unconstrained_matches_plain_decoder(seed):
    rng = np.random.default_rng(seed)
    s, log_a, lower_of, entry, exit_ = _random_composite(rng)
    b, t = 3, 16
    log_b = (rng.normal(size=(b, t, s)) * 3).astype(np.float32)
    lengths = rng.integers(t // 2, t + 1, size=b).astype(np.int32)
    want_s, want_p = viterbi_composite_batch(
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(lower_of),
        jnp.asarray(entry), jnp.asarray(exit_), -7.0, jnp.asarray(lengths),
    )
    got_s, got_p = viterbi_composite_duration_batch(
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(lower_of),
        jnp.asarray(entry), jnp.asarray(exit_), -7.0,
        jnp.ones(s, np.int32), jnp.full(s, UNBOUNDED, np.int32),
        jnp.asarray(lengths), d_cap=4,
    )
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-6, atol=1e-5)
    for i in range(b):
        live = np.arange(t) < lengths[i]
        np.testing.assert_array_equal(
            np.asarray(got_p[i])[live], np.asarray(want_p[i])[live]
        )


def _brute_force_duration(log_b, log_a, lower_of, entry, exit_, penalty,
                          min_dur, max_dur):
    """Exhaustive best path: enumerate all state sequences allowed by the
    composite move rule, filter by per-visit duration bounds."""
    t, s = log_b.shape
    m = np.asarray(composite_transition_matrix(
        jnp.asarray(log_a), jnp.asarray(lower_of), jnp.asarray(entry),
        jnp.asarray(exit_), penalty,
    ))
    diag = np.diagonal(log_a)
    diag_init = np.where(np.isfinite(diag), diag, 0.0)
    starts = np.where(entry)[0]
    best = (-np.inf, None)
    for path in itertools.product(range(s), repeat=t):
        if path[0] not in starts or not exit_[path[-1]]:
            continue
        score = log_b[0, path[0]] + diag_init[path[0]]
        ok = True
        for i in range(1, t):
            a = m[path[i - 1], path[i]]
            if not np.isfinite(a):
                ok = False
                break
            score += a + log_b[i, path[i]]
        if not ok:
            continue
        # Duration filter: run lengths of consecutive identical states.
        run_state, run_len = path[0], 1
        runs = []
        for st in path[1:]:
            if st == run_state:
                run_len += 1
            else:
                runs.append((run_state, run_len))
                run_state, run_len = st, 1
        runs.append((run_state, run_len))
        if any(n < min_dur[st] or n > max_dur[st] for st, n in runs):
            continue
        if score > best[0]:
            best = (score, np.asarray(path))
    return best


@pytest.mark.parametrize("seed", [41, 42, 43])
@pytest.mark.parametrize("dur", [(2, UNBOUNDED), (1, 3), (2, 4)])
def test_matches_brute_force(seed, dur):
    rng = np.random.default_rng(seed)
    counts = [2, 3]
    s = sum(counts)
    log_a = np.full((s, s), -np.inf, np.float32)
    base = 0
    for c in counts:
        block = rng.random((c, c)) + 0.1
        block = np.triu(block)
        block /= block.sum(axis=1, keepdims=True)
        with np.errstate(divide="ignore"):
            log_a[base : base + c, base : base + c] = np.log(block)
        base += c
    lower_of = np.array([0, 0, 2, 2, 2], np.int32)
    entry = np.array([1, 0, 1, 0, 0], bool)
    exit_ = np.array([0, 1, 0, 0, 1], bool)
    t = 7
    log_b = np.round(rng.normal(size=(t, s)) * 3, 2).astype(np.float32)
    mn, mx = dur
    min_dur = np.full(s, mn, np.int32)
    max_dur = np.full(s, mx, np.int32)

    want_score, want_path = _brute_force_duration(
        log_b.astype(np.float64), log_a.astype(np.float64), lower_of,
        entry, exit_, -4.0, min_dur, max_dur,
    )
    got_score, got_path = viterbi_composite_duration(
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(lower_of),
        jnp.asarray(entry), jnp.asarray(exit_), -4.0,
        jnp.asarray(min_dur), jnp.asarray(max_dur), t,
        d_cap=max(int(mn), int(mx) if mx < UNBOUNDED else 4, 4),
        quirk_backtrace=False,
    )
    if want_path is None:
        assert not np.isfinite(np.asarray(got_score))
        return
    assert np.asarray(got_score) == pytest.approx(want_score, abs=1e-3)
    np.testing.assert_array_equal(np.asarray(got_path), want_path)


def test_infeasible_gives_neg_inf():
    """Too few frames for the duration floor -> -inf score."""
    rng = np.random.default_rng(3)
    s, log_a, lower_of, entry, exit_ = _random_composite(
        rng, n_words=(2, 3), states=(3, 4)
    )
    t = 3
    log_b = rng.normal(size=(1, t, s)).astype(np.float32)
    scores, _ = viterbi_composite_duration_batch(
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(lower_of),
        jnp.asarray(entry), jnp.asarray(exit_), -4.0,
        jnp.full(s, 4, np.int32), jnp.full(s, UNBOUNDED, np.int32),
        jnp.asarray([t], np.int32), d_cap=4,
    )
    assert not np.isfinite(np.asarray(scores)[0])


def test_duration_arrays_knobs():
    from cs304_tpu.models.hmm import WordHMM, stack_word_models, \
        uniform_forward_log_a

    def mk(label, n):
        return WordHMM(
            label=label, means=np.zeros((n, 2), np.float32),
            covariances=np.tile(np.eye(2, dtype=np.float32), (n, 1, 1)),
            log_a=uniform_forward_log_a(n),
        )

    comp = stack_word_models([mk("A", 3), mk("B", 4), mk("S", 3)])
    min_dur, max_dur, d_cap = duration_arrays(comp, 2, None)
    assert (min_dur[0:3] == 2).all() and (min_dur[3:7] == 2).all()
    assert (min_dur[7:10] == 1).all()  # silence unconstrained by default
    assert (max_dur == UNBOUNDED).all()
    assert d_cap >= 2

    min_dur, max_dur, d_cap = duration_arrays(
        comp, {"A": 3}, {"A": 6}, constrain_silence=True
    )
    assert (min_dur[0:3] == 3).all() and (max_dur[0:3] == 6).all()
    assert (min_dur[3:7] == 1).all()
    assert d_cap == 6

    with pytest.raises(ValueError):
        duration_arrays(comp, 0)
    with pytest.raises(ValueError):
        duration_arrays(comp, 3, 2)
    single = stack_word_models([mk("A", 3), mk("X", 1)])
    with pytest.raises(ValueError):
        duration_arrays(single, 2)


def test_decoder_duration_api(rng):
    """Decoder-level: constraints remove a 2-frame spurious transit; an
    infeasibly short utterance falls back to the unconstrained result."""
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a

    def word(label, center):
        means = np.zeros((3, 2), np.float32)
        means[:, 0] = center
        means[:, 1] = np.arange(3)
        return WordHMM(
            label=label, means=means,
            covariances=np.tile(np.eye(2, dtype=np.float32) * 0.4,
                                (3, 1, 1)),
            log_a=uniform_forward_log_a(3),
        )

    models = {"A": word("A", 0.0), "B": word("B", 6.0)}
    dec = ContinuousDecoder(models, penalty=-2.0)

    # Mostly word A, with a 2-frame B-like blip mid-way: the weak penalty
    # lets the unconstrained decoder insert B (2 frames traverse a 3-state
    # word via the skip); min_duration=2 needs >= 4 frames per visit set.
    frames = []
    for st in (0, 0, 1, 1):
        frames.append([0.0, st])
    frames += [[6.0, 0.5], [6.0, 1.5]]
    for st in (1, 2, 2):
        frames.append([0.0, st])
    feats = (np.asarray(frames, np.float32)
             + rng.normal(0, 0.03, (len(frames), 2)).astype(np.float32))
    plain = dec.predict_batch([feats])[0]
    constrained = dec.predict_batch_duration([feats], min_duration=2)[0]
    assert plain == "ABA"
    assert constrained == "A"

    # Fallback: 2 frames cannot satisfy min_duration=4 -> unconstrained.
    short = np.asarray([[0.0, 0.0], [0.0, 2.0]], np.float32)
    out = dec.predict_batch_duration([short], min_duration=4)[0]
    assert out == dec.predict_batch([short])[0]
