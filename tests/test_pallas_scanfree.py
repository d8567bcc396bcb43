"""Parity tests for the scan-free Pallas trellis pair (forward + backtrace).

The kernels must be BITWISE identical to ops.viterbi.viterbi_composite_batch_fast
(same candidate order, first-max tie-breaks, live masking, backtrace quirk) —
on TPU this was verified exactly at B=1024 (scores max-abs-diff 0.0, paths
array_equal); here the same assertion runs in interpreter mode on small shapes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cs304_tpu.models.hmm import WordHMM, stack_word_models, uniform_forward_log_a
from cs304_tpu.ops.pallas.trellis_scanfree import viterbi_composite_batch_scanfree
from cs304_tpu.ops.viterbi import viterbi_composite_batch_fast


def _composite(num_words, states_per_word, seed=0):
    rng = np.random.default_rng(seed)
    models = []
    for i in range(num_words):
        s = states_per_word[i % len(states_per_word)]
        means = rng.normal(size=(s, 4)).astype(np.float32)
        covs = np.tile(np.eye(4, dtype=np.float32), (s, 1, 1))
        models.append(WordHMM(label=str(i), means=means, covariances=covs,
                              log_a=uniform_forward_log_a(s)))
    return stack_word_models(models, penalty=-25.0)


@pytest.mark.parametrize("b,t,words,spw", [
    (16, 33, 3, (5,)),
    (8, 17, 4, (5, 3)),       # mixed word sizes incl. silence-like 3-state
    (32, 50, 12, (5, 5, 3)),  # the flagship 58-state shape
    (8, 20, 30, (5, 5, 3)),   # 130 states -> 2 lane tiles (multi-tile path)
    (16, 18, 60, (5, 5, 3)),  # 260 states -> 3 lane tiles
])
def test_scanfree_matches_fast(b, t, words, spw):
    comp = _composite(words, spw)
    rng = np.random.default_rng(1)
    log_b = jnp.asarray(rng.normal(size=(b, t, comp.num_states)).astype(np.float32) * 3)
    lengths = jnp.asarray(rng.integers(3, t + 1, size=b).astype(np.int32))
    args = (jnp.asarray(comp.log_a), jnp.asarray(comp.lower_of_state),
            jnp.asarray(comp.is_entry), jnp.asarray(comp.is_exit),
            jnp.float32(comp.penalty), lengths)
    ref_s, ref_p = viterbi_composite_batch_fast(log_b, *args)
    got_s, got_p = viterbi_composite_batch_scanfree(log_b, *args)
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(ref_s))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))


def test_scanfree_standard_backtrace():
    comp = _composite(3, (5,))
    rng = np.random.default_rng(2)
    log_b = jnp.asarray(rng.normal(size=(8, 21, comp.num_states)).astype(np.float32))
    lengths = jnp.asarray(np.full(8, 21, np.int32))
    args = (jnp.asarray(comp.log_a), jnp.asarray(comp.lower_of_state),
            jnp.asarray(comp.is_entry), jnp.asarray(comp.is_exit),
            jnp.float32(comp.penalty), lengths)
    ref = viterbi_composite_batch_fast(log_b, *args, quirk_backtrace=False)
    got = viterbi_composite_batch_scanfree(log_b, *args, quirk_backtrace=False)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))


def test_scanfree_fallback_shapes():
    """Batch not divisible by 8 falls back to the scan path transparently."""
    comp = _composite(2, (5,))
    rng = np.random.default_rng(3)
    log_b = jnp.asarray(rng.normal(size=(5, 12, comp.num_states)).astype(np.float32))
    lengths = jnp.asarray(np.array([12, 7, 3, 12, 9], np.int32))
    args = (jnp.asarray(comp.log_a), jnp.asarray(comp.lower_of_state),
            jnp.asarray(comp.is_entry), jnp.asarray(comp.is_exit),
            jnp.float32(comp.penalty), lengths)
    ref = viterbi_composite_batch_fast(log_b, *args)
    got = viterbi_composite_batch_scanfree(log_b, *args)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))


def test_decoder_scanfree_backend():
    """End-to-end through ContinuousDecoder(backend='scanfree')."""
    from cs304_tpu.models.decoder import ContinuousDecoder

    rng = np.random.default_rng(4)
    models = {}
    for lab in ("1", "2", "S"):
        s = 3 if lab == "S" else 5
        means = rng.normal(size=(s, 39)).astype(np.float32) * 2
        covs = np.tile(np.eye(39, dtype=np.float32), (s, 1, 1))
        models[lab] = WordHMM(label=lab, means=means, covariances=covs,
                              log_a=uniform_forward_log_a(s))
    clips = [rng.normal(size=(40, 39)).astype(np.float32) for _ in range(8)]
    ref = ContinuousDecoder(models, penalty=-50.0, backend="fast").predict_batch(clips)
    got = ContinuousDecoder(models, penalty=-50.0, backend="scanfree").predict_batch(clips)
    assert got == ref


def test_decoder_auto_backend_resolves():
    """backend='auto' (the default) resolves by platform: 'fast' off-TPU,
    'scanfree' on TPU — and never reaches the Pallas path with an LM/beam."""
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.ops.lm import train_word_bigram

    rng = np.random.default_rng(4)
    models = {}
    for lab in ("1", "2", "S"):
        s = 3 if lab == "S" else 5
        means = rng.normal(size=(s, 39)).astype(np.float32) * 2
        covs = np.tile(np.eye(39, dtype=np.float32), (s, 1, 1))
        models[lab] = WordHMM(label=lab, means=means, covariances=covs,
                              log_a=uniform_forward_log_a(s))
    assert ContinuousDecoder(models).backend == (
        "scanfree" if jax.default_backend() == "tpu" else "fast"
    )
    assert ContinuousDecoder(models, beam=50.0).backend == "fast"
    lm = train_word_bigram([("1", "2"), ("2", "1")], ["1", "2", "S"])
    assert ContinuousDecoder(models, bigram=lm).backend == "fast"


def test_decoder_scanfree_quad_fused_route():
    """backend='scanfree' + emissions='quad' rides the fully fused Pallas
    pipeline (emission kernel -> scan-free trellis); predictions must agree
    with the unfused quad + banded-fast decode."""
    from cs304_tpu.models.decoder import ContinuousDecoder

    rng = np.random.default_rng(7)
    models = {}
    for lab in ("1", "2", "3", "S"):
        s = 3 if lab == "S" else 5
        means = rng.normal(size=(s, 39)).astype(np.float32) * 2
        covs = np.tile(np.eye(39, dtype=np.float32), (s, 1, 1))
        models[lab] = WordHMM(label=lab, means=means, covariances=covs,
                              log_a=uniform_forward_log_a(s))
    clips = [rng.normal(size=(40, 39)).astype(np.float32) for _ in range(8)]
    ref = ContinuousDecoder(models, penalty=-50.0, backend="fast",
                            emissions="quad").predict_batch(clips)
    got = ContinuousDecoder(models, penalty=-50.0, backend="scanfree",
                            emissions="quad").predict_batch(clips)
    assert got == ref


@pytest.mark.slow
def test_scanfree_past_round4_cap():
    """S=4203 (841 words) exceeded the round-4 MAX_STATES=4096 and silently
    fell back; the split forward/backtrace batch tiles lift the cap to 8192,
    so this shape must ride the kernels bitwise-exactly."""
    from cs304_tpu.ops.pallas.trellis_scanfree import (
        MAX_STATES,
        _choose_tiles,
    )

    # The exact 1000-word shape (5003 states) is heavy for an interpreted
    # CPU test; 969 mixed-size words (> old cap 4096) exercises the same
    # multi-tile math.
    comp = _composite(969, (5, 5, 3))
    s = comp.num_states
    assert 4096 < s <= MAX_STATES
    s_pad = -(-s // 128) * 128
    tiles = _choose_tiles(8, 16, s_pad)
    assert tiles is not None, "shape must tile, not fall back"
    tile_f, tile_bt, tb = tiles
    assert 16 * tile_f * tb * s_pad <= 64 * 2**20
    assert 8 * tile_bt * tb * s_pad <= 64 * 2**20
    assert tile_bt in (256, 128, 8)

    rng = np.random.default_rng(7)
    b, t = 8, 12
    log_b = jnp.asarray(rng.normal(size=(b, t, s)).astype(np.float32) * 3)
    lengths = jnp.asarray(rng.integers(3, t + 1, size=b).astype(np.int32))
    args = (jnp.asarray(comp.log_a), jnp.asarray(comp.lower_of_state),
            jnp.asarray(comp.is_entry), jnp.asarray(comp.is_exit),
            jnp.float32(comp.penalty), lengths)
    ref_s, ref_p = viterbi_composite_batch_fast(log_b, *args)
    got_s, got_p = viterbi_composite_batch_scanfree(log_b, *args)
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(ref_s))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))


def test_scanfree_cap_boundary():
    """The fallback boundary itself: within MAX_STATES the tiler must accept
    every 128-multiple width; past it the public entry must fall back (and
    still be correct, which test_scanfree_fallback_shapes covers for the
    other fallback causes)."""
    from cs304_tpu.ops.pallas.trellis_scanfree import (
        MAX_STATES,
        _choose_tiles,
    )

    for s_pad in (128, 4096, 5120, 8192):
        assert _choose_tiles(512, 151, s_pad) is not None, s_pad
        tile_f, tile_bt, tb = _choose_tiles(512, 151, s_pad)
        assert 512 % tile_f == 0 and 512 % tile_bt == 0
        assert 16 * tile_f * tb * s_pad <= 64 * 2**20
        assert 8 * tile_bt * tb * s_pad <= 64 * 2**20
    assert MAX_STATES == 8192
