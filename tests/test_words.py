"""Parity of the device-side word compaction (ops/words.py) with the host
path walk (CompositeHMM.path_to_labels), which itself mirrors the reference's
ModelBoundary.get_labels (model_boundary.py:107-139)."""
import numpy as np
import pytest

from cs304_tpu.ops.words import ids_to_strings, words_from_path, words_from_paths


@pytest.fixture(scope="module")
def comp():
    from __graft_entry__ import _flagship_params

    return _flagship_params()


def _args(comp, skip_silence=True):
    import jax.numpy as jnp

    sil = comp.labels.index("S") if (skip_silence and "S" in comp.labels) else -1
    return (
        jnp.asarray(comp.word_of_state.astype(np.int32)),
        jnp.asarray(comp.lowers.astype(np.int32)),
        jnp.asarray(comp.uppers.astype(np.int32)),
        sil,
    )


def _host(comp, path, skip_silence=True):
    return "".join(comp.path_to_labels(np.asarray(path), skip_silence))


def test_fuzz_parity_vs_host(comp):
    rng = np.random.default_rng(0)
    s = comp.num_states
    for skip in (True, False):
        wos, lo, up, sil = _args(comp, skip)
        for trial in range(40):
            t = int(rng.integers(1, 60))
            # Mix arbitrary jumps with runs so re-entries/word changes occur.
            path = rng.integers(0, s, t).astype(np.int32)
            reps = rng.integers(1, 4, t)
            path = np.repeat(path, reps)[:t].astype(np.int32)
            ids, n = words_from_path(path, len(path), wos, lo, up, sil,
                                     max_words=64)
            got = ids_to_strings(ids[None], np.array([n]), comp.labels)[0]
            assert got == _host(comp, path, skip), (trial, skip, path)


def test_repeated_word_reentry(comp):
    """exit->entry of the same word emits the word again."""
    wos, lo, up, sil = _args(comp)
    w = 3
    path = np.array(
        [comp.lowers[w], comp.uppers[w], comp.lowers[w], comp.uppers[w]],
        np.int32,
    )
    ids, n = words_from_path(path, 4, wos, lo, up, sil)
    assert int(n) == 2
    assert ids_to_strings(ids[None], [n], comp.labels)[0] == (
        comp.labels[w] * 2
    )


def test_padding_masked(comp):
    """Frames past `length` never emit, whatever garbage they hold."""
    wos, lo, up, sil = _args(comp)
    path = np.array([0, 0, 1, 7, 7, 12, 25, 33], np.int32)
    full_ids, full_n = words_from_path(path, 3, wos, lo, up, sil)
    ref = _host(comp, path[:3])
    assert ids_to_strings(full_ids[None], [full_n], comp.labels)[0] == ref


def test_truncation_detectable(comp):
    wos, lo, up, sil = _args(comp)
    # Alternate between two words' entry states -> one emission per frame.
    path = np.tile(
        np.array([comp.lowers[0], comp.lowers[1]], np.int32), 8
    )
    ids, n = words_from_path(path, len(path), wos, lo, up, sil, max_words=4)
    assert int(n) == len(path)
    with pytest.raises(ValueError, match="truncated"):
        ids_to_strings(ids[None], [n], comp.labels)


def test_batched_matches_single(comp):
    rng = np.random.default_rng(1)
    wos, lo, up, sil = _args(comp)
    b, t = 5, 37
    paths = rng.integers(0, comp.num_states, (b, t)).astype(np.int32)
    lengths = rng.integers(1, t + 1, b).astype(np.int32)
    ids_b, n_b = words_from_paths(paths, lengths, wos, lo, up, sil)
    for i in range(b):
        ids_1, n_1 = words_from_path(paths[i], lengths[i], wos, lo, up, sil)
        np.testing.assert_array_equal(np.asarray(ids_b[i]), np.asarray(ids_1))
        assert int(n_b[i]) == int(n_1)


def test_int8_output(comp):
    import jax.numpy as jnp

    wos, lo, up, sil = _args(comp)
    path = np.array([0, 5, 10, 15], np.int32)
    ids, n = words_from_path(path, 4, wos, lo, up, sil, out_dtype=jnp.int8)
    assert np.asarray(ids).dtype == np.int8
    assert ids_to_strings(ids[None], [n], comp.labels)[0] == _host(
        comp, path
    )


def _flagship_models(seed: int = 0):
    from cs304_tpu.data.ti_digits import DIGIT_LABELS
    from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a

    rng = np.random.default_rng(seed)
    models = []
    for label in sorted(list(DIGIT_LABELS) + ["S"]):
        s = 3 if label == "S" else 5
        means = rng.normal(size=(s, 39)).astype(np.float32)
        a = rng.normal(size=(s, 39, 8)).astype(np.float32) * 0.1
        covs = a @ np.transpose(a, (0, 2, 1)) + 0.5 * np.eye(39, dtype=np.float32)
        models.append(
            WordHMM(label=label, means=means, covariances=covs,
                    log_a=uniform_forward_log_a(s))
        )
    return models


def test_decoder_end_to_end_parity(comp):
    """Real decodes: device compaction == predict_batch's host walk."""
    import jax.numpy as jnp

    from cs304_tpu.models.decoder import ContinuousDecoder

    rng = np.random.default_rng(2)
    dec = ContinuousDecoder(_flagship_models(), penalty=-100.0)
    feats = [
        rng.normal(size=(int(rng.integers(20, 70)), 39)).astype(np.float32)
        for _ in range(6)
    ]
    want = dec.predict_batch(feats)
    scores, paths, lengths = dec.viterbi_batch(feats)
    wos, lo, up, sil = _args(comp)
    ids, n = words_from_paths(
        jnp.asarray(paths), jnp.asarray(lengths), wos, lo, up, sil
    )
    got = ids_to_strings(ids, n, comp.labels)
    assert got == want
