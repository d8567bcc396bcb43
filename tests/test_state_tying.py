"""State-level parameter tying in the embedded trainer (senone plumbing).

The tie maps pool (label, state) emission statistics — and optionally
per-label transition counts — before every M-step, so tied slots train as
one shared distribution (models/train_fused._pool_slots). Exactness oracle:
fully tying two labels that start from identical parameters must equal
training ONE merged label on the union of their data, because identical
parameters give identical sentence trellises and the pooled statistics are
the merged label's statistics by construction — inductively over iterations.

No reference equivalent (the reference ties nothing below the word level);
this is the shared-state plumbing for phonetic-decision-tree senones.
"""
import numpy as np
import pytest

from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a
from cs304_tpu.models.train_continuous import (
    ContinuousTrainConfig,
    ContinuousTrainer,
)

D = 5


def _models(rng, labels=("1", "2", "3", "S"), clone_12=True):
    out = {}
    for label in labels:
        s = 3 if label == "S" else 4
        if clone_12 and label == "2":
            src = out["1"]
            out[label] = WordHMM(
                label=label, means=src.means.copy(),
                covariances=src.covariances.copy(), log_a=src.log_a.copy(),
            )
            continue
        means = rng.normal(size=(s, D)).astype(np.float32) * 3
        a = rng.normal(size=(s, D, 3)).astype(np.float32) * 0.2
        covs = a @ np.transpose(a, (0, 2, 1)) + 0.4 * np.eye(D, dtype=np.float32)
        out[label] = WordHMM(
            label=label, means=means, covariances=covs,
            log_a=uniform_forward_log_a(s),
        )
    return out


def _copy(models):
    return {
        k: WordHMM(label=v.label, means=v.means.copy(),
                   covariances=v.covariances.copy(), log_a=v.log_a.copy())
        for k, v in models.items()
    }


def _corpus(models, transcripts, n_per, seed=1, spread=0.5):
    r = np.random.default_rng(seed)
    labeled = {}
    for tr in transcripts:
        sentence = "S" + "S".join(tr) + "S"
        feats = []
        for _ in range(n_per):
            frames = []
            for w in sentence:
                m = models[w]
                for si in range(m.num_states):
                    n = r.integers(2, 5)
                    frames.append(
                        m.means[si]
                        + r.normal(0, spread, size=(n, D)).astype(np.float32)
                    )
            feats.append(np.concatenate(frames).astype(np.float32))
        labeled[tr] = feats
    return labeled


def _cfg(**kw):
    return ContinuousTrainConfig(
        max_iterations=kw.pop("max_iterations", 4),
        silence_bootstrap=False, cov_reg=0.05, length_multiple=16, **kw,
    )


def _full_tie_12(models):
    """Every state of '1' tied to the same state of '2', + transitions."""
    n = models["1"].num_states
    return (
        {("1", s): ("tie", s) for s in range(n)}
        | {("2", s): ("tie", s) for s in range(n)},
        {"1": "tie", "2": "tie"},
    )


@pytest.mark.parametrize("update", ["viterbi", "baum_welch"])
def test_full_tie_equals_merged_label(rng, update):
    """Tying 1~2 (identical inits) == training a merged label on both
    data sets, for hard-count and soft-count updates."""
    models = _models(rng)
    labeled = _corpus(models, ["13", "23", "123"], 4)

    state_ties, trans_ties = _full_tie_12(models)
    tr_tied = ContinuousTrainer(
        _copy(models), _cfg(update=update),
        state_ties=state_ties, transition_ties=trans_ties,
    )
    n_tied = tr_tied.train(labeled)

    merged_models = {k: v for k, v in _copy(models).items() if k != "2"}
    merged = {
        "13": list(labeled["13"]) + list(labeled["23"]),
        "113": labeled["123"],
    }
    tr_merged = ContinuousTrainer(merged_models, _cfg(update=update))
    n_merged = tr_merged.train(merged)

    assert n_tied == n_merged
    got = tr_tied.models()
    want = tr_merged.models()
    for lab in ("1", "2"):
        np.testing.assert_allclose(
            got[lab].means, want["1"].means, atol=3e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            got[lab].covariances, want["1"].covariances, atol=3e-5, rtol=1e-4
        )
        fin = np.isfinite(want["1"].log_a)
        assert (np.isfinite(got[lab].log_a) == fin).all()
        np.testing.assert_allclose(
            got[lab].log_a[fin], want["1"].log_a[fin], atol=3e-5, rtol=1e-4
        )
    for lab in ("3", "S"):
        np.testing.assert_allclose(
            got[lab].means, want[lab].means, atol=3e-5, rtol=1e-4
        )


def test_partial_tie_shares_exactly_and_only_the_tied_slot(rng):
    """Tie ONLY state 1 of '1' and '2' (different inits): that slot ends
    bitwise-shared, the other slots differ."""
    models = _models(rng, clone_12=False)
    labeled = _corpus(models, ["12", "21"], 5)
    tr = ContinuousTrainer(
        _copy(models), _cfg(),
        state_ties={("1", 1): "shared", ("2", 1): "shared"},
    )
    tr.train(labeled)
    got = tr.models()
    # The pooled estimate is computed once and gathered to both slots.
    np.testing.assert_array_equal(got["1"].means[1], got["2"].means[1])
    np.testing.assert_array_equal(
        got["1"].covariances[1], got["2"].covariances[1]
    )
    assert not np.allclose(got["1"].means[0], got["2"].means[0])
    # Transitions were NOT tied.
    assert not np.array_equal(got["1"].log_a, got["2"].log_a)


def test_fused_matches_legacy_with_ties(rng):
    models = _models(rng, clone_12=False)
    labeled = _corpus(models, ["12", "321"], 5, seed=3)
    ties = {("1", 0): "a", ("2", 0): "a", ("1", 2): "b", ("3", 1): "b"}
    tts = {"1": "g", "2": "g"}
    results = []
    for fused in (False, True):
        tr = ContinuousTrainer(
            _copy(models), _cfg(fused=fused),
            state_ties=ties, transition_ties=tts,
        )
        n = tr.train(labeled)
        results.append((n, tr))
    (n_legacy, tr_legacy), (n_fused, tr_fused) = results
    assert n_legacy == n_fused
    for name in ("means_g", "covs_g", "log_a_g"):
        x, y = getattr(tr_legacy, name), getattr(tr_fused, name)
        fin = np.isfinite(x)
        assert (fin == np.isfinite(y)).all(), name
        np.testing.assert_allclose(
            x[fin], y[fin], atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_mesh_tied_matches_single_device(rng):
    import jax
    from jax.sharding import Mesh

    from cs304_tpu.parallel.data_parallel import DATA_AXIS

    models = _models(rng)
    labeled = _corpus(models, ["13", "23"], 8, seed=7)
    state_ties, trans_ties = _full_tie_12(models)
    tr_one = ContinuousTrainer(
        _copy(models), _cfg(), state_ties=state_ties,
        transition_ties=trans_ties,
    )
    tr_one.train(labeled)
    mesh = Mesh(np.array(jax.devices()[:4]), (DATA_AXIS,))
    tr_mesh = ContinuousTrainer(
        _copy(models), _cfg(), mesh=mesh, state_ties=state_ties,
        transition_ties=trans_ties,
    )
    tr_mesh.train(labeled)
    for name in ("means_g", "covs_g", "log_a_g"):
        x, y = getattr(tr_one, name), getattr(tr_mesh, name)
        fin = np.isfinite(x)
        assert (fin == np.isfinite(y)).all(), name
        np.testing.assert_allclose(
            x[fin], y[fin], atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_untied_trainer_is_unchanged(rng):
    """state_ties=None must leave results identical to a pre-tying trainer
    (the pooling is skipped entirely on the single-device path)."""
    models = _models(rng, clone_12=False)
    labeled = _corpus(models, ["12"], 4, seed=9)
    tr_a = ContinuousTrainer(_copy(models), _cfg())
    tr_b = ContinuousTrainer(_copy(models), _cfg(), state_ties=None,
                             transition_ties={})
    assert tr_b._tie_flat is None and tr_b._trans_tie is None
    tr_a.train(labeled)
    tr_b.train(labeled)
    np.testing.assert_array_equal(tr_a.means_g, tr_b.means_g)


def test_tie_validation():
    rng = np.random.default_rng(0)
    models = _models(rng)
    with pytest.raises(ValueError, match="unknown label"):
        ContinuousTrainer(_copy(models), _cfg(),
                          state_ties={("9", 0): "x"})
    with pytest.raises(ValueError, match="out of range"):
        ContinuousTrainer(_copy(models), _cfg(),
                          state_ties={("1", 7): "x"})
    with pytest.raises(ValueError, match="equal state counts"):
        ContinuousTrainer(_copy(models), _cfg(),
                          transition_ties={"1": "g", "S": "g"})
