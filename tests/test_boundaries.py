"""path_to_labels semantics vs the reference's ModelBoundary.get_labels
(model_boundary.py:107-139): run-length walk, repeated words, silence skip."""
import numpy as np

from cs304_tpu.models.hmm import WordHMM, stack_word_models, uniform_forward_log_a


def mk(label, s=3, d=2):
    return WordHMM(
        label=label,
        means=np.zeros((s, d), np.float32),
        covariances=np.tile(np.eye(d, dtype=np.float32), (s, 1, 1)),
        log_a=uniform_forward_log_a(s),
    )


def composite():
    # words: A states 0-2, S states 3-5, B states 6-8
    return stack_word_models([mk("A"), mk("S"), mk("B")], penalty=-5.0)


def test_simple_sequence():
    c = composite()
    path = np.array([0, 0, 1, 2, 3, 4, 5, 6, 7, 8])
    assert c.path_to_labels(path) == ["A", "B"]
    assert c.path_to_labels(path, skip_silence=False) == ["A", "S", "B"]


def test_repeated_word_via_exit_entry():
    c = composite()
    # A twice: ... exit state 2 immediately followed by entry state 0
    path = np.array([0, 1, 2, 0, 1, 2, 6, 7, 8])
    assert c.path_to_labels(path) == ["A", "A", "B"]


def test_same_word_revisit_without_exit_entry_not_counted():
    c = composite()
    # Within-word movement only: one A
    path = np.array([0, 0, 1, 1, 2, 2])
    assert c.path_to_labels(path) == ["A"]


def test_silence_only_path_is_empty():
    c = composite()
    path = np.array([3, 4, 5, 5, 5])
    assert c.path_to_labels(path) == []
    assert c.path_to_labels(path, skip_silence=False) == ["S"]


def test_word_state_range():
    c = composite()
    assert c.word_state_range("A") == (0, 3)
    assert c.word_state_range("S") == (3, 6)
    assert c.word_state_range("B") == (6, 9)
