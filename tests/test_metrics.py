"""WER metrics (reporting/metrics.py): edit counts, alignment, aggregates.

The reference only counts exact sequence matches
(scripts/project5_test_ndigits_no_sil.py:44-49); these verify the standard
WER decomposition this framework adds on top.
"""
import pytest

from cs304_tpu.reporting.metrics import (
    EditOps,
    align,
    corpus_wer,
    edit_ops,
    wer,
)


def test_exact_match():
    assert edit_ops("1234", "1234") == EditOps(0, 0, 0)
    assert wer("1234", "1234") == 0.0
    assert all(op == "match" for op, _r, _h in align("1234", "1234"))


def test_substitution():
    assert edit_ops("1234", "1934") == EditOps(1, 0, 0)
    assert wer("1234", "1934") == pytest.approx(0.25)


def test_insertion_and_deletion():
    assert edit_ops("123", "1233") == EditOps(0, 1, 0)
    assert edit_ops("123", "13") == EditOps(0, 0, 1)
    # hyp empty: all deletions; ref empty: all insertions over denom 1.
    assert edit_ops("123", "") == EditOps(0, 0, 3)
    assert wer("123", "") == 1.0
    assert edit_ops("", "12") == EditOps(0, 2, 0)
    assert wer("", "12") == 2.0


def test_mixed_alignment():
    # ref 1 2 3 4 / hyp 9 2 4 7: cost-3 paths exist both as 3 subs and as
    # sub+del+ins around two matches; only the total is canonical.
    ops = edit_ops("1234", "9247")
    assert ops.total == 3
    al = align("1234", "9247")
    assert sum(op != "match" for op, _r, _h in al) == 3
    # Alignment round-trips both sequences.
    assert [r for _op, r, _h in al if r is not None] == list("1234")
    assert [h for _op, _r, h in al if h is not None] == list("9247")


def test_wer_vs_levenshtein_bruteforce():
    """Edit totals match a brute-force recursive Levenshtein on short pairs."""
    import functools
    import itertools

    @functools.lru_cache(maxsize=None)
    def lev(a, b):
        if not a:
            return len(b)
        if not b:
            return len(a)
        return min(
            lev(a[1:], b[1:]) + (a[0] != b[0]),
            lev(a[1:], b) + 1,
            lev(a, b[1:]) + 1,
        )

    vocab = "012"
    for ref in ["", "0", "012", "0120", "2101"]:
        for n in range(4):
            for hyp in itertools.product(vocab, repeat=n):
                hyp = "".join(hyp)
                assert edit_ops(ref, hyp).total == lev(ref, hyp), (ref, hyp)


def test_corpus_wer_pools_edits_not_rates():
    stats = corpus_wer([
        (list("1234567"), list("1234567")),   # 0 edits / 7 words
        (list("1"), list("19")),              # 1 insertion / 1 word
    ])
    # Pooled: 1 edit over 8 ref words, NOT mean(0, 1.0).
    assert stats["wer"] == pytest.approx(1 / 8)
    assert stats["insertions"] == 1
    assert stats["substitutions"] == 0
    assert stats["deletions"] == 0
    assert stats["ref_words"] == 8
