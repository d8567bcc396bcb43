"""Pruned word lattices from the k-best composite forward.

The reference's richest decode output is a single Viterbi string
(hidden_markov_model.py:573-581). Round 1 added n-best strings
(ops/nbest.py); this module adds the standard serving artifact between the
two: a word LATTICE — time-aligned word arcs with scores, deduped across
hypotheses — the input format for downstream rescoring (language-model
re-weighting, confusion networks, keyword search).

Construction is n-best-based ("pruned lattice"): the k-best beam forward
(ops/nbest.kbest_composite_forward) produces distinct state paths; each path
is segmented into word spans using the composite's boundary vectors (the
same emit rules as CompositeHMM.path_to_labels, model_boundary.py:131-135
in the reference), and identical (start, end, word) spans merge keeping the
best full-path score. Arcs therefore carry the score of the best COMPLETE
hypothesis through them — the quantity confusion-network pruning wants.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np


@dataclass(frozen=True)
class LatticeArc:
    start: int   # first frame of the word instance (inclusive)
    end: int     # one past the last frame (exclusive)
    label: str
    score: float  # best full-path score among hypotheses using this arc


@dataclass
class Lattice:
    num_frames: int
    arcs: List[LatticeArc] = field(default_factory=list)
    silence_label: str | None = "S"

    def sorted_arcs(self) -> List[LatticeArc]:
        return sorted(self.arcs, key=lambda a: (a.start, a.end, a.label))

    def contains(self, transcript: Sequence[str],
                 skip_silence: bool = True) -> bool:
        """Oracle check: is `transcript` spelled by some chain of abutting
        arcs from frame 0 to num_frames (silence arcs free when
        skip_silence)? DP over (frame, words matched)."""
        words = list(transcript)
        by_start: Dict[int, List[LatticeArc]] = {}
        for a in self.arcs:
            by_start.setdefault(a.start, []).append(a)
        reachable = {(0, 0)}
        frontier = [(0, 0)]
        while frontier:
            frame, k = frontier.pop()
            for a in by_start.get(frame, []):
                if skip_silence and a.label == self.silence_label:
                    nxt = (a.end, k)
                elif k < len(words) and a.label == words[k]:
                    nxt = (a.end, k + 1)
                else:
                    continue
                if nxt not in reachable:
                    reachable.add(nxt)
                    frontier.append(nxt)
        return (self.num_frames, len(words)) in reachable

    def to_dot(self) -> str:
        """Graphviz rendering: nodes are frame indices, arcs are words."""
        lines = ["digraph lattice {", "  rankdir=LR;"]
        nodes = sorted({a.start for a in self.arcs}
                       | {a.end for a in self.arcs})
        for t in nodes:
            lines.append(f'  n{t} [label="{t}"];')
        for a in self.sorted_arcs():
            lines.append(
                f'  n{a.start} -> n{a.end} '
                f'[label="{a.label}/{a.score:.1f}"];'
            )
        lines.append("}")
        return "\n".join(lines)


def path_word_spans(composite, path: np.ndarray) -> List[Tuple[int, int, int]]:
    """Segment a state path into word instances: [(start, end, word_idx)].

    Boundary rules mirror CompositeHMM.path_to_labels (a new instance begins
    when the word changes OR on an exit->entry re-entry of the same word —
    the repeated-word rule, reference model_boundary.py:131-135), but frame
    positions are kept instead of just the label sequence."""
    path = np.asarray(path)
    t_total = len(path)
    if t_total == 0:
        return []
    word_of = composite.word_of_state
    lowers = composite.lowers
    uppers = composite.uppers
    starts = [0]
    for t in range(1, t_total):
        s_prev, s_cur = path[t - 1], path[t]
        if s_prev == s_cur:
            continue
        w_prev, w_cur = word_of[s_prev], word_of[s_cur]
        if w_cur != w_prev or (
            s_prev == uppers[w_cur] and s_cur == lowers[w_cur]
        ):
            starts.append(t)
    spans = []
    for i, st in enumerate(starts):
        en = starts[i + 1] if i + 1 < len(starts) else t_total
        spans.append((st, en, int(word_of[path[st]])))
    return spans


def nbest_lattice(composite, features, n: int = 8,
                  beam_k: int | None = None, log_b=None,
                  quirk_backtrace: bool = True) -> Lattice:
    """Build a pruned word lattice from the n best distinct state paths.

    log_b overrides the emissions (e.g. GMM densities — the composite's own
    log_likelihoods are the single-Gaussian view; see
    ContinuousDecoder.predict_nbest for the same caveat)."""
    import jax.numpy as jnp

    from .nbest import kbest_composite_forward, nbest_paths

    if beam_k is None:
        beam_k = max(2 * n, 4)
    if log_b is None:
        log_b = composite.log_likelihoods(features)
    alpha, backptrs = kbest_composite_forward(
        log_b, jnp.asarray(composite.log_a),
        jnp.asarray(composite.lower_of_state),
        jnp.asarray(composite.is_entry), jnp.asarray(composite.is_exit),
        composite.penalty, k=beam_k,
    )
    t_total = int(np.asarray(features).shape[0])
    hyps = nbest_paths(
        np.asarray(alpha), np.asarray(backptrs), composite.is_exit,
        t_total, n, quirk_backtrace=quirk_backtrace,
    )
    best: Dict[Tuple[int, int, int], float] = {}
    for score, path in hyps:
        for span in path_word_spans(composite, path):
            prev = best.get(span)
            if prev is None or score > prev:
                best[span] = score
    sil = composite.labels[composite._silence_word] \
        if composite._silence_word is not None else None
    return Lattice(
        num_frames=t_total,
        arcs=[
            LatticeArc(start=st, end=en, label=composite.labels[w],
                       score=float(sc))
            for (st, en, w), sc in best.items()
        ],
        silence_label=sil,
    )
