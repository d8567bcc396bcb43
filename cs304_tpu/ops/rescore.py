"""Lattice-level LM rescoring and confusion networks.

The reference's decode output is one Viterbi string
(hidden_markov_model.py:573-581); its only LM-shaped knob is the flat
inter-word penalty (hidden_markov_model.py:419). This module completes the
standard two-pass serving stack on top of ops/lattice.py:

- `arc_acoustic_scores`: EXACT arc-local acoustic scores. forward_lattice
  arcs carry best-complete-path scores (the right quantity for pruning and
  oracle metrics), but rescoring needs path-additive per-arc scores. For an
  arc (start, end, w) that is the within-word Viterbi score of word w
  emitting frames [start, end) — entered at its entry state, leaving from its
  exit state — under exactly the first-pass conventions (banded skip-2
  transitions, entry self-loop applied only at frame 0,
  ops/viterbi.composite_transition_matrix). Computed on-device: one vmapped
  masked scan over all arcs (each a (max_span, s_max) trellis), so a
  thousand-arc lattice is one dispatch, not a thousand.
  Exactness invariant (tested): summing arc scores along any segmentation
  of a state path and adding one inter-word penalty per arc boundary
  reproduces the dense Viterbi path score bit-for-bit in f32.

- `lattice_rescore`: exact best-path search over the lattice under
  acoustic + lm_weight * log P(w | w') + penalty per word edge — the same
  log-linear combination the first-pass bigram decoder applies
  (ops/lm.word_pair_penalties), so rescoring a lattice that contains the
  full search space reproduces first-pass LM decoding exactly (tested via an
  exhaustive lattice). The DP state is (lattice node, previous word):
  O(arcs x vocabulary) on the host — lattices are small; the device work is
  the arc-scoring dispatch above.

- `confusion_network` / `cn_decode`: "sausage" decoding. Slots come from the
  1-best word spans (the pivot variant of confusion-network construction:
  competing arcs cluster onto the pivot they overlap most; arcs overlapping
  no pivot form insertion slots between pivots), each slot holding
  {word: posterior} from the lattice's word-end posteriors plus an epsilon
  (deletion) residual. cn_decode picks each slot's argmax — per-slot
  minimum-Bayes-risk, the word-level counterpart of
  ops/lattice.consensus_decode's frame-level criterion.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .lattice import Lattice, LatticeArc, path_word_spans

__all__ = [
    "arc_acoustic_scores", "lattice_rescore", "exhaustive_lattice",
    "ConfusionSlot", "confusion_network", "cn_decode",
]


def _arc_scores_jit(max_span: int, s_max: int, skip: int):
    """Compile-cached batched within-word Viterbi, static (max_span, s_max)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=())
    def run(log_b_pad, log_a_pad, starts, lowers, s_ws, span_lens, entry_diag):
        frm = jax.lax.broadcasted_iota(jnp.int32, (s_max, s_max), 0)
        to = jax.lax.broadcasted_iota(jnp.int32, (s_max, s_max), 1)

        def one(start, lower, s_w, span_len, diag0):
            lb = jax.lax.dynamic_slice(
                log_b_pad, (start, lower), (max_span, s_max)
            )
            la = jax.lax.dynamic_slice(
                log_a_pad, (lower, lower), (s_max, s_max)
            )
            band = (frm <= to) & (frm >= to - skip) & (to < s_w) & (frm < s_w)
            trans = jnp.where(band, la, -jnp.inf)
            sidx = jnp.arange(s_max, dtype=jnp.int32)
            alpha0 = jnp.where(sidx == 0, lb[0, 0] + diag0, -jnp.inf)

            def step(alpha, inp):
                j, lb_j = inp
                new = jnp.max(alpha[:, None] + trans, axis=0) + lb_j
                return jnp.where(j < span_len, new, alpha), None

            js = jnp.arange(1, max_span, dtype=jnp.int32)
            alpha, _ = jax.lax.scan(step, alpha0, (js, lb[1:]))
            return alpha[s_w - 1]

        return jax.vmap(one)(starts, lowers, s_ws, span_lens, entry_diag)

    return run


_ARC_SCORES_CACHE: Dict[Tuple[int, int, int], object] = {}


def arc_acoustic_scores(composite, arcs: Sequence[LatticeArc], log_b=None,
                        features=None, skip: int = 2) -> np.ndarray:
    """(len(arcs),) exact arc-local acoustic scores (module docstring).

    log_b: (T, S) emissions (composite.log_likelihoods(features) when None —
    pass GMM densities here on a GMM checkpoint, as everywhere in
    ops/lattice.py). Spans are padded to a 32-frame bucket so repeated calls
    share one compile per (bucket, s_max)."""
    import jax.numpy as jnp

    if log_b is None:
        log_b = composite.log_likelihoods(np.asarray(features))
    log_b = np.asarray(log_b, np.float32)
    t_total, s_total = log_b.shape
    if not arcs:
        return np.zeros((0,), np.float32)
    word_index = {l: w for w, l in enumerate(composite.labels)}
    lowers_w = np.asarray(composite.lowers)
    uppers_w = np.asarray(composite.uppers)
    diag = np.diagonal(np.asarray(composite.log_a)).copy()
    diag[~np.isfinite(diag)] = 0.0

    ws = np.asarray([word_index[a.label] for a in arcs], np.int32)
    starts = np.asarray([a.start for a in arcs], np.int32)
    spans = np.asarray([a.end - a.start for a in arcs], np.int32)
    lowers = lowers_w[ws].astype(np.int32)
    s_ws = (uppers_w[ws] - lowers_w[ws] + 1).astype(np.int32)
    # Entry self-loop applies only when the utterance STARTS in this arc
    # (viterbi_composite's degenerate-safe init); cross-word hops carry no
    # self-loop term (composite_transition_matrix entry columns).
    entry_diag = np.where(starts == 0, diag[lowers], 0.0).astype(np.float32)

    s_max = int(max(composite.state_counts))
    max_span = -(-int(spans.max()) // 32) * 32
    key = (max_span, s_max, skip)
    if key not in _ARC_SCORES_CACHE:
        _ARC_SCORES_CACHE[key] = _arc_scores_jit(max_span, s_max, skip)
    # Pad so dynamic_slice never clamps (values masked by span/s_w logic).
    log_b_pad = np.zeros((t_total + max_span, s_total + s_max), np.float32)
    log_b_pad[:t_total, :s_total] = log_b
    log_a_pad = np.full((s_total + s_max, s_total + s_max), -np.inf,
                        np.float32)
    log_a_pad[:s_total, :s_total] = np.asarray(composite.log_a)
    out = _ARC_SCORES_CACHE[key](
        jnp.asarray(log_b_pad), jnp.asarray(log_a_pad),
        jnp.asarray(starts), jnp.asarray(lowers), jnp.asarray(s_ws),
        jnp.asarray(spans), jnp.asarray(entry_diag),
    )
    return np.asarray(out)


def lattice_rescore(composite, lattice: Lattice, log_b=None, features=None,
                    bigram=None, lm_weight: float = 1.0,
                    penalty: float | None = None, boundaries: bool = False,
                    skip_silence: bool = True,
                    ) -> Tuple[float, str, List[LatticeArc]]:
    """Exact best path through the lattice under the rescored measure.

    Path score = sum of arc-local acoustics + per-edge
    lm_weight * log P(w | w') + penalty (ops/lm.word_pair_penalties — the
    identical matrix the first-pass bigram decoder uses, so words outside the
    LM vocabulary fall back to the flat penalty). bigram=None rescores under
    the flat penalty alone (useful to sweep `penalty` per-lattice without
    re-decoding). boundaries=True additionally applies the LM's <s>/<\\s>
    terms (as rescore_nbest does); the default matches the first-pass
    decoder, which has no boundary terms.

    Returns (score, text, arcs_on_best_path); text skips silence arcs like
    path_to_labels. Raises ValueError when no arc chain spans the utterance.
    """
    from .lm import word_pair_penalties

    if penalty is None:
        penalty = composite.penalty
    w_total = len(composite.labels)
    if bigram is not None:
        pair = word_pair_penalties(composite, bigram, lm_weight, penalty)
        lm_idx = {l: i for i, l in enumerate(bigram.labels)}
    else:
        pair = np.full((w_total, w_total), penalty, np.float32)
        lm_idx = {}
    word_index = {l: w for w, l in enumerate(composite.labels)}

    arcs = lattice.sorted_arcs()
    acoustic = arc_acoustic_scores(
        composite, arcs, log_b=log_b, features=features
    )
    by_start: Dict[int, List[int]] = {}
    for i, a in enumerate(arcs):
        by_start.setdefault(a.start, []).append(i)

    # DP over (frame node, previous word); -1 = utterance start.
    best: Dict[Tuple[int, int], float] = {(0, -1): 0.0}
    back: Dict[Tuple[int, int], Tuple[Tuple[int, int], int]] = {}
    for f in sorted({0} | {a.start for a in arcs}):
        for i in by_start.get(f, []):
            a = arcs[i]
            w = word_index[a.label]
            for c in range(-1, w_total):
                src = (f, c)
                base = best.get(src)
                if base is None:
                    continue
                edge = float(acoustic[i])
                if c >= 0:
                    edge += float(pair[c, w])
                elif boundaries and bigram is not None \
                        and a.label in lm_idx:
                    edge += lm_weight * float(
                        bigram.log_p_init[lm_idx[a.label]]
                    )
                dst = (a.end, w)
                sc = base + edge
                if sc > best.get(dst, -np.inf):
                    best[dst] = sc
                    back[dst] = (src, i)

    finals = []
    for c in range(w_total):
        node = (lattice.num_frames, c)
        sc = best.get(node)
        if sc is None:
            continue
        if boundaries and bigram is not None \
                and composite.labels[c] in lm_idx:
            sc += lm_weight * float(
                bigram.log_p_final[lm_idx[composite.labels[c]]]
            )
        finals.append((sc, node))
    if not finals:
        raise ValueError(
            "no arc chain spans the lattice (disconnected — widen the beam)"
        )
    score, node = max(finals, key=lambda sn: sn[0])
    path_arcs: List[LatticeArc] = []
    while node in back:
        node, i = back[node]
        path_arcs.append(arcs[i])
    path_arcs.reverse()
    text = "".join(
        a.label for a in path_arcs
        if not (skip_silence and a.label == lattice.silence_label)
    )
    return float(score), text, path_arcs


def lattice_rescore_trigram(composite, lattice: Lattice, trigram,
                            log_b=None, features=None,
                            lm_weight: float = 1.0,
                            penalty: float | None = None,
                            boundaries: bool = False,
                            skip_silence: bool = True,
                            ) -> Tuple[float, str, List[LatticeArc]]:
    """Exact best lattice path under a TRIGRAM measure (ops/lm.WordTrigram).

    Same contract as lattice_rescore, but the DP state carries TWO words of
    history — (frame node, w'', w') — so each edge scores
    acoustic + lm_weight * log P(w | w'', w') + penalty. First-pass
    decoding stays bigram (the trellis carries one word of context); this
    is the standard second pass that recovers the longer context. Arc
    labels outside the trigram vocabulary contribute the flat penalty
    alone and a boundary history slot (the same closed-vocabulary fallback
    the bigram pair matrix uses). boundaries=True adds the <s>-initial and
    </s>-final terms.
    """
    if penalty is None:
        penalty = composite.penalty
    lm_idx = trigram.index
    bnd = trigram.boundary

    arcs = lattice.sorted_arcs()
    acoustic = arc_acoustic_scores(
        composite, arcs, log_b=log_b, features=features
    )
    by_start: Dict[int, List[int]] = {}
    for i, a in enumerate(arcs):
        by_start.setdefault(a.start, []).append(i)

    # DP over (frame node, lm-history pair); bnd = sentence boundary / OOV.
    start_hist = (bnd, bnd)
    best: Dict[Tuple[int, int, int], float] = {(0, *start_hist): 0.0}
    back: Dict[Tuple[int, int, int],
               Tuple[Tuple[int, int, int], int]] = {}
    frames = sorted({0} | {a.start for a in arcs})
    states_at: Dict[int, set] = {0: {start_hist}}
    for f in frames:
        for i in by_start.get(f, []):
            a = arcs[i]
            w = lm_idx.get(a.label, bnd)
            known = a.label in lm_idx
            for hist in list(states_at.get(f, ())):
                src = (f, *hist)
                base = best.get(src)
                if base is None:
                    continue
                # First arcs (f == 0) carry no inter-word penalty — the
                # bigram contract (lattice_rescore charges pair[c, w] only
                # for c >= 0), so scores stay comparable across orders.
                edge = float(acoustic[i]) + (float(penalty) if f > 0 else 0.0)
                at_start = hist == start_hist and f == 0
                if known and (not at_start or boundaries):
                    edge += lm_weight * float(
                        trigram.log_p[hist[0], hist[1], w]
                    )
                new_hist = (hist[1], w)
                dst = (a.end, *new_hist)
                sc = base + edge
                if sc > best.get(dst, -np.inf):
                    best[dst] = sc
                    back[dst] = (src, i)
                    states_at.setdefault(a.end, set()).add(new_hist)

    finals = []
    for hist in states_at.get(lattice.num_frames, ()):
        node = (lattice.num_frames, *hist)
        sc = best.get(node)
        if sc is None:
            continue
        if boundaries:
            sc += lm_weight * float(
                trigram.log_p_final[hist[0], hist[1]]
            )
        finals.append((sc, node))
    if not finals:
        raise ValueError(
            "no arc chain spans the lattice (disconnected — widen the beam)"
        )
    score, node = max(finals, key=lambda sn: sn[0])
    path_arcs: List[LatticeArc] = []
    while node in back:
        node, i = back[node]
        path_arcs.append(arcs[i])
    path_arcs.reverse()
    text = "".join(
        a.label for a in path_arcs
        if not (skip_silence and a.label == lattice.silence_label)
    )
    return float(score), text, path_arcs


def exhaustive_lattice(composite, t_total: int) -> Lattice:
    """Every possible word arc: (start, end, w) for all spans long enough to
    traverse word w under the skip-2 band. Rescoring this lattice IS full
    search — the exactness oracle for lattice_rescore (test/debug utility;
    O(T^2 W) arcs, keep T small)."""
    arcs = []
    lowers = np.asarray(composite.lowers)
    uppers = np.asarray(composite.uppers)
    for w, label in enumerate(composite.labels):
        s_w = int(uppers[w] - lowers[w] + 1)
        min_len = 1 + -(-(s_w - 1) // 2)  # entry frame + ceil((s_w-1)/skip)
        for st in range(t_total):
            for en in range(st + min_len, t_total + 1):
                arcs.append(
                    LatticeArc(start=st, end=en, label=label, score=0.0)
                )
    sil = composite.labels[composite._silence_word] \
        if composite._silence_word is not None else None
    return Lattice(num_frames=t_total, arcs=arcs, silence_label=sil)


@dataclass
class ConfusionSlot:
    start: int   # frame span covered by the slot (anchor extent)
    end: int
    # word -> posterior mass; the epsilon (no word here) residual is
    # 1 - sum(values), floored at 0.
    hyps: Dict[str, float]
    pivot: Optional[str]  # 1-best word anchoring the slot; None = insertion

    def eps(self) -> float:
        return max(0.0, 1.0 - sum(self.hyps.values()))

    def best(self) -> Optional[str]:
        """argmax over words and epsilon; None when epsilon wins."""
        if not self.hyps:
            return None
        label, p = max(self.hyps.items(), key=lambda kv: kv[1])
        return None if self.eps() > p else label


def confusion_network(composite, features, beam: float = 50.0,
                      log_b=None, length: int | None = None,
                      skip_silence: bool = True) -> List[ConfusionSlot]:
    """Build the pivot confusion network (module docstring).

    Pivot slots are the 1-best word spans; every lattice arc joins the pivot
    it overlaps most (ties to the earlier pivot), arcs overlapping none form
    insertion slots clustered among themselves by overlap, ordered by start
    time. Slot masses are word-end posteriors P(w ends in this region | X)
    summed per label and clipped to 1."""
    import jax.numpy as jnp

    from .lattice import forward_lattice
    from .viterbi import viterbi_composite

    feats = np.asarray(features)
    t_total = feats.shape[0] if length is None else int(length)
    if log_b is None:
        log_b = composite.log_likelihoods(feats)
    lat = forward_lattice(
        composite, feats, beam=beam, log_b=log_b, posteriors=True,
        length=length,
    )
    _score, path = viterbi_composite(
        jnp.asarray(log_b), jnp.asarray(composite.log_a),
        jnp.asarray(composite.lower_of_state),
        jnp.asarray(composite.is_entry), jnp.asarray(composite.is_exit),
        composite.penalty, length=t_total, quirk_backtrace=False,
    )
    sil_w = composite._silence_word
    pivots = [
        (st, en, composite.labels[w])
        for st, en, w in path_word_spans(composite, np.asarray(path)[:t_total])
        if not (skip_silence and sil_w is not None and w == sil_w)
    ]
    slots = [
        ConfusionSlot(start=st, end=en, hyps={}, pivot=lab)
        for st, en, lab in pivots
    ]

    def overlap(a_st, a_en, b_st, b_en):
        return max(0, min(a_en, b_en) - max(a_st, b_st))

    orphans: List[LatticeArc] = []
    for a in lat.arcs:
        if a.posterior is None:
            continue
        if skip_silence and a.label == lat.silence_label:
            continue
        ovs = [overlap(a.start, a.end, s.start, s.end) for s in slots]
        if slots and max(ovs) > 0:
            slot = slots[int(np.argmax(ovs))]
            slot.hyps[a.label] = min(
                1.0, slot.hyps.get(a.label, 0.0) + a.posterior
            )
        else:
            orphans.append(a)

    # Insertion slots: cluster orphan arcs among themselves by overlap,
    # highest-posterior arc anchors each cluster.
    extra: List[ConfusionSlot] = []
    for a in sorted(orphans, key=lambda x: -(x.posterior or 0.0)):
        for s in extra:
            if overlap(a.start, a.end, s.start, s.end) > 0:
                s.hyps[a.label] = min(
                    1.0, s.hyps.get(a.label, 0.0) + a.posterior
                )
                break
        else:
            extra.append(ConfusionSlot(
                start=a.start, end=a.end,
                hyps={a.label: min(1.0, a.posterior)}, pivot=None,
            ))
    return sorted(slots + extra, key=lambda s: (s.start, s.end))


def cn_decode(slots: Sequence[ConfusionSlot]) -> str:
    """Per-slot MBR: each slot's argmax word, epsilon slots emit nothing."""
    return "".join(w for w in (s.best() for s in slots) if w is not None)
