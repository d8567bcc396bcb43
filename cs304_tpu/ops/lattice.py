"""Word lattices from the composite decoder.

The reference's richest decode output is a single Viterbi string
(hidden_markov_model.py:573-581). Round 1 added n-best strings
(ops/nbest.py); this module adds the standard serving artifact between the
two: a word LATTICE — time-aligned word arcs with scores, deduped across
hypotheses — the input format for downstream rescoring (language-model
re-weighting, confusion networks, keyword search).

Two constructions:

- `nbest_lattice` ("pruned lattice"): the k-best beam forward
  (ops/nbest.kbest_composite_forward) produces distinct state paths; each
  path is segmented into word spans using the composite's boundary vectors
  (the same emit rules as CompositeHMM.path_to_labels, model_boundary.py:
  131-135 in the reference), and identical (start, end, word) spans merge
  keeping the best full-path score.

- `forward_lattice` (true lattice generation): TWO whole-utterance max-plus
  scans — the Viterbi forward augmented with a word-entry-time carry (the
  token-passing "word start" of classic lattice decoders), and a backward
  pass scoring the best continuation from every trellis cell — yield, for
  EVERY frame t and word w, the score of the best complete hypothesis in
  which w ends at t. Every word-end within `beam` of the global best becomes
  an arc, so coverage is not limited to word-ends that happen to appear in
  an n-best list. Arc scores are exact complete-path scores; arcs on the
  1-best path score exactly the Viterbi score.

Arcs from both carry the score of the best COMPLETE hypothesis through
them — the quantity confusion-network pruning and oracle-WER measurement
want (see reporting/metrics.py for WER; Lattice.oracle_edits for the
lattice-oracle metric).
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
    # P(this word ends at end-1 | X) — attached by
    # forward_lattice(posteriors=True); None otherwise.
    posterior: float | None = None


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

    def oracle_edits(self, transcript: Sequence[str],
                     skip_silence: bool = True) -> int | None:
        """Minimum word edit distance between `transcript` and any chain of
        abutting arcs spanning frame 0 to num_frames (the lattice-oracle
        metric: 0 means the truth is in the lattice).

        DP over nodes (frame, ref words consumed): matching arcs cost 0,
        substitution arcs cost 1, any arc may be an insertion (cost 1), a
        ref word may be deleted at any node (cost 1), silence arcs are free
        when skip_silence. Returns None when no chain spans the utterance
        (disconnected lattice)."""
        words = list(transcript)
        n_ref = len(words)
        by_start: Dict[int, List[LatticeArc]] = {}
        for a in self.arcs:
            by_start.setdefault(a.start, []).append(a)
        frames = sorted({0, self.num_frames}
                        | {a.start for a in self.arcs}
                        | {a.end for a in self.arcs})
        inf = float("inf")
        cost = {(t, j): inf for t in frames for j in range(n_ref + 1)}
        cost[(0, 0)] = 0.0
        for t in frames:
            # Deletions advance j at the same frame; relax in j order.
            for j in range(n_ref):
                c = cost[(t, j)]
                if c + 1 < cost[(t, j + 1)]:
                    cost[(t, j + 1)] = c + 1
            for a in by_start.get(t, []):
                for j in range(n_ref + 1):
                    c = cost[(t, j)]
                    if c == inf:
                        continue
                    if skip_silence and a.label == self.silence_label:
                        steps = [(j, 0)]  # free pass-through
                    else:
                        steps = [(j, 1)]  # insertion
                        if j < n_ref:
                            steps.append(
                                (j + 1, 0 if a.label == words[j] else 1)
                            )
                    for nj, add in steps:
                        if c + add < cost[(a.end, nj)]:
                            cost[(a.end, nj)] = c + add
        best = cost[(self.num_frames, n_ref)]
        return None if best == inf else int(best)

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


def _lattice_passes_impl(log_b, trans, diag_init, is_entry, is_exit,
                         word_of, lower_of_state, upper_of_state, length):
    """Forward max-plus pass with word-entry-time carry + backward pass.

    Returns (alphas (T, S), entry_times (T, S) i32, beta_entry (T,) —
    best continuation score from any word-entry cell at each frame, and
    score — the Viterbi total). alphas[t] includes the emission at t;
    beta_entry[t] includes the emission at t (so a cross-word hop ending a
    word at t scores alpha[t, exit] + penalty + beta_entry[t + 1]).

    Length-masked for padded inputs (so bucketed batches share one compile):
    the forward carry freezes at t >= length; the backward recursion
    re-seeds the exit-state terminal AT t == length-1, so padding frames
    never contaminate live ones. Emitted rows at t >= length are garbage —
    read only frames < length.
    """
    import jax
    import jax.numpy as jnp

    t_total, s = log_b.shape
    length = jnp.asarray(length, jnp.int32)
    sidx = jnp.arange(s, dtype=jnp.int32)

    alpha0 = jnp.where(is_entry, log_b[0] + diag_init, -jnp.inf)
    et0 = jnp.zeros((s,), jnp.int32)

    def fwd(carry, inputs):
        alpha, et = carry
        t, log_b_t = inputs
        scores = alpha[:, None] + trans  # (S_from, S_to)
        new_alpha = jnp.max(scores, axis=0) + log_b_t
        bp = jnp.argmax(scores, axis=0).astype(jnp.int32)
        # A new word instance starts when the chosen predecessor lies in a
        # different word, or on an exit->entry re-entry of the same word
        # (the repeated-word rule, CompositeHMM.path_to_labels /
        # reference model_boundary.py:131-135).
        new_inst = (bp != sidx) & (
            (word_of[bp] != word_of)
            | ((bp == upper_of_state) & (sidx == lower_of_state))
        )
        new_et = jnp.where(new_inst, t, et[bp])
        live = t < length
        alpha = jnp.where(live, new_alpha, alpha)
        et = jnp.where(live, new_et, et)
        return (alpha, et), (alpha, et)

    ts = jnp.arange(1, t_total, dtype=jnp.int32)
    (alpha_last, _), (alphas, ets) = jax.lax.scan(
        fwd, (alpha0, et0), (ts, log_b[1:])
    )
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)
    ets = jnp.concatenate([et0[None], ets], axis=0)

    # Backward: beta[t, s] = best score over frames t+1.. from state s,
    # terminating at a word-exit state (hidden_markov_model.py:566-571).
    beta_last = jnp.where(is_exit, 0.0, -jnp.inf)

    def bwd(beta, inputs):
        t, log_b_t = inputs
        beta_here = jnp.where(t == length - 1, beta_last, beta)
        # beta_em[s'] = emission at t in state s' + continuation from t.
        beta_em = log_b_t + beta_here
        new_beta = jnp.max(trans + beta_em[None, :], axis=1)
        return new_beta, beta_em

    beta0, beta_ems = jax.lax.scan(
        bwd, beta_last, (ts, log_b[1:]), reverse=True
    )  # beta_ems[i] is the emission-inclusive continuation at frame i+1
    beta_em_full = jnp.concatenate(
        [(log_b[0] + beta0)[None], beta_ems], axis=0
    )  # (T, S): emission-inclusive continuation score AT each frame
    beta_entry = jnp.max(
        jnp.where(is_entry[None, :], beta_em_full, -jnp.inf), axis=1
    )  # (T,)

    score = jnp.max(jnp.where(is_exit, alpha_last, -jnp.inf))
    return alphas, ets, beta_entry, score


def _lattice_passes(*args):
    import jax

    return jax.jit(_lattice_passes_impl)(*args)


def _sum_passes_masked(log_b, trans, diag_init, is_entry, is_exit, length):
    """Length-masked sum-semiring passes for one padded utterance.

    Forward steps at t >= length freeze the carry (as _scan_trellis does);
    the backward recursion re-seeds the terminal condition AT t == length-1
    (exit states only), so padding frames never contaminate live ones.
    Emitted rows at t >= length are garbage by construction — callers read
    only frames < length. Requires length >= 2.
    """
    import jax
    import jax.numpy as jnp
    from jax.nn import logsumexp

    t_total, _s = log_b.shape
    length = jnp.asarray(length, jnp.int32)
    alpha0 = jnp.where(is_entry, log_b[0] + diag_init, -jnp.inf)

    def fwd(alpha, inputs):
        t, log_b_t = inputs
        new_alpha = logsumexp(alpha[:, None] + trans, axis=0) + log_b_t
        alpha = jnp.where(t < length, new_alpha, alpha)
        return alpha, alpha

    ts = jnp.arange(1, t_total, dtype=jnp.int32)
    alpha_last, alphas = jax.lax.scan(fwd, alpha0, (ts, log_b[1:]))
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)

    beta_terminal = jnp.where(is_exit, 0.0, -jnp.inf)

    def bwd(beta, inputs):
        t, log_b_t = inputs
        beta_here = jnp.where(t == length - 1, beta_terminal, beta)
        beta_em = log_b_t + beta_here
        new_beta = logsumexp(trans + beta_em[None, :], axis=1)
        return new_beta, beta_em

    beta0, beta_ems = jax.lax.scan(
        bwd, beta_terminal, (ts, log_b[1:]), reverse=True
    )
    beta_em_full = jnp.concatenate(
        [(log_b[0] + beta0)[None], beta_ems], axis=0
    )
    beta_entry = logsumexp(
        jnp.where(is_entry[None, :], beta_em_full, -jnp.inf), axis=1
    )
    log_z = logsumexp(jnp.where(is_exit, alpha_last, -jnp.inf))
    return alphas, beta_em_full, beta_entry, log_z


def _sum_passes_batch(log_b_pad, trans, diag_init, is_entry, is_exit,
                      lengths):
    """Module-level vmapped masked sum passes — a stable function object so
    jax.jit's trace cache hits across calls (a per-call lambda would
    recompile every serving batch)."""
    import jax

    return jax.vmap(
        _sum_passes_masked, in_axes=(0, None, None, None, None, 0)
    )(log_b_pad, trans, diag_init, is_entry, is_exit, lengths)


def word_confidences_batch(composite, features, log_b=None,
                           skip_silence: bool = True):
    """Batched word_confidences: one vmapped program for the max-plus
    decode and one for the masked sum-semiring passes over a ragged list
    of utterances. Returns a list (per utterance) of
    (label, start_frame, end_frame, confidence) lists, identical to
    calling word_confidences per utterance.

    log_b optionally overrides the emissions as a ragged list (e.g. GMM
    densities per utterance).
    """
    import jax
    import jax.numpy as jnp

    from .viterbi import composite_transition_matrix, viterbi_composite_batch

    feats = [np.asarray(f) for f in features]
    lengths = np.asarray([f.shape[0] for f in feats], np.int32)
    if (lengths < 2).any():
        raise ValueError("word_confidences_batch needs utterances of >= 2 frames")
    t_max = -(-int(lengths.max()) // 128) * 128  # bucket: one compile per T
    if log_b is None:
        log_b_list = [np.asarray(composite.log_likelihoods(f)) for f in feats]
    else:
        log_b_list = [np.asarray(b) for b in log_b]
    s = log_b_list[0].shape[1]
    log_b_pad = np.zeros((len(feats), t_max, s), np.float32)
    for i, b in enumerate(log_b_list):
        log_b_pad[i, : b.shape[0]] = b

    log_a = jnp.asarray(composite.log_a)
    trans = composite_transition_matrix(
        log_a, jnp.asarray(composite.lower_of_state),
        jnp.asarray(composite.is_entry), jnp.asarray(composite.is_exit),
        composite.penalty,
    )
    diag = jnp.diagonal(log_a)
    diag_init = jnp.where(jnp.isfinite(diag), diag, 0.0)
    is_entry = jnp.asarray(composite.is_entry)
    is_exit = jnp.asarray(composite.is_exit)

    _scores, paths = viterbi_composite_batch(
        jnp.asarray(log_b_pad), log_a,
        jnp.asarray(composite.lower_of_state), is_entry, is_exit,
        composite.penalty, jnp.asarray(lengths), quirk_backtrace=False,
    )
    alphas, _beta_em, beta_entry, log_z = jax.jit(_sum_passes_batch)(
        jnp.asarray(log_b_pad), trans, diag_init, is_entry, is_exit,
        jnp.asarray(lengths),
    )

    paths = np.asarray(paths)
    alphas = np.asarray(alphas)
    beta_entry = np.asarray(beta_entry)
    log_z = np.asarray(log_z)
    uppers = np.asarray(composite.uppers)

    out = []
    for i, l in enumerate(lengths):
        a_exit = alphas[i, :l][:, uppers]
        lam = np.full((l, len(uppers)), -np.inf)
        lam[: l - 1] = (
            a_exit[: l - 1] + composite.penalty
            + beta_entry[i, 1:l, None] - log_z[i]
        )
        lam[l - 1] = a_exit[l - 1] - log_z[i]
        words = []
        for st, en, w in path_word_spans(composite, paths[i, :l]):
            if skip_silence and composite._silence_word is not None \
                    and w == composite._silence_word:
                continue
            conf = float(np.exp(min(lam[en - 1, w], 0.0)))
            words.append((composite.labels[w], st, en, conf))
        out.append(words)
    return out


def _sum_quantities(composite, features, log_b=None, length=None):
    """Run the (length-masked) sum-semiring passes; returns (log_b, alphas,
    beta_em, beta_entry, log_z) as numpy, with log_b materialized. Rows at
    t >= length are garbage by construction — read only frames < length."""
    import jax
    import jax.numpy as jnp

    from .viterbi import composite_transition_matrix

    feats = np.asarray(features)
    if length is None:
        length = feats.shape[0]
    if length < 2 and feats.shape[0] > length:
        # The backward re-seed lives at t == length-1 >= 1; a 1-frame
        # utterance in a PADDED buffer would read junk continuations
        # (unpadded 1-frame inputs are fine: the scans are empty and the
        # terminal condition applies directly).
        raise ValueError("padded posterior passes need length >= 2")
    if log_b is None:
        log_b = composite.log_likelihoods(feats)
    log_a = jnp.asarray(composite.log_a)
    trans = composite_transition_matrix(
        log_a, jnp.asarray(composite.lower_of_state),
        jnp.asarray(composite.is_entry), jnp.asarray(composite.is_exit),
        composite.penalty,
    )
    diag = jnp.diagonal(log_a)
    diag_init = jnp.where(jnp.isfinite(diag), diag, 0.0)
    alphas, beta_em, beta_entry, log_z = jax.jit(_sum_passes_masked)(
        jnp.asarray(log_b), trans, diag_init,
        jnp.asarray(composite.is_entry), jnp.asarray(composite.is_exit),
        jnp.int32(length),
    )
    return (np.asarray(log_b), np.asarray(alphas), np.asarray(beta_em),
            np.asarray(beta_entry), float(log_z))


def word_occupancy_posteriors(composite, features, log_b=None,
                              length=None) -> np.ndarray:
    """(T, W) exact frame-level word posteriors: P(frame t lies in word w).

    State occupancies gamma[t, s] = alpha[t, s] + beta[t, s] - log Z (the
    emission at t appears in both passes, so it is subtracted once), summed
    over each word's states. Every path occupies exactly one state per
    frame, so each row sums to exactly 1 — the invariant the tests pin.
    Useful for keyword spotting, confusion-network-style consensus, and
    alignment visualization.
    """
    feats = np.asarray(features)
    if length is None:
        length = feats.shape[0]
    log_b_np, alphas, beta_em, _beta_entry, log_z = _sum_quantities(
        composite, feats, log_b=log_b, length=length
    )
    log_gamma = (alphas + beta_em - log_b_np - log_z)[:length]  # (T, S)
    gamma = np.exp(np.minimum(log_gamma, 0.0))
    word_of = np.asarray(composite.word_of_state)
    w = len(composite.labels)
    out = np.zeros((gamma.shape[0], w), gamma.dtype)
    for wi in range(w):
        out[:, wi] = gamma[:, word_of == wi].sum(axis=1)
    return out


def consensus_decode(composite, features, log_b=None, length=None,
                     min_frames: int = 3, skip_silence: bool = True) -> str:
    """Minimum-frame-error consensus decoding.

    Per frame, pick the word with the highest exact occupancy posterior
    (word_occupancy_posteriors) — the sequence minimizing the EXPECTED
    number of per-frame word errors, the frame-level minimum-Bayes-risk
    criterion — then run-length collapse, dropping runs shorter than
    min_frames (posterior flickers shorter than any word's minimum
    duration). Agrees with the Viterbi 1-best when one hypothesis
    dominates; under genuine ambiguity it favours per-word posterior mass
    over single-path score. Caveat: adjacent repeats of the SAME word
    merge into one (frame-level occupancy cannot separate instances) —
    with a silence model between words, as project5/6 checkpoints train,
    repeats stay separated by silence runs.
    """
    occ = word_occupancy_posteriors(
        composite, features, log_b=log_b, length=length
    )
    frame_words = occ.argmax(axis=1)
    out = []
    i = 0
    while i < len(frame_words):
        j = i
        while j < len(frame_words) and frame_words[j] == frame_words[i]:
            j += 1
        w = int(frame_words[i])
        if j - i >= min_frames and not (
            skip_silence and composite._silence_word is not None
            and w == composite._silence_word
        ):
            out.append(composite.labels[w])
        i = j
    return "".join(out)


def word_end_log_posteriors(composite, features, log_b=None,
                            length=None) -> np.ndarray:
    """(T, W) log P(word w ends at frame t | X) under the decoder's measure.

    A word ends at t either by a cross-word hop at t+1 (exit state mass x
    penalty x all entry continuations) or, at the final frame, by
    terminating the utterance at its exit. At any single frame the events
    are mutually exclusive across words, so each row's probabilities sum to
    at most 1 (exactly the probability that SOME word ends at t). This is
    the sum-semiring counterpart of forward_lattice's arc scores and the
    basis of the word confidences below.
    """
    feats = np.asarray(features)
    t_total = feats.shape[0] if length is None else int(length)
    _log_b, alphas, _beta_em, beta_entry, log_z = _sum_quantities(
        composite, feats, log_b=log_b, length=t_total
    )
    uppers = np.asarray(composite.uppers)
    lam = np.full((t_total, len(uppers)), -np.inf)
    a_exit = alphas[:t_total][:, uppers]             # (T, W)
    lam[: t_total - 1] = (
        a_exit[: t_total - 1] + composite.penalty
        + beta_entry[1:t_total, None] - log_z
    )
    lam[t_total - 1] = a_exit[t_total - 1] - log_z
    return lam


def word_confidences(composite, features, log_b=None,
                     skip_silence: bool = True):
    """Decode the 1-best and attach a posterior confidence to each word:
    [(label, start_frame, end_frame, confidence)].

    Confidence of a word spanning [start, end) is the posterior probability
    that this word ends at frame end-1 (word_end_log_posteriors) — the
    slightly conservative event-level confidence standard for Viterbi
    systems (it does not marginalize over alternative start frames).
    """
    import jax.numpy as jnp

    from .viterbi import viterbi_composite

    feats = np.asarray(features)
    if log_b is None:
        log_b = composite.log_likelihoods(feats)
    _score, path = viterbi_composite(
        jnp.asarray(log_b), jnp.asarray(composite.log_a),
        jnp.asarray(composite.lower_of_state),
        jnp.asarray(composite.is_entry), jnp.asarray(composite.is_exit),
        composite.penalty, quirk_backtrace=False,
    )
    lam = word_end_log_posteriors(composite, feats, log_b=log_b)
    out = []
    for st, en, w in path_word_spans(composite, np.asarray(path)):
        if skip_silence and composite._silence_word is not None \
                and w == composite._silence_word:
            continue
        conf = float(np.exp(min(lam[en - 1, w], 0.0)))
        out.append((composite.labels[w], st, en, conf))
    return out


def forward_lattice(composite, features, beam: float = 50.0,
                    log_b=None, posteriors: bool = False,
                    length: int | None = None) -> Lattice:
    """True forward lattice generation over word-end hypotheses.

    For every (frame t, word w) the best complete-path score with w ending
    at t is alpha[t, exit_w] (+ inter-word penalty + best continuation from
    a word entry at t+1, except at the final frame where the utterance
    terminates at the exit). Every word-end within `beam` of the Viterbi
    best becomes an arc spanning [entry_time, t+1) — entry_time being the
    start frame carried by the forward pass's best token into that cell, as
    in classic token-passing lattice decoders. Unlike nbest_lattice the
    candidate pool is ALL word-ends in the trellis, not the ends present in
    an n-best list; like all Viterbi-style lattices, each (t, w) keeps its
    single best start time.

    log_b overrides the emissions (e.g. GMM densities, as in nbest_lattice).
    posteriors=True additionally runs the sum-semiring passes and attaches
    P(word ends at end-1 | X) to each arc (LatticeArc.posterior) — the
    basis of spot_keyword. `length` marks the real frame count of padded
    features (pad to a bucket so repeated calls share one compile).
    """
    import jax.numpy as jnp

    from .viterbi import composite_transition_matrix

    feats = np.asarray(features)
    t_total = feats.shape[0] if length is None else int(length)
    if t_total < 2 and feats.shape[0] > t_total:
        # The backward re-seed lives at t == length-1 >= 1; a 1-frame
        # utterance in a padded buffer would read junk continuations.
        raise ValueError("padded forward_lattice needs length >= 2")
    if log_b is None:
        log_b = composite.log_likelihoods(feats)
    log_a = jnp.asarray(composite.log_a)
    trans = composite_transition_matrix(
        log_a, jnp.asarray(composite.lower_of_state),
        jnp.asarray(composite.is_entry), jnp.asarray(composite.is_exit),
        composite.penalty,
    )
    diag = jnp.diagonal(log_a)
    diag_init = jnp.where(jnp.isfinite(diag), diag, 0.0)
    upper_of_state = composite.uppers[composite.word_of_state]
    alphas, ets, beta_entry, score = _lattice_passes(
        jnp.asarray(log_b), trans, diag_init,
        jnp.asarray(composite.is_entry), jnp.asarray(composite.is_exit),
        jnp.asarray(composite.word_of_state, dtype=jnp.int32),
        jnp.asarray(composite.lower_of_state, dtype=jnp.int32),
        jnp.asarray(upper_of_state, dtype=jnp.int32),
        jnp.int32(t_total),
    )
    alphas = np.asarray(alphas)
    ets = np.asarray(ets)
    beta_entry = np.asarray(beta_entry)
    best_total = float(score)

    uppers = np.asarray(composite.uppers)
    arcs: Dict[Tuple[int, int, int], float] = {}
    for w, e in enumerate(uppers):
        a_e = alphas[:t_total, e]               # (T,) best into word-end cell
        st_e = ets[:t_total, e]                 # (T,) that token's start frame
        # Word ends mid-utterance via a cross-word hop at t+1...
        sigma = np.full(t_total, -np.inf)
        sigma[: t_total - 1] = (
            a_e[: t_total - 1] + composite.penalty + beta_entry[1:t_total]
        )
        # ...or by terminating the utterance at the exit state.
        sigma[t_total - 1] = a_e[t_total - 1]
        keep = np.flatnonzero(sigma >= best_total - beam)
        for t in keep:
            key = (int(st_e[t]), int(t) + 1, w)
            sc = float(sigma[t])
            prev = arcs.get(key)
            if prev is None or sc > prev:
                arcs[key] = sc
    lam = None
    if posteriors:
        lam = word_end_log_posteriors(
            composite, feats, log_b=log_b, length=t_total
        )
    sil = composite.labels[composite._silence_word] \
        if composite._silence_word is not None else None
    return Lattice(
        num_frames=t_total,
        arcs=[
            LatticeArc(
                start=st, end=en, label=composite.labels[w], score=sc,
                posterior=(
                    float(np.exp(min(lam[en - 1, w], 0.0)))
                    if lam is not None else None
                ),
            )
            for (st, en, w), sc in sorted(arcs.items())
        ],
        silence_label=sil,
    )


def spot_keyword(composite, features, keyword: str,
                 threshold: float = 0.5, beam: float = 50.0,
                 log_b=None, length: int | None = None,
                 ) -> List[Tuple[int, int, float]]:
    """Posterior keyword spotting: occurrences of `keyword` in the audio as
    [(start_frame, end_frame, posterior)], best-posterior-first, with
    overlapping detections suppressed (greedy NMS).

    Detection is lattice-based: forward_lattice(posteriors=True) arcs
    labelled `keyword` whose word-end posterior clears `threshold`. Unlike
    1-best decoding this fires even when the keyword loses the Viterbi
    race, as long as enough posterior mass ends the word inside the beam.
    """
    if keyword not in composite.labels:
        raise ValueError(
            f"keyword {keyword!r} is not in the decoder vocabulary "
            f"{composite.labels}"
        )
    lat = forward_lattice(
        composite, features, beam=beam, log_b=log_b, posteriors=True,
        length=length,
    )
    hits = [
        (a.start, a.end, a.posterior)
        for a in lat.arcs
        if a.label == keyword and a.posterior is not None
        and a.posterior >= threshold
    ]
    hits.sort(key=lambda h: -h[2])
    kept: List[Tuple[int, int, float]] = []
    for st, en, p in hits:
        if all(en <= k_st or st >= k_en for k_st, k_en, _p in kept):
            kept.append((st, en, p))
    return kept
