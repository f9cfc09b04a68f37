"""Numpy CRF-Viterbi decoder with BIO impossible-transition masking.

Pure-numpy re-expression of the reference tagger's CRF decode path
(/root/reference/src/tagger/model/modeling_bionexttagger.py:113-450): the
same tag layout (O=0, B-class c at 2c+1, I-class c at 2c+2), the same
impossible-transition scheme (start at I, O->I, B-i->I-j and I-i->I-j for
j != i, all scored LARGE_NEGATIVE), and the same Viterbi recurrence /
backtrace semantics (first timestep must be unmasked; positions past a
sample's last valid step are never traced).

This is the default post-processing for ``TorchTaggerBackend``
(``decodes=False``): a logits-only token-classification model gets a
BIO-valid decode instead of a raw argmax (argmax can emit I-after-O or an
I whose class differs from the entity it continues; Viterbi under the mask
cannot). It is also usable standalone on any (batch, seq, n_tags) emission
array. Everything is vectorized over the batch — the only Python loop is
over sequence length.
"""

from __future__ import annotations

import numpy as np

LARGE_NEGATIVE = -1e9


def impossible_transition_masks(n_classes: int = 6):
    """Boolean (forbidden=True) masks for the BIO tag layout.

    Returns ``(start_mask, transition_mask)`` of shapes (T,) and (T, T)
    with T = 2*n_classes + 1, mirroring the reference's
    ``mask_impossible_transitions``: a sequence may not start at any I tag;
    O may not transition to any I; B-i and I-i may not transition to I-j
    for j != i.
    """
    n_tags = 2 * n_classes + 1
    start = np.zeros(n_tags, dtype=bool)
    trans = np.zeros((n_tags, n_tags), dtype=bool)
    for i in range(n_classes):
        b_i, i_i = 2 * i + 1, 2 * i + 2
        start[i_i] = True
        trans[0, i_i] = True
        for j in range(n_classes):
            if j != i:
                trans[b_i, 2 * j + 2] = True
                trans[i_i, 2 * j + 2] = True
    return start, trans


def viterbi_decode(emissions: np.ndarray,
                   mask: np.ndarray | None = None,
                   *,
                   transitions: np.ndarray | None = None,
                   start_transitions: np.ndarray | None = None,
                   end_transitions: np.ndarray | None = None,
                   n_classes: int | None = None) -> np.ndarray:
    """Best tag sequence per sample under a (masked) linear-chain CRF.

    Args:
        emissions: float array (batch, seq_len, n_tags) of per-token tag
            scores (logits).
        mask: optional (batch, seq_len) 0/1 attention mask; position 0 must
            be valid for every sample (reference asserts the same) and the
            mask must be CONTIGUOUS suffix padding (1s then 0s) — holes are
            rejected, because the torchcrf-style recurrence silently
            misaligns the backtrace on hole-y masks (the reference
            sidesteps this by decoding unmasked,
            modeling_bionexttagger.py:103). Padded positions are never
            traced and come back as tag 0 (O).
        transitions / start_transitions / end_transitions: optional learned
            CRF scores ((T, T), (T,), (T,)). When omitted they default to
            zeros, so decoding degenerates to a CONSTRAINED argmax — exactly
            what the impossible-transition mask is for.
        n_classes: BIO class count used to build the impossible-transition
            mask; inferred from n_tags as (T-1)//2 when omitted. Pass the
            scores pre-masked and ``n_classes=0`` to skip masking.

    Returns:
        int64 array (batch, seq_len) of tag ids (padded positions are 0).
    """
    em = np.asarray(emissions, dtype=np.float64)
    if em.ndim == 2:                       # single sequence convenience
        em = em[None]
    B, L, T = em.shape
    if mask is None:
        m = np.ones((B, L), dtype=bool)
    else:
        m = np.asarray(mask).astype(bool)
        if m.ndim == 1:
            m = m[None]
    if not m[:, 0].all():
        raise ValueError("first timestep of every sample must be unmasked")
    if (np.diff(m.astype(np.int8), axis=1) > 0).any():
        raise ValueError("mask must be contiguous suffix padding (no holes);"
                         " decode unmasked for windows with left PADs")

    start = (np.zeros(T) if start_transitions is None
             else np.asarray(start_transitions, dtype=np.float64).copy())
    end = (np.zeros(T) if end_transitions is None
           else np.asarray(end_transitions, dtype=np.float64).copy())
    trans = (np.zeros((T, T)) if transitions is None
             else np.asarray(transitions, dtype=np.float64).copy())
    nc = (T - 1) // 2 if n_classes is None else n_classes
    if nc:
        if 2 * nc + 1 != T:
            raise ValueError(f"n_tags={T} inconsistent with n_classes={nc}")
        s_mask, t_mask = impossible_transition_masks(nc)
        start[s_mask] = LARGE_NEGATIVE
        trans[t_mask] = LARGE_NEGATIVE

    # forward pass: score[b, j] = best score of a path ending in tag j
    score = start[None, :] + em[:, 0]                       # (B, T)
    history = np.zeros((max(L - 1, 0), B, T), dtype=np.int64)
    for t in range(1, L):
        # (B, prev, next): path score + transition + next emission
        cand = score[:, :, None] + trans[None] + em[:, t][:, None, :]
        idx = cand.argmax(axis=1)                           # (B, T)
        ns = np.take_along_axis(cand, idx[:, None, :], axis=1)[:, 0, :]
        valid = m[:, t]
        score = np.where(valid[:, None], ns, score)
        history[t - 1] = idx
    score = score + end[None, :]

    # backtrace (vectorized over the batch, variable lengths honored)
    seq_ends = m.sum(axis=1) - 1                            # (B,)
    out = np.zeros((B, L), dtype=np.int64)
    cur = score.argmax(axis=1)                              # (B,)
    out[np.arange(B), seq_ends] = cur
    for t in range(L - 1, 0, -1):
        active = seq_ends >= t
        if not active.any():
            continue
        prev = history[t - 1][np.arange(B), cur]
        cur = np.where(active, prev, cur)
        out[active, t - 1] = cur[active]
    return out


def brute_force_decode(emissions: np.ndarray,
                       *,
                       transitions: np.ndarray | None = None,
                       start_transitions: np.ndarray | None = None,
                       end_transitions: np.ndarray | None = None,
                       n_classes: int | None = None) -> np.ndarray:
    """Exhaustive path enumeration for ONE sequence — test oracle only."""
    em = np.asarray(emissions, dtype=np.float64)
    L, T = em.shape
    start = (np.zeros(T) if start_transitions is None
             else np.asarray(start_transitions, dtype=np.float64).copy())
    end = (np.zeros(T) if end_transitions is None
           else np.asarray(end_transitions, dtype=np.float64).copy())
    trans = (np.zeros((T, T)) if transitions is None
             else np.asarray(transitions, dtype=np.float64).copy())
    nc = (T - 1) // 2 if n_classes is None else n_classes
    if nc:
        s_mask, t_mask = impossible_transition_masks(nc)
        start[s_mask] = LARGE_NEGATIVE
        trans[t_mask] = LARGE_NEGATIVE
    import itertools
    best, best_score = None, -np.inf
    for path in itertools.product(range(T), repeat=L):
        s = start[path[0]] + em[0, path[0]] + end[path[-1]]
        for i in range(1, L):
            s += trans[path[i - 1], path[i]] + em[i, path[i]]
        if s > best_score:
            best, best_score = path, s
    return np.asarray(best, dtype=np.int64)
