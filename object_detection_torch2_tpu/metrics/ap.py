"""Average precision (reference: src/evaluate.py:45-67) — parity AND strict modes.

Quirk Q5 (SURVEY.md, verified): the reference sorts each column of the
(correct, score) result INDEPENDENTLY (`torch.sort(result, dim=0)` sorts the
correct column all-TPs-first, decoupled from the scores), so its reported
"average precision" mathematically equals recall = TP/count. `strict=False`
reproduces exactly that (the default — comparisons against the published 0.314
must use it). `strict=True` ranks by score descending, the conventional
VOC-style interpolated AP.
"""

from __future__ import annotations

import numpy as np


def _interpolated_ap(correct: np.ndarray, count: float) -> float:
    """The reference's cummax-interpolated AP on an already-ranked 0/1 vector
    (reference: evaluate.py:55-67)."""
    correct = np.asarray(correct, np.float32)
    tp = np.cumsum(correct == 1.0)
    fp = np.cumsum(correct == 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = 1.0 * tp / (tp + fp)
        recall = 1.0 * tp / count
    mod_precision = np.concatenate([[0.0], precision, [0.0]])
    mod_precision = np.flip(np.maximum.accumulate(np.flip(mod_precision)))
    mod_recall = np.concatenate([[0.0], recall, [1.0]])
    return float(np.sum(mod_precision[1:] * (mod_recall[1:] - mod_recall[:-1])))


def average_precision(correct: np.ndarray, scores: np.ndarray, count: int, strict: bool = False) -> float:
    """correct: (X,) 0/1 flags, scores: (X,) detection scores, count: #GTs.

    strict=False: reference parity — rank = correct flags sorted descending
    (scores ignored; Q5). strict=True: rank by score descending.
    """
    correct = np.asarray(correct, np.float32)
    scores = np.asarray(scores, np.float32)
    if strict:
        order = np.argsort(-scores, kind="stable")
        ranked = correct[order]
    else:
        ranked = -np.sort(-correct)
    return _interpolated_ap(ranked, count)


class APAccumulator:
    """Streaming accumulation of detection_matches() outputs over eval batches."""

    def __init__(self, num_classes: int = 20):
        self.num_classes = num_classes
        self.correct = [[] for _ in range(num_classes)]
        self.scores = [[] for _ in range(num_classes)]
        self.counts = np.zeros(num_classes, np.int64)

    def update(self, matches: dict):
        correct = np.asarray(matches["correct"])  # (N, C, P)
        scores = np.asarray(matches["scores"])
        counts = np.asarray(matches["counts"])
        self.counts += counts.sum(0)
        present = scores > 0.0
        for c in range(self.num_classes):
            mask = present[:, c, :]
            if mask.any():
                self.correct[c].append(correct[:, c, :][mask])
                self.scores[c].append(scores[:, c, :][mask])

    def result(self, strict: bool = False):
        """Per-class AP array (nan where a class never appeared) + mean over
        classes with any rows — reference takes the mean over collected classes
        (evaluate.py:174)."""
        aps = np.full(self.num_classes, np.nan, np.float32)
        for c in range(self.num_classes):
            if not self.correct[c]:
                continue
            correct = np.concatenate(self.correct[c])
            scores = np.concatenate(self.scores[c])
            aps[c] = average_precision(correct, scores, self.counts[c], strict=strict)
        mean = float(np.nanmean(aps)) if np.isfinite(aps).any() else float("nan")
        return aps, mean


def merge_accumulators_across_processes(acc: APAccumulator) -> APAccumulator:
    """Cross-process reduction for multi-host eval (--distributed).

    Each process accumulates (correct, score) rows and GT counts only for the
    rows it fed/fetched (parallel.mesh.local_rows); this all-gathers the
    accumulated state over jax.distributed and returns a merged accumulator
    whose `result()` equals a single-process run over the full data. Row order
    within a class is irrelevant: the parity metric (Q5) only sums the correct
    flags, and strict AP re-sorts by score. Single-process: identity.

    Ragged per-process row counts are exchanged as (size-allgather, pad to
    max, allgather, trim) — gloo/ICI allgathers need equal shapes.
    """
    import jax

    if jax.process_count() == 1:
        return acc
    from jax.experimental import multihost_utils

    rows = []  # (class_id, correct, score) triples, all classes flattened
    for c in range(acc.num_classes):
        if acc.correct[c]:
            cc = np.concatenate(acc.correct[c]).astype(np.float32)
            ss = np.concatenate(acc.scores[c]).astype(np.float32)
            rows.append(np.stack([np.full_like(ss, c), cc, ss], axis=-1))
    local = np.concatenate(rows, axis=0) if rows else np.zeros((0, 3), np.float32)

    sizes = np.asarray(multihost_utils.process_allgather(np.int64(local.shape[0])))
    padded = np.zeros((int(sizes.max()), 3), np.float32) if sizes.max() else np.zeros((1, 3), np.float32)
    if len(local):
        padded[: len(local)] = local
    all_rows = np.asarray(multihost_utils.process_allgather(padded))  # (nproc, maxn, 3)
    all_counts = np.asarray(multihost_utils.process_allgather(acc.counts.astype(np.int64)))

    merged = APAccumulator(acc.num_classes)
    merged.counts = all_counts.sum(axis=0)
    for p in range(all_rows.shape[0]):
        rows_p = all_rows[p, : int(sizes[p])]
        for c in range(acc.num_classes):
            m = rows_p[:, 0] == c
            if m.any():
                merged.correct[c].append(rows_p[m, 1])
                merged.scores[c].append(rows_p[m, 2])
    return merged
