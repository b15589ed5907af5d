"""Evaluation metrics for OGB parity runs.

The reference repo has no accuracy harness (its hosts only dump predictions
to HLS_output.txt); the original models are evaluated with OGB's ROC-AUC
(molhiv) / AP (molpcba). Implemented here dependency-free so parity runs
work when real datasets with labels are provided (the ``ogb`` package is not
in this image and the dataset zips are missing LFS blobs).
"""

from __future__ import annotations

import numpy as np


def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Binary ROC-AUC via the rank statistic (ties averaged)."""
    labels = np.asarray(labels).ravel()
    scores = np.asarray(scores, np.float64).ravel()
    pos = labels == 1
    n_pos = int(pos.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(scores)
    ranks[order] = np.arange(1, scores.size + 1)
    # average ranks for ties
    sorted_scores = scores[order]
    i = 0
    while i < scores.size:
        j = i
        while j + 1 < scores.size and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def average_precision(labels: np.ndarray, scores: np.ndarray) -> float:
    """AP (area under precision-recall, step interpolation) — molpcba metric.

    NaN labels (molpcba's missing task entries) are ignored.
    """
    labels = np.asarray(labels, np.float64).ravel()
    scores = np.asarray(scores, np.float64).ravel()
    keep = ~np.isnan(labels)
    labels, scores = labels[keep], scores[keep]
    n_pos = int((labels == 1).sum())
    if n_pos == 0:
        return float("nan")
    order = np.argsort(-scores, kind="mergesort")
    tp = np.cumsum(labels[order] == 1)
    precision = tp / np.arange(1, labels.size + 1)
    return float((precision * (labels[order] == 1)).sum() / n_pos)
