"""Charades-style multi-label mAP and OSCC accuracy.

Parity with the reference's auxiliary metrics (model/metric.py:267-317):
``charades_map`` masks videos with no labels to -inf before the official
approximate AP computation; ``oscc_accuracy`` is plain argmax accuracy.
These back the additional downstream evals LaviLa-style codebases run.
"""

from __future__ import annotations

import numpy as np

__all__ = ["multi_label_map", "charades_map", "oscc_accuracy"]


def multi_label_map(submission: np.ndarray, gt: np.ndarray):
    """Returns (mAP, weighted AP, per-class AP); nan for empty classes."""
    m_aps = []
    n_classes = submission.shape[1]
    for c in range(n_classes):
        order = np.argsort(-submission[:, c])
        tp = gt[:, c][order] == 1
        n_pos = tp.sum()
        if n_pos < 0.1:
            m_aps.append(float("nan"))
            continue
        fp = np.invert(tp)
        precision = np.cumsum(tp) / (np.cumsum(fp) + np.cumsum(tp)).astype(float)
        m_aps.append(float(precision[tp].sum() / n_pos))
    m_aps = np.array(m_aps)
    m_ap = float(np.nanmean(m_aps)) if np.isfinite(m_aps).any() else float("nan")
    w_ap = m_aps * gt.sum(axis=0) / max(gt.sum(), 1)
    return m_ap, w_ap, m_aps


def charades_map(submission: np.ndarray, gt: np.ndarray) -> float:
    fix = submission.copy()
    empty = np.sum(gt, axis=1) == 0
    fix[empty, :] = -np.inf
    return multi_label_map(fix, gt)[0]


def oscc_accuracy(preds: np.ndarray, labels: np.ndarray) -> float:
    """Object-state-change classification accuracy (%)."""
    preds = np.asarray(preds)
    labels = np.asarray(labels).reshape(-1)
    return 100.0 * float(np.mean(np.argmax(preds, axis=-1) == labels))
