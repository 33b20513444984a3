"""lwlrap — label-weighted label-ranking average precision.

The competition metric (reference ops/utils.py:17-26, which wraps sklearn's
``label_ranking_average_precision_score`` with per-sample label-count weights
and skips zero-label rows). Two implementations:

- ``lwlrap``      — numpy host version, bit-compatible with the reference
                    (including sklearn's >=-tie handling)
- ``lwlrap_jax``  — pure-JAX device version usable inside jitted train/eval
                    steps, so the per-batch metric needs no host round trip

With per-sample weight = n_labels, the weighted mean of per-sample LRAP
reduces to sum over (sample, true label) of precision@rank divided by the
total label count; both versions use that form.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _sample_terms_np(truth_row: np.ndarray, scores_row: np.ndarray) -> float:
    """Sum over true labels of (#true with score >= s) / (#all with score >= s)."""
    true_idx = np.flatnonzero(truth_row)
    if true_idx.size == 0:
        return 0.0
    s_true = scores_row[true_idx]
    # rank with 'max' tie semantics: count of scores >= own score
    ge = scores_row[None, :] >= s_true[:, None]
    ranks = ge.sum(axis=1)
    ge_true = s_true[None, :] >= s_true[:, None]
    hits = ge_true.sum(axis=1)
    return float(np.sum(hits / ranks))


def lwlrap(truth: np.ndarray, scores: np.ndarray) -> float:
    """Label-weighted LRAP over a batch (host/numpy).

    Matches reference ops/utils.py:17-26: samples with no positive labels are
    skipped; each sample's LRAP is weighted by its positive-label count.
    """
    truth = np.asarray(truth)
    scores = np.asarray(scores)
    pos = truth > 0
    n_labels = pos.sum(axis=1)
    keep = n_labels > 0
    if not np.any(keep):
        return 0.0
    total = 0.0
    for t_row, s_row in zip(pos[keep], scores[keep]):
        total += _sample_terms_np(t_row, s_row)
    return total / float(n_labels[keep].sum())


def lwlrap_jax(
    truth: jnp.ndarray,
    scores: jnp.ndarray,
    row_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Device lwlrap for (B, C) batches, C^2 pairwise — cheap at C=80.

    Jit/vmap/pjit-compatible: no data-dependent shapes. Zero-label rows
    contribute zero weight, mirroring the host version's row skipping.
    ``row_mask`` (B,) zeroes out padded rows (mesh pad duplicates) so the
    in-step metric matches the host metric over real samples.
    """
    pos = (truth > 0).astype(scores.dtype)  # (B, C)
    if row_mask is not None:
        pos = pos * row_mask.astype(scores.dtype)[:, None]
    # ge[b, i, j] = scores[b, j] >= scores[b, i]
    ge = (scores[:, None, :] >= scores[:, :, None]).astype(scores.dtype)
    ranks = jnp.sum(ge, axis=2)  # (B, C): # scores >= s_i
    hits = jnp.sum(ge * pos[:, None, :], axis=2)  # # true with score >= s_i
    per_label = jnp.where(ranks > 0, hits / ranks, 0.0) * pos
    total = jnp.sum(per_label)
    weight = jnp.sum(pos)
    return jnp.where(weight > 0, total / weight, 0.0)


def per_class_lwlrap(truth: np.ndarray, scores: np.ndarray):
    """(per-class lwlrap, per-class weight) — the canonical competition
    decomposition: overall lwlrap = sum(per_class * weight).

    Useful for diagnostics; not present in the reference but derivable from
    the same metric definition.
    """
    truth = np.asarray(truth) > 0
    scores = np.asarray(scores)
    n_samples, n_classes = truth.shape
    precisions = np.zeros_like(scores, dtype=np.float64)
    for i in range(n_samples):
        true_idx = np.flatnonzero(truth[i])
        if true_idx.size == 0:
            continue
        ge = scores[i][None, :] >= scores[i][true_idx][:, None]
        ranks = ge.sum(axis=1)
        ge_true = scores[i][true_idx][None, :] >= scores[i][true_idx][:, None]
        hits = ge_true.sum(axis=1)
        precisions[i, true_idx] = hits / ranks
    labels_per_class = truth.sum(axis=0)
    total_labels = labels_per_class.sum()
    with np.errstate(invalid="ignore", divide="ignore"):
        per_class = np.where(
            labels_per_class > 0,
            precisions.sum(axis=0) / np.maximum(labels_per_class, 1),
            0.0,
        )
    weight = labels_per_class / max(total_labels, 1)
    return per_class, weight
