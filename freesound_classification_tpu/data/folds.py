"""K-fold split generators (reference ops/folds.py:6-24).

- ``train_validation_data``: plain shuffled KFold (noisy set).
- ``train_validation_data_stratified``: multilabel-stratified KFold (curated
  set). The reference uses ``iterstrat.ml_stratifiers.MultilabelStratifiedKFold``;
  that package is a pure-Python implementation of Sechidis et al. (2011)
  iterative stratification, re-implemented here from the algorithm so fold
  *semantics* (balanced per-class label counts across folds, deterministic
  under a seed) are preserved without the dependency.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
from sklearn.model_selection import KFold


def train_validation_data(ids, labels, n_folds: int, seed: int):
    """Plain shuffled KFold, reference ops/folds.py:6-10."""
    for train, valid in KFold(
        n_folds, shuffle=True, random_state=seed
    ).split(np.arange(len(ids))):
        yield train, valid


def iterative_stratification(
    labels: np.ndarray, r: np.ndarray, random_state: np.random.RandomState
) -> np.ndarray:
    """Assign each sample to a fold via iterative stratification.

    Sechidis, Tsoumakas & Vlahavas, "On the Stratification of Multi-Label
    Data" (ECML 2011). This port mirrors the control flow AND the RNG call
    order of the iterstrat package (trent-b/iterative-stratification, MIT)
    that the reference depends on (reference ops/folds.py:2,22-24), so fold
    membership is reproducible against reference runs under the same seed:

    - the per-round target label is the one with the fewest remaining
      (nonzero) examples; ties broken by one ``random_state.choice`` draw;
    - samples carrying the target label are processed in ascending index
      order (no shuffle here — the caller shuffles globally);
    - each sample goes to the fold with the largest remaining desire for
      the label; ties broken by the largest remaining overall desire, then
      one ``random_state.choice`` draw;
    - leftover all-zero-label samples fill the fold with the largest
      remaining overall desire.
    """
    labels = np.asarray(labels, dtype=bool)
    n_samples = labels.shape[0]
    test_folds = np.zeros(n_samples, dtype=int)

    # desired number of samples / of per-class labels at each fold
    c_folds = r * n_samples
    c_folds_labels = np.outer(r, labels.sum(axis=0))

    not_processed = np.ones(n_samples, dtype=bool)
    while np.any(not_processed):
        num_labels = labels[not_processed].sum(axis=0)
        if num_labels.sum() == 0:
            # only all-zero-label samples remain
            for sample_idx in np.where(not_processed)[0]:
                fold_idx = np.argmax(c_folds)
                test_folds[sample_idx] = fold_idx
                c_folds[fold_idx] -= 1
            break

        # label with the fewest (but >=1) remaining examples; random tie
        label_idx = np.where(
            num_labels == num_labels[np.nonzero(num_labels)[0]].min()
        )[0]
        if label_idx.shape[0] > 1:
            label_idx = label_idx[random_state.choice(label_idx.shape[0])]

        sample_idxs = np.where(
            np.logical_and(labels[:, label_idx].flatten(), not_processed)
        )[0]
        for sample_idx in sample_idxs:
            # fold desiring this label most; ties -> most desired samples
            # overall; further ties -> random
            label_folds = c_folds_labels[:, label_idx]
            fold_idx = np.where(label_folds == label_folds.max())[0]
            if fold_idx.shape[0] > 1:
                temp_fold_idx = np.where(
                    c_folds[fold_idx] == c_folds[fold_idx].max()
                )[0]
                fold_idx = fold_idx[temp_fold_idx]
                if temp_fold_idx.shape[0] > 1:
                    fold_idx = fold_idx[
                        random_state.choice(temp_fold_idx.shape[0])]
            fold_idx = int(np.atleast_1d(fold_idx)[0])
            test_folds[sample_idx] = fold_idx
            not_processed[sample_idx] = False
            c_folds_labels[fold_idx, labels[sample_idx]] -= 1
            c_folds[fold_idx] -= 1

    return test_folds


class MultilabelStratifiedKFold:
    """Drop-in equivalent of iterstrat's MultilabelStratifiedKFold,
    including its shuffle mechanism (shuffle the sample order once, fold on
    the shuffled labels, un-shuffle the assignment)."""

    def __init__(self, n_splits: int, shuffle: bool = True,
                 random_state: int | None = None):
        self.n_splits = n_splits
        self.shuffle = shuffle
        self.random_state = random_state

    def _make_test_folds(self, y: np.ndarray) -> np.ndarray:
        y = np.asarray(y, dtype=bool)
        rng = (
            np.random.RandomState(self.random_state)
            if not isinstance(self.random_state, np.random.RandomState)
            else self.random_state
        )
        indices = np.arange(y.shape[0])
        if self.shuffle:
            rng.shuffle(indices)
            y = y[indices]
        r = np.asarray([1 / self.n_splits] * self.n_splits)
        test_folds = iterative_stratification(y, r, rng)
        return test_folds[np.argsort(indices)]

    def split(self, X, y) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        fold_of = self._make_test_folds(np.asarray(y))
        indices = np.arange(len(fold_of))
        for fold in range(self.n_splits):
            valid = indices[fold_of == fold]
            train = indices[fold_of != fold]
            yield train, valid


def binarize_label_strings(label_strings, classmap: dict) -> np.ndarray:
    """Comma-separated class-name strings -> (N, C) binary matrix
    (reference ops/folds.py:16-20 / ops/transforms.py:25-41)."""
    out = np.zeros((len(label_strings), len(classmap)), dtype=np.float32)
    for k, item in enumerate(label_strings):
        for label in str(item).split(","):
            out[k, classmap[label]] = 1.0
    return out


def train_validation_data_stratified(
    ids, labels, classmap: dict, n_folds: int, seed: int
):
    """Reference ops/folds.py:13-24: stratified splits over the curated set."""
    label_values = labels.values if hasattr(labels, "values") else labels
    binary = binarize_label_strings(list(label_values), classmap)
    for train, valid in MultilabelStratifiedKFold(
        n_folds, shuffle=True, random_state=seed
    ).split(np.arange(len(binary)), binary):
        yield train, valid
