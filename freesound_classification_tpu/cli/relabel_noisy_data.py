"""Pseudolabel the noisy subset from model predictions
(reference relabel_noisy_data.py). Five strategies selected by a
``<mode>_<param>`` descriptor:

- ``fullmatch_<cps>``             keep rows whose thresholded predictions
                                  exactly match the given labels
- ``relabelall_<cps>``            replace all labels with thresholded
                                  predictions, drop empty rows
- ``relabelall-replacenan_<cps>`` same, reference :146-160 variant
- ``relabelall-merge_<cps>``      union of old and new labels
- ``scoring_<topk>``              keep the top-k rows by per-sample
                                  label-ranking agreement (a per-sample lrap,
                                  reference :91-114)

The threshold for the ``*_<cps>`` modes is chosen so the mean number of
predicted classes per sample matches ``cps`` (reference find_threshold,
:62-73).
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd


def find_threshold(probs: np.ndarray,
                   expected_classes_per_sample: float) -> float:
    """Threshold whose mean classes/sample is closest to the target."""
    thresholds = np.linspace(0, 1, 10000)
    classes_per_sample = (
        probs[None, :, :] > thresholds[:, None, None]
    ).sum(-1).mean(-1)
    k = np.argmin(np.abs(classes_per_sample - expected_classes_per_sample))
    return float(thresholds[k])


def score_samples(y_true: np.ndarray, y_score: np.ndarray) -> np.ndarray:
    """Per-sample label-ranking average precision (reference :91-114):
    how well the model's ranking agrees with the given noisy labels."""
    from scipy.stats import rankdata

    n_samples, n_labels = y_true.shape
    neg = -y_score
    scores = np.ones(n_samples)
    for i in range(n_samples):
        relevant = np.flatnonzero(y_true[i] > 0)
        if relevant.size == 0 or relevant.size == n_labels:
            continue
        rank = rankdata(neg[i], "max")[relevant]
        L = rankdata(neg[i][relevant], "max")
        scores[i] = (L / rank).mean()
    return scores


def binarize(labels_series, class_cols) -> np.ndarray:
    idx = {c: i for i, c in enumerate(class_cols)}
    out = np.zeros((len(labels_series), len(class_cols)), dtype=np.float32)
    for k, item in enumerate(labels_series):
        for label in str(item).split(","):
            if label:
                out[k, idx[label]] = 1
    return out


def binary_to_labels(binary: np.ndarray, class_cols) -> list:
    return [
        ",".join(class_cols[k] for k in np.flatnonzero(row))
        for row in binary
    ]


def merge_labels(first, second) -> list:
    merged = []
    for f, s in zip(first, second):
        m = set(str(f).split(",")) | set(str(s).split(","))
        m.discard("")
        merged.append(",".join(sorted(m)))
    return merged


def relabel(noisy_df: pd.DataFrame, predictions_df: pd.DataFrame,
            mode_descriptor: str) -> pd.DataFrame:
    noisy_df = noisy_df.sort_values("fname").reset_index(drop=True)
    predictions_df = predictions_df.sort_values("fname").reset_index(drop=True)

    mode, *params = mode_descriptor.split("_")
    class_cols = [c for c in predictions_df.columns if c != "fname"]
    probs = predictions_df[class_cols].values
    noisy_labels = binarize(noisy_df.labels.values, class_cols)

    if mode == "fullmatch":
        threshold = find_threshold(probs, float(params[0]))
        binary = probs > threshold
        match = (binary == (noisy_labels > 0)).all(-1)
        return noisy_df[match]

    if mode in ("relabelall", "relabelall-replacenan"):
        threshold = find_threshold(probs, float(params[0]))
        binary = probs > threshold
        new_labels = pd.Series(binary_to_labels(binary, class_cols))
        out = noisy_df.copy()
        out["labels"] = new_labels.values
        return out[out.labels != ""].reset_index(drop=True)

    if mode == "relabelall-merge":
        threshold = find_threshold(probs, float(params[0]))
        binary = probs > threshold
        new_labels = binary_to_labels(binary, class_cols)
        out = noisy_df.copy()
        out["labels"] = merge_labels(noisy_df.labels.values, new_labels)
        return out

    if mode == "scoring":
        topk = int(params[0])
        scores = score_samples(noisy_labels, probs)
        selection = np.argsort(-scores)[:topk]
        return noisy_df.iloc[selection]

    raise ValueError(f"unknown relabel mode {mode_descriptor!r}")


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--noisy_df", required=True, type=str)
    parser.add_argument("--noisy_predictions_df", required=True, type=str)
    parser.add_argument("--output_df", required=True, type=str)
    parser.add_argument("--mode", required=True, type=str)
    args = parser.parse_args(argv)

    relabeled = relabel(
        pd.read_csv(args.noisy_df),
        pd.read_csv(args.noisy_predictions_df),
        args.mode,
    )
    print("Relabeled df shape:", relabeled.shape)
    relabeled.to_csv(args.output_df, index=False)


if __name__ == "__main__":
    main()
