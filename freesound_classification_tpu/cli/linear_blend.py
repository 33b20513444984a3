"""Linear-blend ensembling (reference linear_blend.py): COBYLA optimization
of per-experiment blend weights maximizing OOF lwlrap, then apply the weights
to each experiment's per-fold test predictions.

Two reference bugs are fixed (and documented): the test loop used a stale
``experiment`` variable instead of the loop one (linear_blend.py:121-122),
and each experiment's folds were summed without normalization — here each
experiment contributes its fold-mean prediction scaled by its weight.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
import pandas as pd


def to_ranks(values: np.ndarray) -> np.ndarray:
    from scipy.stats import rankdata

    return np.array([rankdata(r) for r in values])


def load_oof_predictions(experiment_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(
        os.path.join(experiment_dir, "predictions", "val_preds*")))
    dfs = [pd.read_csv(f) for f in files]
    df = pd.concat(dfs).reset_index(drop=True)
    df = df.sort_values("fname")
    return df[sorted(df.columns.tolist())]


def load_test_predictions(experiment_dir: str) -> list:
    files = sorted(glob.glob(
        os.path.join(experiment_dir, "predictions", "test_preds*")))
    return [pd.read_csv(f).sort_values("fname") for f in files]


def optimize_blend(prediction_values, actual_labels):
    """COBYLA weight search (reference :79-100): alphas in [0, 1], sum in
    [0.01, 0.99], maximizing lwlrap of the weighted OOF sum."""
    import scipy.optimize

    from freesound_classification_tpu.ops.metrics import lwlrap

    n = len(prediction_values)

    def constraints():
        yield scipy.optimize.LinearConstraint(A=np.ones(n), lb=0.01, ub=0.99)
        for k in range(n):
            A = np.zeros(n)
            A[k] = 1
            yield scipy.optimize.LinearConstraint(A=A, lb=0, ub=1)

    def target(alphas):
        blended = np.sum(
            [a * p for a, p in zip(alphas, prediction_values)], axis=0)
        return -lwlrap(actual_labels, blended)

    result = scipy.optimize.minimize(
        target, np.ones(n) / n, constraints=list(constraints()),
        method="COBYLA")
    return result.x, -target(result.x)


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--experiments", type=str, required=True, nargs="+",
                        help="experiment directories to blend")
    parser.add_argument("--train_df", type=str, required=True)
    parser.add_argument("--rankdata", action="store_true", default=False)
    parser.add_argument("--output_df", type=str, required=True)
    args = parser.parse_args(argv)

    predictions = [load_oof_predictions(e) for e in args.experiments]
    class_cols = [c for c in predictions[0].columns if c != "fname"]
    prediction_values = [p[class_cols].values for p in predictions]
    if args.rankdata:
        prediction_values = [to_ranks(p) for p in prediction_values]

    train_df = pd.read_csv(args.train_df)
    idx = {c: i for i, c in enumerate(class_cols)}
    actual = np.zeros((len(train_df), len(class_cols)), dtype=np.float32)
    order = {f: k for k, f in enumerate(sorted(train_df.fname.values))}
    for fname, labels in zip(train_df.fname.values, train_df.labels.values):
        for label in str(labels).split(","):
            if label:
                actual[order[fname], idx[label]] = 1

    alphas, best = optimize_blend(prediction_values, actual)
    print()
    for experiment, alpha in zip(args.experiments, alphas):
        print(f"{experiment}: {alpha}")
    print(f"\nFinal lwlrap: {best}")

    test_blend = None
    fname = None
    for alpha, exp in zip(alphas, args.experiments):
        fold_dfs = load_test_predictions(exp)
        fold_mean = np.mean(
            [
                to_ranks(d[class_cols].values) if args.rankdata
                else d[class_cols].values
                for d in fold_dfs
            ],
            axis=0,
        )
        fname = fold_dfs[0].fname.values
        test_blend = (
            alpha * fold_mean if test_blend is None
            else test_blend + alpha * fold_mean
        )

    sub = pd.DataFrame(test_blend, columns=class_cols)
    sub["fname"] = fname
    sub = sub[["fname"] + class_cols]
    sub.to_csv(args.output_df, index=False)
    print(f"wrote {args.output_df}")


if __name__ == "__main__":
    main()
