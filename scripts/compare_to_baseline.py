"""Parity report: this repo's OOF lwlrap vs the reference's.

Reads a finished experiment (results.json + predictions/val_preds_fold_k.csv,
the same artifacts the reference's train_2d_cnn.py:456-511 writes), recomputes
the global OOF lwlrap from the raw OOF predictions, and prints:

- the global OOF lwlrap (and the per-fold metrics),
- ``lwlrap delta vs reference`` when ``--reference_lwlrap`` is given
  (pass/fail at the BASELINE.md 0.005 tolerance),
- a per-class lwlrap diff table when ``--reference_oof_dir`` points at a
  reference experiment's predictions/ directory (val_preds_fold_*.csv with
  the same fname + class-probability schema).

Used by scripts/reproduce_reference.sh; runs standalone too:

    python scripts/compare_to_baseline.py --experiment experiments/<name> \
        --train_df data/train_curated.csv --classmap data/classmap.json \
        --reference_lwlrap 0.86
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np
import pandas as pd

TOLERANCE = 0.005  # BASELINE.md: match reference lwlrap within 0.005


def load_oof(pred_dir: str, class_names: list[str]) -> pd.DataFrame:
    paths = sorted(glob.glob(os.path.join(pred_dir, "val_preds_fold_*.csv")))
    if not paths:
        raise FileNotFoundError(f"no val_preds_fold_*.csv under {pred_dir}")
    df = pd.concat([pd.read_csv(p) for p in paths]).reset_index(drop=True)
    missing = [c for c in class_names if c not in df.columns]
    if missing:
        raise ValueError(f"OOF predictions missing class columns {missing}")
    return df


def oof_lwlrap(oof: pd.DataFrame, train_df: pd.DataFrame,
               class_map: dict, class_names: list[str]):
    from freesound_classification_tpu.data.folds import binarize_label_strings
    from freesound_classification_tpu.ops.metrics import (
        lwlrap,
        per_class_lwlrap,
    )

    merged = oof.merge(train_df[["fname", "labels"]], on="fname",
                       validate="one_to_one")
    truth = binarize_label_strings(
        [str(v) for v in merged.labels.values], class_map)
    scores = merged[class_names].values.astype(np.float64)
    per_class, weights = per_class_lwlrap(truth, scores)
    return lwlrap(truth, scores), per_class, weights, merged


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", required=True)
    p.add_argument("--train_df", required=True)
    p.add_argument("--classmap", required=True)
    p.add_argument("--reference_lwlrap", type=float, default=None)
    p.add_argument("--reference_oof_dir", type=str, default=None)
    p.add_argument("--top_diffs", type=int, default=15,
                   help="per-class rows to print in the diff table")
    args = p.parse_args(argv)

    with open(args.classmap) as f:
        class_map = json.load(f)
    class_names = [c for c, _ in sorted(class_map.items(),
                                        key=lambda kv: kv[1])]
    train_df = pd.read_csv(args.train_df)

    with open(os.path.join(args.experiment, "results.json")) as f:
        results = json.load(f)
    fold_metrics = {k: v["metric"] for k, v in results.items()
                    if k.startswith("fold") and isinstance(v, dict)
                    and "metric" in v}

    oof = load_oof(os.path.join(args.experiment, "predictions"), class_names)
    ours, per_class, weights, merged = oof_lwlrap(
        oof, train_df, class_map, class_names)

    print(f"experiment: {args.experiment}")
    for k in sorted(fold_metrics):
        print(f"  {k}: lwlrap {fold_metrics[k]:.5f}")
    print(f"global OOF lwlrap (recomputed from {len(oof)} OOF rows): "
          f"{ours:.5f}")
    if "metric" in results:
        drift = abs(results["metric"] - ours)
        print(f"results.json metric: {results['metric']:.5f} "
              f"(recompute drift {drift:.2e})")

    status = 0
    if args.reference_lwlrap is not None:
        delta = ours - args.reference_lwlrap
        verdict = "PASS" if delta >= -TOLERANCE else "FAIL"
        print(f"lwlrap delta vs reference: {delta:+.5f} "
              f"(reference {args.reference_lwlrap:.5f}, tolerance "
              f"-{TOLERANCE}) -> {verdict}")
        if verdict == "FAIL":
            status = 1

    if args.reference_oof_dir:
        ref_oof = load_oof(args.reference_oof_dir, class_names)
        ref_l, ref_pc, _, _ = oof_lwlrap(
            ref_oof, train_df, class_map, class_names)
        delta = ours - ref_l
        verdict = "PASS" if delta >= -TOLERANCE else "FAIL"
        print(f"reference OOF lwlrap (recomputed): {ref_l:.5f}; "
              f"delta {delta:+.5f} -> {verdict}")
        if verdict == "FAIL":
            status = 1
        diffs = per_class - ref_pc
        order = np.argsort(diffs)
        print(f"largest per-class regressions (ours - reference), "
              f"weight = label prevalence:")
        for i in order[: args.top_diffs]:
            print(f"  {class_names[i]:>40s}  d={diffs[i]:+.4f}  "
                  f"ours={per_class[i]:.4f} ref={ref_pc[i]:.4f} "
                  f"w={weights[i]:.4f}")

    return status


if __name__ == "__main__":
    sys.exit(main())
