"""Build the class-name -> index JSON vocabulary
(reference create_class_map.py:23-33): union of comma-split labels across
the provided dataframes, sorted, enumerated."""

import argparse
import json

import pandas as pd


def create_class_map(dfs) -> dict:
    classes = set()
    for df in dfs:
        for item in df.labels.values:
            classes.update(str(item).split(","))
    return {c: i for i, c in enumerate(sorted(classes))}


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument(
        "--train_dfs", required=True, type=str, nargs="+",
        help="train dataframes with a 'labels' column")
    parser.add_argument("--output_file", required=True, type=str)
    args = parser.parse_args(argv)

    class_map = create_class_map([pd.read_csv(f) for f in args.train_dfs])
    with open(args.output_file, "w") as f:
        json.dump(class_map, f, indent=2, sort_keys=True)
    print(f"wrote {len(class_map)} classes to {args.output_file}")


if __name__ == "__main__":
    main()
