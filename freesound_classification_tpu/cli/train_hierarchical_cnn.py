"""Train the 1d hierarchical CNN on raw-STFT/mel/raw features
(reference train_hierarchical_cnn.py — structurally identical to the 2d
driver, SURVEY.md §3.1)."""

import argparse

from freesound_classification_tpu.cli import common


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    common.add_train_arguments(parser)
    args = parser.parse_args(argv)
    common.run_training(args, "hierarchical_cnn")


if __name__ == "__main__":
    main()
