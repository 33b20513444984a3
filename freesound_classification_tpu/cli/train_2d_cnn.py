"""Train the 2d mel-spectrogram CNN (reference train_2d_cnn.py).

Per-fold training with OOF/test prediction CSVs, holdout evaluation, global
OOF lwlrap and 5-fold-mean submission.csv, flag-compatible with the reference
(plus TPU extras; see cli/common.py).
"""

import argparse

from freesound_classification_tpu.cli import common


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    common.add_train_arguments(parser)
    args = parser.parse_args(argv)
    common.run_training(args, "2d_cnn")


if __name__ == "__main__":
    main()
