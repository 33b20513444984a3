"""Train the resnet18/34 backbone classifier
(reference train_backbone_cnn.py)."""

import argparse

from freesound_classification_tpu.cli import common


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    common.add_train_arguments(parser)
    parser.add_argument(
        "--backbone", type=str, default="resnet18",
        choices=("resnet18", "resnet34"),
    )
    args = parser.parse_args(argv)

    # thread the backbone choice into the network config
    orig = common.experiment_config

    def with_backbone(a, model_label, n_classes, input_dim, extra_network=None):
        extra = dict(extra_network or {})
        extra["backbone"] = args.backbone
        return orig(a, model_label, n_classes, input_dim, extra)

    common.experiment_config = with_backbone
    try:
        common.run_training(args, "backbone_cnn")
    finally:
        common.experiment_config = orig


if __name__ == "__main__":
    main()
