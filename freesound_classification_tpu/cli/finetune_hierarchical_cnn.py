"""Finetune a (typically SSL- or noisy-set-pretrained) hierarchical CNN on
the curated set (reference finetune_hierarchical_cnn.py): the network
architecture and STFT featurization come from the pretrained experiment's
config, and every fold warm-starts from the pretrained fold's best
checkpoint.

The reference switches to CPU scipy-STFT featurization in this script
(finetune_hierarchical_cnn.py:237-249); here featurization stays on-device —
the descriptor ``stft_<n_fft>_<hop>`` reproduces the same features without
the host detour.
"""

from __future__ import annotations

import argparse
import os

from freesound_classification_tpu.cli import common
from freesound_classification_tpu.utils.experiment import Experiment


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    common.add_train_arguments(parser)
    parser.add_argument("--pretrained_model", required=True, type=str,
                        help="path to the pretrained experiment directory")
    parser.add_argument("--pretrained_fold", required=True, type=int)
    args = parser.parse_args(argv)

    pretrained = Experiment(resume_from=args.pretrained_model)
    pcfg = pretrained.config

    # architecture + featurization come from the pretrained experiment
    # (reference :156-169)
    args.num_conv_blocks = int(pcfg.network.num_conv_blocks)
    args.start_deep_supervision_on = int(
        pcfg.network.start_deep_supervision_on)
    args.conv_base_depth = int(pcfg.network.conv_base_depth)
    args.growth_rate = float(pcfg.network.growth_rate)
    args.features = str(pcfg.data.features)

    # threaded through build_engine's warm_start_path parameter — every
    # fold's engine seeds params/batch_stats from the pretrained fold's
    # best checkpoint (reference :170-180 load_state_dict warm start)
    args.warm_start_path = os.path.join(
        args.pretrained_model, "checkpoints",
        f"fold_{args.pretrained_fold}", "best_model")
    common.run_training(args, "hierarchical_cnn")


if __name__ == "__main__":
    main()
