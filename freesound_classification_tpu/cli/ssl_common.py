"""Shared driver for the self-supervised pretraining CLIs
(reference train_apc.py / train_cpc.py — same skeleton as the classifier
scripts minus prediction/submission stages, SURVEY.md §3.6): plain KFold over
(typically noisy) audio, model-internal losses, validation score = -loss,
periodic KNN/TSNE projection summaries."""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd

from freesound_classification_tpu.cli import common
from freesound_classification_tpu.data.dataset import (
    ClipDataset,
    load_classmap,
    manifest_from_dataframe,
)
from freesound_classification_tpu.data.folds import train_validation_data
from freesound_classification_tpu.data.loader import make_loader
from freesound_classification_tpu.models.frontend import Frontend
from freesound_classification_tpu.parallel import mesh as mesh_lib
from freesound_classification_tpu.training.engine import Engine
from freesound_classification_tpu.utils.experiment import Experiment


def add_ssl_arguments(parser: argparse.ArgumentParser) -> None:
    """Flag surface of reference train_apc.py:24-148 / train_cpc.py."""
    req = parser.add_argument
    req("--train_df", required=True, type=str)
    req("--train_data_dir", required=True, type=str)
    req("--classmap", required=True, type=str)
    req("--resume", action="store_true", default=False)
    req("--log_interval", default=10, type=int)
    req("--batch_size", type=int, default=32)
    req("--max_audio_length", type=int, default=10)
    req("--lr", default=0.001, type=float)
    req("--max_samples", type=int)
    req("--epochs", default=100, type=int)
    req("--scheduler", type=str, default="steplr_1_0.5")
    req("--accumulation_steps", type=int, default=1)
    req("--save_every", type=int, default=1)
    req("--keep_checkpoints", type=int, default=0,
        help="keep only the newest K periodic checkpoints (0 = all)")
    req("--device", type=str, default="tpu", choices=("tpu", "cpu", "cuda"))
    req("--weight_decay", type=float, default=1e-5)
    req("--p_aug", type=float, default=0.0)
    req("--switch_off_augmentations_on", type=int, default=10**9)
    req("--features", type=str, required=True)
    req("--optimizer", type=str, required=True, choices=("adam", "momentum"))
    req("--folds", type=int, required=True, nargs="+")
    req("--n_folds", type=int, default=4)
    req("--kfold_seed", type=int, default=42)
    req("--num_workers", type=int, default=4)
    req("--label", type=str, default="ssl")
    req("--proj_interval", type=int, default=10,
        help="epochs between KNN/TSNE projection summaries")
    req("--rnn_size", type=int, default=256)
    req("--rnn_layers", type=int, default=3)
    req("--prediction_steps", type=int, default=3)
    req("--context_size", type=int, default=256)
    req("--n_encoder_layers", type=int, default=5)
    req("--conv_base_depth", type=int, default=32)
    req("--growth_rate", type=float, default=2.0)
    req("--experiments_dir", type=str, default="experiments")
    req("--mesh_devices", type=int, default=None)


def build_ssl_model(kind: str, args):
    import jax.numpy as jnp

    if kind == "apc":
        from freesound_classification_tpu.models.apc import APCModel

        return APCModel(
            rnn_size=args.rnn_size,
            rnn_layers=args.rnn_layers,
            prediction_steps=args.prediction_steps,
        )
    if kind == "cpc":
        from freesound_classification_tpu.models.cpc import CPCModel

        return CPCModel(
            n_encoder_layers=args.n_encoder_layers,
            conv_base_depth=args.conv_base_depth,
            growth_rate=args.growth_rate,
            context_size=args.context_size,
            prediction_steps=args.prediction_steps,
        )
    raise ValueError(kind)


def ssl_config(args, kind: str, n_classes: int, input_dim: int) -> dict:
    network = {
        "prediction_steps": args.prediction_steps,
    }
    if kind == "apc":
        network.update(rnn_size=args.rnn_size, rnn_layers=args.rnn_layers)
    else:
        network.update(
            context_size=args.context_size,
            n_encoder_layers=args.n_encoder_layers,
            conv_base_depth=args.conv_base_depth,
            growth_rate=args.growth_rate,
        )
    return {
        "network": network,
        "data": {
            "features": args.features,
            "_n_folds": args.n_folds,
            "_kfold_seed": args.kfold_seed,
            "_input_dim": input_dim,
            "_n_classes": n_classes,
            "p_aug": args.p_aug,
            "max_audio_length": args.max_audio_length,
            "_train_df": args.train_df,
            "_train_data_dir": args.train_data_dir,
        },
        "train": {
            "accumulation_steps": args.accumulation_steps,
            "batch_size": args.batch_size,
            "learning_rate": args.lr,
            "scheduler": args.scheduler,
            "optimizer": args.optimizer,
            "epochs": args.epochs,
            "_save_every": args.save_every,
            "_keep_checkpoints": args.keep_checkpoints,
            "weight_decay": args.weight_decay,
            "switch_off_augmentations_on": args.switch_off_augmentations_on,
            "_proj_interval": args.proj_interval,
        },
        "label": args.label,
    }


def run_ssl_training(args, kind: str) -> None:
    common.initialize_accelerator(getattr(args, "device", "tpu"))
    from freesound_classification_tpu.ops.augment import (
        AugmentConfig,
        make_augmenter,
    )
    from freesound_classification_tpu.ops.dsp import parse_features

    class_map = load_classmap(args.classmap)
    input_dim = parse_features(args.features).n_features
    config = ssl_config(args, kind, len(class_map), input_dim)

    with Experiment(
        config, implicit_resuming=args.resume,
        experiments_dir=args.experiments_dir,
    ) as experiment:
        print("\n     ////// CONFIG //////")
        print(experiment.config)

        train_df = pd.read_csv(args.train_df)
        if args.max_samples:
            train_df = train_df.sample(
                args.max_samples, random_state=args.kfold_seed
            ).reset_index(drop=True)

        splits = list(train_validation_data(
            train_df.fname, train_df.labels, args.n_folds, args.kfold_seed))

        ladder = common.default_ladder(args.max_audio_length)
        checkpoints = experiment.register_directory("checkpoints")
        summaries = experiment.register_directory("summaries")

        for fold in args.folds:
            print(f"\n\n   -----  Fold {fold}\n")
            train_idx, valid_idx = splits[fold]

            files, labels = manifest_from_dataframe(
                train_df.iloc[train_idx], args.train_data_dir)
            train_ds = ClipDataset(
                files, raw_labels=labels, classmap=class_map,
                max_audio_length=args.max_audio_length,
                seed=args.kfold_seed + fold,
            )
            vfiles, vlabels = manifest_from_dataframe(
                train_df.iloc[valid_idx], args.train_data_dir)
            valid_ds = ClipDataset(
                vfiles, raw_labels=vlabels, classmap=class_map,
                max_audio_length=args.max_audio_length,
            )

            model = build_ssl_model(kind, args)
            frontend = Frontend(args.features, "1d", sr=common.SR)
            augment = make_augmenter(AugmentConfig(p_aug=args.p_aug))
            mesh = mesh_lib.make_mesh(args.mesh_devices)

            def writer_factory(fold_, split):
                try:
                    from tensorboardX import SummaryWriter
                    import os

                    return SummaryWriter(log_dir=os.path.join(
                        summaries, f"fold_{fold_}", split))
                except Exception:
                    return None

            engine = Engine(
                model, frontend, experiment.config.train,
                augment=augment, checkpoint_dir=checkpoints, mesh=mesh,
                self_supervised=True,
                summary_writer_factory=writer_factory,
            )

            train_loader = make_loader(
                train_ds, ladder, batch_size=args.batch_size,
                train=True, seed=args.kfold_seed,
                size_multiple=mesh.devices.size,
                num_workers=args.num_workers,
            )
            valid_loader = make_loader(
                valid_ds, ladder, batch_size=args.batch_size,
                train=False, num_workers=args.num_workers,
            )

            scores = engine.fit_validate(
                train_loader, valid_loader,
                epochs=args.epochs, fold=fold,
                log_interval=args.log_interval,
                resume=args.resume,
            )
            experiment.register_result(f"fold{fold}.metric", max(scores))
            engine.save_checkpoint(fold, "final_model")

            # representation diagnostics (reference apc.py:226-231)
            try:
                from freesound_classification_tpu.utils.projection import (
                    projection_summary,
                )

                projection_summary(
                    engine, valid_loader, summaries, fold,
                    step=engine.global_step,
                )
            except Exception as e:  # diagnostics must never kill training
                print(f"projection summary skipped: {e}")


def main_apc(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_ssl_arguments(parser)
    args = parser.parse_args(argv)
    run_ssl_training(args, "apc")


def main_cpc(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_ssl_arguments(parser)
    args = parser.parse_args(argv)
    run_ssl_training(args, "cpc")
