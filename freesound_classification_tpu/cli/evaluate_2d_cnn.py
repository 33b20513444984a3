"""Recompute per-fold and overall OOF lwlrap for a trained experiment
(reference evaluate_2d_cnn.py), with optional test-time augmentation.

(The reference script has a latent TypeError — ShuffleAudio(chunks_range=...),
evaluate_2d_cnn.py:119 vs transforms.py:258 — which this version does not
reproduce; TTA here re-runs prediction with train-mode augmentation disabled
but loader-side crops resampled.)
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd

from freesound_classification_tpu.cli import common
from freesound_classification_tpu.cli.predict_2d_cnn import (
    build_inference_engine,
)
from freesound_classification_tpu.data.dataset import (
    ClipDataset,
    load_classmap,
    manifest_from_dataframe,
)
from freesound_classification_tpu.data.folds import (
    binarize_label_strings,
    train_validation_data_stratified,
)
from freesound_classification_tpu.data.loader import make_loader
from freesound_classification_tpu.ops.metrics import lwlrap
from freesound_classification_tpu.utils.experiment import Experiment


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--experiment", required=True, type=str)
    parser.add_argument("--train_df", required=True, type=str)
    parser.add_argument("--train_data_dir", required=True, type=str)
    parser.add_argument("--classmap", required=True, type=str)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--n_tta", type=int, default=1)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--model_kind", type=str, default="2d_cnn",
                        choices=("2d_cnn", "hierarchical_cnn", "backbone_cnn"))
    parser.add_argument("--mesh_devices", type=int, default=None)
    parser.add_argument("--tta_max_audio_length", type=int, default=None,
                        help="with --n_tta > 1, random-crop clips to this "
                             "many seconds per TTA pass (the reference's "
                             "stochastic eval transforms)")
    parser.add_argument("--tta_noise_snr_db", type=float, default=0.0,
                        help="with --n_tta > 1, add white noise this many dB "
                             "below clip RMS on passes > 0 (0 = off)")
    parser.add_argument("--tta_shift_max_s", type=float, default=0.0,
                        help="with --n_tta > 1, random right time-shift up "
                             "to this many seconds on passes > 0 (0 = off)")
    parser.add_argument("--tta_shuffle_p", type=float, default=0.0,
                        help="with --n_tta > 1, shuffle 0.5 s chunks with "
                             "this probability on passes > 0 (the "
                             "reference's intended-but-broken ShuffleAudio "
                             "TTA, evaluate_2d_cnn.py:119; 0 = off)")
    parser.add_argument("--per_class", action="store_true", default=False,
                        help="print the per-class lwlrap decomposition")
    parser.add_argument("--device", type=str, default="tpu",
                        choices=("tpu", "cpu"),
                        help="backend to run evaluation on (reference "
                             "evaluate_2d_cnn.py:69 --device)")
    args = parser.parse_args(argv)
    common.reject_degenerate_tta(parser, args)
    common.initialize_accelerator(args.device)

    experiment = Experiment(resume_from=args.experiment)
    class_map = load_classmap(args.classmap)
    n_folds = int(experiment.config.data._n_folds)
    kfold_seed = int(experiment.config.data._kfold_seed)

    train_df = pd.read_csv(args.train_df)
    splits = list(train_validation_data_stratified(
        train_df.fname, train_df.labels, class_map, n_folds, kfold_seed))

    ladder = common.default_ladder(None)
    fold_metrics = []
    all_probs, all_labels = [], []
    for fold in range(n_folds):
        _, valid_idx = splits[fold]
        vfiles, vlabels = manifest_from_dataframe(
            train_df.iloc[valid_idx], args.train_data_dir)
        tta_crops = args.n_tta > 1 and args.tta_max_audio_length is not None
        ds = ClipDataset(
            vfiles, raw_labels=vlabels, classmap=class_map, sr=common.SR,
            max_audio_length=(args.tta_max_audio_length if tta_crops
                              else None),
            seed=kfold_seed + fold,
        )
        loader = make_loader(
            ds, ladder, batch_size=args.batch_size,
            # train=True makes each TTA pass re-draw the random crop
            # (the reference's stochastic eval transforms,
            # evaluate_2d_cnn.py:115-121)
            train=tta_crops, shuffle=False, drop_last=False,
            num_workers=args.num_workers)
        engine = build_inference_engine(
            args, experiment, args.model_kind, fold, loader)
        import jax

        tta_fn = common.make_tta_fn(
            args.tta_noise_snr_db, args.tta_shift_max_s,
            shuffle_p=args.tta_shuffle_p)
        preds = np.mean(
            [common.predict_ordered(
                engine, loader,
                tta_fn=(tta_fn if t > 0 else None),
                tta_key=jax.random.PRNGKey(1000 * fold + t))
             for t in range(max(args.n_tta, 1))], axis=0)
        labels = binarize_label_strings(
            [str(v) for v in train_df.labels.values[valid_idx]], class_map)
        m = lwlrap(labels, preds)
        print(f"fold {fold}: lwlrap {m:.4f}")
        fold_metrics.append(m)
        all_probs.append(preds)
        all_labels.append(labels)

    overall = lwlrap(np.concatenate(all_labels), np.concatenate(all_probs))
    print(f"\nmean fold lwlrap: {np.mean(fold_metrics):.4f}")
    print(f"overall OOF lwlrap: {overall:.4f}")

    if args.per_class:
        from freesound_classification_tpu.data.dataset import (
            class_names_from_classmap,
        )
        from freesound_classification_tpu.ops.metrics import per_class_lwlrap

        per_class, weight = per_class_lwlrap(
            np.concatenate(all_labels), np.concatenate(all_probs))
        names = class_names_from_classmap(class_map)
        pd.options.display.max_rows = 200
        print(pd.DataFrame({
            "classname": names,
            "lwlrap": per_class,
            "weight": weight,
        }).sort_values("lwlrap"))


if __name__ == "__main__":
    main()
