"""Predict with a trained experiment's per-fold best models
(reference predict_2d_cnn.py): load config via resume_from, run every fold's
best checkpoint over a test CSV, average probabilities, write one CSV with
``fname`` + the 80 sorted class-name columns — the schema every downstream
tool (relabeling, blending, submission) consumes.
"""

from __future__ import annotations

import argparse
import os
import types

import numpy as np
import pandas as pd

from freesound_classification_tpu.cli import common
from freesound_classification_tpu.data.dataset import (
    ClipDataset,
    class_names_from_classmap,
    load_classmap,
    manifest_from_dataframe,
)
from freesound_classification_tpu.data.loader import make_loader
from freesound_classification_tpu.utils.experiment import Experiment


def add_predict_arguments(parser):
    parser.add_argument("--experiment", required=True, type=str,
                        help="path to the experiment directory")
    parser.add_argument("--test_df", required=True, type=str)
    parser.add_argument("--test_data_dir", required=True, type=str)
    parser.add_argument("--classmap", required=True, type=str)
    parser.add_argument("--output_df", required=True, type=str)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--n_tta", type=int, default=1)
    parser.add_argument("--tta_max_audio_length", type=int, default=None,
                        help="with --n_tta > 1, random-crop clips to this "
                             "many seconds per TTA pass (the reference's "
                             "only TTA mode)")
    parser.add_argument("--tta_noise_snr_db", type=float, default=0.0,
                        help="with --n_tta > 1, add white noise this many "
                             "dB below each clip's RMS on passes > 0 "
                             "(on-device TTA; 0 = off)")
    parser.add_argument("--tta_shift_max_s", type=float, default=0.0,
                        help="with --n_tta > 1, random right time-shift up "
                             "to this many seconds on passes > 0 "
                             "(on-device TTA; 0 = off)")
    parser.add_argument("--tta_shuffle_p", type=float, default=0.0,
                        help="with --n_tta > 1, shuffle 0.5 s chunks with "
                             "this probability on passes > 0 (the "
                             "reference's intended ShuffleAudio TTA; "
                             "0 = off)")
    parser.add_argument("--device", type=str, default="tpu",
                        choices=("tpu", "cpu"),
                        help="backend to run inference on (reference "
                             "predict_2d_cnn.py:57 --device)")
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--model_kind", type=str, default="2d_cnn",
                        choices=("2d_cnn", "hierarchical_cnn", "backbone_cnn"))
    parser.add_argument("--bf16", action="store_true", default=False)
    parser.add_argument("--use_pallas", action="store_true", default=False)
    parser.add_argument("--mesh_devices", type=int, default=None)
    parser.add_argument("--max_batch_elems", type=int, default=None)
    parser.add_argument("--no_vmap_folds", action="store_true", default=False,
                        help="run folds sequentially (reference behavior) "
                             "instead of one vmapped stacked-fold program")


def build_inference_engine(args, experiment, model_kind, fold, example_loader):
    """Reconstruct the engine from a saved experiment config and load the
    fold's best checkpoint."""
    cfg = experiment.config
    n_classes = int(cfg.data._n_classes)
    eng_args = types.SimpleNamespace(
        features=cfg.data.features,
        aggregation_type=cfg.network.aggregation_type,
        p_mixup=0.0, p_aug=0.0,
        bf16=getattr(args, "bf16", False),
        use_pallas=getattr(args, "use_pallas", False),
        # fused_infer stays OFF: the BN-folded twin measured 2.35x slower
        # than the plain flax path at model level on v5e-1 (it was only
        # faster in isolated-block microbenchmarks; see
        # scripts/probe_fused_infer.py and ROADMAP.md). The fused kernels
        # remain available via models' fused_infer/use_pallas_kernel opts.
        fused_infer=False,
        # block0-only phase-decomposed conv+pool for the 2d CNN: model-level
        # 5-fold A/B 49.9 -> 47.3 ms on v5e-1, reproduced on cached
        # binaries (scripts/probe_phase_pool.py). Deeper blocks lose (4x
        # input re-reads); the 1d/backbone towers are unprobed — keep off.
        phase_pool=((True,) if model_kind == "2d_cnn" else False),
        mesh_devices=getattr(args, "mesh_devices", None),
        loss=(cfg.train._loss if "_loss" in cfg.train else "lsep_naive"),
        mixup_exact_add=False,
    )
    engine = common.build_engine(
        eng_args, experiment, model_kind, n_classes, writers=False)
    engine.make_optimizer(max_steps=1, steps_per_epoch=1)
    engine.init_state(next(iter(example_loader)))
    engine.load_best_model(fold)
    return engine


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    add_predict_arguments(parser)
    args = parser.parse_args(argv)
    common.reject_degenerate_tta(parser, args)
    common.initialize_accelerator(args.device)

    experiment = Experiment(resume_from=args.experiment)
    class_map = load_classmap(args.classmap)
    class_names = class_names_from_classmap(class_map)
    n_folds = int(experiment.config.data._n_folds)

    test_df = pd.read_csv(args.test_df)
    files, _ = manifest_from_dataframe(test_df, args.test_data_dir)
    tta_crops = args.n_tta > 1
    ds = ClipDataset(
        files, classmap=class_map, sr=common.SR,
        max_audio_length=(args.tta_max_audio_length if tta_crops else None),
    )
    ladder = common.default_ladder(None)
    loader = make_loader(
        ds, ladder,
        batch_size=(None if args.max_batch_elems else args.batch_size),
        max_batch_elems=args.max_batch_elems,
        # train=True re-draws the random crop every TTA pass
        train=tta_crops, shuffle=False, drop_last=False,
        num_workers=args.num_workers,
    )

    if not args.no_vmap_folds:
        # one vmapped program over all folds: featurization shared, folds
        # batched on the MXU (training/ensemble.py; ~4x the sequential
        # path). TTA stays on this path: each pass perturbs once and
        # feeds all folds (see EnsemblePredictor.predict_loader for the
        # documented divergence from the reference's per-fold draws).
        import os as _os

        import jax

        from freesound_classification_tpu.training.ensemble import (
            EnsemblePredictor,
        )

        engine = build_inference_engine(
            args, experiment, args.model_kind, 0, loader)
        paths = [
            _os.path.join(experiment.checkpoints, f"fold_{k}", "best_model")
            for k in range(n_folds)
        ]
        predictor = EnsemblePredictor.from_checkpoints(
            engine.model, engine.frontend, paths, engine.state)
        tta_fn = None
        if args.n_tta > 1:
            tta_fn = common.make_tta_fn(
                args.tta_noise_snr_db, args.tta_shift_max_s,
                shuffle_p=args.tta_shuffle_p)
        all_predictions = predictor.predict_loader(
            loader, tta_fn=tta_fn, tta_key=jax.random.PRNGKey(0),
            n_tta=args.n_tta)
    else:
        all_predictions = np.zeros(
            (len(test_df), len(class_names)), np.float64)
        for fold in range(n_folds):
            print(f"predicting fold {fold}")
            engine = build_inference_engine(
                args, experiment, args.model_kind, fold, loader)
            preds = common.predict_ordered(engine, loader)
            if args.n_tta > 1:
                import jax

                tta_fn = common.make_tta_fn(
                    args.tta_noise_snr_db, args.tta_shift_max_s,
                    shuffle_p=args.tta_shuffle_p)
                preds = np.mean(
                    [preds] + [
                        common.predict_ordered(
                            engine, loader, tta_fn=tta_fn,
                            tta_key=jax.random.PRNGKey(1000 * fold + t))
                        for t in range(1, args.n_tta)
                    ], axis=0)
            all_predictions += preds / n_folds

    out = pd.DataFrame(all_predictions, columns=class_names)
    out["fname"] = test_df.fname.values
    out = out[["fname"] + class_names]
    os.makedirs(os.path.dirname(os.path.abspath(args.output_df)), exist_ok=True)
    out.to_csv(args.output_df, index=False)
    print(f"wrote {args.output_df}")


if __name__ == "__main__":
    main()
