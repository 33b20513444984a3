"""Shared CLI plumbing: the reference's ~30-flag argparse surface
(train_2d_cnn.py:32-188) plus TPU-specific extras, and the end-to-end
per-fold train/predict driver the three classifier train scripts share.

The reference repeats this driver nearly verbatim in train_2d_cnn.py,
train_hierarchical_cnn.py and train_backbone_cnn.py (SURVEY.md §3.1 "the
hierarchical/backbone variants are structurally identical"); here it exists
once and the per-model scripts are thin wrappers.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
import pandas as pd

from freesound_classification_tpu.data import bucketing
from freesound_classification_tpu.data.dataset import (
    ClipDataset,
    class_names_from_classmap,
    load_classmap,
    manifest_from_dataframe,
)
from freesound_classification_tpu.data.folds import (
    train_validation_data,
    train_validation_data_stratified,
)
from freesound_classification_tpu.data.loader import make_loader
from freesound_classification_tpu.models.classifiers import build_classifier
from freesound_classification_tpu.models.frontend import MODEL_FAMILY, Frontend
from freesound_classification_tpu.ops.augment import AugmentConfig, make_augmenter
from freesound_classification_tpu.ops.metrics import lwlrap
from freesound_classification_tpu.parallel import mesh as mesh_lib
from freesound_classification_tpu.training.engine import Engine
from freesound_classification_tpu.utils.experiment import Experiment

SR = 44100


def initialize_accelerator(device: str = "tpu") -> None:
    """Initialize the JAX backend BEFORE anything else runs.

    Must be called first in every CLI: on this environment the TPU PJRT
    plugin ('axon' tunnel) fails to register if any subprocess has been
    spawned in the process beforehand (e.g. the experiment tracker's
    ``git rev-parse``), leaving only cpu/libtpu backends. Eagerly touching
    ``jax.devices()`` pins the backend while the process is still pristine.
    ``device='cpu'`` forces the CPU backend (the --device cpu flag).
    """
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.devices()
    except RuntimeError:
        # requested platform unavailable (e.g. flaky tunnel): auto-choose
        jax.config.update("jax_platforms", "")
        jax.devices()


def add_train_arguments(parser: argparse.ArgumentParser) -> None:
    """The reference train-CLI flag surface (train_2d_cnn.py:32-188)."""
    req = parser.add_argument
    req("--train_df", required=True, type=str, help="path to train dataframe")
    req("--train_data_dir", required=True, type=str, help="path to train data")
    req("--noisy_train_df", type=str, help="path to noisy train dataframe")
    req("--noisy_train_data_dir", type=str, help="path to noisy train data")
    req("--share_noisy", action="store_true", default=False,
        help="share noisy files across folds")
    req("--resume", action="store_true", default=False,
        help="allow resuming even if experiment exists")
    req("--test_data_dir", required=True, type=str, help="path to test data")
    req("--sample_submission", required=True, type=str,
        help="path to sample submission csv")
    req("--classmap", required=True, type=str, help="path to class map json")
    req("--log_interval", default=10, type=int)
    req("--batch_size", type=int, default=64)
    req("--max_audio_length", type=int, default=10,
        help="max audio length in seconds; longer clips are sampled")
    req("--lr", default=0.01, type=float)
    req("--max_samples", type=int, help="maximum number of samples to use")
    req("--holdout_size", type=float, default=0.0)
    req("--epochs", default=100, type=int)
    req("--scheduler", type=str, default="steplr_1_0.5")
    req("--accumulation_steps", type=int, default=1)
    req("--save_every", type=int, default=1)
    req("--keep_checkpoints", type=int, default=0,
        help="retention for periodic model_on_epoch_N checkpoints: keep "
             "only the newest K (0 = keep all, reference behavior)")
    req("--device", type=str, default="tpu", choices=("tpu", "cpu", "cuda"),
        help="accelerator platform (cuda accepted for reference-CLI "
             "compatibility; jax picks the actual backend)")
    req("--aggregation_type", type=str, required=True, choices=("max", "rnn"))
    req("--num_conv_blocks", type=int, default=5)
    req("--start_deep_supervision_on", type=int, default=2)
    req("--conv_base_depth", type=int, default=64)
    req("--growth_rate", type=float, default=2)
    req("--weight_decay", type=float, default=1e-5)
    req("--output_dropout", type=float, default=0.0)
    req("--p_mixup", type=float, default=0.0)
    req("--p_aug", type=float, default=0.0)
    req("--switch_off_augmentations_on", type=int, default=20)
    req("--features", type=str, required=True, help="feature descriptor")
    req("--optimizer", type=str, required=True, choices=("adam", "momentum"))
    req("--folds", type=int, required=True, nargs="+")
    req("--n_folds", type=int, default=4)
    req("--kfold_seed", type=int, default=42)
    req("--num_workers", type=int, default=4)
    req("--label", type=str, default="2d_cnn")
    # --- TPU-native extras ---
    req("--loss", type=str, default="lsep_naive",
        choices=("lsep", "lsep_naive", "bce", "focal"),
        help="training loss (reference uses the naive lsep form)")
    req("--bf16", action="store_true", default=False,
        help="bfloat16 model compute (params stay f32)")
    req("--use_pallas", action="store_true", default=False,
        help="fused Pallas mel kernel (TPU only)")
    req("--mesh_devices", type=int, default=None,
        help="number of devices in the data-parallel mesh (default: all)")
    req("--max_batch_elems", type=int, default=None,
        help="pack batches by total samples instead of fixed batch size "
             "(realizes the reference BucketingSampler, ops/padding.py:36-81)")
    req("--experiments_dir", type=str, default="experiments")
    req("--mixup_exact_add", action="store_true", default=False,
        help="use additive mixup instead of the reference's replace quirk "
             "(ops/audio.py:50)")
    req("--profile", action="store_true", default=False,
        help="capture a jax.profiler trace of the first post-compile epoch "
             "into <experiment>/summaries/profile")
    req("--fold_parallel", action="store_true", default=False,
        help="train all requested folds simultaneously as one vmapped "
             "program, sharded over devices (training/multifold.py)")


def experiment_config(args, model_label: str, n_classes: int, input_dim: int,
                      extra_network: Optional[dict] = None) -> dict:
    """The reference's nested config dict (train_2d_cnn.py:194-232)."""
    network = {
        "num_conv_blocks": args.num_conv_blocks,
        "start_deep_supervision_on": args.start_deep_supervision_on,
        "conv_base_depth": args.conv_base_depth,
        "growth_rate": args.growth_rate,
        "output_dropout": args.output_dropout,
        "aggregation_type": args.aggregation_type,
    }
    if extra_network:
        network.update(extra_network)
    return {
        "network": network,
        "data": {
            "features": args.features,
            "_n_folds": args.n_folds,
            "_kfold_seed": args.kfold_seed,
            "_input_dim": input_dim,
            "_n_classes": n_classes,
            "_holdout_size": args.holdout_size,
            "p_mixup": args.p_mixup,
            "p_aug": args.p_aug,
            "max_audio_length": args.max_audio_length,
            "noisy": args.noisy_train_df is not None,
            "_train_df": args.train_df,
            "_train_data_dir": args.train_data_dir,
            "_noisy_train_df": args.noisy_train_df,
            "_noisy_train_data_dir": args.noisy_train_data_dir,
            "_share_noisy": args.share_noisy,
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
            "_loss": args.loss,
        },
        "label": args.label,
    }


def default_ladder(max_audio_length: Optional[float], sr: int = SR):
    """Bucket ladder covering up to max_audio_length (or ~30 s full clips)."""
    max_len = int((max_audio_length or 30) * sr)
    return bucketing.make_bucket_ladder(max_len, min_length=sr // 2)


def build_engine(args, experiment, model_kind: str, n_classes: int,
                 writers: bool = True,
                 warm_start_path: Optional[str] = None) -> Engine:
    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    model = build_classifier(
        model_kind, experiment.config.network, n_classes, dtype=dtype,
        # eval forwards fold BN into the conv weights (ops/pallas_resnet);
        # init/training paths are unaffected, checkpoints identical
        fused_infer=bool(getattr(args, "fused_infer", False)),
        # eval-mode phase-decomposed conv+pool (blocks.phase_conv_pool_*);
        # inference CLIs pass the probe-gated per-block tuple
        phase_pool=getattr(args, "phase_pool", False),
    )
    frontend = Frontend(
        args.features, MODEL_FAMILY[model_kind], sr=SR,
        use_pallas=getattr(args, "use_pallas", False),
        # bf16 models quantize their input anyway: run the block-DFT as a
        # single bf16 MXU pass; f32 models keep the 3-pass parity mode
        dft_precision="default" if dtype == jnp.bfloat16 else "high",
    )
    augment = make_augmenter(AugmentConfig(
        p_mixup=args.p_mixup,
        p_aug=args.p_aug,
        # reference: chunk shuffle only for non-rnn models
        # (train_2d_cnn.py:314-317)
        p_shuffle=0.5 if args.aggregation_type != "rnn" else 0.0,
        mixup_quirk_replace=not getattr(args, "mixup_exact_add", False),
        sr=SR,
    ))
    mesh = mesh_lib.make_mesh(getattr(args, "mesh_devices", None))

    writer_factory = None
    if writers:
        summaries = experiment.register_directory("summaries")

        def writer_factory(fold, split):
            try:
                from tensorboardX import SummaryWriter

                return SummaryWriter(
                    log_dir=os.path.join(summaries, f"fold_{fold}", split)
                )
            except Exception:
                return None

    checkpoints = experiment.register_directory("checkpoints")
    profile_dir = None
    if getattr(args, "profile", False):
        profile_dir = os.path.join(
            experiment.register_directory("summaries"), "profile")
    return Engine(
        model,
        frontend,
        experiment.config.train,
        loss=args.loss,
        augment=augment,
        checkpoint_dir=checkpoints,
        mesh=mesh,
        summary_writer_factory=writer_factory,
        profile_dir=profile_dir,
        # finetune CLIs set args.warm_start_path (or pass explicitly);
        # each fold's fit then seeds params from that checkpoint
        warm_start_path=(warm_start_path
                         or getattr(args, "warm_start_path", None)),
    )


def run_training(args, model_kind: str) -> None:
    """The reference per-fold train/predict/submission driver
    (train_2d_cnn.py:234-511), shared by all classifier CLIs."""
    initialize_accelerator(getattr(args, "device", "tpu"))
    class_map = load_classmap(args.classmap)
    n_classes = len(class_map)
    from freesound_classification_tpu.ops.dsp import parse_features

    input_dim = parse_features(args.features).n_features

    config = experiment_config(args, model_kind, n_classes, input_dim)
    with Experiment(
        config,
        implicit_resuming=args.resume,
        experiments_dir=args.experiments_dir,
    ) as experiment:
        print("\n     ////// CONFIG //////")
        print(experiment.config)

        train_df = pd.read_csv(args.train_df)
        test_df = pd.read_csv(args.sample_submission)
        noisy_train_df = (
            pd.read_csv(args.noisy_train_df) if args.noisy_train_df else None
        )

        if args.max_samples:
            train_df = train_df.sample(
                args.max_samples, random_state=args.kfold_seed
            ).reset_index(drop=True)
            test_df = test_df.sample(
                min(args.max_samples, len(test_df)),
                random_state=args.kfold_seed,
            ).reset_index(drop=True)

        holdout_df = None
        if args.holdout_size:
            from sklearn.model_selection import train_test_split

            keep, holdout = train_test_split(
                np.arange(len(train_df)), test_size=args.holdout_size,
                random_state=args.kfold_seed,
            )
            holdout_df = train_df.iloc[holdout].reset_index(drop=True)
            train_df = train_df.iloc[keep].reset_index(drop=True)

        splits = list(train_validation_data_stratified(
            train_df.fname, train_df.labels, class_map,
            args.n_folds, args.kfold_seed,
        ))
        noisy_splits = (
            list(train_validation_data(
                noisy_train_df.fname, noisy_train_df.labels,
                args.n_folds, args.kfold_seed,
            ))
            if noisy_train_df is not None
            else None
        )

        ladder = default_ladder(args.max_audio_length)
        full_ladder = default_ladder(None)
        class_names = class_names_from_classmap(class_map)
        experiment.register_directory("predictions")

        def fold_loaders(fold, mesh_size):
            """Per-fold datasets + loaders (train_2d_cnn.py:279-353)."""
            train_idx, valid_idx = splits[fold]
            noisy_files, noisy_labels = [], []
            if noisy_train_df is not None:
                noisy_train, noisy_valid = noisy_splits[fold]
                sel = (
                    slice(None) if args.share_noisy else noisy_valid
                )
                nfiles, nlabels = manifest_from_dataframe(
                    noisy_train_df.iloc[np.arange(len(noisy_train_df))[sel]],
                    args.noisy_train_data_dir,
                )
                noisy_files, noisy_labels = nfiles, nlabels

            files, labels = manifest_from_dataframe(
                train_df.iloc[train_idx], args.train_data_dir)
            train_ds = ClipDataset(
                files + noisy_files,
                raw_labels=list(labels) + list(noisy_labels),
                classmap=class_map,
                is_noisy=[0] * len(files) + [1] * len(noisy_files),
                max_audio_length=args.max_audio_length,
                sr=SR,
                seed=args.kfold_seed + fold,
            )
            vfiles, vlabels = manifest_from_dataframe(
                train_df.iloc[valid_idx], args.train_data_dir)
            valid_ds = ClipDataset(
                vfiles, raw_labels=vlabels, classmap=class_map, sr=SR)
            train_loader = make_loader(
                train_ds, ladder,
                batch_size=(None if args.max_batch_elems else args.batch_size),
                max_batch_elems=args.max_batch_elems,
                train=True, seed=args.kfold_seed,
                size_multiple=mesh_size, num_workers=args.num_workers,
            )
            valid_loader = make_loader(
                valid_ds, full_ladder,
                batch_size=(None if args.max_batch_elems else args.batch_size),
                max_batch_elems=args.max_batch_elems,
                train=False, num_workers=args.num_workers,
            )
            return train_loader, valid_loader, valid_idx

        def emit_fold_artifacts(engine, fold, valid_loader, valid_idx):
            """OOF/test/holdout prediction artifacts for one trained fold
            (train_2d_cnn.py:376-449)."""
            val_preds = predict_ordered(engine, valid_loader)
            val_df = pd.DataFrame(val_preds, columns=class_names)
            val_df["fname"] = train_df.fname.values[valid_idx]
            val_df.to_csv(
                os.path.join(experiment.predictions,
                             f"val_preds_fold_{fold}.csv"),
                index=False,
            )

            tfiles, _ = manifest_from_dataframe(test_df, args.test_data_dir)
            test_ds = ClipDataset(tfiles, classmap=class_map, sr=SR)
            test_loader = make_loader(
                test_ds, full_ladder,
                batch_size=(None if args.max_batch_elems else args.batch_size),
                max_batch_elems=args.max_batch_elems,
                train=False, num_workers=args.num_workers,
            )
            test_preds = predict_ordered(engine, test_loader)
            test_out = pd.DataFrame(test_preds, columns=class_names)
            test_out["fname"] = test_df.fname.values
            test_out.to_csv(
                os.path.join(experiment.predictions,
                             f"test_preds_fold_{fold}.csv"),
                index=False,
            )

            if holdout_df is not None:
                hfiles, hlabels = manifest_from_dataframe(
                    holdout_df, args.train_data_dir)
                holdout_ds = ClipDataset(
                    hfiles, raw_labels=hlabels, classmap=class_map, sr=SR)
                holdout_loader = make_loader(
                    holdout_ds, full_ladder, batch_size=args.batch_size,
                    train=False, num_workers=args.num_workers)
                holdout_metric = engine.evaluate(holdout_loader)
                experiment.register_result(
                    f"fold{fold}.holdout_metric", holdout_metric)
                print(f"\nHoldout metric: {holdout_metric:.4f}")

        if getattr(args, "fold_parallel", False) and len(args.folds) > 1:
            run_folds_parallel(
                args, experiment, model_kind, n_classes,
                fold_loaders, emit_fold_artifacts)
        else:
            for fold in args.folds:
                print(f"\n\n   -----  Fold {fold}\n")
                engine = build_engine(args, experiment, model_kind, n_classes)
                train_loader, valid_loader, valid_idx = fold_loaders(
                    fold, engine.mesh.devices.size)

                scores = engine.fit_validate(
                    train_loader, valid_loader,
                    epochs=args.epochs, fold=fold,
                    log_interval=args.log_interval,
                    resume=args.resume,
                )
                best_metric = max(scores)
                experiment.register_result(f"fold{fold}.metric", best_metric)
                engine.save_checkpoint(fold, "final_model")
                engine.load_best_model(fold)
                emit_fold_artifacts(engine, fold, valid_loader, valid_idx)

        finalize_results(experiment, train_df, class_map, args.n_folds)


def run_folds_parallel(args, experiment, model_kind, n_classes,
                       fold_loaders, emit_fold_artifacts) -> None:
    """All requested folds trained simultaneously as one vmapped/sharded
    program (training/multifold.py) — the SURVEY §2b folds-onto-devices
    scale-out. Artifacts come out identical to the sequential path."""
    from freesound_classification_tpu.training.multifold import (
        MultiFoldEngine,
        make_fold_dp_mesh,
    )

    folds = list(args.folds)
    print(f"\n\n   -----  Folds {folds} (parallel)\n")
    template = build_engine(args, experiment, model_kind, n_classes)
    # spare devices beyond the fold axis become within-fold data
    # parallelism: a 2-D fold x data mesh when fold*dp tiles the devices,
    # else the fold-LOCAL layout (folds a local vmap axis, batch rows over
    # every device — e.g. the production 5-fold job on 8 devices)
    mesh = make_fold_dp_mesh(len(folds))
    shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    if "fold" not in shape:
        print(f"fold-parallel mesh: fold-local ({len(folds)} folds vmapped"
              f" locally, {shape['data']}-way data parallel)")
    elif mesh.devices.size > len(folds):
        print(f"fold-parallel mesh: {shape['fold']} folds x "
              f"{shape['data']}-way data parallel")

    per_fold = [fold_loaders(f, 1) for f in folds]
    train_loaders = [p[0] for p in per_fold]
    valid_loaders = [p[1] for p in per_fold]

    mf = MultiFoldEngine(template, len(folds), mesh=mesh, fold_ids=folds)
    best = mf.fit(train_loaders, valid_loaders, epochs=args.epochs,
                  checkpoint_dir=template.checkpoint_dir,
                  resume=getattr(args, "resume", False),
                  log_interval=getattr(args, "log_interval", 25))

    for k, fold in enumerate(folds):
        experiment.register_result(f"fold{fold}.metric", float(best[k]))
        from freesound_classification_tpu.training import (
            checkpoints as ckpt_lib,
        )

        ckpt_lib.save_state(
            os.path.join(template.checkpoint_dir, f"fold_{fold}",
                         "final_model"),
            mf.fold_state(k))

    # per-fold artifacts via the standard engine + saved best checkpoints
    for k, fold in enumerate(folds):
        engine = build_engine(args, experiment, model_kind, n_classes,
                              writers=False)
        engine.make_optimizer(max_steps=1, steps_per_epoch=1)
        engine.init_state(next(iter(valid_loaders[k])))
        engine.load_best_model(fold)
        emit_fold_artifacts(engine, fold, valid_loaders[k], per_fold[k][2])


def predict_ordered(engine: Engine, loader, tta_fn=None,
                    tta_key=None) -> np.ndarray:
    """Prediction matrix in dataset order (bucketed loaders permute rows;
    the reference's sequential loader does not — undo the permutation).

    ``tta_fn(wave, lengths, key) -> (wave, lengths)`` optionally perturbs
    each batch on device (noise / time-shift TTA, ops.augment.tta_perturb)."""
    import jax

    tta_jit = jax.jit(tta_fn) if tta_fn is not None else None
    probs_chunks, idx_chunks = [], []
    for bi, batch in enumerate(loader):
        device_batch, n = engine._prep_batch(batch)
        if tta_jit is not None:
            key = jax.random.fold_in(tta_key, bi)
            w, ln = tta_jit(device_batch["signal"],
                            device_batch["lengths"], key)
            device_batch = dict(device_batch, signal=w, lengths=ln)
        out = engine._eval_step(engine.state, device_batch,
                                 jnp.int32(n))
        probs_chunks.append(np.asarray(out["probs"])[:n])
        idx_chunks.append(batch["index"][:n])
    probs = np.concatenate(probs_chunks)
    order = np.concatenate(idx_chunks)
    out = np.zeros_like(probs)
    out[order] = probs
    return out


def reject_degenerate_tta(parser: argparse.ArgumentParser, args) -> None:
    """Error out when ``--n_tta > 1`` with every stochastic knob off.

    The eval step is deterministic, so TTA without a stochastic transform
    averages n identical passes — the reference's ``--n_tta`` habit
    (evaluate_2d_cnn.py:100) would silently pay n× for nothing here."""
    tta_stochastic = (getattr(args, "tta_max_audio_length", None) is not None
                      or getattr(args, "tta_noise_snr_db", 0.0) > 0.0
                      or getattr(args, "tta_shift_max_s", 0.0) > 0.0
                      or getattr(args, "tta_shuffle_p", 0.0) > 0.0)
    if args.n_tta > 1 and not tta_stochastic:
        parser.error(
            "--n_tta > 1 requires a stochastic TTA mode "
            "(--tta_max_audio_length, --tta_noise_snr_db, "
            "--tta_shift_max_s or --tta_shuffle_p): inference is "
            "deterministic, so TTA without one would average identical "
            "passes")


def make_tta_fn(noise_snr_db: float, shift_max_s: float,
                shuffle_p: float = 0.0):
    """Build the on-device TTA perturbation from CLI knobs (None if off).

    ``shuffle_p`` enables chunk-shuffle TTA — the reference's *intended*
    evaluate-time TTA was ShuffleAudio at p=1 (evaluate_2d_cnn.py:119,
    latently broken there by a TypeError); here it reuses the on-device
    ops.augment.shuffle_chunks."""
    if noise_snr_db <= 0.0 and shift_max_s <= 0.0 and shuffle_p <= 0.0:
        return None
    import jax

    from freesound_classification_tpu.ops.augment import (
        shuffle_chunks,
        tta_perturb,
    )

    def fn(wave, lengths, key):
        k_shuffle, k_perturb = jax.random.split(key)
        if shuffle_p > 0.0:
            wave = shuffle_chunks(wave, lengths, k_shuffle, shuffle_p, sr=SR)
        return tta_perturb(wave, lengths, k_perturb,
                           noise_snr_db=noise_snr_db,
                           shift_max_s=shift_max_s, sr=SR)

    return fn


def finalize_results(experiment, train_df, class_map, n_folds: int) -> None:
    """Global OOF metric + mean-of-folds submission
    (train_2d_cnn.py:454-511)."""
    class_names = class_names_from_classmap(class_map)

    have_all = all(
        f"fold{k}" in experiment.results.as_dict() for k in range(n_folds)
    )
    if have_all:
        val_dfs = [
            pd.read_csv(os.path.join(
                experiment.predictions, f"val_preds_fold_{k}.csv"))
            for k in range(n_folds)
        ]
        val_predictions = pd.concat(val_dfs).reset_index(drop=True)
        from freesound_classification_tpu.data.folds import (
            binarize_label_strings,
        )

        labels = binarize_label_strings(
            [str(v) for v in train_df.labels.values], class_map)
        val_labels = pd.DataFrame(labels, columns=class_names)
        val_labels["fname"] = train_df.fname.values

        assert set(val_predictions.fname) == set(val_labels.fname)
        val_predictions = val_predictions.sort_values("fname")
        val_labels = val_labels.sort_values("fname")
        metric = lwlrap(
            val_labels.drop(columns="fname").values,
            val_predictions.drop(columns="fname").values,
        )
        experiment.register_result("metric", metric)
        print(f"\nGlobal OOF lwlrap: {metric:.4f}")

    test_files = [
        os.path.join(experiment.predictions, f"test_preds_fold_{k}.csv")
        for k in range(n_folds)
    ]
    if all(os.path.isfile(f) for f in test_files):
        test_dfs = [pd.read_csv(f) for f in test_files]
        submission = pd.DataFrame({"fname": test_dfs[0].fname.values})
        for c in class_names:
            submission[c] = np.mean([d[c].values for d in test_dfs], axis=0)
        submission.to_csv(
            os.path.join(experiment.predictions, "submission.csv"),
            index=False,
        )
