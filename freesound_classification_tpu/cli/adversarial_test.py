"""Adversarial validation: train a train-vs-test domain discriminator and
report per-epoch AUC, per-frame probability plots and mean domain score per
class (reference adversarial_test.py) — a dataset-shift diagnostic.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--train_df", required=True, type=str)
    parser.add_argument("--train_data_dir", required=True, type=str)
    parser.add_argument("--test_df", required=True, type=str)
    parser.add_argument("--test_data_dir", required=True, type=str)
    parser.add_argument("--classmap", required=True, type=str)
    parser.add_argument("--features", required=True, type=str)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--max_audio_length", type=int, default=10)
    parser.add_argument("--max_samples", type=int, default=None)
    parser.add_argument("--val_size", type=float, default=0.2)
    parser.add_argument("--batches_to_save", type=int, default=2)
    parser.add_argument("--plots_dir", type=str, default="plots")
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--device", type=str, default="tpu")
    args = parser.parse_args(argv)

    from freesound_classification_tpu.cli import common as _common

    _common.initialize_accelerator(args.device)

    import jax
    import jax.numpy as jnp
    import optax
    from sklearn.metrics import roc_auc_score
    from sklearn.model_selection import train_test_split

    from freesound_classification_tpu.cli import common
    from freesound_classification_tpu.data.dataset import (
        ClipDataset,
        class_names_from_classmap,
        load_classmap,
    )
    from freesound_classification_tpu.data.folds import binarize_label_strings
    from freesound_classification_tpu.data.loader import make_loader
    from freesound_classification_tpu.models.adversarial import (
        DomainDiscriminator,
    )
    from freesound_classification_tpu.models.frontend import Frontend

    train_df = pd.read_csv(args.train_df)
    test_df = pd.read_csv(args.test_df)
    if args.max_samples:
        train_df = train_df.sample(args.max_samples).reset_index(drop=True)
        test_df = test_df.sample(
            min(args.max_samples, len(test_df))).reset_index(drop=True)

    train_files = [os.path.join(args.train_data_dir, f)
                   for f in train_df.fname.values]
    test_files = [os.path.join(args.test_data_dir, f)
                  for f in test_df.fname.values]
    files = np.array(train_files + test_files)
    domain = np.concatenate(
        [np.ones(len(train_files)), np.zeros(len(test_files))])

    tr_files, va_files, tr_dom, va_dom = train_test_split(
        files, domain, test_size=args.val_size, shuffle=True, random_state=42)

    frontend = Frontend(args.features, "1d", sr=common.SR)
    model = DomainDiscriminator()

    def make_domain_loader(fs, dom, train):
        ds = ClipDataset(fs, max_audio_length=args.max_audio_length)
        ds.domain = np.asarray(dom, np.float32)
        ladder = common.default_ladder(args.max_audio_length)
        return ds, make_loader(
            ds, ladder, batch_size=args.batch_size, train=train,
            num_workers=args.num_workers)

    tr_ds, tr_loader = make_domain_loader(tr_files, tr_dom, True)
    va_ds, va_loader = make_domain_loader(va_files, va_dom, False)

    tx = optax.adam(args.lr)
    params = batch_stats = opt_state = None

    @jax.jit
    def train_step(params, batch_stats, opt_state, signal, lengths, dom):
        inputs, fl = frontend(signal, lengths)

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, inputs, fl,
                train=True, mutable=["batch_stats"])
            probs = jnp.clip(out["domain_prob"], 1e-6, 1 - 1e-6)
            loss = -jnp.mean(
                dom * jnp.log(probs) + (1 - dom) * jnp.log(1 - probs))
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state2, \
            loss

    @jax.jit
    def eval_step(params, batch_stats, signal, lengths):
        inputs, fl = frontend(signal, lengths)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          inputs, fl, train=False)
        return out["domain_prob"], out["frame_probs"]

    for epoch in range(args.epochs):
        for batch in tr_loader:
            signal = jnp.asarray(batch["signal"])
            lengths = jnp.asarray(batch["lengths"])
            dom = jnp.asarray(tr_ds.domain[batch["index"]])
            if params is None:
                inputs, fl = frontend(signal[:1], lengths[:1])
                variables = model.init(
                    {"params": jax.random.PRNGKey(0)}, inputs, fl,
                    train=False)
                params = variables["params"]
                batch_stats = variables["batch_stats"]
                opt_state = tx.init(params)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, signal, lengths, dom)

        val_probs, val_dom = [], []
        for batch in va_loader:
            probs, _ = eval_step(
                params, batch_stats,
                jnp.asarray(batch["signal"]), jnp.asarray(batch["lengths"]))
            val_probs.extend(np.asarray(probs))
            val_dom.extend(va_ds.domain[batch["index"]])
        auc = roc_auc_score(val_dom, val_probs)
        print(f"\nEpoch: {epoch}, AUC: {auc}")

    # per-frame probability plots (reference :255-288)
    os.makedirs(args.plots_dir, exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        saved = 0
        for batch in va_loader:
            if saved >= args.batches_to_save:
                break
            probs, frame_probs = eval_step(
                params, batch_stats,
                jnp.asarray(batch["signal"]), jnp.asarray(batch["lengths"]))
            inputs, _ = frontend(
                jnp.asarray(batch["signal"]), jnp.asarray(batch["lengths"]))
            for k in range(len(probs)):
                fig = plt.figure(figsize=(20, 7))
                fig.suptitle(str(va_ds.domain[batch["index"][k]]))
                ax = fig.add_subplot(211)
                ax.imshow(np.asarray(inputs[k]).T, aspect="auto")
                ax = fig.add_subplot(212)
                ax.plot(np.asarray(frame_probs[k]))
                ax.set_ylim(0, 1)
                fig.savefig(os.path.join(
                    args.plots_dir, f"plot_{saved}_{k}.png"))
                plt.close(fig)
            saved += 1
    except Exception as e:
        print(f"plots skipped: {e}")

    # mean domain score per class (reference :290-347)
    class_map = load_classmap(args.classmap)
    class_names = class_names_from_classmap(class_map)
    in_train = [f in set(train_files) for f in va_files]
    named = [f for f, t in zip(va_files, in_train) if t]
    if named:
        lookup = dict(zip(train_df.fname.values, train_df.labels.values))
        labels = binarize_label_strings(
            [lookup[os.path.basename(f)] for f in named], class_map)
        ds = ClipDataset(named, max_audio_length=args.max_audio_length)
        ladder = common.default_ladder(args.max_audio_length)
        loader = make_loader(ds, ladder, batch_size=args.batch_size,
                             train=False, num_workers=args.num_workers)
        all_probs = np.zeros(len(named))
        for batch in loader:
            probs, _ = eval_step(
                params, batch_stats,
                jnp.asarray(batch["signal"]), jnp.asarray(batch["lengths"]))
            all_probs[batch["index"]] = np.asarray(probs)
        scores = labels * all_probs[:, None]
        with np.errstate(invalid="ignore"):
            mean_scores = scores.sum(0) / np.maximum(labels.sum(0), 1)
        pd.options.display.max_rows = 100
        print()
        print(pd.DataFrame(
            {"classname": class_names, "scores": mean_scores}))


if __name__ == "__main__":
    main()
