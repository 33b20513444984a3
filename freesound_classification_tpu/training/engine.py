"""The shared training engine: one compiled loop for every model family.

Replaces the five nearly-identical per-model train/eval/checkpoint loops in
the reference (networks/classifiers.py:238/633/990, apc.py:124, cpc.py:153 —
SURVEY.md §1 "no shared Trainer abstraction"). API surface mirrors the
reference model methods so the CLIs line up:

    engine.fit_validate(train_loader, valid_loader, epochs, fold)
    engine.evaluate(loader) / engine.validation(loader, epoch)
    engine.predict(loader, n_tta)
    engine.load_best_model(fold)

TPU-first design:
- The whole step — on-device augmentation, STFT/mel featurization, forward,
  LSEP loss, backward, optimizer, batch lwlrap — is ONE jitted program per
  length bucket; nothing but the input batch crosses the host boundary.
- Gradient accumulation is ``optax.MultiSteps`` (reference: manual
  ``loss / accumulation_steps`` + step-every-k, classifiers.py:668-685);
  the LR schedule is stretched so its per-*batch* shape matches the
  reference's per-batch scheduler stepping.
- Data parallelism: batches sharded over a 1-D mesh, state replicated; XLA
  inserts the psum collectives (parallel/mesh.py).
- Checkpoints are orbax, full train-state (params/opt/step/PRNG), with the
  reference's per-fold best/periodic/final semantics
  (classifiers.py:846-866, SURVEY.md §5).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from freesound_classification_tpu.models.frontend import Frontend
from freesound_classification_tpu.ops import metrics as metrics_lib
from freesound_classification_tpu.ops.losses import make_loss
from freesound_classification_tpu.ops.schedules import make_schedule
from freesound_classification_tpu.parallel import mesh as mesh_lib
from freesound_classification_tpu.training import checkpoints as ckpt_lib
from freesound_classification_tpu.training.optimizers import make_optimizer
from freesound_classification_tpu.training.state import TrainState, create_train_state


class Engine:
    """One training engine for every model family.

    Parameters
    ----------
    model: a Flax module taking (inputs, frame_lengths, train=...) and
        returning {"class_logits": ...} (classifiers) or
        {"loss_terms": [...], ...} (self-supervised APC/CPC).
    frontend: Frontend mapping (wave, lengths) -> (inputs, frame_lengths).
    train_config: namespace with optimizer, learning_rate, scheduler,
        weight_decay, accumulation_steps, epochs, _save_every,
        switch_off_augmentations_on (the reference's config.train block,
        train_2d_cnn.py:220-230).
    loss: loss name ("lsep" | "lsep_naive" | "bce" | "focal") — ignored for
        self-supervised models.
    augment: optional fn (wave, lengths, labels, key, scale) ->
        (wave, lengths, labels), run on-device inside the train step.
    checkpoint_dir: root for fold checkpoints.
    """

    def __init__(
        self,
        model,
        frontend: Frontend,
        train_config,
        loss: str = "lsep",
        augment: Optional[Callable] = None,
        checkpoint_dir: Optional[str] = None,
        mesh=None,
        self_supervised: bool = False,
        summary_writer_factory=None,
        seed: int = 42,
        profile_dir: Optional[str] = None,
        warm_start_path: Optional[str] = None,
    ):
        self.model = model
        self.frontend = frontend
        self.train_config = train_config
        self.loss_name = loss
        self.loss_fn = make_loss(loss)
        self.augment = augment
        self.checkpoint_dir = checkpoint_dir
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.self_supervised = self_supervised
        self.seed = seed
        self.state: Optional[TrainState] = None
        self.global_step = 0
        # per-bucket-shape pool of the previous clean batch (MixUp partners)
        self._mixup_pool: dict = {}
        self._train_step = None
        self._eval_step = None
        self._writer_factory = summary_writer_factory
        self.train_writer = None
        self.valid_writer = None
        self.profile_dir = profile_dir
        # per-fold warm start (finetune CLIs): params/batch_stats seeded
        # from this checkpoint at the top of each fit_validate
        self.warm_start_path = warm_start_path

    # ------------------------------------------------------------------
    # step construction
    # ------------------------------------------------------------------

    def make_optimizer(self, max_steps: int, steps_per_epoch: int) -> None:
        """Build tx + schedule (reference model.make_optimizer,
        classifiers.py:870-880) and the jitted train/eval steps."""
        cfg = self.train_config
        accum = max(int(getattr(cfg, "accumulation_steps", 1)), 1)
        base_schedule = make_schedule(
            cfg.scheduler, cfg.learning_rate, max_steps, steps_per_epoch
        )
        if accum > 1:
            # optax.MultiSteps advances the inner step once per k batches;
            # stretch so the per-batch LR trajectory matches the reference's
            # per-batch scheduler stepping.
            schedule = lambda step: base_schedule(step * accum)  # noqa: E731
        else:
            schedule = base_schedule
        self.schedule = base_schedule
        tx = make_optimizer(cfg.optimizer, schedule, cfg.weight_decay)
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        self.tx = tx
        self._build_steps()

    def init_state(self, example_batch) -> TrainState:
        wave = jnp.asarray(example_batch["signal"][:1])
        lengths = jnp.asarray(example_batch["lengths"][:1])
        inputs, frame_lengths = self.frontend(wave, lengths)
        self.state = create_train_state(
            self.model, inputs, frame_lengths, self.tx, seed=self.seed
        )
        self.state = mesh_lib.replicate_state(self.mesh, self.state)
        return self.state

    def _forward_loss(self, params, batch_stats, inputs, frame_lengths,
                      labels, dropout_rng, train, row_mask=None):
        variables = {"params": params, "batch_stats": batch_stats}
        kwargs = dict(train=train)
        if self.self_supervised and row_mask is not None:
            # SSL losses are frame-masked means inside the model; zeroing a
            # padded row's frame count removes it from every term's mask and
            # denominator, so mesh-padding duplicates carry no weight in the
            # loss that selects best_model (round-1 VERDICT weak #4)
            frame_lengths = jnp.where(row_mask, frame_lengths, 0)
        if train:
            out, mutated = self.model.apply(
                variables, inputs, frame_lengths, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng}, **kwargs,
            )
            new_stats = mutated["batch_stats"]
        else:
            out = self.model.apply(variables, inputs, frame_lengths, **kwargs)
            new_stats = batch_stats
        if self.self_supervised:
            loss_terms = out["loss_terms"]
            per_sample = sum(loss_terms)  # scalar terms
            loss = per_sample
            logits = out.get("class_logits")
            return loss, (logits, new_stats,
                          jnp.stack([jnp.asarray(t) for t in loss_terms]))
        logits = out["class_logits"]
        per_sample = self.loss_fn(logits, labels, average=False)
        if row_mask is None:
            loss = jnp.mean(per_sample)
        else:
            # mesh padding duplicates the last sample to reach a multiple of
            # the device count; mask it out so it carries no gradient weight
            # and the reported loss is exact over real rows.
            m = row_mask.astype(per_sample.dtype)
            loss = jnp.sum(per_sample * m) / jnp.maximum(jnp.sum(m), 1.0)
        return loss, (logits, new_stats, per_sample)

    def _build_steps(self) -> None:
        frontend = self.frontend
        augment = self.augment

        def train_step(state: TrainState, batch, aug_scale, n_real, partner):
            # aug_scale is STATIC (a Python float, jit static_argnums): the
            # switch-off epochs (scale 0) compile a program with no augmenter
            # at all instead of running the full ~90 ms chain and masking it
            # out — at scale 0 every bernoulli(p*0) row mask is False, so
            # skipping the call is bit-exact, and a static scale lets
            # effects_chain use its fixed-count row compaction (augment.py).
            rng, step_rng, dropout_rng = jax.random.split(state.rng, 3)
            wave = batch["signal"]
            lengths = batch["lengths"]
            labels = batch.get("labels")
            row_mask = (
                jnp.arange(wave.shape[0], dtype=jnp.int32) < n_real
            )
            if augment is not None and aug_scale > 0.0:
                wave, lengths, labels = augment(
                    wave, lengths, labels, step_rng, aug_scale,
                    partner=partner,
                )
            inputs, frame_lengths = frontend(wave, lengths)

            def loss_of(params):
                return self._forward_loss(
                    params, state.batch_stats, inputs, frame_lengths,
                    labels, dropout_rng, train=True, row_mask=row_mask,
                )

            (loss, (logits, new_stats, per_sample)), grads = (
                jax.value_and_grad(loss_of, has_aux=True)(state.params)
            )
            state = state.apply_gradients(
                grads=grads, batch_stats=new_stats, rng=rng
            )
            out = {"loss": loss, "per_sample": per_sample}
            if logits is not None and labels is not None:
                probs = jax.nn.sigmoid(logits)
                out["metric"] = metrics_lib.lwlrap_jax(
                    labels, probs, row_mask=row_mask)
                out["probs"] = probs
            return state, out

        def eval_step(state: TrainState, batch, n_real):
            inputs, frame_lengths = frontend(batch["signal"], batch["lengths"])
            labels = batch.get("labels")
            row_mask = (
                jnp.arange(batch["signal"].shape[0], dtype=jnp.int32) < n_real
            )
            loss, (logits, _, per_sample) = self._forward_loss(
                state.params, state.batch_stats, inputs, frame_lengths,
                labels, state.rng, train=False, row_mask=row_mask,
            )
            out = {"loss": loss, "per_sample": per_sample}
            if logits is not None:
                out["probs"] = jax.nn.sigmoid(logits)
            return out

        self._train_step = jax.jit(train_step, donate_argnums=(0,),
                                   static_argnums=(2,))
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    # host loop
    # ------------------------------------------------------------------

    def _prep_batch(self, batch):
        batch = {
            k: v for k, v in batch.items()
            if k in ("signal", "lengths", "labels", "is_noisy")
        }
        # multi-host: this host holds 1/process_count of the global batch,
        # so pad to a multiple of the LOCAL device count
        multiple = self.mesh.devices.size
        if jax.process_count() > 1:
            multiple = max(multiple // jax.process_count(), 1)
        padded, n = mesh_lib.pad_batch_to_multiple(batch, multiple)
        return mesh_lib.shard_batch(self.mesh, padded), n

    def train_epoch(self, train_loader, epoch: int, log_interval: int = 25,
                    aug_scale: float = 1.0) -> dict:
        """One pass over train_loader (reference train_epoch,
        classifiers.py:633-707). With ``profile_dir`` set, epoch 1 (first
        post-compile epoch) is captured as a jax.profiler trace."""
        from freesound_classification_tpu.utils.profiling import maybe_trace

        losses, batch_metrics = [], []
        t0 = time.time()
        n_clips = 0
        trace_dir = self.profile_dir if epoch == 1 else None
        with maybe_trace(trace_dir):
            stats = self._train_epoch_inner(
                train_loader, losses, batch_metrics, aug_scale, log_interval)
        n_clips = stats
        dt = time.time() - t0
        # lists hold device scalars; one bulk host transfer at epoch end
        losses = [float(v) for v in losses]
        batch_metrics = [float(v) for v in batch_metrics]
        return {
            "loss": float(np.mean(losses)) if losses else float("nan"),
            "metric": float(np.nanmean(batch_metrics)) if batch_metrics else
            float("nan"),
            "clips_per_sec": n_clips / max(dt, 1e-9),
        }

    def _train_epoch_inner(self, train_loader, losses, batch_metrics,
                           aug_scale, log_interval) -> int:
        n_clips = 0
        epoch_sample_losses = []
        for batch_idx, batch in enumerate(train_loader):
            device_batch, n = self._prep_batch(batch)
            self.global_step += 1
            # MixUp partner pool: the previous CLEAN batch of the same
            # bucket shape (falls back to the current batch on the first
            # step per bucket). Over an epoch partners therefore span the
            # whole dataset, matching the reference's iid dataset draw
            # (transforms.py:56) instead of a within-batch pairing.
            clean = (device_batch["signal"], device_batch["lengths"],
                     device_batch.get("labels"))
            pool_key = tuple(device_batch["signal"].shape)
            partner = self._mixup_pool.get(pool_key, clean) \
                if self.augment is not None else None
            self.state, out = self._train_step(
                self.state, device_batch, float(aug_scale),
                jnp.int32(n), partner,
            )
            if self.augment is not None:
                self._mixup_pool[pool_key] = clean
            n_clips += n
            # accumulate device scalars every batch (async — no host sync
            # until the epoch-end float conversions) so epoch loss/metric
            # are exact, not log_interval-subsampled
            losses.append(out["loss"])
            batch_metrics.append(out.get("metric", np.nan))
            if (batch_idx % log_interval == 0) or batch_idx == 0:
                loss = float(out["loss"])
                m = float(out["metric"]) if "metric" in out else float("nan")
                if not self.self_supervised:
                    epoch_sample_losses.append(
                        np.asarray(out["per_sample"])[:n])
                if self.train_writer is not None:
                    self.train_writer.add_scalar("loss", loss, self.global_step)
                    self.train_writer.add_scalar("metric", m, self.global_step)
                    self.train_writer.add_scalar(
                        "lr", float(self.schedule(self.global_step - 1)),
                        self.global_step)
            if batch_idx == 0 and self.train_writer is not None:
                self._add_image_summary(device_batch)
        # per-sample loss histogram (reference classifiers.py:616-619,706-707)
        if epoch_sample_losses and self.train_writer is not None:
            try:
                self.train_writer.add_histogram(
                    "losses", np.concatenate(epoch_sample_losses),
                    global_step=self.global_step)
            except Exception:
                pass
        return n_clips

    def _add_image_summary(self, device_batch, to_plot: int = 8) -> None:
        """First-batch spectrogram grid (reference add_image_summaries,
        classifiers.py:621-631)."""
        try:
            inputs, _ = self.frontend(
                device_batch["signal"][:to_plot],
                device_batch["lengths"][:to_plot])
            imgs = np.asarray(inputs, dtype=np.float32)
            if imgs.ndim == 4:  # (B, H, W, 1)
                imgs = imgs[..., 0]
            elif imgs.ndim == 3:  # (B, T, F) -> (B, F, T)
                imgs = np.swapaxes(imgs, 1, 2)
            lo = imgs.min(axis=(1, 2), keepdims=True)
            hi = imgs.max(axis=(1, 2), keepdims=True)
            imgs = (imgs - lo) / np.maximum(hi - lo, 1e-6)
            grid = np.concatenate(list(imgs), axis=0)[None]  # (1, H*, W)
            self.train_writer.add_image("signal", grid, self.global_step)
        except Exception:
            pass

    def evaluate(self, loader, verbose: bool = False,
                 write_summary: bool = False) -> float:
        """Full-set validation (reference evaluate, classifiers.py:709-763).

        Returns lwlrap for classifiers, -total_loss for self-supervised
        models (reference apc.py:236)."""
        all_probs, all_labels = [], []
        total_loss, total_n = 0.0, 0
        for batch in loader:
            device_batch, n = self._prep_batch(batch)
            out = self._eval_step(self.state, device_batch, jnp.int32(n))
            # both paths mask mesh-padded rows out of the step loss (the
            # classifier via row_mask, SSL via zeroed frame counts), so
            # weighting by the n real rows makes the epoch mean exact
            total_loss += float(out["loss"]) * n
            total_n += n
            if "probs" in out and "labels" in batch:
                all_probs.append(np.asarray(out["probs"])[:n])
                all_labels.append(np.asarray(batch["labels"])[:n])
        mean_loss = total_loss / max(total_n, 1)
        if self.self_supervised or not all_probs:
            score = -mean_loss
        else:
            probs = np.concatenate(all_probs)
            labels = np.concatenate(all_labels)
            score = metrics_lib.lwlrap(labels, probs)
        if write_summary and self.valid_writer is not None:
            self.valid_writer.add_scalar("loss", mean_loss, self.global_step)
            self.valid_writer.add_scalar("metric", score, self.global_step)
        if verbose:
            print(f"\nValidation loss: {mean_loss:.4f}")
            print(f"Validation metric: {score:.4f}")
        return score

    def validation(self, valid_loader, epoch: int) -> float:
        return self.evaluate(valid_loader, verbose=True, write_summary=True)

    def predict(self, loader, n_tta: int = 1) -> np.ndarray:
        """Sigmoid probabilities over a loader; TTA-averaged
        (reference predict, classifiers.py:770-797).

        NOTE: the eval step is deterministic — n_tta > 1 only helps when
        the loader itself is stochastic (train=True with a max_audio_length
        crop re-draws offsets per pass; see cli predict/evaluate
        --tta_max_audio_length). A deterministic loader makes every pass
        identical — the engine raises on that instead of silently paying
        n× for nothing (the reference's classifiers.py:770-797 behavior);
        CLI users get the same protection from
        cli.common.reject_degenerate_tta."""
        if n_tta > 1:
            train = getattr(loader, "train", None)
            crop = getattr(getattr(loader, "dataset", None),
                           "max_audio_length", None)
            if train is not None and not (train and crop):
                raise ValueError(
                    f"predict(n_tta={n_tta}) on a deterministic loader "
                    "would average identical passes. Build the loader with "
                    "train=True and a dataset max_audio_length (stochastic "
                    "crop TTA), or use n_tta=1. Perturbation-based TTA "
                    "lives in EnsemblePredictor.predict_loader(tta_fn=...)"
                )
            if getattr(getattr(loader, "sampler", None), "shuffle", False):
                raise ValueError(
                    f"predict(n_tta={n_tta}) on a SHUFFLED loader would "
                    "average misaligned rows (each pass reshuffles and "
                    "predict concatenates in loader order). Build the TTA "
                    "loader with shuffle=False, or use "
                    "cli.common.predict_ordered / "
                    "EnsemblePredictor.predict_loader, which restore "
                    "dataset order per pass via batch['index']"
                )
        all_tta = []
        for _ in range(n_tta):
            probs = []
            for batch in loader:
                device_batch, n = self._prep_batch(batch)
                out = self._eval_step(self.state, device_batch, jnp.int32(n))
                probs.append(np.asarray(out["probs"])[:n])
            all_tta.append(np.concatenate(probs))
        return np.mean(all_tta, axis=0)

    def fit_validate(self, train_loader, valid_loader, epochs: int, fold: int,
                     log_interval: int = 25, resume: bool = False) -> list:
        """Reference fit_validate (classifiers.py:799-868): per-epoch train +
        validate, periodic and best checkpoints, augmentation switch-off.
        With ``resume=True``, continues from the rolling last_model
        checkpoint (full state: params/opt/step/PRNG)."""
        cfg = self.train_config
        if self._writer_factory is not None:
            self.train_writer = self._writer_factory(fold, "train")
            self.valid_writer = self._writer_factory(fold, "valid")

        steps_per_epoch = len(train_loader)
        if steps_per_epoch == 0:
            raise ValueError(
                "train loader is empty — with drop_last batching every "
                "bucket had fewer clips than one batch; lower batch_size "
                "or use more data"
            )
        self.global_step = 0
        # never carry MixUp partners across folds: a stale pool could mix
        # another fold's (this fold's validation) clips into training audio
        self._mixup_pool = {}
        self.make_optimizer(
            max_steps=steps_per_epoch * epochs, steps_per_epoch=steps_per_epoch
        )
        if self.state is None:
            first = next(iter(train_loader))
            self.init_state(first)
            if self.warm_start_path:
                print(f"warm start from {self.warm_start_path}")
                self.warm_start(self.warm_start_path)

        switch_off = int(getattr(cfg, "switch_off_augmentations_on", 10**9))
        save_every = int(getattr(cfg, "_save_every", 10**9))

        # elastic resume: the reference restarts from epoch 0 with fresh
        # optimizer state (SURVEY.md §5 "failure detection: none"); here the
        # rolling "last_model" checkpoint carries the FULL train state, so
        # an interrupted fold continues exactly where it stopped.
        scores, best_score, start_epoch = [], -np.inf, 0
        if resume and self.checkpoint_dir is not None:
            meta = self._load_progress(fold)
            if meta is not None:
                self.load_checkpoint(fold, "last_model")
                start_epoch = meta["epoch"] + 1
                best_score = meta["best_score"]
                scores = list(meta["scores"])
                self.global_step = meta["global_step"]
                # keep the per-epoch reshuffle sequence aligned with the
                # uninterrupted run (loader reshuffles on epoch-keyed seeds)
                if hasattr(train_loader, "_epoch"):
                    train_loader._epoch = start_epoch
                print(f"resuming fold {fold} from epoch {start_epoch} "
                      f"(best {best_score:.4f})")

        for epoch in range(start_epoch, epochs):
            aug_scale = 0.0 if epoch >= switch_off else 1.0
            stats = self.train_epoch(
                train_loader, epoch, log_interval, aug_scale=aug_scale
            )
            print(
                f"Epoch {epoch}: loss {stats['loss']:.4f} "
                f"metric {stats['metric']:.4f} "
                f"({stats['clips_per_sec']:.1f} clips/s)"
            )
            score = self.validation(valid_loader, epoch)
            scores.append(score)

            if self.checkpoint_dir is not None:
                if epoch % save_every == 0:
                    self.save_checkpoint(fold, f"model_on_epoch_{epoch}")
                    # retention policy for periodic checkpoints (0 = keep
                    # all, the reference behavior); FIFO-ordered after the
                    # save above so it neither blocks the loop nor races the
                    # in-flight write
                    fold_dir = os.path.join(
                        self.checkpoint_dir, f"fold_{fold}")
                    keep = int(getattr(cfg, "_keep_checkpoints", 0))
                    ckpt_lib.write_after_saves(
                        lambda d=fold_dir, k=keep:
                        ckpt_lib.prune_epoch_checkpoints(d, k))
                if score > best_score:
                    self.save_checkpoint(fold, "best_model")
                # last_model is an atomic RESUME BUNDLE: state + progress
                # metadata become visible in one rename, so no kill point
                # can leave them unpaired (SIGKILL-tested,
                # tests/test_resume.py)
                meta = {
                    "epoch": epoch,
                    "best_score": float(max(best_score, score)),
                    "scores": [float(s) for s in scores],
                    "global_step": self.global_step,
                }
                ckpt_lib.save_resume_bundle(
                    self._ckpt_path(fold, "last_model"), self.state, meta)
            if score > best_score:
                best_score = score
        return scores

    def _load_progress(self, fold: int):
        meta = ckpt_lib.load_resume_meta(self._ckpt_path(fold, "last_model"))
        if meta is None:
            # legacy layout (pre-bundle experiments): progress.json beside
            # the plain last_model checkpoint
            import json

            try:
                with open(os.path.join(self.checkpoint_dir, f"fold_{fold}",
                                       "progress.json")) as f:
                    return json.load(f)
            except FileNotFoundError:
                return None
        return meta

    # ------------------------------------------------------------------
    # checkpointing (orbax; reference classifiers.py:846-866, 882-892)
    # ------------------------------------------------------------------

    def _ckpt_path(self, fold: int, name: str) -> str:
        return os.path.join(self.checkpoint_dir, f"fold_{fold}", name)

    def save_checkpoint(self, fold: int, name: str) -> None:
        ckpt_lib.save_state(self._ckpt_path(fold, name), self.state)

    def load_checkpoint(self, fold: int, name: str) -> None:
        if self.state is None:
            raise RuntimeError(
                "engine state not initialized; call make_optimizer + "
                "init_state (or fit_validate) before loading"
            )
        self.state = ckpt_lib.restore_state(
            self._ckpt_path(fold, name), self.state
        )

    def load_best_model(self, fold: int) -> None:
        self.load_checkpoint(fold, "best_model")

    def warm_start(self, checkpoint_path: str) -> None:
        """Load params + batch_stats from another experiment's checkpoint
        (reference finetune warm start, finetune_hierarchical_cnn.py:275-283);
        optimizer state and step restart fresh."""
        raw = ckpt_lib.restore_raw(checkpoint_path)
        self.state = self.state.replace(
            params=raw["params"], batch_stats=raw["batch_stats"]
        )
        self.state = mesh_lib.replicate_state(self.mesh, self.state)
