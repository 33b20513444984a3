"""Fold-parallel training: all K folds trained simultaneously.

The reference trains folds sequentially (train_2d_cnn.py:266 ``for fold in
args.folds``). On TPU the fold axis is, like everything else, just another
array dimension: per-fold train states are stacked pytrees, the train step is
``vmap``-ed over the fold axis, and per-step batches from the K fold loaders
are padded to a common bucket length (masking keeps this exact — SURVEY.md §7
padding invariance) and stacked to (K, B, L).

- On one chip, vmapping folds amortizes dispatch and fills the MXU the same
  way the inference fold-ensemble does (training/ensemble.py).
- On a mesh, the fold axis shards across devices: cross-fold training is
  embarrassingly parallel, so K folds on K devices run at single-fold
  wall-time with zero collectives between folds. This is the SURVEY §2b
  "map folds onto devices" scale-out.
- When devices outnumber folds, ``make_fold_dp_mesh`` builds a 2-D
  (fold, data) mesh: states shard P("fold") (replicated along "data"),
  batches shard P("fold", "data"), and XLA inserts the within-fold
  grad/BN collectives exactly as in the 1-D DP engine — fold-parallel
  AND data-parallel in one program, zero cross-fold traffic.

Correctness parity with the sequential path:
- per-fold batches are PADDED to the largest fold batch (repeating the last
  row, mesh-padding style) and masked out of loss/metric — no clip is ever
  trimmed away;
- the lock-step epoch runs to the LONGEST fold loader, cycling shorter
  loaders. This is a DELIBERATE DIVERGENCE from the sequential path, not an
  equivalence: with unbalanced folds, a shorter fold sees extra re-drawn
  batches each epoch (up to len_longest - len_shortest, drawn from a fresh
  reshuffle), so its per-epoch sample distribution differs slightly and its
  optimizer takes more steps per epoch than sequentially. With near-equal
  fold sizes (the k-fold norm) the difference is a few batches per epoch;
  artifacts (checkpoints, metrics files) have the same schema and
  semantics, but per-fold training trajectories are NOT bit-identical to
  the sequential path;
- resume (full stacked state via per-fold last_model checkpoints +
  progress.json), periodic ``save_every`` checkpoints, and per-fold
  tensorboard writers match Engine.fit_validate semantics.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from freesound_classification_tpu.ops import metrics as metrics_lib
from freesound_classification_tpu.training import checkpoints as ckpt_lib
from freesound_classification_tpu.training.engine import Engine


def _fold_axis_size(n_folds: int, n_devices: int) -> int:
    """Largest divisor of n_folds that fits the device count."""
    for d in range(min(n_devices, n_folds), 0, -1):
        if n_folds % d == 0:
            return d
    return 1


def make_fold_mesh(n_folds: int, devices=None) -> Mesh:
    """1-D mesh over min(n_folds, n_devices) devices, axis name "fold"."""
    if devices is None:
        devices = jax.devices()
    use = _fold_axis_size(n_folds, len(devices))
    return Mesh(np.asarray(devices[:use]), ("fold",))


def make_fold_dp_mesh(n_folds: int, devices=None,
                      dp: int | None = None,
                      layout: str = "auto") -> Mesh:
    """Mesh for K-fold x data-parallel training. Two layouts:

    - **fold-sharded** 2-D (fold, data): the stacked fold axis shards over
      "fold" and each fold's batch is data-parallel over "data" — K folds x
      D-way DP, zero cross-fold traffic; within a fold XLA inserts the
      grad/BN collectives exactly as in the 1-D DP engine (parallel/
      mesh.py). Used when fold x dp tiles the device count exactly
      (4 folds on 8 devices = 4 x 2).
    - **fold-local** 1-D ("data",): when no divisor tiling covers every
      device (the production 5-fold job on 8 devices would idle 3 of them
      as a 5 x 1 mesh), the fold axis stays a LOCAL vmap dimension — every
      device holds all K fold states (replicated) and the batch ROWS shard
      over all devices. Per-device work is K*B/n, the theoretical optimum
      (equal to fold-sharded when divisible, 1.6x better for 5-on-8);
      the cost is K x param memory per device and K x grad-psum bytes,
      negligible at this model scale. Per-fold numerics match the
      unvmapped truth (tests/test_multifold.py TestFoldLocalMesh).

    ``layout`` forces "fold_dp" / "fold_local"; "auto" picks fold-sharded
    when it uses every device, else fold-local. ``dp`` pins the data-axis
    width of the fold-sharded layout."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    f = _fold_axis_size(n_folds, n)
    d = dp if dp is not None else max(1, n // f)
    if layout == "fold_local" or (
            layout == "auto" and dp is None and f * d < n):
        return Mesh(np.asarray(devices), ("data",))
    if f * d > n:
        raise ValueError(
            f"fold x dp mesh needs {f}x{d} devices, have {n}")
    return Mesh(np.asarray(devices[:f * d]).reshape(f, d),
                ("fold", "data"))


def _stack_batches(batches: Sequence[dict], row_multiple: int = 1):
    """Pad K per-fold batches to a common (max batch, max length) and stack
    to (K, B, ...). Short batches are padded by repeating their last row
    (mesh-padding style, keeps BN statistics non-degenerate); the returned
    ``n_real`` (K,) marks how many rows of each fold are genuine so the step
    masks the padding out of loss/metric. Zero-padding along time +
    per-sample lengths keep featurization exact. ``row_multiple`` rounds
    the common batch size up so the row axis divides a data-parallel mesh
    axis (fold x dp meshes)."""
    max_len = max(b["signal"].shape[1] for b in batches)
    max_bs = max(b["signal"].shape[0] for b in batches)
    max_bs += (-max_bs) % row_multiple
    n_real = np.array([b["signal"].shape[0] for b in batches], np.int32)
    out = {}

    def pad_rows(x, bs):
        if x.shape[0] == bs:
            return x
        reps = np.repeat(x[-1:], bs - x.shape[0], axis=0)
        return np.concatenate([x, reps], axis=0)

    sig = []
    for b in batches:
        s = np.asarray(b["signal"])
        if s.shape[1] < max_len:
            s = np.pad(s, ((0, 0), (0, max_len - s.shape[1])))
        sig.append(pad_rows(s, max_bs))
    out["signal"] = np.stack(sig)
    for key in ("lengths", "labels", "is_noisy"):
        out[key] = np.stack(
            [pad_rows(np.asarray(b[key]), max_bs) for b in batches])
    return out, n_real


def _cycle_to(loader, n_steps: int):
    """Yield exactly n_steps batches, re-iterating the loader as needed."""
    done = 0
    while done < n_steps:
        got = False
        for batch in loader:
            got = True
            yield batch
            done += 1
            if done >= n_steps:
                return
        if not got:
            raise ValueError("empty fold loader in fold-parallel training")


class MultiFoldEngine:
    """Train K folds as one vmapped program.

    Wraps a template Engine (which owns model/frontend/loss/augment config);
    fold states are the template state with per-fold init seeds.
    """

    def __init__(self, template: Engine, n_folds: int,
                 mesh: Optional[Mesh] = None,
                 fold_ids: Optional[Sequence[int]] = None):
        self.template = template
        self.n_folds = n_folds
        self.fold_ids = list(fold_ids) if fold_ids is not None else list(
            range(n_folds))
        self.mesh = mesh if mesh is not None else make_fold_mesh(n_folds)
        mesh_axes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        # fold-sharded (classic) vs fold-local layout — see
        # make_fold_dp_mesh. Fold-local: no "fold" mesh axis; states are
        # replicated, the fold axis is a local vmap dim, batch rows shard
        # over "data".
        self.fold_sharded = "fold" in mesh_axes
        # data-parallel width of the batch ROW axis: per-fold dp width on
        # fold x dp meshes, the whole mesh in fold-local mode, 1 on the
        # classic 1-D fold mesh
        self.dp = mesh_axes.get("data", 1)
        if self.fold_sharded:
            self._batch_spec = (
                P("fold", "data") if "data" in mesh_axes else P("fold"))
            self._state_spec = P("fold")
        else:
            self._batch_spec = P(None, "data")
            self._state_spec = P()
        self.states = None  # stacked TrainState, leading fold axis
        self.global_step = 0
        # per-shape pool of the previous clean stacked batch (MixUp)
        self._mixup_pool: dict = {}

    # ------------------------------------------------------------------

    def make_optimizer(self, max_steps: int, steps_per_epoch: int) -> None:
        self.template.make_optimizer(max_steps, steps_per_epoch)

    def init_states(self, example_batch) -> None:
        """Vmapped init: one state per fold, different seeds."""
        tpl = self.template
        wave = jnp.asarray(example_batch["signal"][:1])
        lengths = jnp.asarray(example_batch["lengths"][:1])
        inputs, frame_lengths = tpl.frontend(wave, lengths)

        def init_one(seed):
            import flax

            from freesound_classification_tpu.training.state import (
                TrainState,
            )

            rng = jax.random.PRNGKey(seed)
            init_rng, state_rng = jax.random.split(rng)
            variables = tpl.model.init(
                {"params": init_rng}, inputs, frame_lengths, train=False)
            return TrainState.create(
                apply_fn=tpl.model.apply,
                params=variables["params"],
                batch_stats=variables.get(
                    "batch_stats", flax.core.freeze({})),
                tx=tpl.tx,
                rng=state_rng,
            )

        seeds = jnp.arange(self.n_folds) + tpl.seed
        self.states = jax.vmap(init_one)(seeds)
        self._shard_states()
        self._build_vmapped_step()

    def _shard_states(self) -> None:
        sharding = NamedSharding(self.mesh, self._state_spec)
        self.states = jax.device_put(self.states, jax.tree.map(
            lambda _: sharding, self.states,
            is_leaf=lambda x: hasattr(x, "shape")))

    def _build_vmapped_step(self) -> None:
        tpl = self.template
        augment = tpl.augment
        frontend = tpl.frontend

        def one_fold_step(state, batch, aug_scale, n_real, partner):
            rng, step_rng, dropout_rng = jax.random.split(state.rng, 3)
            wave, lengths = batch["signal"], batch["lengths"]
            labels = batch.get("labels")
            row_mask = (
                jnp.arange(wave.shape[0], dtype=jnp.int32) < n_real
            )
            # aug_scale is STATIC (see Engine.train_step): scale-0 epochs
            # compile an augmenter-free program (bit-exact skip) and a
            # static scale enables effects_chain's fixed-count compaction
            if augment is not None and aug_scale > 0.0:
                wave, lengths, labels = augment(
                    wave, lengths, labels, step_rng, aug_scale,
                    partner=partner)
            inputs, frame_lengths = frontend(wave, lengths)

            def loss_of(params):
                return tpl._forward_loss(
                    params, state.batch_stats, inputs, frame_lengths,
                    labels, dropout_rng, train=True,
                    row_mask=None if tpl.self_supervised else row_mask)

            (loss, (logits, new_stats, _)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            state = state.apply_gradients(
                grads=grads, batch_stats=new_stats, rng=rng)
            metric = (
                metrics_lib.lwlrap_jax(labels, jax.nn.sigmoid(logits),
                                       row_mask=row_mask)
                if logits is not None and labels is not None
                else jnp.float32(0.0)
            )
            return state, loss, metric

        def stepper(states, batch, aug_scale, n_real, partner):
            vstep = jax.vmap(
                lambda s, b, nr, pt: one_fold_step(s, b, aug_scale, nr, pt),
                in_axes=(0, 0, 0, 0))
            if self.fold_sharded and self.mesh.devices.size > 1:
                # Manual over "fold", GSPMD-auto over "data" (if present).
                # Two reasons, both measured on the 8-device CPU mesh:
                # 1. The fold axis never enters GSPMD sharding propagation,
                #    so the vmapped conv grads' fold-merging reshapes cannot
                #    provoke "Involuntary full rematerialization" resharding
                #    (MULTICHIP_r03 tail — replicate-then-partition
                #    fallbacks on every resnet conv grad; gate test
                #    TestFoldDpNoRemat).
                # 2. GSPMD-auto handling of the fold axis CHANGES NUMERICS
                #    vs the per-fold truth: at init, the eval forward's
                #    logits |sum| came out 55.7 under fold-axis GSPMD vs
                #    27.1 per-fold / 27.1 under shard_map — the fallback
                #    resharding is not value-preserving on this backend.
                #    With the fold axis manual, both the 1-D fold mesh and
                #    the fold x dp mesh match the unvmapped per-fold step
                #    (TestFoldDpMesh equivalence + truth tests).
                # Within-fold grad/BN collectives are still inserted over
                # "data" by GSPMD, exactly as in the 1-D DP engine;
                # cross-fold traffic is structurally zero.
                vstep = jax.shard_map(
                    vstep, mesh=self.mesh,
                    in_specs=(P("fold"), P("fold"), P("fold"), P("fold")),
                    out_specs=P("fold"),
                    axis_names=frozenset({"fold"}),
                    check_vma=False)
            return vstep(states, batch, n_real, partner)

        self._vmapped_step = jax.jit(stepper, donate_argnums=(0,),
                                     static_argnums=(2,))

    # ------------------------------------------------------------------

    def train_epoch(self, fold_loaders: List, aug_scale: float = 1.0,
                    writers: Optional[list] = None, log_interval: int = 25):
        """One lock-step pass: each global step consumes one batch per fold.

        The epoch runs to the LONGEST fold loader; shorter loaders cycle
        (fresh iterators, so their reshuffle still advances) — every fold
        consumes at least its full epoch of data and no batch is trimmed,
        but unbalanced folds see extra re-drawn batches vs the sequential
        path (a deliberate divergence; see the module docstring).
        """
        losses, metrics = [], []
        n_steps = max(len(l) for l in fold_loaders)
        sharding = NamedSharding(self.mesh, self._batch_spec)
        iters = [_cycle_to(l, n_steps) for l in fold_loaders]
        for step_idx, batches in enumerate(zip(*iters)):
            stacked, n_real = _stack_batches(batches, row_multiple=self.dp)
            device_batch = {
                k: jax.device_put(v, sharding) for k, v in stacked.items()
            }
            self.global_step += 1
            # per-fold MixUp partner pool = the previous same-shape clean
            # stacked batch (same dataset-wide widening as Engine; each
            # fold's partners stay within its own fold's train split)
            clean = (device_batch["signal"], device_batch["lengths"],
                     device_batch.get("labels"))
            pool_key = tuple(device_batch["signal"].shape)
            partner = self._mixup_pool.get(pool_key, clean) \
                if self.template.augment is not None else clean
            self.states, loss, metric = self._vmapped_step(
                self.states, device_batch, float(aug_scale),
                jnp.asarray(n_real), partner)
            if self.template.augment is not None:
                self._mixup_pool[pool_key] = clean
            losses.append(loss)
            metrics.append(metric)
            if writers and step_idx % log_interval == 0:
                loss_h, metric_h = np.asarray(loss), np.asarray(metric)
                for k, w in enumerate(writers):
                    if w is None:
                        continue
                    w.add_scalar("loss", float(loss_h[k]), self.global_step)
                    w.add_scalar("metric", float(metric_h[k]),
                                 self.global_step)
        return {
            "loss": np.mean([np.asarray(x) for x in losses], axis=0),
            "metric": np.mean([np.asarray(x) for x in metrics], axis=0),
        }

    def fold_state(self, fold: int):
        """Unstack one fold's TrainState (host-side)."""
        return jax.tree.map(lambda x: np.asarray(x)[fold], self.states)

    def validate_fold(self, fold: int, valid_loader) -> float:
        """Per-fold validation using the shared eval step."""
        tpl = self.template
        saved = tpl.state
        tpl.state = jax.device_put(self.fold_state(fold))
        try:
            return tpl.evaluate(valid_loader)
        finally:
            tpl.state = saved

    def save_fold_checkpoints(self, checkpoint_dir: str,
                              name: str = "best_model") -> None:
        for k in range(self.n_folds):
            path = os.path.join(
                checkpoint_dir, f"fold_{self.fold_ids[k]}", name)
            ckpt_lib.save_state(path, self.fold_state(k))

    def load_fold_checkpoints(self, checkpoint_dir: str,
                              name: str = "last_model") -> None:
        """Restore every fold's checkpoint into the stacked state."""
        restored = []
        for k in range(self.n_folds):
            path = os.path.join(
                checkpoint_dir, f"fold_{self.fold_ids[k]}", name)
            # orbax wants jax-typed leaves in the restore target (0-dim
            # numpy scalars from fold_state are rejected)
            target = jax.tree.map(jnp.asarray, self.fold_state(k))
            restored.append(ckpt_lib.restore_state(path, target))
        self.states = jax.tree.map(
            lambda *xs: jnp.stack(xs), *restored)
        self._shard_states()

    # ------------------------------------------------------------------

    def _progress_path(self, checkpoint_dir: str) -> str:
        return os.path.join(checkpoint_dir, "multifold_progress.json")

    def _bundle_path(self, checkpoint_dir: str) -> str:
        return os.path.join(checkpoint_dir, "multifold_resume")

    def fit(self, fold_train_loaders, fold_valid_loaders, epochs: int,
            checkpoint_dir: Optional[str] = None, resume: bool = False,
            log_interval: int = 25) -> list:
        """Train all folds simultaneously; returns per-fold best scores.

        Mirrors Engine.fit_validate: per-epoch validation, rolling
        best/last checkpoints, periodic ``_save_every`` checkpoints,
        epoch-gated augmentation switch-off, tensorboard writers (via the
        template's writer factory), and exact mid-training resume.
        """
        cfg = self.template.train_config
        steps_per_epoch = max(len(l) for l in fold_train_loaders)
        self.make_optimizer(
            max_steps=steps_per_epoch * epochs,
            steps_per_epoch=steps_per_epoch)
        first = next(iter(fold_train_loaders[0]))
        self.init_states(first)

        train_writers, valid_writers = None, None
        if self.template._writer_factory is not None:
            train_writers = [
                self.template._writer_factory(f, "train")
                for f in self.fold_ids
            ]
            valid_writers = [
                self.template._writer_factory(f, "valid")
                for f in self.fold_ids
            ]

        switch_off = int(getattr(cfg, "switch_off_augmentations_on", 10**9))
        save_every = int(getattr(cfg, "_save_every", 10**9))

        best = [-np.inf] * self.n_folds
        start_epoch = 0
        if resume and checkpoint_dir is not None:
            bundle = self._bundle_path(checkpoint_dir)
            meta = ckpt_lib.load_resume_meta(bundle)
            if meta is not None:
                # atomic resume bundle: the stacked states and their
                # metadata were published in one rename (crash-paired)
                self.states = ckpt_lib.restore_state(bundle, self.states)
                self._shard_states()
            else:
                # legacy layout: per-fold last_model + progress json
                ckpt_lib.wait_for_saves()
                try:
                    with open(self._progress_path(checkpoint_dir)) as f:
                        meta = json.load(f)
                except FileNotFoundError:
                    meta = None
                if meta is not None:
                    self.load_fold_checkpoints(checkpoint_dir, "last_model")
            if meta is not None:
                start_epoch = meta["epoch"] + 1
                best = list(meta["best"])
                self.global_step = meta["global_step"]
                for loader in fold_train_loaders:
                    if hasattr(loader, "_epoch"):
                        loader._epoch = start_epoch
                print(f"resuming folds {self.fold_ids} from epoch "
                      f"{start_epoch} (best {np.round(best, 4)})")

        for epoch in range(start_epoch, epochs):
            aug_scale = 0.0 if epoch >= switch_off else 1.0
            stats = self.train_epoch(
                fold_train_loaders, aug_scale,
                writers=train_writers, log_interval=log_interval)
            scores = [
                self.validate_fold(k, fold_valid_loaders[k])
                for k in range(self.n_folds)
            ]
            print(f"epoch {epoch}: loss {np.round(stats['loss'], 4)} "
                  f"val {np.round(scores, 4)}")
            if valid_writers is not None:
                for k, w in enumerate(valid_writers):
                    if w is not None:
                        w.add_scalar("metric", float(scores[k]),
                                     self.global_step)
            for k, s in enumerate(scores):
                if s > best[k]:
                    best[k] = s
                    if checkpoint_dir is not None:
                        ckpt_lib.save_state(
                            os.path.join(checkpoint_dir,
                                         f"fold_{self.fold_ids[k]}",
                                         "best_model"),
                            self.fold_state(k))
            if checkpoint_dir is not None:
                if epoch % save_every == 0:
                    self.save_fold_checkpoints(
                        checkpoint_dir, f"model_on_epoch_{epoch}")
                # atomic resume bundle: ALL folds' stacked states + the
                # progress metadata become visible in one rename — no kill
                # point can leave folds at mixed epochs or progress
                # unpaired with its states (tests/test_resume.py)
                meta = {
                    "epoch": epoch,
                    "best": [float(b) for b in best],
                    "global_step": self.global_step,
                }
                ckpt_lib.save_resume_bundle(
                    self._bundle_path(checkpoint_dir), self.states, meta)
        return best
