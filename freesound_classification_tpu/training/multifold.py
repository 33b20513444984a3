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
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from freesound_classification_tpu.ops import metrics as metrics_lib
from freesound_classification_tpu.training import checkpoints as ckpt_lib
from freesound_classification_tpu.training.engine import Engine


def make_fold_mesh(n_folds: int, devices=None) -> Mesh:
    """1-D mesh over min(n_folds, n_devices) devices, axis name "fold"."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    # the fold axis must divide the device count we use
    use = 1
    for d in range(min(n, n_folds), 0, -1):
        if n_folds % d == 0:
            use = d
            break
    return Mesh(np.asarray(devices[:use]), ("fold",))


def _stack_batches(batches: Sequence[dict]) -> dict:
    """Pad K per-fold batches to a common bucket length and stack to
    (K, B, ...). Zero-padding + per-sample lengths keep results exact."""
    max_len = max(b["signal"].shape[1] for b in batches)
    min_bs = min(b["signal"].shape[0] for b in batches)
    out = {}
    sig = []
    for b in batches:
        s = b["signal"][:min_bs]
        if s.shape[1] < max_len:
            s = np.pad(s, ((0, 0), (0, max_len - s.shape[1])))
        sig.append(s)
    out["signal"] = np.stack(sig)
    for key in ("lengths", "labels", "is_noisy"):
        out[key] = np.stack([np.asarray(b[key][:min_bs]) for b in batches])
    return out


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
        self.states = None  # stacked TrainState, leading fold axis
        self.global_step = 0

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
        sharding = NamedSharding(self.mesh, P("fold"))
        self.states = jax.device_put(self.states, jax.tree.map(
            lambda _: sharding, self.states,
            is_leaf=lambda x: hasattr(x, "shape")))
        self._build_vmapped_step()

    def _build_vmapped_step(self) -> None:
        tpl = self.template
        augment = tpl.augment
        frontend = tpl.frontend

        def one_fold_step(state, batch, aug_scale):
            rng, step_rng, dropout_rng = jax.random.split(state.rng, 3)
            wave, lengths = batch["signal"], batch["lengths"]
            labels = batch.get("labels")
            if augment is not None:
                wave, lengths, labels = augment(
                    wave, lengths, labels, step_rng, aug_scale)
            inputs, frame_lengths = frontend(wave, lengths)

            def loss_of(params):
                return tpl._forward_loss(
                    params, state.batch_stats, inputs, frame_lengths,
                    labels, dropout_rng, train=True)

            (loss, (logits, new_stats, _)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            state = state.apply_gradients(
                grads=grads, batch_stats=new_stats, rng=rng)
            metric = (
                metrics_lib.lwlrap_jax(labels, jax.nn.sigmoid(logits))
                if logits is not None and labels is not None
                else jnp.float32(0.0)
            )
            return state, loss, metric

        vstep = jax.vmap(one_fold_step, in_axes=(0, 0, None))
        self._vmapped_step = jax.jit(vstep, donate_argnums=(0,))

    # ------------------------------------------------------------------

    def train_epoch(self, fold_loaders: List, aug_scale: float = 1.0):
        """One lock-step pass: each global step consumes one batch per fold
        (epoch length = shortest fold loader)."""
        losses, metrics = [], []
        sharding = NamedSharding(self.mesh, P("fold"))
        for batches in zip(*[iter(l) for l in fold_loaders]):
            stacked = _stack_batches(batches)
            device_batch = {
                k: jax.device_put(v, sharding) for k, v in stacked.items()
            }
            self.global_step += 1
            self.states, loss, metric = self._vmapped_step(
                self.states, device_batch, jnp.float32(aug_scale))
            losses.append(np.asarray(loss))
            metrics.append(np.asarray(metric))
        return {
            "loss": np.mean(losses, axis=0),
            "metric": np.mean(metrics, axis=0),
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
        for fold in range(self.n_folds):
            path = os.path.join(checkpoint_dir, f"fold_{fold}", name)
            ckpt_lib.save_state(path, self.fold_state(fold))

    def fit(self, fold_train_loaders, fold_valid_loaders, epochs: int,
            checkpoint_dir: Optional[str] = None) -> list:
        """Train all folds simultaneously; returns per-fold best scores."""
        cfg = self.template.train_config
        steps_per_epoch = min(len(l) for l in fold_train_loaders)
        self.make_optimizer(
            max_steps=steps_per_epoch * epochs,
            steps_per_epoch=steps_per_epoch)
        first = next(iter(fold_train_loaders[0]))
        self.init_states(first)

        switch_off = int(getattr(cfg, "switch_off_augmentations_on", 10**9))
        best = [-np.inf] * self.n_folds
        for epoch in range(epochs):
            aug_scale = 0.0 if epoch >= switch_off else 1.0
            stats = self.train_epoch(fold_train_loaders, aug_scale)
            scores = [
                self.validate_fold(k, fold_valid_loaders[k])
                for k in range(self.n_folds)
            ]
            print(f"epoch {epoch}: loss {np.round(stats['loss'], 4)} "
                  f"val {np.round(scores, 4)}")
            for k, s in enumerate(scores):
                if s > best[k]:
                    best[k] = s
                    if checkpoint_dir is not None:
                        ckpt_lib.save_state(
                            os.path.join(checkpoint_dir,
                                         f"fold_{self.fold_ids[k]}",
                                         "best_model"),
                            self.fold_state(k))
        return best
