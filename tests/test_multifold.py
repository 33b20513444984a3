"""Fold-parallel training: all folds as one vmapped/sharded program."""

import numpy as np
import pytest

from freesound_classification_tpu.training.multifold import (
    MultiFoldEngine,
    _stack_batches,
    make_fold_dp_mesh,
    make_fold_mesh,
)
from tests.test_engine import ListLoader, _make_engine, _synthetic_batches


class TestStacking:
    def test_pads_to_common_bucket(self):
        a = {"signal": np.ones((4, 100), "f4"),
             "lengths": np.full(4, 100, "i4"),
             "labels": np.ones((4, 3), "f4"),
             "is_noisy": np.zeros(4, "f4")}
        b = {"signal": np.ones((4, 60), "f4"),
             "lengths": np.full(4, 60, "i4"),
             "labels": np.ones((4, 3), "f4"),
             "is_noisy": np.zeros(4, "f4")}
        out, n_real = _stack_batches([a, b])
        assert out["signal"].shape == (2, 4, 100)
        assert np.all(out["signal"][1, :, 60:] == 0)
        assert out["lengths"][1, 0] == 60
        assert list(n_real) == [4, 4]

    def test_unequal_batch_sizes_pad_not_trim(self):
        """Round-1 bug: batches were trimmed to the smallest fold batch,
        silently dropping clips. Now the smaller batch pads by repeating
        its last row and n_real marks the genuine rows."""
        a = {"signal": np.arange(12, dtype="f4").reshape(6, 2),
             "lengths": np.full(6, 2, "i4"),
             "labels": np.ones((6, 3), "f4"),
             "is_noisy": np.zeros(6, "f4")}
        b = {"signal": np.arange(8, dtype="f4").reshape(4, 2) + 100,
             "lengths": np.full(4, 2, "i4"),
             "labels": np.ones((4, 3), "f4"),
             "is_noisy": np.zeros(4, "f4")}
        out, n_real = _stack_batches([a, b])
        assert out["signal"].shape == (2, 6, 2)
        assert list(n_real) == [6, 4]
        # fold 0 keeps every row (nothing trimmed)
        np.testing.assert_array_equal(out["signal"][0], a["signal"])
        # fold 1's padding repeats its last real row
        np.testing.assert_array_equal(out["signal"][1, 4], b["signal"][3])
        np.testing.assert_array_equal(out["signal"][1, 5], b["signal"][3])

    def test_fold_mesh_divides(self):
        mesh = make_fold_mesh(2)
        assert 2 % mesh.devices.size == 0 or mesh.devices.size % 2 == 0

    def test_mesh_uses_multiple_devices(self):
        import jax

        assert len(jax.devices()) == 8
        mesh = make_fold_mesh(4)
        assert mesh.devices.size == 4


class TestMultiFoldTraining:
    def test_trains_all_folds_and_matches_quality(self, tmp_path):
        n_folds = 2
        fold_train = [
            ListLoader(_synthetic_batches(3, 8, seed=k)) for k in range(n_folds)
        ]
        fold_valid = [
            ListLoader(_synthetic_batches(1, 8, seed=10 + k))
            for k in range(n_folds)
        ]

        template = _make_engine(tmp_path)
        mf = MultiFoldEngine(template, n_folds)
        best = mf.fit(fold_train, fold_valid, epochs=4,
                      checkpoint_dir=str(tmp_path))
        assert len(best) == n_folds
        for s in best:
            assert np.isfinite(s) and s > 0.4

        # per-fold checkpoints restorable by the ordinary engine
        eng = _make_engine(tmp_path)
        eng.make_optimizer(max_steps=4, steps_per_epoch=4)
        eng.init_state(fold_train[0][0])
        eng.load_best_model(0)
        preds = eng.predict(fold_valid[0])
        assert preds.shape == (8, 4)

    def test_epoch_consumes_every_batch(self, tmp_path):
        """Unequal loader lengths: the epoch runs to the longest loader and
        shorter ones cycle — no clip is silently dropped (round-1 bug)."""

        class CountingLoader(ListLoader):
            def __init__(self, batches):
                super().__init__(batches)
                self.yielded = 0

            def __iter__(self):
                for b in list.__iter__(self):
                    self.yielded += 1
                    yield b

        long_l = CountingLoader(_synthetic_batches(3, 8, seed=0))
        short_l = CountingLoader(_synthetic_batches(2, 8, seed=1))
        template = _make_engine(tmp_path)
        mf = MultiFoldEngine(template, 2)
        mf.make_optimizer(max_steps=3, steps_per_epoch=3)
        mf.init_states(long_l[0])
        mf.train_epoch([long_l, short_l])
        assert long_l.yielded == 3          # full epoch of the longest
        assert short_l.yielded == 3         # 2 + 1 cycled

    def test_resume_continues(self, tmp_path):
        fold_train = [
            ListLoader(_synthetic_batches(2, 8, seed=k)) for k in range(2)
        ]
        template = _make_engine(tmp_path)
        mf = MultiFoldEngine(template, 2)
        mf.fit(fold_train, fold_train, epochs=2,
               checkpoint_dir=str(tmp_path))
        step_after_2 = mf.global_step

        template2 = _make_engine(tmp_path)
        mf2 = MultiFoldEngine(template2, 2)
        best = mf2.fit(fold_train, fold_train, epochs=3,
                       checkpoint_dir=str(tmp_path), resume=True)
        # resumed at epoch 2, ran exactly one more epoch
        assert mf2.global_step == step_after_2 + len(fold_train[0])
        assert len(best) == 2

    def test_folds_learn_independently(self, tmp_path):
        """Fold 0 and fold 1 see different data -> different params."""
        import jax

        fold_train = [
            ListLoader(_synthetic_batches(2, 8, seed=k)) for k in range(2)
        ]
        template = _make_engine(tmp_path)
        mf = MultiFoldEngine(template, 2)
        mf.fit(fold_train, fold_train, epochs=1)
        p0 = jax.tree.leaves(mf.fold_state(0).params)
        p1 = jax.tree.leaves(mf.fold_state(1).params)
        assert any(
            not np.allclose(a, b) for a, b in zip(p0, p1)
        )


class TestFoldDpMesh:
    """2-D (fold, data) mesh: fold-parallel AND within-fold data-parallel."""

    def test_mesh_shapes(self):
        import jax

        assert len(jax.devices()) == 8
        shapes = {
            2: {"fold": 2, "data": 4},
            4: {"fold": 4, "data": 2},
            # non-divisor fold counts pick the fold-LOCAL layout: all 8
            # devices on the data axis instead of idling 3 on a 5x1 mesh
            3: {"data": 8},
            5: {"data": 8},
            8: {"fold": 8, "data": 1},
        }
        for n_folds, want in shapes.items():
            mesh = make_fold_dp_mesh(n_folds)
            got = dict(zip(mesh.axis_names, mesh.devices.shape))
            assert got == want, f"n_folds={n_folds}: {got} != {want}"
        # explicit layout override keeps the old fold-sharded 5x1 shape
        mesh = make_fold_dp_mesh(5, layout="fold_dp")
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
            "fold": 5, "data": 1}
        mesh = make_fold_dp_mesh(4, layout="fold_local")
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 8}

    def test_explicit_dp_width(self):
        mesh = make_fold_dp_mesh(2, dp=2)
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
            "fold": 2, "data": 2}
        with pytest.raises(ValueError):
            make_fold_dp_mesh(5, dp=4)  # 5*4 > 8 devices

    def test_stacking_row_multiple(self):
        a = {"signal": np.arange(12, dtype="f4").reshape(6, 2),
             "lengths": np.full(6, 2, "i4"),
             "labels": np.ones((6, 3), "f4"),
             "is_noisy": np.zeros(6, "f4")}
        b = {"signal": np.ones((4, 2), "f4"),
             "lengths": np.full(4, 2, "i4"),
             "labels": np.ones((4, 3), "f4"),
             "is_noisy": np.zeros(4, "f4")}
        out, n_real = _stack_batches([a, b], row_multiple=4)
        # 6 rounds up to 8 so the row axis divides a 4-wide data axis
        assert out["signal"].shape == (2, 8, 2)
        assert list(n_real) == [6, 4]
        np.testing.assert_array_equal(out["signal"][0, :6], a["signal"])
        np.testing.assert_array_equal(out["signal"][0, 7], a["signal"][5])

    def test_fold_dp_matches_fold_only_with_augmentation_on(self):
        """The 2-D mesh runs the SAME program math as the 1-D fold mesh —
        within-fold batch sharding must not change losses or final params
        (GSPMD inserts the collectives; same per-fold PRNG streams). The
        full augmentation chain runs inside the step, so MixUp partner
        indexing, the fixed-count effects compaction, and BN batch stats
        are all exercised across the data axis.

        Tolerance note: on the fold mesh each fold's batch lives on one
        device, on the fold x dp mesh it is split 4-ways, so batch-sum
        reduction ORDER differs — bf16/f32 rounding noise that adam's
        grad/sqrt(v) normalization amplifies over steps. param atol 5e-3
        absorbs that (observed max 2.2e-3 under the pre-r5 optimizer;
        3.2e-3 on 1 of 2304 elements once the torch-exact amsgrad takes
        FULL-SIZE early steps instead of the collapsed-lr ones) while
        still catching structural divergence (which shows as O(1) on many
        elements)."""
        import jax

        from freesound_classification_tpu.ops import augment as augment_lib

        n_folds = 2
        results = {}
        for mesh_kind in ("fold", "fold_dp"):
            fold_train = [
                ListLoader(_synthetic_batches(3, 8, seed=k))
                for k in range(n_folds)
            ]
            template = _make_engine()
            template.augment = augment_lib.make_augmenter(
                augment_lib.AugmentConfig(
                    p_mixup=0.5, p_aug=0.5, p_shuffle=0.5, sr=8000))
            mesh = (make_fold_mesh(n_folds) if mesh_kind == "fold"
                    else make_fold_dp_mesh(n_folds))
            mf = MultiFoldEngine(template, n_folds, mesh=mesh)
            if mesh_kind == "fold_dp":
                assert mf.dp == 4
            mf.make_optimizer(max_steps=6, steps_per_epoch=3)
            mf.init_states(fold_train[0][0])
            stats = mf.train_epoch(fold_train)
            results[mesh_kind] = (
                stats["loss"],
                jax.tree_util.tree_flatten_with_path(
                    jax.device_get(mf.states.params))[0],
            )
        np.testing.assert_allclose(
            results["fold"][0], results["fold_dp"][0], rtol=2e-4)
        for (path, a), (_, b) in zip(results["fold"][1],
                                     results["fold_dp"][1]):
            # biases directly shadowed by a following BatchNorm have ~zero
            # gradient by construction (BN subtracts the mean), so adam
            # amplifies cross-mesh reduction-order noise into lr-sized
            # random walks on them — skip those; every leaf that carries
            # real signal must agree across mesh shapes
            if jax.tree_util.keystr(path).endswith("['bias']"):
                continue
            scale = np.maximum(np.abs(a).max(), 1e-8)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=5e-3,
                err_msg=jax.tree_util.keystr(path))


class TestFoldParallelMatchesPerFoldTruth:
    def test_sharded_forward_equals_unvmapped_per_fold(self):
        """The fold-parallel program on a multi-device mesh must compute
        the SAME values as applying the model per fold on one device.

        This is the test that would have caught the round-3 bug: with the
        fold axis handled by GSPMD-auto (plain vmap over sharded states),
        the partitioner's replicate-then-partition fallbacks were not
        value-preserving — the eval forward's logits came out wildly
        different from the per-fold truth (|sum| 55.7 vs 27.1 at init) on
        the 8-device mesh, invisible to the fold-vs-fold_dp equivalence
        test because BOTH meshes shared the corruption. The fold axis now
        goes through a partial-manual shard_map; this pins the values to
        truth."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_folds = 2
        fold_train = [
            ListLoader(_synthetic_batches(1, 8, seed=k))
            for k in range(n_folds)
        ]
        template = _make_engine()
        mf = MultiFoldEngine(template, n_folds,
                             mesh=make_fold_dp_mesh(n_folds))
        mf.make_optimizer(max_steps=2, steps_per_epoch=1)
        mf.init_states(fold_train[0][0])
        frontend = template.frontend

        stacked, n_real = _stack_batches([l[0] for l in fold_train],
                                         row_multiple=mf.dp)
        sharding = NamedSharding(mf.mesh, mf._batch_spec)
        db = {k: jax.device_put(v, sharding) for k, v in stacked.items()}

        # per-fold truth BEFORE the step consumes the states: the exact
        # same rng split / loss math as one_fold_step, unvmapped, on one
        # device (aug_scale=0 and _make_engine has no augmenter, so the
        # augmentation branch is compiled out on both sides)
        states_host = jax.device_get(mf.states)
        truth_losses = []
        for k in range(n_folds):
            st = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[k]),
                              states_host)
            bt = {kk: jnp.asarray(np.asarray(v)[k])
                  for kk, v in db.items()}
            _, _, dropout_rng = jax.random.split(st.rng, 3)
            inputs, fl = frontend(bt["signal"], bt["lengths"])
            row_mask = (jnp.arange(bt["signal"].shape[0], dtype=jnp.int32)
                        < int(n_real[k]))
            loss, _ = template._forward_loss(
                st.params, st.batch_stats, inputs, fl, bt["labels"],
                dropout_rng, train=True, row_mask=row_mask)
            truth_losses.append(float(loss))

        clean = (db["signal"], db["lengths"], db.get("labels"))
        _, loss, _ = mf._vmapped_step(
            mf.states, db, 0.0, jnp.asarray(n_real), clean)
        np.testing.assert_allclose(
            np.asarray(loss), np.asarray(truth_losses),
            rtol=1e-4, atol=1e-5)


class TestFoldLocalMesh:
    """Fold-LOCAL layout (5 folds on 8 devices): states replicated, the
    fold axis a local vmap dim, batch rows sharded over every device."""

    def test_fold_local_forward_equals_unvmapped_per_fold(self):
        """Per-fold truth must survive the fold-local layout (the round-3
        GSPMD fold-axis corruption class — here the fold axis never enters
        GSPMD at all, but the data-sharded rows of the vmapped step still
        must reduce to the same per-fold losses)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_folds = 5
        fold_train = [
            ListLoader(_synthetic_batches(1, 8, seed=k))
            for k in range(n_folds)
        ]
        template = _make_engine()
        mesh = make_fold_dp_mesh(n_folds)
        mf = MultiFoldEngine(template, n_folds, mesh=mesh)
        assert not mf.fold_sharded and mf.dp == 8
        mf.make_optimizer(max_steps=2, steps_per_epoch=1)
        mf.init_states(fold_train[0][0])
        frontend = template.frontend

        stacked, n_real = _stack_batches([l[0] for l in fold_train],
                                         row_multiple=mf.dp)
        sharding = NamedSharding(mf.mesh, mf._batch_spec)
        db = {k: jax.device_put(v, sharding) for k, v in stacked.items()}

        states_host = jax.device_get(mf.states)
        truth_losses = []
        for k in range(n_folds):
            st = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[k]),
                              states_host)
            bt = {kk: jnp.asarray(np.asarray(v)[k])
                  for kk, v in db.items()}
            _, _, dropout_rng = jax.random.split(st.rng, 3)
            inputs, fl = frontend(bt["signal"], bt["lengths"])
            row_mask = (jnp.arange(bt["signal"].shape[0], dtype=jnp.int32)
                        < int(n_real[k]))
            loss, _ = template._forward_loss(
                st.params, st.batch_stats, inputs, fl, bt["labels"],
                dropout_rng, train=True, row_mask=row_mask)
            truth_losses.append(float(loss))

        clean = (db["signal"], db["lengths"], db.get("labels"))
        _, loss, _ = mf._vmapped_step(
            mf.states, db, 0.0, jnp.asarray(n_real), clean)
        np.testing.assert_allclose(
            np.asarray(loss), np.asarray(truth_losses),
            rtol=1e-4, atol=1e-5)

    def test_fold_local_matches_fold_mesh_with_augmentation_on(self):
        """Same program math as the 1-D fold-sharded mesh, full augmenter
        ON — only the batch-row placement differs, so losses and params
        must agree to reduction-order noise (tolerances mirror
        TestFoldDpMesh.test_fold_dp_matches_fold_only...)."""
        import jax

        from freesound_classification_tpu.ops import augment as augment_lib

        n_folds = 5
        results = {}
        for mesh_kind in ("fold", "fold_local"):
            fold_train = [
                ListLoader(_synthetic_batches(2, 8, seed=k))
                for k in range(n_folds)
            ]
            template = _make_engine()
            template.augment = augment_lib.make_augmenter(
                augment_lib.AugmentConfig(
                    p_mixup=0.5, p_aug=0.5, p_shuffle=0.5, sr=8000))
            mesh = (make_fold_mesh(n_folds) if mesh_kind == "fold"
                    else make_fold_dp_mesh(n_folds))
            mf = MultiFoldEngine(template, n_folds, mesh=mesh)
            if mesh_kind == "fold_local":
                assert not mf.fold_sharded and mf.dp == 8
            else:
                assert mf.fold_sharded
            mf.make_optimizer(max_steps=4, steps_per_epoch=2)
            mf.init_states(fold_train[0][0])
            stats = mf.train_epoch(fold_train)
            results[mesh_kind] = (
                stats["loss"],
                jax.tree_util.tree_flatten_with_path(
                    jax.device_get(mf.states.params))[0],
            )
        np.testing.assert_allclose(
            results["fold"][0], results["fold_local"][0], rtol=2e-4)
        for (path, a), (_, b) in zip(results["fold"][1],
                                     results["fold_local"][1]):
            if jax.tree_util.keystr(path).endswith("['bias']"):
                continue
            scale = np.maximum(np.abs(a).max(), 1e-8)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=5e-3,
                err_msg=jax.tree_util.keystr(path))


class TestFoldDpNoRemat:
    @pytest.mark.parametrize("n_folds", [2, 5])
    def test_no_involuntary_rematerialization(self, n_folds):
        """The fold x dp step must compile WITHOUT GSPMD "Involuntary full
        rematerialization" fallbacks (MULTICHIP_r03 tail: the vmapped conv
        grads' fold-merging reshapes provoked replicate-then-partition
        resharding — genuine all-gathers of activation tensors on a real
        mesh). multifold routes the fold axis through a partial-manual
        shard_map so it never enters GSPMD propagation; this subprocess
        gate (fresh process -> no persistent-cache hit -> the partitioner
        actually runs, its C++ warnings land on captured stderr) keeps it
        that way."""
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, "/root/repo/scripts/probe_folddp_remat.py",
             str(n_folds)],
            capture_output=True, text=True, timeout=900, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "losses:" in proc.stdout
        n_remat = proc.stderr.count("Involuntary full rematerialization")
        assert n_remat == 0, (
            f"{n_remat} involuntary remats in the fold x dp program:\n"
            + proc.stderr[-2000:])
