"""Data pipeline tests: WAV IO, folds, bucketing, loader invariants."""

import os

import numpy as np
import pytest

from freesound_classification_tpu.data import audio_io, bucketing, folds
from freesound_classification_tpu.data.dataset import (
    ClipDataset,
    class_names_from_classmap,
)
from freesound_classification_tpu.data.loader import make_loader


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.RandomState(0)
    files, lengths = [], []
    for i, n in enumerate([4000, 12000, 30000, 70000, 70000, 8000]):
        path = str(d / f"clip{i}.wav")
        audio_io.write_wav(path, rng.randn(n) * 0.1, 44100)
        files.append(path)
        lengths.append(n)
    return files, lengths


class TestAudioIO:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(1)
        x = (rng.randn(5000) * 0.2).astype(np.float32)
        path = str(tmp_path / "t.wav")
        audio_io.write_wav(path, x, 22050)
        y, sr = audio_io.read_wav(path)
        assert sr == 22050
        assert y.dtype == np.float32
        np.testing.assert_allclose(x.clip(-1, 1), y, atol=1e-4)

    def test_header_length(self, wav_dir):
        files, lengths = wav_dir
        for f, n in zip(files, lengths):
            frames, sr = audio_io.wav_length(f)
            assert frames == n and sr == 44100

    def test_resample(self):
        t = np.arange(44100) / 44100
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = audio_io.resample(x, 44100, 22050)
        assert abs(y.size - 22050) <= 1


class TestFolds:
    def test_plain_kfold_partitions(self):
        splits = list(folds.train_validation_data(np.arange(50), None, 5, 42))
        assert len(splits) == 5
        all_valid = np.concatenate([v for _, v in splits])
        assert sorted(all_valid.tolist()) == list(range(50))

    def test_stratified_partitions_and_balance(self):
        rng = np.random.RandomState(0)
        n, c = 200, 10
        y = (rng.rand(n, c) < 0.15).astype(np.float32)
        mskf = folds.MultilabelStratifiedKFold(5, random_state=42)
        splits = list(mskf.split(np.arange(n), y))
        all_valid = np.concatenate([v for _, v in splits])
        assert sorted(all_valid.tolist()) == list(range(n))
        # per-class counts roughly balanced across folds (the greedy
        # Sechidis algorithm — matching iterstrat exactly — allows a
        # slightly wider spread than a candidate-shuffling variant)
        counts = np.stack([y[v].sum(axis=0) for _, v in splits])
        spread = counts.max(axis=0) - counts.min(axis=0)
        # per-class worst case stays bounded and the average spread small
        assert spread.max() <= 6
        assert spread.mean() <= 2.0

    def test_deterministic_under_seed(self):
        rng = np.random.RandomState(1)
        y = (rng.rand(60, 5) < 0.2).astype(np.float32)
        a = list(folds.MultilabelStratifiedKFold(4, random_state=7)
                 .split(np.arange(60), y))
        b = list(folds.MultilabelStratifiedKFold(4, random_state=7)
                 .split(np.arange(60), y))
        for (ta, va), (tb, vb) in zip(a, b):
            np.testing.assert_array_equal(va, vb)

    def test_golden_fold_membership(self):
        """Pinned fold assignment for a fixed (labels, seed) fixture — fold
        membership must stay reproducible across framework versions so OOF
        artifacts remain comparable (VERDICT r1 #10)."""
        rng = np.random.RandomState(3)
        y = (rng.rand(24, 4) < 0.3).astype(np.float32)
        got = folds.MultilabelStratifiedKFold(
            3, random_state=42)._make_test_folds(y)
        golden = [0, 1, 1, 2, 1, 2, 1, 1, 1, 0, 2, 1,
                  0, 1, 2, 0, 2, 0, 0, 0, 2, 2, 2, 0]
        np.testing.assert_array_equal(got, golden)

    def test_binarize(self):
        cm = {"Bark": 0, "Meow": 1, "Moo": 2}
        out = folds.binarize_label_strings(["Bark,Moo", "Meow"], cm)
        np.testing.assert_array_equal(out, [[1, 0, 1], [0, 1, 0]])


class TestBucketing:
    def test_ladder_covers_and_aligned(self):
        ladder = bucketing.make_bucket_ladder(661500, min_length=32768)
        assert ladder[-1] >= 661500
        assert all(l % 1024 == 0 for l in ladder)
        assert len(ladder) <= 8

    def test_bucket_of(self):
        ladder = [1000, 2000, 4000]
        idx = bucketing.bucket_of(np.array([1, 1000, 1001, 3999, 9999]), ladder)
        np.testing.assert_array_equal(idx, [0, 0, 1, 2, 2])

    def test_sampler_same_bucket_batches(self):
        lengths = np.array([100, 5000, 5100, 90, 80, 5200, 5300, 110])
        ladder = [1024, 8192]
        s = bucketing.BucketBatchSampler(
            lengths, ladder, batch_size=2, shuffle=True, seed=0)
        buckets = bucketing.bucket_of(lengths, ladder)
        for batch in s:
            assert len(set(buckets[batch])) == 1

    def test_max_batch_elems_packing(self):
        lengths = np.array([1000] * 10)
        ladder = [1024]
        s = bucketing.BucketBatchSampler(
            lengths, ladder, max_batch_elems=4096, shuffle=False)
        for batch in s:
            assert len(batch) * 1024 <= 4096

    def test_size_multiple(self):
        lengths = np.array([1000] * 13)
        s = bucketing.BucketBatchSampler(
            lengths, [1024], batch_size=6, shuffle=False, size_multiple=4,
            drop_last=False)
        sizes = [len(b) for b in s]
        assert sizes[:-1] == [4] * (len(sizes) - 1)


class TestLoaderEndToEnd:
    def test_batches_static_and_masked(self, wav_dir):
        files, lengths = wav_dir
        cm = {"A": 0, "B": 1, "C": 2}
        ds = ClipDataset(
            files, raw_labels=["A", "B", "A,C", "C", "B", "A"], classmap=cm)
        ladder = bucketing.make_bucket_ladder(
            int(ds.lengths.max()), min_length=8192)
        loader = make_loader(ds, ladder, batch_size=2, train=False)
        seen = 0
        for batch in loader:
            b, l = batch["signal"].shape
            assert l in ladder
            assert batch["labels"].shape == (b, 3)
            for row in range(b):
                n = batch["lengths"][row]
                assert n <= l
                # padding is exact zeros
                assert np.all(batch["signal"][row, n:] == 0)
            seen += b
        assert seen == len(files)

    def test_max_audio_length_crop(self, wav_dir):
        files, _ = wav_dir
        ds = ClipDataset(files, max_audio_length=0.5)  # 22050 samples
        assert ds.lengths.max() <= 22050
        audio = ds.decode(3, train=True)
        assert audio.size == 22050

    def test_threaded_loader_matches(self, wav_dir):
        files, _ = wav_dir
        cm = {"A": 0}
        ds = ClipDataset(files, raw_labels=["A"] * 6, classmap=cm)
        ladder = bucketing.make_bucket_ladder(
            int(ds.lengths.max()), min_length=8192)
        a = list(make_loader(ds, ladder, batch_size=2, num_workers=0))
        b = list(make_loader(ds, ladder, batch_size=2, num_workers=2))
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["signal"], y["signal"])

    def test_class_names_roundtrip(self):
        cm = {"Meow": 1, "Bark": 0}
        assert class_names_from_classmap(cm) == ["Bark", "Meow"]

    def test_train_loader_reshuffles_each_epoch(self, wav_dir):
        files, _ = wav_dir
        ds = ClipDataset(files, raw_labels=["A"] * 6, classmap={"A": 0})
        ladder = bucketing.make_bucket_ladder(
            int(ds.lengths.max()), min_length=8192)
        loader = make_loader(ds, ladder, batch_size=2, train=True,
                             drop_last=False)
        epoch1 = [tuple(b["index"]) for b in loader]
        epoch2 = [tuple(b["index"]) for b in loader]
        # same coverage, different order/composition (6 clips over several
        # buckets -> orders differ with overwhelming probability)
        flat1 = sorted(i for b in epoch1 for i in b)
        flat2 = sorted(i for b in epoch2 for i in b)
        assert flat1 == flat2 == list(range(6))
        assert epoch1 != epoch2 or len(epoch1) <= 1

    def test_eval_loader_is_deterministic(self, wav_dir):
        files, _ = wav_dir
        ds = ClipDataset(files, raw_labels=["A"] * 6, classmap={"A": 0})
        ladder = bucketing.make_bucket_ladder(
            int(ds.lengths.max()), min_length=8192)
        loader = make_loader(ds, ladder, batch_size=2, train=False)
        a = [tuple(b["index"]) for b in loader]
        b = [tuple(b["index"]) for b in loader]
        assert a == b


class TestMultiHostLoading:
    """Per-host disjoint data loading (SURVEY §2b): hosts share one global
    batch plan and decode disjoint row slices."""

    def _loaders(self, wav_dir, n_hosts, **kw):
        files, _ = wav_dir
        ladder = bucketing.make_bucket_ladder(80000, min_length=4096)
        return [
            make_loader(
                ClipDataset(files, sr=44100), ladder, batch_size=4,
                train=False, shuffle=False, drop_last=False,
                process_index=h, process_count=n_hosts, **kw)
            for h in range(n_hosts)
        ]

    def test_hosts_agree_on_plan_and_split_rows(self, wav_dir):
        files, lengths = wav_dir
        loaders = self._loaders(wav_dir, 2)
        per_host = [list(l) for l in loaders]
        assert len(per_host[0]) == len(per_host[1])
        seen = [set(), set()]
        for b0, b1 in zip(*per_host):
            # identical bucket shape (lock-step SPMD requirement)
            assert b0["signal"].shape[1] == b1["signal"].shape[1]
            # equal local rows = global/n_hosts
            assert b0["signal"].shape[0] == b1["signal"].shape[0]
            seen[0].update(b0["index"].tolist())
            seen[1].update(b1["index"].tolist())
        # disjoint except tail-padding repeats; union covers every clip
        union = seen[0] | seen[1]
        assert union == set(range(len(files)))

    def test_single_host_unchanged(self, wav_dir):
        files, _ = wav_dir
        ladder = bucketing.make_bucket_ladder(80000, min_length=4096)
        base = make_loader(
            ClipDataset(files, sr=44100), ladder, batch_size=4,
            train=False, shuffle=False, drop_last=False,
            process_index=0, process_count=1)
        multi = self._loaders(wav_dir, 2)
        got = np.sort(np.concatenate(
            [b["index"] for l in multi for b in l]))
        want = np.sort(np.concatenate([b["index"] for b in base]))
        # every clip the single-host loader serves is served by some host
        assert set(want.tolist()) <= set(got.tolist())

    def test_global_batch_assembles(self, wav_dir):
        """Simulated 2-host global batch equals the single-host batch rows
        (order within the global batch = host-major)."""
        files, _ = wav_dir
        ladder = bucketing.make_bucket_ladder(80000, min_length=4096)
        single = list(make_loader(
            ClipDataset(files, sr=44100), ladder, batch_size=4,
            train=False, shuffle=False, drop_last=False,
            process_index=0, process_count=1))
        halves = [list(l) for l in self._loaders(wav_dir, 2)]
        for s, h0, h1 in zip(single, *halves):
            glob = np.concatenate([h0["index"], h1["index"]])
            # the global plan's rows (possibly tail-padded) start with the
            # single-host batch's rows
            assert list(glob[: len(s["index"])]) == list(s["index"])
