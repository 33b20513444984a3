"""Elastic resume: an interrupted fold continues with exact state."""

import numpy as np
import pytest

from tests.test_engine import ListLoader, _make_engine, _synthetic_batches


class TestResume:
    def test_resume_continues_from_last_checkpoint(self, tmp_path):
        batches = _synthetic_batches(2, 8, seed=0)

        # run 4 epochs straight through
        full = _make_engine(tmp_path / "full", _save_every=1)
        (tmp_path / "full").mkdir(exist_ok=True)
        scores_full = full.fit_validate(
            ListLoader(batches), ListLoader(batches), epochs=4, fold=0)

        # same 4-epoch run, but the loader "crashes" in epoch 2
        class CrashingLoader(ListLoader):
            def __init__(self, items, crash_on_pass):
                super().__init__(items)
                self.passes = 0
                self.crash_on_pass = crash_on_pass

            def __iter__(self):
                self.passes += 1
                if self.passes == self.crash_on_pass:
                    raise KeyboardInterrupt("simulated preemption")
                return super().__iter__()

        part_dir = tmp_path / "part"
        part_dir.mkdir(exist_ok=True)
        part = _make_engine(part_dir, _save_every=1)
        with pytest.raises(KeyboardInterrupt):
            part.fit_validate(
                CrashingLoader(batches, crash_on_pass=3),
                ListLoader(batches), epochs=4, fold=0)

        resumed = _make_engine(part_dir, _save_every=1)
        scores_b = resumed.fit_validate(
            ListLoader(batches), ListLoader(batches), epochs=4, fold=0,
            resume=True)

        # the resumed trajectory matches the uninterrupted one exactly:
        # full train state (params/opt/step/PRNG) round-tripped
        assert len(scores_b) == 4
        np.testing.assert_allclose(scores_b, scores_full, rtol=1e-5)

    def test_resume_without_checkpoint_starts_fresh(self, tmp_path):
        train = ListLoader(_synthetic_batches(2, 8, seed=1))
        eng = _make_engine(tmp_path)
        scores = eng.fit_validate(train, train, epochs=1, fold=0, resume=True)
        assert len(scores) == 1
