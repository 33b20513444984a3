"""Subprocess worker for the SIGKILL crash-consistency test.

Trains the tiny test engine for N epochs with per-epoch resume bundles;
the parent (tests/test_resume.py::TestKillResume) SIGKILLs this process at
arbitrary points — including mid-checkpoint-write, widened by the
FSCT_TEST_SLOW_SWAP fault-injection knob — then relaunches with --resume
and asserts exact continuation.

Usage: python tests/_kill_resume_worker.py CKPT_DIR EPOCHS [--resume]
Prints "EPOCH_DONE k" after each epoch and "SCORES <json>" on completion.
"""

from __future__ import annotations

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def main() -> int:
    ckpt_dir, epochs = sys.argv[1], int(sys.argv[2])
    resume = "--resume" in sys.argv[3:]

    from freesound_classification_tpu.training import checkpoints as ckpt_lib

    slow = float(os.environ.get("FSCT_TEST_SLOW_SWAP", "0"))
    if slow > 0:
        # fault injection: dwell inside _swap_into_place's dangerous
        # window (target renamed aside, replacement not yet in place) so
        # the parent's SIGKILL can land there deterministically often
        import time

        real_rename = os.rename

        def slow_rename(src, dst):
            real_rename(src, dst)
            if dst.endswith(".old"):
                time.sleep(slow)

        os.rename = slow_rename  # noqa: the worker process owns this

    # line-buffered progress so the parent can time its kills
    import functools
    import json

    import numpy as np  # noqa: F401

    from tests.test_engine import (  # noqa: E402
        ListLoader,
        _make_engine,
        _synthetic_batches,
    )

    print_flush = functools.partial(print, flush=True)
    batches = _synthetic_batches(2, 8, seed=0)
    engine = _make_engine(ckpt_dir, _save_every=1)

    # announce each completed epoch right after its checkpoints are
    # ENQUEUED (the engine's validation hook runs before checkpointing,
    # so wrap save_checkpoint's sibling: the validation method itself)
    real_validation = engine.validation

    def announcing_validation(loader, epoch):
        score = real_validation(loader, epoch)
        print_flush(f"EPOCH_DONE {epoch}")
        return score

    engine.validation = announcing_validation
    scores = engine.fit_validate(
        ListLoader(batches), ListLoader(batches), epochs=epochs, fold=0,
        resume=resume)
    ckpt_lib.wait_for_saves()
    print_flush("SCORES " + json.dumps([float(s) for s in scores]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
