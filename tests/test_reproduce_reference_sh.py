"""Execute the parity kit itself (scripts/reproduce_reference.sh) on a
synthetic FSDKaggle2019-layout dataset (round-2 VERDICT stretch #10: the
kit was only shellcheck-level verified before meeting real data).

DEVICE=cpu, EPOCHS=2, BATCH_SIZE=8 — everything else (flags, model scale,
5 folds, featurization, schedulers, compare_to_baseline reporting) runs
exactly as the kit pins it. SKIP_NOISY=1 keeps the runtime bounded; the
noisy-round CLIs have their own coverage (tests/test_cli_workflows.py).
"""

import json
import os
import subprocess

import numpy as np
import pandas as pd
import pytest

from freesound_classification_tpu.data import audio_io

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 44100
CLASSES = ["Bark", "Meow", "Siren"]
FREQS = {"Bark": 250.0, "Meow": 1200.0, "Siren": 4000.0}


@pytest.fixture(scope="module")
def fsd_layout(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_fsd")
    rng = np.random.RandomState(0)
    for sub in ("train_curated", "train_noisy", "test"):
        (root / sub).mkdir()

    def tone(label, n):
        t = np.arange(n) / SR
        return (0.3 * np.sin(2 * np.pi * FREQS[label] * t)
                + 0.01 * rng.randn(n)).astype(np.float32)

    rows = []
    for i in range(50):
        label = CLASSES[i % 3]
        n = rng.randint(int(0.6 * SR), int(1.2 * SR))
        audio_io.write_wav(str(root / "train_curated" / f"c{i}.wav"),
                           tone(label, n), SR)
        rows.append({"fname": f"c{i}.wav", "labels": label})
    pd.DataFrame(rows).to_csv(root / "train_curated.csv", index=False)

    rows = []
    for i in range(9):
        label = CLASSES[i % 3]
        audio_io.write_wav(str(root / "train_noisy" / f"n{i}.wav"),
                           tone(label, int(0.8 * SR)), SR)
        rows.append({"fname": f"n{i}.wav", "labels": label})
    pd.DataFrame(rows).to_csv(root / "train_noisy.csv", index=False)

    rows = []
    for i in range(6):
        audio_io.write_wav(str(root / "test" / f"s{i}.wav"),
                           tone(CLASSES[i % 3], int(0.7 * SR)), SR)
        rows.append({"fname": f"s{i}.wav", "labels": ""})
    pd.DataFrame(rows).to_csv(root / "sample_submission.csv", index=False)
    return root


def test_parity_kit_runs_end_to_end(fsd_layout, tmp_path):
    """Real-data readiness drill (VERDICT r4 stretch #9): the FULL
    curated -> noisy-scoring -> pseudolabel round -> linear-blend chain in
    smoke mode (EPOCHS=2), so the day FSDKaggle2019 appears nothing has
    bit-rotted. Asserts every stage's artifacts including the blend
    submission schema."""
    env = dict(os.environ)
    env.update({
        "DATA_DIR": str(fsd_layout),
        "WORK": str(tmp_path / "parity_run"),
        "DEVICE": "cpu",
        "EPOCHS": "2",
        "NOISY_EPOCHS": "2",
        "BATCH_SIZE": "8",
        "JAX_PLATFORMS": "cpu",
    })
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    proc = subprocess.run(
        ["bash", os.path.join(REPO_ROOT, "scripts",
                              "reproduce_reference.sh")],
        env=env, capture_output=True, text=True, timeout=5400,
    )
    assert proc.returncode == 0, (
        f"reproduce_reference.sh rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}")

    # stage artifacts: classmap, BOTH experiments, OOF comparisons
    work = tmp_path / "parity_run"
    cm = json.load(open(work / "classmap.json"))
    assert sorted(cm) == sorted(CLASSES)
    exps = sorted(os.listdir(work / "experiments"))
    assert len(exps) == 2, exps  # curated + noisy-round
    for name in exps:
        results = json.load(open(work / "experiments" / name
                                 / "results.json"))
        assert all(
            np.isfinite(results[f"fold{k}"]["metric"]) for k in range(5))
    assert proc.stdout.count("global OOF lwlrap") == 2

    # noisy scoring + pseudolabel artifacts
    noisy_probs = pd.read_csv(work / "predictions"
                              / "noisy_probabilities.csv")
    assert list(noisy_probs.columns) == ["fname"] + sorted(CLASSES)
    relabeled = pd.read_csv(work / "predictions"
                            / "train_noisy_relabeled_1k.csv")
    assert {"fname", "labels"} <= set(relabeled.columns)
    assert len(relabeled) > 0

    # blend submission schema (cli/linear_blend.py output contract):
    # fname + sorted class columns, finite values, test-set rows
    blend = pd.read_csv(work / "predictions" / "blend_submission.csv")
    assert list(blend.columns) == ["fname"] + sorted(CLASSES)
    assert len(blend) == 6  # the synthetic test set
    vals = blend[sorted(CLASSES)].values
    assert np.isfinite(vals).all()
    assert "Final lwlrap" in proc.stdout
