"""Experiment tracking: the framework's replacement for the ``mag`` package.

The reference leans on mag (LX layer, SURVEY.md §1) for: a deterministic
experiment directory named from config values, persisted ``config.json`` /
``command`` / ``commit_hash`` / ``log`` / ``results.json`` (reference
README.md:134-146), ``register_directory("checkpoints"/"predictions"/
"summaries")``, dotted ``register_result("fold0.metric", v)`` keys,
``Experiment(resume_from=path)`` config reloading for inference
(predict_2d_cnn.py:72), and ``implicit_resuming`` re-entry
(train_2d_cnn.py:232). All reproduced here with no dependency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import Any, Mapping, Optional

from freesound_classification_tpu.utils.config import (
    Config,
    config_name,
    flatten,
    unflatten,
)


class _Tee:
    """Mirror a stream into the experiment log file."""

    def __init__(self, stream, logfile):
        self.stream = stream
        self.logfile = logfile

    def write(self, data):
        self.stream.write(data)
        self.logfile.write(data)
        return len(data)

    def flush(self):
        self.stream.flush()
        self.logfile.flush()


class Experiment:
    """Config-addressed experiment directory with result registry.

    Usage mirrors mag::

        with Experiment({...}, experiments_dir=...) as experiment:
            experiment.register_directory("checkpoints")
            experiment.register_result("fold0.metric", 0.83)

        Experiment(resume_from=path)  # inference-time config reload
    """

    def __init__(
        self,
        config: Optional[Mapping[str, Any]] = None,
        resume_from: Optional[str] = None,
        implicit_resuming: bool = False,
        experiments_dir: str = "experiments",
        separator: str = "-",
    ):
        if (config is None) == (resume_from is None):
            raise ValueError("pass exactly one of config / resume_from")

        if resume_from is not None:
            self.experiment_dir = os.path.abspath(resume_from)
            with open(os.path.join(self.experiment_dir, "config.json")) as f:
                self._config = json.load(f)
            self._results = self._load_results()
        else:
            self._config = json.loads(json.dumps(dict(config)))
            name = config_name(self._config, separator)
            self.experiment_dir = os.path.abspath(
                os.path.join(experiments_dir, name)
            )
            if os.path.exists(self.experiment_dir) and not implicit_resuming:
                raise FileExistsError(
                    f"experiment already exists: {self.experiment_dir} "
                    "(pass --resume to continue into it)"
                )
            os.makedirs(self.experiment_dir, exist_ok=True)
            self._results = self._load_results()
            self._persist_metadata()

        self._log_file = None
        self._saved_streams = None

    # -- metadata -------------------------------------------------------

    def _persist_metadata(self) -> None:
        with open(os.path.join(self.experiment_dir, "config.json"), "w") as f:
            json.dump(self._config, f, indent=2, sort_keys=True)
        with open(os.path.join(self.experiment_dir, "command"), "w") as f:
            f.write(" ".join(sys.argv) + "\n")
        commit = "unknown"
        try:
            commit = (
                subprocess.run(
                    ["git", "rev-parse", "HEAD"],
                    capture_output=True, text=True, timeout=10,
                ).stdout.strip()
                or "unknown"
            )
        except Exception:
            pass
        with open(os.path.join(self.experiment_dir, "commit_hash"), "w") as f:
            f.write(commit + "\n")

    @property
    def config(self) -> Config:
        return Config(self._config)

    @property
    def name(self) -> str:
        return os.path.basename(self.experiment_dir)

    # -- directories ----------------------------------------------------

    def register_directory(self, name: str) -> str:
        path = os.path.join(self.experiment_dir, name)
        os.makedirs(path, exist_ok=True)
        setattr(self, name, path)
        return path

    # -- results --------------------------------------------------------

    def _results_path(self) -> str:
        return os.path.join(self.experiment_dir, "results.json")

    def _load_results(self) -> dict:
        try:
            with open(self._results_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def register_result(self, key: str, value: Any) -> None:
        """Dotted key -> nested results.json (mag semantics)."""
        flat = flatten(self._results)
        flat[key] = float(value) if hasattr(value, "__float__") else value
        self._results = unflatten(flat)
        with open(self._results_path(), "w") as f:
            json.dump(self._results, f, indent=2, sort_keys=True)

    @property
    def results(self) -> Config:
        return Config(self._results)

    # -- log tee --------------------------------------------------------

    def __enter__(self) -> "Experiment":
        self._log_file = open(
            os.path.join(self.experiment_dir, "log"), "a", buffering=1
        )
        self._saved_streams = (sys.stdout, sys.stderr)
        sys.stdout = _Tee(sys.stdout, self._log_file)
        sys.stderr = _Tee(sys.stderr, self._log_file)
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if self._saved_streams is not None:
            sys.stdout, sys.stderr = self._saved_streams
            self._saved_streams = None
        if self._log_file is not None:
            self._log_file.close()
            self._log_file = None
