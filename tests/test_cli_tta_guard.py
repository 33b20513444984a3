"""The degenerate-TTA guard: ``--n_tta > 1`` with every stochastic knob off
must be rejected up front (the eval step is deterministic, so such a run
would average n identical passes — the reference's ``--n_tta`` habit,
evaluate_2d_cnn.py:100, silently multiplied work there)."""

import pytest


def _predict_argv(n_tta, extra=()):
    return [
        "--experiment", "/nonexistent/exp",
        "--test_df", "/nonexistent/test.csv",
        "--test_data_dir", "/nonexistent/test",
        "--classmap", "/nonexistent/classmap.json",
        "--output_df", "/nonexistent/out.csv",
        "--n_tta", str(n_tta), *extra,
    ]


def _evaluate_argv(n_tta, extra=()):
    return [
        "--experiment", "/nonexistent/exp",
        "--train_df", "/nonexistent/train.csv",
        "--train_data_dir", "/nonexistent/train",
        "--classmap", "/nonexistent/classmap.json",
        "--n_tta", str(n_tta), *extra,
    ]


class TestDegenerateTTARejected:
    def test_predict_cli_rejects(self, capsys):
        from freesound_classification_tpu.cli import predict_2d_cnn

        with pytest.raises(SystemExit) as exc:
            predict_2d_cnn.main(_predict_argv(4))
        assert exc.value.code == 2
        assert "stochastic TTA mode" in capsys.readouterr().err

    def test_evaluate_cli_rejects(self, capsys):
        from freesound_classification_tpu.cli import evaluate_2d_cnn

        with pytest.raises(SystemExit) as exc:
            evaluate_2d_cnn.main(_evaluate_argv(4))
        assert exc.value.code == 2
        assert "stochastic TTA mode" in capsys.readouterr().err

    def test_stochastic_knob_unlocks_guard(self):
        # With a stochastic knob on, the guard passes and the CLI proceeds
        # to load the (nonexistent) experiment — any non-argparse error
        # proves the guard stepped aside.
        from freesound_classification_tpu.cli import predict_2d_cnn

        with pytest.raises(Exception) as exc:
            predict_2d_cnn.main(
                _predict_argv(4, ["--tta_noise_snr_db", "30", "--device",
                                  "cpu"]))
        assert not (isinstance(exc.value, SystemExit)
                    and exc.value.code == 2)

    def test_single_pass_unaffected(self):
        from freesound_classification_tpu.cli import predict_2d_cnn

        with pytest.raises(Exception) as exc:
            predict_2d_cnn.main(_predict_argv(1, ["--device", "cpu"]))
        assert not (isinstance(exc.value, SystemExit)
                    and exc.value.code == 2)
