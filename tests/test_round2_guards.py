"""Round-2 hardening: kernel domain guards + SSL eval padding exactness.

Covers the two failure modes of the windowed Pallas kernels (concrete
out-of-domain factors must raise in the raw wrappers and fall back to XLA in
the public ops) and the mesh-padding bias fix in the SSL eval loss
(round-1 VERDICT #6 / weak #4-#5).
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.ops import augment, pallas_kernels, pv


class TestResampleDomainGuard:
    def test_raw_kernel_raises_on_concrete_out_of_domain(self):
        wave = jnp.zeros((2, 32768), jnp.float32)
        with pytest.raises(ValueError, match="factor"):
            pallas_kernels.resample_linear_pallas(
                wave, jnp.asarray([1.0, 2.5], jnp.float32))

    def test_public_op_falls_back_to_xla(self):
        rng = np.random.RandomState(0)
        wave = jnp.asarray(rng.randn(2, 32768).astype("f4") * 0.1)
        lengths = jnp.asarray([32768, 20000], jnp.int32)
        factor = jnp.asarray([2.5, 3.0], jnp.float32)
        # default routing must not raise and must equal the forced-XLA path
        out_a, len_a = augment.resample_rate(wave, lengths, factor)
        out_b, len_b = augment.resample_rate(
            wave, lengths, factor, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(len_a), np.asarray(len_b))
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), atol=1e-6)
        assert np.isfinite(np.asarray(out_a)).all()

    def test_traced_factor_is_unknown(self):
        # inside jit the bound cannot be checked; the helper must say so
        seen = []

        @jax.jit
        def probe(f):
            seen.append(
                pallas_kernels.static_bound_exceeded(f, 1.8))
            return f

        probe(jnp.asarray([2.5], jnp.float32))
        assert seen == [None]


class TestPVDomainGuard:
    def _tone(self, l=16384):
        t = np.arange(l) / 44100.0
        return jnp.asarray(
            np.sin(2 * np.pi * 440.0 * t).astype("f4"))[None, :]

    def test_out_of_domain_rate_routes_to_xla(self, monkeypatch):
        # pretend we're on TPU so the kernel path is eligible, and make the
        # kernel explode if touched: an out-of-domain rate must avoid it
        def boom(*a, **k):
            raise AssertionError("kernel path used for out-of-domain rate")

        monkeypatch.setattr(pallas_kernels, "_on_tpu", lambda: True)
        monkeypatch.setattr(pallas_kernels, "pv_resynth_pallas", boom)
        wave = self._tone()
        lengths = jnp.asarray([16384], jnp.int32)
        out, new_len = pv.phase_vocoder_stretch(
            wave, lengths, jnp.asarray([1.5], jnp.float32),
            n_fft=256, hop=64)
        assert np.isfinite(np.asarray(out)).all()

    def test_in_domain_rate_uses_kernel_when_on_tpu(self, monkeypatch):
        def boom(*a, **k):
            raise AssertionError("kernel reached")

        monkeypatch.setattr(pallas_kernels, "_on_tpu", lambda: True)
        monkeypatch.setattr(pallas_kernels, "pv_resynth_pallas", boom)
        wave = self._tone(65536)
        lengths = jnp.asarray([65536], jnp.int32)
        with pytest.raises(AssertionError, match="kernel reached"):
            pv.phase_vocoder_stretch(
                wave, lengths, jnp.asarray([1.1], jnp.float32),
                n_fft=1024, hop=256)

    def test_lane_unaligned_hop_routes_to_xla(self, monkeypatch):
        # the in-kernel OLA writes (rows, hop) blocks, so hop must be a
        # full 128-lane multiple; anything else must take the XLA path
        def boom(*a, **k):
            raise AssertionError("kernel path used for unaligned hop")

        monkeypatch.setattr(pallas_kernels, "_on_tpu", lambda: True)
        monkeypatch.setattr(pallas_kernels, "pv_resynth_pallas", boom)
        wave = self._tone()
        lengths = jnp.asarray([16384], jnp.int32)
        out, _ = pv.phase_vocoder_stretch(
            wave, lengths, jnp.asarray([1.1], jnp.float32),
            n_fft=256, hop=64)
        assert np.isfinite(np.asarray(out)).all()


class TestSSLEvalPaddingExact:
    def test_padded_rows_carry_no_weight(self):
        """evaluate() on an 8-device mesh (batch 5 -> padded to 8) must give
        the same SSL score as a 1-device mesh with no padding."""
        from freesound_classification_tpu.models.apc import APCModel
        from freesound_classification_tpu.models.frontend import Frontend
        from freesound_classification_tpu.parallel import mesh as mesh_lib
        from freesound_classification_tpu.training.engine import Engine

        rng = np.random.RandomState(0)
        batch = {
            "signal": rng.randn(5, 4096).astype("f4") * 0.1,
            "lengths": np.asarray([4096, 4000, 3500, 3000, 2500], "i4"),
            "labels": np.eye(5, 4, dtype="f4"),
            "is_noisy": np.zeros(5, "f4"),
        }
        cfg = types.SimpleNamespace(
            optimizer="adam", learning_rate=1e-3,
            scheduler="1cycle_0.0001_0.001", weight_decay=0.0,
            accumulation_steps=1, epochs=1,
            switch_off_augmentations_on=100, _save_every=1000)

        def score_on(n_devices):
            model = APCModel(rnn_size=8, rnn_layers=1, prediction_steps=2)
            frontend = Frontend("stft_256_128", "1d", sr=8000)
            engine = Engine(model, frontend, cfg, self_supervised=True,
                            mesh=mesh_lib.make_mesh(n_devices))
            engine.make_optimizer(max_steps=1, steps_per_epoch=1)
            engine.init_state(batch)
            return engine.evaluate([batch])

        s1, s8 = score_on(1), score_on(8)
        np.testing.assert_allclose(s1, s8, rtol=2e-5)
