"""Sox-calibrated overdrive: golden test against the sox recurrence.

The executable spec below is a direct numpy port of sox 14.4.2
src/overdrive.c (the effect the reference invokes through pysndfx,
/root/reference/ops/transforms.py:103): dB gain + colour/200 DC offset into
a cubic soft clip, a 0.995-pole DC-blocking filter, and the dry/2 +
0.75*wet mix, clipped to full scale. Same executable-spec pattern as
tests/test_freeverb.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.ops.augment import overdrive
from freesound_classification_tpu.ops.dsp import iir_first_order


def sox_overdrive_np(x: np.ndarray, gain_db: float,
                     colour: float = 20.0) -> np.ndarray:
    """Literal sample loop of sox overdrive.c flow() (float64)."""
    gain = 10.0 ** (gain_db / 20.0)
    col = colour / 200.0
    last_in = last_out = 0.0
    out = np.empty_like(x, dtype=np.float64)
    for i, s in enumerate(x.astype(np.float64)):
        d = s * gain + col
        if d < -1.0:
            d = -2.0 / 3.0
        elif d > 1.0:
            d = 2.0 / 3.0
        else:
            d = d - d * d * d / 3.0
        last_out = d - last_in + 0.995 * last_out
        last_in = d
        out[i] = s * 0.5 + last_out * 0.75
    return np.clip(out, -1.0, 1.0)


class TestIIRFirstOrder:
    @pytest.mark.parametrize("l", [64, 300, 1500])
    def test_matches_recurrence(self, l):
        rng = np.random.RandomState(0)
        u = rng.randn(3, l).astype("f4")
        y = np.asarray(iir_first_order(jnp.asarray(u), 0.995, chunk=128))
        ref = np.empty((3, l), np.float64)
        for b in range(3):
            acc = 0.0
            for n in range(l):
                acc = u[b, n] + 0.995 * acc
                ref[b, n] = acc
        np.testing.assert_allclose(y, ref, atol=5e-4)

    def test_decaying_pole(self):
        u = np.zeros((1, 400), np.float32)
        u[0, 0] = 1.0
        y = np.asarray(iir_first_order(jnp.asarray(u), 0.9, chunk=64))
        np.testing.assert_allclose(
            y[0], 0.9 ** np.arange(400), rtol=1e-4, atol=1e-7)


class TestOverdriveGolden:
    @pytest.mark.parametrize("gain_db", [2.0, 5.0, 10.0])
    def test_matches_sox_recurrence(self, gain_db):
        rng = np.random.RandomState(int(gain_db))
        t = np.arange(4096) / 44100.0
        x = (0.5 * np.sin(2 * np.pi * 440.0 * t)
             + 0.1 * rng.randn(4096)).astype("f4")
        ref = sox_overdrive_np(x, gain_db)
        out = np.asarray(overdrive(
            jnp.asarray(x)[None, :],
            jnp.asarray([gain_db], jnp.float32)))[0]
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_padding_does_not_leak_backwards(self):
        """The device op runs on the padded buffer; the valid region must
        match an unpadded run exactly (the DC filter is causal)."""
        rng = np.random.RandomState(7)
        x = (0.3 * rng.randn(1000)).astype("f4")
        g = jnp.asarray([6.0], jnp.float32)
        full = np.asarray(overdrive(jnp.asarray(x)[None, :], g))[0]
        padded = np.zeros(4096, np.float32)
        padded[:1000] = x
        pad_run = np.asarray(overdrive(jnp.asarray(padded)[None, :], g))[0]
        np.testing.assert_allclose(pad_run[:1000], full, atol=1e-6)

    def test_batched_per_sample_gains(self):
        rng = np.random.RandomState(3)
        x = (0.4 * rng.randn(2, 2048)).astype("f4")
        gains = jnp.asarray([2.0, 9.0], jnp.float32)
        out = np.asarray(overdrive(jnp.asarray(x), gains))
        for b, g in enumerate([2.0, 9.0]):
            ref = sox_overdrive_np(x[b], g)
            np.testing.assert_allclose(out[b], ref, atol=2e-4)
