"""Pallas resample kernel vs the XLA oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.ops.augment import resample_rate
from freesound_classification_tpu.ops.pallas_kernels import (
    resample_linear_pallas,
)


class TestPallasResample:
    @pytest.mark.parametrize("factor", [0.85, 1.0, 1.31])
    def test_matches_xla_path(self, factor):
        rng = np.random.RandomState(0)
        b, l = 2, 8192
        wave = jnp.asarray(rng.randn(b, l).astype("f4") * 0.1)
        lengths = jnp.asarray([l, l // 2])
        f = jnp.full((b,), factor, jnp.float32)
        ref, ref_len = resample_rate(wave, lengths, f, use_pallas=False)
        out = resample_linear_pallas(wave, f)
        # compare where the source position is strictly inside the buffer
        idx = np.arange(l)[None, :] * factor
        valid = idx < (np.asarray(lengths)[:, None] - 2)
        diff = np.abs(np.where(valid, np.asarray(ref) - np.asarray(out), 0))
        assert diff.max() < 5e-3, diff.max()

    def test_wrapper_dispatch_small_uses_xla(self):
        wave = jnp.zeros((2, 4096))
        lengths = jnp.asarray([4096, 2048])
        out, new_len = resample_rate(wave, lengths, jnp.asarray([1.1, 0.9]))
        assert out.shape == wave.shape
        assert int(new_len[0]) == int(4096 / 1.1)

