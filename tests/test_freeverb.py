"""Freeverb golden tests: the frequency-sampled transfer function must match
a direct numpy simulation of sox's per-sample recurrences (reverb.c:
comb_process / allpass_process / filter_array_process), which serves as the
executable spec of the reference's reverb (reference ops/transforms.py:96-101
shells out to sox)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from freesound_classification_tpu.ops import freeverb  # noqa: E402


def sox_reverb_sim(x, reverberance, room_scale, sr=44100,
                   hf_damping=50.0, pre_delay_ms=20.0, wet_gain_db=0.0,
                   n_out=None):
    """Direct time-domain simulation of sox reverb.c (mono, wet path)."""
    n_out = n_out or x.size
    scale = room_scale / 100.0 * 0.9 + 0.1
    r = sr / 44100.0
    a = -1.0 / np.log(1.0 - 0.3)
    b = 100.0 / (np.log(1.0 - 0.98) * a + 1.0)
    feedback = 1.0 - np.exp((reverberance - b) / (a * b))
    damp = hf_damping / 100.0 * 0.3 + 0.2
    gain = 10.0 ** (wet_gain_db / 20.0) * 0.015
    delay = int(pre_delay_ms / 1000.0 * sr + 0.5)

    comb_n = [int(scale * r * c + 0.5) for c in freeverb.COMB_LENGTHS]
    ap_n = [int(r * m + 0.5) for m in freeverb.ALLPASS_LENGTHS]

    combs = [np.zeros(n) for n in comb_n]
    stores = [0.0] * len(comb_n)
    aps = [np.zeros(n) for n in ap_n]
    cptr = [0] * len(comb_n)
    aptr = [0] * len(ap_n)

    xin = np.concatenate([np.zeros(delay), x])  # pre-delay line
    wet = np.zeros(n_out, dtype=np.float64)
    for t in range(n_out):
        e = xin[t] if t < xin.size else 0.0
        out = 0.0
        for i in range(len(comb_n)):
            output = combs[i][cptr[i]]
            stores[i] = output + (stores[i] - output) * damp
            combs[i][cptr[i]] = e + stores[i] * feedback
            cptr[i] = (cptr[i] + 1) % comb_n[i]
            out += output
        for j in range(len(ap_n)):
            output = aps[j][aptr[j]]
            aps[j][aptr[j]] = out + output * 0.5
            aptr[j] = (aptr[j] + 1) % ap_n[j]
            out = output - out
        wet[t] = out * gain
    return wet


class TestGoldenIR:
    @pytest.mark.parametrize("rev,room", [(0.0, 0.0), (25.0, 40.0),
                                          (49.0, 10.0), (49.0, 49.0)])
    def test_ir_matches_time_domain_sim(self, rev, room):
        sr = 44100
        n = 6000
        impulse = np.zeros(n)
        impulse[0] = 1.0
        golden = sox_reverb_sim(impulse, rev, room, sr=sr, n_out=n)
        ir = np.asarray(freeverb.freeverb_ir(
            jnp.asarray([rev], jnp.float32), jnp.asarray([room], jnp.float32),
            sr, n))[0]
        # f32 frequency sampling vs f64 recursion: tight in absolute terms
        assert np.max(np.abs(ir - golden)) < 2e-4
        # and strongly correlated in shape
        denom = np.linalg.norm(golden) * np.linalg.norm(ir)
        assert np.dot(golden, ir) / denom > 0.999

    def test_feedback_endpoints(self):
        np.testing.assert_allclose(
            float(freeverb.feedback_of(jnp.float32(0.0))), 0.3, atol=1e-6)
        np.testing.assert_allclose(
            float(freeverb.feedback_of(jnp.float32(100.0))), 0.98, atol=1e-6)

    def test_comb_allpass_sizes(self):
        # room_scale=0 -> scale=0.1; 44100 Hz -> r=1
        sizes = np.asarray(freeverb.comb_sizes(jnp.asarray([0.0]), 44100))[0]
        np.testing.assert_array_equal(
            sizes, np.floor(0.1 * freeverb.COMB_LENGTHS + 0.5))
        np.testing.assert_array_equal(
            freeverb.allpass_sizes(44100), freeverb.ALLPASS_LENGTHS)
        np.testing.assert_array_equal(
            freeverb.allpass_sizes(22050),
            np.floor(0.5 * freeverb.ALLPASS_LENGTHS + 0.5))


class TestReverbBatch:
    def test_dry_plus_wet_and_tail(self):
        sr = 44100
        l = 16384
        rng = np.random.RandomState(0)
        wave = np.zeros((2, l), np.float32)
        wave[:, :4096] = rng.randn(2, 4096) * 0.1
        lengths = jnp.asarray([4096, 4096], jnp.int32)
        out, new_len = freeverb.reverb_batch(
            jnp.asarray(wave), lengths,
            jnp.asarray([40.0, 40.0], jnp.float32),
            jnp.asarray([40.0, 5.0], jnp.float32), sr)
        out = np.asarray(out)
        assert np.isfinite(out).all()
        # dry term present: out - wet == wave => out != pure wet
        assert np.abs(out[:, :4096] - wave[:, :4096]).max() < 0.5
        # a reverb tail exists beyond the dry signal
        tail_energy = np.abs(out[:, 4500:8000]).max(axis=1)
        assert (tail_energy > 1e-5).all()
        # and decays: late tail quieter than early tail
        late = np.abs(out[:, 12000:16000]).max(axis=1)
        assert (late < tail_energy).all()
        # new lengths extend past the dry length, clipped to the buffer
        nl = np.asarray(new_len)
        assert (nl > 4096).all() and (nl <= l).all()

    def test_dry_fold_equals_wave_plus_wet(self):
        """reverb_batch folds the dry path into the transfer function
        (out = irfft(X*(1+H))); it must equal wave + wet_only output to
        f32 FFT-roundtrip tolerance, on BOTH fft paths (freeverb.py:327)."""
        sr = 44100
        l = 16384
        rng = np.random.RandomState(3)
        wave = jnp.asarray((rng.randn(2, l) * 0.1).astype(np.float32))
        lengths = jnp.asarray([l, 9000], jnp.int32)
        rev = jnp.asarray([35.0, 12.0], jnp.float32)
        room = jnp.asarray([20.0, 45.0], jnp.float32)
        for mxu in (False, True):
            out, _ = freeverb.reverb_batch(
                wave, lengths, rev, room, sr, use_mxu_fft=mxu)
            wet, _ = freeverb.reverb_batch(
                wave, lengths, rev, room, sr, wet_only=True,
                use_mxu_fft=mxu)
            err = np.max(np.abs(np.asarray(out) -
                                (np.asarray(wave) + np.asarray(wet))))
            assert err < 1e-5, (mxu, err)

    def test_echo_density_grows(self):
        """Freeverb property: echo density increases with time (the comb
        lattice + allpass diffusion), unlike a bare comb."""
        sr = 44100
        n = 20000
        ir = np.asarray(freeverb.freeverb_ir(
            jnp.asarray([45.0], jnp.float32),
            jnp.asarray([45.0], jnp.float32), sr, n))[0]
        thresh = np.abs(ir).max() * 1e-3

        def density(seg):
            return (np.abs(seg) > thresh).mean()

        early = density(ir[1000:3000])
        late = density(ir[8000:10000])
        assert late > early

    def test_reverberance_raises_decay_time(self):
        sr = 44100
        n = 30000
        irs = np.asarray(freeverb.freeverb_ir(
            jnp.asarray([5.0, 49.0], jnp.float32),
            jnp.asarray([30.0, 30.0], jnp.float32), sr, n))
        e_late = (irs[:, 20000:] ** 2).sum(axis=1)
        e_early = (irs[:, :5000] ** 2).sum(axis=1)
        ratio = e_late / e_early
        assert ratio[1] > ratio[0] * 10


class TestMxuFftPath:
    def test_mxu_fft_path_matches_xla_fft_path(self):
        """reverb_batch(use_mxu_fft=True) — the TPU default — must equal the
        jnp.fft path (the two differ only in how the conv transforms are
        computed; ops/mxu_fft.py)."""
        sr = 44100
        l = 16384
        rng = np.random.RandomState(7)
        wave = (rng.randn(3, l) * 0.1).astype(np.float32)
        lengths = jnp.asarray([l, 12000, 5000], jnp.int32)
        rev = jnp.asarray([40.0, 10.0, 49.0], jnp.float32)
        room = jnp.asarray([40.0, 49.0, 5.0], jnp.float32)
        out_x, len_x = freeverb.reverb_batch(
            jnp.asarray(wave), lengths, rev, room, sr, use_mxu_fft=False)
        out_m, len_m = freeverb.reverb_batch(
            jnp.asarray(wave), lengths, rev, room, sr, use_mxu_fft=True)
        np.testing.assert_array_equal(np.asarray(len_x), np.asarray(len_m))
        err = np.max(np.abs(np.asarray(out_x) - np.asarray(out_m)))
        assert err < 1e-4, err

    def test_split_wet_response_matches_complex(self):
        """wet_response_split (outer-product phases, split re/im) == the
        complex evaluator. Tolerance covers the ~1 ulp the phase outer
        product adds, amplified at comb resonances (~50x at fb 0.89)."""
        sr = 44100
        for fft_len in (1 << 10, 1 << 15):
            rev = jnp.asarray([0.0, 30.0, 49.0], jnp.float32)
            room = jnp.asarray([20.0, 45.0, 5.0], jnp.float32)
            main, nyq = freeverb.wet_response(rev, room, fft_len, sr,
                                              aligned=True)
            hmr, hmi, hnr = freeverb.wet_response_split(
                rev, room, fft_len, sr)
            scale = np.max(np.abs(np.asarray(main)))
            np.testing.assert_allclose(
                np.asarray(hmr), np.asarray(main).real,
                atol=2e-5 * scale, rtol=0)
            np.testing.assert_allclose(
                np.asarray(hmi), np.asarray(main).imag,
                atol=2e-5 * scale, rtol=0)
            np.testing.assert_allclose(
                np.asarray(hnr), np.asarray(nyq).real,
                atol=2e-5 * scale, rtol=0)

    def test_aligned_wet_response_matches_full(self):
        sr = 44100
        fft_len = 1 << 14
        rev = jnp.asarray([30.0, 49.0], jnp.float32)
        room = jnp.asarray([20.0, 45.0], jnp.float32)
        full = np.asarray(freeverb.wet_response(rev, room, fft_len, sr))
        main, nyq = freeverb.wet_response(rev, room, fft_len, sr,
                                          aligned=True)
        np.testing.assert_allclose(np.asarray(main), full[:, :-1],
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(nyq), full[:, -1:],
                                   rtol=1e-6, atol=1e-8)


class TestScrambledWetResponse:
    def test_matches_natural_order_permuted(self):
        """wet_response_split_scrambled == wet_response_split reordered by
        mxu_fft.scrambled_half_bins (same closed form, different grid
        visit order + per-digit outer-product phases)."""
        from freesound_classification_tpu.ops import mxu_fft
        sr = 44100
        n = 1 << 15
        rev = jnp.asarray([5.0, 40.0, 49.0], jnp.float32)
        room = jnp.asarray([45.0, 20.0, 5.0], jnp.float32)
        hr, hi, hn = freeverb.wet_response_split(rev, room, n, sr)
        sr_, si_, sn_ = freeverb.wet_response_split_scrambled(
            rev, room, n, sr)
        order = mxu_fft.scrambled_half_bins(n)
        np.testing.assert_allclose(np.asarray(sn_), np.asarray(hn),
                                   rtol=0, atol=1e-5)
        scale = np.abs(np.asarray(hr)).max()
        err_r = np.abs(np.asarray(sr_) - np.asarray(hr)[:, order]).max()
        err_i = np.abs(np.asarray(si_) - np.asarray(hi)[:, order]).max()
        assert err_r / scale < 1e-5 and err_i / scale < 1e-5
