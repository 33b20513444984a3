"""On-device augmentation tests: semantics, masking, PRNG determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.ops import augment

KEY = jax.random.PRNGKey(0)


def _batch(b=4, l=2000, seed=0):
    rng = np.random.RandomState(seed)
    wave = rng.randn(b, l).astype("f4") * 0.1
    lengths = np.array([l, l // 2, l // 3, l])[:b].astype("i4")
    for i in range(b):
        wave[i, lengths[i]:] = 0.0
    labels = np.eye(b, 6, dtype="f4")
    return jnp.asarray(wave), jnp.asarray(lengths), jnp.asarray(labels)


class TestMixup:
    def test_p_zero_identity(self):
        w, l, y = _batch()
        w2, l2, y2 = augment.mixup_or(w, l, y, KEY, 0.0)
        np.testing.assert_array_equal(w, w2)
        np.testing.assert_array_equal(y, y2)

    def test_labels_are_ored(self):
        w, l, y = _batch()
        _, _, y2 = augment.mixup_or(w, l, y, KEY, 1.0)
        assert ((y2 == 0) | (y2 == 1)).all()
        # every row's label count >= original (OR with partner)
        assert (y2.sum(1) >= y.sum(1) - 1e-6).all()

    def test_mix_coefficient_range(self):
        # equal lengths -> exact mean (reference audio.py:40-41)
        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.randn(2, 100).astype("f4"))
        l = jnp.asarray([100, 100])
        y = jnp.asarray(np.eye(2, 4, dtype="f4"))
        w2, l2, _ = augment.mixup_or(w, l, y, KEY, 1.0)
        # partner is a permutation: either identity (no change) or swap (mean)
        mean = np.asarray((w[0] + w[1]) / 2)
        same = np.allclose(w2[0], w[0])
        is_mean = np.allclose(w2[0], mean, atol=1e-6)
        assert same or is_mean

    def test_deterministic_under_key(self):
        w, l, y = _batch()
        a = augment.mixup_or(w, l, y, KEY, 0.7)
        b = augment.mixup_or(w, l, y, KEY, 0.7)
        for x, z in zip(a, b):
            np.testing.assert_array_equal(x, z)

    def test_replace_quirk_vs_add(self):
        w, l, y = _batch(b=2, l=500, seed=3)
        ra = augment.mixup_or(w, l, y, KEY, 1.0, quirk_replace=True)
        rb = augment.mixup_or(w, l, y, KEY, 1.0, quirk_replace=False)
        # same randomness, different mixing rule -> generally different audio
        if not np.allclose(ra[0], w):  # only when mixup applied
            assert not np.allclose(ra[0], rb[0])

    def test_explicit_partner_is_used(self):
        """With a clean partner supplied, mixed content comes from the
        partner arrays, not the (possibly augmented) batch rows."""
        rng = np.random.RandomState(5)
        b, n = 8, 64
        w = jnp.asarray(rng.randn(b, n).astype("f4"))
        pw = jnp.asarray(rng.randn(b, n).astype("f4"))
        l = jnp.full((b,), n, jnp.int32)
        y = jnp.asarray(np.eye(b, 16, dtype="f4"))
        py = jnp.asarray(np.roll(np.eye(b, 16, dtype="f4"), 8, axis=1))
        out, _, oy = augment.mixup_or(
            w, l, y, KEY, 1.0, partner=(pw, l, py))
        # equal lengths -> mixed = (self + partner)/2; recover the partner
        rec = np.asarray(2.0 * out - w)
        pw_np = np.asarray(pw)
        for row in rec:
            dists = np.abs(pw_np - row[None]).max(axis=1)
            assert dists.min() < 1e-5, "partner content not from clean copy"
        # labels OR'd with the partner's labels (disjoint -> 2 per row)
        assert (np.asarray(oy).sum(axis=1) == 2).all()

    def test_clean_partner_excludes_shuffle(self):
        """make_augmenter with mixup_clean_partner: shuffle must not leak
        into mixup partners (reference draws un-augmented samples)."""
        rng = np.random.RandomState(6)
        b = 8
        sr = 100
        n = 400  # 4 chunks of 0.5 s at sr=100
        w = jnp.asarray(rng.randn(b, n).astype("f4"))
        l = jnp.full((b,), n, jnp.int32)
        y = jnp.asarray(np.eye(b, 16, dtype="f4"))
        cfg = augment.AugmentConfig(
            p_mixup=1.0, p_shuffle=1.0, sr=sr, mixup_clean_partner=True)
        out, _, _ = augment.make_augmenter(cfg)(w, l, y, KEY, 1.0)
        # equal lengths: out = (shuffled_self + partner)/2. The partner
        # must be an UNSHUFFLED clean row: reconstruct partners against
        # every possible clean row; at least one must match per row.
        # (With shuffled partners the chunk permutation would break the
        # match with probability 1 - 1/4! per row.)
        keys = jax.random.split(KEY, 5)
        shuffled_self = augment.shuffle_chunks(w, l, keys[0], 1.0, sr=sr)
        rec = np.asarray(2.0 * out - shuffled_self)
        w_np = np.asarray(w)
        for row in rec:
            dists = np.abs(w_np - row[None]).max(axis=1)
            assert dists.min() < 1e-4, "mixup partner was augmented"


class TestMixupReferenceSpec:
    """Executable numpy spec of the reference mix_audio_and_labels
    (/root/reference/ops/audio.py:30-51) checked against the device op.

    Reference semantics: equal sizes -> plain (first+second)/2 early
    return (NO ``a`` scaling, audio.py:38-40); otherwise the longer clip is
    scaled by a ~ U(0.4, 0.6) and its [start, start+len(shorter)) window is
    REPLACED by shorter*(1-a) (the ``=+`` typo at audio.py:50); labels are
    clipped-sum OR.
    """

    def test_equal_lengths_plain_average_no_a_scaling(self):
        # constant rows make the check exact and a-independent: any
        # a-scaled variant would differ from 0.5*(w1+w2)
        l = 64
        w = jnp.stack([jnp.full((l,), 0.3), jnp.full((l,), 0.7)])
        lens = jnp.asarray([l, l], jnp.int32)
        y = jnp.asarray(np.eye(2, 4, dtype="f4"))
        # identical pool rows -> the iid partner draw is irrelevant
        pool = (jnp.full((2, l), 0.7), lens, jnp.asarray(
            np.tile(np.eye(1, 4, k=1, dtype="f4"), (2, 1))))
        out, olens, oy = augment.mixup_or(
            w, lens, y, KEY, 1.0, partner=pool)
        np.testing.assert_allclose(
            np.asarray(out[0]), np.full(l, 0.5), atol=1e-6)
        assert np.asarray(oy)[0, 1] == 1.0  # OR'd partner label

    def test_unequal_lengths_replace_window_semantics(self):
        """Recover (a, start) from constant signals and verify the output
        IS the reference formula: a*longer outside the window,
        (1-a)*shorter inside, window length = shorter length."""
        l = 256
        long_len, short_len = 256, 100
        w = jnp.stack([jnp.ones((l,)),
                       jnp.pad(jnp.ones((short_len,)), (0, l - short_len))])
        lens = jnp.asarray([long_len, long_len], jnp.int32)
        y = jnp.asarray(np.eye(2, 4, dtype="f4"))
        pw = jnp.tile(
            jnp.pad(jnp.ones((short_len,)), (0, l - short_len))[None], (2, 1))
        pool = (pw, jnp.asarray([short_len, short_len], jnp.int32),
                jnp.asarray(np.tile(
                    np.eye(1, 4, k=2, dtype="f4"), (2, 1))))
        out, olens, oy = augment.mixup_or(
            w, lens, y, KEY, 1.0, partner=pool)
        row = np.asarray(out[0])
        assert int(olens[0]) == long_len
        # the window never reaches the last sample (start <= span-1, so
        # end <= long_len-1): the final sample always carries the outside
        # value a; the window carries 1-a
        a_val = float(row[long_len - 1])
        assert 0.4 - 1e-5 <= a_val <= 0.6 + 1e-5
        inside = np.flatnonzero(~np.isclose(row, a_val, atol=1e-5))
        assert inside.size == short_len, "window length != shorter length"
        start = int(inside[0])
        assert (inside == np.arange(start, start + short_len)).all(), \
            "window not contiguous"
        np.testing.assert_allclose(
            row[inside], 1.0 - a_val, atol=1e-5)  # REPLACED, not added
        # reproduce with the literal numpy spec at the recovered (a, start)
        ref = self._mix_np(
            np.ones(long_len, "f4"), np.ones(short_len, "f4"),
            a_val, start)
        np.testing.assert_allclose(row[:long_len], ref, atol=1e-5)
        assert np.asarray(oy)[0, 2] == 1.0

    @staticmethod
    def _mix_np(first, second, a, start):
        """Literal port of reference mix_audio_and_labels' audio path
        (sizes differ; audio.py:42-51) at fixed (a, start)."""
        shorter, longer = first, second
        if first.size > second.size:
            shorter, longer = longer, shorter
        longer = longer * a
        longer[start : start + shorter.size] = +(shorter * (1 - a))
        return longer


class TestShuffle:
    def test_preserves_multiset_of_valid_samples(self):
        w, l, _ = _batch(b=2, l=44100 * 2, seed=4)  # 2s -> 4 chunks
        w2 = augment.shuffle_chunks(w, l, KEY, 1.0)
        for i in range(2):
            a = np.sort(np.asarray(w[i, : l[i]]))
            b = np.sort(np.asarray(w2[i, : l[i]]))
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_short_clip_untouched(self):
        # < 2 chunks -> identity (reference audio.py:59-60)
        w = jnp.asarray(np.random.RandomState(0).randn(1, 44100).astype("f4"))
        l = jnp.asarray([10000])  # ~0.2s -> 0 chunks
        w2 = augment.shuffle_chunks(w, l, KEY, 1.0)
        np.testing.assert_array_equal(w, w2)


class TestCutout:
    def test_zeros_a_window(self):
        w = jnp.ones((1, 1000))
        l = jnp.asarray([1000])
        w2 = augment.cutout(w, l, KEY, 1.0, area=0.25)
        zeros = int((np.asarray(w2) == 0).sum())
        assert 1 <= zeros <= 251

    def test_p_zero(self):
        w, l, _ = _batch()
        np.testing.assert_array_equal(w, augment.cutout(w, l, KEY, 0.0))


class TestFlip:
    def test_reverses_valid_region(self):
        w = jnp.asarray(np.arange(10, dtype="f4")[None, :])
        l = jnp.asarray([6])
        w2 = augment.flip(w, l, KEY, 1.0)
        np.testing.assert_array_equal(
            np.asarray(w2[0]), [5, 4, 3, 2, 1, 0, 6, 7, 8, 9]
        )


class TestSegment:
    def test_crop_shrinks_length(self):
        w, l, _ = _batch()
        w2, l2 = augment.sample_segment(w, l, KEY, 1.0, ratio=(0.3, 0.5))
        assert (l2 <= l).all()
        assert (l2 >= (0.29 * np.asarray(l)).astype(int)).all()


class TestEffects:
    def test_shapes_and_finiteness(self):
        w, l, _ = _batch(b=3, l=8192, seed=5)
        w2, l2 = augment.effects_chain(w, l, KEY, 1.0, sr=8192)
        assert w2.shape == w.shape
        assert np.isfinite(np.asarray(w2)).all()
        assert (np.asarray(l2) >= 1).all()

    def test_p_zero_identity(self):
        w, l, _ = _batch(b=2, l=4096)
        w2, l2 = augment.effects_chain(w, l, KEY, 0.0, sr=4096)
        np.testing.assert_array_equal(w, w2)
        np.testing.assert_array_equal(l, l2)

    def test_overdrive_bounded(self):
        w = jnp.asarray(np.random.RandomState(0).randn(2, 100).astype("f4"))
        out = augment.overdrive(w, jnp.asarray([2.0, 10.0]))
        assert float(jnp.abs(out).max()) <= 1.01

    def test_fixed_count_matches_full_chain_on_selected_rows(self):
        """Fixed-count compaction: exactly round(p*B) rows are processed,
        each bit-matching the p=1 full-batch chain (same key -> same
        per-row parameters), the rest bit-matching the input."""
        w, l, _ = _batch(b=4, l=8192, seed=9)
        full, full_len = augment.effects_chain(w, l, KEY, 1.0, sr=8192)
        fc, fc_len = augment.effects_chain(w, l, KEY, 0.5, sr=8192,
                                           fixed_count=True)
        fc, fc_len = np.asarray(fc), np.asarray(fc_len)
        wn, fulln = np.asarray(w), np.asarray(full)
        changed = [i for i in range(4) if not np.array_equal(fc[i], wn[i])]
        assert len(changed) == 2, f"expected exactly 2 processed rows, got {changed}"
        for i in range(4):
            if i in changed:
                np.testing.assert_allclose(fc[i], fulln[i], atol=1e-6)
                assert fc_len[i] == int(full_len[i])
            else:
                np.testing.assert_array_equal(fc[i], wn[i])
                assert fc_len[i] == int(l[i])

    def test_traced_p_falls_back_to_masked_path(self):
        """A traced probability (e.g. traced epoch scale) cannot use the
        static row count; the bernoulli-masked path must still jit."""
        w, l, _ = _batch(b=3, l=4096, seed=3)
        fn = jax.jit(lambda p: augment.effects_chain(w, l, KEY, p, sr=4096))
        out, ln = fn(jnp.float32(0.7))
        assert out.shape == w.shape
        assert np.isfinite(np.asarray(out)).all()
        out0, ln0 = fn(jnp.float32(0.0))
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(w))

    def test_resample_rate(self):
        t = np.arange(4000) / 4000
        w = jnp.asarray(np.sin(2 * np.pi * 10 * t)[None, :].astype("f4"))
        l = jnp.asarray([4000])
        out, l2 = augment.resample_rate(w, l, jnp.asarray([2.0]))
        assert int(l2[0]) == 2000
        # double speed -> first half contains the full (compressed) signal
        np.testing.assert_allclose(
            np.asarray(out[0, :1999]), np.asarray(w[0, ::2][:1999]), atol=1e-2
        )


class TestPipeline:
    def test_make_augmenter_none_when_disabled(self):
        assert augment.make_augmenter(augment.AugmentConfig()) is None

    def test_full_pipeline_jits(self):
        cfg = augment.AugmentConfig(
            p_mixup=0.5, p_aug=0.5, p_shuffle=0.5, sr=4096
        )
        fn = augment.make_augmenter(cfg)
        w, l, y = _batch(b=4, l=4096)
        jitted = jax.jit(fn)
        w2, l2, y2 = jitted(w, l, y, KEY, jnp.float32(1.0))
        assert w2.shape == w.shape and y2.shape == y.shape
        assert np.isfinite(np.asarray(w2)).all()
        # scale=0 disables everything
        w3, l3, y3 = jitted(w, l, y, KEY, jnp.float32(0.0))
        np.testing.assert_array_equal(w, w3)
        np.testing.assert_array_equal(y, y3)


class TestTTAPerturb:
    """noise / time-shift TTA perturbations (ops.augment.tta_perturb)."""

    def test_identity_when_disabled(self):
        w, l, _ = _batch(b=3, l=4096)
        out, ln = augment.tta_perturb(w, l, KEY, 0.0, 0.0, sr=4096)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(w))
        np.testing.assert_array_equal(np.asarray(ln), np.asarray(l))

    def test_noise_changes_signal_at_given_snr(self):
        w, l, _ = _batch(b=3, l=4096)
        out, ln = augment.tta_perturb(w, l, KEY, noise_snr_db=20.0, sr=4096)
        np.testing.assert_array_equal(np.asarray(ln), np.asarray(l))
        diff = np.asarray(out) - np.asarray(w)
        valid0 = int(l[0])
        rms_sig = np.sqrt(np.mean(np.asarray(w)[0, :valid0] ** 2))
        rms_noise = np.sqrt(np.mean(diff[0, :valid0] ** 2))
        # ~20 dB below signal RMS (loose: finite sample)
        assert 0.03 * rms_sig < rms_noise < 0.3 * rms_sig
        # padding of a short row stays silent (row 1 is half length)
        valid1 = int(l[1])
        assert np.abs(diff[1, valid1:]).max() == 0.0

    def test_shift_moves_content_right(self):
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(2, 4096).astype("f4"))
        l = jnp.asarray([2048, 4096])
        out, ln = augment.tta_perturb(
            w, l, KEY, shift_max_s=0.25, sr=4096)
        out = np.asarray(out)
        assert np.isfinite(out).all()
        assert (np.asarray(ln) >= np.asarray(l)).all() or (
            np.asarray(ln) == 4096).any()
        # row with headroom: shifted content is a prefix-zero version
        s = int(np.argmax(np.abs(out[0]) > 0))
        if s > 0:
            np.testing.assert_allclose(
                out[0, s : s + 100], np.asarray(w)[0, :100], atol=1e-6)
