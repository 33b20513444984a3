"""On-device, PRNG-pure, vmapped audio augmentations.

TPU-native counterparts of the reference's CPU/sox augmentation stack
(ops/audio.py + ops/transforms.py + pysndfx->sox): every op here is a pure
function of (waveform batch, valid lengths, PRNG key) with static shapes, so
the whole augmentation pipeline fuses into the jitted train step — the
reference pays librosa/sox subprocess costs per sample in loader workers
(SURVEY.md §3.1 hot loops); here augmentation is effectively free on the
accelerator.

Components and their reference counterparts:
- ``mixup_or``        — MixUp with OR labels + replace-window mix
                        (ops/audio.py:32-52, transforms.py:44-65). Reproduces
                        the reference's ``=+`` quirk (audio.py:50): the window
                        of the longer clip is *replaced* by ``shorter*(1-a)``,
                        not added — ``quirk_replace=False`` gives the intended
                        additive mix. Partner comes from a batch permutation
                        (the reference draws a random clean sample).
- ``shuffle_chunks``  — 0.5 s chunk permutation (audio.py:55-67), including
                        gen_even_slices sizing (first size%n chunks one longer)
- ``cutout``          — zero a random 25% window (audio.py:70-79)
- ``flip``            — reverse valid samples (transforms.py:68-81)
- ``sample_segment``  — random sub-segment crop-in-place (transforms.py:236-253)
- ``effects_chain``   — sox reverb/pitch/overdrive/speed equivalent
                        (transforms.py:84-108): sox-faithful freeverb
                        (ops/freeverb.py, exact comb/allpass topology and
                        parameter mappings, applied by FFT convolution),
                        tanh-waveshaper overdrive, phase-vocoder pitch, and
                        a combined pitch+speed resample
                        (factor speed * 2^(cents/1200)).

Probabilities are multiplied by a jit-STATIC ``scale`` (values only 0.0/1.0
in practice): the epoch-gated switch-off (reference
Compose.switch_off_augmentations, transforms.py:362-365) compiles a separate
augmenter-free program — a bit-exact skip, tested vs augment=None — and a
static 0<p<1 lets ``effects_chain`` use fixed-count row compaction
(PARITY.md "fixed-count effects compaction").
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

SR = 44100


def _per_sample_keys(key: jax.Array, batch: int, n: int):
    keys = jax.random.split(key, batch * n).reshape(batch, n, 2)
    return [keys[:, i] for i in range(n)]


def _shift_rows(wave: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Per-row roll: out[b, i] = wave[b, (i - shift[b]) mod L].

    Callers mask the shifted-out region afterwards (mixup window placement,
    segment crops). Measured note: routing this through the Pallas
    offset-resample kernel was tried and is ~2x SLOWER than vmapped roll
    (the kernel pays full per-row interpolation-mask cost, ~12 ms at
    64 x 10 s, vs ~5 ms for XLA's roll lowering)."""
    return jax.vmap(jnp.roll)(wave, shift)


# ---------------------------------------------------------------------------
# MixUp-OR (reference ops/audio.py:32-52)
# ---------------------------------------------------------------------------


def mixup_or(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    p: float | jnp.ndarray,
    quirk_replace: bool = True,
    partner: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
):
    """MixUp with OR'd labels; partners drawn iid from a clean pool.

    For each selected sample, pairs it with a row drawn iid from
    ``partner`` — clean un-augmented clips, matching the reference's
    partner being an iid *un-augmented* dataset draw (transforms.py:56 /
    sound_dataset.py:41-56; ``random.randint`` over the whole dataset). The
    engine feeds the previous same-bucket batch as the pool, so over an
    epoch partners span the full dataset, not just the current batch
    (round-1 VERDICT missing #3). When ``partner`` is None the pool is the
    batch itself. The shorter clip is written into a random window of the
    longer, which was scaled by a ~ U(0.4, 0.6); labels are clipped-sum OR.
    ``quirk_replace`` reproduces the reference's window *replacement*
    (audio.py:50 ``=+``). Equal-length pairs return the plain average
    ``(first+second)/2`` with no ``a`` scaling, exactly the reference's
    early return (audio.py:38-40).
    """
    b, l = wave.shape
    k_perm, k_apply, k_a, k_start = jax.random.split(key, 4)

    src_wave, src_len, src_lab = (
        partner if partner is not None else (wave, lengths, labels)
    )
    draw = jax.random.randint(k_perm, (b,), 0, src_wave.shape[0])
    wave2, len2, lab2 = src_wave[draw], src_len[draw], src_lab[draw]

    apply = jax.random.bernoulli(k_apply, jnp.clip(p, 0.0, 1.0), (b,))
    a = jax.random.uniform(k_a, (b,), minval=0.4, maxval=0.6)

    first_longer = lengths >= len2
    longer = jnp.where(first_longer[:, None], wave, wave2)
    shorter = jnp.where(first_longer[:, None], wave2, wave)
    longer_len = jnp.maximum(lengths, len2)
    shorter_len = jnp.minimum(lengths, len2)

    span = jnp.maximum(longer_len - shorter_len, 1)
    start = (jax.random.uniform(k_start, (b,)) * span).astype(jnp.int32)

    # place shorter at [start, start+shorter_len): the shift is wrap-free
    # because start <= longer_len - shorter_len <= L - shorter_len
    shifted = _shift_rows(shorter, start)
    idx = jnp.arange(l)[None, :]
    window = (idx >= start[:, None]) & (idx < (start + shorter_len)[:, None])

    scaled_longer = longer * a[:, None]
    if quirk_replace:
        mixed = jnp.where(window, shifted * (1.0 - a[:, None]), scaled_longer)
    else:
        mixed = scaled_longer + jnp.where(
            window, shifted * (1.0 - a[:, None]), 0.0
        )

    equal = lengths == len2
    mixed = jnp.where(equal[:, None], (wave + wave2) * 0.5, mixed)

    new_labels = jnp.clip(labels + lab2, 0.0, 1.0)
    out_wave = jnp.where(apply[:, None], mixed, wave)
    out_len = jnp.where(apply, longer_len, lengths)
    out_labels = jnp.where(apply[:, None], new_labels, labels)
    return out_wave, out_len.astype(lengths.dtype), out_labels


# ---------------------------------------------------------------------------
# Chunk shuffle (reference ops/audio.py:55-67)
# ---------------------------------------------------------------------------


def shuffle_chunks(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    key: jax.Array,
    p: float | jnp.ndarray,
    chunk_seconds: float = 0.5,
    sr: int = SR,
):
    """Split the valid region into 0.5 s chunks and permute them.

    TPU-shaped: the waveform is viewed as (B, n_chunks, chunk) and the
    permutation is a gather along the *chunk axis* — each gathered element
    is a contiguous 22050-float block, which XLA moves at full HBM bandwidth
    (an element-wise 1D gather formulation was ~3 s/step at 10 s batches;
    this is ~ms). Chunks are exactly ``chunk_seconds`` long and only full
    chunks inside the valid region take part (the reference's
    gen_even_slices redistributes the remainder over chunks,
    ops/audio.py:55-67 — the host compat layer keeps that exact behavior;
    on device the partial tail chunk stays in place).
    """
    b, l = wave.shape
    chunk = max(int(chunk_seconds * sr), 1)
    c_total = l // chunk
    if c_total < 2:
        return wave

    k_apply, k_perm = jax.random.split(key)
    apply = jax.random.bernoulli(k_apply, jnp.clip(p, 0.0, 1.0), (b,))

    # number of full chunks in the valid region; reference shuffles only
    # when there are >= 2 chunks (ops/audio.py:59-60)
    n_full = jnp.minimum(lengths // chunk, c_total)
    active = n_full >= 2

    # per-sample permutation fixing chunks >= n_full: valid chunks get
    # random sort keys, the tail keeps ascending keys above them
    u = jax.random.uniform(k_perm, (b, c_total))
    idx = jnp.arange(c_total)[None, :]
    keys_sort = jnp.where(idx < n_full[:, None], u, 2.0 + idx)
    perm = jnp.argsort(keys_sort, axis=1)  # (B, c_total)

    head = wave[:, : c_total * chunk].reshape(b, c_total, chunk)
    shuffled = jnp.take_along_axis(head, perm[:, :, None], axis=1)
    shuffled = shuffled.reshape(b, c_total * chunk)
    if c_total * chunk < l:
        shuffled = jnp.concatenate(
            [shuffled, wave[:, c_total * chunk :]], axis=1)

    use = (apply & active)[:, None]
    return jnp.where(use, shuffled, wave)


# ---------------------------------------------------------------------------
# CutOut (reference ops/audio.py:70-79)
# ---------------------------------------------------------------------------


def cutout(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    key: jax.Array,
    p: float | jnp.ndarray,
    area: float = 0.25,
):
    """Zero a random window of ``area`` x valid length (clipped at the end)."""
    b, l = wave.shape
    k_apply, k_start = jax.random.split(key)
    apply = jax.random.bernoulli(k_apply, jnp.clip(p, 0.0, 1.0), (b,))
    width = (lengths.astype(jnp.float32) * area).astype(jnp.int32)
    start = (
        jax.random.uniform(k_start, (b,)) * lengths.astype(jnp.float32)
    ).astype(jnp.int32)
    idx = jnp.arange(l)[None, :]
    window = (idx >= start[:, None]) & (idx < (start + width)[:, None])
    out = jnp.where(window & apply[:, None], 0.0, wave)
    return out


# ---------------------------------------------------------------------------
# Flip (reference ops/transforms.py:68-81)
# ---------------------------------------------------------------------------


def flip(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    key: jax.Array,
    p: float | jnp.ndarray,
):
    """Reverse the valid region (padding stays in place)."""
    b, l = wave.shape
    apply = jax.random.bernoulli(key, jnp.clip(p, 0.0, 1.0), (b,))
    idx = jnp.arange(l)[None, :]
    rev = jnp.clip(lengths[:, None] - 1 - idx, 0, l - 1)
    src = jnp.where(idx < lengths[:, None], rev, idx)
    flipped = jnp.take_along_axis(wave, src, axis=1)
    return jnp.where(apply[:, None], flipped, wave)


# ---------------------------------------------------------------------------
# Segment crop (reference ops/transforms.py:236-253)
# ---------------------------------------------------------------------------


def sample_segment(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    key: jax.Array,
    p: float | jnp.ndarray,
    ratio=(0.3, 0.9),
):
    """Random sub-segment: new length ~ U(ratio) x length, shifted to 0."""
    b, l = wave.shape
    k_apply, k_ratio, k_start = jax.random.split(key, 3)
    apply = jax.random.bernoulli(k_apply, jnp.clip(p, 0.0, 1.0), (b,))
    r = jax.random.uniform(k_ratio, (b,), minval=ratio[0], maxval=ratio[1])
    new_len = jnp.maximum((lengths.astype(jnp.float32) * r), 1.0).astype(
        jnp.int32
    )
    span = jnp.maximum(lengths - new_len, 1)
    start = (jax.random.uniform(k_start, (b,)) * span).astype(jnp.int32)
    shifted = _shift_rows(wave, -start)
    idx = jnp.arange(l)[None, :]
    cropped = jnp.where(idx < new_len[:, None], shifted, 0.0)
    out_wave = jnp.where(apply[:, None], cropped, wave)
    out_len = jnp.where(apply, new_len, lengths)
    return out_wave, out_len.astype(lengths.dtype)


# ---------------------------------------------------------------------------
# sox-equivalent effects chain (reference ops/transforms.py:84-108)
# ---------------------------------------------------------------------------

def reverb(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    reverberance: jnp.ndarray,
    room_scale: jnp.ndarray,
    sr: int = SR,
):
    """Sox-semantics freeverb (comb/allpass topology, exact sox parameter
    mappings, dry + 0.015-gain wet) — see ops/freeverb.py. The reference's
    sox call is reverb(reverberance, room_scale, stereo_depth) with pysndfx
    defaults hf_damping=50, pre_delay=20 ms, wet_gain=0 dB; stereo_depth is
    inert for mono input (transforms.py:96-101)."""
    from freesound_classification_tpu.ops import freeverb

    return freeverb.reverb_batch(
        wave, lengths, reverberance, room_scale, sr)


def overdrive(wave: jnp.ndarray, gain_db: jnp.ndarray,
              colour: float = 20.0):
    """sox ``overdrive gain colour``, calibrated to sox 14.4.2
    src/overdrive.c (the reference shells to it via pysndfx with
    colour=20 default, ops/transforms.py:103). Per sample:

        d    = x * 10^(gain/20) + colour/200
        d    = -2/3 if d < -1 else 2/3 if d > 1 else d - d^3/3   (soft clip)
        y[n] = d[n] - d[n-1] + 0.995 * y[n-1]                    (DC block)
        out  = clip(x/2 + 3/4 * y, -1, 1)

    The waveshaper is elementwise; the DC-blocking IIR — the part a naive
    port would scan — runs as chunked triangular MXU matmuls
    (ops/dsp.iir_first_order), so the whole op stays inside the fused
    augmentation program. Golden-tested against the numpy recurrence at
    gains 2-10 (tests/test_overdrive.py)."""
    from freesound_classification_tpu.ops.dsp import iir_first_order

    g = 10.0 ** (gain_db / 20.0)
    d = wave * g[:, None] + colour / 200.0
    d = jnp.where(
        d < -1.0, -2.0 / 3.0,
        jnp.where(d > 1.0, 2.0 / 3.0, d - d * d * d * (1.0 / 3.0)))
    u = d - jnp.concatenate([jnp.zeros_like(d[:, :1]), d[:, :-1]], axis=1)
    y = iir_first_order(u, 0.995)
    return jnp.clip(wave * 0.5 + y * 0.75, -1.0, 1.0)


def resample_rate(
    wave: jnp.ndarray, lengths: jnp.ndarray, factor: jnp.ndarray,
    use_pallas: bool | None = None,
):
    """Linear-interpolation playback-rate change by per-sample ``factor``.

    factor > 1 -> faster & higher (shorter); sox ``speed`` semantics. Output
    stays in the same static buffer; tails beyond it are dropped.

    On TPU at clip scale this routes to the gather-free Pallas kernel
    (ops/pallas_kernels.resample_linear_pallas, 6x the XLA take_along_axis
    formulation); small inputs, other backends, and concrete factors beyond
    the kernel's supported domain (> _RS_MAX_FACTOR) use the XLA path.
    """
    b, l = wave.shape
    if use_pallas is None:
        from freesound_classification_tpu.ops.pallas_kernels import (
            _RS_MAX_FACTOR,
            _on_tpu,
            static_bound_exceeded,
        )

        use_pallas = (
            _on_tpu() and l >= 16384
            and static_bound_exceeded(factor, _RS_MAX_FACTOR) is not True
        )

    idx = jnp.arange(l)[None, :].astype(jnp.float32) * factor[:, None]
    if use_pallas:
        from freesound_classification_tpu.ops.pallas_kernels import (
            resample_linear_pallas,
        )

        out = resample_linear_pallas(wave, factor)
    else:
        i0 = jnp.floor(idx).astype(jnp.int32)
        frac = idx - i0
        i0c = jnp.clip(i0, 0, l - 1)
        i1c = jnp.clip(i0 + 1, 0, l - 1)
        out = (
            jnp.take_along_axis(wave, i0c, axis=1) * (1 - frac)
            + jnp.take_along_axis(wave, i1c, axis=1) * frac
        )
    new_len = jnp.minimum(
        (lengths.astype(jnp.float32) / factor).astype(jnp.int32), l
    )
    valid_src = idx < lengths[:, None].astype(jnp.float32)
    out = jnp.where(valid_src, out, 0.0)
    return out, jnp.maximum(new_len, 1).astype(lengths.dtype)


def effects_chain(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    key: jax.Array,
    p: float | jnp.ndarray,
    sr: int = SR,
    use_phase_vocoder: bool = True,
    fixed_count: bool = True,
):
    """reverb -> pitch -> overdrive -> speed, per-sample randomized.

    Order and parameter ranges follow the reference chain
    (transforms.py:94-105): reverberance/room_scale ~ U[0, 50), pitch shift
    ~ U[-300, 300) cents, overdrive gain ~ U[2, 10) dB, speed ~ U[0.9, 1.1).

    With ``use_phase_vocoder`` (default), pitch is a duration-preserving
    phase-vocoder shift (sox ``pitch`` semantics) and speed a separate
    resample — the two fold into one PV stretch + one resample
    (factor = speed * 2^(cents/1200)). Overdrive (a memoryless waveshaper)
    is applied between the PV stretch and the combined resample, which
    matches the reference's pitch-then-overdrive-then-speed ordering up to
    the (linear) interpolation commuting with the pointwise nonlinearity.
    Without the phase vocoder, pitch+speed collapse to the single resample
    (sox ``speed``-style, cheaper) and overdrive precedes it.

    **Fixed-count compaction** (``fixed_count``, default on): when ``p`` is
    a concrete Python scalar with 0 < p < 1, the chain runs on exactly
    ``k = round(p*B)`` uniformly-chosen rows (row gather -> chain on the
    (k, L) sub-batch -> row scatter) instead of computing all B rows and
    masking — the chain is the augmenter's dominant cost (~68 ms of the
    92 ms augmenter at B=64 x 10 s) and at the reference recipe's
    p_aug=0.75 a quarter of it is thrown away by the mask. Per-row marginal
    probability stays k/B = round(p*B)/B (exactly p when p*B is integral,
    e.g. 0.75*64=48); only the per-step applied-row COUNT loses its
    binomial variance (documented in PARITY.md). Per-row effect parameters
    are drawn for all B rows from the same streams and gathered, so a
    selected row sees bit-identical parameters to the masked formulation.
    Traced ``p`` (e.g. a traced epoch scale) falls back to the masked path.
    """
    b, l = wave.shape
    # 7-way split kept (one key unused since the freeverb rewrite) so the
    # random parameter streams stay bit-identical across versions
    k_apply, k_rev, k_room, k_pitch, k_gain, k_speed, _ = (
        jax.random.split(key, 7)
    )

    reverberance = jax.random.uniform(k_rev, (b,), minval=0.0, maxval=50.0)
    room = jax.random.uniform(k_room, (b,), minval=0.0, maxval=50.0)
    cents = jax.random.uniform(k_pitch, (b,), minval=-300.0, maxval=300.0)
    gain = jax.random.uniform(k_gain, (b,), minval=2.0, maxval=10.0)
    speed = jax.random.uniform(k_speed, (b,), minval=0.9, maxval=1.1)

    def run_chain(w, ln, rev_p, room_p, cents_p, gain_p, speed_p):
        out, new_len = reverb(w, ln, rev_p, room_p, sr)
        pitch_factor = jnp.exp2(cents_p / 1200.0)
        if use_phase_vocoder:
            from freesound_classification_tpu.ops.pv import (
                phase_vocoder_stretch,
            )

            # stretch 1/f (duration x f), then resample f*speed: pitch x f,
            # total duration /speed — sox pitch-then-speed semantics
            n_fft = min(1024, max(256, l // 8))
            out, new_len = phase_vocoder_stretch(
                out, new_len, 1.0 / pitch_factor, n_fft=n_fft,
                hop=n_fft // 4)
        out = overdrive(out, gain_p)
        return resample_rate(out, new_len, speed_p * pitch_factor)

    p_static = p if isinstance(p, (int, float)) else None
    if fixed_count and p_static is not None and 0.0 < p_static < 1.0 and b > 1:
        k = max(1, min(b, int(round(b * p_static))))
        sel = jax.random.permutation(k_apply, b)[:k]
        out, new_len = run_chain(
            jnp.take(wave, sel, axis=0), jnp.take(lengths, sel, axis=0),
            jnp.take(reverberance, sel), jnp.take(room, sel),
            jnp.take(cents, sel), jnp.take(gain, sel),
            jnp.take(speed, sel))
        wave_out = wave.at[sel].set(out)
        len_out = lengths.at[sel].set(new_len.astype(lengths.dtype))
        return wave_out, len_out

    apply = jax.random.bernoulli(k_apply, jnp.clip(p, 0.0, 1.0), (b,))
    out, new_len = run_chain(wave, lengths, reverberance, room, cents, gain,
                             speed)
    wave_out = jnp.where(apply[:, None], out, wave)
    len_out = jnp.where(apply, new_len, lengths)
    return wave_out, len_out.astype(lengths.dtype)


# ---------------------------------------------------------------------------
# Test-time augmentation perturbations (beyond the reference's crop re-draws)
# ---------------------------------------------------------------------------


def tta_perturb(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    key: jax.Array,
    noise_snr_db: float = 0.0,
    shift_max_s: float = 0.0,
    sr: int = SR,
):
    """Light stochastic perturbation for TTA passes (ROADMAP #7).

    The reference's only TTA is re-drawing the random crop
    (evaluate_2d_cnn.py --n_tta); this adds two more modes, both on-device:
    - additive white noise at ``noise_snr_db`` dB below the per-clip RMS
      (0 disables),
    - a random right time-shift of up to ``shift_max_s`` seconds (content
      shifted into the padding; tails past the buffer are dropped).

    Returns (wave, lengths). Deterministic (identity) when both knobs are 0.
    """
    b, l = wave.shape
    k_noise, k_shift = jax.random.split(key)
    out, out_len = wave, lengths

    if shift_max_s > 0.0:
        max_shift = max(int(shift_max_s * sr), 1)
        shift = jax.random.randint(k_shift, (b,), 0, max_shift + 1)
        rolled = jax.vmap(jnp.roll)(out, shift)
        idx = jnp.arange(l)[None, :]
        keep = (idx >= shift[:, None]) & (
            idx < jnp.minimum(out_len + shift, l)[:, None])
        out = jnp.where(keep, rolled, 0.0)
        out_len = jnp.minimum(out_len + shift, l).astype(lengths.dtype)

    if noise_snr_db > 0.0:
        valid = (jnp.arange(l)[None, :] < out_len[:, None]).astype(out.dtype)
        rms = jnp.sqrt(
            jnp.sum(out * out * valid, axis=1)
            / jnp.maximum(out_len.astype(out.dtype), 1.0))
        sigma = rms * 10.0 ** (-noise_snr_db / 20.0)
        noise = jax.random.normal(k_noise, (b, l), out.dtype)
        out = out + noise * sigma[:, None] * valid

    return out, out_len


# ---------------------------------------------------------------------------
# Pipeline assembly (the reference Compose of augmentations,
# train_2d_cnn.py:310-322)
# ---------------------------------------------------------------------------


class AugmentConfig(NamedTuple):
    p_mixup: float = 0.0
    p_aug: float = 0.0  # effects chain
    p_shuffle: float = 0.0  # 0.5 for non-rnn models (train_2d_cnn.py:314-317)
    p_cutout: float = 0.0
    p_flip: float = 0.0
    mixup_quirk_replace: bool = True
    # reference MixUp partners are *un-augmented* dataset samples
    # (transforms.py:56, sound_dataset.py:41-56); True mixes from a clean
    # pre-shuffle/flip copy of the batch, False from the augmented rows
    mixup_clean_partner: bool = True
    use_phase_vocoder: bool = True
    # run the effects chain on exactly round(p_aug*B) gathered rows instead
    # of all B masked (see effects_chain docstring; False = exact per-row
    # bernoulli count semantics at full compute cost)
    fixed_count_effects: bool = True
    sr: int = SR


def make_augmenter(cfg: AugmentConfig):
    """Build fn(wave, lengths, labels, key, scale, partner=None) matching
    the reference train pipeline order: shuffle -> mixup -> effects
    (train_2d_cnn.py:310-322).
    ``scale`` in [0, 1] multiplies every probability (epoch-gated
    switch-off). ``partner`` is an optional (wave, lengths, labels) pool of
    CLEAN clips for MixUp partners (the engine passes the previous
    same-bucket batch, widening the partner distribution to the whole
    dataset as in the reference's iid dataset draw); None falls back to a
    clean copy of the batch itself.
    Returns None when every probability is zero (skips the work entirely).
    """
    if not any((cfg.p_mixup, cfg.p_aug, cfg.p_shuffle, cfg.p_cutout,
                cfg.p_flip)):
        return None

    def augment(wave, lengths, labels, key, scale, partner=None):
        keys = jax.random.split(key, 5)
        if partner is not None:
            clean = partner
        elif cfg.mixup_clean_partner:
            clean = (wave, lengths, labels)
        else:
            clean = None
        if cfg.p_shuffle:
            wave = shuffle_chunks(
                wave, lengths, keys[0], cfg.p_shuffle * scale, sr=cfg.sr
            )
        if cfg.p_flip:
            wave = flip(wave, lengths, keys[1], cfg.p_flip * scale)
        if cfg.p_mixup:
            wave, lengths, labels = mixup_or(
                wave, lengths, labels, keys[2], cfg.p_mixup * scale,
                quirk_replace=cfg.mixup_quirk_replace,
                partner=clean,
            )
        if cfg.p_aug:
            wave, lengths = effects_chain(
                wave, lengths, keys[3], cfg.p_aug * scale, sr=cfg.sr,
                use_phase_vocoder=cfg.use_phase_vocoder,
                fixed_count=cfg.fixed_count_effects,
            )
        if cfg.p_cutout:
            wave = cutout(wave, lengths, keys[4], cfg.p_cutout * scale)
        return wave, lengths, labels

    return augment
