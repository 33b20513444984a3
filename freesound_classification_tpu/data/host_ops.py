"""Host-side (numpy) audio ops — the reference ops/audio.py surface.

The TPU framework runs augmentation on-device (ops/augment.py); these numpy
twins exist for the host transform compatibility layer (data/transforms.py),
for tooling, and as oracles in tests. Semantics follow the reference exactly,
including the MixUp replace-window quirk (ops/audio.py:50 ``=+``).
"""

from __future__ import annotations

import numpy as np


def compute_stft(audio: np.ndarray, window_size: int, hop_size: int,
                 log: bool = True, eps: float = 1e-4) -> np.ndarray:
    """scipy-convention STFT magnitude (reference ops/audio.py:10-19; note
    hop_size is passed as scipy's noverlap)."""
    from freesound_classification_tpu.ops.dsp import compute_stft_host

    return compute_stft_host(audio, window_size, hop_size, log=log, eps=eps)


def trim_audio(audio: np.ndarray, top_db: float = 60.0,
               frame_length: int = 2048, hop_length: int = 512) -> np.ndarray:
    """Trim leading/trailing silence (reference ops/audio.py:22-24, which
    wraps librosa.effects.trim(top_db=60)): frames whose RMS power is more
    than ``top_db`` below the clip maximum are cut from both ends."""
    if audio.size == 0:
        return audio
    n_frames = max(1 + (audio.size - frame_length) // hop_length, 1)
    rms = np.empty(n_frames)
    for i in range(n_frames):
        seg = audio[i * hop_length : i * hop_length + frame_length]
        rms[i] = np.sqrt(np.mean(seg**2) + 1e-20)
    db = 20.0 * np.log10(rms + 1e-20)
    keep = db > (db.max() - top_db)
    idx = np.flatnonzero(keep)
    if idx.size == 0:
        return audio[:0]
    start = idx[0] * hop_length
    end = min(idx[-1] * hop_length + frame_length, audio.size)
    return audio[start:end]


def mix_audio_and_labels(first_audio, second_audio, first_labels,
                         second_labels, rng=None, quirk_replace: bool = True):
    """MixUp-OR (reference ops/audio.py:32-52): labels are clipped-sum; the
    shorter clip is written into a random window of the longer one scaled by
    a ~ U(0.4, 0.6). ``quirk_replace=True`` reproduces the reference's
    ``=+`` window replacement; False gives the intended additive mix."""
    rng = rng or np.random
    new_labels = np.clip(first_labels + second_labels, 0, 1)
    a = rng.uniform(0.4, 0.6)

    shorter, longer = first_audio, second_audio
    if shorter.size == longer.size:
        return (shorter + longer) / 2, new_labels
    if first_audio.size > second_audio.size:
        shorter, longer = longer, shorter

    start = rng.randint(0, longer.size - shorter.size)
    end = start + shorter.size
    out = longer * a
    if quirk_replace:
        out[start:end] = shorter * (1 - a)
    else:
        out[start:end] += shorter * (1 - a)
    return out, new_labels


def gen_even_slices_sizes(size: int, n: int) -> np.ndarray:
    """sklearn gen_even_slices chunk sizes: first size%n chunks one longer."""
    base, rem = divmod(size, n)
    return np.array([base + (i < rem) for i in range(n)])


def shuffle_audio(audio: np.ndarray, chunk_length: float = 0.5,
                  sr: int = 44100, rng=None) -> np.ndarray:
    """Permute ~chunk_length-second chunks (reference ops/audio.py:55-67)."""
    rng = rng or np.random
    n_chunks = int((audio.size / sr) / chunk_length)
    if n_chunks in (0, 1):
        return audio
    sizes = gen_even_slices_sizes(audio.size, n_chunks)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    order = rng.permutation(n_chunks)
    return np.concatenate(
        [audio[starts[i] : starts[i] + sizes[i]] for i in order])


def cutout(audio: np.ndarray, area: float = 0.25, rng=None) -> np.ndarray:
    """Zero a random window of ``area`` x size (reference ops/audio.py:70-79;
    the window may clip at the end of the clip)."""
    rng = rng or np.random
    width = int(audio.size * area)
    start = rng.randint(0, audio.size)
    audio = audio.copy()
    audio[start : start + width] = 0
    return audio


def apply_effects_chain(audio: np.ndarray, sr: int = 44100, rng=None,
                        ) -> np.ndarray:
    """Host fallback of the sox-equivalent effects chain: runs the on-device
    implementation (ops/augment.effects_chain) through jax on one clip.

    The clip is zero-padded to a power-of-two buffer before tracing, so
    arbitrary per-clip lengths share a handful of compiled programs instead
    of triggering one XLA compile per distinct length (pathological churn
    on variable-length datasets). The 1.25x headroom lets a slowdown's
    longer output stay representable; the returned array is the valid
    (possibly length-changed, as with sox speed) region.
    """
    import math

    import jax
    import jax.numpy as jnp

    from freesound_classification_tpu.ops.augment import effects_chain

    rng = rng or np.random
    seed = int(rng.randint(0, 2**31 - 1))
    n = int(audio.size)
    cap = 1 << max(math.ceil(math.log2(max(n * 1.25, 4096))), 12)
    wave = np.zeros(cap, np.float32)
    wave[:n] = audio
    out, new_len = effects_chain(
        jnp.asarray(wave[None, :]), jnp.asarray([n]),
        jax.random.PRNGKey(seed), 1.0, sr=sr)
    return np.asarray(out[0, : int(new_len[0])])
