"""Pallas TPU kernels for the featurization hot path.

The reference's per-step device program starts with ``torch.stft`` ->
magnitude -> mel conv1d -> log (reference: ops/utils.py:110-127 +
networks/classifiers.py:574-579). On TPU the FFT itself is best left to XLA
(native rFFT), but the tail — complex magnitude, the (T, F) x (F, M) mel
projection, and the log — is one VMEM-resident Pallas kernel here, so the
magnitude never round-trips to HBM and the mel matmul lands on the MXU.

All shapes are padded to lane/sublane multiples outside the kernel; the mel
filterbank's zero-padding rows/cols make the padding numerically inert.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_EPS = 1e-4

_ROW_TILE = 256  # rows (= batch*time frames) per grid step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mel_log_kernel(re_ref, im_ref, fb_ref, out_ref):
    mag = jnp.sqrt(re_ref[:] * re_ref[:] + im_ref[:] * im_ref[:])
    mel = jnp.dot(mag, fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(mel + LOG_EPS)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mel_project_log_2d(
    re: jnp.ndarray, im: jnp.ndarray, fb_t: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(R, F) re/im spectra x (F, M) filterbank -> (R, M) log-mel rows."""
    rows, n_freq = re.shape
    n_mel = fb_t.shape[1]

    rows_p = _round_up(rows, _ROW_TILE)
    freq_p = _round_up(n_freq, 128)
    mel_p = _round_up(n_mel, 128)

    re_p = jnp.pad(re, ((0, rows_p - rows), (0, freq_p - n_freq)))
    im_p = jnp.pad(im, ((0, rows_p - rows), (0, freq_p - n_freq)))
    fb_p = jnp.pad(fb_t, ((0, freq_p - n_freq), (0, mel_p - n_mel)))

    grid = (rows_p // _ROW_TILE,)
    out = pl.pallas_call(
        _mel_log_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_ROW_TILE, freq_p), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_ROW_TILE, freq_p), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((freq_p, mel_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_ROW_TILE, mel_p), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_p, mel_p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_p * freq_p * mel_p + 3 * rows_p * freq_p,
            bytes_accessed=4 * (2 * rows_p * freq_p + freq_p * mel_p + rows_p * mel_p),
            transcendentals=rows_p * (freq_p + mel_p),
        ),
        interpret=interpret,
    )(re_p, im_p, fb_p)
    return out[:rows, :n_mel]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def mel_project_log(spec: jnp.ndarray, fb_t: jnp.ndarray) -> jnp.ndarray:
    """Complex spectrum (..., T, F) -> log-mel (..., M, T).

    Fuses |.| -> mel matmul -> log(+1e-4) in one Pallas kernel. Off-TPU the
    kernel runs in interpreter mode so tests on the CPU backend stay exact.
    """
    *lead, n_frames, n_freq = spec.shape
    rows = 1
    for d in lead:
        rows *= d
    rows *= n_frames
    re = jnp.real(spec).reshape(rows, n_freq).astype(jnp.float32)
    im = jnp.imag(spec).reshape(rows, n_freq).astype(jnp.float32)
    out = _mel_project_log_2d(re, im, fb_t, interpret=not _on_tpu())
    out = out.reshape(*lead, n_frames, fb_t.shape[1])
    return jnp.swapaxes(out, -1, -2)
