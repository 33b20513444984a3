"""Non-overlapping max pooling with an elementwise backward.

Why: the VJP XLA derives for ``reduce_window``-max is a
``select-and-scatter`` op — on the no-aug train step it is the single
largest traffic line (1.6 GB; scripts/probe_traffic_floor.py) and lowers
to a notoriously serial TPU loop. For NON-overlapping windows (the only
kind the reference's towers use: MaxPool1d(2) / MaxPool2d(2), reference
networks/classifiers.py:152/528) every input cell belongs to exactly one
window, so the gradient is expressible with pure elementwise ops:

    dx[cell] = dy[window]  if x[cell] == y[window] and no earlier cell
               of the window also equals y[window]  (first-max priority,
               matching XLA's select-and-scatter GE-select semantics,
               asserted bit-exactly in tests/test_pooling.py incl. ties)
             = 0 otherwise

The forward stays ``reduce_window`` (XLA's forward lowering is fine); only
the backward is replaced. Windows of size 1 along an axis (the towers'
short-bucket clamp, models/blocks.py) degenerate correctly: the single
sub-slice always equals y.

VERDICT (v5e-1 hardware, scripts/probe_maxpool_bwd.py): **negative result,
default OFF** (models/blocks.py POOL_BWD_IMPL = "xla"). Two formulations
were measured at the block0 shape (64, 128, 431, 64) bf16:
- stride-2 sub-grid interleave: 61.8 ms fwd+bwd vs select-and-scatter's
  8.3 — every stride-2 slice along the sublane (W) axis is a relayout;
- repeat + unit-shift + parity masks (the code below, no strided access
  at all): 17.2 ms vs 8.0, whole no-aug train step 62.1 vs 45.1 ms — the
  ~10 boolean/select planes at INPUT resolution cost more HBM passes than
  select-and-scatter's serial-but-single sweep.
Select-and-scatter's 1.0 GB of top-level traffic was the largest line in
the step's traffic table (probe_traffic_floor.py), but its replacement
pays full-resolution elementwise planes — the same in-context lesson as
the fused-block studies (docs/STUDIES.md). Kept as a tested, bit-exact
opt-in study.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
from flax import linen as nn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_nonoverlap(x, window: tuple):
    """``nn.max_pool(x, window, strides=window)`` with an elementwise VJP.

    x: (B, *spatial, C); ``window`` must have len(spatial) entries. Any
    trailing remainder along an axis (odd size) is dropped, exactly as
    VALID-padding reduce_window does.
    """
    return nn.max_pool(x, window, strides=window)


def _fwd(x, window):
    y = nn.max_pool(x, window, strides=window)
    return y, (x, y)


def _shift_back(arr, axis, s):
    """arr shifted so position i reads arr[i - s] (s in {0, 1}), False-padded
    at the entering edge. Unit pads/slices only — never a strided access."""
    if s == 0:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (s, 0)
    sl = [slice(None)] * arr.ndim
    sl[axis] = slice(0, arr.shape[axis])
    return jnp.pad(arr, pad)[tuple(sl)]


def _bwd(window, res, dy):
    """First-max-priority routing WITHOUT strided slices.

    A first draft interleaved four stride-2 sub-grids; on TPU every
    stride-2 slice along the sublane (W) axis is a relayout, and the
    whole-step A/B came back 7.4x SLOWER than select-and-scatter
    (scripts/probe_maxpool_bwd.py). This formulation touches memory only
    with repeats (window-broadcast), unit shifts, and parity masks — all
    same-resolution elementwise, so XLA can fuse the backward into a
    single pass:

        eq(i)  = x(i) == y(window of i)
        first  = eq & no earlier (scan-order) cell of the window has eq
        dx     = first ? dy(window) : 0

    "Earlier cell" tests are unit-shifted eq planes gated by the cell's
    window-local parity along each axis.
    """
    x, y = res
    spatial = x.shape[1:-1]
    out = tuple(s // w for s, w in zip(spatial, window))
    crop = tuple(o * w for o, w in zip(out, window))
    nsp = len(window)

    xc = x
    if crop != spatial:
        sl = [slice(None)] + [slice(0, c) for c in crop] + [slice(None)]
        xc = x[tuple(sl)]

    def up(a):  # window-broadcast to input resolution (repeat, no stride)
        for ax, w in enumerate(window):
            if w > 1:
                a = jnp.repeat(a, w, axis=1 + ax)
        return a

    eq = xc == up(y)

    # parity of each cell's window-local position along every axis
    parities = []
    for ax, w in enumerate(window):
        if w > 1:
            idx = jax.lax.broadcasted_iota(jnp.int32, eq.shape, 1 + ax)
            parities.append((idx % w) == 1)
        else:
            parities.append(None)

    # earlier window-local offsets in scan order, as shifted-eq terms
    earlier = jnp.zeros_like(eq)
    for r in itertools.product(*[range(w) for w in window]):
        if all(v == 0 for v in r):
            continue
        # mask: cells whose window-local position is exactly r
        rmask = None
        for ax in range(nsp):
            if window[ax] == 1:
                continue
            m = parities[ax] if r[ax] == 1 else ~parities[ax]
            rmask = m if rmask is None else rmask & m
        term = jnp.zeros_like(eq)
        for q in itertools.product(*[range(w) for w in window]):
            if q >= r:
                continue
            e = eq
            for ax in range(nsp):
                d = r[ax] - q[ax]  # shift back by d (d in {-1, 0, 1})
                if d == 1:
                    e = _shift_back(e, 1 + ax, 1)
                elif d == -1:
                    # read from i + 1: shift forward
                    pad = [(0, 0)] * e.ndim
                    pad[1 + ax] = (0, 1)
                    sl = [slice(None)] * e.ndim
                    sl[1 + ax] = slice(1, None)
                    e = jnp.pad(e, pad)[tuple(sl)]
            term = term | e
        earlier = earlier | (rmask & term)

    g = jnp.where(eq & ~earlier, up(dy), jnp.zeros_like(up(dy)))
    if crop != spatial:
        pad = [(0, 0)] + [(0, s - c) for s, c in zip(spatial, crop)] \
            + [(0, 0)]
        g = jnp.pad(g, pad)
    return (g.astype(x.dtype),)


max_pool_nonoverlap.defvjp(_fwd, _bwd)
