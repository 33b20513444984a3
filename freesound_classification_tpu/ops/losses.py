"""Multi-label classification losses, compiled end-to-end on device.

TPU-native counterparts of reference networks/losses.py:
- ``lsep_loss``          — naive LSEP pairwise rank loss (losses.py:47-58),
                           the variant every reference train loop actually uses
- ``lsep_loss_stable``   — log-sum-exp-stabilized LSEP (losses.py:25-44);
                           the default here (bf16/f32-safe on TPU)
- ``binary_cross_entropy`` (losses.py:19-22)
- ``focal_loss``         (losses.py:5-16)

All take logits of shape (B, C) and binary targets (B, C); `average=False`
returns the per-sample vector (used by the reference for loss histograms,
networks/classifiers.py:668-677).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pairwise_rank_terms(logits: jnp.ndarray, targets: jnp.ndarray):
    """differences[b,i,j] = s_j - s_i; mask[b,i,j] = 1 where y_j < y_i.

    Matches the reference broadcasting (losses.py:28-30, 49-50): the summed
    exponent is exp(negative_score - positive_score) over (pos, neg) pairs.
    """
    differences = logits[:, None, :] - logits[:, :, None]
    where_lower = (targets[:, None, :] < targets[:, :, None]).astype(logits.dtype)
    return differences, where_lower


def lsep_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, average: bool = True
) -> jnp.ndarray:
    """Naive LSEP: log(1 + sum exp(s_neg - s_pos)) (reference losses.py:47-58)."""
    differences, where_lower = _pairwise_rank_terms(logits, targets)
    exps = jnp.exp(differences) * where_lower
    lsep = jnp.log1p(jnp.sum(exps, axis=(1, 2)))
    return jnp.mean(lsep) if average else lsep


def lsep_loss_stable(
    logits: jnp.ndarray, targets: jnp.ndarray, average: bool = True
) -> jnp.ndarray:
    """LSEP via max-shifted log-sum-exp (reference losses.py:25-44).

    The shift is the max over *all* pairwise differences (not only masked
    ones), exactly as the reference computes it; since d[i,i] = 0 the shift is
    always >= 0 and the log argument stays in range at low precision.
    """
    n = logits.shape[0]
    differences, where_lower = _pairwise_rank_terms(logits, targets)
    differences = differences.reshape(n, -1)
    where_lower = where_lower.reshape(n, -1)

    max_difference = jnp.max(differences, axis=1, keepdims=True)
    differences = differences - max_difference
    exps = jnp.exp(differences) * where_lower

    max_difference = max_difference[:, 0]
    lsep = max_difference + jnp.log(
        jnp.exp(-max_difference) + jnp.sum(exps, axis=-1)
    )
    return jnp.mean(lsep) if average else lsep


def binary_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    raw: bool = True,
    average: bool = True,
) -> jnp.ndarray:
    """Element-wise BCE (reference losses.py:19-22).

    With ``raw=True`` the inputs are logits; the sigmoid+log pair is fused
    into the numerically stable softplus form. ``average=False`` returns the
    per-sample vector (mean over classes) for loss histograms, matching the
    lsep losses' contract so the engine can use any --loss uniformly.
    """
    if raw:
        # log(sigmoid(x)) = -softplus(-x); log(1-sigmoid(x)) = -softplus(x)
        per_elem = (
            targets * jax.nn.softplus(-logits)
            + (1.0 - targets) * jax.nn.softplus(logits)
        )
    else:
        eps = 1e-12
        probs = jnp.clip(logits, eps, 1.0 - eps)
        per_elem = -(targets * jnp.log(probs) + (1 - targets) * jnp.log(1 - probs))
    per_sample = jnp.mean(per_elem, axis=tuple(range(1, per_elem.ndim)))
    return jnp.mean(per_sample) if average else per_sample


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    focus: float = 2.0,
    raw: bool = True,
    average: bool = True,
) -> jnp.ndarray:
    """Focal loss (reference losses.py:5-16).

    ``average=False`` returns per-sample means over classes (see
    binary_cross_entropy).
    """
    probs = jax.nn.sigmoid(logits) if raw else logits
    eps = 1e-7
    prob_true = probs * targets + (1.0 - probs) * (1.0 - targets)
    prob_true = jnp.clip(prob_true, eps, 1.0 - eps)
    modulating_factor = (1.0 - prob_true) ** focus
    per_elem = -modulating_factor * jnp.log(prob_true)
    per_sample = jnp.mean(per_elem, axis=tuple(range(1, per_elem.ndim)))
    return jnp.mean(per_sample) if average else per_sample


LOSSES = {
    "lsep": lsep_loss_stable,
    "lsep_naive": lsep_loss,
    "bce": binary_cross_entropy,
    "focal": focal_loss,
}


def make_loss(name: str):
    try:
        return LOSSES[name]
    except KeyError:
        raise ValueError(f"unknown loss {name!r}; options: {sorted(LOSSES)}")
