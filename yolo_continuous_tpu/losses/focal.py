"""Focal / Quality-Focal wrappers around BCE-with-logits (functional).

Parity targets:
- ``losses/components/focal_loss.py:5-29``          FocalLoss
- ``losses/components/quality_focal_loss.py:5-28``  QFocalLoss

Both wrap an elementwise BCE; the reference wires QFocal around both the
cls and obj criteria (``losses/yolo_loss.py:47-48``). FocalLoss is part of
the capability surface even though the reference never calls it.
"""
from __future__ import annotations

import jax.numpy as jnp


def bce_with_logits(pred: jnp.ndarray, true: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCEWithLogits, numerically stable (torch formula)."""
    return jnp.clip(pred, 0, None) - pred * true + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def _safe_pow(x: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """x**gamma with a zero (not NaN) gradient at x == 0.

    For fractional gamma, jax grads of ``x ** gamma`` at x = 0 produce
    NaN (0 * inf from the exp/log expansion); the double-where keeps the
    value and gives the correct 0 subgradient for gamma > 1.
    """
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, safe ** gamma, 0.0)


def focal_loss(pred: jnp.ndarray, true: jnp.ndarray, gamma: float = 1.5,
               alpha: float = 0.25) -> jnp.ndarray:
    """Elementwise focal loss; focal_loss.py:18-22."""
    loss = bce_with_logits(pred, true)
    pred_prob = _sigmoid(pred)
    p_t = true * pred_prob + (1 - true) * (1 - pred_prob)
    alpha_factor = true * alpha + (1 - true) * (1 - alpha)
    modulating = _safe_pow(1.0 - p_t, gamma)
    return loss * alpha_factor * modulating


def qfocal_loss(pred: jnp.ndarray, true: jnp.ndarray, gamma: float = 1.5,
                alpha: float = 0.25) -> jnp.ndarray:
    """Elementwise quality focal loss; quality_focal_loss.py:18-21."""
    loss = bce_with_logits(pred, true)
    pred_prob = _sigmoid(pred)
    alpha_factor = true * alpha + (1 - true) * (1 - alpha)
    modulating = _safe_pow(jnp.abs(true - pred_prob), gamma)
    return loss * alpha_factor * modulating


def _sigmoid(x):
    # jax.nn.sigmoid: grad-safe at extreme logits (1/(1+exp(-x)) yields
    # inf/inf = NaN gradients once exp overflows)
    import jax
    return jax.nn.sigmoid(x)
