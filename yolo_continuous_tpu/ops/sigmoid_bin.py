"""SigmoidBin: bin-classification + residual scalar regression.

Parity target: ``losses/sigmoid_bin.py:6-96`` — used by the IBin head
(``nets/ibin.py:17-18``) to predict box w/h as 21-way bin classification
plus a within-bin residual.

Layout per value: ``[reg, bin_0 ... bin_{count-1}]`` (length = count + 1).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..losses.focal import bce_with_logits


@dataclass(frozen=True)
class SigmoidBinCfg:
    bin_count: int = 10
    vmin: float = 0.0
    vmax: float = 1.0
    reg_scale: float = 2.0
    use_loss_regression: bool = True
    use_fw_regression: bool = True
    bce_weight: float = 1.0
    smooth_eps: float = 0.0

    @property
    def length(self) -> int:
        return self.bin_count + 1

    @property
    def scale(self) -> float:
        return float(self.vmax - self.vmin)

    @property
    def step(self) -> float:
        return self.scale / self.bin_count

    def bins(self) -> jnp.ndarray:
        # bin centers; sigmoid_bin.py:33-38 (torch.range is endpoint-inclusive)
        start = self.vmin + (self.scale / 2.0) / self.bin_count
        end = self.vmax - (self.scale / 2.0) / self.bin_count
        n = self.bin_count
        return start + self.step * jnp.arange(n, dtype=jnp.float32)
        # note: torch.range(start, end+1e-4, step) yields exactly n values


def sigmoid_bin_decode(pred: jnp.ndarray, cfg: SigmoidBinCfg) -> jnp.ndarray:
    """Inference decode; sigmoid_bin.py:49-63.

    ``pred[..., 0]`` is assumed already sigmoided (the IBin head sigmoids
    the whole map first, nets/ibin.py:57).
    """
    bins = cfg.bins()
    pred_reg = (pred[..., 0] * cfg.reg_scale - cfg.reg_scale / 2.0) * cfg.step
    pred_bin = pred[..., 1:1 + cfg.bin_count]
    bin_idx = jnp.argmax(pred_bin, axis=-1)
    bin_bias = bins[bin_idx]
    result = pred_reg + bin_bias if cfg.use_fw_regression else bin_bias
    return jnp.clip(result, cfg.vmin, cfg.vmax)


def sigmoid_bin_training_loss(pred: jnp.ndarray, target: jnp.ndarray,
                              cfg: SigmoidBinCfg, mask=None):
    """BCE over bins + MSE on the regressed value; sigmoid_bin.py:65-96.

    pred: (..., length) raw logits; target: (...,) values in [vmin, vmax].
    mask: optional (...,) validity weights for the static-shape pipeline.
    Returns (loss scalar, decoded result).
    """
    bins = cfg.bins()
    sig = 1.0 / (1.0 + jnp.exp(-pred[..., 0]))
    pred_reg = (sig * cfg.reg_scale - cfg.reg_scale / 2.0) * cfg.step
    pred_bin = pred[..., 1:1 + cfg.bin_count]

    diff = jnp.abs(target[..., None] - bins)
    bin_idx = jnp.argmin(diff, axis=-1)
    bin_bias = jnp.asarray(bins)[bin_idx]
    result = pred_reg + bin_bias

    cp = 1.0 - 0.5 * cfg.smooth_eps
    cn = 0.5 * cfg.smooth_eps
    tbins = cn + (cp - cn) * _one_hot(bin_idx, cfg.bin_count)
    # pos_weight applies to the positive term (torch BCEWithLogitsLoss(pos_weight))
    bce = bce_with_logits(pred_bin, tbins)
    if cfg.bce_weight != 1.0:
        w = 1.0 + (cfg.bce_weight - 1.0) * tbins
        bce = bce * w
    mse = (result - target) ** 2

    if mask is None:
        loss_bin = jnp.mean(bce)
        loss_mse = jnp.mean(mse)
    else:
        m = mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        loss_bin = jnp.sum(bce * m[..., None]) / (denom * cfg.bin_count)
        loss_mse = jnp.sum(mse * m) / denom
    loss = loss_bin + (loss_mse if cfg.use_loss_regression else 0.0)
    return loss, jnp.clip(result, cfg.vmin, cfg.vmax)


def _one_hot(idx, n):
    return (idx[..., None] == jnp.arange(n)).astype(jnp.float32)
