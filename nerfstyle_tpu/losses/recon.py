"""Reconstruction-stage losses.

Rebuild of the loss set assembled in ``Trainer.calc_loss``
(``/root/reference/trainers/base.py:251-304``): MSE/PSNR, class cross-entropy
with ignore_index=-1, sparsity, and weight regularization.  All pure jnp.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def cross_entropy_ignore(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = -1
) -> jnp.ndarray:
    """Mean CE over entries whose label != ignore_index (mirrors
    torch.nn.CrossEntropyLoss(ignore_index=-1), trainers/base.py:138)."""
    mask = labels != ignore_index
    safe_labels = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / denom


def sparsity_loss(sigmas: jnp.ndarray, exp_coeff: float) -> jnp.ndarray:
    """mean |1 - exp(-coeff * sigma)| (trainers/base.py:287-291)."""
    return jnp.mean(jnp.abs(1.0 - jnp.exp(-exp_coeff * sigmas)))


def weight_reg_loss(params: Dict[str, object], keywords: List[str] = ("net",)) -> jnp.ndarray:
    """Sum of L2 norms of params whose top-level key contains any keyword
    (trainers/base.py:293-299)."""
    total = 0.0
    for name, sub in params.items():
        if not any(kw in name for kw in keywords):
            continue
        for leaf in jax.tree_util.tree_leaves(sub):
            total = total + jnp.linalg.norm(leaf.reshape(-1))
    return total
