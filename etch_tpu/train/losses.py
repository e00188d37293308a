"""Training losses (reference src/train.py:81-101).

  direction:  1 - cosine(gt_vectors, pred_directions), mean
  magnitude:  MSE(|gt_vectors| * scale_magnitude, pred_magnitudes)
  confidence: MSE(pred_confidences, gt_confidences)
  part_label: cross-entropy(pred_logits, gt_labels)
All multiplied by their configured weights and summed.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import optax

from etch_tpu.utils.config import EtchConfig


def compute_losses(
    cfg: EtchConfig,
    results: Dict[str, jnp.ndarray],
    vectors: jnp.ndarray,       # (B, N, 3) gt tightness vectors
    confidences: jnp.ndarray,   # (B, N, 1)
    labels: jnp.ndarray,        # (B, N) int
) -> Dict[str, jnp.ndarray]:
    losses = {}
    if "direction" in results:
        pred = results["direction"]
        dot = jnp.sum(vectors * pred, axis=-1)
        denom = (
            jnp.linalg.norm(vectors, axis=-1) * jnp.linalg.norm(pred, axis=-1)
        )
        # torch cosine_similarity clamps the denominator at eps=1e-8
        cos = dot / jnp.maximum(denom, 1e-8)
        losses["direction_loss"] = jnp.mean(1.0 - cos) * cfg.direction_w
    if "magnitude" in results:
        norms = jnp.linalg.norm(vectors, axis=-1, keepdims=True)
        losses["magnitude_loss"] = (
            jnp.mean((norms * cfg.scale_magnitude - results["magnitude"]) ** 2)
            * cfg.magnitude_w
        )
    if "confidences" in results:
        losses["confidence_loss"] = (
            jnp.mean((results["confidences"] - confidences) ** 2)
            * cfg.confidence_w
        )
    if "part_labels" in results:
        ce = optax.softmax_cross_entropy_with_integer_labels(
            results["part_labels"], labels
        )
        losses["part_label_loss"] = jnp.mean(ce) * cfg.part_label_w
    losses["all_loss"] = sum(
        v for k, v in losses.items() if k != "all_loss"
    )
    return losses
