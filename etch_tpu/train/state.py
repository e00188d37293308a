"""Train state and jitted train step.

Replaces the reference loop body (`src/train.py:60-140`): Adam(1e-4), loss
sum, NaN-loss skip and NaN-gradient zeroing (train.py:111-123), now expressed
as a single jitted step with BatchNorm batch_stats threading and data-parallel
sharding over a 1-D mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from etch_tpu.models.etch_net import EtchNet
from etch_tpu.train.losses import compute_losses
from etch_tpu.utils.config import EtchConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    cfg: EtchConfig,
    rng: jax.Array,
    example_points: jnp.ndarray,
    tx: Optional[optax.GradientTransformation] = None,
) -> Tuple[EtchNet, TrainState, optax.GradientTransformation]:
    """Build model/state/optimizer.  `tx` overrides the default Adam(cfg.lr)
    (reference uses plain Adam, src/train.py:210; overfit-evidence tooling
    passes a cosine-decayed Adam to converge harder on a fixed batch)."""
    model = EtchNet(cfg=cfg)
    # jit the init: an eager init dispatches every op individually, which is
    # pathological over the axon remote-TPU tunnel (~8 ms per round-trip)
    variables = jax.jit(lambda r, p: model.init(r, p, train=True))(
        rng, example_points
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    if tx is None:
        tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )
    return model, state, tx


def _guarded_update(tx, loss, grads, state: TrainState, new_stats) -> TrainState:
    """Apply the optimizer update, skipping it ENTIRELY on a non-finite loss.

    The reference `continue`s past `optimizer.step()` on a NaN loss
    (src/train.py:111-123), so neither params nor Adam moments/bias-correction
    step may move; NaN gradients on a *finite*-loss batch are zeroed
    (train.py:119-123 equivalent).  BatchNorm running stats still advance:
    torch BN updates them during the forward pass, before the NaN check.
    """
    grads = jax.tree.map(jnp.nan_to_num, grads)
    loss_ok = jnp.isfinite(loss)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    keep = lambda new, old: jax.tree.map(
        lambda n, o: jnp.where(loss_ok, n, o), new, old
    )
    return TrainState(
        params=keep(new_params, state.params),
        batch_stats=new_stats,
        opt_state=keep(new_opt, state.opt_state),
        step=state.step + 1,
    )


def make_train_step(model: EtchNet, tx: optax.GradientTransformation, cfg: EtchConfig):
    """Build the jitted train step.  Shard the batch over a data mesh before
    calling; XLA inserts the gradient collectives."""

    def loss_fn(params, batch_stats, batch):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["hitpts"],
            train=True,
            mutable=["batch_stats"],
        )
        losses = compute_losses(
            cfg, outputs, batch["vectors"], batch["confidences"], batch["labels"]
        )
        return losses["all_loss"], (losses, mutated["batch_stats"])

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        return _guarded_update(tx, loss, grads, state, new_stats), losses

    return train_step


def make_train_step_dynamic(
    model: EtchNet, tx: optax.GradientTransformation, cfg: EtchConfig
):
    """Train step with dynamic label/confidence regeneration (reference
    train_mixed.py:124-158): labels come from the nearest marker to the
    *predicted* inner point, confidence = exp(-10 * distance).

    The reference does this on the host with a per-batch cKDTree loop; over
    only 86 markers a brute-force argmin on device is cheaper and keeps the
    step fully jitted.
    """

    def loss_fn(params, batch_stats, batch):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["hitpts"],
            train=True,
            mutable=["batch_stats"],
        )
        inner = jax.lax.stop_gradient(
            batch["hitpts"]
            - outputs["direction"] * outputs["magnitude"] / cfg.scale_magnitude
        )
        markers = batch["markers_positions"]            # (B, M, 3)
        d = jnp.linalg.norm(
            inner[:, :, None, :] - markers[:, None, :, :], axis=-1
        )                                               # (B, N, M)
        labels = jnp.argmin(d, axis=-1)
        conf = jnp.exp(-10.0 * jnp.min(d, axis=-1))[..., None]
        losses = compute_losses(
            cfg, outputs, batch["vectors"], conf, labels
        )
        return losses["all_loss"], (losses, mutated["batch_stats"])

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        return _guarded_update(tx, loss, grads, state, new_stats), losses

    return train_step


def make_eval_step(model: EtchNet):
    @jax.jit
    def eval_step(state: TrainState, hitpts: jnp.ndarray):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            hitpts,
            train=False,
        )

    return eval_step
