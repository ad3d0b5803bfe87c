"""TrainState and optimizer/schedule factories (optax).

Replaces the reference's per-script optimizer plumbing with exact-semantics
optax chains:

- ``sgd_nesterov`` — torch ``SGD(lr, weight_decay, momentum, nesterov=True)``
  (``Our_UNet/src/train.py:431-453``): L2 decay added to the gradient, then a
  nesterov momentum trace, then -lr scaling.
- ``adam_l2`` — torch ``Adam(lr=1e-3, weight_decay=1e-5)``
  (``reconstruction/src/train.py:377-396``): L2 decay added to the gradient
  *before* the Adam moments (torch Adam is not AdamW).
- ``poly_lr`` — nnU-Net polynomial ``base*(1 - epoch/max)^0.9`` stepped once
  per epoch (``Our_UNet/src/train.py:456-477``).
- ``cosine_lr`` — torch ``CosineAnnealingLR(T_max, eta_min=1e-6)``
  (``reconstruction/src/train.py:399-417``).

The epoch-level LR is injected via ``optax.inject_hyperparams``, so the jitted
step never recompiles: the loop rewrites the learning-rate leaf in the
optimizer state between epochs (``set_learning_rate``).

``frozen_labels`` implements the transfer recipe's frozen encoder: the
reference sets ``requires_grad=False`` on all encoder params
(``transfer_learning/models/unet.py:450-453``); here the equivalent is an
``optax.multi_transform`` that maps the encoder sub-tree to ``set_to_zero``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def _sgd_chain(learning_rate: float, weight_decay: float, momentum: float):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=True),
        optax.scale_by_learning_rate(learning_rate),
    )


def _adam_chain(learning_rate: float, weight_decay: float):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(learning_rate),
    )


def sgd_nesterov(
    learning_rate: float = 5e-3,
    weight_decay: float = 1e-4,
    momentum: float = 0.99,
) -> optax.GradientTransformation:
    return optax.inject_hyperparams(_sgd_chain)(
        learning_rate=learning_rate, weight_decay=weight_decay, momentum=momentum
    )


def adam_l2(
    learning_rate: float = 1e-3, weight_decay: float = 1e-5
) -> optax.GradientTransformation:
    return optax.inject_hyperparams(_adam_chain)(
        learning_rate=learning_rate, weight_decay=weight_decay
    )


def frozen_labels(params: Any, frozen_prefixes: Sequence[str]) -> Any:
    """Label tree: 'freeze' for top-level keys in ``frozen_prefixes``."""
    if isinstance(params, FrozenDict):
        params = params.unfreeze()

    def label_subtree(key, subtree):
        lbl = "freeze" if key in frozen_prefixes else "train"
        return jax.tree.map(lambda _: lbl, subtree)

    return {k: label_subtree(k, v) for k, v in params.items()}


def with_frozen(
    tx: optax.GradientTransformation, params: Any, frozen_prefixes: Sequence[str]
) -> optax.GradientTransformation:
    """Wrap an optimizer so the given top-level param sub-trees never update."""
    labels = frozen_labels(params, frozen_prefixes)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


def poly_lr(base_lr: float, max_epochs: int, power: float = 0.9) -> Callable[[int], float]:
    def schedule(epoch: int) -> float:
        return base_lr * (1.0 - epoch / max_epochs) ** power

    return schedule


def cosine_lr(base_lr: float, t_max: int, eta_min: float = 1e-6) -> Callable[[int], float]:
    def schedule(epoch: int) -> float:
        return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * epoch / t_max)) / 2

    return schedule


def _find_hyperparams(opt_state: Any) -> Any:
    """Locate the InjectHyperparamsState, possibly under multi_transform."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if hasattr(opt_state, "inner_states"):  # MultiTransformState
        inner = opt_state.inner_states.get("train")
        state = inner.inner_state if hasattr(inner, "inner_state") else inner
        if hasattr(state, "hyperparams"):
            return state
    raise ValueError("No inject_hyperparams state found in optimizer state")


def get_learning_rate(opt_state: Any) -> float:
    return float(_find_hyperparams(opt_state).hyperparams["learning_rate"])


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Return a copy of ``opt_state`` with the injected learning rate set."""

    def rewrite(state):
        hp = dict(state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
        return state._replace(hyperparams=hp) if hasattr(state, "_replace") else state.replace(hyperparams=hp)

    if hasattr(opt_state, "hyperparams"):
        return rewrite(opt_state)
    if hasattr(opt_state, "inner_states"):
        inner_states = dict(opt_state.inner_states)
        inner = inner_states["train"]
        if hasattr(inner, "inner_state"):
            inner_states["train"] = inner._replace(inner_state=rewrite(inner.inner_state))
        else:
            inner_states["train"] = rewrite(inner)
        return opt_state._replace(inner_states=inner_states)
    raise ValueError("No inject_hyperparams state found in optimizer state")


def create_train_state(
    model,
    rng: jax.Array,
    sample_batch: Any,
    tx: optax.GradientTransformation,
    clip_features: Optional[jax.Array] = None,
) -> TrainState:
    """Initialize params + optimizer state for a model on a sample batch."""
    if clip_features is not None:
        variables = model.init(rng, sample_batch, clip_features)
    else:
        variables = model.init(rng, sample_batch)
    params = variables["params"]
    if isinstance(params, FrozenDict):
        params = params.unfreeze()
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
