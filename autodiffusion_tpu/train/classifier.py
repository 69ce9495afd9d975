"""Noisy-classifier training (the ADM-G guidance classifier).

Re-design of scripts/classifier_train.py: train EncoderUNetModel to
classify q_sample-noised images at random timesteps, so its gradients can
steer sampling (classifier guidance). AdamW, optional random-crop
augmentation handled by the data layer, top-1/top-5 logging.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..samplers.diffusion import q_sample
from ..schedules import ScheduleTables
from .state import TrainState

__all__ = ["make_classifier_train_step", "classifier_accuracy"]


def classifier_accuracy(logits: jnp.ndarray, y: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    top1 = (logits.argmax(-1) == y).mean()
    k = min(5, logits.shape[-1])
    topk = (jax.lax.top_k(logits, k)[1] == y[:, None]).any(-1).mean()
    return {"acc@1": top1, "acc@5": topk}


def make_classifier_train_step(classifier_apply: Callable, *,
                               noised: bool = True) -> Callable:
    """step(state, tables, batch{x,y}, t, rng) -> (state, metrics).

    ``noised`` selects training on q_sample-noised inputs (the guidance
    classifier) vs clean images (classifier_train.py --noised flag).
    """

    def loss_fn(params, tables: ScheduleTables, x, y, t, rng):
        if noised:
            noise = jax.random.normal(rng, x.shape)
            x = q_sample(tables, x, t, noise)
            t_orig = tables.timestep_map[t].astype(jnp.float32)
        else:
            t_orig = jnp.zeros((x.shape[0],), jnp.float32)
        logits = classifier_apply(params, x, t_orig)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return loss, logits

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, tables: ScheduleTables, batch: Dict,
             t: jnp.ndarray, rng) -> Tuple[TrainState, Dict]:
        (loss, logits), grads = grad_fn(state.params, tables, batch["x"],
                                        batch["y"], t, rng)
        state = state.apply_gradients(grads)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads),
                   # t-samplers expect per-example losses
                   "per_example_loss": optax.softmax_cross_entropy_with_integer_labels(
                       logits, batch["y"])}
        metrics.update(classifier_accuracy(logits, batch["y"]))
        return state, metrics

    return step
