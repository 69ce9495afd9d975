"""Train state and the jitted train step (optax AdamW + EMA, bf16-native).

Replaces guided_diffusion/train_util.py:100-275 and fp16_util.py: DDP
wrapping becomes mesh sharding; fp16 master-params/dynamic loss scaling are
unnecessary under bfloat16 (params fp32, compute bf16); EMA update is
update_ema (nn.py:55-65) as an optax-style tree op. Microbatch gradient
accumulation (train_util.py:194-234 no_sync) is a lax.scan over microbatch
slices inside one jit.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..samplers.diffusion import ModelMeanType, ModelVarType
from ..schedules import ScheduleTables
from .losses import LossType, training_losses

__all__ = ["TrainState", "create_train_state", "make_train_step"]


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Tuple[Any, ...]          # one tree per EMA rate
    ema_rates: Tuple[float, ...] = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        ema = tuple(
            jax.tree_util.tree_map(
                lambda e, p, r=rate: e * r + p * (1 - r), etree, params)
            for rate, etree in zip(self.ema_rates, self.ema_params))
        return self.replace(step=self.step + 1, params=params,
                            opt_state=opt_state, ema_params=ema)


def create_train_state(params, *, lr: float = 1e-4, weight_decay: float = 0.0,
                       ema_rates: Sequence[float] = (0.9999,),
                       grad_clip: Optional[float] = None,
                       lr_anneal_steps: int = 0) -> TrainState:
    """AdamW matching train_util.py's opt config, with optional linear lr
    anneal (train_util.py:288-295) and grad clipping."""
    sched = (optax.linear_schedule(lr, 0.0, lr_anneal_steps)
             if lr_anneal_steps else lr)
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(sched, weight_decay=weight_decay))
    tx = optax.chain(*chain)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
        ema_params=tuple(jax.tree_util.tree_map(lambda x: x, params)
                         for _ in ema_rates),
        ema_rates=tuple(ema_rates), tx=tx)


def make_train_step(model_apply: Callable, *,
                    mean_type: ModelMeanType = ModelMeanType.EPSILON,
                    var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
                    loss_type: str = LossType.MSE,
                    microbatches: int = 1,
                    class_cond: bool = False,
                    data_sharder: Optional[Callable] = None) -> Callable:
    """Build the jitted train step.

    step(state, tables, batch, t, loss_weights, rng) ->
        (state, metrics dict incl. per-example losses for the loss-aware
         t-sampler)

    batch: {"x": [B,H,W,C], optional "y": [B], optional "low_res":
    [B,h,w,C]}; B = microbatches * micro. A "low_res" key trains a
    SuperResModel on (low, high) pairs — the model signature becomes
    (x_t, t, low_res[, y]), matching SuperResModel.__call__ (the
    reference's super_res_train.py:91-101 load_superres_data path).
    Gradients are averaged over microbatches by a lax.scan (the no_sync
    accumulation of train_util.py:213-217); data-parallel reduction is
    implicit in jit once the batch carries a 'data' sharding.
    """

    def loss_fn(params, tables, x, y, low_res, t, w, rng):
        def model_fn(x_t, t_orig):
            a = [x_t, t_orig]
            if low_res is not None:
                a.append(low_res)
            if class_cond:
                a.append(y)
            return model_apply(params, *a)

        terms = training_losses(tables, model_fn, x, t, rng,
                                mean_type=mean_type, var_type=var_type,
                                loss_type=loss_type)
        loss = (terms["loss"] * w).mean()
        return loss, terms

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def grads_and_metrics(params, tables: ScheduleTables, batch: Dict,
                          t: jnp.ndarray, loss_weights: jnp.ndarray, rng):
        x = batch["x"]
        y = batch.get("y")
        low_res = batch.get("low_res")
        if data_sharder is not None:
            x = data_sharder(x)
            if low_res is not None:
                low_res = data_sharder(low_res)
        b = x.shape[0]
        if b % microbatches:
            raise ValueError(
                f"batch size {b} does not divide into {microbatches} "
                f"microbatches; pick --microbatch so it divides the batch "
                "(the jitted scan needs equal slices — the reference's "
                "ragged tail microbatch is not representable)")
        micro = b // microbatches

        def resh(a):
            return None if a is None else a.reshape((microbatches, micro) + a.shape[1:])

        xs = (resh(x), resh(y), resh(low_res), resh(t), resh(loss_weights),
              jax.random.split(rng, microbatches))

        def micro_step(carry, inp):
            xi, yi, li, ti, wi, ri = inp
            (loss, terms), grads = grad_fn(params, tables, xi, yi, li, ti,
                                           wi, ri)
            acc = jax.tree_util.tree_map(jnp.add, carry, grads)
            return acc, (loss, terms)

        zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        if microbatches == 1:
            (loss, terms), grads = grad_fn(params, tables, x, y, low_res, t,
                                           loss_weights, rng)
            losses, all_terms = loss[None], jax.tree_util.tree_map(
                lambda a: a[None], terms)
        else:
            grads, (losses, all_terms) = jax.lax.scan(micro_step, zero, xs)
            grads = jax.tree_util.tree_map(lambda g: g / microbatches, grads)

        metrics = {
            "loss": losses.mean(),
            "grad_norm": optax.global_norm(grads),
            "per_example_loss": all_terms["loss"].reshape(-1),
        }
        for k in ("mse", "vb"):
            if k in all_terms:
                metrics[k] = all_terms[k].mean()
        return grads, metrics

    def step(state: TrainState, tables: ScheduleTables, batch: Dict,
             t: jnp.ndarray, loss_weights: jnp.ndarray, rng) -> Tuple[TrainState, Dict]:
        grads, metrics = grads_and_metrics(state.params, tables, batch, t,
                                           loss_weights, rng)
        return state.apply_gradients(grads), metrics

    # expose the grads-only form for the OFA random-select sandwich: four
    # different-K schedules accumulate into ONE optimizer update
    # (OFA_TrainLoop_random_select.forward_backward, train_util.py:639-712);
    # different K means different compiled programs, so accumulation
    # happens across jit calls, not inside one
    step.grads_and_metrics = grads_and_metrics
    return step
