"""Host-side training loops: standard, validated, and OFA supernet variants.

Re-design of guided_diffusion/train_util.py:67-712. The device work (loss,
grads, optimizer, EMA) lives in the jitted step from train.state; this layer
owns data iteration, timestep sampling, logging (loss quartiles,
train_util.py:816-858), checkpointing, and the OFA respacing curricula:

  * TrainLoop          — standard training on the full schedule
  * ofa_tables_fn      — OFA_TrainLoop's random 4-section respacing per step
                         (train_util.py:410-530)
  * ofa_random_select  — largest / 2x random / smallest-subset sandwich per
                         step (OFA_TrainLoop_random_select,
                         train_util.py:532-712)
"""

from __future__ import annotations

import random as pyrandom
import time
from typing import Callable, Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..schedules import ScheduleTables, build_base_tables, build_tables
from ..utils import logger
from ..utils.checkpoint import (find_latest_checkpoint, load_tree,
                                parse_step_from_filename, save_tree)
from .resample import UniformSampler
from .state import TrainState

__all__ = ["TrainLoop", "resume_train_state", "ofa_tables_fn",
           "ofa_random_select_tables_fn"]


def resume_train_state(state: TrainState, path_or_dir: str,
                       device_put_fn: Optional[Callable] = None) -> TrainState:
    """Resume model/EMA/optimizer from own-format msgpack checkpoints.

    ``path_or_dir`` is either a model checkpoint file or a directory holding
    model{step}.msgpack / ema_{rate}_{step}.msgpack / opt{step}.msgpack (the
    naming TrainLoop.save writes). The step counter is parsed from the
    filename; missing EMA/opt files fall back to the loaded model params /
    fresh optimizer with a logged warning — the reference resume semantics
    (train_util.py:124-165,780-792). ``device_put_fn`` (e.g. mesh
    replication) is applied to every loaded tree.
    """
    import os

    if os.path.isdir(path_or_dir):
        found = find_latest_checkpoint(path_or_dir)
        if found is None:
            raise FileNotFoundError(
                f"no model*.msgpack checkpoint in {path_or_dir}")
        model_path, step = found
    else:
        model_path = path_or_dir
        step = parse_step_from_filename(os.path.basename(model_path))
    ckpt_dir = os.path.dirname(os.path.abspath(model_path))
    put = device_put_fn or (lambda t: t)

    logger.log(f"resuming model from {model_path} at step {step}")
    params = put(load_tree(model_path, jax.device_get(state.params)))

    opt_path = os.path.join(ckpt_dir, f"opt{step:06d}.msgpack")
    if os.path.exists(opt_path):
        opt_state = put(load_tree(opt_path, jax.device_get(state.opt_state)))
    else:
        logger.log(f"warning: {opt_path} not found, keeping fresh optimizer")
        opt_state = state.opt_state

    emas = []
    for rate, etree in zip(state.ema_rates, state.ema_params):
        ema_path = os.path.join(ckpt_dir, f"ema_{rate}_{step:06d}.msgpack")
        if os.path.exists(ema_path):
            emas.append(put(load_tree(ema_path, jax.device_get(etree))))
        else:
            logger.log(f"warning: {ema_path} not found, seeding EMA from "
                       "model params")
            emas.append(jax.tree_util.tree_map(lambda x: x, params))
    return state.replace(step=jnp.asarray(step, jnp.int32), params=params,
                         opt_state=opt_state, ema_params=tuple(emas))


class TrainLoop:
    """run_loop() drives step(state, tables, batch, t, w, rng).

    tables_fn(step, rng) -> ScheduleTables lets OFA variants re-respace per
    step; the default returns the full base schedule. NB: varying K across
    steps triggers one XLA compile per distinct K (bucket your section
    counts).
    """

    def __init__(self, *, state: TrainState, step_fn: Callable,
                 data: Iterator[Dict[str, np.ndarray]],
                 schedule_sampler=None,
                 tables: Optional[ScheduleTables] = None,
                 tables_fn: Optional[Callable] = None,
                 batch_size: int, lr_anneal_steps: int = 0,
                 log_interval: int = 10, save_interval: int = 10000,
                 save_dir: Optional[str] = None,
                 ema_rates: Optional[Sequence[float]] = None,
                 val_fn: Optional[Callable] = None, val_interval: int = 0,
                 seed: int = 0):
        self.state = state
        self.step_fn = step_fn
        self.data = data
        self.tables = tables if tables is not None else build_base_tables()
        self.tables_fn = tables_fn
        self.schedule_sampler = schedule_sampler or UniformSampler(
            self.tables.num_steps)
        self.batch_size = batch_size
        self.lr_anneal_steps = lr_anneal_steps
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.save_dir = save_dir
        # default to the state's own rates so save() filenames always match
        # the trees they hold
        self.ema_rates = tuple(ema_rates) if ema_rates is not None \
            else tuple(state.ema_rates)
        # periodic validation (e.g. FID over EMA params) — the TrainValLoop
        # capability (train_util.py:277-408)
        self.val_fn = val_fn
        self.val_interval = val_interval
        self.np_rng = np.random.RandomState(seed)
        self.py_rng = pyrandom.Random(seed)
        self.step = int(self.state.step)

    def run_loop(self, max_steps: Optional[int] = None) -> TrainState:
        while (not self.lr_anneal_steps or self.step < self.lr_anneal_steps):
            if max_steps is not None and self.step >= max_steps:
                break
            self.run_step(next(self.data))
            if self.log_interval and self.step % self.log_interval == 0:
                logger.dumpkvs()
            if self.save_interval and self.step and \
                    self.step % self.save_interval == 0:
                self.save()
            if (self.val_fn is not None and self.val_interval
                    and self.step % self.val_interval == 0):
                for k, v in self.val_fn(self.state).items():
                    logger.logkv(f"val_{k}", v)
                logger.dumpkvs()
        if self.save_interval and self.step % self.save_interval != 0:
            self.save()
        return self.state

    def run_step(self, batch: Dict[str, np.ndarray]) -> None:
        t0 = time.time()
        tables = self.tables
        if self.tables_fn is not None:
            tables = self.tables_fn(self.step, self.py_rng)
        sampler = self.schedule_sampler
        if tables.num_steps != sampler.num_steps:
            sampler = UniformSampler(tables.num_steps)
        t, weights = sampler.sample(self.batch_size, self.np_rng)
        self.state, metrics = self.step_fn(
            self.state, tables,
            {k: jnp.asarray(v) for k, v in batch.items()},
            jnp.asarray(t), jnp.asarray(weights),
            jax.random.key(self.py_rng.getrandbits(32)))
        self.step = int(self.state.step)
        per_ex = np.asarray(metrics.pop("per_example_loss"))
        # update the sampler actually used this step — under OFA respacing
        # the t indices live in the respaced [0, K) space, not the base
        # sampler's
        sampler.update_with_local_losses(t, per_ex)
        logger.logkv("step", self.step)
        logger.logkv("samples", self.step * self.batch_size)
        logger.logkv_mean("step_time", time.time() - t0)
        for k, v in metrics.items():
            logger.logkv_mean(k, float(v))
        # loss quartiles by diffusion time (log_loss_dict, train_util.py:816-858)
        quart = (np.asarray(t) * 4 // tables.num_steps)
        for q in range(4):
            if (quart == q).any():
                logger.logkv_mean(f"loss_q{q}", float(per_ex[quart == q].mean()))

    def save(self) -> None:
        if not self.save_dir:
            return
        logger.log(f"saving model at step {self.step}...")
        save_tree(f"{self.save_dir}/model{self.step:06d}.msgpack",
                  self.state.params)
        for rate, ema in zip(self.ema_rates, self.state.ema_params):
            save_tree(f"{self.save_dir}/ema_{rate}_{self.step:06d}.msgpack", ema)
        save_tree(f"{self.save_dir}/opt{self.step:06d}.msgpack",
                  self.state.opt_state)


def ofa_tables_fn(base_schedule: str = "cosine", base_num_steps: int = 1000,
                  sections: int = 4, steps_per_section: Sequence[int] = (2, 4, 6, 8)):
    """Random k-per-section respacing each step (OFA_TrainLoop,
    train_util.py:410-530). Keeping steps_per_section a small fixed menu
    bounds the number of distinct K (and thus of XLA compilations)."""

    def fn(step: int, rng: pyrandom.Random) -> ScheduleTables:
        counts = [rng.choice(list(steps_per_section)) for _ in range(sections)]
        return build_tables(",".join(map(str, counts)),
                            base_schedule=base_schedule,
                            base_num_steps=base_num_steps)

    return fn


def ofa_random_select_tables_fn(base_schedule: str = "cosine",
                                base_num_steps: int = 1000,
                                min_steps: int = 4):
    """Cycle largest -> random -> random -> smallest subsets per step
    (OFA_TrainLoop_random_select.forward_backward, train_util.py:639-712)."""

    def fn(step: int, rng: pyrandom.Random) -> ScheduleTables:
        phase = step % 4
        if phase == 0:
            return build_base_tables(base_schedule, base_num_steps)
        if phase == 3:
            k = min_steps
        else:
            k = rng.choice([25, 50, 100, 250])
        steps = sorted(rng.sample(range(base_num_steps), k))
        return build_tables(steps, base_schedule=base_schedule,
                            base_num_steps=base_num_steps)

    return fn
