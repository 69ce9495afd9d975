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
                 grad_fn: Optional[Callable] = None,
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
        # grads-only step for the OFA random-select sandwich (tables_fn
        # returning a LIST of schedules per step); see
        # make_train_step(...).grads_and_metrics
        self.grad_fn = grad_fn
        self._apply_fn = jax.jit(lambda st, g: st.apply_gradients(g))
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

    @staticmethod
    def _local_t_loss(t: np.ndarray, per_ex_g):
        """This process's (t, per-example-loss) rows from a possibly
        data-sharded [B] loss array. np.asarray on a multi-process global
        array raises, and since every rank draws the identical global t,
        feeding the full array to update_with_local_losses would insert
        each loss world_size times after its cross-process gather. Shards
        replicated over the model axis are deduped by slice."""
        t = np.asarray(t)
        if jax.process_count() > 1 and hasattr(per_ex_g, "addressable_shards"):
            seen, t_loc, l_loc = set(), [], []
            for s in per_ex_g.addressable_shards:
                sl = s.index[0]
                key = (sl.start, sl.stop)
                if key in seen:
                    continue
                seen.add(key)
                t_loc.append(t[sl])
                l_loc.append(np.asarray(s.data))
            return np.concatenate(t_loc), np.concatenate(l_loc)
        return t, np.asarray(per_ex_g)

    def run_step(self, batch: Dict[str, np.ndarray]) -> None:
        t0 = time.time()
        tables = self.tables
        if self.tables_fn is not None:
            tables = self.tables_fn(self.step, self.py_rng)
        if isinstance(tables, (list, tuple)):
            return self._run_sandwich_step(list(tables), batch, t0)
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
        t_used, per_ex = self._local_t_loss(t, metrics.pop("per_example_loss"))
        # update the sampler actually used this step — under OFA respacing
        # the t indices live in the respaced [0, K) space, not the base
        # sampler's
        sampler.update_with_local_losses(t_used, per_ex)
        logger.logkv("step", self.step)
        logger.logkv("samples", self.step * self.batch_size)
        logger.logkv_mean("step_time", time.time() - t0)
        for k, v in metrics.items():
            logger.logkv_mean(k, float(v))
        # loss quartiles by diffusion time (log_loss_dict, train_util.py:816-858)
        quart = (t_used * 4 // tables.num_steps)
        for q in range(4):
            if (quart == q).any():
                logger.logkv_mean(f"loss_q{q}", float(per_ex[quart == q].mean()))

    def _run_sandwich_step(self, tlist, batch: Dict[str, np.ndarray],
                           t0: float) -> None:
        """ONE optimizer update from gradients accumulated over several
        respacings (the OFA random-select sandwich,
        OFA_TrainLoop_random_select.forward_backward train_util.py:668-712:
        mp_trainer.zero_grad once, backward per schedule, optimize once).
        Gradients are averaged over the schedules — the repo's convention,
        as with microbatches, so the effective lr is comparable across
        modes (the reference sums)."""
        if self.grad_fn is None:
            raise ValueError(
                "tables_fn returned a list of schedules (sandwich mode) but "
                "TrainLoop was built without grad_fn; pass "
                "grad_fn=jax.jit(make_train_step(...).grads_and_metrics)")
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        total = None
        for tb in tlist:
            sampler = self.schedule_sampler
            if tb.num_steps != sampler.num_steps:
                sampler = UniformSampler(tb.num_steps)
            t, w = sampler.sample(self.batch_size, self.np_rng)
            grads, metrics = self.grad_fn(
                self.state.params, tb, jbatch, jnp.asarray(t),
                jnp.asarray(w), jax.random.key(self.py_rng.getrandbits(32)))
            total = grads if total is None else jax.tree_util.tree_map(
                jnp.add, total, grads)
            t_used, per_ex = self._local_t_loss(
                t, metrics.pop("per_example_loss"))
            sampler.update_with_local_losses(t_used, per_ex)
            # the reference's per-schedule log line (diffusion_len_<name>)
            logger.logkv_mean(f"loss_len{tb.num_steps}",
                              float(metrics["loss"]))
        total = jax.tree_util.tree_map(lambda g: g / len(tlist), total)
        self.state = self._apply_fn(self.state, total)
        self.step = int(self.state.step)
        logger.logkv("step", self.step)
        logger.logkv("samples", self.step * self.batch_size * len(tlist))
        logger.logkv_mean("step_time", time.time() - t0)

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


def _ofa_section_counts(rng: pyrandom.Random, menu: Sequence[int],
                        sections: int) -> list:
    """Per-section step counts with the reference's coupling: the middle
    sections get at least as many steps as their outer neighbors
    (forward_backward redraws until p2 >= p1 and p3 >= p4,
    train_util.py:470-477)."""
    menu = list(menu)
    counts = [rng.choice(menu) for _ in range(sections)]
    if sections == 4:
        while counts[1] < counts[0]:
            counts[1] = rng.choice(menu)
        while counts[2] < counts[3]:
            counts[2] = rng.choice(menu)
    return counts


def ofa_tables_fn(base_schedule: str = "cosine", base_num_steps: int = 1000,
                  sections: int = 4, steps_per_section: Sequence[int] = (2, 4, 6, 8)):
    """Random k-per-section respacing each step (OFA_TrainLoop,
    train_util.py:410-530). Keeping steps_per_section a small fixed menu
    bounds the number of distinct K (and thus of XLA compilations)."""

    def fn(step: int, rng: pyrandom.Random) -> ScheduleTables:
        counts = _ofa_section_counts(rng, steps_per_section, sections)
        return build_tables(",".join(map(str, counts)),
                            base_schedule=base_schedule,
                            base_num_steps=base_num_steps)

    return fn


def ofa_random_select_tables_fn(base_schedule: str = "cosine",
                                base_num_steps: int = 1000,
                                k_menu: Sequence[int] = (25, 50, 100, 250)):
    """The sandwich rule: largest + 2 random + smallest subsets trained as
    ONE accumulated optimizer update per step
    (OFA_TrainLoop_random_select.forward_backward, train_util.py:639-712).
    Returns a LIST of four ScheduleTables per call; TrainLoop accumulates
    their gradients before applying (run_step sandwich path).

    TPU adaptation, documented deviation: the reference draws the random
    subsets' size uniformly in [1, max_sample_step=400] — up to 400
    distinct K, i.e. up to 400 XLA compilations. Here K is bucketed to
    ``k_menu`` (the steps are still uniform per bucketed section, matching
    the reference's stratified draw); the smallest subset is the
    reference's {3 random} | {T-1} — the max-noise step every sampling
    run starts from is always trained — drawn WITHOUT replacement so its
    K is a constant 4."""

    def fn(step: int, rng: pyrandom.Random):
        out = [build_base_tables(base_schedule, base_num_steps)]   # largest
        for _ in range(2):                                          # random
            k = rng.choice(list(k_menu))
            # stratified like the reference: one step per selected section
            # (randrange's exclusive bound keeps sections disjoint, so K is
            # exactly k — the reference's inclusive randint can collide at
            # section boundaries, which would make K vary and recompile)
            skip = base_num_steps // k
            steps = [rng.randrange(i * skip, (i + 1) * skip)
                     for i in range(k)]
            out.append(build_tables(steps, base_schedule=base_schedule,
                                    base_num_steps=base_num_steps))
        smallest = sorted(rng.sample(range(1, base_num_steps - 1), 3)
                          + [base_num_steps - 1])
        out.append(build_tables(smallest, base_schedule=base_schedule,
                                base_num_steps=base_num_steps))
        return out

    return fn
