"""Timestep samplers for training (importance sampling over t).

Equivalent of guided_diffusion/resample.py:8-154: UniformSampler and
LossSecondMomentResampler. The loss-aware sampler keeps its history on host
(numpy) and expects per-step losses gathered across data-parallel workers by
the train loop (the reference all_gathers via torch.distributed,
resample.py:83-104; here the train step psums them as part of the jitted
update, so the host update is collective-free).
"""

from __future__ import annotations

import numpy as np

__all__ = ["UniformSampler", "LossSecondMomentResampler",
           "create_named_schedule_sampler"]


class UniformSampler:
    def __init__(self, num_steps: int):
        self.num_steps = num_steps

    def weights(self) -> np.ndarray:
        return np.ones(self.num_steps, dtype=np.float64)

    def sample(self, batch: int, rng: np.random.RandomState):
        w = self.weights()
        p = w / w.sum()
        t = rng.choice(self.num_steps, size=(batch,), p=p)
        weights = 1.0 / (self.num_steps * p[t])
        return t.astype(np.int32), weights.astype(np.float32)

    def update_with_losses(self, ts: np.ndarray, losses: np.ndarray) -> None:
        pass

    def update_with_local_losses(self, ts: np.ndarray, losses: np.ndarray) -> None:
        """No history to update — and therefore NO collectives. The
        reference guards the gather with isinstance(LossAwareSampler)
        (train_util.py:519-522); running two process_allgathers per train
        step just to discard the result would cost two synchronous host
        round-trips on every multi-process step."""


class LossSecondMomentResampler(UniformSampler):
    """p_t ∝ sqrt(E[loss_t^2]) with uniform warmup and mixing
    (resample.py:124-154)."""

    def __init__(self, num_steps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        super().__init__(num_steps)
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros((num_steps, history_per_term), np.float64)
        self._loss_counts = np.zeros(num_steps, np.int64)

    def update_with_local_losses(self, ts: np.ndarray, losses: np.ndarray) -> None:
        """Gather per-timestep losses from every data-parallel process before
        updating the history (reference resample.py:71-104: dist.all_gather
        of batch sizes + losses). With a single process this is the identity;
        multi-host, every rank sees the same gathered stream so the sampling
        distribution stays identical across ranks. jax data shards are
        equal-sized by construction, so the reference's ragged-batch-size
        gather is unnecessary."""
        from ..parallel.dist import all_gather_host

        gathered_ts = np.asarray(all_gather_host(np.asarray(ts))).reshape(-1)
        gathered_losses = np.asarray(
            all_gather_host(np.asarray(losses))).reshape(-1)
        self.update_with_losses(gathered_ts, gathered_losses)

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones(self.num_steps, dtype=np.float64)
        w = np.sqrt(np.mean(self._loss_history ** 2, axis=-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def update_with_losses(self, ts, losses) -> None:
        for t, loss in zip(np.asarray(ts), np.asarray(losses)):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1


def create_named_schedule_sampler(name: str, num_steps: int):
    if name == "uniform":
        return UniformSampler(num_steps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_steps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
