"""Candidate fitness: batched, vmapped FID evaluation on device.

The reference evaluates one candidate at a time — rebuild schedule, sample
num_samples images, run TF FID, repeat (search_imagenet64_classifier_
guidance.py:308-376). Here candidates are evaluated in *vectorized chunks*:
same-K candidates' ScheduleTables are stacked and the whole
(sample -> feature -> moment) pipeline is vmapped over the candidate axis,
giving the >=10x per-chip win targeted in BASELINE.json. The feature moments
are accumulated on device (FeatureStats); only the tiny (mu, sigma) pair and
the final scipy sqrtm run on host.

Generic over model family: the caller supplies
  payload_fn(candidate) -> pytree   (tables + any per-step masks/aux)
  sample_fn(payload, rng) -> uint8 [B, H, W, 3]   (jit/vmap-compatible)
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fid.stats import (FeatureStats, FIDStats, accumulate_stats,
                         finalize_stats, frechet_distance)
from ..utils import logger

__all__ = ["BatchedFIDFitness", "to_uint8"]


def to_uint8(samples: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float -> uint8, reference rounding
    (search_imagenet64_classifier_guidance.py:352-354)."""
    return jnp.clip((samples + 1) * 127.5, 0, 255).astype(jnp.uint8)


class BatchedFIDFitness:
    """fitness(list of candidates) -> list of FIDs.

    candidate_chunk bounds how many candidates run concurrently (vmap axis);
    num_samples images per candidate are generated in sample_fn-sized batches
    and streamed through feature_fn into running moments.
    """

    def __init__(self, *, payload_fn: Callable, sample_fn: Callable,
                 feature_fn: Callable, ref_stats: FIDStats,
                 num_samples: int, batch_size: int,
                 candidate_chunk: int = 8, feature_dim: int = 2048,
                 seed: int = 0,
                 group_key_fn: Optional[Callable] = None):
        self.payload_fn = payload_fn
        self.feature_fn = feature_fn
        self.ref_stats = ref_stats
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.candidate_chunk = candidate_chunk
        self.feature_dim = feature_dim
        self.seed = seed
        self._eval_count = 0
        # same-shape candidates can stack; default key = tables length K
        self.group_key_fn = group_key_fn or (lambda c: len(c[0]) if
                                             isinstance(c[0], tuple) else len(c))

        # one jit serves every candidate chunk: vmap over stacked payloads
        def chunk_step(payloads, stats, rng):
            def one(payload, st, r):
                imgs = sample_fn(payload, r)
                feats = feature_fn(imgs)["pool3"]
                return accumulate_stats(st, feats)

            rngs = jax.random.split(rng, stats.n.shape[0])
            return jax.vmap(one)(payloads, stats, rngs)

        self._chunk_step = jax.jit(chunk_step)

    def __call__(self, candidates: Sequence[Any]) -> List[float]:
        fids: Dict[int, float] = {}
        # group by shape so each group stacks into one vmapped evaluation
        groups: Dict[Any, List[int]] = {}
        for i, c in enumerate(candidates):
            groups.setdefault(self.group_key_fn(c), []).append(i)
        for idxs in groups.values():
            for j in range(0, len(idxs), self.candidate_chunk):
                part = idxs[j:j + self.candidate_chunk]
                t0 = time.time()
                part_fids = self._eval_chunk([candidates[i] for i in part])
                logger.logkv_mean("fitness_chunk_time", time.time() - t0)
                for i, f in zip(part, part_fids):
                    fids[i] = f
        return [fids[i] for i in range(len(candidates))]

    def _eval_chunk(self, cands: List[Any]) -> List[float]:
        payloads = [self.payload_fn(c) for c in cands]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs], axis=0), *payloads)
        c = len(cands)
        stats = FeatureStats(
            n=jnp.zeros((c,)),
            s1=jnp.zeros((c, self.feature_dim)),
            s2=jnp.zeros((c, self.feature_dim, self.feature_dim)),
        )
        n_batches = -(-self.num_samples // self.batch_size)
        base_rng = jax.random.key(self.seed)
        for b in range(n_batches):
            rng = jax.random.fold_in(jax.random.fold_in(base_rng, self._eval_count), b)
            stats = self._chunk_step(stacked, stats, rng)
        self._eval_count += 1
        out = []
        for i in range(c):
            st = jax.tree_util.tree_map(lambda a, i=i: a[i], stats)
            out.append(frechet_distance(finalize_stats(st), self.ref_stats))
        return out
