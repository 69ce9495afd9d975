"""Candidate fitness: batched FID evaluation with candidates folded into
the batch axis.

The reference evaluates one candidate at a time — rebuild schedule, sample
num_samples images, run TF FID, repeat (search_imagenet64_classifier_
guidance.py:308-376). Here a chunk of C same-K candidates is evaluated in
ONE compiled program by expanding their ScheduleTables per-sample: every
array in the stacked payload becomes [C*B, ...] (sample j belongs to
candidate j // B), the scan-based samplers consume per-sample coefficients
natively, and feature moments reduce back to per-candidate statistics by a
reshape. Unlike a vmap over candidates, the compiled program is the same
SIZE as a single-candidate run with a larger batch — important both for MXU
utilization and for environments that cap XLA program size.

Only the tiny (mu, sigma) pair and the final scipy sqrtm run on host.

Caller supplies:
  payload_fn(candidate) -> pytree of arrays whose leading axis is K-like
      (ScheduleTables fields, keep-mask matrices, time vectors...)
  sample_fn(static_payload, payload, rng, batch_idx) -> uint8 [N, H, W, 3]
      where N is the leading axis length of the per-sample payload arrays
  static_payload: candidate-independent device state (model/classifier
      params, context banks). It is passed through jit as an ARGUMENT on
      every call — never close over large device arrays in the sampled
      function: jit lowering materializes closure constants on host, which
      is pathologically slow on tunneled-TPU environments.
"""

from __future__ import annotations

import functools
import math
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fid.stats import (FeatureStats, FIDStats, finalize_stats,
                         frechet_distance, frechet_distance_eigh,
                         make_device_frechet)
from ..utils import logger

__all__ = ["BatchedFIDFitness", "to_uint8"]


def to_uint8(samples: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float -> uint8, reference rounding
    (search_imagenet64_classifier_guidance.py:352-354)."""
    return jnp.clip((samples + 1) * 127.5, 0, 255).astype(jnp.uint8)


def _trace_with_fused_conv_defaulted_off(fn):
    """Trace the fitness chunk with ADT_FUSED_CONV defaulted to "0".

    Measured on chip (BENCH_NOTES "Round-5 fused-conv verdict"): the fused
    norm-act-conv kernel wins the STANDALONE VAE 512px decode 1.71x
    (288.8 -> 169.1 ms) but LOSES inside the SD fitness chunk program
    (0.697 -> 0.773 s/candidate, steady chunk 1.311 -> 1.476 s) — inside
    the PLMS-scan + decode + Inception megaprogram XLA's scheduling around
    the custom calls costs more than the kernel saves, the same
    in-context-loss shape as round 3's im2col/flash-gate results. So the
    chunk program traces with the gate off by default while the standalone
    decode paths (txt2img/img2img/ldm-sample, `adt evaluate`) keep the
    measured winners. An EXPLICIT ADT_FUSED_CONV in the environment still
    wins — that is the A/B probe's handle. The env only matters during
    trace (resolve_use_fused_conv reads it at module-trace time); cached
    executions pay one dict check.
    """
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if "ADT_FUSED_CONV" in os.environ:
            return fn(*args, **kwargs)
        os.environ["ADT_FUSED_CONV"] = "0"
        try:
            return fn(*args, **kwargs)
        finally:
            del os.environ["ADT_FUSED_CONV"]
    return wrapped


class BatchedFIDFitness:
    """fitness(list of candidates) -> list of FIDs.

    candidate_chunk bounds how many candidates share one compiled sampling
    program; num_samples images per candidate are generated in
    device_batch-sized slices (batch_size, possibly split further by the
    HBM cap below) and streamed into running per-candidate moments, so
    one dispatch carries candidate_chunk * device_batch samples.
    """

    def __init__(self, *, payload_fn: Callable, sample_fn: Callable,
                 feature_fn: Callable, ref_stats: FIDStats,
                 num_samples: int, batch_size: int,
                 static_payload: Any = (),
                 feature_params: Any = None,
                 candidate_chunk: int = 8, feature_dim: int = 2048,
                 seed: int = 0, device_frechet: bool = True,
                 group_key_fn: Optional[Callable] = None,
                 max_device_batch: Optional[int] = None,
                 place_fn: Optional[Callable] = None):
        self.payload_fn = payload_fn
        self.feature_fn = feature_fn
        self.ref_stats = ref_stats
        self.num_samples = num_samples
        self.batch_size = batch_size
        # Cap the per-dispatch sample count: at the published ADM-64
        # search config (chunk 4 x batch 100 = 400 guided samples per
        # dispatch) the compiled program needs 15.2 GB of temp HBM —
        # against the v5e's 16 GB — and XLA's spill/remat schedule costs
        # ~14% throughput (86.7 imgs/s at n<=128 vs 73.4 at n=400,
        # measured). Splitting each batch into even sub-slices keeps the
        # math identical and the program comfortably resident. None =
        # auto (128); 0 disables.
        if max_device_batch is None:
            max_device_batch = 128
        if max_device_batch and candidate_chunk * batch_size > max_device_batch:
            splits = -(-candidate_chunk * batch_size // max_device_batch)
            self.device_batch = -(-batch_size // splits)
        else:
            self.device_batch = batch_size
        # every candidate is scored on n_batches * device_batch samples —
        # the even-slice requirement can round num_samples UP by up to
        # device_batch - 1. FID is sample-size dependent, so disclose the
        # actual count instead of silently overshooting. (The reference
        # instead TRUNCATES: range(num_samples // batch_size) serial
        # batches, get_cand_fid.)
        self.actual_samples = (-(-num_samples // self.device_batch)
                               * self.device_batch)
        if self.actual_samples != num_samples:
            logger.log(f"fitness: {num_samples} samples/candidate rounds up "
                       f"to {self.actual_samples} "
                       f"(even device batches of {self.device_batch}); "
                       "compare FIDs at equal actual counts")
        # place_fn makes every dispatch argument a GLOBAL array before it
        # enters jit — required on multi-process meshes, where each process
        # holds only its local devices and jit rejects process-local
        # (uncommitted) inputs. Typical value:
        #   lambda tree: parallel.replicate(mesh, tree)
        # (arrays are tiny coefficient tables/moments; GSPMD re-shards the
        # actual compute per shard_fn's constraints). Single-process meshes
        # don't need it. Mirrors the reference's rank-sharded sampling +
        # all_gather (search_imagenet64_classifier_guidance.py:356-366).
        self.place_fn = place_fn
        # Without an explicit place_fn, commit the big dispatch arguments
        # (model/classifier/Inception params — ~1.4 GB for full-scale
        # ADM-64) to device ONCE here: host-numpy jit arguments are
        # re-staged on EVERY chunk dispatch, which over the tunneled TPU
        # runtime dominated a full-scale search's wall clock and host RSS.
        place_fn_eff = jax.device_put if place_fn is None else place_fn
        self.static_payload = place_fn_eff(static_payload)
        # feature-extractor params are a jit ARGUMENT of the chunk program,
        # like static_payload — a feature_fn that closes over 95 MB of
        # Inception weights turns them into trace-time constants inside
        # chunk_step, and host constant-folding of their dtype casts was
        # observed to balloon a full-scale search compile past 60 GB RSS.
        # feature_params=None keeps the legacy one-arg feature_fn(imgs)
        # protocol (stub features in tests).
        self._feature_takes_params = feature_params is not None
        self.feature_params = (place_fn_eff(feature_params)
                               if self._feature_takes_params
                               else feature_params)
        self.candidate_chunk = candidate_chunk
        self.feature_dim = feature_dim
        self.seed = seed
        self._eval_count = 0
        # same-shape candidates can stack; default key = candidate length
        self.group_key_fn = group_key_fn or (lambda c: len(c[0]) if
                                             isinstance(c[0], tuple) else len(c))

        # center features on the reference mean before accumulating moments:
        # shift-invariant covariance without the f32 cancellation of
        # s2 - n*mu*mu^T over tens of thousands of streamed samples (the
        # reference gets this via float64 np.cov on host, evaluator_v1.py)
        self._shift = jnp.asarray(ref_stats.mu, jnp.float32)
        # on-device Frechet: one batched f32 eigvalsh per chunk instead of
        # per-candidate host eighs + 17 MB moment transfers (~20 s/candidate
        # at D=2048 over a tunneled TPU link); validated against the host
        # f64 path in tests (incl. the full-chain reference-parity test)
        self._device_frechet = (make_device_frechet(ref_stats)
                                if device_frechet else None)

        takes_params = self._feature_takes_params

        def chunk_step(static, fparams, per_sample_payload, stats, shift,
                       rng, batch_idx):
            c = stats.n.shape[0]
            imgs = sample_fn(static, per_sample_payload, rng, batch_idx)
            out = feature_fn(fparams, imgs) if takes_params else \
                feature_fn(imgs)
            feats = out["pool3"].astype(stats.s1.dtype)
            feats = feats - shift.astype(feats.dtype)
            b = feats.shape[0] // c
            by_cand = feats.reshape(c, b, -1)
            return FeatureStats(
                n=stats.n + b,
                s1=stats.s1 + by_cand.sum(axis=1),
                s2=stats.s2 + jnp.einsum(
                    "cbd,cbe->cde", by_cand, by_cand,
                    # same rationale as fid/stats.accumulate_stats: the TPU
                    # default-precision f32 outer product biases s2 enough
                    # to drive small-n FIDs negative (round-4 method proof)
                    precision=jax.lax.Precision.HIGHEST),
            )

        self._chunk_step = _trace_with_fused_conv_defaulted_off(
            jax.jit(chunk_step))

    # ---- noise-stream state (EA checkpoint/resume) ----
    # Each chunk evaluation folds _eval_count into its RNG, so the noise
    # stream advances across the whole search. A resumed search must
    # continue the stream where it stopped, or fresh candidates would be
    # scored with replayed noise from count 0 — memoized FIDs stay valid
    # either way, but resume would not be bitwise-equal to an
    # uninterrupted run. EvolutionSearcher persists this via
    # get_state/set_state.

    def get_state(self) -> Dict[str, int]:
        return {"eval_count": self._eval_count}

    def set_state(self, state: Dict[str, int]) -> None:
        self._eval_count = int(state["eval_count"])

    def __call__(self, candidates: Sequence[Any]) -> List[float]:
        fids: Dict[int, float] = {}
        # group by shape so each group stacks into one compiled evaluation
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
        # pad partial chunks to candidate_chunk (duplicating the last
        # candidate) so one compilation per K serves every generation
        n_real = len(cands)
        cands = list(cands) + [cands[-1]] * (self.candidate_chunk - n_real)
        c = len(cands)
        t0 = time.time()
        payloads = [self.payload_fn(x) for x in cands]
        # stack [C, ...] then expand per-sample to [C*b, ...] where
        # b = device_batch (NOT batch_size — the HBM cap may shrink it):
        # sample j belongs to candidate j // device_batch. sample_fns
        # must derive the slice size from the payload they receive.
        per_sample = jax.tree_util.tree_map(
            lambda *xs: jnp.repeat(
                jnp.stack([jnp.asarray(x) for x in xs], axis=0),
                self.device_batch, axis=0),
            *payloads)
        reset_time = time.time() - t0

        t0 = time.time()
        stats = FeatureStats(
            n=jnp.zeros((c,)),
            s1=jnp.zeros((c, self.feature_dim)),
            s2=jnp.zeros((c, self.feature_dim, self.feature_dim)),
        )
        n_batches = -(-self.num_samples // self.device_batch)
        base_rng = jax.random.key(self.seed)
        # static_payload/feature_params were globalized ONCE at
        # construction, and stats re-enters as a chunk_step OUTPUT already
        # carrying the global sharding — so only the fresh per-chunk leaves
        # are placed here. Re-placing the params every dispatch would
        # round-trip ~1.4 GB through host per batch on a multi-process
        # mesh and block on the previous chunk's result.
        shift = self._shift
        if self.place_fn is not None:
            per_sample = self.place_fn(per_sample)
            stats = self.place_fn(stats)
            shift = self.place_fn(shift)
        with jax.profiler.TraceAnnotation("fitness_sample"):
            for b in range(n_batches):
                rng = jax.random.fold_in(
                    jax.random.fold_in(base_rng, self._eval_count), b)
                extra = (rng, jnp.int32(b))
                if self.place_fn is not None:
                    extra = self.place_fn(extra)
                stats = self._chunk_step(self.static_payload,
                                         self.feature_params, per_sample,
                                         stats, shift, *extra)
            stats = jax.block_until_ready(stats)
        self._eval_count += 1
        sample_time = time.time() - t0

        t0 = time.time()
        with jax.profiler.TraceAnnotation("fitness_fid"):
            if self._device_frechet is not None:
                out = [float(f) for f in self._device_frechet(stats)[:n_real]]
            else:
                out = []
                for i in range(n_real):
                    st = jax.tree_util.tree_map(lambda a, i=i: a[i], stats)
                    # eigh: ~10x faster than sqrtm per candidate, equal to
                    # ~1e-6 relative (fid.stats.frechet_distance_eigh)
                    out.append(frechet_distance_eigh(
                        finalize_stats(st, shift=self.ref_stats.mu),
                        self.ref_stats))
        # the reference's per-phase timing line
        # (search_imagenet64_classifier_guidance.py:375)
        logger.log(f"reset_time: {reset_time:.3f}, sample_time: "
                   f"{sample_time:.3f}, fid_time: {time.time() - t0:.3f}")
        # FID is non-negative by definition; a materially negative or
        # non-finite value means numerics are broken (round 4's reduced-
        # precision s2 drove small-n FIDs to -5) and every score from this
        # evaluator is suspect — fail loudly instead of letting the EA
        # descend a corrupted landscape. Tiny negatives (f32 Frechet noise
        # at small n) clamp to 0.
        for f in out:
            if not math.isfinite(f) or f < -0.01:
                raise FloatingPointError(
                    f"fitness produced an invalid FID {f!r} (chunk FIDs: "
                    f"{out}); the moment/Frechet numerics are broken — see "
                    "fid/stats.py precision notes")
        return [max(f, 0.0) for f in out]
