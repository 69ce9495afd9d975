"""Stable Diffusion latent txt2img search pipeline.

TPU re-design of sd/scripts/search_ea.py:504-566 (get_cand_fid): candidates
are either integer timestep subsets (DDIM/PLMS) or continuous time knots
(DPM-Solver); fitness = FID of CFG-guided latent samples decoded through the
VAE against precomputed COCO statistics.

Structural wins vs the reference:
  * the CLIP text tower runs ONCE per search — prompt embeddings are
    precomputed into a context bank, instead of re-encoding every candidate
    batch (search_ea.py:520-526);
  * sampling + VAE decode + Inception features run as one jitted, vmapped
    graph per candidate chunk.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fid.stats import FIDStats
from ..models.vae import SD_SCALE_FACTOR
from ..samplers import (DiscreteNoiseSchedule, cfg_eps_fn, ddim_sample_loop,
                        dpm_solver_sample_loop, plms_sample_loop)
from ..samplers.diffusion import ModelVarType
from ..schedules import build_sd_tables, make_beta_schedule
from .fitness import BatchedFIDFitness

__all__ = ["make_sd_fitness", "sd_decode_to_uint8"]


def sd_decode_to_uint8(vae_apply: Callable, vae_params, z: jnp.ndarray) -> jnp.ndarray:
    """latents -> uint8 images: decode(z / 0.18215), clamp to [0,1]
    (search_ea.py:539-541 via decode_first_stage)."""
    x = vae_apply(vae_params, z / SD_SCALE_FACTOR)
    x = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
    return (x * 255.0 + 0.5).astype(jnp.uint8)


def prompt_window(n, candidate_chunk, batch_idx, n_prompts):
    """Deterministic rolling prompt indices for one fitness dispatch of
    ``n`` samples over ``candidate_chunk`` folded candidates.

    The per-candidate slice size is derived from the DISPATCHED batch
    (n // candidate_chunk) — NOT the constructor batch_size: the HBM
    device-batch cap (fitness.py max_device_batch) may dispatch smaller
    sub-slices. Every candidate's slice draws the SAME prompts so
    chunked FIDs stay comparable (reference loader iteration,
    search_ea.py:516-519), and the window advances by exactly the
    consumed prompt count so no prompt is skipped across batches."""
    b = n // candidate_chunk
    start = (batch_idx * b) % n_prompts
    return (start + jnp.arange(n) % b) % n_prompts


def make_sd_fitness(*, unet, unet_params, vae, vae_params,
                    context_bank: jnp.ndarray, uncond_context: jnp.ndarray,
                    feature_fn: Callable, ref_stats: FIDStats,
                    num_samples: int, batch_size: int,
                    feature_params=None,
                    sampler: str = "plms",            # ddim | plms | dpm_solver
                    guidance_scale: float = 7.5,
                    latent_hw: int = 64, latent_ch: int = 4,
                    base_num_steps: int = 1000,
                    linear_start: float = 0.00085, linear_end: float = 0.012,
                    dpm_order: int = 2,
                    candidate_chunk: int = 4, seed: int = 0,
                    feature_dim: int = 2048,
                    max_device_batch: Optional[int] = None,
                    shard_fn: Optional[Callable] = None,
                    place_fn: Optional[Callable] = None) -> BatchedFIDFitness:
    """context_bank: [N, 77, 768] precomputed CLIP embeddings of the eval
    prompts (COCO captions); uncond_context: [77, 768] empty-prompt
    embedding. Candidates: int tuples for ddim/plms, float tuples (K+1
    ascending times) for dpm_solver.

    shard_fn/place_fn: same contract as make_adm_fitness — batch-axis
    sharding constraints and multi-process globalization of dispatch
    arguments (BatchedFIDFitness.place_fn); the SD path supports the
    same mesh parallelism as the ADM path."""
    betas = make_beta_schedule("sqrt_linear", base_num_steps,
                               linear_start=linear_start, linear_end=linear_end)
    noise_sched = DiscreteNoiseSchedule.from_betas(betas)
    n_prompts = context_bank.shape[0]

    def payload_fn(cand):
        if sampler == "dpm_solver":
            times = np.asarray(sorted(cand, reverse=True), np.float32)
            return {"times": jnp.asarray(times)}
        tables = build_sd_tables(cand, base_num_steps=base_num_steps,
                                 linear_start=linear_start,
                                 linear_end=linear_end)
        return {"tables": tables}

    def sample_fn(static, payload, rng, batch_idx):
        uparams, vparams, bank, uncond = static
        arrs = jax.tree_util.tree_leaves(payload)
        n = arrs[0].shape[0]        # total batch = chunk * per-cand slice
        idx = prompt_window(n, candidate_chunk, batch_idx, n_prompts)
        ctx = bank[idx]
        shape = (n, latent_hw, latent_hw, latent_ch)
        rng, noise_rng = jax.random.split(rng)
        noise = jax.random.normal(noise_rng, shape)
        if shard_fn is not None:
            # batch-axis constraints like the ADM path (pipelines.py):
            # the initial latent and the per-sample context spread over
            # the mesh's data axis and everything downstream follows
            noise = shard_fn(noise)
            ctx = shard_fn(ctx)
        guided_eps = cfg_eps_fn(
            lambda x2, t2, c2: unet.apply(uparams, x2, t2, c2),
            ctx, uncond, guidance_scale)

        if sampler == "dpm_solver":
            z = dpm_solver_sample_loop(
                guided_eps, shape, noise_sched, payload["times"], rng=rng,
                order=dpm_order, lower_order_final=True, predict_x0=True,
                noise=noise)
        elif sampler == "plms":
            z = plms_sample_loop(guided_eps, shape,
                                 payload["tables"], rng=rng, noise=noise)
        elif sampler == "ddim":
            z = ddim_sample_loop(guided_eps, shape,
                                 payload["tables"], rng=rng,
                                 clip_denoised=False,
                                 var_type=ModelVarType.FIXED_SMALL,
                                 noise=noise)
        else:
            raise ValueError(sampler)
        return sd_decode_to_uint8(
            lambda p, zz: vae.apply(p, zz, method=vae.decode), vparams, z)

    return BatchedFIDFitness(
        payload_fn=payload_fn, sample_fn=sample_fn, feature_fn=feature_fn,
        ref_stats=ref_stats, num_samples=num_samples, batch_size=batch_size,
        static_payload=(unet_params, vae_params, context_bank, uncond_context),
        feature_params=feature_params,
        candidate_chunk=candidate_chunk, seed=seed, feature_dim=feature_dim,
        max_device_batch=max_device_batch, place_fn=place_fn)
