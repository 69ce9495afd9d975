"""Concrete search pipelines: ADM (pixel-space, optional classifier guidance).

Wires models + samplers + FID fitness into the fitness callables consumed by
EvolutionSearcher — the TPU equivalent of get_cand_fid
(search_imagenet64_classifier_guidance.py:308-376 and the joint variant
:369-445). The Stable-Diffusion latent pipeline lives in sd_pipelines.py.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fid.stats import FIDStats
from ..samplers import classifier_cond_fn, ddim_sample_loop, p_sample_loop
from ..samplers.diffusion import ModelVarType
from ..schedules import build_tables
from .fitness import BatchedFIDFitness, to_uint8

__all__ = ["make_adm_fitness", "keep_masks_for"]


def keep_masks_for(skip_layers: Sequence[Sequence[int]], layer_num: int) -> np.ndarray:
    """[K, layer_num] keep-mask matrix from per-step skip lists."""
    masks = np.ones((len(skip_layers), layer_num), dtype=np.float32)
    for i, skips in enumerate(skip_layers):
        for l in skips:
            masks[i, l] = 0.0
    return masks


def make_adm_fitness(*, model, params, image_size: int,
                     feature_fn: Callable, ref_stats: FIDStats,
                     num_samples: int, batch_size: int,
                     feature_params=None,
                     base_schedule: str = "cosine", base_num_steps: int = 1000,
                     classifier=None, classifier_params=None,
                     classifier_scale: float = 1.0,
                     num_classes: Optional[int] = 1000,
                     use_ddim: bool = True, eta: float = 0.0,
                     clip_denoised: bool = True,
                     learn_sigma: bool = True,
                     joint: bool = False,
                     candidate_chunk: int = 8, seed: int = 0,
                     feature_dim: int = 2048,
                     shard_fn: Optional[Callable] = None,
                     max_device_batch: Optional[int] = None,
                     place_fn: Optional[Callable] = None) -> BatchedFIDFitness:
    """Fitness for timestep-only (joint=False) or joint timestep+arch search.

    shard_fn, if given, wraps arrays with a sharding constraint so the batch
    axis spreads across the mesh (see parallel.mesh.data_sharder).
    place_fn globalizes dispatch arguments for MULTI-PROCESS meshes (see
    BatchedFIDFitness.place_fn); not needed single-process.
    """
    layer_num = model.layer_num

    def payload_fn(cand):
        if joint:
            ts, skips = cand
            tables = build_tables(ts, base_schedule=base_schedule,
                                  base_num_steps=base_num_steps)
            return {"tables": tables,
                    "keep_masks": jnp.asarray(keep_masks_for(skips, layer_num))}
        tables = build_tables(cand, base_schedule=base_schedule,
                              base_num_steps=base_num_steps)
        return {"tables": tables}

    def sample_fn(static, payload, rng, batch_idx):
        p, cp = static
        tables = payload["tables"]
        n = tables.betas.shape[0]     # total batch = chunk * per-cand slice
        label_rng, noise_rng = jax.random.split(rng)
        if num_classes:
            # every folded candidate's slice draws the SAME class labels
            # so chunked FIDs stay comparable — the conditioning analog
            # of sd_pipelines.prompt_window. (The reference's serial loop
            # gives each candidate independent labels, which only adds
            # cross-candidate sampling variance at finite num_samples.)
            b = n // candidate_chunk
            y = jnp.tile(jax.random.randint(label_rng, (b,), 0, num_classes),
                         candidate_chunk)
        else:
            y = None

        def model_fn(x, t, i):
            kw = {}
            if joint:
                kw["keep_mask"] = payload["keep_masks"][:, i]   # [N, L]
            return model.apply(p, x, t, y, **kw) if y is not None \
                else model.apply(p, x, t, **kw)

        cond = None
        if classifier is not None:
            assert y is not None, "classifier guidance needs class labels"
            cond = classifier_cond_fn(
                lambda x, t: classifier.apply(cp, x, t),
                y, classifier_scale)

        shape = (n, image_size, image_size, 3)
        loop = ddim_sample_loop if use_ddim else p_sample_loop
        kw = {"eta": eta} if use_ddim else {}
        # learn_sigma=False models emit 3 channels: FIXED_LARGE variance,
        # the reference create_gaussian_diffusion fallback (script_util.py),
        # like every sampling CLI path
        kw["var_type"] = (ModelVarType.LEARNED_RANGE if learn_sigma
                          else ModelVarType.FIXED_LARGE)
        noise = jax.random.normal(noise_rng, shape)
        if shard_fn is not None:
            noise = shard_fn(noise)
        x0 = loop(model_fn, shape, tables, rng=noise_rng, cond_fn=cond,
                  clip_denoised=clip_denoised, noise=noise, **kw)
        return to_uint8(x0)

    return BatchedFIDFitness(
        payload_fn=payload_fn, sample_fn=sample_fn, feature_fn=feature_fn,
        ref_stats=ref_stats, num_samples=num_samples, batch_size=batch_size,
        static_payload=(params, classifier_params),
        feature_params=feature_params,
        candidate_chunk=candidate_chunk, seed=seed, feature_dim=feature_dim,
        max_device_batch=max_device_batch, place_fn=place_fn)
