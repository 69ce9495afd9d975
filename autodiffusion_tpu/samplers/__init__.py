"""Samplers: scan-based ancestral/DDIM (+PLMS, DPM-Solver) with guidance."""

from .diffusion import (ModelMeanType, ModelVarType, ddim_sample_loop,
                        p_mean_variance, p_sample_loop, q_posterior_mean_variance,
                        q_sample)
from .guidance import cfg_model_fn, classifier_cond_fn

__all__ = [
    "ModelMeanType", "ModelVarType", "ddim_sample_loop", "p_mean_variance",
    "p_sample_loop", "q_posterior_mean_variance", "q_sample",
    "cfg_model_fn", "classifier_cond_fn",
]
