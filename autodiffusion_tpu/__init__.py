"""AutoDiffusion-TPU: training-free diffusion acceleration, rebuilt TPU-native.

A JAX/XLA/Pallas framework with the capabilities of lilijiangg/AutoDiffusion
(ICCV 2023, arXiv:2309.10438): a two-stage evolutionary search over
(1) non-uniform diffusion timestep schedules and (2) per-step UNet layer
pruning, with on-device FID as the fitness function.

Design stance (see SURVEY.md section 7): a schedule is *data* (arrays of
per-step coefficients in :mod:`autodiffusion_tpu.schedules`), a search
candidate is a pytree, and the sampler is a single ``lax.scan`` shared by
every model and every candidate. Candidate evaluation is vmapped/sharded
across the TPU mesh instead of the reference's serial single-GPU loop.
"""

__version__ = "0.1.0"
