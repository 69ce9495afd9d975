"""Benchmark: ADM-64 classifier-guided candidate-FID evaluation throughput.

Measures the hot path of AutoDiffusion search — per-candidate fitness =
(guided DDIM-4 sampling -> InceptionV3 pool3 -> feature moments) — on the
real chip, end to end, exactly as the search dispatches it.

Prints ONE json line:
  value       = images/sec/chip through the full vectorized fitness pipeline
  vs_baseline = speedup of vectorized multi-candidate evaluation over
                serial one-candidate-at-a-time evaluation on the SAME chip.
                The reference evaluates candidates strictly serially
                (search_imagenet64_classifier_guidance.py:283-299), so this
                ratio isolates the structural win of batching candidates
                across the fitness pipeline, independent of hardware.

Weights are random (benchmark measures compute; quality paths are tested
separately) — shapes/dtypes identical to the published ADM-64 + classifier
+ InceptionV3 configuration, bf16 compute.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from autodiffusion_tpu.fid import FIDInceptionV3, FIDStats, preprocess
from autodiffusion_tpu.models import (ClassifierConfig, ModelConfig,
                                      create_classifier, create_model)
from autodiffusion_tpu.search import TimestepSpace, make_adm_fitness

BATCH = 32           # images per sampling batch (per candidate)
NUM_SAMPLES = 64     # images per candidate
CHUNK = 4            # candidates evaluated concurrently (vectorized mode)
K = 4                # searched timesteps per candidate (headline config)


def build_fitness(candidate_chunk: int, seed: int):
    cfg = ModelConfig.adm64()
    model = create_model(cfg)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x0, jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32))
    ccfg = ClassifierConfig.adm64()
    classifier = create_classifier(ccfg)
    cparams = classifier.init(jax.random.key(1), x0, jnp.zeros((1,)))

    inception = FIDInceptionV3()
    iparams = inception.init(jax.random.key(2), jnp.zeros((1, 299, 299, 3)))

    def feature_fn(imgs_uint8):
        return inception.apply(iparams, preprocess(imgs_uint8))

    rng = np.random.RandomState(0)
    ref = FIDStats(rng.randn(2048), np.eye(2048))
    return make_adm_fitness(
        model=model, params=params, image_size=64, feature_fn=feature_fn,
        ref_stats=ref, num_samples=NUM_SAMPLES, batch_size=BATCH,
        classifier=classifier, classifier_params=cparams,
        classifier_scale=1.0, num_classes=1000,
        base_schedule=cfg.noise_schedule, candidate_chunk=candidate_chunk,
        seed=seed)


def timed_eval(fitness, cands):
    t0 = time.time()
    fids = fitness(cands)
    dt = time.time() - t0
    assert all(np.isfinite(f) for f in fids), fids
    return len(cands) * NUM_SAMPLES / dt


def main():
    space = TimestepSpace(1000, K)
    cands = [space.random() for _ in range(CHUNK)]

    vec = build_fitness(candidate_chunk=CHUNK, seed=0)
    vec(cands[:CHUNK])                     # warmup/compile
    vec_ips = timed_eval(vec, cands)

    ser = build_fitness(candidate_chunk=1, seed=0)
    ser([cands[0]])                        # warmup/compile
    t0 = time.time()
    for c in cands:
        ser([c])
    ser_ips = len(cands) * NUM_SAMPLES / (time.time() - t0)

    print(json.dumps({
        "metric": "adm64_guided_ddim4_candidate_fid_eval_throughput",
        "value": round(vec_ips, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(vec_ips / ser_ips, 3),
    }))


if __name__ == "__main__":
    main()
