"""Rebuild-side timing: one candidate fitness evaluation on host CPU.

Counterpart of ref_side.py (VERDICT r3 #4): the same candidate-FID
evaluation — ADM-64 published model flags, classifier-guided DDIM-K,
InceptionV3 pool3 + Frechet — through autodiffusion_tpu's search-time
fitness path (make_adm_fitness / BatchedFIDFitness), forced onto the CPU
XLA backend so both sides run on identical silicon. Random weights, same
shapes as ref_side.py. First call = compile + run (reported separately);
steady state = median of the following calls (the EA amortizes one compile
over every candidate of the search, search_hours measured 81-1655 evals).

Writes ref_ab_adt.json.
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_samples", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--time_step", type=int, default=4)
    ap.add_argument("--classifier_scale", type=float, default=1.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="ref_ab_adt.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    from test_inception_loader import synthesize_torch_state  # noqa: F401

    from autodiffusion_tpu.fid import FIDInceptionV3, FIDStats
    from autodiffusion_tpu.fid.evaluator import inception_apply
    from autodiffusion_tpu.models import (ClassifierConfig, ModelConfig,
                                          create_classifier, create_model)
    from autodiffusion_tpu.schedules import space_timesteps
    from autodiffusion_tpu.search import make_adm_fitness

    rng = np.random.RandomState(0)

    cfg = ModelConfig.adm64()
    model = create_model(cfg)
    x1 = jnp.zeros((1, 64, 64, 3))
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.key(0), x1, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32)))
    params = jax.tree_util.tree_map(
        lambda s: (rng.randn(*s.shape) * 0.02).astype(s.dtype), shapes)

    clf = create_classifier(ClassifierConfig.adm64())
    cshapes = jax.eval_shape(lambda: clf.init(
        jax.random.key(1), x1, jnp.zeros((1,))))
    cparams = jax.tree_util.tree_map(
        lambda s: (rng.randn(*s.shape) * 0.02).astype(s.dtype), cshapes)

    ishapes = jax.eval_shape(lambda: FIDInceptionV3().init(
        jax.random.key(2), jnp.zeros((1, 299, 299, 3))))
    iparams = jax.tree_util.tree_map(
        lambda s: (rng.randn(*s.shape) * 0.02).astype(s.dtype), ishapes)

    ra = np.random.RandomState(1).randn(4096, 2048)
    ref = FIDStats(ra.mean(0), np.cov(ra, rowvar=False))

    fitness = make_adm_fitness(
        model=model, params=params, image_size=64,
        feature_fn=inception_apply, feature_params=iparams, ref_stats=ref,
        num_samples=args.num_samples, batch_size=args.batch_size,
        base_schedule="cosine", classifier=clf, classifier_params=cparams,
        classifier_scale=args.classifier_scale, num_classes=1000,
        use_ddim=True, learn_sigma=True, candidate_chunk=1, seed=0)

    cand = tuple(sorted(space_timesteps(1000, f"ddim{args.time_step}")))

    t0 = time.time()
    fid0 = fitness([cand])[0]
    first = time.time() - t0

    steady = []
    for _ in range(args.reps):
        t0 = time.time()
        fitness([cand])
        steady.append(time.time() - t0)

    med = statistics.median(steady)
    out = {
        "harness": "autodiffusion_tpu (jax CPU backend)",
        "num_samples": args.num_samples, "batch_size": args.batch_size,
        "time_step": args.time_step,
        "first_call_s": first, "steady_calls_s": steady,
        "steady_median_s": med,
        "per_sample_s": med / args.num_samples,
        "fid": float(fid0),
        "cpus": os.cpu_count(),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
