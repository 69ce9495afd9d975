"""Secondary measured benchmarks (BASELINE.md "imgs/sec/chip; search hours").

bench.py prints the single driver-graded headline; this script measures the
numbers users actually pay for and writes them to BENCH_EXTRAS.json:

  adm64_fitness_full   — TRUE candidate fitness cost: guided DDIM-4 sampling
                         + InceptionV3 pool3 features + streamed moments +
                         eigh Frechet, per candidate, at the bench config
                         (CHUNK=2 x BATCH=16) and at the published search
                         config (batch 100, chunk 4; the production HBM cap
                         splits each dispatch to 4 x 25 = 100 samples — the
                         uncapped 400-sample fold needs 15.2 GB of 16,
                         search/fitness.py).
  lsun256_ddim15       — published searched 15-step LSUN-bedroom schedule
                         (sample_LSUN_bedroom_subnet.sh), full 553M uncond
                         UNet, imgs/sec/chip.
  sd_plms4_step        — SD v1 CFG denoise step at the search batch (6),
                         ms/step.

Weights are zeros via eval_shape (identical shapes/dtypes to the published
checkpoints; zero weights change no FLOPs). Run: python bench_extras.py
[adm_fitness|adm_fitness_search|lsun|sd ...]; writes/merges BENCH_EXTRAS.json.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "BENCH_EXTRAS.json")


V5E_PEAK_BF16_TFLOPS = 197.0


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


def _count_flops(fn, args, scan_len: int = 1) -> float:
    """FLOPs of fn(*args) via an einsum-only compile (the bench.py method:
    XLA bills Pallas custom calls at zero, so the count must come from a
    flash-disabled twin; the TIMED program keeps the flash kernels). A
    scan body is counted once by cost_analysis — scale by scan_len."""
    from bench import pallas_kernels_disabled

    with pallas_kernels_disabled():
        # distinct lambda: jit trace caches are keyed on the callable, so
        # reusing the timed function object would skip the env gate
        counted = jax.jit(lambda *a: fn(*a)).lower(*args).compile()
    return counted.cost_analysis().get("flops", 0.0) * scan_len


def _mfu(flops: float, dt: float) -> float:
    return flops / dt / 1e12 / V5E_PEAK_BF16_TFLOPS


def _zeros_like_shapes(shapes):
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def bench_adm_fitness(chunk: int, batch: int, n_batches: int = 2):
    """Full fitness: sampling + inception + moments + frechet per candidate."""
    from autodiffusion_tpu.fid import FIDInceptionV3, FIDStats
    from autodiffusion_tpu.models import (ClassifierConfig, ModelConfig,
                                          create_classifier, create_model)
    from autodiffusion_tpu.search import TimestepSpace, make_adm_fitness

    model = create_model(ModelConfig.adm64())
    clf = create_classifier(ClassifierConfig.adm64())
    x1 = jnp.zeros((1, 64, 64, 3))
    shapes = jax.eval_shape(
        lambda: (model.init(jax.random.key(0), x1, jnp.zeros((1,)),
                            jnp.zeros((1,), jnp.int32)),
                 clf.init(jax.random.key(1), x1, jnp.zeros((1,))),
                 FIDInceptionV3().init(jax.random.key(2),
                                       jnp.zeros((1, 299, 299, 3)))))
    params, cparams, iparams = _zeros_like_shapes(shapes)
    jax.block_until_ready((params, cparams, iparams))

    ref = FIDStats(np.zeros(2048), np.eye(2048))
    from autodiffusion_tpu.fid.evaluator import inception_apply
    num_samples = batch * n_batches
    fitness = make_adm_fitness(
        model=model, params=params, image_size=64,
        feature_fn=inception_apply, feature_params=iparams,
        ref_stats=ref, num_samples=num_samples, batch_size=batch,
        classifier=clf, classifier_params=cparams, classifier_scale=1.0,
        num_classes=1000, candidate_chunk=chunk, seed=0)

    space = TimestepSpace(1000, 4)
    cands = [space.seed()] + [space.random() for _ in range(chunk - 1)]
    fitness(cands)                        # warmup/compile
    t0 = time.time()
    fitness(cands)
    dt = time.time() - t0
    per_cand = dt / chunk
    return {
        "metric": f"adm64_guided_ddim4_full_fitness_chunk{chunk}x{batch}",
        "value": round(per_cand, 3), "unit": f"sec/candidate ({num_samples} samples)",
        "imgs_per_sec_chip": round(chunk * num_samples / dt, 2),
        "includes": "sampling + inceptionv3 pool3 + moments + eigh frechet",
    }


def bench_lsun256():
    from autodiffusion_tpu.models import ModelConfig, create_model
    from autodiffusion_tpu.samplers import ddim_sample_loop
    from autodiffusion_tpu.schedules import build_tables

    # published searched 15-step schedule (sample_LSUN_bedroom_subnet.sh:8)
    spec = [644, 737, 67, 804, 134, 871, 6, 639, 268, 335, 402, 469, 536, 603, 670]
    cfg = ModelConfig.lsun256()
    model = create_model(cfg)
    x1 = jnp.zeros((1, 256, 256, 3))
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), x1,
                                               jnp.zeros((1,))))
    params = _zeros_like_shapes(shapes)
    jax.block_until_ready(params)
    tables = build_tables(spec, base_schedule=cfg.noise_schedule)
    B = 8

    def sample(params, tables, rng):
        return ddim_sample_loop(lambda x, t, i: model.apply(params, x, t),
                                (B, 256, 256, 3), tables, rng=rng)

    f = jax.jit(sample)
    _sync(f(params, tables, jax.random.key(0)))
    times = []
    for i in range(3):
        t0 = time.time()
        _sync(f(params, tables, jax.random.key(i)))
        times.append(time.time() - t0)
    dt = float(np.median(times))
    flops = _count_flops(sample, (params, tables, jax.random.key(0)),
                         scan_len=len(spec))
    return {"metric": "lsun256_searched_ddim15_sampling", "value":
            round(B / dt, 2), "unit": "imgs/sec/chip", "batch": B,
            "mfu": round(_mfu(flops, dt), 4)}


def bench_sd():
    from autodiffusion_tpu.models import SDUNetModel
    from autodiffusion_tpu.samplers import cfg_eps_fn

    unet = SDUNetModel(dtype=jnp.bfloat16)  # v1-inference defaults, bf16 like adt search-sd
    z1 = jnp.zeros((1, 64, 64, 4))
    shapes = jax.eval_shape(lambda: unet.init(
        jax.random.key(0), z1, jnp.zeros((1,)), jnp.zeros((1, 77, 768))))
    params = _zeros_like_shapes(shapes)
    jax.block_until_ready(params)
    B = 6
    ctx = jnp.zeros((B, 77, 768))
    uc = jnp.zeros((B, 77, 768))

    def step(params, z, t, ctx, uc):
        guided = cfg_eps_fn(lambda x2, t2, c2: unet.apply(params, x2, t2, c2),
                            ctx, uc, 7.5)
        return guided(z, t)

    f = jax.jit(step)
    z = jnp.zeros((B, 64, 64, 4))
    t = jnp.full((B,), 500.0)
    _sync(f(params, z, t, ctx, uc))
    # chain the step through its own output and sync ONCE: a sync per call
    # pays the ~30 ms tunnel dispatch overhead every iteration (environment
    # quirk #4), inflating a ~120 ms step by ~20%
    R = 10
    t0 = time.time()
    zc = z
    for _ in range(R):
        zc = f(params, zc, t, ctx, uc)
    _sync(zc)
    dt = (time.time() - t0) / R
    flops = _count_flops(step, (params, z, t, ctx, uc))
    return {"metric": "sd_v1_cfg_denoise_step_batch6",
            "value": round(dt * 1e3, 1), "unit": "ms/step",
            "mfu": round(_mfu(flops, dt), 4)}


def bench_sd_vae_decode():
    """VAE 512px decode at the search batch (the second-largest cost of an
    SD fitness candidate after the denoise steps)."""
    from autodiffusion_tpu.models import AutoencoderKL

    vae = AutoencoderKL(dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: vae.init(jax.random.key(0),
                                             jnp.zeros((1, 32, 32, 3))))
    params = _zeros_like_shapes(shapes)
    jax.block_until_ready(params)
    B = 6
    z = jnp.zeros((B, 64, 64, 4))

    def decode(params, z):
        return vae.apply(params, z, method=vae.decode)

    f = jax.jit(decode)
    _sync(f(params, z))
    # queue all calls, sync once (decode output isn't chainable; async
    # dispatch still overlaps the tunnel's per-call overhead)
    R = 8
    t0 = time.time()
    outs = [f(params, z) for _ in range(R)]
    _sync(outs[-1])
    dt = (time.time() - t0) / R
    flops = _count_flops(decode, (params, z))
    return {"metric": "sd_vae_decode_512px_batch6",
            "value": round(dt * 1e3, 1), "unit": "ms/decode",
            "mfu": round(_mfu(flops, dt), 4)}


def bench_sd_fitness(chunk: int = 2, batch: int = 6):
    """TRUE SD candidate fitness at the published search config: 4-step
    PLMS CFG sampling + VAE 512px decode + InceptionV3 + moments +
    Frechet per candidate (sd/scripts/search_ea.py get_cand_fid)."""
    K = 4
    from autodiffusion_tpu.fid import FIDInceptionV3, FIDStats
    from autodiffusion_tpu.models import AutoencoderKL, SDUNetModel
    from autodiffusion_tpu.fid.evaluator import inception_apply
    from autodiffusion_tpu.search.sd_pipelines import make_sd_fitness

    unet = SDUNetModel(dtype=jnp.bfloat16)
    vae = AutoencoderKL(dtype=jnp.bfloat16)
    z1 = jnp.zeros((1, 64, 64, 4))
    shapes = jax.eval_shape(
        lambda: (unet.init(jax.random.key(0), z1, jnp.zeros((1,)),
                           jnp.zeros((1, 77, 768))),
                 vae.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3))),
                 FIDInceptionV3().init(jax.random.key(2),
                                      jnp.zeros((1, 299, 299, 3)))))
    uparams, vparams, iparams = _zeros_like_shapes(shapes)
    jax.block_until_ready((uparams, vparams, iparams))

    ref = FIDStats(np.zeros(2048), np.eye(2048))
    num_samples = batch                      # one batch per candidate slice
    fitness = make_sd_fitness(
        unet=unet, unet_params=uparams, vae=vae, vae_params=vparams,
        context_bank=jnp.zeros((16, 77, 768)),
        uncond_context=jnp.zeros((77, 768)),
        feature_fn=inception_apply, feature_params=iparams, ref_stats=ref,
        num_samples=num_samples, batch_size=batch, sampler="plms",
        candidate_chunk=chunk, seed=0)
    # published searched 4-step artifact-style candidate (ints for plms)
    cands = [(94, 217, 574, 944)] + [(100 + i, 300 + i, 600 + i, 900 + i)
                                     for i in range(1, chunk)]
    fitness(cands)                           # warmup/compile
    t0 = time.time()
    fitness(cands)
    dt = time.time() - t0
    return {
        "metric": f"sd_plms{K}_full_fitness_chunk{chunk}x{batch}_512px",
        "value": round(dt / chunk, 3),
        "unit": f"sec/candidate ({num_samples} samples)",
        "imgs_per_sec_chip": round(chunk * num_samples / dt, 2),
        "includes": "CFG PLMS sampling + VAE decode + inceptionv3 + "
                    "moments + eigh frechet",
    }


BENCHES = {
    "adm_fitness": lambda: bench_adm_fitness(2, 16),
    "adm_fitness_search": lambda: bench_adm_fitness(4, 100, n_batches=1),
    "lsun": bench_lsun256,
    "sd": bench_sd,
    "sd_vae": bench_sd_vae_decode,
    "sd_fitness": bench_sd_fitness,
}


def main():
    from bench import probe_backend_or_die

    names = sys.argv[1:] or list(BENCHES)
    unknown = [n for n in names if n not in BENCHES]
    if unknown:
        sys.exit(f"unknown bench name(s) {unknown}; valid: {list(BENCHES)}")
    probe_backend_or_die()
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for name in names:
        t0 = time.time()
        r = BENCHES[name]()
        r["total_bench_time_s"] = round(time.time() - t0, 1)
        results[name] = r
        print(json.dumps({name: r}), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
