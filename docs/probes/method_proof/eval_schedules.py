"""Fresh-seed re-evaluation for the method-level proof (VERDICT r3 #1).

Scores the searched K=4 schedule against the uniform DDIM-4 seed on the
trained model with FRESH sampling noise, `--repeats` times each, through the
exact search-time fitness path (make_adm_fitness; BatchedFIDFitness advances
its noise-stream counter per evaluation, so every repeat is an independent
draw).  Both schedules fold into ONE chunked dispatch per repeat, so each
pair is scored under identical conditions.  The margin must exceed the eval
noise for the proof to stand: searched mean + 2*max(std) < uniform mean - ...
we report means, stds and the z-like separation and let proof.json carry the
verdict.

Also runs the DEPLOYMENT path once: `adt sample --use_timestep <searched>`
-> npz -> `adt evaluate` vs the same ref stats, which must agree with the
search-time fitness at matched sample count (fresh noise, so agreement is
"within the measured eval noise", not bitwise).

Matches search_imagenet64_classifier_guidance.py:521-584 (the EA descends a
real FID landscape) and scripts/classifier_sample.py:140-145 + evaluator
(deployment reproduces the searched schedule's quality).
"""
import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/tmp/method_proof")
    ap.add_argument("--ema", required=True)
    ap.add_argument("--searched", default="",
                    help="searched schedule as a python list; default: read "
                         "workspace/search_result.json")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--num_samples", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--skip_deploy", action="store_true")
    args = ap.parse_args()
    ws = args.workspace

    if args.searched:
        searched = tuple(sorted(json.loads(args.searched)))
        search_fid = None
    else:
        with open(os.path.join(ws, "search_result.json")) as f:
            # last line of the tee'd search stdout is the result JSON
            res = json.loads(f.read().strip().splitlines()[-1])
        searched = tuple(sorted(res["best"]))
        search_fid = res["fid"]

    import jax  # noqa: E402  (after argparse: fast --help)

    from autodiffusion_tpu.fid import FIDStats, load_fid_inception_params
    from autodiffusion_tpu.fid.evaluator import inception_apply
    from autodiffusion_tpu.models import ModelConfig, create_model
    from autodiffusion_tpu.schedules import space_timesteps
    from autodiffusion_tpu.search import make_adm_fitness
    from autodiffusion_tpu.utils.checkpoint import load_tree

    # must mirror the adt-train/adt-search CLI model EXACTLY (run_proof.sh
    # MODEL_FLAGS + the CLI defaults for the unset flags: scale-shift norm,
    # resblock up/down, new attention order, head width 64, bf16) or the
    # msgpack template mismatches the trained tree
    cfg = ModelConfig(image_size=32, num_channels=64, num_res_blocks=2,
                      attention_resolutions="16,8", class_cond=False,
                      learn_sigma=True, noise_schedule="cosine",
                      use_scale_shift_norm=True, resblock_updown=True,
                      use_new_attention_order=True, num_head_channels=64,
                      use_bf16=True)
    model = create_model(cfg)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.key(0),
        jax.numpy.zeros((1, 32, 32, 3)), jax.numpy.zeros((1,))))
    params = load_tree(args.ema, jax.device_get(
        jax.tree_util.tree_map(lambda s: jax.numpy.zeros(s.shape, s.dtype),
                               shapes)))

    uniform = tuple(sorted(space_timesteps(1000, f"ddim{len(searched)}")))
    iparams = load_fid_inception_params(os.path.join(ws, "pt_inception.pth"))
    ref = FIDStats.load(os.path.join(ws, "ref_stats.npz"))

    fitness = make_adm_fitness(
        model=model, params=params, image_size=32,
        feature_fn=inception_apply, feature_params=iparams, ref_stats=ref,
        num_samples=args.num_samples, batch_size=args.batch_size,
        base_schedule="cosine", num_classes=None, use_ddim=True,
        learn_sigma=True, candidate_chunk=2, seed=20260819)

    rows = {"uniform": [], "searched": []}
    for r in range(args.repeats):
        u, s = fitness([uniform, searched])
        rows["uniform"].append(float(u))
        rows["searched"].append(float(s))
        print(f"repeat {r}: uniform={u:.4f} searched={s:.4f}", flush=True)

    mu_u = statistics.mean(rows["uniform"])
    mu_s = statistics.mean(rows["searched"])
    sd_u = statistics.stdev(rows["uniform"]) if args.repeats > 1 else 0.0
    sd_s = statistics.stdev(rows["searched"]) if args.repeats > 1 else 0.0
    noise = max(sd_u, sd_s)
    sep = (mu_u - mu_s) / noise if noise > 0 else float("inf")

    out = {
        "uniform_ddim4": uniform, "searched": searched,
        "search_time_fid": search_fid,
        "num_samples": args.num_samples, "repeats": args.repeats,
        "uniform_fids": rows["uniform"], "searched_fids": rows["searched"],
        "uniform_mean": mu_u, "uniform_std": sd_u,
        "searched_mean": mu_s, "searched_std": sd_s,
        "improvement": mu_u - mu_s, "separation_sigma": sep,
        "beats_noise": bool(mu_s + 2 * noise < mu_u - 2 * noise),
    }

    if not args.skip_deploy:
        # deployment path: adt sample --use_timestep + adt evaluate
        npz = os.path.join(ws, "deploy_samples.npz")
        env = dict(os.environ, PYTHONPATH=REPO + ":" +
                   os.environ.get("PYTHONPATH", ""))
        subprocess.run(
            [sys.executable, "-c",
             "import sys; from autodiffusion_tpu.cli.main import main; "
             "sys.exit(main())",
             "sample", "--model_path", args.ema,
             "--use_timestep", str(list(searched)),
             "--num_samples", str(args.num_samples),
             "--batch_size", str(args.batch_size), "--seed", "31337",
             "--out", npz, "--image_size", "32", "--num_channels", "64",
             "--num_res_blocks", "2", "--attention_resolutions", "16,8",
             "--class_cond", "False", "--learn_sigma", "True",
             "--noise_schedule", "cosine"],
            check=True, env=env)
        ev = subprocess.run(
            [sys.executable, "-c",
             "import sys; from autodiffusion_tpu.cli.main import main; "
             "sys.exit(main())",
             "evaluate", "--sample_batch", npz,
             "--ref_stats", os.path.join(ws, "ref_stats.npz"),
             "--inception_path", os.path.join(ws, "pt_inception.pth"),
             "--batch_size", "100"],
            check=True, env=env, capture_output=True, text=True)
        print(ev.stdout, flush=True)
        deploy_fid = None
        for line in ev.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                deploy_fid = json.loads(line).get("fid")
        out["deploy_fid"] = deploy_fid
        if deploy_fid is not None:
            out["deploy_within_noise"] = bool(
                abs(deploy_fid - mu_s) <= max(4 * noise, 0.05 * mu_s))

    with open(os.path.join(ws, "proof.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
