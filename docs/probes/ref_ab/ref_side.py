"""Reference-side timing: one get_cand_fid-equivalent on host CPU.

VERDICT r3 "Next round" #4: measure the PyTorch reference directly for the
"candidate FID evaluation >=10x faster per chip" BASELINE claim. No GPU
exists here, but the reference runs on CPU (gloo path, dist_util.py:30), so
a same-host CPU A/B of one candidate evaluation at small num_samples vs
`adt` CPU-mode turns the claim's reference side from estimated to measured.

This harness drives the REFERENCE CODE (imported from /root/reference) down
the exact phases of EvolutionSearcher.get_cand_fid
(search_imagenet64_classifier_guidance.py:308-376):

  reset:  SpacedDiffusion rebuild for the candidate (reset_diffusion :200-255
          is the in-place form of create_gaussian_diffusion+space_timesteps)
  sample: classifier-guided DDIM loop — cond_fn = autograd.grad of classifier
          log-prob (:319-326), ddim_sample_loop (:341-351), uint8 + all_gather
          (:352-361)
  fid:    InceptionV3 pool3 features + Frechet. The reference's TF frozen
          graph (classify_image_graph_def.pb) is git-LFS-missing and this
          sandbox has zero egress, so the feature extractor is the torch
          InceptionV3 with the pytorch_fid graph (the reference's OWN choice
          on its SD side, sd/scripts/search_ea.py:95-182) at matched batch
          size; Frechet via the reference's FIDStatistics (scipy sqrtm,
          evaluator_v1.py:109-157). Random weights (no checkpoints offline):
          FID values are meaningless, wall-clock is real.

Writes ref_ab_ref.json: per-phase seconds + per-candidate/per-sample cost.
"""
import argparse
import json
import os
import sys
import time
import types

# blobfile is absent in this sandbox; the reference only uses BlobFile for
# checkpoint IO which this harness never touches (random weights)
bf = types.ModuleType("blobfile")
bf.BlobFile = open
sys.modules.setdefault("blobfile", bf)

sys.path.insert(0, "/root/reference/examples/guided_diffusion")

import numpy as np  # noqa: E402
import torch as th  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_samples", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--time_step", type=int, default=4)
    ap.add_argument("--classifier_scale", type=float, default=1.0)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch CPU threads (0 = library default)")
    ap.add_argument("--out", default="ref_ab_ref.json")
    args = ap.parse_args()
    if args.threads:
        th.set_num_threads(args.threads)

    os.environ.setdefault("RANK", "0")
    os.environ.setdefault("WORLD_SIZE", "1")
    os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
    os.environ.setdefault("MASTER_PORT", "29871")

    from guided_diffusion import dist_util, logger
    from guided_diffusion.script_util import (classifier_defaults,
                                              create_classifier,
                                              create_gaussian_diffusion,
                                              create_model)
    import torch.distributed as dist

    dist_util.setup_dist()
    logger.configure()

    th.manual_seed(0)
    # published ADM-64 model flags (search_imagenet64_classifier_guidance.sh)
    model = create_model(
        image_size=64, num_channels=192, num_res_blocks=3,
        channel_mult="", learn_sigma=True, class_cond=True,
        use_checkpoint=False, attention_resolutions="32,16,8",
        num_heads=4, num_head_channels=64, num_heads_upsample=-1,
        use_scale_shift_norm=True, dropout=0.0, resblock_updown=True,
        use_fp16=False, use_new_attention_order=True)
    model.eval()
    cdef = classifier_defaults()
    cdef["image_size"] = 64
    classifier = create_classifier(**cdef)
    classifier.eval()

    cand = None  # uniform ddim-K: identical cost to any K-subset candidate

    # --- phase 1: reset (SpacedDiffusion coefficient rebuild) ---
    t0 = time.time()
    diffusion = create_gaussian_diffusion(
        steps=1000, learn_sigma=True, noise_schedule="cosine",
        timestep_respacing=f"ddim{args.time_step}")
    reset_time = time.time() - t0

    # --- phase 2: guided DDIM sampling (get_cand_fid :319-361) ---
    def cond_fn(x, t, y=None):
        with th.enable_grad():
            x_in = x.detach().requires_grad_(True)
            logits = classifier(x_in, t)
            log_probs = F.log_softmax(logits, dim=-1)
            selected = log_probs[range(len(logits)), y.view(-1)]
            return th.autograd.grad(selected.sum(), x_in)[0] \
                * args.classifier_scale

    def model_fn(x, t, y=None):
        return model(x, t, y)

    t0 = time.time()
    all_images = []
    with th.no_grad():
        while len(all_images) * args.batch_size < args.num_samples:
            classes = th.randint(0, 1000, (args.batch_size,),
                                 device=dist_util.dev())
            sample = diffusion.ddim_sample_loop(
                model_fn, (args.batch_size, 3, 64, 64), clip_denoised=True,
                model_kwargs={"y": classes}, cond_fn=cond_fn,
                device=dist_util.dev())
            sample = ((sample + 1) * 127.5).clamp(0, 255).to(th.uint8)
            sample = sample.permute(0, 2, 3, 1).contiguous()
            gathered = [th.zeros_like(sample)
                        for _ in range(dist.get_world_size())]
            dist.all_gather(gathered, sample)
            all_images.extend(s.cpu().numpy() for s in gathered)
            print(f"created {len(all_images) * args.batch_size} samples",
                  flush=True)
    arr = np.concatenate(all_images)[: args.num_samples]
    dist.barrier()
    sample_time = time.time() - t0

    # --- phase 3: FID (torch InceptionV3 substitution, see docstring) ---
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tests")
    from test_inception_loader import synthesize_torch_state
    import jax

    from autodiffusion_tpu.fid import FIDInceptionV3
    from autodiffusion_tpu.fid.torch_mirror import build_torch_mirror

    ishapes = jax.eval_shape(lambda: FIDInceptionV3().init(
        jax.random.key(2), jax.numpy.zeros((1, 299, 299, 3))))
    sd = synthesize_torch_state(
        jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), ishapes),
        np.random.RandomState(0))
    tmodel = build_torch_mirror()
    tmodel.load_state_dict({k: th.from_numpy(v) for k, v in sd.items()},
                           strict=False)
    tmodel.eval()

    t0 = time.time()
    feats = []
    with th.no_grad():
        for i in range(0, len(arr), 64):   # cal_fid batch 64 (evaluator_v1)
            x = th.from_numpy(arr[i:i + 64]).float().permute(0, 3, 1, 2)
            x = x / 127.5 - 1.0
            x = F.interpolate(x, size=(299, 299), mode="bilinear",
                              align_corners=False)
            feats.append(tmodel(x)["pool3"].numpy())
    feats = np.concatenate(feats)
    from evaluations.evaluator_v1 import FIDStatistics
    mu, sigma = feats.mean(0), np.cov(feats, rowvar=False)
    rng = np.random.RandomState(1)
    ra = rng.randn(4096, feats.shape[1])
    ref = FIDStatistics(ra.mean(0), np.cov(ra, rowvar=False))
    fid = ref.frechet_distance(FIDStatistics(mu, sigma))
    fid_time = time.time() - t0

    total = reset_time + sample_time + fid_time
    out = {
        "harness": "reference (torch CPU, gloo single-proc)",
        "num_samples": args.num_samples, "batch_size": args.batch_size,
        "time_step": args.time_step, "torch_threads": th.get_num_threads(),
        "reset_time_s": reset_time, "sample_time_s": sample_time,
        "fid_time_s": fid_time, "total_s": total,
        "per_sample_s": total / args.num_samples,
        "sample_per_sample_s": sample_time / args.num_samples,
        "fid": float(fid),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
