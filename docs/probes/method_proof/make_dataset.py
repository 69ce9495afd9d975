"""Synthesize a structured 32x32 image dataset for the method-level proof.

Round-4 goal (VERDICT r3 "What's missing" #1): demonstrate that the rebuilt
evolutionary search descends a REAL generative-quality landscape — which
needs a *trained* diffusion model, which needs a dataset. No real image
dataset exists in this zero-egress sandbox, so we synthesize a structured
family the reference method's FID machinery can meaningfully score:
anti-aliased geometric shapes with top-light shading over smooth gradient
backgrounds. The distribution has sharp edges, flat regions, long-range
color correlations and consistent lighting — a small ADM UNet learns it
well, and a starved sampling schedule (uniform 4-step DDIM) visibly and
*measurably* degrades it.

Outputs (under the workspace dir):
  data/train/*.png   training images (adt train's load_data reads image dirs)
  ref_images.npz     held-out images for adt ref-stats (FID reference)
  pt_inception.pth   seeded random-weight FID InceptionV3 (see note below)

Feature-extractor note: the published pt_inception weights are not
downloadable here. FID through a *fixed random* InceptionV3 is still a
genuine distributional distance — random conv features discriminate image
statistics (the standard random-feature FID robustness result) — and, most
importantly, the landscape over sampling schedules is real because the
GENERATOR is trained. Matches evaluator_v1.py:652-679's role in
search_imagenet64_classifier_guidance.py:308-376.
"""
import argparse
import os
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

H = 32


def _smoothstep(d, width=0.75):
    """0->1 transition of `width` pixels around d=0 (anti-aliased edges)."""
    t = np.clip(d / width + 0.5, 0.0, 1.0)
    return t * t * (3 - 2 * t)


def render_one(rng: np.random.RandomState) -> np.ndarray:
    yy, xx = np.mgrid[0:H, 0:H].astype(np.float32) / (H - 1)
    # smooth linear-gradient background between two correlated colors
    base = rng.uniform(0.15, 0.85, 3).astype(np.float32)
    c0 = np.clip(base + rng.uniform(-0.15, 0.15, 3), 0, 1).astype(np.float32)
    c1 = np.clip(base + rng.uniform(-0.15, 0.15, 3), 0, 1).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi)
    t = np.cos(ang) * xx + np.sin(ang) * yy
    t = (t - t.min()) / max(t.max() - t.min(), 1e-6)
    img = c0 + t[..., None] * (c1 - c0)

    for _ in range(rng.randint(1, 4)):
        color = rng.uniform(0.0, 1.0, 3).astype(np.float32)
        cx, cy = rng.uniform(5, H - 5, 2)
        r = rng.uniform(3.0, 8.0)
        kind = rng.randint(3)
        dx, dy = (xx * (H - 1) - cx), (yy * (H - 1) - cy)
        if kind == 0:        # circle
            d = r - np.sqrt(dx * dx + dy * dy)
        elif kind == 1:      # rotated square
            a = rng.uniform(0, np.pi / 2)
            ux = np.cos(a) * dx + np.sin(a) * dy
            uy = -np.sin(a) * dx + np.cos(a) * dy
            d = r * 0.9 - np.maximum(np.abs(ux), np.abs(uy))
        else:                # upward triangle (3 half-planes)
            a = rng.uniform(0, 2 * np.pi / 3)
            d = np.full_like(dx, np.inf)
            for k in range(3):
                th = a + k * 2 * np.pi / 3
                d = np.minimum(d, r * 0.7 - (np.cos(th) * dx + np.sin(th) * dy))
        m = _smoothstep(d)[..., None]
        # consistent top-light shading (light source at image top)
        shade = np.clip(1.0 - 0.35 * np.clip(dy / max(r, 1e-3), -1, 1), 0, 1)
        img = img * (1 - m) + m * (color * shade[..., None])

    img = img + rng.normal(0.0, 0.008, img.shape).astype(np.float32)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def gen_images(n: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return np.stack([render_one(rng) for _ in range(n)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/method_proof")
    ap.add_argument("--n_train", type=int, default=20000)
    ap.add_argument("--n_ref", type=int, default=10000)
    args = ap.parse_args()

    from PIL import Image
    train_dir = os.path.join(args.out, "data", "train")
    os.makedirs(train_dir, exist_ok=True)

    train = gen_images(args.n_train, seed=1234)
    for i, im in enumerate(train):
        Image.fromarray(im).save(os.path.join(train_dir, f"img_{i:06d}.png"))
    print(f"wrote {args.n_train} train pngs -> {train_dir}", flush=True)
    # same images as a bulk npy for the native (C++ mmap+prefetch) loader —
    # `adt train --data_dir .../train_images.npy`
    np.save(os.path.join(args.out, "train_images.npy"), train)
    print("wrote train_images.npy", flush=True)

    ref = gen_images(args.n_ref, seed=987654)  # held out from training
    np.savez(os.path.join(args.out, "ref_images.npz"), arr_0=ref)
    print(f"wrote {args.n_ref} ref images -> ref_images.npz", flush=True)

    # seeded random-weight FID inception (same fabrication as the
    # search-hours probes, docs/probes/make_ckpts.py)
    import jax
    import jax.numpy as jnp
    import torch
    from test_inception_loader import synthesize_torch_state

    from autodiffusion_tpu.fid import FIDInceptionV3

    ishapes = jax.eval_shape(lambda: FIDInceptionV3().init(
        jax.random.key(2), jnp.zeros((1, 299, 299, 3))))
    sd = synthesize_torch_state(
        jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), ishapes),
        np.random.RandomState(0))
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               os.path.join(args.out, "pt_inception.pth"))
    print("wrote pt_inception.pth", flush=True)


if __name__ == "__main__":
    main()
