"""Fabricate full-scale SD v1 checkpoints for the on-chip SD search-hours run.

Random (seeded) weights at the exact published shapes — UNet 860M + VAE +
CLIP text tower as an own-format msgpack dir (the `adt convert --preset sd`
layout that cmd_search_sd's _sd_stack loads), a synthetic byte-level CLIP
vocab/merges pair (the real OpenAI files are unavailable offline; ids stay
in-range of the full 49408-token embedding), a COCO-format captions JSON,
a pt_inception-style .pth and a PSD reference-stats npz. Zero-FLOP-identical
to real checkpoints; FID values are meaningless but wall-clock, compile and
HBM behavior are the real thing (same doctrine as make_ckpts.py).
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

OUT = os.path.dirname(os.path.abspath(__file__))

CAPTION_WORDS = ("a photo of", "an oil painting of", "a sketch of",
                 "a close-up of", "a render of")
CAPTION_SUBJECTS = ("a red bicycle", "two dogs on a beach", "a city at night",
                    "a bowl of fruit", "a mountain lake", "an old train",
                    "a cat wearing a hat", "a wooden bridge")


def _random_tree(shapes, rng):
    return jax.tree_util.tree_map(
        lambda s: (rng.randn(*s.shape) * 0.02).astype(s.dtype), shapes)


def main():
    from test_inception_loader import synthesize_torch_state
    import torch

    from autodiffusion_tpu.fid import FIDInceptionV3, FIDStats
    from autodiffusion_tpu.models import (AutoencoderKL, CLIPTextConfig,
                                          CLIPTextEncoder, SDUNetModel)
    from autodiffusion_tpu.models.clip_text import _bytes_to_unicode
    from autodiffusion_tpu.utils.checkpoint import save_tree

    rng = np.random.RandomState(0)
    ckpt_dir = f"{OUT}/sd_ckpt"
    os.makedirs(ckpt_dir, exist_ok=True)

    # the three towers, initialized with the exact eval_shape arguments
    # load_sd_params_dir replays (models/sd_convert.py:234-256) so the
    # saved trees restore without a shape miss
    unet = SDUNetModel()
    vae = AutoencoderKL()
    clip_cfg = CLIPTextConfig()
    clip = CLIPTextEncoder(clip_cfg)
    ds = 8 * 2 ** (len(unet.channel_mult) - 1)
    specs = (
        ("sd_unet", unet, (jnp.zeros((1, ds, ds, unet.in_channels)),
                           jnp.zeros((1,)),
                           jnp.zeros((1, 2, unet.context_dim)))),
        ("sd_vae", vae, (jnp.zeros((1, 2 ** len(vae.ch_mult) * 2,
                                    2 ** len(vae.ch_mult) * 2, 3)),)),
        ("sd_clip", clip, (jnp.zeros((1, clip_cfg.max_length), jnp.int32),)),
    )
    for name, model, args in specs:
        shapes = jax.eval_shape(lambda m=model, a=args: m.init(
            jax.random.key(0), *a))
        save_tree(f"{ckpt_dir}/{name}.msgpack", _random_tree(shapes, rng))
        print(f"{name}.msgpack", flush=True)

    # synthetic byte-level CLIP vocab (tests/test_clip_tokenizer.py fixture)
    merges = [("h", "e"), ("t", "he</w>"), ("he", "r"), ("o", "f</w>"),
              ("a", "n</w>"), ("1", "2")]
    chars = list(_bytes_to_unicode().values())
    tokens = chars + [c + "</w>" for c in chars] + \
        ["".join(m) for m in merges] + ["<|startoftext|>", "<|endoftext|>"]
    with open(f"{OUT}/vocab.json", "w") as f:
        json.dump({t: i for i, t in enumerate(tokens)}, f)
    with open(f"{OUT}/merges.txt", "w") as f:
        f.write("#version: 0.2\n" +
                "\n".join(f"{a} {b}" for a, b in merges) + "\n")
    print("vocab.json merges.txt", flush=True)

    caps = [{"image_id": i,
             "caption": f"{CAPTION_WORDS[i % len(CAPTION_WORDS)]} "
                        f"{CAPTION_SUBJECTS[(i * 3) % len(CAPTION_SUBJECTS)]} "
                        f"variant {i}"}
            for i in range(128)]
    with open(f"{OUT}/captions.json", "w") as f:
        json.dump(caps, f)
    print("captions.json", flush=True)

    ishapes = jax.eval_shape(lambda: FIDInceptionV3().init(
        jax.random.key(2), jnp.zeros((1, 299, 299, 3))))
    sd = synthesize_torch_state(
        jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), ishapes),
        rng)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               f"{OUT}/pt_inception.pth")
    print("pt_inception.pth", flush=True)

    a = rng.randn(4096, 2048).astype(np.float64)
    FIDStats(a.mean(0) * 10 + 5, np.cov(a, rowvar=False)).save(
        f"{OUT}/ref_stats.npz")
    print("ref_stats.npz", flush=True)


if __name__ == "__main__":
    main()
