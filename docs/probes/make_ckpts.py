"""Fabricate full-scale ADM-64 checkpoints for the on-chip search-hours run.

Random (seeded) weights at the exact published shapes: UNet + classifier as
own-format msgpack, pt_inception-style .pth, and a PSD reference-stats npz.
Zero-FLOP-identical to real checkpoints; FID values are meaningless but the
wall-clock, compile-cache and HBM behavior are the real thing.
"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

OUT = os.path.dirname(os.path.abspath(__file__))


def main():
    from test_inception_loader import synthesize_torch_state
    import torch

    from autodiffusion_tpu.fid import FIDInceptionV3, FIDStats
    from autodiffusion_tpu.models import (ClassifierConfig, ModelConfig,
                                          create_classifier, create_model)
    from autodiffusion_tpu.utils.checkpoint import save_tree

    rng = np.random.RandomState(0)

    cfg = ModelConfig.adm64()
    model = create_model(cfg)
    x1 = jnp.zeros((1, 64, 64, 3))
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.key(0), x1, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32)))
    params = jax.tree_util.tree_map(
        lambda s: (rng.randn(*s.shape) * 0.02).astype(s.dtype), shapes)
    save_tree(f"{OUT}/model.msgpack", params)
    print("model.msgpack", flush=True)

    clf = create_classifier(ClassifierConfig.adm64())
    cshapes = jax.eval_shape(lambda: clf.init(
        jax.random.key(1), x1, jnp.zeros((1,))))
    cparams = jax.tree_util.tree_map(
        lambda s: (rng.randn(*s.shape) * 0.02).astype(s.dtype), cshapes)
    save_tree(f"{OUT}/classifier.msgpack", cparams)
    print("classifier.msgpack", flush=True)

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
