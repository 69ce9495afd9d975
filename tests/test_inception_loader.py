"""FID Inception weight loader: synthesized pt_inception-style checkpoint.

The real pt_inception-2015-12-05 file isn't available offline; this
synthesizes a state dict with the exact key/shape layout (derived by
inverse-transposing the flax param tree) and checks the loader maps every
parameter and that BN folding is numerically correct.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.fid import FIDInceptionV3, load_fid_inception_params


def synthesize_torch_state(flax_params, rng):
    """flax param tree -> torch-style {name: array} with BN stats."""
    sd = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if k == "conv" and "kernel" in v:
                kh, kw, cin, cout = v["kernel"].shape
                sd[f"{name}.weight"] = rng.randn(cout, cin, kh, kw).astype(np.float32) * 0.05
                sd[name.replace(".conv", ".bn") + ".weight"] = \
                    rng.rand(cout).astype(np.float32) + 0.5
                sd[name.replace(".conv", ".bn") + ".bias"] = \
                    rng.randn(cout).astype(np.float32) * 0.1
                sd[name.replace(".conv", ".bn") + ".running_mean"] = \
                    rng.randn(cout).astype(np.float32) * 0.1
                sd[name.replace(".conv", ".bn") + ".running_var"] = \
                    rng.rand(cout).astype(np.float32) + 0.5
            elif k == "fc":
                cin, cout = v["kernel"].shape
                sd["fc.weight"] = rng.randn(cout, cin).astype(np.float32) * 0.02
                sd["fc.bias"] = rng.randn(cout).astype(np.float32) * 0.02
            elif isinstance(v, dict):
                walk(v, name)

    walk(flax_params["params"], "")
    return sd


class TestInceptionLoader:
    def test_loader_covers_every_parameter(self, tmp_path):
        torch = pytest.importorskip("torch")
        model = FIDInceptionV3()
        ref_shapes = jax.eval_shape(
            lambda: model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3))))
        rng = np.random.RandomState(0)
        sd = synthesize_torch_state(
            jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype),
                                   ref_shapes), rng)
        path = str(tmp_path / "pt_inception_fake.pth")
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

        params = load_fid_inception_params(path)
        # same tree structure and shapes as a fresh init
        got = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
        want = jax.tree_util.tree_map(lambda s: s.shape, ref_shapes)
        assert got == want

        # BN folding correctness on one conv: y = (conv(x)-m)/sqrt(v+eps)*g+b
        out = model.apply(params, jnp.zeros((1, 299, 299, 3)))
        assert np.isfinite(np.asarray(out["pool3"])).all()
        k = params["params"]["Conv2d_1a_3x3"]["conv"]
        g, b = sd["Conv2d_1a_3x3.bn.weight"], sd["Conv2d_1a_3x3.bn.bias"]
        m, v = sd["Conv2d_1a_3x3.bn.running_mean"], sd["Conv2d_1a_3x3.bn.running_var"]
        scale = g / np.sqrt(v + 1e-3)
        np.testing.assert_allclose(np.asarray(k["bias"]), b - m * scale,
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(k["kernel"]),
            sd["Conv2d_1a_3x3.conv.weight"].transpose(2, 3, 1, 0)
            * scale[None, None, None, :], rtol=1e-6)
