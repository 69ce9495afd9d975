"""ADM UNet family: shapes, masking semantics, torch output parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.models import (ModelConfig, UNetModel, attention_ds,
                                      create_model, unet_layer_count)
from autodiffusion_tpu.models.convert import convert_classifier, convert_unet

pytestmark = pytest.mark.slow

TINY = dict(model_channels=32, out_channels=3, num_res_blocks=1,
            attention_ds=(2,), channel_mult=(1, 2), num_head_channels=32,
            use_scale_shift_norm=True, resblock_updown=True,
            use_new_attention_order=True)


def tiny_model(**over):
    kw = dict(TINY)
    kw.update(over)
    return UNetModel(**kw)


class TestShapes:
    def test_forward_shape_uncond(self):
        m = tiny_model()
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.array([3.0, 500.0])
        params = m.init(jax.random.key(0), x, t)
        out = m.apply(params, x, t)
        assert out.shape == (2, 16, 16, 3)
        assert out.dtype == jnp.float32

    def test_class_cond_requires_y(self):
        m = tiny_model(num_classes=10)
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.array([3.0, 500.0])
        with pytest.raises(AssertionError):
            m.init(jax.random.key(0), x, t)
        params = m.init(jax.random.key(0), x, t, jnp.array([1, 2]))
        out = m.apply(params, x, t, jnp.array([1, 2]))
        assert out.shape == (2, 16, 16, 3)

    def test_layer_count_adm64_is_58(self):
        # verified against reference Dynamic_UNetModel(..., ADM-64 flags).layer_num;
        # consistent with skip indices up to 56 in the published artifact
        cfg = ModelConfig.adm64()
        n = unet_layer_count(cfg.num_res_blocks,
                             (1, 2, 3, 4),
                             attention_ds(64, cfg.attention_resolutions),
                             cfg.resblock_updown)
        assert n == 58
        assert create_model(cfg).layer_num == 58


class TestMasking:
    def _setup(self):
        m = tiny_model()
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
        t = jnp.array([3.0, 500.0])
        params = m.init(jax.random.key(0), x, t)
        # zero-init residual projections make the net the identity at init;
        # perturb every leaf so masking tests see non-degenerate activations
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.key(7), len(leaves))
        params = jax.tree_util.tree_unflatten(
            treedef,
            [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
             for l, k in zip(leaves, keys)])
        return m, params, x, t

    def test_all_ones_mask_is_identity(self):
        m, params, x, t = self._setup()
        base = m.apply(params, x, t)
        masked = m.apply(params, x, t, keep_mask=jnp.ones(m.layer_num))
        np.testing.assert_allclose(np.asarray(base), np.asarray(masked), atol=1e-6)

    def test_mask_zero_equals_structural_skip(self):
        m, params, x, t = self._setup()
        skip = frozenset({0, 2, m.layer_num - 1})
        mask = jnp.ones(m.layer_num).at[jnp.array(sorted(skip))].set(0.0)
        masked = m.apply(params, x, t, keep_mask=mask)
        structural = m.apply(params, x, t, structural_skip=skip)
        np.testing.assert_allclose(np.asarray(masked), np.asarray(structural),
                                   atol=1e-5)

    def test_structural_skip_under_remat(self):
        """use_remat routes blocks through nn.remat; the STRUCTURAL_SKIP
        sentinel is a plain object and must bypass the remat boundary
        instead of crashing as a non-JAX traced argument."""
        m, params, x, t = self._setup()
        mr = tiny_model(use_remat=True)
        skip = frozenset({0, 2})
        structural = mr.apply(params, x, t, structural_skip=skip)
        plain = m.apply(params, x, t, structural_skip=skip)
        np.testing.assert_allclose(np.asarray(structural), np.asarray(plain),
                                   atol=1e-6)

    def test_skipping_changes_output(self):
        m, params, x, t = self._setup()
        base = m.apply(params, x, t)
        masked = m.apply(params, x, t,
                         keep_mask=jnp.ones(m.layer_num).at[1].set(0.0))
        assert np.abs(np.asarray(base) - np.asarray(masked)).max() > 1e-6


@pytest.fixture(scope="module")
def torch_pair(request):
    """(torch reference tiny UNet, converted flax params, inputs)."""
    conftest_ref = request.getfixturevalue("reference_gd")  # noqa: F841
    import torch
    from guided_diffusion.unet import UNetModel as TorchUNet

    torch.manual_seed(0)
    tm = TorchUNet(
        image_size=16, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(2,), dropout=0.0,
        channel_mult=(1, 2), num_classes=10, use_checkpoint=False,
        use_fp16=False, num_heads=1, num_head_channels=32,
        num_heads_upsample=-1, use_scale_shift_norm=True, resblock_updown=True,
        use_new_attention_order=True,
    )
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    fm = tiny_model(num_classes=10)
    params = convert_unet(sd, fm)

    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([17.0, 901.0], dtype=np.float32)
    y = np.array([3, 7])
    return tm, fm, params, x, t, y


class TestTorchParity:
    def test_unet_output_matches(self, torch_pair):
        import torch
        tm, fm, params, x, t, y = torch_pair
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t),
                     torch.from_numpy(y)).numpy()
        ours = fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(t), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                                   atol=2e-4, rtol=2e-4)

    def test_legacy_attention_order_matches(self, reference_gd):
        import torch
        from guided_diffusion.unet import UNetModel as TorchUNet
        torch.manual_seed(1)
        tm = TorchUNet(image_size=16, in_channels=3, model_channels=32,
                       out_channels=3, num_res_blocks=1,
                       attention_resolutions=(1, 2), dropout=0.0,
                       channel_mult=(1, 2), num_classes=None,
                       use_checkpoint=False, use_fp16=False, num_heads=2,
                       num_head_channels=-1, num_heads_upsample=-1,
                       use_scale_shift_norm=False, resblock_updown=False,
                       use_new_attention_order=False)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        fm = tiny_model(attention_ds=(1, 2), num_heads=2, num_head_channels=-1,
                        use_scale_shift_norm=False, resblock_updown=False,
                        use_new_attention_order=False)
        params = convert_unet(sd, fm)
        x = np.random.RandomState(2).randn(2, 3, 16, 16).astype(np.float32)
        t = np.array([0.0, 999.0], dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        ours = fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                                   atol=2e-4, rtol=2e-4)

    def test_dynamic_skip_matches_reference(self, reference_gd):
        import torch
        from guided_diffusion.dynamic_unet import Dynamic_UNetModel
        torch.manual_seed(2)
        tm = Dynamic_UNetModel(
            image_size=16, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(2,), dropout=0.0,
            channel_mult=(1, 2), num_classes=None, use_checkpoint=False,
            use_fp16=False, num_heads=1, num_head_channels=32,
            num_heads_upsample=-1, use_scale_shift_norm=True,
            resblock_updown=True, use_new_attention_order=True)
        tm.eval()
        fm = tiny_model()
        assert tm.layer_num == fm.layer_num
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = convert_unet(sd, fm)
        x = np.random.RandomState(3).randn(2, 3, 16, 16).astype(np.float32)
        t = np.array([101.0, 767.0], dtype=np.float32)
        skip = [0, 2, 5]
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t),
                     skip_layer=skip).numpy()
        mask = jnp.ones(fm.layer_num).at[jnp.array(skip)].set(0.0)
        ours = fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(t), keep_mask=mask)
        np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                                   atol=2e-4, rtol=2e-4)

    def test_classifier_matches(self, reference_gd):
        import torch
        from guided_diffusion.unet import EncoderUNetModel as TorchEnc
        from autodiffusion_tpu.models import EncoderUNetModel
        torch.manual_seed(3)
        tm = TorchEnc(image_size=16, in_channels=3, model_channels=32,
                      out_channels=10, num_res_blocks=1,
                      attention_resolutions=(2,), channel_mult=(1, 2),
                      use_fp16=False, num_head_channels=32,
                      use_scale_shift_norm=True, resblock_updown=True,
                      pool="attention")
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        fm = EncoderUNetModel(model_channels=32, out_channels=10,
                              num_res_blocks=1, attention_ds=(2,),
                              channel_mult=(1, 2), num_head_channels=32,
                              use_scale_shift_norm=True, resblock_updown=True,
                              use_new_attention_order=False, pool="attention")
        params = convert_classifier(sd, fm)
        x = np.random.RandomState(4).randn(2, 3, 16, 16).astype(np.float32)
        t = np.array([55.0, 444.0], dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        ours = fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)

    @pytest.mark.parametrize("pool", ["spatial", "spatial_v2"])
    def test_spatial_pool_classifier_matches(self, reference_gd, pool):
        """Spatial pooling appends one feature per input_blocks MODULE
        (conv_in, each res(+attn) pair, each downsample) plus the middle
        block (unet.py:880-891) — per-level pooling has the wrong
        concatenated width."""
        import torch
        from guided_diffusion.unet import EncoderUNetModel as TorchEnc

        from autodiffusion_tpu.models import EncoderUNetModel
        torch.manual_seed(5)
        tm = TorchEnc(image_size=16, in_channels=3, model_channels=32,
                      out_channels=10, num_res_blocks=1,
                      attention_resolutions=(2,), channel_mult=(1, 2),
                      use_fp16=False, num_head_channels=32,
                      use_scale_shift_norm=True, resblock_updown=True,
                      pool=pool)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        fm = EncoderUNetModel(model_channels=32, out_channels=10,
                              num_res_blocks=1, attention_ds=(2,),
                              channel_mult=(1, 2), num_head_channels=32,
                              use_scale_shift_norm=True, resblock_updown=True,
                              use_new_attention_order=False, pool=pool)
        params = convert_classifier(sd, fm)
        x = np.random.RandomState(6).randn(2, 3, 16, 16).astype(np.float32)
        t = np.array([55.0, 444.0], dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        ours = fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)
