"""SD stack parity: UNet w/ cross-attention, VAE, CLIP text encoder."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.models import (AutoencoderKL, CLIPTextConfig,
                                      CLIPTextEncoder, SDUNetModel)
from autodiffusion_tpu.models.clip_text import convert_clip_text
from autodiffusion_tpu.models.sd_convert import convert_sd_unet, convert_vae

pytestmark = pytest.mark.slow

SD_REF = "/root/reference/examples/Stable Diffusion"


@pytest.fixture(scope="module")
def sd_ref():
    import os
    import types
    if not os.path.isdir(SD_REF):
        pytest.skip("SD reference not available")
    if SD_REF not in sys.path:
        sys.path.insert(0, SD_REF)
    # stub deps of the reference that aren't installed here
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        om.listconfig = lc
        om.ListConfig = ListConfig
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc
    return SD_REF


class TestSDUNetParity:
    def test_tiny_sd_unet_matches(self, sd_ref):
        import torch
        from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchSDUNet
        torch.manual_seed(0)
        tm = TorchSDUNet(
            image_size=8, in_channels=4, model_channels=32, out_channels=4,
            num_res_blocks=1, attention_resolutions=(1, 2), dropout=0.0,
            channel_mult=(1, 2), conv_resample=True, num_heads=2,
            use_spatial_transformer=True, transformer_depth=1,
            context_dim=16, legacy=False, use_fp16=False)
        tm.eval()
        fm = SDUNetModel(in_channels=4, model_channels=32, out_channels=4,
                         num_res_blocks=1, attention_ds=(1, 2),
                         channel_mult=(1, 2), num_heads=2,
                         transformer_depth=1, context_dim=16)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = convert_sd_unet(sd, fm, prefix="")

        rng = np.random.RandomState(0)
        x = rng.randn(2, 4, 8, 8).astype(np.float32)
        t = np.array([10.0, 700.0], dtype=np.float32)
        ctx = rng.randn(2, 5, 16).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x), torch.from_numpy(t),
                      context=torch.from_numpy(ctx)).numpy()
        got = fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(t), jnp.asarray(ctx))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                                   atol=3e-4, rtol=3e-4)

    def test_num_head_channels_variant_matches(self, sd_ref):
        """The class-cond LDM configs set num_head_channels (heads vary
        per level, cin-ldm-vq-f8.yaml) instead of num_heads; parity of
        the per-block heads computation."""
        import torch
        from ldm.modules.diffusionmodules.openaimodel import \
            UNetModel as TorchSDUNet
        torch.manual_seed(11)
        tm = TorchSDUNet(
            image_size=8, in_channels=4, model_channels=32, out_channels=4,
            num_res_blocks=1, attention_resolutions=(1, 2), dropout=0.0,
            channel_mult=(1, 2), conv_resample=True, num_heads=-1,
            num_head_channels=16, use_spatial_transformer=True,
            transformer_depth=1, context_dim=16, legacy=False,
            use_fp16=False)
        tm.eval()
        fm = SDUNetModel(in_channels=4, model_channels=32, out_channels=4,
                         num_res_blocks=1, attention_ds=(1, 2),
                         channel_mult=(1, 2), num_head_channels=16,
                         transformer_depth=1, context_dim=16)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = convert_sd_unet(sd, fm, prefix="")
        rng = np.random.RandomState(12)
        x = rng.randn(2, 4, 8, 8).astype(np.float32)
        t = np.array([10.0, 700.0], dtype=np.float32)
        ctx = rng.randn(2, 3, 16).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x), torch.from_numpy(t),
                      context=torch.from_numpy(ctx)).numpy()
        got = fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(t), jnp.asarray(ctx))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=3e-4, rtol=3e-4)


class TestVAEParity:
    def test_tiny_autoencoder_matches(self, sd_ref):
        # ldm.models.autoencoder needs pytorch_lightning/taming (absent);
        # test against its building blocks (diffusionmodules/model.py
        # Encoder/Decoder) + explicit quant convs — the same state-dict
        # layout AutoencoderKL produces.
        import torch
        from ldm.modules.diffusionmodules.model import Decoder as TorchDec
        from ldm.modules.diffusionmodules.model import Encoder as TorchEnc
        dd = dict(double_z=True, z_channels=4, resolution=32, in_channels=3,
                  out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                  attn_resolutions=[16], dropout=0.0)
        torch.manual_seed(1)
        te = TorchEnc(**dd)
        td = TorchDec(**dd)
        qc = torch.nn.Conv2d(8, 8, 1)
        pqc = torch.nn.Conv2d(4, 4, 1)
        for m in (te, td, qc, pqc):
            m.eval()
        sd = {}
        sd.update({f"encoder.{k}": v.detach().numpy()
                   for k, v in te.state_dict().items()})
        sd.update({f"decoder.{k}": v.detach().numpy()
                   for k, v in td.state_dict().items()})
        sd.update({f"quant_conv.{k}": v.detach().numpy()
                   for k, v in qc.state_dict().items()})
        sd.update({f"post_quant_conv.{k}": v.detach().numpy()
                   for k, v in pqc.state_dict().items()})

        # attn_resolutions in CompVis are *current resolutions* (16 = 32/2);
        # ours are downsample ratios: ds=2
        fm = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                           attn_at_ds=(2,), z_channels=4, embed_dim=4)
        params = convert_vae(sd, fm, prefix="")

        rng = np.random.RandomState(2)
        x = rng.randn(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            moments = qc(te(torch.from_numpy(x)))
            mean_t = moments.chunk(2, dim=1)[0]
            rec = td(pqc(mean_t)).numpy()
        mean, logvar = fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                method=fm.encode)
        np.testing.assert_allclose(np.asarray(mean).transpose(0, 3, 1, 2),
                                   mean_t.numpy(), atol=3e-4, rtol=3e-4)
        got = fm.apply(params, mean, method=fm.decode)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), rec,
                                   atol=3e-4, rtol=3e-4)


class TestUncondLDMUNetParity:
    def test_openaimodel_uncond_converts_via_adm_converter(self, sd_ref):
        """The unconditional LDM UNet (openaimodel with
        use_spatial_transformer=False — the celebahq/ffhq/lsun-churches
        first-stage-latent models) is structurally the guided-diffusion
        UNet, so models.convert.convert_unet maps its state dict onto our
        ADM UNetModel. Output parity on tiny shapes."""
        import torch
        from ldm.modules.diffusionmodules.openaimodel import \
            UNetModel as LDMUNet

        from autodiffusion_tpu.models import UNetModel
        from autodiffusion_tpu.models.convert import convert_unet

        torch.manual_seed(6)
        tm = LDMUNet(image_size=16, in_channels=3, model_channels=32,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(2,), dropout=0.0,
                     channel_mult=(1, 2), conv_resample=True, dims=2,
                     num_classes=None, use_checkpoint=False, use_fp16=False,
                     num_heads=2, num_head_channels=-1, num_heads_upsample=-1,
                     use_scale_shift_norm=False, resblock_updown=False,
                     use_new_attention_order=False,
                     use_spatial_transformer=False)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        fm = UNetModel(model_channels=32, out_channels=3, num_res_blocks=1,
                       attention_ds=(2,), channel_mult=(1, 2), num_heads=2,
                       num_head_channels=-1, use_scale_shift_norm=False,
                       resblock_updown=False, use_new_attention_order=False)
        params = convert_unet(sd, fm)

        rng = np.random.RandomState(7)
        x = rng.randn(2, 3, 16, 16).astype(np.float32)
        t = np.array([3.0, 700.0], dtype=np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        got = fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=3e-4, rtol=3e-4)


class TestVQParity:
    def test_tiny_vq_interface_matches(self, sd_ref):
        """VQModelInterface vs the reference building blocks: ldm
        Encoder/Decoder (double_z=False) + 1x1 quant convs + a torch
        mirror of taming VectorQuantizer2's inference path (taming is not
        installed; its forward is a 6-line nearest-codebook lookup,
        mirrored here the same way tests/test_inception_parity.py mirrors
        pytorch_fid). Covers autoencoder.py:264-282: encode returns the
        PRE-quant latent, decode quantizes."""
        import torch
        from ldm.modules.diffusionmodules.model import Decoder as TorchDec
        from ldm.modules.diffusionmodules.model import Encoder as TorchEnc

        from autodiffusion_tpu.models import VQModelInterface
        from autodiffusion_tpu.models.sd_convert import convert_vq

        dd = dict(double_z=False, z_channels=3, resolution=32, in_channels=3,
                  out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                  attn_resolutions=[16], dropout=0.0)
        n_embed, embed_dim = 64, 3
        torch.manual_seed(4)
        te, td = TorchEnc(**dd), TorchDec(**dd)
        qc = torch.nn.Conv2d(3, embed_dim, 1)
        pqc = torch.nn.Conv2d(embed_dim, 3, 1)
        codebook = torch.nn.Embedding(n_embed, embed_dim)
        codebook.weight.data.uniform_(-1.0 / n_embed, 1.0 / n_embed)
        for m in (te, td, qc, pqc):
            m.eval()

        def torch_quantize(z):   # VectorQuantizer2.forward inference math
            zf = z.permute(0, 2, 3, 1).reshape(-1, embed_dim)
            d = (zf.pow(2).sum(1, keepdim=True)
                 + codebook.weight.pow(2).sum(1)
                 - 2 * zf @ codebook.weight.t())
            idx = torch.argmin(d, dim=1)
            zq = codebook(idx).view(z.shape[0], z.shape[2], z.shape[3],
                                    embed_dim)
            return zq.permute(0, 3, 1, 2)

        sd = {}
        for pfx, m in (("encoder", te), ("decoder", td), ("quant_conv", qc),
                       ("post_quant_conv", pqc), ("quantize.embedding", codebook)):
            sd.update({f"{pfx}.{k}": v.detach().numpy()
                       for k, v in m.state_dict().items()})

        fm = VQModelInterface(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                              attn_at_ds=(2,), z_channels=3,
                              embed_dim=embed_dim, n_embed=n_embed)
        params = convert_vq(sd, fm, prefix="")

        rng = np.random.RandomState(5)
        x = rng.randn(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            h_t = qc(te(torch.from_numpy(x)))
            rec_t = td(pqc(torch_quantize(h_t))).numpy()
        h = fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     method=fm.encode)
        np.testing.assert_allclose(np.asarray(h).transpose(0, 3, 1, 2),
                                   h_t.numpy(), atol=3e-4, rtol=3e-4)
        got = fm.apply(params, h, method=fm.decode)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   rec_t, atol=3e-3, rtol=3e-3)
        # force_not_quantize path (ddim decode of non-codebook latents)
        raw = fm.apply(params, h, True, method=fm.decode)
        with torch.no_grad():
            want_raw = td(pqc(h_t)).numpy()
        np.testing.assert_allclose(np.asarray(raw).transpose(0, 3, 1, 2),
                                   want_raw, atol=3e-3, rtol=3e-3)


class TestClassConditionalLDM:
    def test_class_embedder_shape_and_lookup(self):
        from autodiffusion_tpu.models import ClassEmbedder
        m = ClassEmbedder(embed_dim=16, n_classes=10)
        p = m.init(jax.random.key(0), jnp.zeros((3,), jnp.int32))
        y = jnp.asarray([1, 7, 7])
        out = m.apply(p, y)
        assert out.shape == (3, 1, 16)
        # single-token context = the raw embedding row (modules.py:28-33)
        table = p["params"]["embedding"]["embedding"]
        np.testing.assert_allclose(np.asarray(out[:, 0]),
                                   np.asarray(table)[np.asarray(y)])
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out[2]))

    def test_class_conditional_ldm_pipeline_composes(self):
        """cin-ldm-vq-f8-style stack end to end on tiny shapes:
        ClassEmbedder context -> crossattn latent UNet -> DDIM scan ->
        VQ first-stage decode (quantizing)."""
        from autodiffusion_tpu.models import (ClassEmbedder, SDUNetModel,
                                              VQModelInterface)
        from autodiffusion_tpu.samplers import ddim_sample_loop
        from autodiffusion_tpu.samplers.diffusion import ModelVarType
        from autodiffusion_tpu.schedules import build_sd_tables

        unet = SDUNetModel(in_channels=4, model_channels=32, out_channels=4,
                           num_res_blocks=1, attention_ds=(1,),
                           channel_mult=(1, 2), num_heads=2, context_dim=16)
        emb = ClassEmbedder(embed_dim=16, n_classes=10)
        vq = VQModelInterface(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                              z_channels=4, embed_dim=4, n_embed=32)
        z1 = jnp.zeros((1, 8, 8, 4))
        up = unet.init(jax.random.key(0), z1, jnp.zeros((1,)),
                       jnp.zeros((1, 1, 16)))
        ep = emb.init(jax.random.key(1), jnp.zeros((2,), jnp.int32))
        vp = vq.init(jax.random.key(2), jnp.zeros((1, 16, 16, 3)))

        ctx = emb.apply(ep, jnp.asarray([3, 8]))
        tables = build_sd_tables([100, 400, 700, 950])
        z = ddim_sample_loop(
            lambda x, t, i: unet.apply(up, x, t, ctx), (2, 8, 8, 4), tables,
            rng=jax.random.key(0), clip_denoised=False,
            var_type=ModelVarType.FIXED_SMALL)
        img = vq.apply(vp, z, method=vq.decode)
        assert img.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(img)).all()
        # different classes condition differently — un-zero the
        # zero-initialized projection layers first (at init the crossattn
        # proj_out is zero per CompVis convention, so context is inert)
        up2 = jax.tree_util.tree_map(
            lambda a: jnp.where(a == 0, 0.01, a) if a.ndim >= 2 else a, up)
        za = ddim_sample_loop(
            lambda x, t, i: unet.apply(up2, x, t, ctx), (2, 8, 8, 4), tables,
            rng=jax.random.key(0), clip_denoised=False,
            var_type=ModelVarType.FIXED_SMALL)
        ctx2 = emb.apply(ep, jnp.asarray([5, 5]))
        zb = ddim_sample_loop(
            lambda x, t, i: unet.apply(up2, x, t, ctx2), (2, 8, 8, 4), tables,
            rng=jax.random.key(0), clip_denoised=False,
            var_type=ModelVarType.FIXED_SMALL)
        assert not np.allclose(np.asarray(za), np.asarray(zb))


class TestCLIPTextParity:
    def test_tiny_clip_text_matches_hf(self):
        transformers = pytest.importorskip("transformers")
        import torch
        cfg_hf = transformers.CLIPTextConfig(
            vocab_size=100, hidden_size=32, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77, hidden_act="quick_gelu")
        torch.manual_seed(3)
        tm = transformers.CLIPTextModel(cfg_hf)
        tm.eval()
        cfg = CLIPTextConfig(vocab_size=100, width=32, layers=2, heads=2,
                             mlp_ratio=4, max_length=77)
        fm = CLIPTextEncoder(cfg)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = convert_clip_text(sd, cfg)

        ids = np.random.RandomState(4).randint(0, 100, (2, 77)).astype(np.int32)
        with torch.no_grad():
            want = tm(input_ids=torch.from_numpy(ids.astype(np.int64))
                      ).last_hidden_state.numpy()
        got = fm.apply(params, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)
