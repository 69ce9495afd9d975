"""SD fitness pipeline, train loop, data pipelines, CLI plumbing."""

import json
import os
import random as pyrandom

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.fid import FIDStats
from autodiffusion_tpu.models import AutoencoderKL, SDUNetModel
from autodiffusion_tpu.search import ContinuousTimeSpace, EvolutionSearcher, TimestepSpace
from autodiffusion_tpu.search.sd_pipelines import make_sd_fitness


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_sd():
    unet = SDUNetModel(in_channels=4, model_channels=32, out_channels=4,
                       num_res_blocks=1, attention_ds=(1,), channel_mult=(1, 2),
                       num_heads=2, context_dim=16)
    z = jnp.zeros((1, 8, 8, 4))
    uparams = unet.init(jax.random.key(0), z, jnp.zeros((1,)),
                        jnp.zeros((1, 5, 16)))
    vae = AutoencoderKL(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                        z_channels=4, embed_dim=4)
    vparams = vae.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
    return unet, uparams, vae, vparams


def _stub_features(imgs):
    x = imgs.astype(jnp.float32).reshape(imgs.shape[0], -1)
    return {"pool3": x[:, :12]}


class TestSDFitness:
    @pytest.mark.parametrize("sampler,cand", [
        ("plms", (94, 217, 574, 944)),
        ("ddim", (94, 217, 574, 944)),
        ("dpm_solver", (0.014986, 0.285715, 0.5005, 0.718282, 0.926074)),
    ])
    def test_end_to_end(self, tiny_sd, sampler, cand):
        unet, uparams, vae, vparams = tiny_sd
        ctx = jnp.asarray(np.random.RandomState(0).randn(10, 5, 16), jnp.float32)
        uncond = jnp.zeros((5, 16))
        ref = FIDStats.from_features(np.random.RandomState(1).randn(50, 12) * 40 + 127)
        fitness = make_sd_fitness(
            unet=unet, unet_params=uparams, vae=vae, vae_params=vparams,
            context_bank=ctx, uncond_context=uncond,
            feature_fn=_stub_features, ref_stats=ref, num_samples=4,
            batch_size=2, sampler=sampler, guidance_scale=7.5,
            latent_hw=8, latent_ch=4, candidate_chunk=2, feature_dim=12)
        fids = fitness([cand])
        assert np.isfinite(fids[0])

    def test_ea_over_continuous_space(self, tiny_sd):
        unet, uparams, vae, vparams = tiny_sd
        ctx = jnp.asarray(np.random.RandomState(0).randn(6, 5, 16), jnp.float32)
        def small_features(imgs):
            x = imgs.astype(jnp.float32).reshape(imgs.shape[0], -1)
            return {"pool3": x[:, :4]}

        ref = FIDStats.from_features(np.random.RandomState(1).randn(50, 4) * 40 + 127)
        fitness = make_sd_fitness(
            unet=unet, unet_params=uparams, vae=vae, vae_params=vparams,
            context_bank=ctx, uncond_context=jnp.zeros((5, 16)),
            feature_fn=small_features, ref_stats=ref, num_samples=8,
            batch_size=2, sampler="dpm_solver", latent_hw=8,
            candidate_chunk=2, feature_dim=4)
        space = ContinuousTimeSpace.uniform_grid(5, rng=pyrandom.Random(0),
                                                 grid_size=100)
        s = EvolutionSearcher(space, fitness, population_num=3, select_num=2,
                              mutation_num=1, crossover_num=1, max_epochs=1)
        best, fid = s.search()
        assert len(best) == 5 and np.isfinite(fid)


class TestTrainLoop:
    def test_loop_runs_and_saves(self, tmp_path):
        from autodiffusion_tpu.models import UNetModel
        from autodiffusion_tpu.train import (TrainLoop, create_train_state,
                                             make_train_step, ofa_tables_fn)

        m = UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                      attention_ds=(2,), channel_mult=(1, 2), num_head_channels=32)
        params = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.zeros((1,)))
        state = create_train_state(params, lr=1e-5)
        step = jax.jit(make_train_step(m.apply))

        rng = np.random.RandomState(0)

        def data():
            while True:
                yield {"x": rng.randn(4, 8, 8, 3).astype(np.float32)}

        loop = TrainLoop(state=state, step_fn=step, data=data(),
                         batch_size=4, save_interval=3,
                         save_dir=str(tmp_path), log_interval=100)
        loop.run_loop(max_steps=4)
        assert loop.step == 4
        assert (tmp_path / "model000003.msgpack").exists()
        assert (tmp_path / "ema_0.9999_000003.msgpack").exists()

    def test_ofa_tables_fn_bounded_K(self):
        from autodiffusion_tpu.train import ofa_tables_fn
        fn = ofa_tables_fn(sections=4, steps_per_section=(2, 3))
        ks = {fn(i, pyrandom.Random(i)).num_steps for i in range(20)}
        assert ks <= {8, 9, 10, 11, 12}


class TestCheckpointRoundtrip:
    def test_save_load_tree(self, tmp_path):
        from autodiffusion_tpu.utils.checkpoint import (find_latest_checkpoint,
                                                        load_tree, save_tree)
        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
        p = str(tmp_path / "model000042.msgpack")
        save_tree(p, tree)
        out = load_tree(p, tree)
        np.testing.assert_array_equal(np.asarray(out["b"]["c"]), np.ones((2, 2)))
        found = find_latest_checkpoint(str(tmp_path))
        assert found is not None and found[1] == 42


class TestData:
    def test_image_folder_loader(self, tmp_path):
        from PIL import Image
        from autodiffusion_tpu.data import load_data
        for cls in ("cat", "dog"):
            for i in range(3):
                Image.fromarray(
                    (np.random.RandomState(i).rand(40, 40, 3) * 255
                     ).astype(np.uint8)).save(tmp_path / f"{cls}_{i}.png")
        it = load_data(data_dir=str(tmp_path), batch_size=2, image_size=16,
                       class_cond=True)
        batch = next(it)
        assert batch["x"].shape == (2, 16, 16, 3)
        assert batch["x"].min() >= -1 and batch["x"].max() <= 1
        assert set(np.unique(batch["y"])) <= {0, 1}

    def test_coco_captions(self, tmp_path):
        from autodiffusion_tpu.data import CocoCaptions
        ann = [{"image_id": 1, "caption": "a cat"},
               {"image_id": 2, "caption": "a dog"}]
        p = tmp_path / "caps.json"
        p.write_text(json.dumps(ann))
        ds = CocoCaptions(str(p))
        assert ds.captions() == ["a cat", "a dog"]


class TestCLI:
    def test_help_and_subcommands(self):
        from autodiffusion_tpu.cli.main import main
        with pytest.raises(SystemExit) as e:
            main(["--help"])
        assert e.value.code == 0

    def test_sample_defaults_parse_reference_flags(self):
        # the published flag bundle must parse
        # (sample_imagenet64_classifier_guidance_subnet.sh)
        from autodiffusion_tpu.cli.main import main
        argv = ["sample", "--model_path", "/nonexistent.pt",
                "--use_timestep", "[94, 834, 217, 944, 574, 354]",
                "--classifier_scale", "1.0", "--use_ddim", "True",
                "--num_samples", "10", "--batch_size", "5"]
        with pytest.raises(FileNotFoundError):
            main(argv)  # parses fine, fails at checkpoint load


class TestPublishedFlagBundles:
    """Every published .sh flag bundle must parse through the adt CLI."""

    def test_search_bundle_parses(self):
        # search_imagenet64_classifier_guidance.sh flags
        from autodiffusion_tpu.cli.main import main
        argv = ["search",
                "--attention_resolutions", "32,16,8", "--class_cond", "True",
                "--use_ddim", "True", "--image_size", "64",
                "--learn_sigma", "True", "--noise_schedule", "cosine",
                "--num_channels", "192", "--num_head_channels", "64",
                "--num_res_blocks", "3", "--resblock_updown", "True",
                "--use_new_attention_order", "True",
                "--time_step", "4", "--max_epochs", "10",
                "--population_num", "50", "--mutation_num", "25",
                "--crossover_num", "15", "--m_prob", "0.25",
                "--use_ddim_init_x", "True", "--num_samples", "5000",
                "--batch_size", "100", "--classifier_scale", "1.0",
                "--model_path", "/nonexistent.pt"]
        with pytest.raises(FileNotFoundError):
            main(argv)   # parses cleanly; fails only at checkpoint load

    def test_joint_search_bundle_parses(self):
        from autodiffusion_tpu.cli.main import main
        argv = ["search", "--use_dynamic_unet", "True", "--time_step", "10",
                "--index_step", "580", "--max_prun", "0.1",
                "--min_prun", "0.0", "--num_samples", "1000",
                "--batch_size", "100", "--model_path", "/nonexistent.pt"]
        with pytest.raises(FileNotFoundError):
            main(argv)

    def test_dynamic_subnet_sample_bundle_parses(self):
        # sample_imagenet64_classifier_guidance_dynamic_subnet.sh artifacts
        from autodiffusion_tpu.cli.main import main
        argv = ["sample",
                "--use_timestep",
                "[744, 137, 647, 856, 305, 441, 676, 572, 971, 85]",
                "--skip_layers",
                "[[], [], [], [], [], [], [], [3, 9, 21, 49, 40, 32, 25, 19, 13], [], []]",
                "--model_path", "/nonexistent.pt"]
        with pytest.raises(FileNotFoundError):
            main(argv)


class TestSampleCLIEndToEnd:
    def test_sample_runs_sharded_and_saves_npz(self, reference_gd, tmp_path):
        """adt sample end to end on the 8-device mesh: tiny converted torch
        checkpoint -> mesh-sharded DDIM sampling -> npz (the
        classifier_sample.py deployment path, batch sharded like search)."""
        import torch
        from guided_diffusion.unet import UNetModel as TorchUNet

        from autodiffusion_tpu.cli.main import main

        torch.manual_seed(0)
        tm = TorchUNet(image_size=16, in_channels=3, model_channels=32,
                       out_channels=6, num_res_blocks=1,
                       attention_resolutions=(2,), dropout=0.0,
                       channel_mult=(1, 2), num_classes=None,
                       use_checkpoint=False, use_fp16=False, num_heads=1,
                       num_head_channels=32, num_heads_upsample=-1,
                       use_scale_shift_norm=True, resblock_updown=True,
                       use_new_attention_order=True)
        ckpt = str(tmp_path / "tiny.pt")
        torch.save(tm.state_dict(), ckpt)

        out = str(tmp_path / "samples.npz")
        rc = main(["sample", "--model_path", ckpt, "--image_size", "16",
                   "--num_channels", "32", "--num_res_blocks", "1",
                   "--num_head_channels", "32",
                   "--attention_resolutions", "8", "--channel_mult", "1,2",
                   "--class_cond", "False", "--learn_sigma", "True",
                   "--use_bf16", "False",
                   "--use_timestep", "[94, 354, 574, 834]",
                   "--num_samples", "16", "--batch_size", "8",
                   "--out", out])
        assert rc == 0
        with np.load(out) as z:
            arr = z["arr_0"]
        assert arr.shape == (16, 16, 16, 3) and arr.dtype == np.uint8
        # non-degenerate output
        assert len(np.unique(arr)) > 10

    def test_sample_accepts_msgpack_checkpoint(self, reference_gd, tmp_path):
        """adt sample loads an own-format msgpack (adt convert / adt train
        output) anywhere a torch .pt is accepted, producing identical
        samples from either format."""
        import torch
        from guided_diffusion.unet import UNetModel as TorchUNet

        from autodiffusion_tpu.cli.main import main
        from autodiffusion_tpu.models import ModelConfig, create_model
        from autodiffusion_tpu.models.convert import (convert_unet,
                                                      load_torch_state_dict)
        from autodiffusion_tpu.utils.checkpoint import save_tree

        torch.manual_seed(1)
        tm = TorchUNet(image_size=16, in_channels=3, model_channels=32,
                       out_channels=6, num_res_blocks=1,
                       attention_resolutions=(2,), dropout=0.0,
                       channel_mult=(1, 2), num_classes=None,
                       use_checkpoint=False, use_fp16=False, num_heads=1,
                       num_head_channels=32, num_heads_upsample=-1,
                       use_scale_shift_norm=True, resblock_updown=True,
                       use_new_attention_order=True)
        ckpt = str(tmp_path / "tiny.pt")
        torch.save(tm.state_dict(), ckpt)

        cfg = ModelConfig(image_size=16, num_channels=32, num_res_blocks=1,
                          num_head_channels=32, attention_resolutions="8",
                          channel_mult="1,2", class_cond=False,
                          learn_sigma=True, use_bf16=False,
                          use_scale_shift_norm=True, resblock_updown=True,
                          use_new_attention_order=True)
        params = convert_unet(load_torch_state_dict(ckpt), create_model(cfg))
        mpk = str(tmp_path / "tiny.msgpack")
        save_tree(mpk, params)

        flags = ["--image_size", "16", "--num_channels", "32",
                 "--num_res_blocks", "1", "--num_head_channels", "32",
                 "--attention_resolutions", "8", "--channel_mult", "1,2",
                 "--class_cond", "False", "--learn_sigma", "True",
                 "--use_bf16", "False",
                 "--use_timestep", "[94, 354, 574, 834]",
                 "--num_samples", "8", "--batch_size", "8"]
        out_pt = str(tmp_path / "s_pt.npz")
        out_mp = str(tmp_path / "s_mp.npz")
        assert main(["sample", "--model_path", ckpt, "--out", out_pt] + flags) == 0
        assert main(["sample", "--model_path", mpk, "--out", out_mp] + flags) == 0
        with np.load(out_pt) as a, np.load(out_mp) as b:
            np.testing.assert_array_equal(a["arr_0"], b["arr_0"])


class TestSDParamsDir:
    def test_save_load_roundtrip(self, tmp_path):
        """adt convert --preset sd directory format: three towers saved
        and reloaded bitwise (the --ckpt <dir> path of every SD
        subcommand)."""
        from autodiffusion_tpu.models import (AutoencoderKL, CLIPTextConfig,
                                              CLIPTextEncoder, SDUNetModel)
        from autodiffusion_tpu.models.sd_convert import (load_sd_params_dir,
                                                         save_sd_params_dir)

        unet = SDUNetModel(in_channels=4, model_channels=32, out_channels=4,
                           num_res_blocks=1, attention_ds=(1,),
                           channel_mult=(1, 2), num_heads=2, context_dim=16)
        vae = AutoencoderKL(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                            z_channels=4, embed_dim=4)
        cfg = CLIPTextConfig(vocab_size=50, width=16, layers=1, heads=2,
                             max_length=7)
        clip = CLIPTextEncoder(cfg)
        up = unet.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.zeros((1,)), jnp.zeros((1, 2, 16)))
        vp = vae.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
        cp = clip.init(jax.random.key(2), jnp.zeros((1, 7), jnp.int32))

        d = str(tmp_path / "sd_ckpt")
        save_sd_params_dir(d, up, vp, cp)
        u2, v2, c2 = load_sd_params_dir(d, unet=unet, vae=vae, clip=clip,
                                        clip_config=cfg)
        for got, want in ((u2, up), (v2, vp), (c2, cp)):
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)), got, want)


class TestLDMSampleCLI:
    def test_ldm_sample_end_to_end(self, tmp_path):
        """adt ldm-sample on a fabricated tiny LDM checkpoint
        (model.diffusion_model.* = openaimodel uncond UNet,
        first_stage_model.* = VQ stage): DDIM latents -> quantizing VQ
        decode -> uint8 npz (sample_diffusion.py path)."""
        import sys
        sys.path.insert(0, "/root/reference/examples/Stable Diffusion")
        import torch
        from ldm.modules.diffusionmodules.model import Decoder as TorchDec
        from ldm.modules.diffusionmodules.model import Encoder as TorchEnc
        from ldm.modules.diffusionmodules.openaimodel import \
            UNetModel as LDMUNet

        from autodiffusion_tpu.cli.main import main

        torch.manual_seed(8)
        tm = LDMUNet(image_size=8, in_channels=3, out_channels=3,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2,), dropout=0.0,
                     channel_mult=(1, 2), num_classes=None,
                     use_checkpoint=False, use_fp16=False, num_heads=1,
                     num_head_channels=32, num_heads_upsample=-1,
                     use_scale_shift_norm=False, resblock_updown=False,
                     use_new_attention_order=False,
                     use_spatial_transformer=False)
        dd = dict(double_z=False, z_channels=3, resolution=16, in_channels=3,
                  out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                  attn_resolutions=[], dropout=0.0)
        te, td = TorchEnc(**dd), TorchDec(**dd)
        qc, pqc = torch.nn.Conv2d(3, 3, 1), torch.nn.Conv2d(3, 3, 1)
        emb = torch.nn.Embedding(16, 3)

        sd = {f"model.diffusion_model.{k}": v
              for k, v in tm.state_dict().items()}
        for pfx, m in (("encoder", te), ("decoder", td), ("quant_conv", qc),
                       ("post_quant_conv", pqc), ("quantize.embedding", emb)):
            sd.update({f"first_stage_model.{pfx}.{k}": v
                       for k, v in m.state_dict().items()})
        ckpt = str(tmp_path / "ldm_tiny.pt")
        torch.save(sd, ckpt)

        out = str(tmp_path / "ldm.npz")
        rc = main(["ldm-sample", "--ckpt", ckpt, "--latent_size", "8",
                   "--latent_channels", "3", "--first_stage", "vq",
                   "--fs_ch", "32", "--fs_ch_mult", "1,2",
                   "--fs_num_res_blocks", "1", "--n_embed", "16",
                   "--embed_dim", "3", "--num_channels", "32",
                   "--num_res_blocks", "1", "--channel_mult", "1,2",
                   "--attention_ds", "2", "--num_head_channels", "32",
                   "--steps", "5", "--n_samples", "2", "--use_bf16", "False",
                   "--out", out])
        assert rc == 0
        with np.load(out) as z:
            arr = z["arr_0"]
        assert arr.shape == (2, 16, 16, 3) and arr.dtype == np.uint8
        assert np.isfinite(arr.astype(np.float64)).all()


class TestInpaintCLI:
    def test_inpaint_end_to_end_preserves_unmasked(self, tmp_path):
        """adt inpaint on a fabricated tiny concat-conditioned LDM ckpt:
        the composite must keep unmasked pixels bitwise and write the
        inpainted PNG (inpaint.py make_batch + composite semantics)."""
        import sys
        sys.path.insert(0, "/root/reference/examples/Stable Diffusion")
        import torch
        from PIL import Image
        from ldm.modules.diffusionmodules.model import Decoder as TorchDec
        from ldm.modules.diffusionmodules.model import Encoder as TorchEnc
        from ldm.modules.diffusionmodules.openaimodel import \
            UNetModel as LDMUNet

        from autodiffusion_tpu.cli.main import main

        torch.manual_seed(9)
        # in_channels 7 = 3 latent + 3 masked-image latent + 1 mask
        tm = LDMUNet(image_size=8, in_channels=7, out_channels=3,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2,), dropout=0.0,
                     channel_mult=(1, 2), num_classes=None,
                     use_checkpoint=False, use_fp16=False, num_heads=1,
                     num_head_channels=32, num_heads_upsample=-1,
                     use_scale_shift_norm=False, resblock_updown=False,
                     use_new_attention_order=False,
                     use_spatial_transformer=False)
        dd = dict(double_z=False, z_channels=3, resolution=16, in_channels=3,
                  out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                  attn_resolutions=[], dropout=0.0)
        te, td = TorchEnc(**dd), TorchDec(**dd)
        qc, pqc = torch.nn.Conv2d(3, 3, 1), torch.nn.Conv2d(3, 3, 1)
        emb = torch.nn.Embedding(16, 3)
        sd = {f"model.diffusion_model.{k}": v
              for k, v in tm.state_dict().items()}
        for pfx, m in (("encoder", te), ("decoder", td), ("quant_conv", qc),
                       ("post_quant_conv", pqc), ("quantize.embedding", emb)):
            sd.update({f"first_stage_model.{pfx}.{k}": v
                       for k, v in m.state_dict().items()})
        ckpt = str(tmp_path / "inpaint_tiny.pt")
        torch.save(sd, ckpt)

        rng = np.random.RandomState(3)
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        mask = np.zeros((16, 16), np.uint8)
        mask[4:12, 4:12] = 255
        indir = tmp_path / "in"
        indir.mkdir()
        Image.fromarray(img).save(indir / "a.png")
        Image.fromarray(mask).save(indir / "a_mask.png")

        outdir = str(tmp_path / "out")
        rc = main(["inpaint", "--ckpt", ckpt, "--indir", str(indir),
                   "--outdir", outdir, "--latent_channels", "3",
                   "--first_stage", "vq", "--fs_ch", "32",
                   "--fs_ch_mult", "1,2", "--fs_num_res_blocks", "1",
                   "--n_embed", "16", "--embed_dim", "3",
                   "--num_channels", "32", "--num_res_blocks", "1",
                   "--channel_mult", "1,2", "--attention_ds", "2",
                   "--num_head_channels", "32", "--steps", "5",
                   "--use_bf16", "False"])
        assert rc == 0
        out = np.asarray(Image.open(f"{outdir}/a.png"))
        assert out.shape == (16, 16, 3)
        keep = mask == 0
        np.testing.assert_array_equal(out[keep], img[keep])
        # the masked area must NOT be a straight copy (it was generated)
        assert not np.array_equal(out[~keep], img[~keep])


class TestClassCondLDMSampleCLI:
    def test_class_cond_ldm_sample(self, tmp_path):
        """adt ldm-sample --num_classes on a fabricated tiny cin-style
        ckpt: ClassEmbedder token -> crossattn UNet (num_head_channels
        semantics) -> VQ decode."""
        import sys
        import types
        sys.path.insert(0, "/root/reference/examples/Stable Diffusion")
        if "omegaconf" not in sys.modules:   # stub for openaimodel's import
            om = types.ModuleType("omegaconf")
            lc = types.ModuleType("omegaconf.listconfig")

            class ListConfig(list):
                pass

            lc.ListConfig = ListConfig
            om.listconfig = lc
            om.ListConfig = ListConfig
            sys.modules["omegaconf"] = om
            sys.modules["omegaconf.listconfig"] = lc
        import torch
        from ldm.modules.diffusionmodules.model import Decoder as TorchDec
        from ldm.modules.diffusionmodules.model import Encoder as TorchEnc
        from ldm.modules.diffusionmodules.openaimodel import \
            UNetModel as LDMUNet

        from autodiffusion_tpu.cli.main import main

        torch.manual_seed(10)
        tm = LDMUNet(image_size=8, in_channels=4, out_channels=4,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(1, 2), dropout=0.0,
                     channel_mult=(1, 2), num_classes=None,
                     use_checkpoint=False, use_fp16=False, num_heads=-1,
                     num_head_channels=16, num_heads_upsample=-1,
                     use_scale_shift_norm=False, resblock_updown=False,
                     use_spatial_transformer=True, transformer_depth=1,
                     context_dim=16, legacy=False)
        dd = dict(double_z=False, z_channels=4, resolution=16, in_channels=3,
                  out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                  attn_resolutions=[], dropout=0.0)
        te, td = TorchEnc(**dd), TorchDec(**dd)
        qc, pqc = torch.nn.Conv2d(4, 4, 1), torch.nn.Conv2d(4, 4, 1)
        emb = torch.nn.Embedding(16, 4)
        cls_emb = torch.nn.Embedding(10, 16)   # cond_stage ClassEmbedder

        sd = {f"model.diffusion_model.{k}": v
              for k, v in tm.state_dict().items()}
        for pfx, m in (("encoder", te), ("decoder", td), ("quant_conv", qc),
                       ("post_quant_conv", pqc), ("quantize.embedding", emb)):
            sd.update({f"first_stage_model.{pfx}.{k}": v
                       for k, v in m.state_dict().items()})
        sd.update({f"cond_stage_model.embedding.{k}": v
                   for k, v in cls_emb.state_dict().items()})
        ckpt = str(tmp_path / "cin_tiny.pt")
        torch.save(sd, ckpt)

        out = str(tmp_path / "cin.npz")
        rc = main(["ldm-sample", "--ckpt", ckpt, "--latent_size", "8",
                   "--latent_channels", "4", "--first_stage", "vq",
                   "--fs_ch", "32", "--fs_ch_mult", "1,2",
                   "--fs_num_res_blocks", "1", "--n_embed", "16",
                   "--embed_dim", "4", "--num_channels", "32",
                   "--num_res_blocks", "1", "--channel_mult", "1,2",
                   "--attention_ds", "1,2", "--num_head_channels", "16",
                   "--num_classes", "10", "--class_label", "3",
                   "--context_dim", "16", "--steps", "5", "--n_samples", "2",
                   "--use_bf16", "False", "--out", out])
        assert rc == 0
        with np.load(out) as z:
            arr = z["arr_0"]
        assert arr.shape == (2, 16, 16, 3) and arr.dtype == np.uint8


class TestPromptWindow:
    def test_same_prompts_per_candidate_and_no_skips_under_cap(self):
        """Regression: with the HBM device-batch cap the dispatched batch
        is smaller than chunk*batch_size; every candidate's slice must
        still draw IDENTICAL prompts (comparable FIDs) and consecutive
        batches must tile the prompt bank without skipping."""
        from autodiffusion_tpu.search.sd_pipelines import prompt_window

        n_prompts, chunk = 10, 2
        for b in (2, 3, 5):          # per-candidate slice sizes (capped)
            n = chunk * b
            seen = []
            for batch_idx in range(6):
                idx = np.asarray(prompt_window(n, chunk, batch_idx,
                                               n_prompts))
                per_cand = idx.reshape(chunk, b)
                # identical prompt subset for every folded candidate
                for j in range(1, chunk):
                    np.testing.assert_array_equal(per_cand[0], per_cand[j])
                seen.extend(per_cand[0].tolist())
            # rolling window covers the bank contiguously, no skips
            expect = [(i % n_prompts) for i in range(len(seen))]
            assert seen == expect, (b, seen)


class TestTxt2ImgCLI:
    def test_txt2img_runs_batched_on_tiny_stack(self, tiny_sd, monkeypatch,
                                                tmp_path):
        """cmd_txt2img end to end on a monkeypatched tiny SD stack:
        regression for the missing cfg_eps_fn import (NameError on every
        real run) and the from_file batching (prompts sample in
        n_samples-sized batches, not one giant CFG batch)."""
        import autodiffusion_tpu.cli.main as m
        from autodiffusion_tpu.models import CLIPTextConfig, CLIPTextEncoder

        unet, uparams, vae, vparams = tiny_sd
        cfg = CLIPTextConfig(vocab_size=50, width=16, layers=1, heads=2,
                             max_length=5)
        clip = CLIPTextEncoder(cfg)
        cparams = clip.init(jax.random.key(3), jnp.zeros((1, 5), jnp.int32))

        def tok(texts):
            return np.zeros((len(texts), 5), np.int32)

        monkeypatch.setattr(
            m, "_sd_stack",
            lambda args: (unet, uparams, vae, vparams, clip, cparams, tok))

        pf = tmp_path / "prompts.txt"
        pf.write_text("a cat\na dog\na bird\n")
        out = str(tmp_path / "t2i.npz")
        rc = m.main(["txt2img", "--ckpt", "ignored", "--from_file", str(pf),
                     "--n_samples", "2", "--H", "16", "--W", "16",
                     "--steps", "4", "--sampler", "plms",
                     "--use_bf16", "False", "--out", out])
        assert rc == 0
        with np.load(out) as z:
            arr = z["arr_0"]
        # 3 prompts sampled in batches of 2 then 1; the tiny VAE is f=2
        # (latent 16//8=2 -> decode 4x4), vs SD v1's f=8
        assert arr.shape == (3, 4, 4, 3) and arr.dtype == np.uint8


class TestCLIReviewRegressions:
    """Round-3 review findings in the CLI layer (fail-loud validation,
    learn_sigma variance mapping, img2img posterior sampling)."""

    def _clip_stack(self, tiny_sd):
        from autodiffusion_tpu.models import CLIPTextConfig, CLIPTextEncoder
        unet, uparams, vae, vparams = tiny_sd
        cfg = CLIPTextConfig(vocab_size=50, width=16, layers=1, heads=2,
                             max_length=5)
        clip = CLIPTextEncoder(cfg)
        cparams = clip.init(jax.random.key(3), jnp.zeros((1, 5), jnp.int32))

        def tok(texts):
            return np.zeros((len(texts), 5), np.int32)

        return unet, uparams, vae, vparams, clip, cparams, tok

    def test_txt2img_without_prompts_errors(self):
        """Forgotten --prompt/--from_file must exit 1 before loading any
        checkpoint, not write a 0-sample npz with rc 0."""
        from autodiffusion_tpu.cli.main import main
        rc = main(["txt2img", "--ckpt", "does_not_matter"])
        assert rc == 1

    def test_img2img_samples_posterior_and_shares_cfg(self, tiny_sd,
                                                      monkeypatch, tmp_path):
        """img2img end to end on the tiny stack: the init latent is a
        posterior SAMPLE per output (reference get_first_stage_encoding),
        so different seeds give different latents; CFG goes through the
        shared cfg_eps_fn."""
        from PIL import Image

        import autodiffusion_tpu.cli.main as m

        monkeypatch.setattr(
            m, "_sd_stack", lambda args: self._clip_stack(tiny_sd))
        init = tmp_path / "init.png"
        rng = np.random.RandomState(0)
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(init)
        outs = []
        for seed in (0, 1):
            out = str(tmp_path / f"i2i_{seed}.npz")
            rc = m.main(["img2img", "--ckpt", "x", "--init_img", str(init),
                         "--prompt", "p", "--n_samples", "2", "--H", "16",
                         "--W", "16", "--steps", "4", "--strength", "0.5",
                         "--use_bf16", "False", "--seed", str(seed),
                         "--out", out])
            assert rc == 0
            with np.load(out) as z:
                outs.append(z["arr_0"].copy())
        # the tiny VAE is f=2 (one downsample), so 16px stays 16px
        assert outs[0].shape == (2, 16, 16, 3)
        # posterior sampling + noise: seeds must differ
        assert not np.array_equal(outs[0], outs[1])

    def test_sample_validates_skip_layers_length(self, tmp_path):
        """A skip_layers list shorter than the schedule must fail loud —
        under traced indexing keep[i] would silently clamp."""
        import pytest

        from autodiffusion_tpu.cli.main import main
        from autodiffusion_tpu.models import ModelConfig, create_model
        from autodiffusion_tpu.utils.checkpoint import save_tree

        cfg = ModelConfig(image_size=16, num_channels=32, num_res_blocks=1,
                          num_head_channels=32, attention_resolutions="8",
                          channel_mult="1,2", class_cond=False,
                          learn_sigma=True, noise_schedule="cosine",
                          use_scale_shift_norm=True, resblock_updown=True,
                          use_new_attention_order=True, use_bf16=False)
        model = create_model(cfg)
        p = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                       jnp.zeros((1,)))
        ck = str(tmp_path / "m.msgpack")
        save_tree(ck, p)
        args = ["sample", "--model_path", ck, "--image_size", "16",
                "--num_channels", "32", "--num_res_blocks", "1",
                "--num_head_channels", "32", "--attention_resolutions", "8",
                "--channel_mult", "1,2", "--class_cond", "False",
                "--use_bf16", "False",
                "--use_timestep", "[94, 354, 574, 834]",
                "--skip_layers", "[[0], [1]]",     # 2 entries, 4 steps
                "--num_samples", "4", "--batch_size", "4"]
        with pytest.raises(ValueError, match="skip_layers"):
            main(args)

    def test_sample_classifier_needs_class_cond(self, tmp_path):
        import pytest

        from autodiffusion_tpu.cli.main import main
        # must fire BEFORE any checkpoint is touched
        with pytest.raises(ValueError, match="class_cond"):
            main(["sample", "--model_path", "does_not_exist.msgpack",
                  "--classifier_path", "also_absent.msgpack",
                  "--class_cond", "False"])

    def test_sample_learn_sigma_false_uses_fixed_large(self, tmp_path):
        """A 3-channel (learn_sigma False) model must sample with
        FIXED_LARGE variance instead of asserting in _split_model_output
        (reference create_gaussian_diffusion fallback)."""
        from autodiffusion_tpu.cli.main import main
        from autodiffusion_tpu.models import ModelConfig, create_model
        from autodiffusion_tpu.utils.checkpoint import save_tree

        cfg = ModelConfig(image_size=16, num_channels=32, num_res_blocks=1,
                          num_head_channels=32, attention_resolutions="8",
                          channel_mult="1,2", class_cond=False,
                          learn_sigma=False, noise_schedule="cosine",
                          use_scale_shift_norm=True, resblock_updown=True,
                          use_new_attention_order=True, use_bf16=False)
        model = create_model(cfg)
        p = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                       jnp.zeros((1,)))
        ck = str(tmp_path / "m3.msgpack")
        save_tree(ck, p)
        out = str(tmp_path / "s.npz")
        rc = main(["sample", "--model_path", ck, "--image_size", "16",
                   "--num_channels", "32", "--num_res_blocks", "1",
                   "--num_head_channels", "32",
                   "--attention_resolutions", "8", "--channel_mult", "1,2",
                   "--class_cond", "False", "--learn_sigma", "False",
                   "--use_bf16", "False",
                   "--use_timestep", "[94, 354, 574, 834]",
                   "--num_samples", "8", "--batch_size", "8", "--out", out])
        assert rc == 0
        with np.load(out) as z:
            assert z["arr_0"].shape == (8, 16, 16, 3)


class TestSearchCLIEndToEnd:
    def test_search_cli_uncond_and_resume(self, tmp_path, capsys,
                                          monkeypatch):
        """The FULL `adt search` CLI offline: tiny msgpack checkpoint +
        synthesized Inception + dense-random ref stats -> EA -> result
        JSON, then a second run with --resume True continues from
        ea_state.json without re-paying memoized FIDs. Guards the CLI
        wiring (including _maybe_resume_ea call sites) that the on-chip
        validations exercised but no offline test covered."""
        import json as jsonlib

        import torch

        from autodiffusion_tpu.cli.main import main
        from autodiffusion_tpu.fid import FIDInceptionV3, FIDStats
        from autodiffusion_tpu.models import ModelConfig, create_model
        from autodiffusion_tpu.utils.checkpoint import save_tree
        from test_inception_loader import synthesize_torch_state

        cfg = ModelConfig(image_size=16, num_channels=32, num_res_blocks=1,
                          num_head_channels=32, attention_resolutions="8",
                          channel_mult="1,2", class_cond=False,
                          learn_sigma=True, noise_schedule="cosine",
                          use_scale_shift_norm=True, resblock_updown=True,
                          use_new_attention_order=True, use_bf16=False)
        model = create_model(cfg)
        p = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                       jnp.zeros((1,)))
        ck = str(tmp_path / "model.msgpack")
        save_tree(ck, p)

        shapes = jax.eval_shape(lambda: FIDInceptionV3().init(
            jax.random.key(1), jnp.zeros((1, 299, 299, 3))))
        sd = synthesize_torch_state(
            jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype),
                                   shapes), np.random.RandomState(0))
        ipath = str(tmp_path / "pt_inception.pth")
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ipath)

        # DENSE random ref stats — an eye/zeros fixture constant-folds
        # trivially and hides closure-constant regressions (the round-3
        # device-Frechet blowup was invisible to exactly such a fixture)
        rngs = np.random.RandomState(2)
        A = rngs.randn(2048, 2200) / 46.0
        ref = FIDStats(rngs.randn(2048), A @ A.T)
        rpath = str(tmp_path / "ref_stats.npz")
        ref.save(rpath)

        save_dir = str(tmp_path / "logs")
        argv = ["search", "--model_path", ck, "--image_size", "16",
                "--num_channels", "32", "--num_res_blocks", "1",
                "--num_head_channels", "32", "--attention_resolutions", "8",
                "--channel_mult", "1,2", "--class_cond", "False",
                "--use_bf16", "False", "--inception_path", ipath,
                "--ref_stats", rpath, "--num_samples", "8",
                "--batch_size", "8", "--candidate_chunk", "2",
                "--population_num", "4", "--select_num", "2",
                "--mutation_num", "1", "--crossover_num", "1",
                "--max_epochs", "1", "--time_step", "2",
                "--save_dir", save_dir]
        rc = main(argv)
        out1 = capsys.readouterr().out
        assert rc == 0
        result = jsonlib.loads(out1.strip().splitlines()[-1])
        assert len(result["best"]) == 2 and np.isfinite(result["fid"])
        assert (tmp_path / "logs" / "ea_state.json").exists()

        # resume: epoch already complete -> no fresh fitness evaluations,
        # same best candidate, and the resumed log line appears
        rc2 = main(argv + ["--resume", "True"])
        out2 = capsys.readouterr().out
        assert rc2 == 0
        assert "resumed search at epoch" in out2
        result2 = jsonlib.loads(out2.strip().splitlines()[-1])
        assert result2["best"] == result["best"]
        assert abs(result2["fid"] - result["fid"]) < 1e-6

    def test_search_sd_cli_end_to_end(self, tiny_sd, tmp_path, capsys,
                                      monkeypatch):
        """The FULL `adt search-sd` CLI offline on a monkeypatched tiny
        stack: captions JSON -> tokenizer -> context bank -> EA over the
        discrete PLMS space -> result JSON + ea_state.json, and the
        reference's `total searching time = X hours` line
        (sd/scripts/search_ea.py:908-911) — the on-chip runs grep for it."""
        import json as jsonlib

        import torch

        import autodiffusion_tpu.cli.main as m
        from autodiffusion_tpu.fid import FIDInceptionV3, FIDStats
        from autodiffusion_tpu.models import CLIPTextConfig, CLIPTextEncoder
        from test_inception_loader import synthesize_torch_state

        unet, uparams, vae, vparams = tiny_sd
        cfg = CLIPTextConfig(vocab_size=50, width=16, layers=1, heads=2,
                             max_length=5)
        clip = CLIPTextEncoder(cfg)
        cparams = clip.init(jax.random.key(3), jnp.zeros((1, 5), jnp.int32))

        def tok(texts):
            return np.zeros((len(texts), 5), np.int32)

        monkeypatch.setattr(
            m, "_sd_stack",
            lambda args: (unet, uparams, vae, vparams, clip, cparams, tok))

        caps = [{"image_id": i, "caption": f"tiny caption {i}"}
                for i in range(4)]
        cpath = str(tmp_path / "captions.json")
        with open(cpath, "w") as f:
            jsonlib.dump(caps, f)

        shapes = jax.eval_shape(lambda: FIDInceptionV3().init(
            jax.random.key(1), jnp.zeros((1, 299, 299, 3))))
        sd = synthesize_torch_state(
            jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype),
                                   shapes), np.random.RandomState(0))
        ipath = str(tmp_path / "pt_inception.pth")
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ipath)

        rngs = np.random.RandomState(2)
        A = rngs.randn(2048, 2200) / 46.0
        ref = FIDStats(rngs.randn(2048), A @ A.T)
        rpath = str(tmp_path / "ref_stats.npz")
        ref.save(rpath)

        save_dir = str(tmp_path / "sdlogs")
        rc = m.main(["search-sd", "--ckpt", "ignored",
                     "--captions", cpath, "--num_prompts", "4",
                     "--inception_path", ipath, "--ref_stats", rpath,
                     "--sampler", "plms", "--H", "16", "--W", "16",
                     "--time_step", "2", "--num_samples", "4",
                     "--batch_size", "2", "--candidate_chunk", "2",
                     "--population_num", "4", "--select_num", "2",
                     "--mutation_num", "1", "--crossover_num", "1",
                     "--max_epochs", "1", "--use_bf16", "False",
                     "--save_dir", save_dir])
        out = capsys.readouterr().out
        assert rc == 0
        assert "total searching time = " in out
        result = jsonlib.loads(out.strip().splitlines()[-1])
        assert len(result["best"]) == 2 and np.isfinite(result["fid"])
        assert (tmp_path / "sdlogs" / "ea_state.json").exists()
