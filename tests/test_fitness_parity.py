"""Full-chain candidate-fitness parity vs the reference get_cand_fid math.

Runs the ENTIRE fitness pipeline on both sides with identical weights, noise,
and labels, and asserts the same FID:

  reference side: SpacedDiffusion(use_timesteps=cand) [== the in-place
      reset_diffusion recomputation, search_imagenet64_classifier_guidance.py
      :200-255] -> torch ddim_sample_loop with classifier cond_fn (:319-351)
      -> uint8 (:352-354) -> stub features -> np.cov moments -> scipy-sqrtm
      Frechet (evaluator_v1.py:109-157, cal_fid :730-753)
  our side: make_adm_fitness/BatchedFIDFitness (build_tables -> scan DDIM ->
      to_uint8 -> streamed device moments -> eigh Frechet), replaying the
      exact jax.random label/noise streams on the torch side.

A stub feature extractor (4x4 average-pooled pixels) stands in for Inception
— its numerical parity is certified separately in test_inception_parity.py —
so this test certifies everything else in the chain end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.fid.stats import FIDStats
from autodiffusion_tpu.models import EncoderUNetModel
from autodiffusion_tpu.models.convert import convert_classifier, convert_unet
from autodiffusion_tpu.search.pipelines import make_adm_fitness
from test_models import tiny_model

pytestmark = pytest.mark.slow

IMG = 16
BATCH = 4
NUM_SAMPLES = 8          # 2 batches per candidate
NUM_CLASSES = 10
SEED = 0


def stub_feats_np(u8):
    """uint8 [N,16,16,3] -> [N,48] float64: 4x4 average-pooled pixels."""
    x = np.asarray(u8, dtype=np.float64) / 255.0
    n = x.shape[0]
    return x.reshape(n, 4, 4, 4, 4, 3).mean(axis=(2, 4)).reshape(n, 48)


def stub_feature_fn(u8):
    x = u8.astype(jnp.float32) / 255.0
    n = x.shape[0]
    pooled = x.reshape(n, 4, 4, 4, 4, 3).mean(axis=(2, 4)).reshape(n, 48)
    return {"pool3": pooled}


def reference_frechet(feats, ref):
    """mu/np.cov + scipy sqrtm — the evaluator_v1 FIDStatistics math."""
    import scipy.linalg

    mu, sigma = feats.mean(axis=0), np.cov(feats, rowvar=False)
    diff = mu - ref.mu
    covmean = scipy.linalg.sqrtm(sigma.dot(ref.sigma))
    if isinstance(covmean, tuple):
        covmean = covmean[0]
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma) + np.trace(ref.sigma)
                 - 2 * np.trace(covmean))


def replay_rng(chunk_batch, with_labels, label_batch=None):
    """Reproduce the label/noise streams BatchedFIDFitness draws per batch.

    Labels are drawn once per candidate slice (label_batch) and tiled
    across the chunk — the fitness gives every folded candidate the SAME
    labels (pipelines.py sample_fn)."""
    out = []
    base = jax.random.key(SEED)
    lb = label_batch or chunk_batch
    for b in range(NUM_SAMPLES // BATCH):
        rng = jax.random.fold_in(jax.random.fold_in(base, 0), b)
        label_rng, noise_rng = jax.random.split(rng)
        y = (np.tile(np.asarray(jax.random.randint(label_rng, (lb,), 0,
                                                   NUM_CLASSES)),
                     chunk_batch // lb)
             if with_labels else None)
        noise = np.asarray(jax.random.normal(
            noise_rng, (chunk_batch, IMG, IMG, 3)))
        out.append((y, noise))
    return out


@pytest.fixture(scope="module")
def ref_stats():
    return FIDStats.from_features(np.random.RandomState(5).randn(100, 48))


@pytest.fixture(scope="module")
def spaced_diffusion_factory(request):
    request.getfixturevalue("reference_gd")
    from guided_diffusion import gaussian_diffusion as gd
    from guided_diffusion.respace import SpacedDiffusion

    betas = gd.get_named_beta_schedule("cosine", 1000)

    def make(cand):
        # == reset_diffusion(cand): identical in-place table recomputation
        return SpacedDiffusion(
            use_timesteps=set(cand), betas=betas,
            model_mean_type=gd.ModelMeanType.EPSILON,
            model_var_type=gd.ModelVarType.LEARNED_RANGE,
            loss_type=gd.LossType.MSE, rescale_timesteps=False)

    return make


def reference_fid(torch_model, cand, spaced_factory, ref, *, y_noise,
                  torch_classifier=None, classifier_scale=1.0):
    import torch as th
    import torch.nn.functional as F

    sp = spaced_factory(cand)
    cond_fn = None
    if torch_classifier is not None:
        def cond_fn(x, t, y=None):
            with th.enable_grad():
                x_in = x.detach().requires_grad_(True)
                logits = torch_classifier(x_in, t)
                log_probs = F.log_softmax(logits, dim=-1)
                selected = log_probs[range(len(logits)), y.view(-1)]
                return th.autograd.grad(selected.sum(), x_in)[0] * classifier_scale

    all_images = []
    for y, noise in y_noise:
        model_kwargs = {}
        if y is not None:
            model_kwargs["y"] = th.from_numpy(y)
        with th.no_grad() if cond_fn is None else th.enable_grad():
            sample = sp.ddim_sample_loop(
                lambda x, t, y=None: torch_model(x, t, y) if y is not None
                else torch_model(x, t),
                (noise.shape[0], 3, IMG, IMG),
                noise=th.from_numpy(noise.transpose(0, 3, 1, 2)),
                clip_denoised=True, cond_fn=cond_fn,
                model_kwargs=model_kwargs, device="cpu")
        sample = ((sample + 1) * 127.5).clamp(0, 255).to(th.uint8)
        all_images.append(sample.permute(0, 2, 3, 1).numpy())
    feats = stub_feats_np(np.concatenate(all_images, axis=0))
    return reference_frechet(feats, ref)


class TestFullChainFitnessParity:
    def test_guided_fid_matches_reference(self, reference_gd, ref_stats,
                                          spaced_diffusion_factory):
        import torch
        from guided_diffusion.unet import EncoderUNetModel as TorchEnc
        from guided_diffusion.unet import UNetModel as TorchUNet

        torch.manual_seed(0)
        tm = TorchUNet(image_size=IMG, in_channels=3, model_channels=32,
                       out_channels=6, num_res_blocks=1,
                       attention_resolutions=(2,), dropout=0.0,
                       channel_mult=(1, 2), num_classes=NUM_CLASSES,
                       use_checkpoint=False, use_fp16=False, num_heads=1,
                       num_head_channels=32, num_heads_upsample=-1,
                       use_scale_shift_norm=True, resblock_updown=True,
                       use_new_attention_order=True).eval()
        tc = TorchEnc(image_size=IMG, in_channels=3, model_channels=32,
                      out_channels=NUM_CLASSES, num_res_blocks=1,
                      attention_resolutions=(2,), channel_mult=(1, 2),
                      use_fp16=False, num_head_channels=32,
                      use_scale_shift_norm=True, resblock_updown=True,
                      pool="attention").eval()
        fm = tiny_model(out_channels=6, num_classes=NUM_CLASSES)
        fc = EncoderUNetModel(model_channels=32, out_channels=NUM_CLASSES,
                              num_res_blocks=1, attention_ds=(2,),
                              channel_mult=(1, 2), num_head_channels=32,
                              use_scale_shift_norm=True, resblock_updown=True,
                              pool="attention")
        params = convert_unet(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()}, fm)
        cparams = convert_classifier(
            {k: v.detach().numpy() for k, v in tc.state_dict().items()}, fc)

        cands = [[94, 354, 574, 834], [7, 250, 500, 900]]
        fitness = make_adm_fitness(
            model=fm, params=params, image_size=IMG,
            feature_fn=stub_feature_fn, ref_stats=ref_stats,
            num_samples=NUM_SAMPLES, batch_size=BATCH,
            classifier=fc, classifier_params=cparams, classifier_scale=1.5,
            num_classes=NUM_CLASSES, candidate_chunk=len(cands), seed=SEED,
            feature_dim=48)
        ours = fitness(cands)

        y_noise_all = replay_rng(len(cands) * BATCH, with_labels=True,
                                 label_batch=BATCH)
        for i, cand in enumerate(cands):
            sl = slice(i * BATCH, (i + 1) * BATCH)
            y_noise = [(y[sl], n[sl]) for y, n in y_noise_all]
            ref_fid = reference_fid(tm, cand, spaced_diffusion_factory,
                                    ref_stats, y_noise=y_noise,
                                    torch_classifier=tc, classifier_scale=1.5)
            assert ours[i] == pytest.approx(ref_fid, rel=2e-3, abs=2e-3), \
                (i, ours[i], ref_fid)
        # distinct candidates must rank distinctly (non-degenerate fitness)
        assert abs(ours[0] - ours[1]) > 1e-6

    def test_uncond_fid_matches_reference(self, reference_gd, ref_stats,
                                          spaced_diffusion_factory):
        import torch
        from guided_diffusion.unet import UNetModel as TorchUNet

        torch.manual_seed(1)
        tm = TorchUNet(image_size=IMG, in_channels=3, model_channels=32,
                       out_channels=6, num_res_blocks=1,
                       attention_resolutions=(2,), dropout=0.0,
                       channel_mult=(1, 2), num_classes=None,
                       use_checkpoint=False, use_fp16=False, num_heads=1,
                       num_head_channels=32, num_heads_upsample=-1,
                       use_scale_shift_norm=True, resblock_updown=True,
                       use_new_attention_order=True).eval()
        fm = tiny_model(out_channels=6)
        params = convert_unet(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()}, fm)

        cands = [[6, 268, 639, 871]]
        fitness = make_adm_fitness(
            model=fm, params=params, image_size=IMG,
            feature_fn=stub_feature_fn, ref_stats=ref_stats,
            num_samples=NUM_SAMPLES, batch_size=BATCH,
            num_classes=None, candidate_chunk=1, seed=SEED, feature_dim=48)
        ours = fitness(cands)

        y_noise = replay_rng(BATCH, with_labels=False)
        ref_fid = reference_fid(tm, cands[0], spaced_diffusion_factory,
                                ref_stats, y_noise=y_noise)
        assert ours[0] == pytest.approx(ref_fid, rel=2e-3, abs=2e-3)
