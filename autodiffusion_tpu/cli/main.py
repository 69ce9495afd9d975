"""``adt`` — the AutoDiffusion-TPU command line.

Subcommands covering the reference's entry points (SURVEY.md section 1 L7):
  search       evolutionary timestep (or joint timestep+arch) search, ADM
               models (search_imagenet64_classifier_guidance.py /
               search_uncondition_model.py / ..._progressive.py)
  search-sd    Stable Diffusion latent search (sd/scripts/search_ea.py)
  sample       sample with a searched schedule, save samples npz/PNGs
               (scripts/classifier_sample.py and prunedUNET variants)
  sr-sample    super-resolution sampling (scripts/super_res_sample.py)
  txt2img      SD text-to-image (txt2img_fid.py / txt2img.py /
               txt2img_prompt_mask.py)
  img2img      SD image-to-image (scripts/img2img.py)
  ldm-sample   latent-diffusion zoo, uncond + class-cond
               (scripts/sample_diffusion.py)
  inpaint      concat-conditioned latent inpainting (scripts/inpaint.py)
  nll          bits/dim (scripts/image_nll.py)
  evaluate     offline FID/sFID/IS/P&R of a sample npz vs reference stats
               (evaluations/evaluator.py)
  ref-stats    precompute FID reference statistics from an image npz/folder
  convert      torch .pt/.ckpt checkpoint -> flax msgpack (incl. --preset sd
               three-tower split)
  train        train/fine-tune (train_util.py TrainLoop + OFA variants)
  train-classifier  noisy guidance classifier (scripts/classifier_train.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from ..utils import logger
from ..utils.config import add_dict_to_argparser


def _params_from(path, model, init_args, convert_fn):
    """Model params from either an own-format ``.msgpack`` file (the
    output of ``adt convert`` / ``adt train``) or a torch ``.pt``/
    ``.ckpt`` checkpoint converted in memory — every model-loading
    subcommand accepts both (reference loads torch only,
    dist_util.load_state_dict)."""
    if path.endswith(".msgpack"):
        from ..utils.checkpoint import load_tree_for_model
        return load_tree_for_model(path, model, init_args)
    from ..models.convert import load_torch_state_dict
    return convert_fn(load_torch_state_dict(path), model)


def _write_pngs(dir_: str, arr) -> None:
    """*_generate_image.py / txt2img.py parity: one PNG per sample."""
    from PIL import Image
    os.makedirs(dir_, exist_ok=True)
    for i, img in enumerate(np.asarray(arr)):
        Image.fromarray(img).save(f"{dir_}/{i:06d}.png")
    logger.log(f"wrote {len(arr)} PNGs to {dir_}")


def _adm_init_args(cfg):
    import jax.numpy as jnp
    a = [jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
         jnp.zeros((1,))]
    if cfg.class_cond:
        a.append(jnp.zeros((1,), jnp.int32))
    return a


def _search_defaults():
    # search_imagenet64_classifier_guidance.py:600-618 + model flags
    return dict(
        model_path="", classifier_path="", ref_stats="", save_dir="",
        classifier_scale=1.0, use_ddim=True, time_step=4,
        num_samples=5000, batch_size=100, max_epochs=10, select_num=10,
        population_num=50, m_prob=0.25, crossover_num=15, mutation_num=25,
        use_ddim_init_x=True, seed=0, candidate_chunk=4, resume=False,
        max_device_batch=-1,   # -1 = auto HBM cap (fitness.py), 0 = off
        use_dynamic_unet=False, index_step=0, max_prun=0.1, min_prun=0.0,
        init_timesteps="", inception_path="", class_cond=True,
        image_size=64, num_channels=192, num_res_blocks=3,
        num_head_channels=64, attention_resolutions="32,16,8",
        learn_sigma=True, noise_schedule="cosine", use_scale_shift_norm=True,
        resblock_updown=True, use_new_attention_order=True, use_bf16=True,
        dropout=0.0, channel_mult="",
    )


def _derive_low_res(it, scale: int):
    """Derive SR conditioning by exact area downsampling of each batch —
    upstream guided-diffusion's load_superres_data
    F.interpolate(mode="area"), which is a block mean at integer scale."""
    for b in it:
        x = b["x"]
        n, h, w, c = x.shape
        b = dict(b)
        b["low_res"] = x.reshape(n, h // scale, scale,
                                 w // scale, scale, c).mean(axis=(2, 4))
        yield b


def _train_data_iter(data_dir: str, *, batch_size: int, image_size: int,
                     class_cond: bool, seed: int = 0,
                     lq_dir=None, small_size=None):
    """Training batches from an image FOLDER (PIL pipeline, images.py
    load_data — image_datasets.py:16-92 parity) or from a uint8 [N,H,W,C]
    ``.npy`` file served by the C++ mmap + thread-pool prefetch loader
    (native/adt_data.cpp) — the bulk-throughput path; at small image sizes
    the PIL decode loop is slower than the train step itself. Labels for a
    class-conditional run come from a sibling ``<stem>_labels.npy``."""
    from ..data import load_data

    if data_dir.endswith(".npy"):
        if lq_dir:
            raise ValueError("--lq_dir pairs need an image folder "
                             "--data_dir (the npy bulk loader has no "
                             "paired-file mode; omit --lq_dir to derive "
                             "low_res by area downsampling)")
        from ..data.native_loader import NativeNpyLoader
        labels = data_dir[:-len(".npy")] + "_labels.npy"
        if class_cond and not os.path.exists(labels):
            raise ValueError(
                f"class_cond training from an npy needs labels at {labels} "
                "(one int per image)")
        return NativeNpyLoader(data_dir, labels if class_cond else None,
                               batch_size=batch_size, crop=image_size,
                               seed=seed)
    return load_data(data_dir=data_dir, batch_size=batch_size,
                     image_size=image_size, class_cond=class_cond, seed=seed,
                     lq_dir=lq_dir, small_size=small_size)


def _maybe_resume_ea(searcher, args) -> None:
    """Resume a crashed/interrupted EA from save_dir/ea_state.json.

    Without --resume a re-run would construct a fresh searcher and the
    first _save() would os.replace() the old checkpoint — destroying
    every memoized FID the crashed run paid for. The checkpoint/resume
    machinery (evolution.py load/_save) was otherwise unreachable from
    the CLI."""
    path = searcher.checkpoint_path
    if not getattr(args, "resume", False):
        if path and os.path.exists(path):
            logger.log(f"note: {path} exists from a previous run; pass "
                       "--resume True to continue it (starting fresh "
                       "will overwrite it)")
        return
    if not path:
        raise ValueError("--resume needs --save_dir (the EA checkpoint "
                         "lives at save_dir/ea_state.json)")
    if not os.path.exists(path):
        logger.log(f"--resume: no checkpoint at {path}, starting fresh")
        return
    searcher.load(path)


def cmd_search(args) -> int:
    import jax
    import jax.numpy as jnp
    from ..fid import FIDStats, load_fid_inception_params
    from ..models import (ClassifierConfig, ModelConfig, create_classifier,
                          create_model)
    from ..models.convert import (convert_classifier, convert_unet,
                                  load_torch_state_dict)
    from ..search import (EvolutionSearcher, JointSpace, TimestepSpace,
                          make_adm_fitness, progressive_skip_hook)

    logger.configure(args.save_dir or None)
    cfg = ModelConfig(
        image_size=args.image_size, num_channels=args.num_channels,
        num_res_blocks=args.num_res_blocks,
        num_head_channels=args.num_head_channels,
        attention_resolutions=args.attention_resolutions,
        channel_mult=args.channel_mult, class_cond=args.class_cond,
        learn_sigma=args.learn_sigma, noise_schedule=args.noise_schedule,
        use_scale_shift_norm=args.use_scale_shift_norm,
        resblock_updown=args.resblock_updown,
        use_new_attention_order=args.use_new_attention_order,
        use_bf16=args.use_bf16, dropout=args.dropout)
    model = create_model(cfg)
    params = _params_from(args.model_path, model, _adm_init_args(cfg),
                          convert_unet)

    classifier = cparams = None
    if args.classifier_path:
        ccfg = ClassifierConfig.adm64(image_size=args.image_size)
        classifier = create_classifier(ccfg)
        cparams = _params_from(args.classifier_path, classifier,
                               _adm_init_args(cfg)[:2], convert_classifier)

    # inception params are a jit ARGUMENT of the fitness chunk, never a
    # feature_fn closure (constant-folding a 95 MB closure during lowering
    # ballooned a full-scale search compile past 60 GB host RSS)
    from ..fid.evaluator import inception_apply
    iparams = load_fid_inception_params(args.inception_path)
    ref = FIDStats.load(args.ref_stats)

    joint = bool(args.use_dynamic_unet)
    fitness = make_adm_fitness(
        model=model, params=params, image_size=cfg.image_size,
        feature_fn=inception_apply, feature_params=iparams,
        ref_stats=ref, num_samples=args.num_samples,
        batch_size=args.batch_size, base_schedule=cfg.noise_schedule,
        classifier=classifier, classifier_params=cparams,
        classifier_scale=args.classifier_scale,
        num_classes=1000 if cfg.class_cond else None,
        use_ddim=args.use_ddim, learn_sigma=cfg.learn_sigma, joint=joint,
        candidate_chunk=args.candidate_chunk, seed=args.seed,
        max_device_batch=(None if args.max_device_batch < 0
                          else args.max_device_batch))

    hook = None
    if joint:
        space = JointSpace(cfg.diffusion_steps, model.layer_num,
                           args.index_step, (0.0, 0.0))
        hook = progressive_skip_hook(args.max_prun, args.min_prun)
    else:
        search_space = None
        if args.init_timesteps:
            from ..search import parse_timestep_string
            search_space = TimestepSpace.restricted_window(
                parse_timestep_string(args.init_timesteps), cfg.diffusion_steps)
        space = TimestepSpace(cfg.diffusion_steps, args.time_step,
                              search_space=search_space)
    searcher = EvolutionSearcher(
        space, fitness, population_num=args.population_num,
        select_num=args.select_num, mutation_num=args.mutation_num,
        crossover_num=args.crossover_num, m_prob=args.m_prob,
        max_epochs=args.max_epochs, use_ddim_init_x=args.use_ddim_init_x,
        use_ddim=args.use_ddim,
        checkpoint_path=(f"{args.save_dir}/ea_state.json"
                         if args.save_dir else None),
        on_epoch_start=hook)
    _maybe_resume_ea(searcher, args)
    import time
    t0 = time.time()
    best, fid = searcher.search()
    logger.log(f"total searching time = {(time.time() - t0) / 3600:.2f} hours")
    print(json.dumps({"best": list(best) if not joint else
                      {"timesteps": list(best[0]),
                       "skip_layers": [list(s) for s in best[1]]},
                      "fid": fid}))
    return 0


def cmd_sample(args) -> int:
    import jax
    import jax.numpy as jnp
    from ..models import (ClassifierConfig, ModelConfig, create_classifier,
                          create_model, create_tables)
    from ..models.convert import (convert_classifier, convert_unet,
                                  load_torch_state_dict)
    from ..samplers import classifier_cond_fn, ddim_sample_loop, p_sample_loop
    from ..samplers.diffusion import ModelVarType
    from ..search import parse_timestep_string
    from ..search.pipelines import keep_masks_for
    from ..search.fitness import to_uint8

    if args.classifier_path and not args.class_cond:
        raise ValueError("classifier guidance requires --class_cond True "
                         "(the guidance log-prob is taken at the sampled "
                         "class labels)")
    cfg = ModelConfig(
        image_size=args.image_size, num_channels=args.num_channels,
        num_res_blocks=args.num_res_blocks,
        num_head_channels=args.num_head_channels,
        attention_resolutions=args.attention_resolutions,
        channel_mult=args.channel_mult, class_cond=args.class_cond,
        learn_sigma=args.learn_sigma, noise_schedule=args.noise_schedule,
        use_scale_shift_norm=args.use_scale_shift_norm,
        resblock_updown=args.resblock_updown,
        use_new_attention_order=args.use_new_attention_order,
        use_bf16=args.use_bf16,
        timestep_respacing=args.timestep_respacing)
    model = create_model(cfg)
    params = _params_from(args.model_path, model, _adm_init_args(cfg),
                          convert_unet)
    use_ts = parse_timestep_string(args.use_timestep) if args.use_timestep else None
    tables = create_tables(cfg, use_ts)

    keep = None
    if args.skip_layers:
        import ast
        skips = ast.literal_eval(args.skip_layers)
        if len(skips) != tables.num_steps:
            raise ValueError(
                f"--skip_layers has {len(skips)} entries but the schedule "
                f"has {tables.num_steps} steps; inside the jitted scan an "
                "out-of-bounds keep[i] would silently clamp to the last "
                "mask instead of failing")
        keep = jnp.asarray(keep_masks_for(skips, model.layer_num))

    if args.classifier_path:
        ccfg = ClassifierConfig.adm64(image_size=args.image_size)
        classifier = create_classifier(ccfg)
        cparams = _params_from(args.classifier_path, classifier,
                               _adm_init_args(cfg)[:2], convert_classifier)

    # shard the batch axis over the device mesh, like the search fitness
    # path (data_sharder) — each chip denoises its slice of the batch
    from ..parallel import data_sharder, make_mesh
    mesh = make_mesh()
    shard_fn = data_sharder(mesh)

    all_imgs, all_labels = [], []
    rng = jax.random.key(args.seed)
    n_done = 0
    while n_done < args.num_samples:
        rng, step_rng, label_rng = jax.random.split(rng, 3)
        y = (jax.random.randint(label_rng, (args.batch_size,), 0, 1000)
             if cfg.class_cond else None)

        def model_fn(x, t, i):
            kw = {"keep_mask": keep[i]} if keep is not None else {}
            return (model.apply(params, x, t, y, **kw) if y is not None
                    else model.apply(params, x, t, **kw))

        cond_fn = None
        if args.classifier_path:
            cond_fn = classifier_cond_fn(
                lambda x, t: classifier.apply(cparams, x, t), y,
                args.classifier_scale)
        loop = ddim_sample_loop if args.use_ddim else p_sample_loop
        shape = (args.batch_size, cfg.image_size, cfg.image_size, 3)
        rng_noise, step_rng = jax.random.split(step_rng)
        # learn_sigma=False models emit 3 channels: the reference's
        # create_gaussian_diffusion falls back to FIXED_LARGE variance
        # (script_util.py), as cmd_train already maps
        var_type = (ModelVarType.LEARNED_RANGE if cfg.learn_sigma
                    else ModelVarType.FIXED_LARGE)
        with mesh:
            noise = shard_fn(jax.random.normal(rng_noise, shape))
            x0 = loop(model_fn, shape, tables, rng=step_rng, cond_fn=cond_fn,
                      var_type=var_type, noise=noise)
            imgs = to_uint8(x0)
        all_imgs.append(np.asarray(imgs))
        if y is not None:
            all_labels.append(np.asarray(y))
        n_done += args.batch_size
        logger.log(f"created {n_done} samples")

    arr = np.concatenate(all_imgs)[: args.num_samples]
    out = args.out or f"samples_{arr.shape[0]}x{arr.shape[1]}x{arr.shape[2]}x3.npz"
    if all_labels:
        labels = np.concatenate(all_labels)[: args.num_samples]
        np.savez(out, arr_0=arr, arr_1=labels)
    else:
        np.savez(out, arr_0=arr)
    logger.log(f"saved to {out}")
    if args.save_png_dir:
        _write_pngs(args.save_png_dir, arr)
    return 0


def cmd_sr_sample(args) -> int:
    """Super-resolution sampling: upsample low-res npz conditioning
    (scripts/super_res_sample.py)."""
    import jax
    import jax.numpy as jnp
    from ..models import ModelConfig, create_sr_model, create_tables
    from ..search.fitness import to_uint8
    from ..samplers import ddim_sample_loop, p_sample_loop
    from ..samplers.diffusion import ModelVarType

    cfg = ModelConfig(image_size=args.large_size,
                      num_channels=args.num_channels,
                      num_res_blocks=args.num_res_blocks,
                      channel_mult=args.channel_mult,
                      learn_sigma=args.learn_sigma,
                      noise_schedule=args.noise_schedule,
                      class_cond=args.class_cond, use_bf16=args.use_bf16)
    sr = create_sr_model(cfg, large_size=args.large_size,
                         small_size=args.small_size)
    with np.load(args.base_samples) as z:
        low = z[z.files[0]]
        labels = z["arr_1"] if "arr_1" in z.files else None
    low = jnp.asarray(low[: args.num_samples], jnp.float32) / 127.5 - 1.0
    n = low.shape[0]
    x1 = jnp.zeros((1, args.large_size, args.large_size, 3))
    init_args = [x1, jnp.zeros((1,)), low[:1]]
    if cfg.class_cond:
        init_args.append(jnp.zeros((1,), jnp.int32))
    if args.model_path and not args.model_path.endswith(".msgpack"):
        # torch super_res checkpoint: the SuperResModel is a concat
        # wrapper around a plain UNet (unet.py:668-682), so the state
        # dict converts with convert_unet onto the nested 'unet' module
        from ..models.convert import convert_unet, load_torch_state_dict
        inner = convert_unet(load_torch_state_dict(args.model_path), sr.unet)
        params = {"params": {"unet": inner["params"]}}
    elif args.model_path:
        from ..utils.checkpoint import load_tree_for_model
        params = load_tree_for_model(args.model_path, sr, init_args)
    else:
        params = sr.init(jax.random.key(args.seed), *init_args)
    tables = create_tables(cfg)
    # condition on the base samples' labels (arr_1, the reference
    # super_res_sample.py contract); fall back to class 0 when absent
    y = None
    if cfg.class_cond:
        y = (jnp.asarray(labels[:n], jnp.int32) if labels is not None
             else jnp.zeros((n,), jnp.int32))

    loop = ddim_sample_loop if args.use_ddim else p_sample_loop
    var_type = (ModelVarType.LEARNED_RANGE if cfg.learn_sigma
                else ModelVarType.FIXED_LARGE)
    # stream in batches like the reference super_res_sample.py loop — one
    # giant (N, 256, 256, 3) scan would blow the 16 GB HBM at real N
    bs = min(args.batch_size, n)
    outs = []
    for j in range(0, n, bs):
        low_j = low[j:j + bs]
        y_j = None if y is None else y[j:j + bs]

        def model_fn(x, t, i, low_j=low_j, y_j=y_j):
            a = [x, t, low_j]
            if y_j is not None:
                a.append(y_j)
            return sr.apply(params, *a)

        x0 = loop(model_fn,
                  (low_j.shape[0], args.large_size, args.large_size, 3),
                  tables, rng=jax.random.key(args.seed + j),
                  var_type=var_type)
        outs.append(np.asarray(to_uint8(x0)))
        logger.log(f"super-resolved {j + low_j.shape[0]}/{n}")
    out = args.out or "sr_samples.npz"
    np.savez(out, arr_0=np.concatenate(outs))
    print(f"saved {n} super-resolved samples to {out}")
    return 0


def _sd_stack(args):
    """Load the three SD towers from a CompVis checkpoint."""
    import jax.numpy as jnp
    from ..models import (AutoencoderKL, CLIPTextConfig, CLIPTextEncoder,
                          ClipBPETokenizer, SDUNetModel)
    from ..models.convert import load_torch_state_dict
    from ..models.sd_convert import split_sd_checkpoint

    dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32
    unet = SDUNetModel(dtype=dtype)
    vae = AutoencoderKL(dtype=dtype)
    clip_cfg = CLIPTextConfig()
    clip = CLIPTextEncoder(clip_cfg, dtype=dtype)
    if os.path.isdir(args.ckpt):
        # own-format directory written by `adt convert --preset sd`
        from ..models.sd_convert import load_sd_params_dir
        uparams, vparams, cparams = load_sd_params_dir(
            args.ckpt, unet=unet, vae=vae, clip=clip, clip_config=clip_cfg)
    else:
        sd = load_torch_state_dict(args.ckpt)
        uparams, vparams, cparams = split_sd_checkpoint(
            sd, unet=unet, vae=vae, clip_config=clip_cfg)
    tok = ClipBPETokenizer.from_files(args.clip_vocab, args.clip_merges)
    return unet, uparams, vae, vparams, clip, cparams, tok


def cmd_search_sd(args) -> int:
    """SD latent search (sd/scripts/search_ea.py main)."""
    import jax
    import jax.numpy as jnp
    from ..data import load_captions
    from ..fid import FIDStats, load_fid_inception_params
    from ..search import (ContinuousTimeSpace, EvolutionSearcher, TimestepSpace)
    from ..search.sd_pipelines import make_sd_fitness

    logger.configure(args.save_dir or None)
    unet, uparams, vae, vparams, clip, cparams, tok = _sd_stack(args)

    captions = [c["caption"] for c in load_captions(args.captions,
                                                    limit=args.num_prompts)]
    ids = jnp.asarray(tok(captions))
    encode = jax.jit(lambda i: clip.apply(cparams, i))
    bank = []
    for i in range(0, len(captions), 64):
        bank.append(encode(ids[i:i + 64]))
    context_bank = jnp.concatenate(bank)
    uncond = encode(jnp.asarray(tok([""])))[0]

    from ..fid.evaluator import inception_apply
    iparams = load_fid_inception_params(args.inception_path)
    ref = FIDStats.load(args.ref_stats)
    fitness = make_sd_fitness(
        unet=unet, unet_params=uparams, vae=vae, vae_params=vparams,
        context_bank=context_bank, uncond_context=uncond,
        feature_fn=inception_apply, feature_params=iparams,
        ref_stats=ref, num_samples=args.num_samples,
        batch_size=args.batch_size, sampler=args.sampler,
        guidance_scale=args.scale, latent_hw=args.H // 8,
        candidate_chunk=args.candidate_chunk, seed=args.seed)

    if args.sampler == "dpm_solver":
        space = ContinuousTimeSpace.uniform_grid(args.time_step + 1)
    else:
        space = TimestepSpace(1000, args.time_step)
    searcher = EvolutionSearcher(
        space, fitness, population_num=args.population_num,
        select_num=args.select_num, mutation_num=args.mutation_num,
        crossover_num=args.crossover_num, m_prob=args.m_prob,
        max_epochs=args.max_epochs, use_ddim_init_x=args.use_ddim_init_x,
        checkpoint_path=(f"{args.save_dir}/ea_state.json"
                         if args.save_dir else None))
    _maybe_resume_ea(searcher, args)
    import time
    t0 = time.time()
    best, fid = searcher.search()
    # reference parity: search_ea.py:911 logs the same line
    logger.log(f"total searching time = {(time.time() - t0) / 3600:.2f} hours")
    print(json.dumps({"best": list(best), "fid": fid}))
    return 0


def cmd_txt2img(args) -> int:
    """Sample COCO/text prompts with an optional searched schedule
    (sd/scripts/txt2img_fid.py)."""
    import ast
    import jax
    import jax.numpy as jnp
    from ..samplers import (DiscreteNoiseSchedule, cfg_eps_fn,
                            ddim_sample_loop, dpm_solver_sample_loop,
                            plms_sample_loop)
    from ..samplers.diffusion import ModelVarType
    from ..schedules import build_sd_tables, make_beta_schedule
    from ..search.sd_pipelines import sd_decode_to_uint8

    prompts = [args.prompt] * args.n_samples if args.prompt else []
    if args.from_file:
        with open(args.from_file) as f:
            prompts = [l.strip() for l in f if l.strip()]
    if not prompts:
        print("no prompts: pass --prompt or a non-empty --from_file "
              "(writing a 0-sample npz would only fail downstream)")
        return 1
    unet, uparams, vae, vparams, clip, cparams, tok = _sd_stack(args)
    # one empty-prompt uncond row (cfg_eps_fn broadcasts it) and
    # n_samples-sized sampling batches — a 30K-caption --from_file must
    # not become one giant CFG batch (the reference iterates the loader
    # in batches, txt2img_fid.py)
    uc = clip.apply(cparams, jnp.asarray(tok([""])))[0]
    bsz = max(1, args.n_samples)

    # per-step guidance mask (txt2img_prompt_mask.py ablation: steps with
    # mask 0 run unconditional-only). The reference ablation is PLMS-only;
    # our ddim path also threads the index, dpm_solver does not.
    if args.prompt_mask and args.sampler == "dpm_solver":
        print("--prompt_mask needs a stepwise sampler (plms/ddim); "
              "the dpm_solver loop has no per-step index")
        return 1
    pmask = (jnp.asarray(ast.literal_eval(args.prompt_mask), jnp.float32)
             if args.prompt_mask else None)

    if args.timesteps:
        steps = ast.literal_eval(args.timesteps)
    else:
        steps = None
    if args.sampler == "dpm_solver":
        betas = make_beta_schedule("sqrt_linear", 1000)
        sched = DiscreteNoiseSchedule.from_betas(betas)
        times = (jnp.asarray(sorted(steps, reverse=True), jnp.float32)
                 if steps else jnp.linspace(1.0, 1e-3, args.steps + 1))
        tables = None
        n_steps = None
    else:
        from ..schedules import make_ddim_timesteps
        use = steps if steps else make_ddim_timesteps("uniform", args.steps, 1000)
        tables = build_sd_tables(use)
        n_steps = tables.num_steps
    # a short mask would silently clamp to its last entry under traced
    # indexing, skewing the ablation — fail loud instead. Validate
    # against the BUILT schedule, not args.steps: the uniform grid can
    # produce a different count (make_ddim_timesteps docstring)
    if pmask is not None and pmask.shape[0] != n_steps:
        print(f"--prompt_mask has {pmask.shape[0]} entries but the "
              f"schedule has {n_steps} steps")
        return 1

    all_imgs = []
    rng = jax.random.key(args.seed)
    for start in range(0, len(prompts), bsz):
        batch_prompts = prompts[start:start + bsz]
        ctx = clip.apply(cparams, jnp.asarray(tok(batch_prompts)))
        nb = len(batch_prompts)
        shape = (nb, args.H // 8, args.W // 8, 4)
        guided = cfg_eps_fn(
            lambda x2, t2, c2: unet.apply(uparams, x2, t2, c2),
            ctx, uc, args.scale, prompt_mask=pmask)
        rng, sub = jax.random.split(rng)
        if args.sampler == "dpm_solver":
            z = dpm_solver_sample_loop(guided, shape, sched, times, rng=sub)
        elif args.sampler == "plms":
            z = plms_sample_loop(lambda x, t, i: guided(x, t, i), shape,
                                 tables, rng=sub)
        else:
            z = ddim_sample_loop(lambda x, t, i: guided(x, t, i), shape,
                                 tables, rng=sub, clip_denoised=False,
                                 var_type=ModelVarType.FIXED_SMALL)
        all_imgs.append(np.asarray(sd_decode_to_uint8(
            lambda p, zz: vae.apply(p, zz, method=vae.decode), vparams, z)))
    imgs = np.concatenate(all_imgs) if all_imgs else np.zeros(
        (0, args.H, args.W, 3), np.uint8)
    out = args.out or "txt2img_samples.npz"
    np.savez(out, arr_0=imgs)
    if args.save_png_dir:
        _write_pngs(args.save_png_dir, imgs)
    print(f"saved {len(imgs)} samples to {out}")
    return 0


def cmd_img2img(args) -> int:
    """Image-to-image: encode init image, diffuse to strength*K, denoise
    (sd/scripts/img2img.py semantics: t_enc = int(strength * steps))."""
    import ast
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from ..models.vae import SD_SCALE_FACTOR
    from ..samplers import ddim_sample_loop
    from ..samplers.diffusion import ModelVarType, q_sample
    from ..schedules import build_sd_tables, make_ddim_timesteps
    from ..search.sd_pipelines import sd_decode_to_uint8

    unet, uparams, vae, vparams, clip, cparams, tok = _sd_stack(args)
    img = Image.open(args.init_img).convert("RGB")
    img = img.resize((args.W, args.H), Image.LANCZOS)
    x = jnp.asarray(np.array(img), jnp.float32)[None] / 127.5 - 1.0
    n = args.n_samples
    rng = jax.random.key(args.seed)
    # reference get_first_stage_encoding SAMPLES the posterior
    # (DiagonalGaussianDistribution.sample, ddpm.py) — one independent
    # draw per output sample, not the posterior mean
    mean, logvar = vae.apply(vparams, x, method=vae.encode)
    enc_rng, rng = jax.random.split(rng)
    eps = jax.random.normal(enc_rng, (n,) + mean.shape[1:], mean.dtype)
    z0 = (mean + jnp.exp(0.5 * logvar) * eps) * SD_SCALE_FACTOR

    ctx = clip.apply(cparams, jnp.asarray(tok([args.prompt] * n)))
    uc = clip.apply(cparams, jnp.asarray(tok([""])))[0]

    steps = (ast.literal_eval(args.timesteps) if args.timesteps
             else make_ddim_timesteps("uniform", args.steps, 1000))
    tables = build_sd_tables(steps)
    t_enc = max(1, int(args.strength * tables.num_steps))
    sub = jax.tree_util.tree_map(lambda a: a[..., :t_enc], tables)

    from ..samplers import cfg_eps_fn
    guided = cfg_eps_fn(lambda x2, t2, c2: unet.apply(uparams, x2, t2, c2),
                        ctx, uc, args.scale)

    noise_rng, rng = jax.random.split(rng)
    # reference stochastic_encode gathers the ddim alpha at index t_enc —
    # one respaced level DEEPER than the last decoded step (ddim.py:220-233,
    # img2img.py:240-261) — then decodes over the first t_enc steps. Clamp
    # at the final grid point for strength == 1.0 (the reference errors
    # there with an out-of-range gather).
    enc_idx = min(t_enc, tables.num_steps - 1)
    z_enc = q_sample(tables, z0, jnp.full((n,), enc_idx),
                     jax.random.normal(noise_rng, z0.shape))
    z = ddim_sample_loop(guided, z_enc.shape, sub, rng=rng,
                         clip_denoised=False,
                         var_type=ModelVarType.FIXED_SMALL, noise=z_enc)
    imgs = sd_decode_to_uint8(
        lambda p, zz: vae.apply(p, zz, method=vae.decode), vparams, z)
    out = args.out or "img2img_samples.npz"
    np.savez(out, arr_0=np.asarray(imgs))
    if args.save_png_dir:
        _write_pngs(args.save_png_dir, imgs)
    print(f"saved {n} samples to {out}")
    return 0


def _ldm_first_stage(args, sd, dtype):
    """Build + convert the LDM first stage (VQ or KL) from CLI flags.
    fs_attn_ds: downsample ratios with attention (vq-f8 has attention at
    resolution 32 = ds 8)."""
    from ..models import AutoencoderKL, VQModelInterface
    from ..models.sd_convert import convert_vae, convert_vq

    fs_mult = tuple(int(m) for m in str(args.fs_ch_mult).split(","))
    fs_attn = tuple(int(d) for d in
                    str(getattr(args, "fs_attn_ds", "")).split(",") if d)
    if args.first_stage == "vq":
        fs = VQModelInterface(ch=args.fs_ch, ch_mult=fs_mult,
                              num_res_blocks=args.fs_num_res_blocks,
                              attn_at_ds=fs_attn,
                              z_channels=args.latent_channels,
                              embed_dim=args.embed_dim, n_embed=args.n_embed,
                              dtype=dtype)
        return fs, convert_vq(sd, fs)
    fs = AutoencoderKL(ch=args.fs_ch, ch_mult=fs_mult,
                       num_res_blocks=args.fs_num_res_blocks,
                       attn_at_ds=fs_attn, z_channels=args.latent_channels,
                       embed_dim=args.latent_channels, dtype=dtype)
    return fs, convert_vae(sd, fs)


def cmd_ldm_sample(args) -> int:
    """Unconditional latent-diffusion sampling — the celebahq/ffhq/
    lsun-churches LDM model zoo (sd/scripts/sample_diffusion.py):
    DDIM over the latent space, then first-stage KL or VQ decode.
    Defaults match celebahq-ldm-vq-4.yaml."""
    import ast
    import jax
    import jax.numpy as jnp
    from ..models import UNetModel
    from ..models.convert import convert_unet, load_torch_state_dict
    from ..samplers import ddim_sample_loop
    from ..samplers.diffusion import ModelVarType
    from ..schedules import build_sd_tables, make_ddim_timesteps
    from ..search.fitness import to_uint8

    dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32
    mult = tuple(int(m) for m in str(args.channel_mult).split(","))
    attn = tuple(int(d) for d in str(args.attention_ds).split(",") if d)
    sd = load_torch_state_dict(args.ckpt)
    if args.num_classes:
        # class-conditional LDM (cin-ldm-vq-f8 / cin256: crossattn UNet
        # conditioned on a ClassEmbedder token)
        from ..models import ClassEmbedder, SDUNetModel
        from ..models.sd_convert import convert_sd_unet
        unet = SDUNetModel(in_channels=args.latent_channels,
                           model_channels=args.num_channels,
                           out_channels=args.latent_channels,
                           num_res_blocks=args.num_res_blocks,
                           attention_ds=attn, channel_mult=mult,
                           num_head_channels=args.num_head_channels,
                           transformer_depth=1,
                           context_dim=args.context_dim, dtype=dtype)
        params = convert_sd_unet(sd, unet)
        embedder = ClassEmbedder(embed_dim=args.context_dim,
                                 n_classes=args.num_classes)
        emb_params = {"params": {"embedding": {
            "embedding": sd["cond_stage_model.embedding.weight"]}}}
    else:
        unet = UNetModel(model_channels=args.num_channels,
                         out_channels=args.latent_channels,
                         num_res_blocks=args.num_res_blocks,
                         attention_ds=attn, channel_mult=mult,
                         num_head_channels=args.num_head_channels,
                         use_scale_shift_norm=False, resblock_updown=False,
                         use_new_attention_order=False, dtype=dtype)
        usd = {k[len("model.diffusion_model."):]: v for k, v in sd.items()
               if k.startswith("model.diffusion_model.")}
        params = convert_unet(usd, unet)

    fs, fs_params = _ldm_first_stage(args, sd, dtype)

    steps = (ast.literal_eval(args.timesteps) if args.timesteps
             else make_ddim_timesteps("uniform", args.steps, 1000))
    tables = build_sd_tables(steps, linear_start=args.linear_start,
                             linear_end=args.linear_end)
    n = args.n_samples
    rng = jax.random.key(args.seed)
    hw = args.latent_size
    if args.num_classes:
        y_rng, rng = jax.random.split(rng)
        y = (jnp.full((n,), args.class_label, jnp.int32)
             if args.class_label >= 0 else
             jax.random.randint(y_rng, (n,), 0, args.num_classes))
        ctx = embedder.apply(emb_params, y)
        model_fn = lambda x, t, i: unet.apply(params, x, t, ctx)
    else:
        model_fn = lambda x, t, i: unet.apply(params, x, t)
    z = ddim_sample_loop(
        model_fn,
        (n, hw, hw, args.latent_channels), tables, rng=rng,
        eta=args.eta, clip_denoised=False,
        var_type=ModelVarType.FIXED_SMALL,
        final_step_noise=args.eta > 0)   # CompVis adds sigma*z at step 0
    x = fs.apply(fs_params, z / args.scale_factor, method=fs.decode)
    imgs = np.asarray(to_uint8(x))
    out = args.out or "ldm_samples.npz"
    np.savez(out, arr_0=imgs)
    if args.save_png_dir:
        _write_pngs(args.save_png_dir, imgs)
    print(f"saved {n} samples to {out}")
    return 0


def cmd_inpaint(args) -> int:
    """Latent inpainting (sd/scripts/inpaint.py, inpainting_big-style
    model): the UNet is concat-conditioned on [masked-image latent,
    downsampled mask]; sampled latents decode through the first stage
    and composite with the original outside the mask.

    --indir scans for `X.png` + `X_mask.png` pairs (reference layout);
    --image/--mask select a single pair."""
    import glob as globmod

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from ..models import UNetModel
    from ..models.convert import convert_unet, load_torch_state_dict
    from ..samplers import ddim_sample_loop
    from ..samplers.diffusion import ModelVarType
    from ..schedules import build_sd_tables, make_ddim_timesteps

    pairs = ([(args.image, args.mask)] if args.image else
             [(m.replace("_mask.png", ".png"), m)
              for m in sorted(globmod.glob(os.path.join(args.indir,
                                                        "*_mask.png")))])
    if not pairs:
        print("no image/mask pairs found")
        return 1

    dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32
    mult = tuple(int(m) for m in str(args.channel_mult).split(","))
    attn = tuple(int(d) for d in str(args.attention_ds).split(",") if d)
    unet = UNetModel(model_channels=args.num_channels,
                     out_channels=args.latent_channels,
                     num_res_blocks=args.num_res_blocks,
                     attention_ds=attn, channel_mult=mult,
                     num_head_channels=args.num_head_channels,
                     use_scale_shift_norm=False, resblock_updown=False,
                     use_new_attention_order=False, dtype=dtype)
    sd = load_torch_state_dict(args.ckpt)
    usd = {k[len("model.diffusion_model."):]: v for k, v in sd.items()
           if k.startswith("model.diffusion_model.")}
    params = convert_unet(usd, unet)
    fs, fs_params = _ldm_first_stage(args, sd, dtype)

    steps = make_ddim_timesteps("uniform", args.steps, 1000)
    tables = build_sd_tables(steps, linear_start=args.linear_start,
                             linear_end=args.linear_end)
    os.makedirs(args.outdir, exist_ok=True)
    rng = jax.random.key(args.seed)
    for img_path, mask_path in pairs:
        # make_batch (inpaint.py:11-30): [0,1] image, binarized mask,
        # masked_image = (1-mask)*image; ALL THREE mapped to [-1,1]
        img01 = np.asarray(Image.open(img_path).convert("RGB"),
                           np.float32) / 255.0
        mask01 = (np.asarray(Image.open(mask_path).convert("L"),
                             np.float32) / 255.0 >= 0.5).astype(np.float32)
        masked = (1.0 - mask01)[..., None] * img01
        h, w = img01.shape[:2]

        c = fs.apply(fs_params, jnp.asarray(masked * 2.0 - 1.0)[None],
                     method=fs.encode)
        if isinstance(c, tuple):            # KL first stage: (mean, logvar)
            c = c[0]
        # latent grid = whatever the encoder produced (its stride-2 convs
        # ceil non-multiple-of-f sizes); resize the mask to match rather
        # than assuming h/f x w/f (F.interpolate nearest, inpaint.py:81)
        lh, lw = c.shape[1:3]
        cc = jax.image.resize(jnp.asarray(mask01 * 2.0 - 1.0)[None, :, :, None],
                              (1, lh, lw, 1), method="nearest")
        cond = jnp.concatenate([c, cc], axis=-1)

        def model_fn(x, t, i, cond=cond):
            return unet.apply(params, jnp.concatenate(
                [x, jnp.broadcast_to(cond, x.shape[:1] + cond.shape[1:])],
                axis=-1), t)

        rng, sub = jax.random.split(rng)
        z = ddim_sample_loop(model_fn,
                             (1, lh, lw, args.latent_channels),
                             tables, rng=sub, clip_denoised=False,
                             var_type=ModelVarType.FIXED_SMALL)
        pred = fs.apply(fs_params, z, method=fs.decode)
        pred01 = np.clip((np.asarray(pred[0], np.float32) + 1.0) / 2.0, 0, 1)
        pred01 = pred01[:h, :w]     # decode of a ceil'd grid may overshoot
        out01 = (1.0 - mask01)[..., None] * img01 + mask01[..., None] * pred01
        out_path = os.path.join(args.outdir, os.path.basename(img_path))
        Image.fromarray((out01 * 255.0 + 0.5).astype(np.uint8)).save(out_path)
        print(f"inpainted {img_path} -> {out_path}")
    return 0


def cmd_train_classifier(args) -> int:
    """Train the noisy guidance classifier (scripts/classifier_train.py)."""
    import time

    import jax
    import jax.numpy as jnp
    from ..data import load_data
    from ..models import ClassifierConfig, create_classifier
    from ..parallel import data_sharder, make_mesh, replicate, shard_batch
    from ..schedules import build_base_tables
    from ..train import create_train_state, make_classifier_train_step
    from ..train.loop import resume_train_state
    from ..utils.checkpoint import save_tree

    logger.configure(args.save_dir or None)
    cfg = ClassifierConfig(
        image_size=args.image_size, classifier_width=args.classifier_width,
        classifier_depth=args.classifier_depth,
        classifier_attention_resolutions=args.classifier_attention_resolutions,
        classifier_use_scale_shift_norm=args.classifier_use_scale_shift_norm,
        classifier_resblock_updown=args.classifier_resblock_updown,
        classifier_pool=args.classifier_pool,
        classifier_use_bf16=args.classifier_use_bf16)
    clf = create_classifier(cfg, num_classes=args.num_classes)
    x1 = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    params = clf.init(jax.random.key(args.seed), x1, jnp.zeros((1,)))

    mesh = make_mesh()
    params = replicate(mesh, params)
    state = create_train_state(
        params, lr=args.lr, weight_decay=args.weight_decay,
        ema_rates=(), lr_anneal_steps=args.iterations if args.anneal_lr else 0)
    if args.resume_checkpoint:
        state = resume_train_state(state, args.resume_checkpoint,
                                   device_put_fn=lambda t: replicate(mesh, t))
    sharder = data_sharder(mesh)
    raw_step = make_classifier_train_step(clf.apply, noised=args.noised)

    def sharded_step(state, tables, batch, t, rng):
        batch = dict(batch, x=sharder(batch["x"]))
        return raw_step(state, tables, batch, t, rng)

    step = jax.jit(sharded_step)
    tables = build_base_tables(args.noise_schedule, args.diffusion_steps)
    data = map(lambda b: shard_batch(mesh, b),
               load_data(data_dir=args.data_dir, batch_size=args.batch_size,
                         image_size=cfg.image_size, class_cond=True,
                         random_crop=True))
    rng = np.random.RandomState(args.seed)
    i = int(state.step)
    with mesh:
        while i < args.iterations:
            t0 = time.time()
            batch = next(data)
            t = jnp.asarray(rng.randint(0, tables.num_steps, args.batch_size))
            state, metrics = step(state, tables,
                                  {k: jnp.asarray(v) for k, v in batch.items()},
                                  t, jax.random.key(rng.randint(2 ** 31)))
            i = int(state.step)
            metrics.pop("per_example_loss", None)
            logger.logkv("step", i)
            logger.logkv("samples", i * args.batch_size)
            logger.logkv_mean("step_time", time.time() - t0)
            for k, v in metrics.items():
                logger.logkv_mean(k, float(v))
            if i % args.log_interval == 0:
                logger.dumpkvs()
            if args.save_dir and args.save_interval and \
                    i % args.save_interval == 0:
                save_tree(f"{args.save_dir}/model{i:06d}.msgpack", state.params)
                save_tree(f"{args.save_dir}/opt{i:06d}.msgpack", state.opt_state)
    if args.save_dir and (not args.save_interval
                          or i % args.save_interval != 0):
        save_tree(f"{args.save_dir}/model{i:06d}.msgpack", state.params)
    return 0


def cmd_nll(args) -> int:
    """Bits/dim over a dataset (scripts/image_nll.py)."""
    import jax
    import jax.numpy as jnp
    from ..data import load_data
    from ..models import ModelConfig, create_model, create_tables
    from ..models.convert import convert_unet, load_torch_state_dict
    from ..train import calc_bpd_loop

    cfg = ModelConfig(image_size=args.image_size, num_channels=args.num_channels,
                      num_res_blocks=args.num_res_blocks,
                      learn_sigma=args.learn_sigma,
                      noise_schedule=args.noise_schedule,
                      class_cond=args.class_cond)
    model = create_model(cfg)
    params = _params_from(args.model_path, model, _adm_init_args(cfg),
                          convert_unet)
    tables = create_tables(cfg)
    data = load_data(data_dir=args.data_dir, batch_size=args.batch_size,
                     image_size=cfg.image_size, class_cond=cfg.class_cond,
                     deterministic=True)
    totals = []
    for i in range(args.num_samples // args.batch_size):
        batch = next(data)
        y = jnp.asarray(batch["y"]) if "y" in batch else None

        def model_fn(x_t, t_orig):
            return (model.apply(params, x_t, t_orig, y) if y is not None
                    else model.apply(params, x_t, t_orig))

        out = calc_bpd_loop(tables, model_fn, jnp.asarray(batch["x"]),
                            jax.random.key(i))
        totals.extend(np.asarray(out["total_bpd"]).tolist())
        logger.log(f"batch {i}: mean bpd {np.mean(totals):.4f}")
    print(json.dumps({"bpd": float(np.mean(totals))}))
    return 0


def cmd_train(args) -> int:
    """Train/fine-tune a diffusion UNet (scripts/image_train.py +
    train_util.py TrainLoop, incl. the OFA respacing curricula)."""
    import jax
    import jax.numpy as jnp
    from ..models import ModelConfig, create_model, create_tables
    from ..models.convert import convert_unet, load_torch_state_dict
    from ..parallel import data_sharder, make_mesh, replicate, shard_batch
    from ..train import (TrainLoop, create_named_schedule_sampler,
                         create_train_state, make_train_step,
                         ofa_random_select_tables_fn, ofa_tables_fn,
                         resume_train_state)

    logger.configure(args.save_dir or None)
    cfg = ModelConfig(
        image_size=args.image_size, num_channels=args.num_channels,
        num_res_blocks=args.num_res_blocks,
        num_head_channels=args.num_head_channels,
        attention_resolutions=args.attention_resolutions,
        channel_mult=args.channel_mult,
        class_cond=args.class_cond, learn_sigma=args.learn_sigma,
        noise_schedule=args.noise_schedule, use_bf16=args.use_bf16,
        dropout=args.dropout, resblock_updown=args.resblock_updown,
        use_scale_shift_norm=args.use_scale_shift_norm,
        use_new_attention_order=args.use_new_attention_order)
    sr_mode = args.sr_small_size > 0
    if sr_mode:
        # SR-pair training (scripts/super_res_train.py): a SuperResModel at
        # image_size conditioned on sr_small_size inputs. Pairs come from
        # --lq_dir (the fork's paired-lq mode) or, absent one, low_res is
        # derived per batch by exact area downsampling (upstream
        # guided-diffusion's F.interpolate(mode="area") semantics).
        from ..models import create_sr_model
        if cfg.image_size % args.sr_small_size:
            raise ValueError(
                f"--image_size {cfg.image_size} must be a multiple of "
                f"--sr_small_size {args.sr_small_size}")
        model = create_sr_model(cfg, large_size=cfg.image_size,
                                small_size=args.sr_small_size)
    else:
        model = create_model(cfg)
    # --resume_checkpoint accepts a torch .pt (one-time conversion) OR an
    # own-format model*.msgpack file / checkpoint directory, resuming
    # model+EMA+opt+step like the reference (train_util.py:124-165)
    resume_own = args.resume_checkpoint and (
        args.resume_checkpoint.endswith(".msgpack")
        or os.path.isdir(args.resume_checkpoint))
    if args.resume_checkpoint and not resume_own:
        sd = load_torch_state_dict(args.resume_checkpoint)
        if sr_mode:
            # super_res_train.py:38-49: a base 3-channel model seeds the
            # 6-channel SR net with zero-padded input conv; a 6-channel
            # output head is split down to 3 when not learn_sigma
            import torch
            w = sd.get("input_blocks.0.0.weight")
            if w is not None and w.shape[1] == 3:
                sd["input_blocks.0.0.weight"] = torch.cat(
                    [w, torch.zeros_like(w)], dim=1)
                logger.log("input shape change: "
                           f"{tuple(sd['input_blocks.0.0.weight'].shape)}")
            if not cfg.learn_sigma and sd["out.2.weight"].shape[0] == 6:
                sd["out.2.weight"] = sd["out.2.weight"][:3]
                sd["out.2.bias"] = sd["out.2.bias"][:3]
            inner = convert_unet(sd, model.unet)
            params = {"params": {"unet": inner["params"]}}
        else:
            params = convert_unet(sd, model)
    else:
        x1 = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        a = [x1, jnp.zeros((1,))]
        if sr_mode:
            a.append(jnp.zeros((1, args.sr_small_size, args.sr_small_size, 3)))
        if cfg.class_cond:
            a.append(jnp.zeros((1,), jnp.int32))
        params = model.init(jax.random.key(args.seed), *a)

    mesh = make_mesh()
    params = replicate(mesh, params)
    state = create_train_state(
        params, lr=args.lr, weight_decay=args.weight_decay,
        ema_rates=tuple(float(r) for r in str(args.ema_rate).split(",")),
        lr_anneal_steps=args.lr_anneal_steps)
    if resume_own:
        state = resume_train_state(state, args.resume_checkpoint,
                                   device_put_fn=lambda t: replicate(mesh, t))
    from ..samplers import ModelVarType
    # learn_sigma False -> FIXED_LARGE, the reference default
    # (script_util.py:415-453 create_gaussian_diffusion)
    var_type = (ModelVarType.LEARNED_RANGE if cfg.learn_sigma
                else ModelVarType.FIXED_LARGE)
    step_raw = make_train_step(model.apply, class_cond=cfg.class_cond,
                               var_type=var_type,
                               microbatches=max(1, args.batch_size //
                                                (args.microbatch or args.batch_size)),
                               data_sharder=data_sharder(mesh))
    step = jax.jit(step_raw)
    grad_fn = None
    tables_fn = None
    if args.ofa_mode == "random_section":
        tables_fn = ofa_tables_fn(cfg.noise_schedule, cfg.diffusion_steps)
    elif args.ofa_mode == "random_select":
        tables_fn = ofa_random_select_tables_fn(cfg.noise_schedule,
                                                cfg.diffusion_steps)
        # the sandwich accumulates grads over four schedules per update
        grad_fn = jax.jit(step_raw.grads_and_metrics)
    data_iter = _train_data_iter(
        args.data_dir, batch_size=args.batch_size,
        image_size=cfg.image_size, class_cond=cfg.class_cond,
        seed=args.seed, lq_dir=(args.lq_dir or None) if sr_mode else None,
        small_size=args.sr_small_size if sr_mode else None)
    if sr_mode and not args.lq_dir:
        data_iter = _derive_low_res(data_iter,
                                    cfg.image_size // args.sr_small_size)
    data = map(lambda b: shard_batch(mesh, b), data_iter)
    loop = TrainLoop(
        state=state, step_fn=step, grad_fn=grad_fn, data=data,
        schedule_sampler=create_named_schedule_sampler(
            args.schedule_sampler, cfg.diffusion_steps),
        tables=create_tables(cfg), tables_fn=tables_fn,
        batch_size=args.batch_size, lr_anneal_steps=args.lr_anneal_steps,
        log_interval=args.log_interval, save_interval=args.save_interval,
        save_dir=args.save_dir, seed=args.seed)
    with mesh:
        loop.run_loop(max_steps=args.max_steps or None)
    return 0


def cmd_evaluate(args) -> int:
    from ..fid import (FIDEvaluator, FIDStats, load_fid_inception_params,
                       make_inception_feature_fn)

    feature_fn = make_inception_feature_fn(
        load_fid_inception_params(args.inception_path))
    with np.load(args.sample_batch) as z:
        arr = z[z.files[0]]
    has_mu = False
    if args.ref_stats.endswith(".npz"):
        with np.load(args.ref_stats) as z:
            has_mu = "mu" in z.files
    if has_mu:
        ref = FIDStats.load(args.ref_stats)
    else:
        with np.load(args.ref_stats) as z:
            ref_arr = z[z.files[0]]
        ref = FIDEvaluator.stats_from_images(feature_fn, ref_arr,
                                             args.batch_size)
    ref_spatial = (FIDStats.load(args.ref_stats_spatial)
                   if args.ref_stats_spatial else None)
    ev = FIDEvaluator(feature_fn, ref, ref_stats_spatial=ref_spatial,
                      batch_size=args.batch_size)
    # precision/recall need the raw reference batch's features
    # (evaluator.py computes P&R between the two feature sets; moments
    # alone cannot express the manifold estimate)
    ref_features = None
    if args.ref_batch:
        with np.load(args.ref_batch) as z:
            ref_arr = z[z.files[0]]
        ref_features, _, _ = ev.compute_activations(ref_arr)
    metrics = ev.cal_metrics(arr, ref_features=ref_features)
    print(json.dumps(metrics))
    return 0


def cmd_ref_stats(args) -> int:
    from ..fid import (FIDEvaluator, FIDStats, load_fid_inception_params,
                       make_inception_feature_fn)

    feature_fn = make_inception_feature_fn(
        load_fid_inception_params(args.inception_path))
    with np.load(args.images) as z:
        arr = z[z.files[0]]
    ev = FIDEvaluator(feature_fn, None, batch_size=args.batch_size)  # type: ignore
    pool3, _, spatial = ev.compute_activations(arr, want_spatial=True)
    FIDStats.from_features(pool3).save(args.out)
    if spatial is not None and args.spatial_out:
        FIDStats.from_features(spatial).save(args.spatial_out)
        print(f"saved spatial (sFID) stats to {args.spatial_out}")
    print(f"saved reference stats for {arr.shape[0]} images to {args.out}")
    return 0


def cmd_selftest(args) -> int:
    """One-command FID certification for real pt_inception weights
    (fid/selftest.py; evaluator_v1.py:652-679's auto-download replaced by
    a user-supplied file in this zero-egress design). Exit 0 iff every
    consistency check passes; 'certified' additionally requires the
    genuine checkpoint digest."""
    from ..fid.selftest import run_selftest

    out = run_selftest(
        args.inception_path,
        ref_batch=args.ref_batch or None,
        ref_stats=args.ref_stats or None,
        expected_fid=None if args.expected_fid < 0 else args.expected_fid,
        tol=args.tol, batch_size=args.batch_size,
        n_fixture=args.n_fixture, seed=args.seed)
    print(json.dumps(out))
    return 0 if out["passed"] else 1


def cmd_convert(args) -> int:
    from ..models.convert import load_torch_state_dict
    from ..utils.checkpoint import save_tree

    if args.preset == "sd":
        # one CompVis .ckpt -> directory of three towers, consumed by
        # every SD subcommand via --ckpt <dir>
        from ..models import AutoencoderKL, CLIPTextConfig, SDUNetModel
        from ..models.sd_convert import (save_sd_params_dir,
                                         split_sd_checkpoint)
        sd = load_torch_state_dict(args.torch_path)
        u, v, c = split_sd_checkpoint(sd, unet=SDUNetModel(),
                                      vae=AutoencoderKL(),
                                      clip_config=CLIPTextConfig())
        save_sd_params_dir(args.out, u, v, c)
        print(f"converted {args.torch_path} -> {args.out}/"
              f"{{sd_unet,sd_vae,sd_clip}}.msgpack")
        return 0

    from ..models import ModelConfig, create_model
    from ..models.convert import convert_unet

    cfg = ModelConfig.adm64() if args.preset == "adm64" else ModelConfig()
    model = create_model(cfg)
    params = convert_unet(load_torch_state_dict(args.torch_path), model)
    save_tree(args.out, params)
    print(f"converted {args.torch_path} -> {args.out}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="adt")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("search", help="evolutionary ADM search")
    add_dict_to_argparser(p, _search_defaults())
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser("sample", help="sample with a searched schedule")
    add_dict_to_argparser(p, dict(
        model_path="", classifier_path="", classifier_scale=1.0,
        use_timestep="", skip_layers="", use_ddim=True, num_samples=100,
        batch_size=100, seed=0, out="", class_cond=True, image_size=64,
        num_channels=192, num_res_blocks=3, num_head_channels=64,
        attention_resolutions="32,16,8", learn_sigma=True,
        noise_schedule="cosine", use_scale_shift_norm=True,
        resblock_updown=True, use_new_attention_order=True, use_bf16=True,
        channel_mult="", timestep_respacing="", save_png_dir=""))
    p.set_defaults(fn=cmd_sample)

    p = sub.add_parser("sr-sample", help="super-resolution sampling")
    add_dict_to_argparser(p, dict(
        model_path="", base_samples="", large_size=256, small_size=64,
        num_channels=192, num_res_blocks=2, channel_mult="", learn_sigma=True,
        noise_schedule="linear", class_cond=True, use_ddim=True,
        num_samples=16, batch_size=16, seed=0, out="", use_bf16=True))
    p.set_defaults(fn=cmd_sr_sample)

    p = sub.add_parser("search-sd", help="Stable Diffusion latent search")
    add_dict_to_argparser(p, dict(
        ckpt="", clip_vocab="", clip_merges="", captions="", inception_path="",
        ref_stats="", save_dir="", sampler="plms", scale=7.5, H=512, W=512,
        time_step=4, num_samples=1000, batch_size=6, num_prompts=2000,
        max_epochs=10, select_num=10, population_num=50, m_prob=0.25,
        crossover_num=15, mutation_num=25, use_ddim_init_x=True, seed=0,
        candidate_chunk=2, use_bf16=True, resume=False))
    p.set_defaults(fn=cmd_search_sd)

    p = sub.add_parser("txt2img", help="text-to-image sampling (SD)")
    add_dict_to_argparser(p, dict(
        ckpt="", clip_vocab="", clip_merges="", prompt="", from_file="",
        sampler="plms", scale=7.5, H=512, W=512, steps=50, timesteps="",
        prompt_mask="", n_samples=4, seed=42, out="", save_png_dir="",
        use_bf16=True))
    p.set_defaults(fn=cmd_txt2img)

    p = sub.add_parser("img2img", help="image-to-image (SD)")
    add_dict_to_argparser(p, dict(
        ckpt="", clip_vocab="", clip_merges="", prompt="", init_img="",
        strength=0.75, scale=7.5, H=512, W=512, steps=50, timesteps="",
        n_samples=2, seed=42, out="", save_png_dir="", use_bf16=True))
    p.set_defaults(fn=cmd_img2img)

    p = sub.add_parser("ldm-sample",
                       help="unconditional latent-diffusion sampling")
    add_dict_to_argparser(p, dict(
        ckpt="", latent_size=64, latent_channels=3, first_stage="vq",
        fs_ch=128, fs_ch_mult="1,2,4", fs_num_res_blocks=2, fs_attn_ds="",
        n_embed=8192, embed_dim=3,
        num_channels=224, num_res_blocks=2, channel_mult="1,2,3,4",
        attention_ds="8,4,2", num_head_channels=32,
        num_classes=0, class_label=-1, context_dim=512,
        linear_start=0.0015, linear_end=0.0195, steps=50, timesteps="",
        eta=1.0, scale_factor=1.0, n_samples=4, seed=0, out="",
        save_png_dir="", use_bf16=True))
    p.set_defaults(fn=cmd_ldm_sample)

    p = sub.add_parser("inpaint",
                       help="latent inpainting over image+mask pairs")
    add_dict_to_argparser(p, dict(
        ckpt="", indir="", image="", mask="", outdir="inpaint_out",
        latent_channels=3, first_stage="vq", fs_ch=128, fs_ch_mult="1,2,4",
        fs_num_res_blocks=2, fs_attn_ds="", n_embed=8192, embed_dim=3,
        num_channels=256, num_res_blocks=2, channel_mult="1,2,3,4",
        attention_ds="8,4,2", num_head_channels=32,
        linear_start=0.0015, linear_end=0.0205, steps=50, seed=0,
        use_bf16=True))
    p.set_defaults(fn=cmd_inpaint)

    p = sub.add_parser("train", help="train/fine-tune a diffusion UNet")
    add_dict_to_argparser(p, dict(
        data_dir="", save_dir="", resume_checkpoint="", lr=1e-4,
        weight_decay=0.0, lr_anneal_steps=0, batch_size=16, microbatch=0,
        ema_rate="0.9999", log_interval=10, save_interval=10000,
        schedule_sampler="uniform", ofa_mode="", max_steps=0, seed=0,
        image_size=64, num_channels=192, num_res_blocks=3,
        num_head_channels=64, attention_resolutions="32,16,8",
        class_cond=True, learn_sigma=True, noise_schedule="cosine",
        dropout=0.1, resblock_updown=True, use_scale_shift_norm=True,
        use_new_attention_order=True, use_bf16=True, channel_mult="",
        # SR-pair mode (scripts/super_res_train.py): train SuperResModel at
        # image_size on (low, high) pairs; low_res from --lq_dir partner
        # files or derived by area downsampling when --lq_dir is empty
        sr_small_size=0, lq_dir=""))
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("train-classifier",
                       help="train the noisy guidance classifier")
    add_dict_to_argparser(p, dict(
        data_dir="", save_dir="", resume_checkpoint="", noised=True,
        iterations=150000, lr=3e-4, weight_decay=0.05, anneal_lr=False,
        batch_size=4, log_interval=10, save_interval=10000, seed=0,
        num_classes=1000, noise_schedule="cosine", diffusion_steps=1000,
        image_size=64, classifier_width=128, classifier_depth=2,
        classifier_attention_resolutions="32,16,8",
        classifier_use_scale_shift_norm=True, classifier_resblock_updown=True,
        classifier_pool="attention", classifier_use_bf16=True))
    p.set_defaults(fn=cmd_train_classifier)

    p = sub.add_parser("nll", help="bits/dim over a dataset")
    add_dict_to_argparser(p, dict(
        model_path="", data_dir="", num_samples=100, batch_size=10,
        image_size=64, num_channels=192, num_res_blocks=3, learn_sigma=True,
        noise_schedule="cosine", class_cond=True))
    p.set_defaults(fn=cmd_nll)

    p = sub.add_parser("evaluate", help="FID/IS of sample npz vs reference")
    add_dict_to_argparser(p, dict(sample_batch="", ref_stats="",
                                  ref_stats_spatial="", ref_batch="",
                                  inception_path="", batch_size=100))
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("ref-stats", help="precompute FID reference stats")
    add_dict_to_argparser(p, dict(images="", out="ref_stats.npz",
                                  spatial_out="", inception_path="",
                                  batch_size=100))
    p.set_defaults(fn=cmd_ref_stats)

    p = sub.add_parser("convert", help="torch checkpoint -> msgpack")
    add_dict_to_argparser(p, dict(torch_path="", out="", preset="adm64"))
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser(
        "selftest",
        help="certify the FID pipeline against real pt_inception weights")
    add_dict_to_argparser(p, dict(inception_path="", ref_batch="",
                                  ref_stats="", expected_fid=-1.0, tol=0.5,
                                  batch_size=32, n_fixture=32, seed=0))
    p.set_defaults(fn=cmd_selftest)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
