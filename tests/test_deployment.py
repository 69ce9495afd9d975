"""Deployment paths: structural pruning, searched-artifact end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.models import UNetModel
from autodiffusion_tpu.samplers import ddim_sample_loop
from autodiffusion_tpu.schedules import build_tables
from autodiffusion_tpu.search import parse_joint_string
from autodiffusion_tpu.search.pipelines import keep_masks_for


pytestmark = pytest.mark.slow

def _tiny():
    m = UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                  attention_ds=(2,), channel_mult=(1, 2), num_head_channels=32)
    x = jnp.zeros((1, 16, 16, 3))
    params = m.init(jax.random.key(0), x, jnp.zeros((1,)))
    # randomize so residual branches are non-trivial
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(5), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    return m, params


class TestStructuralSkip:
    def test_deployment_sampling_with_published_artifact_format(self):
        """End-to-end: the published 10-step + skip-layers artifact format
        drives per-step masked sampling (sample_..._dynamic_subnet.sh)."""
        m, params = _tiny()
        art = ("{'timesteps': [744, 137, 647, 856, 305], "
               "'skip_layers': [[1], [], [3, 5], [], [2]]}")
        ts, skips = parse_joint_string(art)
        tables = build_tables(ts, base_schedule="cosine")
        masks = jnp.asarray(keep_masks_for(skips, m.layer_num))

        def model_fn(x, t, i):
            return m.apply(params, x, t, keep_mask=masks[i])

        out = ddim_sample_loop(model_fn, (2, 16, 16, 3), tables,
                               rng=jax.random.key(0))
        assert np.isfinite(np.asarray(out)).all()

    def test_structural_equals_masked_per_step(self):
        """The deployment-time structural_skip path (real compute savings)
        matches the search-time mask for a fixed architecture."""
        m, params = _tiny()
        skip = frozenset({1, 4})
        mask = jnp.ones(m.layer_num).at[jnp.array(sorted(skip))].set(0.0)
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
        t = jnp.array([100.0, 500.0])
        a = m.apply(params, x, t, keep_mask=mask)
        b = m.apply(params, x, t, structural_skip=skip)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_structural_skip_removes_compute(self):
        """structural_skip must DELETE the skipped blocks from the
        compiled program, not multiply them by zero (XLA keeps float x*0
        branches): the compiled FLOP count must drop."""
        m, params = _tiny()
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
        t = jnp.array([100.0, 500.0])

        def flops(**kw):
            c = jax.jit(lambda p, xx, tt: m.apply(p, xx, tt, **kw)).lower(
                params, x, t).compile()
            return c.cost_analysis().get("flops", 0.0)

        full = flops()
        pruned = flops(structural_skip=frozenset(range(m.layer_num)))
        assert pruned < 0.7 * full, (pruned, full)

    def test_per_sample_masks_match_per_batch(self):
        """[B, L] per-sample masks (search batch-folding) == applying each
        row's [L] mask separately."""
        m, params = _tiny()
        x = jax.random.normal(jax.random.key(2), (2, 16, 16, 3))
        t = jnp.array([100.0, 500.0])
        m0 = jnp.ones(m.layer_num).at[1].set(0.0)
        m1 = jnp.ones(m.layer_num).at[4].set(0.0)
        batched = m.apply(params, x, t, keep_mask=jnp.stack([m0, m1]))
        sep0 = m.apply(params, x[:1], t[:1], keep_mask=m0)
        sep1 = m.apply(params, x[1:], t[1:], keep_mask=m1)
        np.testing.assert_allclose(np.asarray(batched),
                                   np.concatenate([sep0, sep1]), atol=1e-5)


class TestConvertRoundtrip:
    def test_torch_to_msgpack_to_params(self, reference_gd, tmp_path):
        """adt convert path: torch .pt -> flax msgpack -> reload -> same
        outputs as direct conversion."""
        import torch
        from guided_diffusion.unet import UNetModel as TorchUNet
        from autodiffusion_tpu.models.convert import (convert_unet,
                                                      load_torch_state_dict)
        from autodiffusion_tpu.utils.checkpoint import load_tree, save_tree

        torch.manual_seed(4)
        tm = TorchUNet(image_size=16, in_channels=3, model_channels=32,
                       out_channels=3, num_res_blocks=1,
                       attention_resolutions=(2,), dropout=0.0,
                       channel_mult=(1, 2), num_classes=None,
                       use_checkpoint=False, use_fp16=False, num_heads=1,
                       num_head_channels=32, num_heads_upsample=-1,
                       use_scale_shift_norm=True, resblock_updown=True,
                       use_new_attention_order=True)
        pt = str(tmp_path / "model.pt")
        torch.save(tm.state_dict(), pt)

        fm = UNetModel(model_channels=32, out_channels=3, num_res_blocks=1,
                       attention_ds=(2,), channel_mult=(1, 2),
                       num_head_channels=32)
        params = convert_unet(load_torch_state_dict(pt), fm)
        mp = str(tmp_path / "model000001.msgpack")
        save_tree(mp, params)
        reloaded = load_tree(mp, jax.tree_util.tree_map(np.zeros_like,
                                                        jax.device_get(params)))
        x = jax.random.normal(jax.random.key(0), (1, 16, 16, 3))
        t = jnp.array([42.0])
        a = fm.apply(params, x, t)
        b = fm.apply(jax.tree_util.tree_map(jnp.asarray, reloaded), x, t)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
