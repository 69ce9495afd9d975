"""REAL multi-process jax.distributed run (2 CPU processes on localhost).

The reference tests multi-node only by running it (SURVEY §4); here a
2-process coordinator-based jax.distributed group exercises the actual
cross-host paths — world_size, barrier, all_gather_host, and the
loss-aware sampler's cross-process gather — not a simulation.
Reference: guided_diffusion/dist_util.py:21-43, resample.py:71-104.

The three product-path checks (GSPMD train step, ADM fitness chunk, SD
latent fitness chunk) run as PHASES of one combined worker pair: each
jax.distributed bootstrap costs ~30 s of import+init per process on this
single-core host, so one spawn for three independent assertions keeps the
suite inside its wall-clock budget with identical coverage.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow


def _worker_env():
    """Worker subprocess env: drop the 8-virtual-device XLA_FLAGS and put
    the repo root on PYTHONPATH — `python /tmp/.../worker.py` prepends the
    SCRIPT's directory to sys.path, not our cwd, so without this the
    workers only import autodiffusion_tpu when it happens to be
    pip-installed in the interpreter."""
    import autodiffusion_tpu
    repo_root = os.path.dirname(os.path.dirname(
        os.path.abspath(autodiffusion_tpu.__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = repo_root + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    return env


def _spawn_pair(script_path, timeout):
    """Run the 2-process coordinator group to completion; returns both
    ranks' combined stdout/stderr."""
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()
    env = _worker_env()
    procs = [subprocess.Popen(
        [sys.executable, str(script_path), str(i), addr],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
    return outs


def _parse(outs, marker):
    vals = []
    for out in outs:
        for line in out.splitlines():
            if marker in line:
                vals.append(float(line.split("=")[1]))
    return vals


BOOTSTRAP = textwrap.dedent("""
    import os, sys
    import numpy as np
    os.environ.pop("XLA_FLAGS", None)      # no virtual-device override here
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address=sys.argv[2],
                               num_processes=2, process_id=pid,
                               local_device_ids=[0])
""")


WORKER = BOOTSTRAP + textwrap.dedent("""
    from autodiffusion_tpu.parallel.dist import (all_gather_host, barrier,
                                                 rank, world_size)
    assert world_size() == 2, world_size()
    assert rank() == pid, (rank(), pid)
    barrier("start")

    # cross-process host gather: each rank contributes distinct data
    got = all_gather_host(np.array([pid * 10 + 1, pid * 10 + 2]))
    got = np.asarray(got).reshape(-1)
    assert sorted(got.tolist()) == [1, 2, 11, 12], got

    # loss-aware sampler sees BOTH ranks' (t, loss) pairs
    from autodiffusion_tpu.train import LossSecondMomentResampler
    s = LossSecondMomentResampler(10, history_per_term=2)
    s.update_with_local_losses(np.array([pid, pid + 5]),
                               np.array([1.0 + pid, 2.0 + pid]))
    for t in (0, 1, 5, 6):
        assert s._loss_counts[t] == 1, (t, s._loss_counts)
    barrier("end")
    print(f"RANK{pid}_OK")
""")


class TestTwoProcessDistributed:
    def test_allgather_and_sampler_across_processes(self, tmp_path):
        script = tmp_path / "worker.py"
        script.write_text(WORKER)
        outs = _spawn_pair(script, 300)
        assert "RANK0_OK" in outs[0] and "RANK1_OK" in outs[1]


TRAIN_PHASE = textwrap.dedent("""
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from autodiffusion_tpu.models import UNetModel
    from autodiffusion_tpu.parallel import data_sharder, make_mesh
    from autodiffusion_tpu.parallel.dist import all_gather_host, barrier
    from autodiffusion_tpu.schedules import build_tables
    from autodiffusion_tpu.train import create_train_state, make_train_step

    mesh = make_mesh()        # ('data','model') over the 2-process devices
    m = UNetModel(model_channels=16, out_channels=6, num_res_blocks=1,
                  attention_ds=(2,), channel_mult=(1,), num_head_channels=16)
    params = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)),
                    jnp.zeros((1,)))
    state = create_train_state(params, lr=1e-3)
    step = jax.jit(make_train_step(m.apply, data_sharder=data_sharder(mesh)))
    tables = build_tables(list(range(0, 1000, 100)), base_schedule="cosine")

    # global batch of 4: rank p owns samples [2p, 2p+1] of a COMMON stream
    full_x = np.stack([np.random.RandomState(i).randn(8, 8, 3)
                       for i in range(4)]).astype(np.float32)
    full_t = np.array([1, 3, 5, 7], np.int32)
    local = {"x": full_x[2 * pid:2 * pid + 2]}
    with mesh:
        gx = multihost_utils.host_local_array_to_global_array(
            local["x"], mesh, P("data"))
        gt = multihost_utils.host_local_array_to_global_array(
            full_t[2 * pid:2 * pid + 2], mesh, P("data"))
        gw = multihost_utils.host_local_array_to_global_array(
            np.ones((2,), np.float32), mesh, P("data"))
    state, metrics = step(state, tables, {"x": gx}, gt, gw,
                          jax.random.key(7))
    loss = float(metrics["loss"])

    # every rank must see the same psum-reduced loss and identical params
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    checksum = float(jnp.sum(jnp.abs(leaf)))
    gathered = np.asarray(all_gather_host(np.array([loss, checksum])))
    gathered = gathered.reshape(2, 2)
    assert np.allclose(gathered[0], gathered[1], rtol=1e-6), gathered
    assert np.isfinite(loss), loss
    print(f"RANK{pid}_LOSS={loss:.8f}")
    barrier("train_end")
""")


FITNESS_PHASE = textwrap.dedent("""
    import random as pyrandom

    from autodiffusion_tpu.fid import FIDStats
    from autodiffusion_tpu.parallel import global_replicate
    from autodiffusion_tpu.search import TimestepSpace, make_adm_fitness

    mesh = make_mesh()        # data=2 over the two processes' devices
    m = UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                  attention_ds=(2,), channel_mult=(1, 2), num_head_channels=32)
    x1 = jnp.zeros((1, 8, 8, 3))
    params = m.init(jax.random.key(0), x1, jnp.zeros((1,)))

    def feature_fn(imgs):
        x = imgs.astype(jnp.float32).reshape(imgs.shape[0], -1)
        return {"pool3": x[:, :8]}

    ref = FIDStats.from_features(
        np.random.RandomState(2).randn(100, 8) * 40 + 127)
    # one fitness chunk GSPMD-sharded ACROSS the process boundary:
    # shard_fn splits the sample batch over 'data' (one process each),
    # place_fn globalizes every dispatch argument first
    fitness = make_adm_fitness(
        model=m, params=params, image_size=8, feature_fn=feature_fn,
        ref_stats=ref, num_samples=16, batch_size=16, num_classes=None,
        base_schedule="cosine", candidate_chunk=1, seed=3, feature_dim=8,
        shard_fn=data_sharder(mesh),
        place_fn=lambda tree: global_replicate(mesh, tree))
    cand = TimestepSpace(1000, 4, rng=pyrandom.Random(1)).random()
    with mesh:
        fid = fitness([cand])[0]
    print(f"RANK{pid}_FID={fid:.10f}")
    barrier("fitness_end")
""")


SD_SETUP = textwrap.dedent("""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autodiffusion_tpu.fid import FIDStats
    from autodiffusion_tpu.models import (AutoencoderKL, CLIPTextConfig,
                                          CLIPTextEncoder, SDUNetModel)
    from autodiffusion_tpu.search.sd_pipelines import make_sd_fitness

    def build_sd_fitness(**mesh_kwargs):
        # the tiny latent stack: crossattn UNet + KL VAE + CLIP text tower
        unet = SDUNetModel(in_channels=4, model_channels=32, out_channels=4,
                           num_res_blocks=1, attention_ds=(1,),
                           channel_mult=(1, 2), num_heads=2, context_dim=16)
        z1 = jnp.zeros((1, 8, 8, 4))
        uparams = unet.init(jax.random.key(3), z1, jnp.zeros((1,)),
                            jnp.zeros((1, 5, 16)))
        vae = AutoencoderKL(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                            z_channels=4, embed_dim=4)
        vparams = vae.init(jax.random.key(4), jnp.zeros((1, 16, 16, 3)))
        clip = CLIPTextEncoder(CLIPTextConfig(vocab_size=64, width=16,
                                              layers=1, heads=2,
                                              max_length=5))
        cparams = clip.init(jax.random.key(5), jnp.zeros((1, 5), jnp.int32))
        toks = jnp.asarray(np.random.RandomState(6).randint(0, 64, (6, 5)),
                           jnp.int32)
        bank = clip.apply(cparams, toks)
        uncond = clip.apply(cparams, jnp.zeros((1, 5), jnp.int32))[0]

        def feature_fn(imgs):
            f = imgs.astype(jnp.float32).reshape(imgs.shape[0], -1)
            return {"pool3": f[:, :8]}

        ref = FIDStats.from_features(
            np.random.RandomState(2).randn(100, 8) * 40 + 127)
        return make_sd_fitness(
            unet=unet, unet_params=uparams, vae=vae, vae_params=vparams,
            context_bank=bank, uncond_context=uncond,
            feature_fn=feature_fn, ref_stats=ref, num_samples=8,
            batch_size=8, sampler="plms", guidance_scale=7.5, latent_hw=8,
            latent_ch=4, candidate_chunk=1, seed=3, feature_dim=8,
            **mesh_kwargs)
""")


SD_PHASE = SD_SETUP + textwrap.dedent("""
    sd_fitness = build_sd_fitness(
        shard_fn=data_sharder(mesh),
        place_fn=lambda tree: global_replicate(mesh, tree))
    cand = TimestepSpace(1000, 4, rng=pyrandom.Random(1)).random()
    with mesh:
        fid = sd_fitness([cand])[0]
    print(f"RANK{pid}_SDFID={fid:.10f}")
    barrier("sd_fitness_end")
""")


COMBINED_WORKER = BOOTSTRAP + TRAIN_PHASE + FITNESS_PHASE + SD_PHASE


@pytest.fixture(scope="module")
def combined_outputs(tmp_path_factory):
    """One 2-process spawn covering all three product-path phases; each
    phase prints its own marker line, asserted by its own test below."""
    script = tmp_path_factory.mktemp("mp") / "combined_worker.py"
    script.write_text(COMBINED_WORKER)
    return _spawn_pair(script, 900)


class TestTwoProcessShardedFitness:
    def test_fitness_chunk_across_processes_matches_unsharded(
            self, combined_outputs):
        """The PRODUCT path (guided sampling -> features -> moments ->
        Frechet) GSPMD-sharded across a REAL 2-process mesh: both ranks
        compute the same FID, and it equals the unsharded single-process
        evaluation of the identical candidate — the rebuild's equivalent
        of the reference's rank-sharded sampling + all_gather
        (search_imagenet64_classifier_guidance.py:356-366)."""
        fids = _parse(combined_outputs, "_FID=")
        assert len(fids) == 2 and fids[0] == fids[1], fids

        # unsharded single-process reference of the identical candidate
        import random as pyrandom

        import jax
        import jax.numpy as jnp
        import numpy as np

        from autodiffusion_tpu.fid import FIDStats
        from autodiffusion_tpu.models import UNetModel
        from autodiffusion_tpu.search import TimestepSpace, make_adm_fitness

        m = UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                      attention_ds=(2,), channel_mult=(1, 2),
                      num_head_channels=32)
        params = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.zeros((1,)))

        def feature_fn(imgs):
            x = imgs.astype(jnp.float32).reshape(imgs.shape[0], -1)
            return {"pool3": x[:, :8]}

        ref = FIDStats.from_features(
            np.random.RandomState(2).randn(100, 8) * 40 + 127)
        fitness = make_adm_fitness(
            model=m, params=params, image_size=8, feature_fn=feature_fn,
            ref_stats=ref, num_samples=16, batch_size=16, num_classes=None,
            base_schedule="cosine", candidate_chunk=1, seed=3, feature_dim=8)
        cand = TimestepSpace(1000, 4, rng=pyrandom.Random(1)).random()
        plain = fitness([cand])[0]
        np.testing.assert_allclose(fids[0], plain, rtol=1e-4)


class TestTwoProcessShardedSDFitness:
    def test_sd_fitness_chunk_across_processes_matches_unsharded(
            self, combined_outputs):
        """The SD LATENT product path (CLIP context bank -> CFG PLMS ->
        VAE decode -> features -> Frechet) GSPMD-sharded across a REAL
        2-process mesh: both ranks compute the same FID and it equals the
        unsharded single-process evaluation — the latent-search
        counterpart of the ADM sharded-fitness test
        (sd/scripts/search_ea.py:504-566)."""
        fids = _parse(combined_outputs, "_SDFID=")
        assert len(fids) == 2 and fids[0] == fids[1], fids

        # unsharded single-process reference of the identical candidate
        import random as pyrandom

        import numpy as np

        ns = {}
        exec(SD_SETUP, ns)            # same tiny stack, no mesh args
        from autodiffusion_tpu.search import TimestepSpace
        fitness = ns["build_sd_fitness"]()
        cand = TimestepSpace(1000, 4, rng=pyrandom.Random(1)).random()
        plain = fitness([cand])[0]
        np.testing.assert_allclose(fids[0], plain, rtol=1e-4)


class TestTwoProcessDataParallelTrain:
    def test_train_step_matches_single_process(self, combined_outputs):
        """One GSPMD-sharded train step over a REAL 2-process mesh: both
        ranks converge to identical loss/params (implicit psum), and the
        loss equals the same step computed unsharded in this process
        (the DDP-equivalence guarantee, train_util.py:100-109)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        losses = _parse(combined_outputs, "_LOSS=")
        assert len(losses) == 2 and losses[0] == losses[1], losses

        # unsharded single-process reference on the identical global batch
        from autodiffusion_tpu.models import UNetModel
        from autodiffusion_tpu.schedules import build_tables
        from autodiffusion_tpu.train import create_train_state, make_train_step

        m = UNetModel(model_channels=16, out_channels=6, num_res_blocks=1,
                      attention_ds=(2,), channel_mult=(1,),
                      num_head_channels=16)
        params = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.zeros((1,)))
        state = create_train_state(params, lr=1e-3)
        step = jax.jit(make_train_step(m.apply))
        tables = build_tables(list(range(0, 1000, 100)),
                              base_schedule="cosine")
        full_x = np.stack([np.random.RandomState(i).randn(8, 8, 3)
                           for i in range(4)]).astype(np.float32)
        _, metrics = step(state, tables, {"x": jnp.asarray(full_x)},
                          jnp.asarray([1, 3, 5, 7]), jnp.ones((4,)),
                          jax.random.key(7))
        np.testing.assert_allclose(losses[0], float(metrics["loss"]),
                                   rtol=2e-5)
