"""Device mesh + sharding rules: the TPU-native replacement for
torch.distributed (guided_diffusion/dist_util.py:21-89).

The reference's distributed story is NCCL/gloo process groups with explicit
all_gather / broadcast / barrier calls. On TPU, parallelism is expressed as
data layout: a 2-D ('data', 'model') Mesh, NamedShardings on arrays, and
jit — XLA inserts the collectives over ICI. Parameter "broadcast from rank
0" (dist_util.py:83-89) becomes replicate(); the sample-gathering
all_gather (search_...py:356-361) disappears entirely because a jitted
computation over a data-sharded batch already produces globally-addressable
results.

Covered strategies (parity + extensions; SURVEY.md section 2.3):
  * data parallel:  batch axis sharded over 'data'
  * tensor parallel: large kernels sharded over 'model' on their output
    (and attention-head) axes — optional, for >HBM models
  * fsdp-style param sharding: shard_params over 'data'
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicate", "shard_batch",
           "param_shardings", "data_sharder", "global_replicate"]


def make_mesh(model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model') mesh over all (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch-axis sharding for an ndim-rank array."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh (param 'broadcast')."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def global_replicate(mesh: Mesh, tree):
    """replicate() that also works when the mesh spans PROCESSES.

    jax.device_put rejects shardings with non-addressable devices, so on a
    multi-process mesh each process contributes its identical host copy via
    multihost_utils (the inputs must be the same on every process — true
    for the fitness path's coefficient tables, params and folded rng keys).
    Typed PRNG keys are unwrapped to their uint32 data and re-wrapped,
    since the multihost helpers only accept plain ndarrays. This is the
    standard ``place_fn`` for running BatchedFIDFitness across processes."""
    if jax.process_count() == 1:
        return replicate(mesh, tree)
    from jax.experimental import multihost_utils

    def put(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            g = multihost_utils.host_local_array_to_global_array(
                data, mesh, P())
            return jax.random.wrap_key_data(g, impl=jax.random.key_impl(x))
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P())

    return jax.tree_util.tree_map(put, tree)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with the leading axis split over 'data'
    (scalar leaves replicate — a rank-0 array has no batch axis)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P()) if np.ndim(x) == 0
            else data_sharding(mesh, np.ndim(x))), batch)


def data_sharder(mesh: Mesh):
    """Returns fn(x) applying a batch-axis sharding constraint inside jit."""
    def fn(x):
        return jax.lax.with_sharding_constraint(
            x, data_sharding(mesh, x.ndim))
    return fn


def param_shardings(mesh: Mesh, params, *, min_weight_size: int = 2 ** 16):
    """Tensor-parallel sharding rules for a flax param tree.

    Kernels whose last (output-feature) axis divides the 'model' axis size
    and that exceed ``min_weight_size`` get P(..., 'model'); everything else
    is replicated. With GSPMD this turns the UNet's big convs/denses into
    Megatron-style column-parallel layers; XLA inserts the reduce-scatters.
    """
    msize = mesh.shape["model"]

    def rule(x):
        if (msize > 1 and x.ndim >= 2 and x.size >= min_weight_size
                and x.shape[-1] % msize == 0):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)
