"""Multi-host initialization and host-level collectives.

The TPU-native replacement for guided_diffusion/dist_util.py:21-98: no
rendezvous/port management (jax.distributed reads the TPU environment), no
NCCL-vs-gloo switch, no GPUS_PER_NODE device mapping. Param "broadcast from
rank 0" is parallel.mesh.replicate; the sample-gathering all_gather is
multihost_utils.process_allgather for host data.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

__all__ = ["setup_dist", "rank", "world_size", "barrier", "all_gather_host"]

_INITIALIZED = False


def setup_dist(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. Single-process (the search drivers'
    default, search_imagenet64_classifier_guidance.py:624-627) is a no-op."""
    global _INITIALIZED
    if _INITIALIZED:
        if coordinator_address is not None:
            # the earlier call was the single-process no-op (or a different
            # cluster): silently ignoring real coordinator args here would
            # leave every host training on duplicated data with
            # process_count() == 1 and no error
            raise RuntimeError(
                "setup_dist called with coordinator args after an earlier "
                "setup_dist already ran; jax.distributed.initialize can "
                "only run once and must come first")
        return
    # NB: do NOT touch jax.process_count() (or any other jax API) before
    # initialize — it initializes the XLA backend, after which
    # jax.distributed.initialize always raises ("must be called before
    # any JAX calls that might initialise the XLA backend")
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        _INITIALIZED = True


def rank() -> int:
    return jax.process_index()


def world_size() -> int:
    return jax.process_count()


def barrier(name: str = "barrier") -> None:
    """Cross-host sync (dist.barrier, :366)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def all_gather_host(x: Any) -> Any:
    """Gather host (numpy) data from all processes
    (dist.all_gather of samples, search_...py:356-361)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x)
