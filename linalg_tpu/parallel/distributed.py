"""Multi-host (multi-process) initialization for TPU pods.

Single-host JAX sees one chip set; a v5e-256 or v4 pod runs one process
per host, each owning its local chips, glued together by
``jax.distributed.initialize`` — after which ``jax.devices()`` is GLOBAL
and every ``Mesh`` built from it spans the pod, with GSPMD routing
collectives over ICI exactly as on one host.  Nothing else in this
framework changes: the dp/tp/pp/ep/sp shardings and train steps are
already written against global meshes.

The reference has no distribution at all (SURVEY §2.5); this module is
the TPU-native multi-host entry.  On Cloud TPU the coordinator address,
process count and process id come from the metadata server automatically;
explicit args cover GKE/manual topologies.  Process-local batch loading
uses ``process_index``/``process_count`` so each host feeds only its
shard (``host_local_batch_slice``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

__all__ = [
    "init_distributed",
    "is_distributed",
    "host_local_batch_slice",
    "global_mesh_shape",
]

_INITIALIZED = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-process JAX; no-op (returns False) single-process.

    Call once, before any other jax API touches the backend.  With no
    arguments, Cloud TPU pods auto-discover the topology; pass explicit
    values for manual clusters (or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID).  Returns True when running
    distributed (process_count > 1 after init).
    """
    global _INITIALIZED
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    explicit = coordinator_address is not None
    # Detect a possible TPU pod WITHOUT touching the backend:
    # jax.default_backend() initializes XLA, after which
    # jax.distributed.initialize raises RuntimeError — and swallowing that
    # would silently demote every pod run to single-process. Environment
    # markers (set by the Cloud TPU runtime / libtpu) are backend-free.
    # TPU_WORKER_HOSTNAMES is set even on single-host VMs (e.g.
    # "localhost"), so a pod means MORE THAN ONE worker hostname.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_worker = len([h for h in hostnames.split(",") if h.strip()]) > 1
    on_tpu_pod = multi_worker or bool(
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not explicit and not on_tpu_pod:
        return False  # plain single-process run (CPU tests, one chip)
    if not _INITIALIZED:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            _INITIALIZED = True
        except RuntimeError:
            # late initialization (backend already up) is a caller bug on a
            # real pod — surface it rather than silently running local
            raise
        except Exception:
            # single-process TPU VM (pod-like env but no pod metadata):
            # stay local
            return False
    return jax.process_count() > 1


def is_distributed() -> bool:
    return jax.process_count() > 1


def host_local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this process's slice of a globally-sharded batch.

    The device-resident train steps sample windows ON device from a
    replicated corpus, so they need no host sharding; this is for
    host-fed data paths (e.g. streaming a corpus too large to replicate),
    where each process uploads only its dp shard.
    """
    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} must divide by process count {n}"
    )
    size = global_batch // n
    return jax.process_index() * size, size


def global_mesh_shape(n_heads: int) -> Tuple[int, int]:
    """Default (dp, tp) over ALL devices in the (possibly multi-host) job:
    tp = the largest divisor of the global device count, n_heads, AND the
    local device count (so contiguous tp groups in the row-major mesh never
    straddle a host boundary and tensor-parallel collectives stay on
    intra-host ICI); dp takes the rest (DCN-friendly)."""
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    tp = 1
    for cand in range(1, min(n_local, n_global) + 1):
        if n_global % cand == 0 and n_heads % cand == 0 and n_local % cand == 0:
            tp = cand
    return n_global // tp, tp
