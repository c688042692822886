"""Multi-host process-group initialization and DCN-aware meshes.

For pod-slice runs (BASELINE.json configs[3]: N>=2 hosts): each host
process calls ``initialize_multihost()`` (a thin wrapper over
``jax.distributed.initialize``), then builds a mesh whose "data" axis
spans hosts (collectives ride DCN across pods, ICI within a slice —
jax orders mesh axes so the innermost axis maps to ICI neighbors).

Single-host runs skip initialization and work unchanged; CI exercises
the same shard_map code on a virtual CPU mesh (tests/conftest.py).
"""

from __future__ import annotations

import jax

from .mesh import make_mesh, mesh_shape_for


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the jax distributed runtime; returns True if multi-host.

    With no arguments, relies on the environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS etc.).  Safe to call on a single host: any
    initialization failure degrades to single-process mode.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return jax.process_count() > 1
    except Exception:
        return False


def make_pod_mesh(seq_parallel: int | None = None) -> jax.sharding.Mesh:
    """Mesh over every device in the pod slice (all processes)."""
    n = len(jax.devices())
    return make_mesh(mesh_shape_for(n, seq_parallel))


def host_local_batch(global_batch: int) -> int:
    """Per-host read-batch size for an evenly sharded global batch."""
    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(f"global batch {global_batch} not divisible by {pc} hosts")
    return global_batch // pc
