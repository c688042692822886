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
    strict: bool | None = None,
    timeout_s: int = 300,
) -> bool:
    """Initialize the jax distributed runtime; returns True if multi-host.

    With no arguments, relies on the environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS etc.) and degrades to single-process mode
    with a logged warning if that auto-detection fails.  When any
    argument is given explicitly — i.e. the caller *asked* for a
    specific pod topology — a failure raises instead of silently
    shrinking the job to one process (strict defaults to True then;
    pass strict=False to opt back into best-effort).
    """
    explicit = any(
        x is not None for x in (coordinator_address, num_processes, process_id)
    )
    if strict is None:
        strict = explicit
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=timeout_s,
        )
        return jax.process_count() > 1
    except Exception as e:
        if strict:
            raise RuntimeError(
                "multi-host initialization failed for the requested topology "
                f"(coordinator={coordinator_address!r}, "
                f"num_processes={num_processes}, process_id={process_id}): {e}"
            ) from e
        from ..utils.logging import get_logger

        get_logger().warning(
            "jax.distributed.initialize failed (%s); continuing single-process",
            e,
        )
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
