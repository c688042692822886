"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic (shard_map + collectives) is exercised in CI on
one machine via XLA's host-platform device-count override, per SURVEY.md §4.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A sitecustomize module may have pre-imported jax and pinned the platform
# list to a hardware backend (e.g. the axon TPU tunnel) before this file
# runs; override at the config level too so tests always run on the
# virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
