"""Multi-host launch helpers (ICI + DCN).

The reference is strictly single-host (SURVEY.md §2.2 — its only transport
is UHD + pthread shared memory).  The TPU framework scales across hosts by
initializing the JAX distributed runtime and building the ``(time,
channel)`` mesh over the global device set; halo/state exchange then rides
ICI within a slice and DCN across slices automatically through the mesh
axes (the BASELINE.json >=80% 1->N-host scaling target).

Typical pod-slice launch (same program on every host):

    from liquid_usrp_tpu.parallel import distributed, mesh, stream
    distributed.init()                       # env-driven coordinator
    m = mesh.make_sdr_mesh()                 # all global devices
    run = stream.make_sharded_mcrx_a2a(m, num_channels, sync, blocks)

For single-process simulation of a multi-host topology use
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` (what the test
suite and the driver's dryrun do).
"""
from __future__ import annotations

import os

import jax

__all__ = ["init", "is_distributed", "local_info"]

_initialized = False


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> None:
    """Initialize jax.distributed (idempotent; env-driven when args absent).

    On TPU pods the arguments are discovered from the environment; on CPU
    fleets pass them explicitly or via ``JAX_COORDINATOR_ADDRESS``/
    ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``.
    """
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    ran = False
    if kwargs.get("num_processes", 1) > 1 or "coordinator_address" in kwargs:
        jax.distributed.initialize(**kwargs)
        ran = True
    elif not kwargs and jax.default_backend() == "tpu":
        # TPU pod auto-discovery: initialize() self-discovers the
        # coordinator from TPU metadata.  Without this call a pod-slice
        # launch silently runs as independent single-host processes.
        # (Skipped off-TPU, where argless initialize() would fail on a
        # plain single host — the common CPU/test environment.)
        try:
            jax.distributed.initialize()
            ran = True
        except Exception:  # noqa: BLE001 — single-host TPU (e.g. v5e-1)
            ran = False
    # only latch when a process group actually formed (or was properly
    # attempted with full args): otherwise a later explicit init() with
    # real coordinator args must still work
    if ran:
        _initialized = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def local_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
