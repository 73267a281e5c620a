"""Device-mesh construction for multi-chip scaling.

The reference scales by pinning services to GPU ids (pipeline.py:20,41;
output_stream.py:181-182) and NCCL is never used. The TPU-native answer
is a `jax.sharding.Mesh` over ICI with named axes:

- "data"    — batch data parallelism (the micro-batch dim of
              upscale_multi, or the training batch),
- "spatial" — width sharding of frames; XLA's SPMD partitioner inserts
              halo exchanges for the convs automatically.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "batch_sharding", "spatial_sharding", "P"]


def make_mesh(
    n_devices: int | None = None,
    *,
    data: int | None = None,
    spatial: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "spatial") mesh.  With only `n_devices` given, all
    of them go on the data axis."""
    if devices is None:
        avail = jax.devices()
        want = n_devices or len(avail)
        if len(avail) < want:
            raise ValueError(
                f"make_mesh needs {want} devices but this host exposes only "
                f"{len(avail)} ({avail[0].platform}). Provision virtual CPU "
                "devices first: JAX_PLATFORMS=cpu XLA_FLAGS="
                f"--xla_force_host_platform_device_count={want} (what "
                "tests/conftest.py and __graft_entry__.dryrun_multichip do)."
            )
        devices = avail[:want]
    n = len(devices)
    if data is None:
        if n % spatial != 0:
            raise ValueError(
                f"{n} devices do not split evenly over spatial={spatial}; "
                "pass data= explicitly or pick a spatial axis dividing the "
                "device count."
            )
        data = n // spatial
    if data * spatial != n:
        raise ValueError(
            f"mesh shape data={data} x spatial={spatial} != {n} devices"
        )
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC frames: batch over 'data', W over 'spatial' (no-op when the
    spatial axis has size 1)."""
    return NamedSharding(mesh, P("data", None, "spatial", None))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC frames: W sharded over BOTH axes — single-frame latency
    scaling when there is no batch to split."""
    return NamedSharding(mesh, P(None, None, ("data", "spatial"), None))


def pad_batch(n: int, mesh: Mesh) -> int:
    """Smallest batch >= n divisible by the data axis (pad-and-mask tail
    micro-batches to keep shapes static, SURVEY §7 hard parts)."""
    d = mesh.shape["data"]
    return math.ceil(n / d) * d
