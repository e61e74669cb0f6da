"""Device mesh construction and sharding helpers.

The reference has no distribution at all (SURVEY.md §2.4: serial item loop,
no collectives).  The TPU design scales along two axes:

  * ``data``  — videos.  Each device (group) owns whole videos: frame caches,
    search states, and detector batches shard on their leading video axis.
    Collectives: none in steady state (embarrassingly parallel), which is why
    this axis maps to DCN across slices.
  * ``model`` — tensor parallelism inside the detector/VLM (attention heads /
    MLP intermediate sharded; psum/all-gathers ride ICI).

Pipeline/expert parallelism are deliberately absent: the models are small
ViTs/VLMs with no MoE (SURVEY.md §2.4), and the video-frame axis — this
framework's "sequence" — shards as the detector batch axis instead of inside
attention (SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, *trailing_axes: Optional[str]) -> NamedSharding:
    """Leading axis over data; optional trailing named axes."""
    return NamedSharding(mesh, P(DATA_AXIS, *trailing_axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
