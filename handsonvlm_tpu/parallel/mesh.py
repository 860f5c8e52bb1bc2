"""Device mesh and axis conventions.

The framework uses a 2-D logical mesh ``('data', 'model')``:

- ``data``  — batch/FSDP axis. Parameters and optimizer state are sharded
  along it (GSPMD equivalent of the reference's DeepSpeed ZeRO-3,
  scripts/zero3.json); XLA inserts the all-gather-on-use and
  reduce-scatter-of-grads collectives over ICI.
- ``model`` — tensor-parallel axis for attention heads / MLP columns
  (needed for 13B on small v5e slices; size 1 reproduces the reference's
  pure-DP 8xH100 recipe).

Replaces the reference's NCCL/DeepSpeed launcher (scripts/finetune.sh:6,60).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
MESH_AXES = (DATA_AXIS, MODEL_AXIS)


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    seq: int = 1,
) -> Mesh:
    """Create a ('data', 'model') mesh — or ('data', 'seq') when ``seq>1``
    (sequence-parallel ring attention; 'seq' and 'model' axes are mutually
    exclusive for now) — over the given (or all) devices.

    ``data=None`` uses every remaining device after the model/seq axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if seq > 1 and model > 1:
        raise ValueError("seq and model axes are mutually exclusive")
    minor = seq if seq > 1 else model
    if data is None:
        if n % minor != 0:
            raise ValueError(f"{n} devices not divisible by {minor}")
        data = n // minor
    if data * minor != n:
        raise ValueError(f"mesh {data}x{minor} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, minor)
    if seq > 1:
        return Mesh(dev_array, ("data", "seq"))
    return Mesh(dev_array, MESH_AXES)


def single_device_mesh() -> Mesh:
    return create_mesh(data=1, model=1, devices=jax.devices()[:1])


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
