"""Mesh construction and sharding helpers."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape; -1 axes absorb the remaining devices."""

    data: int = 1
    fsdp: int = -1
    tp: int = 1

    def resolve(self, n_devices: int):
        sizes = {"data": self.data, "fsdp": self.fsdp, "tp": self.tp}
        free = [k for k, v in sizes.items() if v == -1]
        fixed = int(np.prod([v for v in sizes.values() if v != -1]))
        if len(free) > 1:
            raise ValueError("at most one mesh axis may be -1")
        if free:
            if n_devices % fixed != 0:
                raise ValueError(f"{n_devices} devices not divisible by {fixed}")
            sizes[free[0]] = n_devices // fixed
        if int(np.prod(list(sizes.values()))) != n_devices:
            raise ValueError(
                f"mesh {sizes} does not cover {n_devices} devices"
            )
        return sizes


def make_mesh(config: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build a (data, fsdp, tp) mesh.

    Axis order puts ``tp`` innermost so tensor-parallel collectives ride the
    fastest ICI links, ``data`` outermost so pure-DP reductions can cross
    DCN when multi-slice.
    """
    if devices is None:
        devices = jax.devices()
    sizes = config.resolve(len(devices))
    arr = np.array(devices).reshape(sizes["data"], sizes["fsdp"], sizes["tp"])
    return Mesh(arr, axis_names=("data", "fsdp", "tp"))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Batches shard over (data, fsdp) jointly — fsdp acts as extra DP for
    activations, exactly like ZeRO-3's data-parallel view.

    ``batch_axis`` selects which array axis is the batch (e.g. 1 when a
    leading gradient-accumulation axis is present).
    """
    spec = [None] * batch_axis + [("data", "fsdp")]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, shardings_tree, mesh: Mesh):
    """Device-put a param pytree according to a PartitionSpec tree."""
    return jax.tree.map(
        lambda p, spec: jax.device_put(p, NamedSharding(mesh, spec)),
        params,
        shardings_tree,
    )
