"""Mesh construction + distributed bootstrap tests (virtual 8-CPU mesh)."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pdec.parallel.distributed import initialize_distributed
from pdec.parallel.mesh import MeshConfig, batch_sharding, make_mesh, replicated


def test_mesh_resolution_free_axis():
    mesh = make_mesh(MeshConfig(data=2, fsdp=-1, tp=2))
    assert mesh.shape == {"data": 2, "fsdp": 2, "tp": 2}


def test_mesh_full_specification():
    mesh = make_mesh(MeshConfig(data=1, fsdp=8, tp=1))
    assert mesh.shape["fsdp"] == 8


def test_mesh_rejects_bad_shapes():
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=3, fsdp=-1, tp=1))  # 8 % 3 != 0
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=2, fsdp=2, tp=1))  # covers only 4 of 8
    with pytest.raises(ValueError):
        MeshConfig(data=-1, fsdp=-1, tp=1).resolve(8)  # two free axes


def test_batch_sharding_specs():
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tp=2))
    assert batch_sharding(mesh).spec == P(("data", "fsdp"))
    assert batch_sharding(mesh, batch_axis=1).spec == P(None, ("data", "fsdp"))
    assert replicated(mesh).spec == P()


def test_distributed_noop_single_process():
    info = initialize_distributed()
    assert info["process_count"] == 1
    assert info["global_devices"] == 8
