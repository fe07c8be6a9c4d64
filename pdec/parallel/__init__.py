"""Device mesh + sharding utilities (the NCCL/DeepSpeed replacement).

The reference distributes with torchrun + NCCL + DeepSpeed ZeRO-3
(``train/scripts/train.sh:70``, ``train/config/deepspeed.json:31-42``).
On TPU there is no user-space transport to manage: this module defines the
mesh axes and PartitionSpecs; XLA compiles the collectives onto ICI/DCN.

Axes:
- ``data``: pure data parallelism (per-host batches),
- ``fsdp``: ZeRO-3-style parameter/optimizer sharding (params gathered
  per-layer on use, grads reduce-scattered — what DeepSpeed stage 3 does in
  software, here emitted by XLA SPMD from the sharding annotations),
- ``tp``: megatron tensor parallelism over heads/ffn.
"""

from pdec.parallel.mesh import (
    MeshConfig,
    make_mesh,
    batch_sharding,
    replicated,
    shard_params,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_params",
]
