"""TPU kernels and compute primitives (Pallas + XLA).

Replaces the reference's native kernel dependencies:
- flash-attn-2 CUDA kernels -> `pdec.ops.attention` (Pallas flash attention
  on TPU, jnp reference elsewhere),
- batched FEM solves -> `pdec.physics.rollout` chunked propagators (+
  `pdec.ops.tridiag` for large meshes beyond the corpus sizes).
"""

from pdec.ops.attention import attention
from pdec.ops.paged_attention import paged_attention
from pdec.ops.tridiag import thomas_solve

__all__ = ["attention", "paged_attention", "thomas_solve"]
