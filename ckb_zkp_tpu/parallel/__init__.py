"""Multi-chip parallelism: mesh definition, sharded MSM and NTT.

The reference's only parallelism is rayon shared-memory loops (SURVEY.md
§2.3); this layer is its TPU-native replacement: `jax.sharding.Mesh` +
`shard_map`, points/scalars sharded per chip for Pippenger partial sums, NTT
butterflies exchanged via `all_to_all` in the four-step decomposition.
"""

from .mesh import make_mesh
from .msm import msm_sharded
from .ntt import ShardedDomain, get_sharded_domain

__all__ = ["make_mesh", "msm_sharded", "ShardedDomain", "get_sharded_domain"]
