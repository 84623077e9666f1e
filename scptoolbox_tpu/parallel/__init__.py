"""Scenario-batch parallelism over device meshes (DP-style SPMD) and the
shard_map + psum collective solve path, on 1-D (batch) or 2-D
(host x batch, DCN x ICI) meshes."""

from scptoolbox_tpu.parallel.batch import (BatchResult, make_mesh,
                                           make_mesh_2d, scenario_sweep,
                                           shard_batch,
                                           solve_batched_sharded)
from scptoolbox_tpu.parallel.collective import (CollectiveResult,
                                                solve_batched_collective)

__all__ = ["BatchResult", "make_mesh", "make_mesh_2d", "scenario_sweep",
           "shard_batch", "solve_batched_sharded", "CollectiveResult",
           "solve_batched_collective"]
