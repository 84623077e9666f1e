"""Scenario-batch parallelism over device meshes (DP-style SPMD)."""

from scptoolbox_tpu.parallel.batch import (BatchResult, make_mesh,
                                           scenario_sweep, shard_batch,
                                           solve_batched_sharded)

__all__ = ["BatchResult", "make_mesh", "scenario_sweep", "shard_batch",
           "solve_batched_sharded"]
