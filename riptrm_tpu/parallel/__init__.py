from riptrm_tpu.parallel.distributed import host_shard, initialize
from riptrm_tpu.parallel.sweep import (
    batched_riptrm_solve,
    batched_solver_sweep,
    make_mesh,
    run_sweep,
    sharded_riptrm_solve,
)

__all__ = [
    "host_shard",
    "initialize",
    "batched_riptrm_solve",
    "batched_solver_sweep",
    "make_mesh",
    "run_sweep",
    "sharded_riptrm_solve",
]
