from .pipeline import (
    pipeline_apply,
    run_pipelined_stack,
    shard_pipeline_params,
    stack_pipeline_stages,
)
from .mesh import (
    MeshConfig,
    barrier,
    batch_sharding,
    get_abstract_state,
    is_main_process,
    make_mesh,
    mean_gather,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "MeshConfig",
    "pipeline_apply",
    "run_pipelined_stack",
    "shard_pipeline_params",
    "stack_pipeline_stages",
    "barrier",
    "batch_sharding",
    "get_abstract_state",
    "is_main_process",
    "make_mesh",
    "mean_gather",
    "param_shardings",
    "replicated",
    "shard_batch",
    "shard_params",
]
