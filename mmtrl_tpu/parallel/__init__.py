from mmtrl_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
)
from mmtrl_tpu.parallel.pipeline import pipeline_apply, stack_stage_params
from mmtrl_tpu.parallel.ring_attention import ring_attention

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "pipeline_apply",
    "stack_stage_params",
    "ring_attention",
]
