"""Parallelism & multi-host execution — new TPU-native functionality.

The reference has no distributed support at all (SURVEY.md §2.7: zero
occurrences of torch.distributed); this package provides the idiomatic
JAX/TPU equivalents: device meshes + NamedSharding for data/chain
parallelism, jitted train steps whose gradient allreduce is inserted by XLA
over ICI, and multi-host initialization.
"""

from .mesh import make_mesh, shard_batch, replicate
from .data_parallel import (
    make_data_parallel_step,
    make_eval_step,
    make_reverse_kld_step,
)
from .chains import shard_chains, parallel_chain_sample
from .pipeline import make_pipeline_apply, make_pipeline_train_step
from .tensor_parallel import (
    tp_shardings,
    fsdp_shardings,
    make_tensor_parallel_step,
    make_fsdp_step,
)
from .distributed import (
    initialize_distributed,
    local_device_batch,
    process_local_batch,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_data_parallel_step",
    "make_eval_step",
    "make_reverse_kld_step",
    "shard_chains",
    "parallel_chain_sample",
    "make_pipeline_apply",
    "make_pipeline_train_step",
    "tp_shardings",
    "fsdp_shardings",
    "make_tensor_parallel_step",
    "make_fsdp_step",
    "initialize_distributed",
    "local_device_batch",
    "process_local_batch",
]
