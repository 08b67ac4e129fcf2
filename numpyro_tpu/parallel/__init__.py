"""numpyro_tpu.parallel — device-mesh utilities for chain-massive inference."""

from numpyro_tpu.parallel.mesh import (
    chain_data_mesh,
    chain_mesh,
    cross_chain_diagnostics,
    initialize_distributed,
    pooled_step_size,
    shard_chain_state,
    shard_data,
)

__all__ = [
    "chain_data_mesh",
    "chain_mesh",
    "cross_chain_diagnostics",
    "initialize_distributed",
    "pooled_step_size",
    "shard_chain_state",
    "shard_data",
]
