from .mesh import (
    frame_mesh,
    frame_sharding,
    replicated_sharding,
    shard_window,
    sharded_window_fn,
)

__all__ = [
    "frame_mesh",
    "frame_sharding",
    "replicated_sharding",
    "shard_window",
    "sharded_window_fn",
]
