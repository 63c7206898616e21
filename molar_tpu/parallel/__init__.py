from .mesh import (
    com_gyration_sharded,
    frame_atom_mesh,
    frame_mesh,
    frame_sharding,
    replicated_sharding,
    shard_window,
    sharded_window_fn,
)

__all__ = [
    "com_gyration_sharded",
    "frame_atom_mesh",
    "frame_mesh",
    "frame_sharding",
    "replicated_sharding",
    "shard_window",
    "sharded_window_fn",
]
