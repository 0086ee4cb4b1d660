"""Distribution: device mesh construction + data-parallel clip sharding."""
from .mesh import make_mesh, track_clips_batch, track_clips_sharded

__all__ = ["make_mesh", "track_clips_batch", "track_clips_sharded"]
