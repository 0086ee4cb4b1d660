"""Host-side IO: video decode, synthetic clips, trajectory export."""
from .export import Trajectories, load, save
from .synthetic import moving_blob_clip, translating_pair
from .video import FrameStream, PrefetchStream, open_video, write_video

__all__ = ["Trajectories", "load", "save", "moving_blob_clip",
           "translating_pair", "FrameStream", "PrefetchStream",
           "open_video", "write_video"]
