"""IO layer: synthetic generation determinism, export round-trip, streams."""

import numpy as np

from kalman_hydra_tpu.io import (FrameStream, PrefetchStream, Trajectories,
                                 load, moving_blob_clip, save)


def test_synthetic_clip_is_deterministic():
    f1, t1 = moving_blob_clip(num_frames=4, height=64, width=64, seed=7)
    f2, t2 = moving_blob_clip(num_frames=4, height=64, width=64, seed=7)
    assert np.array_equal(f1, f2)
    assert np.array_equal(t1.positions, t2.positions)


def test_trajectory_roundtrip(tmp_path):
    T, K = 5, 3
    tr = Trajectories(
        positions=np.random.rand(T, K, 2).astype(np.float32),
        alive=np.ones((T, K), dtype=bool),
        nis=np.random.rand(T, K).astype(np.float32))
    p = str(tmp_path / "tracks.npz")
    save(tr, p)
    tr2 = load(p)
    assert np.array_equal(tr.positions, tr2.positions)
    assert np.array_equal(tr.alive, tr2.alive)
    assert np.array_equal(tr.nis, tr2.nis)


def test_csv_export(tmp_path):
    tr = Trajectories(positions=np.zeros((2, 2, 2), np.float32),
                      alive=np.ones((2, 2), bool))
    p = str(tmp_path / "tracks.csv")
    save(tr, p)
    lines = open(p).read().strip().splitlines()
    assert lines[0] == "frame,track,x,y,alive"
    assert len(lines) == 1 + 4


def test_npz_frame_stream(tmp_path):
    frames, _ = moving_blob_clip(num_frames=3, height=32, width=32)
    p = str(tmp_path / "clip.npz")
    np.savez_compressed(p, frames=frames)
    fs = FrameStream(p)
    assert fs.num_frames == 3
    got = fs.read_all()
    assert np.array_equal(got, frames)


def test_prefetch_stream_preserves_order(tmp_path):
    frames, _ = moving_blob_clip(num_frames=6, height=32, width=32)
    p = str(tmp_path / "clip.npz")
    np.savez_compressed(p, frames=frames)
    got = np.stack(list(PrefetchStream(FrameStream(p), depth=2)))
    assert np.array_equal(got, frames)


def test_device_prefetch_preserves_order_and_lands_on_device():
    from kalman_hydra_tpu.io.video import device_prefetch
    frames, _ = moving_blob_clip(num_frames=6, height=32, width=32)
    got = list(device_prefetch(iter(frames), depth=2))
    assert len(got) == 6
    import jax
    assert all(isinstance(g, jax.Array) for g in got)
    assert np.array_equal(np.stack([np.asarray(g) for g in got]), frames)


def test_device_prefetch_propagates_worker_errors():
    from kalman_hydra_tpu.io.video import device_prefetch

    def bad():
        yield np.zeros((4, 4), np.uint8)
        raise RuntimeError("decode failed")

    it = device_prefetch(bad(), depth=2)
    next(it)
    import pytest
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)
