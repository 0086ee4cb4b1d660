"""Device mesh + data-parallel clip sharding (SURVEY.md §2.2).

The reference is single-process/single-GPU; the TPU build's first-class
parallelism is clip-batch data parallelism over a v5e-8 slice
(BASELINE.json:11): clips are independent, so DP = `NamedSharding` of the
batch axis over a 1-D `Mesh(("data",))` — XLA emits no collectives in the
hot loop, only at the optional metric reduction (psum via `jnp.mean` over
the sharded axis). Spatial (halo-exchange) frame sharding is the designed
TP analog; see kernels/ notes — not needed at 1080p on one chip.

Developed against a CPU host faked to 8 devices
(tests/conftest.py, SURVEY.md §4.4); the axis name and layouts are
identical on a real v5e-8 slice.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RunConfig
from ..io.export import Trajectories
from .. import pipeline as _pipeline


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@functools.partial(jax.jit, static_argnames=("cfg", "with_history"))
def _track_batch_jit(clips, cfg: RunConfig, with_history: bool = False,
                     seeds: Optional[jnp.ndarray] = None, render_tmpl=None):
    """vmapped multi-clip pipeline (single device, BASELINE.json:10).

    render_tmpl (RenderTemplate) is shared by every clip — vmap closes
    over it unmapped (broadcast), matching the replicated sharding the DP
    path uses."""
    if cfg.pair_batch:
        # pair-batched mode can't ride vmap (the manual-DMA kernels
        # reject a vmapped batch dim); its multi-clip twin chains every
        # clip's pairs through shared launches instead (clip_len)
        if render_tmpl is not None:
            raise ValueError(
                "pair_batch does not support the render channel "
                "(render_tmpl must be None)")
        return _pipeline.track_clips_pairflow(clips, cfg, with_history,
                                              seeds)
    fn = lambda f, s: _pipeline.track_arrays(f, cfg, with_history, s,
                                             render_tmpl)
    if seeds is None:
        return jax.vmap(lambda f: _pipeline.track_arrays(
            f, cfg, with_history, None, render_tmpl))(clips)
    return jax.vmap(fn)(clips, seeds)


def track_clips_batch(clips: np.ndarray, cfg: RunConfig,
                      seeds: Optional[np.ndarray] = None, render_tmpl=None):
    """Track a (B, T, H, W[, 3]) uint8 batch with vmap on one device.

    Returns a list of B Trajectories."""
    outs = jax.device_get(_track_batch_jit(
        jnp.asarray(clips), cfg, False,
        None if seeds is None else jnp.asarray(seeds), render_tmpl))
    return _to_trajectories(outs)


def track_clips_sharded(clips: np.ndarray, cfg: RunConfig,
                        mesh: Optional[Mesh] = None,
                        seeds: Optional[np.ndarray] = None,
                        reduce_metrics: bool = False, render_tmpl=None):
    """Data-parallel tracking: clip batch sharded over the mesh axis.

    B must be divisible by the mesh size. With `reduce_metrics`, also
    returns globally reduced filter-health metrics (mean NIS, live-track
    fraction per frame) — the only cross-device communication
    (SURVEY.md §5 "Distributed communication backend"). `render_tmpl`
    (one RenderTemplate shared by all clips — e.g. chunks of one long
    recording of the same meshed body) is REPLICATED over the mesh; the
    per-clip render channel then runs collective-free like the rest of
    the DP hot loop.
    """
    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    B = clips.shape[0]
    if B % mesh.size != 0:
        raise ValueError(f"batch {B} not divisible by mesh size {mesh.size}")

    data_sharding = NamedSharding(mesh, P(axis))
    clips_d = jax.device_put(jnp.asarray(clips), data_sharding)
    seeds_d = (None if seeds is None
               else jax.device_put(jnp.asarray(seeds), data_sharding))
    tmpl_d = (None if render_tmpl is None
              else jax.device_put(render_tmpl, NamedSharding(mesh, P())))

    if cfg.pair_batch:
        # pair-batched mode can't ride a vmapped batch dim over the
        # manual-DMA kernels (same constraint as _track_batch_jit), so the
        # DP path shard_maps the multi-clip pairflow pipeline: each device
        # chains its LOCAL clip shard through shared kernel launches
        # (track_clips_pairflow's clip_len chaining), keeping both the DP
        # contract (BASELINE.json:11) and the shared-launch contract
        # (BASELINE.json:10) on the pallas path. RunConfig validation only
        # constrains ekf.measurement, not the template arg itself — reject
        # a stray template loudly rather than silently ignoring it.
        if render_tmpl is not None:
            raise ValueError(
                "pair_batch does not support the render channel "
                "(render_tmpl must be None)")
        outs, metrics = _track_sharded_pairflow(
            clips_d, cfg, mesh, axis, seeds_d, reduce_metrics)
    else:
        outs, metrics = _track_sharded_jit(clips_d, cfg, reduce_metrics,
                                           seeds_d, tmpl_d)
    trajs = _to_trajectories(jax.device_get(outs))
    if reduce_metrics:
        return trajs, jax.device_get(metrics)
    return trajs


@functools.lru_cache(maxsize=32)
def _pairflow_sharded_fn(cfg: RunConfig, mesh: Mesh, axis: str,
                         has_seeds: bool, reduce_metrics: bool):
    """Build (and cache) the jitted shard_map'd pairflow pipeline.

    Module-level cache keyed on the static configuration so repeated
    calls hit the jit trace/executable cache (on this 1-vCPU host every
    retrace is a 1-100 s XLA compile) — mirrors _track_batch_jit /
    _track_sharded_jit, which get this for free from jax.jit's own cache.
    """
    def local(clips, seeds=None):
        outs = _pipeline.track_clips_pairflow(clips, cfg, False, seeds)
        if not reduce_metrics:
            # collective-free hot loop when metrics are not requested
            return outs, None
        metrics = {
            "mean_nis": jax.lax.pmean(jnp.mean(outs["nis"]), axis),
            "live_fraction": jax.lax.pmean(
                jnp.mean(outs["alive"].astype(jnp.float32), axis=(0, 2)),
                axis),
        }
        return outs, metrics

    metrics_spec = P() if reduce_metrics else None
    # check_vma=False ONLY for the pallas path: pallas_call outputs carry
    # no varying-mesh-axes annotation, which the default shard_map check
    # rejects; the XLA path keeps the replication safety check (same
    # policy as parallel/spatial.py)
    vma = cfg.impl != "pallas"
    if not has_seeds:
        return jax.jit(jax.shard_map(
            lambda c: local(c), mesh=mesh, in_specs=(P(axis),),
            out_specs=(P(axis), metrics_spec), check_vma=vma))
    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), metrics_spec), check_vma=vma))


def _track_sharded_pairflow(clips_d, cfg: RunConfig, mesh: Mesh, axis: str,
                            seeds_d=None, reduce_metrics: bool = False):
    """DP-sharded pair-batched pipeline: shard_map of the multi-clip
    pairflow path over the data mesh (one pair-batched kernel launch set
    per device, clips chained via clip_len — never a vmapped batch dim on
    the manual-DMA kernels). Metrics (when requested) are pmean-reduced
    over the mesh axis — the DP path's only collective."""
    fn = _pairflow_sharded_fn(cfg, mesh, axis, seeds_d is not None,
                              reduce_metrics)
    if seeds_d is None:
        return fn(clips_d)
    return fn(clips_d, seeds_d)


@functools.partial(jax.jit, static_argnames=("cfg", "reduce_metrics"))
def _track_sharded_jit(clips_in, cfg: RunConfig, reduce_metrics: bool,
                       seeds_in=None, render_tmpl=None):
    if seeds_in is None:
        outs = jax.vmap(lambda f: _pipeline.track_arrays(
            f, cfg, False, None, render_tmpl))(clips_in)
    else:
        outs = jax.vmap(lambda f, s: _pipeline.track_arrays(
            f, cfg, False, s, render_tmpl))(clips_in, seeds_in)
    if reduce_metrics:
        # the only cross-device reduction in the DP path: XLA inserts the
        # psum/all-reduce over the sharded batch axis here
        metrics = {
            "mean_nis": jnp.mean(outs["nis"]),
            "live_fraction": jnp.mean(
                outs["alive"].astype(jnp.float32), axis=(0, 2)),
        }
        return outs, metrics
    return outs, None


def _to_trajectories(outs) -> list:
    B = outs["pos"].shape[0]
    return [Trajectories(positions=np.asarray(outs["pos"][b]),
                         alive=np.asarray(outs["alive"][b]),
                         nis=np.asarray(outs["nis"][b]),
                         track_id=np.asarray(outs["track_id"][b]),
                         smoothed=(np.asarray(outs["smoothed"][b])
                                   if "smoothed" in outs else None))
            for b in range(B)]
