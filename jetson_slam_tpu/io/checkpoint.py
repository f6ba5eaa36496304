"""Map checkpoint / resume.

The reference leaves SaveMap/LoadMap as an explicit TODO (include/
System.h:115-117) — its only persistence is terminal trajectory export.
Here the whole MapStore is a pytree of NumPy SoA tables, so checkpointing is
one compressed npz (and the same format round-trips through orbax-style
per-array trees if sharded checkpoints are ever needed).  Saved state covers
everything LocalMapping/LoopClosing mutate: point tables, keyframe tables,
observation matrix, allocation cursors.
"""
from __future__ import annotations

import numpy as np

from ..core.map import MapStore

_SCALARS = ("max_points", "max_keyframes", "n_slots", "_next_pt", "_next_kf")
_ARRAYS = (
    "pt_alive", "pt_pos", "pt_normal", "pt_desc", "pt_min_dist",
    "pt_max_dist", "pt_nobs", "pt_visible", "pt_found", "pt_first_kf",
    "pt_ref_kf",
    "kf_alive", "kf_pose", "kf_timestamp", "kf_frame_id", "kf_kp_xy",
    "kf_kp_octave", "kf_kp_angle", "kf_kp_ur", "kf_kp_depth", "kf_desc",
    "kf_kp_valid", "kf_obs", "kf_parent", "kf_first_connection", "kf_gen",
    "pt_gen",
)


def save_map(map_store: MapStore, path: str) -> None:
    """Serialize the full map state to one compressed .npz."""
    payload = {name: getattr(map_store, name) for name in _ARRAYS}
    payload["_scalars"] = np.array(
        [getattr(map_store, s) for s in _SCALARS], np.int64)
    payload["_loop_edges"] = np.array(
        sorted(map_store.loop_edges), np.int64).reshape(-1, 2)
    np.savez_compressed(path, **payload)


def load_map(path: str) -> MapStore:
    """Rebuild a MapStore from save_map output."""
    with np.load(path) as data:
        scalars = data["_scalars"]
        m = MapStore(max_points=int(scalars[0]), max_keyframes=int(scalars[1]),
                     n_slots=int(scalars[2]))
        m._next_pt = int(scalars[3])
        m._next_kf = int(scalars[4])
        for name in _ARRAYS:
            if name in data:  # tolerate pre-spanning-tree checkpoints
                setattr(m, name, data[name].copy())
        if "_loop_edges" in data:
            m.loop_edges = {(int(a), int(b)) for a, b in data["_loop_edges"]}
    m.rebuild_obs_index()
    return m
