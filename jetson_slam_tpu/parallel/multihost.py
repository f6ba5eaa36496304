"""Cross-host (multi-process) support: the DCN half of the BASELINE.json
north star — "tracking/mapping pipelined across hosts, BA sharded over all
hosts' devices".

The reference is strictly single-process (three pthreads in one address
space, System.cpp:97-111).  Here the roles split across JAX processes:

- a TRACKER process owns the camera stream and the front-end chip(s);
- a MAPPER process owns LocalMapping/BA on another host's chips;
- keyframe handoff rides a serialized MapStore DELTA (the arrays a new
  keyframe adds: its rows + the map points it created) — small, host-side,
  send-once — while bundle adjustment runs SPMD over the GLOBAL mesh so
  every host's devices contribute shards (parallel/dist_ba.py psums ride
  ICI within a host and DCN across hosts, inserted by XLA from the same
  program that runs single-host).

Nothing here is TPU-pod-specific: the same code path runs as a 2-process
CPU rehearsal (tests/test_multihost.py) and on real multi-host slices via
`jax.distributed.initialize`.
"""
from __future__ import annotations

import io

import numpy as np


def initialize(coordinator: str, num_processes: int, process_id: int):
    """jax.distributed.initialize wrapper (idempotent per process)."""
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "data"):
    """1-D mesh over EVERY process's devices (order = jax.devices())."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def put_global(x, sharding):
    """Place a host array (identical on every process) with `sharding`,
    which may span non-addressable devices: each process contributes only
    its addressable shards."""
    import jax
    import jax.numpy as jnp

    if sharding.is_fully_addressable:
        return jax.device_put(jnp.asarray(x), sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def fetch_global(mesh, arr):
    """Host numpy copy of a global jax.Array on EVERY process.  For arrays
    with non-addressable shards this compiles an identity with replicated
    output (XLA inserts the cross-process all-gather)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(jax.device_get(arr))
    repl = NamedSharding(mesh, P())
    gathered = jax.jit(lambda a: a, out_shardings=repl)(arr)
    return np.asarray(gathered.addressable_data(0))


# ------------------------------------------------------------ map deltas
_KF_FIELDS = ("kf_pose", "kf_timestamp", "kf_frame_id", "kf_kp_xy",
              "kf_kp_octave", "kf_kp_angle", "kf_kp_ur", "kf_kp_depth",
              "kf_desc", "kf_kp_valid", "kf_obs", "kf_parent",
              "kf_first_connection", "kf_gen")
_PT_FIELDS = ("pt_pos", "pt_normal", "pt_desc", "pt_min_dist", "pt_max_dist",
              "pt_nobs", "pt_visible", "pt_found", "pt_first_kf",
              "pt_ref_kf", "pt_gen")


def serialize_kf_delta(m, kids) -> bytes:
    """Snapshot the rows a set of keyframes contributes: the KF rows
    themselves plus every map point they observe.  Row indices are carried
    verbatim (both sides address the same capacity-padded SoA layout), so
    apply is a plain row write — the wire format of the tracker->mapper
    keyframe handoff."""
    kids = np.asarray(kids, np.int64)
    obs = m.kf_obs[kids]
    pids = np.unique(obs[obs >= 0])
    pids = pids[m.pt_alive[pids]] if len(pids) else pids
    payload = {"kids": kids, "pids": pids}
    for f in _KF_FIELDS:
        payload["K_" + f] = getattr(m, f)[kids]
    for f in _PT_FIELDS:
        payload["P_" + f] = getattr(m, f)[pids]
    buf = io.BytesIO()
    np.savez_compressed(buf, **payload)
    return buf.getvalue()


def apply_kf_delta(m, blob: bytes):
    """Write a serialize_kf_delta payload into `m` (same SoA capacities).
    Returns (kids, pids) applied."""
    data = np.load(io.BytesIO(blob), allow_pickle=False)
    kids = data["kids"]
    pids = data["pids"]
    for f in _KF_FIELDS:
        getattr(m, f)[kids] = data["K_" + f]
    for f in _PT_FIELDS:
        getattr(m, f)[pids] = data["P_" + f]
    m.kf_alive[kids] = True
    if len(pids):
        m.pt_alive[pids] = True
    m._next_kf = max(m._next_kf, int(kids.max()) + 1 if len(kids) else 0)
    if len(pids):
        m._next_pt = max(m._next_pt, int(pids.max()) + 1)
    m.version += 1
    return kids, pids


def _kv_client():
    from jax._src import distributed

    client = distributed.global_state.client
    assert client is not None, "jax.distributed not initialized"
    return client


def kv_put_bytes(key: str, blob: bytes):
    """Publish a bytes payload on the coordination-service KV store — the
    tracker->mapper handoff channel.  Unlike a collective, the receiver
    can block for it however long the sender takes (a Gloo/ICI collective
    would time out its context init if the peers arrive minutes apart)."""
    import base64

    _kv_client().key_value_set(key, base64.b64encode(blob).decode())


def kv_get_bytes(key: str, timeout_ms: int = 600_000) -> bytes:
    import base64

    v = _kv_client().blocking_key_value_get(key, timeout_ms)
    return base64.b64decode(v)
