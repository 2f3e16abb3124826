"""Device-resident map-point SoA with dirty-row synchronization.

The host MapStore numpy arrays stay authoritative (graph mutations are
host logic), but their device image persists across frames: per-frame
consumers (the fused tracking step, fuse, BA) gather rows ON DEVICE by
index instead of re-uploading a gathered copy every call.

Why: through the chip tunnel (~20-25 MB/s measured) the per-frame
candidate SoA upload (pos+desc+normal+dists+valid ~= 65 B/point,
~1 MB at 16k candidates) used to cost ~50 ms EVERY frame.  With this
mirror only rows touched since the last sync cross the link (~0.2 MB
per keyframe), plus a 64 KB index vector per frame.

Synchronization: MapStore records touched pids in ``dirty_points``
(adds, erasures, replaces, descriptor/normal refreshes, BA position
writebacks).  ``sync()`` drains the set into ONE scatter dispatch.
Capacity grows by 4x re-allocation (full re-upload, amortized).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _scatter_rows(pos, desc, normal, min_d, max_d, valid,
                  rows, upos, udesc, unormal, umin, umax, uvalid):
    """One dispatch: scatter updated rows into all six columns."""
    return (pos.at[rows].set(upos),
            desc.at[rows].set(udesc),
            normal.at[rows].set(unormal),
            min_d.at[rows].set(umin),
            max_d.at[rows].set(umax),
            valid.at[rows].set(uvalid))


class DevicePoints:
    """The six column arrays live in ONE tuple (``_arrs``) that is only
    ever replaced by a single attribute assignment — atomic under the
    GIL — so a concurrent reader (the tracking thread's fused dispatch
    racing the mapper's sync) always sees a mutually consistent
    generation, never e.g. old positions with a new validity mask."""

    def __init__(self, min_capacity: int = 65536):
        self.min_capacity = min_capacity
        self.cap = 0
        self._arrs = None

    # column views (read-only convenience; for a consistent multi-column
    # read use snapshot())
    pos = property(lambda self: self._arrs[0])
    desc = property(lambda self: self._arrs[1])
    normal = property(lambda self: self._arrs[2])
    min_d = property(lambda self: self._arrs[3])
    max_d = property(lambda self: self._arrs[4])
    valid = property(lambda self: self._arrs[5])

    def snapshot(self):
        """Atomic (pos, desc, normal, min_d, max_d, valid) tuple."""
        return self._arrs

    def _full_upload(self, store, cap: int):
        n = store.n_points()
        pad = cap - n

        def up(col, width, dtype):
            a = np.asarray(col, dtype)
            if a.ndim == 1:
                return jnp.asarray(np.pad(a, (0, pad)))
            return jnp.asarray(np.pad(a, ((0, pad), (0, 0))))

        self._arrs = (up(store.mp_pos, 3, np.float32),
                      up(store.mp_desc, 8, np.uint32),
                      up(store.mp_normal, 3, np.float32),
                      up(store.mp_min_dist, None, np.float32),
                      up(store.mp_max_dist, None, np.float32),
                      up(store.mp_valid, None, bool))
        self.cap = cap

    def sync(self, store) -> None:
        """Bring the device image up to date.  Call with the map lock
        held (reads the numpy SoA); the device work is async."""
        n = store.n_points()
        if n > self.cap or self._arrs is None:
            cap = self.min_capacity
            while cap < n:
                cap *= 4
            self._full_upload(store, cap)
            store.dirty_points.clear()
            return
        if not store.dirty_points:
            return
        rows = np.fromiter((p for p in store.dirty_points if p < n),
                           np.int32)
        store.dirty_points.clear()
        if len(rows) == 0:
            return
        # scatter in FIXED-SIZE chunks (one compiled shape, ever):
        # short rows pad by repeating the last row (idempotent scatter)
        CH = 8192
        for c0 in range(0, len(rows), CH):
            chunk = rows[c0:c0 + CH]
            chunk = np.pad(chunk, (0, CH - len(chunk)), mode="edge")
            ridx = chunk.astype(np.int64)
            self._arrs = _scatter_rows(
                *self._arrs,
                jnp.asarray(chunk),
                jnp.asarray(np.asarray(store.mp_pos[ridx], np.float32)),
                jnp.asarray(np.asarray(store.mp_desc[ridx], np.uint32)),
                jnp.asarray(np.asarray(store.mp_normal[ridx], np.float32)),
                jnp.asarray(np.asarray(store.mp_min_dist[ridx],
                                       np.float32)),
                jnp.asarray(np.asarray(store.mp_max_dist[ridx],
                                       np.float32)),
                jnp.asarray(np.asarray(store.mp_valid[ridx], bool)))
