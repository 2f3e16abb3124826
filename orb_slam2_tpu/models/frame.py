"""Per-image measurement container + jitted construction.

Replaces src/Frame.cc: ORB extraction, keypoint undistortion, and the
static camera setup (src/Frame.cc:111-216, 502-597).  The 64x48
feature grid of the reference is not needed — spatial windowing happens
as dense masks inside the search ops.

Feature arrays are DEVICE-FIRST: the extractor's outputs stay on the
TPU and host copies materialize lazily, in one batched transfer, only
when something actually reads them (keyframe bookkeeping, BoW, export).
A frame that is tracked and discarded never crosses the tunnel.
Only ``mp_ids`` / ``mp_outlier`` (the map bindings) are host-native.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..geom import camera as camera_mod
from ..ops import extractor as ex

_FEATURE_FIELDS = ("xy", "xy_raw", "response", "angle", "octave",
                   "desc", "valid")


class Frame:
    """SoA keypoint set + pose + map bindings.

    Fields: xy (N,2 undistorted), xy_raw (N,2 detector coords),
    response (N,), angle (N,), octave (N,), desc (N,8 uint32),
    valid (N,), Tcw (4,4), mp_ids (N,), mp_outlier (N,)."""

    def __init__(self, frame_id, timestamp, Tcw, mp_ids, mp_outlier,
                 n=None, dev=None, **host_fields):
        self.frame_id = frame_id
        self.timestamp = timestamp
        self.Tcw = Tcw
        self.mp_ids = mp_ids
        self.mp_outlier = mp_outlier
        self._dev = dict(dev) if dev else {}
        self._n = n
        for k, v in host_fields.items():
            if k not in _FEATURE_FIELDS:
                raise TypeError(f"unknown field {k}")
            self.__dict__[k] = v
        if n is None:
            if "xy" in self.__dict__:
                self._n = self.__dict__["xy"].shape[0]
            else:
                self._n = int(self._dev["xy"].shape[0])

    def __getattr__(self, name):
        # only called for names NOT in __dict__: lazily materialize the
        # host copies with one batched device->host transfer
        if name in _FEATURE_FIELDS:
            self._materialize()
            return self.__dict__[name]
        raise AttributeError(name)

    def _materialize(self):
        missing = [f for f in _FEATURE_FIELDS if f not in self.__dict__]
        if not missing:
            return
        vals = jax.device_get(tuple(self._dev[f] for f in missing))
        self.__dict__.update(zip(missing, vals))

    @property
    def n(self) -> int:
        return self._n

    def n_tracked(self) -> int:
        return int(((self.mp_ids >= 0) & ~self.mp_outlier).sum())

    def dev(self, name: str):
        arr = self._dev.get(name)
        if arr is None:
            arr = jnp.asarray(getattr(self, name))
            self._dev[name] = arr
        return arr

    def compact(self, sel: np.ndarray):
        """Shrink the feature set to rows ``sel`` (device gather + host
        reindex).  Init frames carry a 2x feature budget
        (src/Tracking.cc:182-189); once the initial map exists they are
        compacted to the standard capacity so every downstream stacked
        kernel sees ONE static row count — a mid-run 8000->4000 shape
        flip costs a full XLA recompile through the remote-compile
        relay (~7 s each on the axon tunnel)."""
        sel = np.asarray(sel, np.int64)
        dev_sel = None
        new_dev = {}
        for f in _FEATURE_FIELDS:
            arr = self._dev.get(f)
            if arr is not None:
                if dev_sel is None:
                    dev_sel = jnp.asarray(sel.astype(np.int32))
                new_dev[f] = jnp.take(arr, dev_sel, axis=0)
        self._dev = new_dev  # drops stale (name, n) padded caches
        for f in _FEATURE_FIELDS:
            if f in self.__dict__:
                self.__dict__[f] = self.__dict__[f][sel]
        self.mp_ids = self.mp_ids[sel]
        self.mp_outlier = self.mp_outlier[sel]
        self._n = int(len(sel))

    def dev_padded(self, name: str, n: int):
        """Device copy zero-padded to ``n`` rows (cached).  Lets frames
        with different feature counts stack into one batch ON DEVICE —
        no stacked host array ever crosses the tunnel."""
        key = (name, n)
        arr = self._dev.get(key)
        if arr is None:
            base = self.dev(name)
            pad = n - base.shape[0]
            if pad > 0:
                widths = ((0, pad),) + ((0, 0),) * (base.ndim - 1)
                arr = jnp.pad(base, widths)
            else:
                arr = base
            self._dev[key] = arr
        return arr


class FrameFactory:
    """Builds Frames with a cached jitted extract+undistort pipeline.

    Mirrors the Frame constructor flow (src/Frame.cc:111-188): extract
    ORB -> undistort keypoints; intrinsics/undistorted-bounds computed
    once (the reference's mbInitialComputations)."""

    def __init__(self, cam: camera_mod.Intrinsics, params: ex.OrbParams,
                 init_params: ex.OrbParams | None = None):
        self.cam = cam
        self.params = params
        # 2x feature budget during initialization (src/Tracking.cc:182-189,
        # 219-234)
        self.init_params = init_params or params._replace(
            n_features=2 * params.n_features)
        self.bounds = camera_mod.undistorted_bounds(cam)
        self._next_id = 0
        self.sigma2 = ex.level_sigma2(params)
        self.inv_sigma2 = (1.0 / self.sigma2).astype(np.float32)
        self.scale_factors = ex.pyramid.scale_factors(
            params.n_levels, params.scale_factor)[0]

    @functools.lru_cache(maxsize=4)
    def _pipeline(self, h: int, w: int, init: bool):
        cam = self.cam
        params = self.init_params if init else self.params

        @jax.jit
        def run(image):
            # uint8 frames upload 4x less over the host<->chip link and
            # cast to f32 on device (the cast fuses into the pyramid)
            feats = ex.extract(image.astype(jnp.float32), params)
            und = camera_mod.undistort_points(cam, feats.xy)
            return feats, und

        return run

    def start(self, image, init_mode: bool = False):
        """Dispatch extraction asynchronously (JAX queues the work and
        returns immediately).  Pair with :meth:`make` via ``started=`` —
        lets a pipeline extract frame t+1 while frame t is processed on
        the host.

        ``image`` may be a numpy array (uploaded here; uint8 stays
        uint8 — 4x less link traffic) or an array ALREADY on device
        (e.g. frames pre-staged in HBM, or produced by an on-device
        camera/ISP path) — used as-is with no host round trip."""
        if isinstance(image, jnp.ndarray):
            img = image
        else:
            img_np = np.asarray(image)
            if img_np.dtype != np.uint8:
                img_np = np.asarray(img_np, np.float32)
            img = jnp.asarray(img_np)
        feats, und = self._pipeline(img.shape[0], img.shape[1], init_mode)(img)
        return (feats, und, init_mode)

    def make(self, image: np.ndarray, timestamp: float = 0.0,
             Tcw: np.ndarray | None = None, init_mode: bool = False,
             started=None) -> Frame:
        """image: (H, W) uint8/float32 grayscale."""
        if started is not None and started[2] == init_mode:
            feats, und, _ = started
        else:
            feats, und, _ = self.start(image, init_mode)
        fid = self._next_id
        self._next_id += 1
        n = int(feats.xy.shape[0])
        # NO device->host transfer here: the feature arrays live on
        # device; host copies materialize lazily on first access
        return Frame(
            frame_id=fid,
            timestamp=timestamp,
            Tcw=np.eye(4, dtype=np.float32) if Tcw is None
            else np.asarray(Tcw, np.float32),
            mp_ids=np.full(n, -1, np.int32),
            mp_outlier=np.zeros(n, bool),
            n=n,
            dev=dict(xy=und, xy_raw=feats.xy, response=feats.response,
                     angle=feats.angle, octave=feats.octave,
                     desc=feats.desc, valid=feats.valid),
        )
