"""Synthetic planar-world renderer for tests and benchmarks.

The environment has no dataset egress, so end-to-end tracking tests and
benchmarks run on a rendered world: a large textured ground plane
(z = 0) observed by a camera trajectory (the aerial/drone geometry of
the reference's shenzhen workload, Examples/Monocular/mono_shenzhen.cc).
Views are exact plane-induced homography warps of the texture, so
ground truth poses and structure are exact.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..geom import camera as camera_mod


@dataclass
class PlanarWorld:
    texture: np.ndarray     # (Ht, Wt) float32 the plane's appearance
    scale: float            # pixels per world unit on the plane
    origin: np.ndarray      # (2,) texture pixel of world (0, 0)

    def world_to_tex(self):
        """3x3 mapping homogeneous (X, Y, 1) plane coords -> texture px."""
        return np.array([
            [self.scale, 0, self.origin[0]],
            [0, self.scale, self.origin[1]],
            [0, 0, 1.0],
        ], np.float32)


def make_world(seed: int = 0, tex_size: int = 3072, scale: float = 60.0,
               tex_shape: tuple | None = None,
               origin_px: tuple | None = None) -> PlanarWorld:
    """Random smooth texture with structure at several octaves.

    ``tex_shape``: optional (height, width) for a non-square world —
    e.g. a long strip under a straight aerial sweep (the world must
    cover the whole camera footprint for every frame; past its edge the
    renderer replicates border pixels and the image goes featureless).
    Cell density (texture detail per pixel) is anchored to ``tex_size``
    as the reference length, so a strip has the same local feature
    richness as a ``tex_size``-square world.
    ``origin_px``: texture pixel of world (0, 0); defaults to center.
    """
    import cv2
    rng = np.random.default_rng(seed)
    th, tw = tex_shape if tex_shape is not None else (tex_size, tex_size)
    tex = np.zeros((th, tw), np.float32)
    for cells, amp in [(24, 90.0), (96, 60.0), (384, 35.0)]:
        ch = max(2, int(round(cells * th / tex_size)))
        cw = max(2, int(round(cells * tw / tex_size)))
        layer = rng.uniform(0, 1, (ch, cw)).astype(np.float32)
        layer = cv2.resize(layer, (tw, th), interpolation=cv2.INTER_CUBIC)
        tex += amp * layer
    tex = 255.0 * (tex - tex.min()) / (tex.max() - tex.min())
    if origin_px is None:
        origin = np.array([tw / 2, th / 2], np.float32)
    else:
        origin = np.asarray(origin_px, np.float32)
    return PlanarWorld(texture=tex, scale=scale, origin=origin)


def render(world: PlanarWorld, cam: camera_mod.Intrinsics, Tcw: np.ndarray) -> np.ndarray:
    """Render the plane from camera pose Tcw (world -> camera)."""
    import cv2
    K = np.asarray(cam.K)
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    # plane point (X, Y, 0): pixel ~ K [r1 r2 t] (X, Y, 1)
    H_world_img = K @ np.stack([R[:, 0], R[:, 1], t], axis=1)
    H_tex_img = H_world_img @ np.linalg.inv(world.world_to_tex())
    return cv2.warpPerspective(
        world.texture, H_tex_img.astype(np.float64),
        (cam.width, cam.height), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REPLICATE)


def _render_plane_jit():
    """Jitted homography warp (bilinear, border-replicate): the device
    analogue of :func:`render`.  One compile per (texture, image) shape;
    per-frame cost is one small dispatch instead of a 2.7 MB host
    upload — pre-staging a benchmark sequence in HBM uploads only the
    texture once."""
    import functools
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("width", "height"))
    def _warp(tex, Hinv, width, height):
        yy, xx = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                              jnp.arange(width, dtype=jnp.float32),
                              indexing="ij")
        den = Hinv[2, 0] * xx + Hinv[2, 1] * yy + Hinv[2, 2]
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        sx = (Hinv[0, 0] * xx + Hinv[0, 1] * yy + Hinv[0, 2]) / den
        sy = (Hinv[1, 0] * xx + Hinv[1, 1] * yy + Hinv[1, 2]) / den
        th, tw = tex.shape
        sx = jnp.clip(sx, 0.0, tw - 1.0)
        sy = jnp.clip(sy, 0.0, th - 1.0)
        x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, tw - 2)
        y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, th - 2)
        fx = sx - x0
        fy = sy - y0
        v00 = tex[y0, x0]
        v01 = tex[y0, x0 + 1]
        v10 = tex[y0 + 1, x0]
        v11 = tex[y0 + 1, x0 + 1]
        out = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
               + fy * ((1 - fx) * v10 + fx * v11))
        return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)

    return _warp


_WARP_JIT = None


def render_sequence_device(world: PlanarWorld, cam: camera_mod.Intrinsics,
                           poses: List[np.ndarray]) -> list:
    """Render a pose sequence ON DEVICE as uint8 frames (list of device
    arrays).  Uploads the texture once; each frame is one warp dispatch.
    Pixel-level semantics match :func:`render` + uint8 quantization
    (bilinear sampling, border clamp)."""
    global _WARP_JIT
    import jax
    import jax.numpy as jnp
    if _WARP_JIT is None:
        _WARP_JIT = _render_plane_jit()
    K = np.asarray(cam.K)
    W2T = world.world_to_tex()
    # upload the texture as uint8 (4x less tunnel traffic), cast to
    # f32 on device; make_world textures are already in [0, 255]
    tex_u8 = jax.device_put(
        np.clip(world.texture, 0, 255).astype(np.uint8))
    tex_dev = jnp.asarray(tex_u8, jnp.float32)
    frames = []
    for Tcw in poses:
        R, t = Tcw[:3, :3], Tcw[:3, 3]
        H_world_img = K @ np.stack([R[:, 0], R[:, 1], t], axis=1)
        H_tex_img = H_world_img @ np.linalg.inv(W2T)
        Hinv = np.linalg.inv(H_tex_img).astype(np.float32)
        frames.append(_WARP_JIT(tex_dev, jnp.asarray(Hinv),
                                width=cam.width, height=cam.height))
    return frames


def aerial_trajectory(
    n_frames: int,
    height: float = 10.0,
    speed: float = 0.35,
    yaw_rate: float = 0.0,
    lateral_wobble: float = 0.05,
    seed: int = 1,
) -> List[np.ndarray]:
    """Downward-looking camera sweeping over the plane (shenzhen-style).

    Returns list of Tcw (world -> camera).  Camera axes: z looks down at
    the plane (world -z direction... we use camera z = down so points at
    z=0 have positive depth when the camera is at z = -height).  To keep
    the usual 'scene in front, positive depth' convention the world
    plane is z=0 and cameras fly at z = -height with R aligning camera
    z to +z world.
    """
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n_frames):
        yaw = yaw_rate * i
        cy, sy = np.cos(yaw), np.sin(yaw)
        # camera center in world
        c = np.array([speed * i,
                      lateral_wobble * np.sin(0.2 * i) + 0.01 * rng.normal(),
                      -height + 0.02 * rng.normal()])
        # Rwc: camera x ~ world x rotated by yaw, camera z = +z world (down)
        Rwc = np.array([
            [cy, -sy, 0.0],
            [sy, cy, 0.0],
            [0.0, 0.0, 1.0],
        ])
        Rcw = Rwc.T
        t = -Rcw @ c
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rcw
        T[:3, 3] = t
        poses.append(T)
    return poses


@dataclass
class HeightWorld:
    """Non-planar world: the textured ground carries a smooth height
    field z = h(X, Y) (amplitude a real fraction of the flight height),
    so triangulation, scale gates, and BA face true parallax instead of
    a degenerate plane (VERDICT r2 missing #2 / task 6 — every prior
    end-to-end number came from planar homography worlds)."""
    texture: np.ndarray      # (Ht, Wt) float32 appearance
    heights: np.ndarray      # (Hh, Wh) float32 z of the ground at (X, Y)
    scale: float             # texture pixels per world unit
    h_scale: float           # height-map pixels per world unit
    origin: np.ndarray       # (2,) texture pixel of world (0, 0)
    h_origin: np.ndarray     # (2,) height pixel of world (0, 0)

    def height_at(self, X: np.ndarray, Y: np.ndarray) -> np.ndarray:
        """Bilinear height lookup at world (X, Y) (vectorized)."""
        u = np.clip(X * self.h_scale + self.h_origin[0], 0,
                    self.heights.shape[1] - 1.001)
        v = np.clip(Y * self.h_scale + self.h_origin[1], 0,
                    self.heights.shape[0] - 1.001)
        u0 = u.astype(np.int64)
        v0 = v.astype(np.int64)
        fu = u - u0
        fv = v - v0
        h = self.heights
        return ((h[v0, u0] * (1 - fu) + h[v0, u0 + 1] * fu) * (1 - fv)
                + (h[v0 + 1, u0] * (1 - fu) + h[v0 + 1, u0 + 1] * fu) * fv)


def make_height_world(seed: int = 0, tex_size: int = 3072,
                      scale: float = 60.0, height_amp: float = 1.5,
                      h_size: int = 768, h_cells: int = 28) -> HeightWorld:
    """Textured ground with a smooth random height field (amplitude
    ``height_amp`` world units — ~15% of the default flight height)."""
    import cv2
    base = make_world(seed=seed, tex_size=tex_size, scale=scale)
    rng = np.random.default_rng(seed + 12345)
    h = rng.uniform(-1, 1, (h_cells, h_cells)).astype(np.float32)
    h = cv2.resize(h, (h_size, h_size), interpolation=cv2.INTER_CUBIC)
    h = height_amp * h / max(np.abs(h).max(), 1e-9)
    h_scale = h_size / (tex_size / scale)   # cover the same world extent
    return HeightWorld(
        texture=base.texture, heights=h, scale=scale, h_scale=h_scale,
        origin=base.origin,
        h_origin=np.array([h_size / 2, h_size / 2], np.float32))


def render_height(world: HeightWorld, cam: camera_mod.Intrinsics,
                  Tcw: np.ndarray, iters: int = 6) -> np.ndarray:
    """Render the height-field ground from pose Tcw by per-pixel ray vs
    height-field intersection (parallax-style fixed-point iteration:
    t_{k+1} solves the ray against the height sampled at t_k's
    footprint; converges in a few steps for |grad h| << 1, which
    make_height_world guarantees).  Exact parallax, approximate
    silhouettes — the regime SLAM triangulation actually exercises."""
    import cv2
    K = np.asarray(cam.K)
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    Rwc = R.T
    c = -Rwc @ t                              # camera center in world
    u, v = np.meshgrid(np.arange(cam.width, dtype=np.float32),
                       np.arange(cam.height, dtype=np.float32))
    rays = np.stack([(u - K[0, 2]) / K[0, 0],
                     (v - K[1, 2]) / K[1, 1],
                     np.ones_like(u)], axis=-1).reshape(-1, 3)
    d = rays @ Rwc.T                          # world ray directions
    dz = d[:, 2]
    safe = dz > 1e-6                          # looking toward the ground
    dz = np.where(safe, dz, 1.0)
    tt = (0.0 - c[2]) / dz                    # init: z = 0 plane
    for _ in range(iters):
        X = c[0] + tt * d[:, 0]
        Y = c[1] + tt * d[:, 1]
        tt = (world.height_at(X, Y) - c[2]) / dz
    X = c[0] + tt * d[:, 0]
    Y = c[1] + tt * d[:, 1]
    tx = np.clip(X * world.scale + world.origin[0], 0,
                 world.texture.shape[1] - 1).astype(np.float32)
    ty = np.clip(Y * world.scale + world.origin[1], 0,
                 world.texture.shape[0] - 1).astype(np.float32)
    img = cv2.remap(world.texture,
                    tx.reshape(cam.height, cam.width),
                    ty.reshape(cam.height, cam.width),
                    interpolation=cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_REPLICATE)
    return np.where(safe.reshape(cam.height, cam.width), img,
                    np.float32(127.0))


def loop_trajectory(n_frames: int, radius: float = 8.0, height: float = 10.0):
    """Closed circular sweep for loop-closing tests: the camera returns
    to its start after n_frames."""
    poses = []
    for i in range(n_frames):
        th = 2 * np.pi * i / n_frames
        c = np.array([radius * np.cos(th), radius * np.sin(th), -height])
        yaw = th + np.pi / 2  # tangent heading
        cy, sy = np.cos(yaw), np.sin(yaw)
        Rwc = np.array([
            [cy, -sy, 0.0],
            [sy, cy, 0.0],
            [0.0, 0.0, 1.0],
        ])
        Rcw = Rwc.T
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rcw
        T[:3, 3] = -Rcw @ c
        poses.append(T.astype(np.float32))
    return poses


def ate_rmse(est: np.ndarray, gt: np.ndarray, align: str = "sim3") -> float:
    """Absolute trajectory error after Sim3 (monocular) or SE3 alignment
    of camera centers — the standard TUM evaluation and the BASELINE
    metric."""
    assert est.shape == gt.shape
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    ec = est - mu_e
    gc = gt - mu_g
    W = gc.T @ ec
    U, D, Vt = np.linalg.svd(W)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if align == "sim3":
        s = np.trace(np.diag(D) @ S) / max((ec ** 2).sum() / len(ec), 1e-12) / len(ec)
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    est_aligned = (s * (R @ est.T)).T + t
    return float(np.sqrt(((est_aligned - gt) ** 2).sum(-1).mean()))
