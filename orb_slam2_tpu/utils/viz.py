"""Offline visualization — the TPU-world replacement for the Pangolin
viewer stack (src/Viewer.cc, src/FrameDrawer.cc, src/MapDrawer.cc).

The reference renders a live OpenGL GUI; a headless TPU pod has no
display, so the same observability surface is produced as image files /
matplotlib figures:

- :func:`draw_frame`   — FrameDrawer::DrawFrame (src/FrameDrawer.cc:51-248):
  the current image with tracked keypoints in green, untracked in red,
  and the KFs/MPs/matches status text bar.
- :func:`draw_map`     — MapDrawer::DrawMapPoints/DrawKeyFrames
  (src/MapDrawer.cc:50-235): map points (local black / global red in the
  reference; here colored by class), keyframe frusta, covisibility
  edges (weight >= 100) and the spanning tree.
- :func:`resize_without_moire` — the fork's multi-step downscale
  (FrameDrawer::ResizeWithoutMoirePattern, src/FrameDrawer.cc:291,
  validated by Examples/Monocular/moire.py).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def resize_without_moire(img: np.ndarray, target_w: int,
                         target_h: int) -> np.ndarray:
    """Multi-step halving before the final resize so high-frequency
    texture doesn't alias into moire bands (src/FrameDrawer.cc:291)."""
    out = np.asarray(img, np.float32)
    while out.shape[1] >= 2 * target_w and out.shape[0] >= 2 * target_h:
        h2, w2 = out.shape[0] // 2, out.shape[1] // 2
        out = 0.25 * (out[0:2*h2:2, 0:2*w2:2] + out[1:2*h2:2, 0:2*w2:2]
                      + out[0:2*h2:2, 1:2*w2:2] + out[1:2*h2:2, 1:2*w2:2])
    # final bilinear-ish step via index mapping
    ys = np.linspace(0, out.shape[0] - 1, target_h)
    xs = np.linspace(0, out.shape[1] - 1, target_w)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, out.shape[0] - 1)
    x1 = np.minimum(x0 + 1, out.shape[1] - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    return ((1 - wy) * (1 - wx) * out[np.ix_(y0, x0)]
            + (1 - wy) * wx * out[np.ix_(y0, x1)]
            + wy * (1 - wx) * out[np.ix_(y1, x0)]
            + wy * wx * out[np.ix_(y1, x1)])


def _draw_cross(rgb: np.ndarray, x: int, y: int, color, r: int = 3):
    h, w = rgb.shape[:2]
    x0, x1 = max(x - r, 0), min(x + r + 1, w)
    y0, y1 = max(y - r, 0), min(y + r + 1, h)
    rgb[y, x0:x1] = color
    rgb[y0:y1, x] = color


def draw_frame(image: np.ndarray, frame, store=None,
               path: Optional[str] = None) -> np.ndarray:
    """Render the FrameDrawer overlay into an RGB array (and optionally
    a PNG): green = tracked keypoint (bound to a live map point),
    red = detected but unmatched (src/FrameDrawer.cc:96-180)."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        rgb = np.stack([img] * 3, -1)
    else:
        rgb = img[..., :3].copy()
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    h, w = rgb.shape[:2]
    green = np.array([0, 255, 0], np.uint8)
    red = np.array([255, 0, 0], np.uint8)
    n_tracked = 0
    for i in np.where(frame.valid)[0]:
        x, y = int(frame.xy_raw[i, 0]), int(frame.xy_raw[i, 1])
        if not (0 <= x < w and 0 <= y < h):
            continue
        pid = frame.mp_ids[i]
        ok = pid >= 0 and not frame.mp_outlier[i] and (
            store is None or store.mp_valid[pid])
        if ok:
            _draw_cross(rgb, x, y, green)
            n_tracked += 1
        else:
            _draw_cross(rgb, x, y, red, r=1)
    if path is not None:
        _save_png(path, rgb, title=(
            f"KFs: {store.n_valid_keyframes() if store else '?'}  "
            f"MPs: {store.n_valid_points() if store else '?'}  "
            f"Matches: {n_tracked}"))
    return rgb


def _save_png(path: str, rgb: np.ndarray, title: str = ""):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(rgb.shape[1] / 100, rgb.shape[0] / 100),
                           dpi=100)
    ax.imshow(rgb)
    if title:
        ax.set_title(title, fontsize=8)
    ax.axis("off")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def _frustum_lines(Tcw: np.ndarray, scale: float = 0.3):
    """Camera frustum wireframe in world coords (MapDrawer::DrawKeyFrames
    glVertex pattern, src/MapDrawer.cc:94-150)."""
    w, h, z = 0.5 * scale, 0.3 * scale, 0.4 * scale
    corners = np.array([[0, 0, 0], [w, h, z], [-w, h, z],
                        [-w, -h, z], [w, -h, z]])
    Twc = np.linalg.inv(Tcw)
    pts = corners @ Twc[:3, :3].T + Twc[:3, 3]
    idx = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    return [(pts[i], pts[j]) for i, j in idx]


def draw_map(store, path: Optional[str] = None, show_graph: bool = True,
             covis_weight: int = 100, elev: float = -70.0,
             azim: float = -90.0):
    """3D map rendering: points, keyframe frusta, covisibility graph
    (weight >= 100) and spanning tree (src/MapDrawer.cc:50-235)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(projection="3d")

    pts = [p for p, v in zip(store.mp_pos, store.mp_valid) if v]
    if pts:
        P = np.stack(pts)
        ax.scatter(P[:, 0], P[:, 1], P[:, 2], s=0.5, c="k", alpha=0.5)

    for kf in store.kfs:
        if not kf.valid:
            continue
        for a, b in _frustum_lines(kf.Tcw):
            ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]],
                    c="b", lw=0.5)
    if show_graph:
        centers = {kf.kid: -kf.Tcw[:3, :3].T @ kf.Tcw[:3, 3]
                   for kf in store.kfs if kf.valid}
        drawn = set()
        for kid, c in centers.items():
            # covisibility edges >= weight threshold
            for other, wgt in store.covis[kid].items():
                key = (min(kid, other), max(kid, other))
                if wgt >= covis_weight and other in centers \
                        and key not in drawn:
                    drawn.add(key)
                    o = centers[other]
                    ax.plot([c[0], o[0]], [c[1], o[1]], [c[2], o[2]],
                            c="g", lw=0.4, alpha=0.7)
            # spanning tree
            parent = store.kfs[kid].parent
            if parent >= 0 and parent in centers:
                o = centers[parent]
                ax.plot([c[0], o[0]], [c[1], o[1]], [c[2], o[2]],
                        c="g", lw=0.8)
            # loop edges
            for le in store.kfs[kid].loop_edges:
                if le in centers:
                    o = centers[le]
                    ax.plot([c[0], o[0]], [c[1], o[1]], [c[2], o[2]],
                            c="r", lw=1.0)
    ax.view_init(elev=elev, azim=azim)
    ax.set_box_aspect((1, 1, 0.5))
    if path is not None:
        fig.savefig(path, bbox_inches="tight", dpi=110)
        plt.close(fig)
        return None
    return fig
