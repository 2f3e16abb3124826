"""Geometric tests for the Sim3-projection search ops used by loop
closing (matching/search.py: search_by_projection_sim3, search_by_sim3)."""
import numpy as np
import jax.numpy as jnp

from orb_slam2_tpu.geom import sim3 as sim3_mod, se3
from orb_slam2_tpu.matching import search

FX = FY = 450.0
CX, CY = 320.0, 240.0
BOUNDS = (0.0, 640.0, 0.0, 480.0)
N_LEVELS = 4
SCALES = (1.2 ** np.arange(N_LEVELS)).astype(np.float32)
LOG_SCALE = float(np.log(1.2))


def _project(pc):
    return np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                     FY * pc[:, 1] / pc[:, 2] + CY], -1).astype(np.float32)


def _rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint64).astype(np.uint32)


def test_search_by_projection_sim3_finds_points():
    rng = np.random.default_rng(0)
    n = 60
    pts_w = rng.uniform([-3, -3, 6], [3, 3, 10], (n, 3)).astype(np.float32)
    Scw = np.asarray(sim3_mod.identity())  # camera at origin, s=1
    uv = _project(pts_w)
    desc = _rand_desc(rng, n)
    # keypoints: same pixels, same descriptors, octave 0
    dist = np.linalg.norm(pts_w, axis=-1)
    normals = pts_w / dist[:, None]
    max_dist = (dist * 1.1).astype(np.float32)

    res = search.search_by_projection_sim3(
        jnp.asarray(pts_w), jnp.asarray(desc), jnp.asarray(normals),
        jnp.asarray(max_dist), jnp.asarray(np.ones(n, bool)),
        jnp.asarray(Scw),
        jnp.asarray(uv), jnp.asarray(np.zeros(n, np.int32)),
        jnp.asarray(desc), jnp.asarray(np.ones(n, bool)),
        jnp.asarray(np.zeros(n, bool)),
        jnp.asarray(SCALES), FX, FY, CX, CY, BOUNDS, N_LEVELS, LOG_SCALE,
        th=7.5)
    valid = np.asarray(res.valid)
    idx = np.asarray(res.idx)
    in_img = ((uv[:, 0] >= 0) & (uv[:, 0] < 640)
              & (uv[:, 1] >= 0) & (uv[:, 1] < 480))
    assert valid[in_img].mean() > 0.9
    assert (idx[valid & in_img] == np.where(valid & in_img)[0]).all()


def test_search_by_sim3_bidirectional_agreement():
    rng = np.random.default_rng(1)
    n = 50
    # ground-truth S12 between the two camera frames
    R = np.asarray(se3.so3_exp(jnp.asarray([0.05, -0.02, 0.1], jnp.float32)))
    S12 = np.asarray(sim3_mod.make(jnp.asarray(R),
                                   jnp.asarray([0.2, 0.1, -0.1], jnp.float32),
                                   jnp.float32(1.05)))
    pc2 = rng.uniform([-2, -2, 5], [2, 2, 9], (n, 3)).astype(np.float32)
    pc1 = np.asarray(sim3_mod.apply(jnp.asarray(S12)[None],
                                    jnp.asarray(pc2)[None])[0])
    uv1 = _project(pc1)
    uv2 = _project(pc2)
    desc = _rand_desc(rng, n)
    # the scale-band and predicted-level checks run in the destination
    # camera frame (src/ORBmatcher.cc:1447-1475): with octave-0 test
    # keypoints the predicted level must stay <= 1 in BOTH directions,
    # which bounds the usable Sim3 scale and max-dist slack
    md1 = (np.linalg.norm(pc1, axis=-1) * 1.1).astype(np.float32)
    md2 = (np.linalg.norm(pc2, axis=-1) * 1.1).astype(np.float32)
    ones = np.ones(n, bool)
    zeros_oct = np.zeros(n, np.int32)

    res = search.search_by_sim3(
        jnp.asarray(pc1), jnp.asarray(desc), jnp.asarray(ones),
        jnp.asarray(md1), jnp.asarray(uv1), jnp.asarray(zeros_oct),
        jnp.asarray(ones),
        jnp.asarray(pc2), jnp.asarray(desc), jnp.asarray(ones),
        jnp.asarray(md2), jnp.asarray(uv2), jnp.asarray(zeros_oct),
        jnp.asarray(ones),
        jnp.asarray(S12), jnp.asarray(SCALES),
        FX, FY, CX, CY, BOUNDS, N_LEVELS, LOG_SCALE, th=7.5)
    valid = np.asarray(res.valid)
    idx = np.asarray(res.idx)
    in1 = ((uv1[:, 0] >= 0) & (uv1[:, 0] < 640)
           & (uv1[:, 1] >= 0) & (uv1[:, 1] < 480))
    in2 = ((uv2[:, 0] >= 0) & (uv2[:, 0] < 640)
           & (uv2[:, 1] >= 0) & (uv2[:, 1] < 480))
    vis = in1 & in2
    assert valid[vis].mean() > 0.85
    assert (idx[valid & vis] == np.where(valid & vis)[0]).all()


def test_search_by_sim3_wrong_transform_no_matches():
    rng = np.random.default_rng(2)
    n = 50
    pc2 = rng.uniform([-2, -2, 5], [2, 2, 9], (n, 3)).astype(np.float32)
    pc1 = rng.uniform([-2, -2, 5], [2, 2, 9], (n, 3)).astype(np.float32)
    uv1 = _project(pc1)
    uv2 = _project(pc2)
    d1 = _rand_desc(rng, n)
    d2 = _rand_desc(rng, n)
    md = np.full(n, 20.0, np.float32)
    ones = np.ones(n, bool)
    zeros_oct = np.zeros(n, np.int32)
    res = search.search_by_sim3(
        jnp.asarray(pc1), jnp.asarray(d1), jnp.asarray(ones),
        jnp.asarray(md), jnp.asarray(uv1), jnp.asarray(zeros_oct),
        jnp.asarray(ones),
        jnp.asarray(pc2), jnp.asarray(d2), jnp.asarray(ones),
        jnp.asarray(md), jnp.asarray(uv2), jnp.asarray(zeros_oct),
        jnp.asarray(ones),
        jnp.asarray(np.asarray(sim3_mod.identity())), jnp.asarray(SCALES),
        FX, FY, CX, CY, BOUNDS, N_LEVELS, LOG_SCALE, th=7.5)
    # random descriptors + random geometry: essentially nothing survives
    assert np.asarray(res.valid).sum() < 5
