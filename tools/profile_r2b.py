"""Round-2 profiling, part B: mapping kernels + extractor variants.

Run on the real chip:  python tools/profile_r2b.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def bench(label, fn, *args, n=5):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:46s} {dt:9.2f} ms   (first {t_first:6.1f} s)", flush=True)
    return dt


def main():
    print(f"platform: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    # ---------- eigh vs closed-form triangulation ----------
    N = 4096
    AtA = rng.normal(size=(N, 4, 4)).astype(np.float32)
    AtA = AtA @ AtA.transpose(0, 2, 1)
    AtA_j = jnp.asarray(AtA)

    f_eigh = jax.jit(lambda a: jnp.linalg.eigh(a)[1][..., :, 0])
    bench("eigh (4096,4,4)", f_eigh, AtA_j)

    def inhom(a):
        # solve A3 x = -a[:, :3, 3] via 3x3 adjugate inverse
        H = a[:, :3, :3]
        b = -a[:, :3, 3]
        c00 = H[:, 1, 1] * H[:, 2, 2] - H[:, 1, 2] * H[:, 2, 1]
        c01 = H[:, 0, 2] * H[:, 2, 1] - H[:, 0, 1] * H[:, 2, 2]
        c02 = H[:, 0, 1] * H[:, 1, 2] - H[:, 0, 2] * H[:, 1, 1]
        c10 = H[:, 1, 2] * H[:, 2, 0] - H[:, 1, 0] * H[:, 2, 2]
        c11 = H[:, 0, 0] * H[:, 2, 2] - H[:, 0, 2] * H[:, 2, 0]
        c12 = H[:, 0, 2] * H[:, 1, 0] - H[:, 0, 0] * H[:, 1, 2]
        c20 = H[:, 1, 0] * H[:, 2, 1] - H[:, 1, 1] * H[:, 2, 0]
        c21 = H[:, 0, 1] * H[:, 2, 0] - H[:, 0, 0] * H[:, 2, 1]
        c22 = H[:, 0, 0] * H[:, 1, 1] - H[:, 0, 1] * H[:, 1, 0]
        det = H[:, 0, 0] * c00 + H[:, 0, 1] * c10 + H[:, 0, 2] * c20
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
        x = jnp.stack([c00 * b[:, 0] + c01 * b[:, 1] + c02 * b[:, 2],
                       c10 * b[:, 0] + c11 * b[:, 1] + c12 * b[:, 2],
                       c20 * b[:, 0] + c21 * b[:, 1] + c22 * b[:, 2]], -1)
        return x * inv_det[:, None]
    f_inhom = jax.jit(inhom)
    bench("inhom 3x3 closed form (4096)", f_inhom, AtA_j)

    # batched 3x3 linalg.solve vs closed form (points_opt inner)
    H3 = AtA[:, :3, :3] + 3 * np.eye(3, dtype=np.float32)
    g3 = rng.normal(size=(N, 3)).astype(np.float32)
    f_solve = jax.jit(lambda h, g: jnp.linalg.solve(h, g[..., None])[..., 0])
    bench("linalg.solve (4096,3,3)", f_solve, jnp.asarray(H3), jnp.asarray(g3))

    # ---------- points_opt at bench shapes ----------
    from orb_slam2_tpu.optim import points_opt
    P, O = 4096, 16384
    pts = rng.normal(size=(P, 3)).astype(np.float32) + np.array([0, 0, 30], np.float32)
    obs_pt = rng.integers(0, P, O).astype(np.int32)
    Tcw = np.tile(np.eye(4, dtype=np.float32), (O, 1, 1))
    Tcw[:, :3, 3] = rng.normal(size=(O, 3)) * 0.1
    uv = rng.uniform(100, 1800, (O, 2)).astype(np.float32)
    isig = np.ones(O, np.float32)
    val = np.ones(O, bool)

    def po():
        return points_opt.optimize_points(
            jnp.asarray(pts), jnp.asarray(obs_pt), jnp.asarray(Tcw),
            jnp.asarray(uv), jnp.asarray(isig), jnp.asarray(val),
            960.0, 960.0, 960.0, 720.0, iters=10)
    bench("points_opt P=4096 O=16384 it=10", po)

    # ---------- full BA at local shapes ----------
    from orb_slam2_tpu.optim import ba
    K = 16
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    obs_kf = rng.integers(0, K, O).astype(np.int32)
    fixed = np.zeros(K, bool); fixed[0] = True

    def fba():
        return ba.bundle_adjust(
            jnp.asarray(poses), jnp.asarray(pts), jnp.asarray(obs_kf),
            jnp.asarray(obs_pt), jnp.asarray(uv), jnp.asarray(isig),
            jnp.asarray(val), jnp.asarray(fixed),
            960.0, 960.0, 960.0, 720.0, iters=10, cg_iters=20)
    bench("bundle_adjust K=16 P=4096 O=16k", fba)

    # ---------- triangulate fused at bench shapes ----------
    from orb_slam2_tpu.pipeline.local_mapping import _triangulate_neighbors_fused
    N1, N2, B = 4000, 4000, 8
    xy1 = jnp.asarray(rng.uniform(0, 1900, (N1, 2)).astype(np.float32))
    d1 = jnp.asarray(rng.integers(0, 2**31, (N1, 8)).astype(np.uint32))
    v1 = jnp.ones(N1, bool)
    o1 = jnp.asarray(rng.integers(0, 8, N1).astype(np.int32))
    a1 = jnp.zeros(N1, jnp.float32)
    T1 = jnp.eye(4)
    xy2 = jnp.asarray(rng.uniform(0, 1900, (B, N2, 2)).astype(np.float32))
    d2 = jnp.asarray(rng.integers(0, 2**31, (B, N2, 8)).astype(np.uint32))
    v2 = jnp.ones((B, N2), bool)
    o2 = jnp.asarray(rng.integers(0, 8, (B, N2)).astype(np.int32))
    a2 = jnp.zeros((B, N2), jnp.float32)
    F12 = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    epi = jnp.zeros((B, 2), jnp.float32)
    T2s = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    o2c = jnp.zeros((B, 3), jnp.float32)
    nbv = jnp.ones(B, bool)
    Km = jnp.asarray(np.array([[960, 0, 960], [0, 960, 720], [0, 0, 1]], np.float32))
    sf = jnp.asarray([1.2**i for i in range(8)], jnp.float32)
    sig2 = sf * sf

    def tri():
        return _triangulate_neighbors_fused(
            xy1, d1, v1, o1, a1, T1, xy2, d2, v2, o2, a2,
            F12, epi, T2s, o2c, nbv, Km, sig2, sf,
            960.0, 960.0, 960.0, 720.0, 1.8)
    bench("triangulate_fused B=8 4000x4000", tri)

    # ---------- fuse stack at bench shapes ----------
    from orb_slam2_tpu.pipeline.local_mapping import _fuse_both_directions
    Pp = 4096
    pos = jnp.asarray(rng.uniform(-10, 10, (Pp, 3)).astype(np.float32)
                      + np.array([0, 0, 30], np.float32))
    nrm = jnp.ones((Pp, 3), jnp.float32) / np.sqrt(3.0)
    mind = jnp.full(Pp, 0.1, jnp.float32)
    maxd = jnp.full(Pp, 100.0, jnp.float32)
    pv = jnp.ones(Pp, bool)
    pd = jnp.asarray(rng.integers(0, 2**31, (Pp, 8)).astype(np.uint32))
    Tb = 24
    Tcw_s = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (Tb, 1, 1)))
    kxy = jnp.asarray(rng.uniform(0, 1900, (Tb, N2, 2)).astype(np.float32))
    koct = jnp.asarray(rng.integers(0, 8, (Tb, N2)).astype(np.int32))
    kdesc = jnp.asarray(rng.integers(0, 2**31, (Tb, N2, 8)).astype(np.uint32))
    kval = jnp.ones((Tb, N2), bool)
    bounds = (0.0, 1920.0, 0.0, 1440.0)

    def fuse():
        return _fuse_both_directions(
            pos, nrm, mind, maxd, pv, pd,
            Tcw_s, kxy, koct, kdesc, kval,
            pos, nrm, mind, maxd, pv, pd,
            jnp.eye(4), kxy[0], koct[0], kdesc[0], kval[0],
            sf, 960.0, 960.0, 960.0, 720.0, bounds, 8,
            float(np.log(1.2)), 3.0, 1.0)
    bench("fuse_both T=24 P=4096 N=4000", fuse)

    # ---------- extractor variant experiments (level0) ----------
    H, W = 1440, 1920
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    img_bf = img.astype(jnp.bfloat16)

    from orb_slam2_tpu.ops import fast
    f_fast32 = jax.jit(lambda x: fast.fast_score_map(x))
    bench("fast_score_map f32", f_fast32, img)
    f_fast16 = jax.jit(lambda x: fast.fast_score_map(x))
    bench("fast_score_map bf16", f_fast16, img_bf)

    # gather variants: patch gather for 1024 kps
    NK = 1024
    ys = jnp.asarray(rng.integers(20, H - 20, NK).astype(np.int32))
    xs = jnp.asarray(rng.integers(20, W - 20, NK).astype(np.int32))
    d = np.arange(-15, 16)
    dy, dx = np.meshgrid(d, d, indexing="ij")
    dyj, dxj = jnp.asarray(dy.astype(np.int32)), jnp.asarray(dx.astype(np.int32))

    def gather_2d(im, y, x):
        yy = jnp.clip(y[:, None, None] + dyj[None], 0, H - 1)
        xx = jnp.clip(x[:, None, None] + dxj[None], 0, W - 1)
        return im[yy, xx]
    bench("patch gather 2d-index (1024,31,31)", jax.jit(gather_2d), img, ys, xs)

    def gather_flat(im, y, x):
        yy = jnp.clip(y[:, None, None] + dyj[None], 0, H - 1)
        xx = jnp.clip(x[:, None, None] + dxj[None], 0, W - 1)
        flat = (yy * W + xx).reshape(NK, -1)
        return jnp.take(im.reshape(-1), flat, axis=0)
    bench("patch gather flat-take (1024,961)", jax.jit(gather_flat), img, ys, xs)

    def gather_rows_onehot(im, y, x):
        # rows via one-hot matmul, then per-row dynamic slice of 31 cols
        oh = jax.nn.one_hot(y[:, None] + dyj[:, 0][None, :], H,
                            dtype=jnp.bfloat16)          # (N, 31, H)
        rows = jnp.einsum("nph,hw->npw", oh, im.astype(jnp.bfloat16))
        # columns gather within rows
        xx = jnp.clip(x[:, None, None] + dxj[None], 0, W - 1)  # (N,31,31)
        return jnp.take_along_axis(rows, xx, axis=2)
    bench("patch rows-onehot+col-take (1024)", jax.jit(gather_rows_onehot),
          img, ys, xs)

    # brief-style 512-point gather
    off = rng.integers(-13, 14, (512, 2)).astype(np.int32)
    offy, offx = jnp.asarray(off[:, 0]), jnp.asarray(off[:, 1])

    def brief_gather(im, y, x):
        yy = jnp.clip(y[:, None] + offy[None, :], 0, H - 1)
        xx = jnp.clip(x[:, None] + offx[None, :], 0, W - 1)
        flat = yy * W + xx
        return jnp.take(im.reshape(-1), flat, axis=0)
    bench("brief flat-take (1024,512)", jax.jit(brief_gather), img, ys, xs)

    def brief_from_patch(im, y, x):
        patch = gather_flat(im, y, x)  # (N, 961)
        # rotated offsets simulated as random per-kp indices into patch
        idx = jnp.asarray(rng.integers(0, 961, (NK, 512)).astype(np.int32))
        return jnp.take_along_axis(patch, idx, axis=1)
    bench("brief via patch+take_along (1024,512)",
          jax.jit(brief_from_patch), img, ys, xs)

    # integral-image moments for ic_angle
    def ic_integral(im, y, x):
        S = jnp.cumsum(im, axis=1)  # (H, W) row prefix sums
        Sx = jnp.cumsum(im * jnp.arange(W, dtype=im.dtype)[None, :], axis=1)
        # circular mask row half-widths for r=15
        hw = np.floor(np.sqrt(np.maximum(15**2 - d**2, 0))).astype(np.int32)
        m01 = jnp.zeros(NK, jnp.float32)
        m10 = jnp.zeros(NK, jnp.float32)
        Sp = jnp.pad(S, ((0, 0), (1, 0)))
        Sxp = jnp.pad(Sx, ((0, 0), (1, 0)))
        for i, ddy in enumerate(d):
            w_ = int(hw[i])
            yy = jnp.clip(y + ddy, 0, H - 1)
            x0 = jnp.clip(x - w_, 0, W - 1)
            x1 = jnp.clip(x + w_ + 1, 0, W)
            rs = Sp[yy, x1] - Sp[yy, x0]
            rsx = Sxp[yy, x1] - Sxp[yy, x0]
            m01 = m01 + float(ddy) * rs
            m10 = m10 + (rsx - x.astype(jnp.float32) * rs)
        return jnp.arctan2(m01, m10)
    bench("ic_angle integral-image (1024)", jax.jit(ic_integral), img, ys, xs)

    from orb_slam2_tpu.ops import orientation
    bench("ic_angle gather (1024)", jax.jit(orientation.ic_angle), img, ys, xs)


if __name__ == "__main__":
    main()
