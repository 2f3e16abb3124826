"""Unit tests for the ORB feature pipeline against OpenCV oracles."""
import numpy as np
import pytest

import jax.numpy as jnp

from orb_slam2_tpu.ops import pyramid, fast, distribute, orientation, brief, extractor

cv2 = pytest.importorskip("cv2")


def synth_image(h=240, w=320, seed=0):
    """Blobby random texture with real corners."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    img = np.clip(img, 0, 255)
    return img.astype(np.float32)


class TestFast:
    def test_matches_opencv_fast(self):
        img = synth_image()
        u8 = img.astype(np.uint8)
        det = cv2.FastFeatureDetector_create(
            threshold=20, nonmaxSuppression=True,
            type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16)
        kps = det.detect(u8, None)
        ref = {(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps
               if 16 <= k.pt[0] < img.shape[1] - 16 and 16 <= k.pt[1] < img.shape[0] - 16}

        keep, score = fast.detect(jnp.asarray(u8.astype(np.float32)), th_hi=20.0, th_lo=20.0)
        ours = {tuple(p) for p in np.argwhere(np.asarray(keep))}
        assert len(ref) > 30
        # allow 1-px slop for NMS tie-breaking differences
        def near(p, S):
            return any((p[0] + dy, p[1] + dx) in S for dy in (-1, 0, 1) for dx in (-1, 0, 1))
        recall = sum(near(p, ours) for p in ref) / len(ref)
        precision = sum(near(p, ref) for p in ours) / max(len(ours), 1)
        assert recall > 0.85, f"recall {recall}"
        assert precision > 0.85, f"precision {precision}"

    def test_score_is_max_threshold(self):
        img = synth_image(seed=1)
        score = np.asarray(fast.fast_score_map(jnp.asarray(img)))
        u8 = img.astype(np.uint8)
        # pick some strong corners and verify the threshold semantics
        det_lo = cv2.FastFeatureDetector_create(threshold=10, nonmaxSuppression=False,
                                                type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16)
        pts = {(int(k.pt[1]), int(k.pt[0])) for k in det_lo.detect(u8, None)}
        score_u8 = np.asarray(fast.fast_score_map(jnp.asarray(u8.astype(np.float32))))
        hits = sum(score_u8[y, x] > 10 for (y, x) in pts)
        assert hits / max(len(pts), 1) > 0.95

    def test_dual_threshold_fallback(self):
        # weak-texture image: th=20 finds little, fallback th=7 fires
        img = synth_image(120, 120, seed=0) * 0.12 + 90.0
        keep_hi, _ = fast.detect(jnp.asarray(img), th_hi=20.0, th_lo=20.0)
        keep_fb, _ = fast.detect(jnp.asarray(img), th_hi=20.0, th_lo=7.0)
        assert np.asarray(keep_fb).sum() > np.asarray(keep_hi).sum()


class TestDistribute:
    def test_budget_and_spread(self):
        img = synth_image(seed=3)
        keep, score = fast.detect(jnp.asarray(img))
        n = 200
        ys, xs, resp, valid = distribute.grid_topk(keep, score, n)
        ys, xs, valid = np.asarray(ys), np.asarray(xs), np.asarray(valid)
        assert valid.sum() <= n
        assert valid.sum() > 50
        sel = list(zip(ys[valid], xs[valid]))
        assert len(set(sel)) == len(sel)  # no duplicates
        # spread: selected corners occupy at least 25% of 40px cells that
        # contain any corner at all
        all_c = np.argwhere(np.asarray(keep))
        cells_all = {(y // 40, x // 40) for y, x in all_c}
        cells_sel = {(y // 40, x // 40) for y, x in sel}
        assert len(cells_sel) / len(cells_all) > 0.5

    def test_priority_prefers_best_per_cell(self):
        score = np.zeros((64, 64), np.float32)
        mask = np.zeros((64, 64), bool)
        # two corners in one cell, one in another
        for (y, x, s) in [(10, 10, 50.0), (12, 12, 40.0), (40, 40, 10.0)]:
            score[y, x] = s
            mask[y, x] = True
        ys, xs, resp, valid = distribute.grid_topk(
            jnp.asarray(mask), jnp.asarray(score), 2, cell=32)
        got = set(zip(np.asarray(ys)[np.asarray(valid)], np.asarray(xs)[np.asarray(valid)]))
        # round-robin: best of each cell, NOT the two in the same cell
        assert got == {(10, 10), (40, 40)}


class TestOrientation:
    def test_gradient_image_angle(self):
        # intensity ramp along +x -> centroid to the right -> angle ~ 0
        img = np.tile(np.arange(64, dtype=np.float32)[None, :] * 2, (64, 1))
        ang = np.asarray(orientation.ic_angle(
            jnp.asarray(img), jnp.asarray([32]), jnp.asarray([32])))
        assert abs(ang[0]) < 0.05
        # ramp along +y -> angle ~ pi/2
        ang2 = np.asarray(orientation.ic_angle(
            jnp.asarray(img.T.copy()), jnp.asarray([32]), jnp.asarray([32])))
        assert abs(ang2[0] - np.pi / 2) < 0.05

    def test_rotation_equivariance(self):
        img = synth_image(128, 128, seed=4)
        rot = cv2.rotate(img, cv2.ROTATE_90_COUNTERCLOCKWISE)
        # a point at (y, x) maps to (W-1-x, y) under 90 deg CCW rotation
        pts = [(40, 60), (70, 50), (90, 90)]
        for (y, x) in pts:
            a0 = float(orientation.ic_angle(jnp.asarray(img), jnp.asarray([y]), jnp.asarray([x]))[0])
            y2, x2 = 127 - x, y
            a1 = float(orientation.ic_angle(jnp.asarray(rot), jnp.asarray([y2]), jnp.asarray([x2]))[0])
            # image-coords rotation by 90 CCW shifts angle by -pi/2
            d = (a1 - a0 + np.pi / 2 + np.pi) % (2 * np.pi) - np.pi
            assert abs(d) < 0.2, (y, x, a0, a1)


def hamming(d1, d2):
    x = np.bitwise_xor(d1, d2)
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


class TestBrief:
    def test_self_distance_zero_random_far(self):
        img = synth_image(160, 160, seed=5)
        blur = pyramid.gaussian_blur_7x7(jnp.asarray(img))
        ys = jnp.asarray([40, 60, 80, 100])
        xs = jnp.asarray([50, 70, 90, 110])
        ang = orientation.ic_angle(jnp.asarray(img), ys, xs)
        d = np.asarray(brief.compute_descriptors(blur, ys, xs, ang))
        assert hamming(d[0], d[0]) == 0
        off = [hamming(d[i], d[j]) for i in range(4) for j in range(i + 1, 4)]
        assert min(off) > 40  # distinct patches are far apart

    def test_rotation_invariance(self):
        img = synth_image(200, 200, seed=6)
        M = cv2.getRotationMatrix2D((100, 100), 30, 1.0)
        rot = cv2.warpAffine(img, M, (200, 200), flags=cv2.INTER_LINEAR)
        pts = np.array([[60, 60], [120, 80], [80, 130], [130, 130]], np.float32)
        ones = np.ones((len(pts), 1), np.float32)
        pts_rot = (M @ np.hstack([pts, ones]).T).T  # (x, y)

        blur1 = pyramid.gaussian_blur_7x7(jnp.asarray(img))
        blur2 = pyramid.gaussian_blur_7x7(jnp.asarray(rot))
        ys1, xs1 = jnp.asarray(pts[:, 1].astype(np.int32)), jnp.asarray(pts[:, 0].astype(np.int32))
        ys2 = jnp.asarray(np.round(pts_rot[:, 1]).astype(np.int32))
        xs2 = jnp.asarray(np.round(pts_rot[:, 0]).astype(np.int32))
        a1 = orientation.ic_angle(jnp.asarray(img), ys1, xs1)
        a2 = orientation.ic_angle(jnp.asarray(rot), ys2, xs2)
        d1 = np.asarray(brief.compute_descriptors(blur1, ys1, xs1, a1))
        d2 = np.asarray(brief.compute_descriptors(blur2, ys2, xs2, a2))
        matched = np.array([hamming(d1[i], d2[i]) for i in range(len(pts))])
        # cross distances as the null distribution
        null = np.array([hamming(d1[i], d2[j]) for i in range(len(pts))
                         for j in range(len(pts)) if i != j])
        assert matched.mean() < 60, matched
        assert matched.mean() < null.mean() - 40


class TestExtractor:
    def test_end_to_end(self):
        img = synth_image(480, 640, seed=7)
        params = extractor.OrbParams(n_features=500, n_levels=4)
        run = extractor.make_extractor(480, 640, params)
        feats = run(jnp.asarray(img))
        # SoA height pads to the next multiple of 128 (Pallas search
        # kernel tiling); extra rows are valid=False
        assert feats.xy.shape == (512, 2)
        assert feats.desc.shape == (512, 8)
        assert not np.asarray(feats.valid)[500:].any()
        v = np.asarray(feats.valid)
        assert v.sum() > 300, f"only {v.sum()} valid"
        xy = np.asarray(feats.xy)[v]
        assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 640 * 1.01).all()
        assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 480 * 1.01).all()
        octaves = np.asarray(feats.octave)[v]
        assert octaves.min() == 0 and octaves.max() >= 1

    def test_budget_allocation(self):
        b = extractor.features_per_level(1000, 8, 1.2)
        assert sum(b) == 1000
        assert b[0] > b[1] > b[-2]
