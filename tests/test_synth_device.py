"""Device-side synthetic renderer vs the cv2 host renderer.

The benchmark pre-stages its frame sequence in device HBM by rendering
ON DEVICE (synth.render_sequence_device) instead of uploading 2.7 MB
per frame through the TPU tunnel; this test pins the two paths to
within 2 gray levels (bilinear warp + uint8 texture quantization).
"""
import numpy as np

from orb_slam2_tpu.geom.camera import Intrinsics
from orb_slam2_tpu.utils import synth


def test_device_render_matches_cv2():
    cam = Intrinsics(fx=300.0, fy=300.0, cx=160.0, cy=120.0,
                     width=320, height=240)
    world = synth.make_world(seed=3, tex_size=1024, scale=40.0)
    poses = synth.aerial_trajectory(3, height=10.0, speed=0.5)
    host = [np.clip(synth.render(world, cam, T), 0, 255).astype(np.uint8)
            for T in poses]
    dev = [np.asarray(f) for f in
           synth.render_sequence_device(world, cam, poses)]
    for a, b in zip(host, dev):
        assert b.dtype == np.uint8
        assert b.shape == (cam.height, cam.width)
        d = np.abs(a.astype(np.int16) - b.astype(np.int16))
        # uint8 texture quantization (device path) + fixed-point cv2
        # interpolation (host path) each contribute <1 level
        assert d.max() <= 2
        assert (d > 1).mean() < 0.01
