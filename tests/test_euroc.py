"""EuRoC support tests: rectification geometry invariants + ASL reading."""

import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from svo_tpu.io import euroc


def synthetic_rig():
    """Unrectified stereo pair: cam1 to the right of cam0 with a small
    relative rotation, mild radtan distortion."""
    K0 = np.array([[460.0, 0, 370], [0, 458.0, 240], [0, 0, 1.0]])
    K1 = np.array([[457.0, 0, 375], [0, 455.5, 238], [0, 0, 1.0]])
    D0 = np.array([-0.28, 0.07, 1e-4, 1.7e-5])
    D1 = np.array([-0.28, 0.07, -1e-5, 3e-5])
    # sensor-in-body transforms
    T_BS0 = np.eye(4)
    T_BS0[:3, :3] = Rotation.from_euler("xyz", [0.01, -0.02, 0.005]).as_matrix()
    T_BS0[:3, 3] = [0.01, 0.05, 0.0]
    T_BS1 = np.eye(4)
    T_BS1[:3, :3] = Rotation.from_euler("xyz", [0.012, -0.018, 0.002]).as_matrix()
    T_BS1[:3, 3] = [0.12, 0.051, 0.001]  # ~11cm baseline mostly along body x
    cam0 = euroc.PinholeRadtan(K0, D0, T_BS0, (480, 752))
    cam1 = euroc.PinholeRadtan(K1, D1, T_BS1, (480, 752))
    return cam0, cam1


def test_rectification_epipolar_alignment(rng):
    cam0, cam1 = synthetic_rig()
    rect = euroc.StereoRectifier(cam0, cam1)
    T_10 = np.linalg.inv(cam1.T_BS) @ cam0.T_BS

    # random 3D points in front of cam0
    X0 = np.stack(
        [rng.uniform(-2, 2, 100), rng.uniform(-1, 1, 100), rng.uniform(3, 15, 100)],
        -1,
    )
    X1 = X0 @ T_10[:3, :3].T + T_10[:3, 3]

    # project into the rectified views
    Xr0 = X0 @ rect.R_rect0.T
    Xr1 = X1 @ rect.R_rect1.T
    uv0 = (Xr0 @ rect.K_new.T)
    uv0 = uv0[:, :2] / uv0[:, 2:3]
    uv1 = (Xr1 @ rect.K_new.T)
    uv1 = uv1[:, :2] / uv1[:, 2:3]

    # rows align (epipolar horizontal)
    assert np.abs(uv0[:, 1] - uv1[:, 1]).max() < 1e-6
    # disparity = f b / z, positive (cam1 right of cam0)
    disp = uv0[:, 0] - uv1[:, 0]
    z = Xr0[:, 2]
    np.testing.assert_allclose(
        disp, rect.K_new[0, 0] * rect.baseline / z, rtol=1e-6
    )
    assert (disp > 0).all()
    # rectified depth must equal geometric depth up to rotation (same norm)
    np.testing.assert_allclose(
        np.linalg.norm(Xr0, axis=1), np.linalg.norm(X0, axis=1), rtol=1e-9
    )


def test_remap_identity_when_no_distortion():
    """Zero distortion + identity extrinsic rotation: the rectified image of
    a smooth gradient equals a projective resampling; check center region
    consistency via the sampling map round trip."""
    cam0, cam1 = synthetic_rig()
    cam0.D[:] = 0
    cam1.D[:] = 0
    rect = euroc.StereoRectifier(cam0, cam1)
    m = rect.map0
    H, W = rect.size
    # maps must be finite and mostly inside the source image
    assert np.isfinite(m).all()
    inside = (
        (m[..., 0] > 0) & (m[..., 0] < H - 1) & (m[..., 1] > 0) & (m[..., 1] < W - 1)
    )
    assert inside.mean() > 0.5


def test_remap_bilinear(rng):
    img = rng.uniform(0, 255, (40, 60)).astype(np.float32)
    m = np.zeros((40, 60, 2), np.float32)
    v, u = np.meshgrid(np.arange(40), np.arange(60), indexing="ij")
    m[..., 0] = v
    m[..., 1] = u
    out = euroc.StereoRectifier._remap(img, m)
    np.testing.assert_allclose(out[:39, :59], img[:39, :59], atol=1e-3)
    # half-pixel shift averages neighbors
    m[..., 1] = u + 0.5
    out = euroc.StereoRectifier._remap(img, m)
    expect = 0.5 * (img[:, :-1] + img[:, 1:])
    # last row/col excluded: border clamp blends them
    np.testing.assert_allclose(out[:39, :58], expect[:39, :58], atol=1e-3)


def test_asl_sequence_reading(tmp_path, rng):
    """Minimal fake ASL tree end-to-end through EurocSequence."""
    from PIL import Image

    root = tmp_path
    for cam, fu in (("cam0", 460.0), ("cam1", 457.0)):
        d = root / "mav0" / cam / "data"
        d.mkdir(parents=True)
        T = np.eye(4)
        if cam == "cam1":
            T[:3, 3] = [0.11, 0, 0]
        sensor = {
            "T_BS": {"data": [float(x) for x in T.reshape(-1)]},
            "intrinsics": [fu, fu, 30.0, 24.0],
            "distortion_coefficients": [0.0, 0.0, 0.0, 0.0],
            "resolution": [60, 48],
        }
        import yaml as _yaml

        (root / "mav0" / cam / "sensor.yaml").write_text(_yaml.dump(sensor))
        for ts in (1000, 2000, 3000):
            arr = rng.integers(0, 255, (48, 60)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{ts}.png")

    gt_dir = root / "mav0" / "state_groundtruth_estimate0"
    gt_dir.mkdir(parents=True)
    rows = ["#ts,px,py,pz,qw,qx,qy,qz,extra"]
    for i, ts in enumerate((900, 1900, 2900, 3900)):
        rows.append(f"{ts},{0.1*i},0,0,1,0,0,0,0")
    (gt_dir / "data.csv").write_text("\n".join(rows))

    seq = euroc.EurocSequence(str(root))
    frames = list(seq)
    assert len(frames) == 3
    assert frames[0][1].shape == (48, 60)
    cam = seq.camera
    assert abs(float(cam.baseline) - 0.11) < 1e-6
    gt = seq.gt_cam_poses()
    assert gt.shape == (3, 4, 4)
    assert np.isfinite(gt).all()
