"""Generate the checked-in mini KITTI-layout fixture dataset.

Renders a short synthetic stereo sequence and writes it in the exact
reference dataset contract (image_2/image_3 %06d.png grayscale, calib.txt
with P0-P3, poses.txt with row-major 3x4 per line — reference:
include/async_image_loader.h:55-66, src/main.cpp:12-35, src/map.cpp:15-43)
so the KITTI loaders, the native prefetcher, and examples/run_kitti.py can
run end-to-end in CI with no external data.

Deterministic: re-running reproduces identical bytes.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
from PIL import Image

from svo_tpu.io.synthetic import (
    SyntheticSequence, make_trajectory, make_world, render_rays,
)

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "tests", "fixtures")
OUT = os.path.join(FIXTURES, "kitti_mini")
N, H, W = 12, 96, 320
FX = 160.0


def main():
    seq = SyntheticSequence(n_frames=N, shape=(H, W), fx=FX, seed=7)
    os.makedirs(os.path.join(OUT, "image_2"), exist_ok=True)
    os.makedirs(os.path.join(OUT, "image_3"), exist_ok=True)
    for i, left, right in seq:
        for sub, img in (("image_2", left), ("image_3", right)):
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8), "L").save(
                os.path.join(OUT, sub, f"{i:06d}.png"), optimize=True
            )

    K = seq.K
    b = seq.baseline
    P2 = np.zeros((3, 4))
    P2[:3, :3] = K
    P3 = P2.copy()
    P3[0, 3] = -K[0, 0] * b  # right camera: P3 = K [I | -b e_x]
    with open(os.path.join(OUT, "calib.txt"), "w") as f:
        for name, P in (("P0", P2), ("P1", P3), ("P2", P2), ("P3", P3)):
            f.write(name + ": " + " ".join(f"{v:.6e}" for v in P.reshape(-1)) + "\n")

    with open(os.path.join(OUT, "poses.txt"), "w") as f:
        for T in seq.gt_poses:
            f.write(" ".join(f"{v:.6e}" for v in T[:3, :4].reshape(-1)) + "\n")

    total = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(OUT) for fn in fns
    )
    print(f"fixture written to {OUT} ({total / 1024:.0f} KiB)")


# --------------------------------------------------------------------------
# EuRoC-mini: synthetic ASL-layout sequence with UNRECTIFIED distorted
# cameras (VERDICT r04 item 6 — exercises sensor.yaml parsing, Bouguet
# rectification and the GT csv end-to-end; BASELINE.json config #4)
# --------------------------------------------------------------------------

EU_OUT = os.path.join(FIXTURES, "euroc_mini")
EU_N, EU_H, EU_W = 40, 192, 320
T0_NS = 1403636579763555584
DT_NS = 50_000_000


def _radtan_distort(xn, D):
    k1, k2, p1, p2 = D[:4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([xd, yd], axis=-1)


def _radtan_undistort(xd, D, iters=10):
    """Fixed-point inverse of _radtan_distort (mild distortion converges
    in a few iterations)."""
    x = xd.copy()
    for _ in range(iters):
        k1, k2, p1, p2 = D[:4]
        r2 = x[..., 0] ** 2 + x[..., 1] ** 2
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        tx = 2 * p1 * x[..., 0] * x[..., 1] + p2 * (r2 + 2 * x[..., 0] ** 2)
        ty = p1 * (r2 + 2 * x[..., 1] ** 2) + 2 * p2 * x[..., 0] * x[..., 1]
        x = np.stack(
            [(xd[..., 0] - tx) / radial, (xd[..., 1] - ty) / radial], axis=-1
        )
    return x


def _euler_R(rx, ry, rz):
    cx_, sx = np.cos(rx), np.sin(rx)
    cy_, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx_, -sx], [0, sx, cx_]])
    Ry = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _render_distorted(planes, T_WS, K, D, shape):
    """Ray-cast a DISTORTED pinhole view: per pixel, normalized distorted
    coords -> iterative undistort -> sensor-frame ray -> world ray."""
    H_, W_ = shape
    us, vs = np.meshgrid(np.arange(W_), np.arange(H_))
    xd = np.stack(
        [(us - K[0, 2]) / K[0, 0], (vs - K[1, 2]) / K[1, 1]], axis=-1
    )
    xn = _radtan_undistort(xd, D)
    dirs_s = np.concatenate([xn, np.ones_like(xn[..., :1])], axis=-1)
    dirs_w = dirs_s @ T_WS[:3, :3].T
    return render_rays(planes, T_WS[:3, 3], dirs_w)


def _write_sensor_yaml(path, K, D, T_BS, shape):
    H_, W_ = shape
    with open(path, "w") as f:
        f.write("sensor_type: camera\n")
        f.write("camera_model: pinhole\n")
        f.write("distortion_model: radial-tangential\n")
        f.write(f"resolution: [{W_}, {H_}]\n")
        f.write(
            "intrinsics: "
            f"[{K[0,0]:.6f}, {K[1,1]:.6f}, {K[0,2]:.6f}, {K[1,2]:.6f}]\n"
        )
        f.write(
            "distortion_coefficients: ["
            + ", ".join(f"{v:.8f}" for v in D) + "]\n"
        )
        f.write("T_BS:\n  cols: 4\n  rows: 4\n  data: ["
                + ", ".join(f"{v:.9f}" for v in T_BS.reshape(-1)) + "]\n")


def _quat_wxyz(R):
    """Rotation matrix -> (w, x, y, z) quaternion (Shepperd)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def main_euroc():
    rng = np.random.default_rng(11)
    planes = make_world(rng, "corridor-narrow")
    T_WB = make_trajectory(EU_N, speed=0.12, kind="wobble")

    # unrectified rig: mild radtan distortion, ~0.25 m baseline mostly
    # along body x, small mounting-rotation differences between cameras
    K0 = np.array([[240.0, 0, EU_W / 2 - 3], [0, 238.0, EU_H / 2 + 2], [0, 0, 1]])
    K1 = np.array([[242.0, 0, EU_W / 2 + 4], [0, 240.5, EU_H / 2 - 1], [0, 0, 1]])
    D0 = np.array([-0.06, 0.012, 1.5e-4, -1e-4])
    D1 = np.array([-0.055, 0.010, -8e-5, 1.2e-4])
    T_BS0 = np.eye(4)
    T_BS0[:3, :3] = _euler_R(0.008, -0.012, 0.004)
    T_BS0[:3, 3] = [0.015, 0.045, 0.0]
    T_BS1 = np.eye(4)
    T_BS1[:3, :3] = _euler_R(0.010, -0.009, 0.001)
    T_BS1[:3, 3] = [0.265, 0.047, 0.002]

    for cam, K, D, T_BS in (("cam0", K0, D0, T_BS0), ("cam1", K1, D1, T_BS1)):
        d = os.path.join(EU_OUT, "mav0", cam, "data")
        os.makedirs(d, exist_ok=True)
        _write_sensor_yaml(
            os.path.join(EU_OUT, "mav0", cam, "sensor.yaml"),
            K, D, T_BS, (EU_H, EU_W),
        )
        for i in range(EU_N):
            T_WS = T_WB[i] @ T_BS
            img = _render_distorted(planes, T_WS, K, D, (EU_H, EU_W))
            ts = T0_NS + i * DT_NS
            Image.fromarray(
                np.clip(img, 0, 255).astype(np.uint8), "L"
            ).save(os.path.join(d, f"{ts}.png"), optimize=True)

    # GT at 2x the frame rate (exercises nearest-timestamp matching)
    gdir = os.path.join(EU_OUT, "mav0", "state_groundtruth_estimate0")
    os.makedirs(gdir, exist_ok=True)
    with open(os.path.join(gdir, "data.csv"), "w") as f:
        f.write("#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
                "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []\n")
        for i in range(2 * EU_N - 1):
            ts = T0_NS + i * (DT_NS // 2)
            lo = min(i // 2, EU_N - 1)
            hi = min(lo + 1, EU_N - 1)
            a = (i % 2) * 0.5
            T = T_WB[lo].copy()
            T[:3, 3] = (1 - a) * T_WB[lo][:3, 3] + a * T_WB[hi][:3, 3]
            q = _quat_wxyz(T[:3, :3])
            f.write(f"{ts}," + ",".join(f"{v:.9f}" for v in T[:3, 3])
                    + "," + ",".join(f"{v:.9f}" for v in q) + "\n")

    total = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(EU_OUT) for fn in fns
    )
    print(f"fixture written to {EU_OUT} ({total / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
    main_euroc()
