"""Metrics, checkpoint/resume, and viz dump tests."""

import json

import numpy as np

from svo_tpu.config import Config
from svo_tpu.geometry import camera as cam_mod
from svo_tpu.io.synthetic import SyntheticSequence
from svo_tpu.pipeline.odometry import StereoVO
from svo_tpu.utils import checkpoint, metrics
from svo_tpu.viz import dump


def _small_run(n=8):
    seq = SyntheticSequence(n_frames=n, shape=(184, 320), fx=200.0, speed=0.25)
    cfg = Config(use_orb=False, image_height=184, image_width=320)
    camera = cam_mod.from_intrinsics(
        seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2], seq.baseline
    )
    vo = StereoVO(cfg, camera)
    res = vo.run(list(seq))
    return seq, cfg, camera, vo, res


def test_metrics_jsonl_and_summary(tmp_path):
    _, _, _, _, res = _small_run()
    p = tmp_path / "frames.jsonl"
    metrics.write_frame_records(str(p), res)
    rows = [json.loads(l) for l in p.read_text().splitlines()]
    assert len(rows) == res.n_frames
    assert rows[0]["is_keyframe"] is True
    s = metrics.summarize(res)
    assert s["frames"] == res.n_frames
    assert s["peak_rss_mb"] > 10


def test_stage_timer():
    t = metrics.StageTimer()
    with t.time("a"):
        pass
    with t.time("a"):
        pass
    s = t.summary()
    assert s["a"]["n"] == 2


def test_checkpoint_resume(tmp_path):
    """Save mid-run, resume, and verify identical continuation."""
    seq, cfg, camera, vo, _ = _small_run(n=10)
    frames = list(seq)

    vo1 = StereoVO(cfg, camera)
    vo1.start(frames[0][1], frames[0][2])
    for _, l, r in frames[1:5]:
        vo1.process(l, r)
    ckpt = tmp_path / "state.npz"
    checkpoint.save_state(str(ckpt), vo1.state)
    for _, l, r in frames[5:]:
        vo1.process(l, r)
    poses_full = np.asarray(vo1.state.poses[:10])

    vo2 = StereoVO(cfg, camera)
    vo2.start(frames[0][1], frames[0][2])  # builds the pytree structure
    vo2.state = checkpoint.load_state(str(ckpt), vo2.state)
    for _, l, r in frames[5:]:
        vo2.process(l, r)
    poses_resumed = np.asarray(vo2.state.poses[:10])
    np.testing.assert_allclose(poses_resumed, poses_full, atol=1e-5)


def test_dump_artifacts(tmp_path):
    seq, _, _, _, res = _small_run()
    traj = tmp_path / "traj.txt"
    dump.save_trajectory_kitti(str(traj), res.poses)
    loaded = np.loadtxt(traj)
    assert loaded.shape == (res.n_frames, 12)
    np.testing.assert_allclose(
        loaded[0].reshape(3, 4), res.poses[0][:3], rtol=1e-6
    )

    ply = tmp_path / "map.ply"
    dump.save_ply(str(ply), res.map_points)
    text = ply.read_text().splitlines()
    assert text[0] == "ply"
    assert int(text[2].split()[-1]) == len(res.map_points)

    png = tmp_path / "traj.png"
    dump.plot_trajectory(str(png), res.poses, seq.gt_poses)
    assert png.stat().st_size > 1000
