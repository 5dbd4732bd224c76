"""Config system tests: reference OpenCV-YAML compatibility
(reference: include/config_reader.h:47-87, configs/config.yaml)."""

import textwrap

from svo_tpu.config import Config, load_config


REFERENCE_YAML = textwrap.dedent(
    """\
    %YAML:1.0
    path: "./datasets/kitti/data_odometry_color/dataset/sequences/00/"
    gt_path: "./datasets/kitti/data_odometry_poses/dataset/poses/00.txt"
    calib_path: "./datasets/kitti/data_calib/sequences/00/calib.txt"
    start_frame: 0
    end_frame: 4540
    show_gt: 1
    fx: 718.8560
    fy: 718.8560
    cx: 607.1928
    cy: 185.2157
    bf: -386.1448

    tracking_params: {
            features_to_track: 70,
            y_threshold: 40.0
        }

    use_orb: 1
    orb_params: {
            nfeatures: 150,
            scale_factor: 1.2,
            pyr_levels: 8,
            patch_size: 31,
            fast_treshold: 20
        }

    fast_params: {
            threshold: 20,
            nonMaxSuppression: true
        }
    """
)


def test_load_reference_yaml(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(REFERENCE_YAML)
    cfg = load_config(str(p))
    assert cfg.fx == 718.8560
    assert cfg.end_frame == 4540
    assert cfg.use_orb is True
    assert cfg.show_gt is True
    assert cfg.orb_params.nfeatures == 150
    assert cfg.orb_params.fast_treshold == 20
    assert cfg.fast_params.threshold == 20
    assert cfg.tracking.features_to_track == 70
    assert cfg.tracking.y_threshold == 40.0


def test_defaults_match_reference():
    """Defaults mirror include/config_reader.h:26-43."""
    cfg = Config()
    assert cfg.orb_params.nfeatures == 500
    assert cfg.orb_params.scale_factor == 1.2
    assert cfg.orb_params.pyr_levels == 8
    assert cfg.orb_params.patch_size == 31
    assert cfg.fast_params.threshold == 20
    assert cfg.fast_params.nonMaxSuppression is True
    assert cfg.tracking.y_threshold == 40
    assert cfg.tracking.features_to_track == 70
    # surfaced hardcoded params (SURVEY.md §5)
    assert cfg.mask_halfwidth == 10
    # Window sizes mirror the reference call sites (src/tracking.cpp:98-105,
    # 157-164); iteration budgets are deliberately below the reference's
    # 30/50 (LK converges quadratically; see Config) but must stay
    # overridable to the reference values for parity runs.
    assert cfg.stereo_klt.window == 11 and cfg.stereo_klt.max_iters <= 30
    assert cfg.temporal_klt.window == 21 and cfg.temporal_klt.max_iters <= 50
    assert cfg.ransac.reproj_threshold == 8.0


def test_partial_override(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("fx: 100.0\norb_params: {nfeatures: 42}\n")
    cfg = load_config(str(p))
    assert cfg.fx == 100.0
    assert cfg.orb_params.nfeatures == 42
    assert cfg.orb_params.scale_factor == 1.2  # default kept
