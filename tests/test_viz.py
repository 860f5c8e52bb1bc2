"""Trajectory visualization (infer/viz.py <- handsonvlm/evaluation/utils.py):
overlay styles mutate the frame along the waypoint path; the mp4 writer
produces a parseable video file."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from handsonvlm_tpu.infer.viz import create_trajectory_video, vis_hand_traj, vis_traj


def _frame():
    return np.full((256, 456, 3), 32, np.uint8)


def test_vis_hand_traj_styles():
    traj = np.array([[0.2, 0.2], [0.4, 0.5], [0.6, 0.6], [0.8, 0.8]], np.float32)
    for style in ("gradient", "arrow"):
        out = vis_hand_traj(_frame(), traj, style=style)
        assert out.shape == (256, 456, 3)
        assert (out != 32).any(), style  # something was drawn
    # both hands via vis_traj (right red / left blue like utils.py)
    both = vis_traj(_frame(), np.stack([traj, traj[::-1]]))
    assert (both != 32).any()


def test_vis_hand_traj_draws_all_points():
    """reference parity: utils.py draws EVERY waypoint, including zero-pads
    (no skip logic at handsonvlm/evaluation/utils.py:63-80) — zero-padded
    points land at the (0,0) corner by design."""
    traj = np.array([[0.5, 0.5], [0.0, 0.0], [0.0, 0.0], [0.0, 0.0]], np.float32)
    out = vis_hand_traj(_frame(), traj)
    assert (out[:10, :10] != 32).any()  # the corner circle was drawn


def test_create_trajectory_video(tmp_path):
    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.jpg")
        cv2.imwrite(p, _frame())
        paths.append(p)
    pred = np.random.default_rng(0).uniform(0.1, 0.9, size=(2, 4, 2))
    out_path = str(tmp_path / "traj.mp4")
    result = create_trajectory_video(paths, pred, out_path, fps=4)
    assert os.path.exists(result) and os.path.getsize(result) > 0
    cap = cv2.VideoCapture(result)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 3 + 4  # frames + 1s overlay hold
