"""Keyframe extraction over a synthetic video (cv2 VideoWriter)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from storygen_tpu.data_process import extract


@pytest.fixture()
def synthetic_video(tmp_path):
    """Three 20-frame 'shots' with distinct colors -> 2 shot changes."""
    path = str(tmp_path / "story.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25.0,
                        (64, 64))
    if not w.isOpened():
        pytest.skip("no video codec available")
    rng = np.random.RandomState(0)
    for color in ((255, 0, 0), (0, 255, 0), (0, 0, 255)):
        base = np.zeros((64, 64, 3), np.uint8)
        base[:] = color
        for _ in range(20):
            frame = base.copy()
            # slight noise so frames within a shot are not identical
            frame = np.clip(frame.astype(int)
                            + rng.randint(-5, 5, frame.shape), 0,
                            255).astype(np.uint8)
            w.write(frame)
    w.release()
    return path


def test_diff_keyframes_find_shot_changes(synthetic_video):
    keys = extract.diff_keyframe_indices(synthetic_video, threshold=18.0,
                                         stride=2, min_gap=5)
    # frame 0 plus the two shot changes (~frames 20 and 40)
    assert keys[0] == 0
    assert len(keys) == 3, keys
    assert any(15 <= k <= 25 for k in keys)
    assert any(35 <= k <= 45 for k in keys)


def test_extract_keyframes_writes_timestamped_pngs(synthetic_video,
                                                   tmp_path):
    out = str(tmp_path / "frames")
    paths = extract.extract_keyframes(synthetic_video, out)
    assert len(paths) == 3
    for p in paths:
        assert os.path.exists(p) and p.endswith(".png")
    # timestamped names like 0_0:00:00.png
    assert os.path.basename(paths[0]).startswith("0_0:")
