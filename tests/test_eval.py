"""Eval-harness math tests (FID Frechet distance, caption resolution)."""
import os

import numpy as np

from storygen_tpu.evaluation.fid import (fid_from_features,
                                         frechet_distance,
                                         feature_statistics)
from storygen_tpu.evaluation.clip_scores import resolve_caption_path


def test_frechet_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16)
    mu, sig = feature_statistics(f)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-8


def test_frechet_known_gaussians():
    """Analytic case: isotropic gaussians N(0, I) and N(m, s^2 I) in d dims:
    FID = ||m||^2 + d (1 - s)^2."""
    d = 8
    mu1, s1 = np.zeros(d), np.eye(d)
    m = np.full(d, 0.5)
    s = 2.0
    fd = frechet_distance(mu1, s1, m, s ** 2 * np.eye(d))
    expected = 0.25 * d + d * (1 - s) ** 2
    np.testing.assert_allclose(fd, expected, rtol=1e-6)


def test_fid_sampled_gaussians_close_to_analytic():
    rng = np.random.RandomState(1)
    a = rng.randn(4000, 4)
    b = rng.randn(4000, 4) + 1.0
    fd = fid_from_features(a, b)
    np.testing.assert_allclose(fd, 4.0, atol=0.2)  # ||1||^2 in 4 dims


def test_resolve_caption_path(tmp_path):
    root = str(tmp_path)
    p = os.path.join(root, "Text", "Caption", "Bloom", "000123")
    os.makedirs(p)
    with open(os.path.join(p, "05.txt"), "w") as f:
        f.write("hello")
    found = resolve_caption_path("000123_05.png", root)
    assert found and found.endswith("000123/05.txt")
    assert resolve_caption_path("999999_01.png", root) is None
