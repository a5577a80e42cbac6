"""Native C++ preprocessing library: build, bindings, numerics."""
import numpy as np
import pytest

from storygen_tpu import native


def test_builds_and_loads():
    assert native.available(), "libpreprocess.so failed to build/load"


def test_normalize_matches_numpy():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 64, 3), np.uint8)
    out = native.normalize_u8(img, 2.0 / 255.0, -1.0)
    expected = img.astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(out, expected, rtol=1e-6)
    assert out.dtype == np.float32


def test_assemble_batch():
    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 256, (32, 32, 3), np.uint8) for _ in range(5)]
    out = native.assemble_batch(imgs, 1.0 / 255.0, 0.0)
    expected = np.stack(imgs).astype(np.float32) / 255.0
    np.testing.assert_allclose(out, expected, rtol=1e-6)
    assert out.shape == (5, 32, 32, 3)


def test_resize_bilinear_matches_torch():
    """Half-pixel-center bilinear, no antialias — the torch
    F.interpolate(align_corners=False) convention (PIL antialiases on
    downscale, so it is not the comparison target)."""
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (64, 48, 3), np.uint8)
    out = native.resize_bilinear(img, 32, 24)
    t = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None]
    ref = F.interpolate(t, (32, 24), mode="bilinear", align_corners=False)
    ref = ref[0].permute(1, 2, 0).numpy()
    assert out.shape == ref.shape
    # uint8 rounding: allow 1 lsb
    assert np.abs(out.astype(np.float32) - ref).max() <= 1.0
