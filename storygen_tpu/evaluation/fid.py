"""FID: Frechet Inception Distance (evaluation/calc_FID.sh parity).

The Frechet distance math is implemented natively (numpy/scipy-free matrix
sqrt via eigendecomposition of the symmetrized product); the feature
extractor is pluggable:
- default: torchvision InceptionV3 pool3 features when weights are
  available locally (pytorch-fid equivalent),
- otherwise any callable batch->(B, D) features (e.g. the CLIP image tower)
  for a "CLIP-FID"-style score.
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import numpy as np


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a (near-)PSD symmetric matrix."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2)
    vals = np.clip(vals, 0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^{1/2}).

    (S1 S2)^{1/2} computed via the PSD-stable similarity transform
    sqrt(sqrt(S1) S2 sqrt(S1)).
    """
    diff = mu1 - mu2
    s1_half = _sqrtm_psd(sigma1)
    covmean = _sqrtm_psd(s1_half @ sigma2 @ s1_half)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def feature_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def fid_from_features(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    return frechet_distance(*feature_statistics(feats_a),
                            *feature_statistics(feats_b))


def _iter_image_batches(paths: Sequence[str], batch: int, size: int):
    from PIL import Image
    for i in range(0, len(paths), batch):
        imgs = [np.asarray(Image.open(p).convert("RGB")
                           .resize((size, size)), dtype=np.float32) / 255.0
                for p in paths[i:i + batch]]
        yield np.stack(imgs)


def inception_feature_fn(model_path: Optional[str] = None) -> Callable:
    """torchvision InceptionV3 pool3 (2048-d) feature extractor, the
    pytorch-fid standard. Requires local weights (zero-egress sandbox)."""
    import torch
    from torchvision.models import inception_v3
    kwargs = {"weights": None} if model_path else {"weights": "DEFAULT"}
    net = inception_v3(aux_logits=True, **kwargs)
    if model_path:
        net.load_state_dict(torch.load(model_path, map_location="cpu"))
    net.fc = torch.nn.Identity()
    net.eval()

    def fn(batch: np.ndarray) -> np.ndarray:  # (B, H, W, 3) in [0,1]
        x = torch.from_numpy(batch).permute(0, 3, 1, 2)
        x = torch.nn.functional.interpolate(x, (299, 299), mode="bilinear",
                                            align_corners=False)
        x = (x - 0.5) / 0.5
        with torch.no_grad():
            return net(x).numpy()

    return fn


def compute_fid(dir_gt: str, dir_gen: str,
                feature_fn: Optional[Callable] = None,
                batch_size: int = 32, size: int = 299) -> float:
    """FID between two image directories (calc_FID.sh:
    python -m pytorch_fid path_gt path_generated)."""
    if feature_fn is None:
        feature_fn = inception_feature_fn()

    def dir_features(d):
        paths = sorted(os.path.join(d, f) for f in os.listdir(d)
                       if f.lower().endswith((".png", ".jpg", ".jpeg")))
        feats = [feature_fn(b)
                 for b in _iter_image_batches(paths, batch_size, size)]
        return np.concatenate(feats)

    return fid_from_features(dir_features(dir_gt), dir_features(dir_gen))
