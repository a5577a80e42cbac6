"""Duplicate-frame removal by embedding cosine similarity
(data_process/dup_remove.py parity: DINO ViT-B/8 embeddings, drop the
*previous* frame when cosine >= 0.75, dup_remove.py:18,38-43).

The embedder is pluggable: `dino_embedder()` builds the reference's DINO
backbone when torch-hub weights are available locally; any callable
(B, H, W, 3) float [0,1] -> (B, D) works (e.g. the CLIP image tower).
"""
from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.dot(a, b) /
                 (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def find_duplicates(embeddings: np.ndarray,
                    threshold: float = 0.75) -> List[int]:
    """Indices to DELETE: for each consecutive pair with cosine >=
    threshold the EARLIER frame is dropped (reference keeps the later one,
    dup_remove.py:38-43)."""
    drop = []
    for i in range(len(embeddings) - 1):
        if cosine(embeddings[i], embeddings[i + 1]) >= threshold:
            drop.append(i)
    return drop


def dedup_frames(paths: Sequence[str], embed_fn: Callable,
                 threshold: float = 0.75, batch: int = 16,
                 delete: bool = False) -> List[str]:
    """Return the kept paths (optionally deleting dropped files)."""
    from PIL import Image
    embs = []
    for i in range(0, len(paths), batch):
        imgs = np.stack([
            np.asarray(Image.open(p).convert("RGB").resize((224, 224)),
                       dtype=np.float32) / 255.0
            for p in paths[i:i + batch]])
        embs.append(np.asarray(embed_fn(imgs)))
    embs = np.concatenate(embs) if embs else np.zeros((0, 1))
    dropped = set(find_duplicates(embs, threshold))
    kept = [p for i, p in enumerate(paths) if i not in dropped]
    if delete:
        import os
        for i in dropped:
            os.remove(paths[i])
    return kept


def dino_embedder(repo_or_dir: str = "facebookresearch/dino:main",
                  model: str = "dino_vitb8", source: str = "github"):
    """The reference's DINO ViT-B/8 embedder (requires cached torch-hub
    weights in this zero-egress sandbox)."""
    import torch
    net = torch.hub.load(repo_or_dir, model, source=source).eval()
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def fn(batch: np.ndarray) -> np.ndarray:
        x = torch.from_numpy((batch - mean) / std).permute(0, 3, 1, 2)
        with torch.no_grad():
            return net(x).numpy()

    return fn


def classical_embedder(grid: int = 16):
    """Weights-free default embedder: downsampled grayscale intensities
    concatenated with coarse gradient-orientation histograms. Near-exact
    duplicates (the dup_remove.py target: consecutive I-frames of a still
    scene) land at cosine ~1 while scene cuts fall well below the 0.75
    threshold; no external weights needed (DINO stays the high-fidelity
    option when torch-hub weights are cached, dup_remove.py:18)."""
    def fn(batch: np.ndarray) -> np.ndarray:
        gray = batch.mean(-1)  # (B, H, W) in [0,1]
        b, h, w = gray.shape
        # crop to a multiple of `grid` so any input size works (the
        # dedup_frames path resizes to 224, already divisible)
        if h % grid or w % grid:
            if h < grid or w < grid:
                raise ValueError(
                    f"images must be at least {grid}x{grid}, got {h}x{w}")
            h, w = h - h % grid, w - w % grid
            gray = gray[:, :h, :w]
        small = gray.reshape(b, grid, h // grid, grid,
                             w // grid).mean((2, 4))      # (B, g, g)
        # center per image so cosine measures pattern correlation, not
        # the shared DC brightness
        small = small - small.mean(axis=(1, 2), keepdims=True)
        gy, gx = np.gradient(gray, axis=(1, 2))
        mag = np.sqrt(gx * gx + gy * gy)
        ang = np.arctan2(gy, gx)  # [-pi, pi]
        nbins = 8
        bins = ((ang + np.pi) / (2 * np.pi) * nbins).astype(int) % nbins
        hist = np.zeros((b, nbins), np.float32)
        for k in range(nbins):
            hist[:, k] = (mag * (bins == k)).reshape(b, -1).sum(1)
        hist /= hist.sum(1, keepdims=True) + 1e-8
        feat = np.concatenate([small.reshape(b, -1), hist * grid], axis=1)
        return feat.astype(np.float32)

    return fn


def default_embedder():
    """DINO when its torch-hub weights are cached, else the classical
    weights-free embedder."""
    try:
        return dino_embedder()
    except Exception:
        return classical_embedder()
