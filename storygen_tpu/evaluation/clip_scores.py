"""CLIP-I / CLIP-T / PickScore metrics.

Capability parity with the reference eval scripts:
- CLIP-I: generated-image <-> GT-image cosine similarity, averaged
  (evaluation/calc_CLIP_image.py:36-53).
- CLIP-T: generated-image <-> caption similarity
  (evaluation/calc_CLIP_text.py:33-70), including the caption-path
  resolution across video/PDF sources.
- PickScore: PickScore_v1 text-image reward (evaluation/calc_Pickscore.py
  and the re-ranking in inference_COCO_val.py:23-40).

Models load via transformers from a local path (zero-egress sandbox):
CLIP ViT-B/32 for CLIP-I/T, CLIP-H + PickScore_v1 head for PickScore.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


class CLIPScorer:
    """Image/text embedding + cosine scores via a local CLIP checkpoint."""

    def __init__(self, model_path: str):
        import torch
        from transformers import CLIPModel, CLIPProcessor
        self.torch = torch
        self.model = CLIPModel.from_pretrained(model_path).eval()
        self.processor = CLIPProcessor.from_pretrained(model_path)

    def image_embed(self, images: Sequence) -> np.ndarray:
        inputs = self.processor(images=list(images), return_tensors="pt")
        with self.torch.no_grad():
            e = self.model.get_image_features(**inputs)
        return self._norm(e.numpy())

    def text_embed(self, texts: Sequence[str]) -> np.ndarray:
        inputs = self.processor(text=list(texts), return_tensors="pt",
                                padding=True, truncation=True)
        with self.torch.no_grad():
            e = self.model.get_text_features(**inputs)
        return self._norm(e.numpy())

    @staticmethod
    def _norm(x: np.ndarray) -> np.ndarray:
        return x / np.linalg.norm(x, axis=-1, keepdims=True)


def clip_i(scorer: CLIPScorer, gen_images: Sequence,
           gt_images: Sequence) -> float:
    """Mean cosine similarity generated <-> ground-truth images."""
    a = scorer.image_embed(gen_images)
    b = scorer.image_embed(gt_images)
    return float(np.mean(np.sum(a * b, axis=-1)))


def clip_t(scorer: CLIPScorer, gen_images: Sequence,
           captions: Sequence[str]) -> float:
    """Mean cosine similarity generated images <-> their captions."""
    a = scorer.image_embed(gen_images)
    b = scorer.text_embed(captions)
    return float(np.mean(np.sum(a * b, axis=-1)))


def resolve_caption_path(image_path: str, storysalon_root: str
                         ) -> Optional[str]:
    """Map a test-result image filename back to its StorySalon caption file
    (calc_CLIP_text.py:41-56 logic: try the video source then each PDF
    source)."""
    stem = os.path.splitext(os.path.basename(image_path))[0]
    parts = stem.split("_")
    candidates = []
    if len(parts) >= 2:
        story, frame = parts[0], "_".join(parts[1:])
        candidates.append(os.path.join(storysalon_root, "Text", "Caption",
                                       "Video", story, frame + ".txt"))
        for src in ("African", "Bloom", "Book", "Digital", "Literacy",
                    "StoryWeaver"):
            candidates.append(os.path.join(storysalon_root, "Text",
                                           "Caption", src, story,
                                           frame + ".txt"))
    for c in candidates:
        if os.path.exists(c):
            return c
    return None


class PickScorer:
    """PickScore_v1 reward (CLIP-H backbone + reward head)."""

    def __init__(self, processor_path: str, model_path: str):
        import torch
        from transformers import AutoProcessor, AutoModel
        self.torch = torch
        self.processor = AutoProcessor.from_pretrained(processor_path)
        self.model = AutoModel.from_pretrained(model_path).eval()

    def score(self, prompt: str, images: Sequence) -> np.ndarray:
        """Per-image PickScore logits for one prompt
        (inference_COCO_val.py:23-40 calc_probs)."""
        t = self.torch
        image_inputs = self.processor(images=list(images), padding=True,
                                      truncation=True, max_length=77,
                                      return_tensors="pt")
        text_inputs = self.processor(text=prompt, padding=True,
                                     truncation=True, max_length=77,
                                     return_tensors="pt")
        with t.no_grad():
            ie = self.model.get_image_features(**image_inputs)
            ie = ie / ie.norm(dim=-1, keepdim=True)
            te = self.model.get_text_features(**text_inputs)
            te = te / te.norm(dim=-1, keepdim=True)
            scores = self.model.logit_scale.exp() * (te @ ie.T)[0]
        return scores.numpy()

    def best_of(self, prompt: str, images: Sequence) -> int:
        """argmax re-ranking (inference_COCO_val.py:120-148)."""
        return int(np.argmax(self.score(prompt, images)))


def evaluate_directory(gen_dir: str, gt_dir: str, clip_model_path: str,
                       storysalon_root: Optional[str] = None) -> dict:
    """Directory-sweep evaluation: CLIP-I vs GT, CLIP-T vs captions."""
    from PIL import Image
    scorer = CLIPScorer(clip_model_path)
    names = sorted(n for n in os.listdir(gen_dir)
                   if n.lower().endswith((".png", ".jpg")))
    gen = [Image.open(os.path.join(gen_dir, n)).convert("RGB")
           for n in names]
    out = {}
    gt_names = [n for n in names if os.path.exists(os.path.join(gt_dir, n))]
    if gt_names:
        gt = [Image.open(os.path.join(gt_dir, n)).convert("RGB")
              for n in gt_names]
        gen_matched = [Image.open(os.path.join(gen_dir, n)).convert("RGB")
                       for n in gt_names]
        out["clip_i"] = clip_i(scorer, gen_matched, gt)
    if storysalon_root:
        caps, imgs = [], []
        for n, im in zip(names, gen):
            p = resolve_caption_path(n, storysalon_root)
            if p:
                with open(p) as f:
                    caps.append(f.read().strip())
                imgs.append(im)
        if caps:
            out["clip_t"] = clip_t(scorer, imgs, caps)
    return out
