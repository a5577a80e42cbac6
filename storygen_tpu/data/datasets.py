"""Host-side datasets producing NHWC numpy batches for the TPU input
pipeline.

Capability parity with dataset.py in the reference:
- SimpleDataset (dataset.py:15-54): 2-sample image/mask/text smoke set.
- StorySalonDataset (dataset.py:57-304): 6 PDF sources + video source,
  sliding windows of 4 consecutive frames (3 refs + 1 target), train/test
  split via PDF_test_set.txt / video_test_set.txt, CFG dropout (5% empty
  prompt, 10% zeroed refs + empty ref prompts).
- COCOMultiSegDataset / COCOValMultiSegDataset (dataset.py:307-516):
  reference images are segmentation-mask crops of the target; >3 masks
  merge into the 3rd slot; heavy augmentation on refs.

Reference-quirk compatibility: the reference's ref-image normalization loop
rebinds the loop variable instead of mutating (dataset.py:299-301,
inference.py:89-91), so reference frames are fed to the VAE in [0, 1] while
targets are in [-1, 1] — in BOTH training and inference. Published
checkpoints bake this in, so `normalize_refs=False` is the default here;
set True for self-consistent new trainings.

Layout differences from the reference: arrays are HWC float32 (TPU-native
NHWC), masks single-channel, and batches are collated into contiguous
numpy arrays ready for jax.device_put.
"""
from __future__ import annotations

import json
import os
import random
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def _load_image(path: str, size: int = 512) -> np.ndarray:
    """RGB HWC float32 in [0, 1] (normalize fused in native C++ when the
    extension is available, storygen_tpu/native)."""
    from storygen_tpu import native
    img = Image.open(path).convert("RGB").resize((size, size))
    return native.normalize_u8(np.asarray(img, dtype=np.uint8),
                               1.0 / 255.0, 0.0)


def _load_mask(path: str, size: int = 512) -> np.ndarray:
    """single-channel HW1 float32 in [0, 1] (reference keeps channel 0 of
    an RGB mask, dataset.py:46 / train_*:269)."""
    from storygen_tpu import native
    img = Image.open(path).convert("RGB").resize((size, size))
    arr = np.asarray(img, dtype=np.uint8)[:, :, :1]
    return native.normalize_u8(arr, 1.0 / 255.0, 0.0)


def _read_text(path: str) -> str:
    with open(path) as f:
        return f.read()


class _PerItemRNG:
    """Deterministic per-(epoch, item) RNG factory.

    The loader's thread pool calls __getitem__ concurrently; a single
    shared random.Random would make CFG-dropout draws depend on thread
    scheduling (only approximately reproducible per seed). Deriving a
    fresh Random from (seed, epoch, idx) makes every draw a pure function
    of the sample identity — bitwise reproducible under any thread count.
    The loader advances `epoch` via set_epoch() so dropout still varies
    across epochs (torch DistributedSampler convention)."""

    def __init__(self, seed: Optional[int]):
        self.seed = 0 if seed is None else int(seed)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def for_item(self, idx: int) -> random.Random:
        # str seeds hash deterministically (sha512) regardless of
        # PYTHONHASHSEED; tuple seeds were removed in Python 3.11+
        return random.Random(f"{self.seed}/{self.epoch}/{int(idx)}")


def _natural_key(s: str):
    """Natural sort for video frame filenames like 12_0:03:04.jpg."""
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


class SimpleDataset:
    """Tiny image/mask/text smoke dataset over root/{image,mask,text}."""

    def __init__(self, root: str, size: int = 512):
        self.size = size
        image_dir = os.path.join(root, "image")
        names = sorted(os.listdir(image_dir))
        self.items = [
            (os.path.join(root, "image", n),
             os.path.join(root, "mask", n),
             os.path.join(root, "text",
                          os.path.splitext(n)[0] + ".txt"))
            for n in names
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int) -> Dict:
        img_p, mask_p, text_p = self.items[idx]
        image = _load_image(img_p, self.size) * 2.0 - 1.0
        mask = _load_mask(mask_p, self.size)
        return {"image": image, "mask": mask, "prompt": _read_text(text_p)}


def _windows(folder: str, key=None) -> List[List[str]]:
    """All sliding windows of 4 consecutive files in a folder
    (dataset.py:96-97: stories shorter than 4 frames are skipped)."""
    try:
        names = sorted(os.listdir(folder), key=key)
    except FileNotFoundError:
        return []
    paths = [os.path.join(folder, n) for n in names]
    return [paths[i:i + 4] for i in range(len(paths) - 3)]


PDF_SOURCES = ("African", "Bloom", "Book", "Digital", "Literacy",
               "StoryWeaver")


class StorySalonDataset:
    """Sliding-window story dataset: 3 reference frames + 1 target.

    Expected layout under `root` (README "Dataset" section of the
    reference):
      Image_inpainted/<Source>/<story_id>/*.png  + Mask/... + Text/Caption/...
      image_inpainted_finally_checked/<story_id>/  (video source)
      mask/<story_id>/, Text/Caption/Video/<story_id>/
      PDF_test_set.txt, video_test_set.txt (held-out story ids)
    """

    def __init__(self, root: str, dataset_name: str = "train",
                 size: int = 512, normalize_refs: bool = False,
                 cfg_dropout: bool = True, seed: Optional[int] = None):
        assert dataset_name in ("train", "test")
        self.root = root
        self.dataset_name = dataset_name
        self.size = size
        self.normalize_refs = normalize_refs
        self.cfg_dropout = cfg_dropout and dataset_name == "train"
        self._rng = _PerItemRNG(seed)

        def read_ids(name):
            # corpus-root copy wins; else the lists shipped in repo data/
            # (the reference's exact held-out ids: data/PDF_test_set.txt
            # 451 stories, video_test_set.txt 64 — dataset.py:69-74), so a
            # real-corpus run reproduces the paper split with no extra
            # files in the corpus directory.
            p = os.path.join(root, name)
            if not os.path.exists(p):
                p = os.path.join(os.path.dirname(os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__)))),
                    "data", name)
            if not os.path.exists(p):
                return set()
            return {line.strip() for line in open(p) if line.strip()}

        pdf_test = read_ids("PDF_test_set.txt")
        video_test = read_ids("video_test_set.txt")

        self.samples: List[Tuple[List[str], List[str], List[str]]] = []

        def add_source(img_dir, mask_dir, text_dir, test_ids, sort_key=None):
            if not os.path.isdir(img_dir):
                return
            for story in sorted(os.listdir(img_dir)):
                in_test = story in test_ids
                if (dataset_name == "test") != in_test:
                    continue
                img_w = _windows(os.path.join(img_dir, story), sort_key)
                mask_w = _windows(os.path.join(mask_dir, story), sort_key)
                text_w = _windows(os.path.join(text_dir, story), sort_key)
                for iw, mw, tw in zip(img_w, mask_w, text_w):
                    self.samples.append((iw, mw, tw))

        for src in PDF_SOURCES:
            add_source(os.path.join(root, "Image_inpainted", src),
                       os.path.join(root, "Mask", src),
                       os.path.join(root, "Text", "Caption", src),
                       pdf_test)
        add_source(os.path.join(root, "image_inpainted_finally_checked"),
                   os.path.join(root, "mask"),
                   os.path.join(root, "Text", "Caption", "Video"),
                   video_test, sort_key=_natural_key)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict:
        img_w, mask_w, text_w = self.samples[idx]
        ref_images = np.stack([_load_image(p, self.size) for p in img_w[:3]])
        image = _load_image(img_w[3], self.size) * 2.0 - 1.0
        mask = _load_mask(mask_w[3], self.size)
        ref_prompts = [_read_text(p) for p in text_w[:3]]
        prompt = _read_text(text_w[3])

        if self.normalize_refs:
            ref_images = ref_images * 2.0 - 1.0

        if self.cfg_dropout:
            # CFG dropout (dataset.py:289-296); per-item RNG for
            # thread-count-independent reproducibility
            rng = self._rng.for_item(idx)
            if rng.uniform(0, 1) < 0.05:
                prompt = ""
            if rng.uniform(0, 1) < 0.1:
                ref_prompts = ["", "", ""]
                ref_images = ref_images * 0.0

        return {"image": image, "ref_images": ref_images, "mask": mask,
                "prompt": prompt, "ref_prompts": ref_prompts}


def _fill_polys(shape, segmentation) -> np.ndarray:
    import cv2
    mask = np.zeros(shape, dtype=np.uint8)
    if isinstance(segmentation, list):
        for seg in segmentation:
            if isinstance(seg, list) and len(seg) > 1:
                poly = np.asarray(seg)
                if poly.size >= 4:
                    poly = poly.reshape(-1, 2).astype(np.int32)
                    cv2.fillPoly(mask, [poly], color=255)
    return mask


def _augment(img: np.ndarray, rng: random.Random,
             degrees: float = 30.0, translate: float = 0.2,
             scale_rng: Tuple[float, float] = (0.8, 1.3)) -> np.ndarray:
    """Random affine + color jitter + hflip on a [0,1] HWC image
    (reference transform stack, dataset.py:381-386)."""
    import cv2
    h, w = img.shape[:2]
    ang = rng.uniform(-degrees, degrees)
    tx = rng.uniform(-translate, translate) * w
    ty = rng.uniform(-translate, translate) * h
    sc = rng.uniform(*scale_rng)
    m = cv2.getRotationMatrix2D((w / 2, h / 2), ang, sc)
    m[:, 2] += (tx, ty)
    img = cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LINEAR)
    # color jitter: brightness/contrast/saturation 0.2, hue 0.1
    img = np.clip(img * rng.uniform(0.8, 1.2), 0, 1)          # brightness
    mean = img.mean()
    img = np.clip((img - mean) * rng.uniform(0.8, 1.2) + mean, 0, 1)
    gray = img.mean(axis=-1, keepdims=True)
    img = np.clip((img - gray) * rng.uniform(0.8, 1.2) + gray, 0, 1)
    if rng.random() < 0.5:
        img = img[:, ::-1]
    return np.ascontiguousarray(img)


class COCOMultiSegDataset:
    """COCO train2017: target image + up-to-3 entity-segment ref crops
    (dataset.py:307-415)."""

    def __init__(self, root: str, size: int = 512, split: str = "train",
                 normalize_refs: bool = False, cfg_dropout: bool = True,
                 augment: bool = True, seed: Optional[int] = None):
        ann = "instances_train2017.json" if split == "train" \
            else "instances_val2017.json"
        cap = "captions_train2017.json" if split == "train" \
            else "captions_val2017.json"
        self.image_dir = os.path.join(
            root, "train2017" if split == "train" else "val2017")
        self.size = size
        self.split = split
        self.normalize_refs = normalize_refs
        self.cfg_dropout = cfg_dropout
        self.augment = augment
        self._rng = _PerItemRNG(seed)

        with open(os.path.join(root, "annotations", ann)) as f:
            seg = json.load(f)
        self.images = seg["images"]
        self.categories = {c["id"]: c["name"] for c in seg["categories"]}
        self.anns_by_image: Dict[int, list] = {}
        for a in seg["annotations"]:
            self.anns_by_image.setdefault(a["image_id"], []).append(a)
        cap_path = os.path.join(root, "annotations", cap)
        self.caps_by_image: Dict[int, List[str]] = {}
        if os.path.exists(cap_path):
            with open(cap_path) as f:
                for a in json.load(f)["annotations"]:
                    self.caps_by_image.setdefault(
                        a["image_id"], []).append(a["caption"])

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx: int) -> Dict:
        import cv2
        info = self.images[idx]
        image_id = info["id"]
        raw = np.asarray(
            Image.open(os.path.join(self.image_dir, info["file_name"]))
            .convert("RGB"))

        crops, cats = [], []
        for ann in self.anns_by_image.get(image_id, []):
            m = _fill_polys(raw.shape[:2], ann["segmentation"])
            crops.append(cv2.bitwise_and(raw, raw, mask=m))
            cats.append(self.categories[ann["category_id"]])
        while len(crops) < 3:
            crops.append(np.zeros_like(raw))
            cats.append("")
        if len(crops) > 3:
            # merge extras into slot 3 (dataset.py:361-366)
            merged = crops[2]
            for extra in crops[3:]:
                merged = merged + extra
            crops = crops[:2] + [merged]
            cats = cats[:3]

        rng = self._rng.for_item(idx)  # thread-safe, reproducible
        refs = []
        for c in crops:
            img = np.asarray(Image.fromarray(
                c.astype(np.uint8)).resize((self.size, self.size)),
                dtype=np.float32) / 255.0
            if self.augment:
                deg, tr, sc = ((30, 0.2, (0.8, 1.3)) if self.split == "train"
                               else (10, 0.1, (0.9, 1.1)))
                img = _augment(img, rng, deg, tr, sc)
            refs.append(img)
        ref_images = np.stack(refs)
        image = _load_image(
            os.path.join(self.image_dir, info["file_name"]),
            self.size) * 2.0 - 1.0

        caps = self.caps_by_image.get(image_id, [])
        prompt = rng.choice(caps) if caps else ""

        if self.normalize_refs:
            ref_images = ref_images * 2.0 - 1.0
        if self.cfg_dropout:
            if rng.uniform(0, 1) < 0.05:
                prompt = ""
            if rng.uniform(0, 1) < 0.1:
                cats = ["", "", ""]
                ref_images = ref_images * 0.0

        return {"image": image, "ref_images": ref_images,
                "prompt": prompt, "ref_prompts": cats}


class COCOValMultiSegDataset(COCOMultiSegDataset):
    """val2017 variant with captions from a Caption/ dir
    (dataset.py:418-516); yields image_path for PickScore re-ranking."""

    def __init__(self, root: str, caption_dir: Optional[str] = None,
                 **kw):
        super().__init__(root, split="val", cfg_dropout=False, **kw)
        self.caption_dir = caption_dir

    def __getitem__(self, idx: int) -> Dict:
        out = super().__getitem__(idx)
        info = self.images[idx]
        out["image_path"] = os.path.join(self.image_dir, info["file_name"])
        if self.caption_dir:
            stem = os.path.splitext(info["file_name"])[0]
            p = os.path.join(self.caption_dir, stem + ".txt")
            if os.path.exists(p):
                out["prompt"] = _read_text(p)
        return out


class PrecomputedLatentDataset:
    """Training dataset over scripts/precompute_latents.py output.

    Each item is one <index>.npz holding `latent_moments` (h, w, 8),
    `ref_latent_moments` (N, h, w, 8), `mask` (H, W, 1), `input_ids`
    (77,) and `ref_input_ids` (N, 77). The train step samples the stored
    VAE posterior per step (training/steps.py `_sample_moments`), so
    stochasticity is preserved while the per-step encoder work the
    reference redoes every step (train_StorySalon_stage2.py:273-288)
    disappears — the BENCH.md-recommended training regime (328 vs
    572 ms/step at batch 4, 512px).

    Moments are stored fp16 (posterior mean/logvar round-trip safely);
    they are widened to float32 here and the step samples in fp32
    before casting to the compute dtype.
    """

    def __init__(self, root: str):
        self.root = root
        self.files = sorted(f for f in os.listdir(root)
                            if f.endswith(".npz"))
        if not self.files:
            raise FileNotFoundError(f"no .npz latent files under {root}")

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, i: int) -> Dict:
        z = np.load(os.path.join(self.root, self.files[i]))
        out = {k: z[k] for k in z.files}
        for k in ("latent_moments", "ref_latent_moments", "mask"):
            if k in out:
                out[k] = out[k].astype(np.float32)
        return out
