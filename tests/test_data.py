"""Data-layer tests over synthetic on-disk fixtures (SimpleDataset-style
2-sample smoke, StorySalon window logic, CFG dropout, collation)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from storygen_tpu.data.datasets import (COCOMultiSegDataset, SimpleDataset,
                                        StorySalonDataset)
from storygen_tpu.data.loader import DataLoader, collate


def _write_img(path, size=64, value=128):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.full((size, size, 3), value, np.uint8)).save(path)


def _write_txt(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


@pytest.fixture()
def simple_root(tmp_path):
    root = str(tmp_path)
    for i in (1, 2):
        _write_img(f"{root}/image/0000{i}.png")
        _write_img(f"{root}/mask/0000{i}.png", value=0)
        _write_txt(f"{root}/text/0000{i}.txt", f"caption {i}")
    return root


def test_simple_dataset(simple_root):
    ds = SimpleDataset(simple_root, size=64)
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["mask"].shape == (64, 64, 1)
    assert -1.01 <= s["image"].min() and s["image"].max() <= 1.01
    assert s["prompt"] == "caption 1"


@pytest.fixture()
def salon_root(tmp_path):
    root = str(tmp_path)
    # one PDF source story with 6 frames -> 3 windows; one test story
    for story, n in (("000001", 6), ("000002", 4)):
        for i in range(n):
            _write_img(f"{root}/Image_inpainted/Bloom/{story}/{i:02d}.png",
                       value=20)
            _write_img(f"{root}/Mask/Bloom/{story}/{i:02d}.png", value=0)
            _write_txt(f"{root}/Text/Caption/Bloom/{story}/{i:02d}.txt",
                       f"frame {i} of {story}")
    _write_txt(f"{root}/PDF_test_set.txt", "000002\n")
    _write_txt(f"{root}/video_test_set.txt", "")
    return root


def test_storysalon_windows_and_split(salon_root):
    train = StorySalonDataset(salon_root, "train", size=64,
                              cfg_dropout=False)
    test = StorySalonDataset(salon_root, "test", size=64)
    assert len(train) == 3  # 6 frames -> 3 sliding windows
    assert len(test) == 1   # 4 frames -> 1 window
    s = train[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["ref_images"].shape == (3, 64, 64, 3)
    assert s["mask"].shape == (64, 64, 1)
    assert s["prompt"] == "frame 3 of 000001"
    assert s["ref_prompts"] == [f"frame {i} of 000001" for i in range(3)]
    # reference-quirk default: refs in [0,1], target in [-1,1]
    assert s["ref_images"].min() >= 0.0
    assert s["image"].min() < 0.0


def test_storysalon_cfg_dropout_rates(salon_root):
    ds = StorySalonDataset(salon_root, "train", size=64, cfg_dropout=True,
                           seed=0)
    empty_prompt = zero_refs = n = 0
    for epoch in range(134):  # dropout draws vary per (epoch, idx)
        ds._rng.set_epoch(epoch)  # the DataLoader does this per epoch
        for i in range(len(ds)):
            s = ds[i]
            empty_prompt += s["prompt"] == ""
            zero_refs += float(np.abs(s["ref_images"]).sum()) == 0.0
            n += 1
    assert 0.02 < empty_prompt / n < 0.10   # ~5%
    assert 0.05 < zero_refs / n < 0.16      # ~10%


def test_storysalon_cfg_dropout_reproducible_any_thread_order(salon_root):
    """CFG dropout is a pure function of (seed, epoch, idx): re-reading
    an item, in any order, from any thread, gives the identical draw —
    the config seed now delivers exact reproducibility (the reference's
    shared-RNG draws depended on worker scheduling)."""
    ds = StorySalonDataset(salon_root, "train", size=64, cfg_dropout=True,
                           seed=7)
    ds._rng.set_epoch(3)
    a = [ds[i]["prompt"] for i in range(len(ds))]
    b = [ds[i]["prompt"] for i in reversed(range(len(ds)))][::-1]
    assert a == b
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=4) as pool:
        c = list(pool.map(lambda i: ds[i]["prompt"], range(len(ds))))
    assert a == c
    ds2 = StorySalonDataset(salon_root, "train", size=64, cfg_dropout=True,
                            seed=7)
    ds2._rng.set_epoch(3)
    assert a == [ds2[i]["prompt"] for i in range(len(ds2))]
    # different epoch or seed -> independent draws (same item can differ)
    ds2._rng.set_epoch(4)
    d = [(ds2[i]["prompt"], float(np.abs(ds2[i]["ref_images"]).sum()))
         for i in range(len(ds2))]
    assert isinstance(d, list)  # smoke: draws computed without error


@pytest.fixture()
def coco_root(tmp_path):
    root = str(tmp_path)
    os.makedirs(f"{root}/annotations")
    os.makedirs(f"{root}/train2017")
    images, anns, caps = [], [], []
    for i in range(2):
        name = f"{i:012d}.jpg"
        _write_img(f"{root}/train2017/{name}", size=64, value=100 + i)
        images.append({"id": i, "file_name": name, "height": 64,
                       "width": 64})
        # two polygon segments per image
        for j in range(2):
            anns.append({"image_id": i, "category_id": 1,
                         "segmentation": [[5, 5, 40, 5, 40, 40, 5, 40]]})
        caps.append({"image_id": i, "caption": f"a photo {i}"})
    with open(f"{root}/annotations/instances_train2017.json", "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    with open(f"{root}/annotations/captions_train2017.json", "w") as f:
        json.dump({"annotations": caps}, f)
    return root


def test_coco_dataset(coco_root):
    ds = COCOMultiSegDataset(coco_root, size=64, cfg_dropout=False,
                             augment=False, seed=0)
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["ref_images"].shape == (3, 64, 64, 3)
    assert s["ref_prompts"][0] == "person"
    assert s["ref_prompts"][2] == ""  # padded to 3
    assert s["prompt"] == "a photo 0"
    # entity crop is nonzero inside the polygon, zero outside
    assert s["ref_images"][0].max() > 0
    assert float(np.abs(s["ref_images"][2]).sum()) == 0.0


def test_collate_and_loader(salon_root):
    ds = StorySalonDataset(salon_root, "train", size=64, cfg_dropout=False)

    def fake_tokenizer(texts):
        return np.zeros((len(texts), 77), np.int32)

    loader = DataLoader(ds, batch_size=2, tokenizer=fake_tokenizer, seed=0)
    it = iter(loader)
    batch = next(it)
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["ref_images"].shape == (3, 2, 64, 64, 3)
    assert batch["mask"].shape == (2, 64, 64, 1)
    assert batch["input_ids"].shape == (2, 77)
    assert batch["ref_input_ids"].shape == (3, 2, 77)
    # cycles epochs forever
    for _ in range(4):
        next(it)


def test_shipped_sample_fixtures():
    """The repo ships a 2-sample smoke fixture under data/ (reference
    SimpleDataset layout)."""
    import os
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data")
    ds = SimpleDataset(root, size=128)
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (128, 128, 3)
    assert "sun" in s["prompt"] or "moon" in s["prompt"]


def test_loader_multithreaded_deterministic_order():
    """num_threads>1 parallelizes sample decode but batch content and
    order must match the single-threaded loader (same seed)."""
    class _DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            return {"image": r.randn(8, 8, 3).astype(np.float32),
                    "prompt": f"p{i}"}

    a = iter(DataLoader(_DS(), 4, tokenizer=None, seed=3, num_threads=1))
    b = iter(DataLoader(_DS(), 4, tokenizer=None, seed=3, num_threads=8))
    for _ in range(6):
        ba, bb = next(a), next(b)
        np.testing.assert_array_equal(ba["image"], bb["image"])
        assert ba["prompt"] == bb["prompt"]


def test_shipped_reference_split_lists():
    """The repo ships the reference's held-out story-id lists verbatim
    (/root/reference/dataset.py:69-74 contract): data/PDF_test_set.txt has
    451 ids, data/video_test_set.txt has 64, all zero-padded numeric."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pdf = [l.strip() for l in open(os.path.join(repo, "data",
                                                "PDF_test_set.txt"))
           if l.strip()]
    vid = [l.strip() for l in open(os.path.join(repo, "data",
                                                "video_test_set.txt"))
           if l.strip()]
    assert len(pdf) == 451
    assert len(vid) == 64
    assert all(i.isdigit() and len(i) == 6 for i in pdf + vid)


def test_storysalon_falls_back_to_shipped_split_lists(tmp_path):
    """A corpus root WITHOUT split-list files uses the shipped reference
    lists: a story named after a shipped held-out id lands in 'test'."""
    root = str(tmp_path)
    held_out = "000026"  # first id in the shipped PDF_test_set.txt
    for story, n in ((held_out, 4), ("900000", 4)):
        for i in range(n):
            _write_img(f"{root}/Image_inpainted/Bloom/{story}/{i:02d}.png",
                       value=10)
            _write_img(f"{root}/Mask/Bloom/{story}/{i:02d}.png", value=0)
            _write_txt(f"{root}/Text/Caption/Bloom/{story}/{i:02d}.txt", "c")
    train = StorySalonDataset(root, "train", size=64, cfg_dropout=False)
    test = StorySalonDataset(root, "test", size=64)
    assert len(train) == 1 and len(test) == 1
    assert held_out in test.samples[0][0][0]
    # an explicit (empty) corpus-root list still takes precedence
    _write_txt(f"{root}/PDF_test_set.txt", "")
    _write_txt(f"{root}/video_test_set.txt", "")
    assert len(StorySalonDataset(root, "train", size=64,
                                 cfg_dropout=False)) == 2
