"""The synthetic dataset generators must produce trees the dataset
classes actually load (they back the on-chip smoke runs), and every
shipped config must parse into a TrainConfig."""
import glob
import os
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    subprocess.run([sys.executable, os.path.join(_REPO, "scripts", script),
                    *args], check=True, capture_output=True, timeout=120)


def test_synth_storysalon_loads(tmp_path):
    from storygen_tpu.data.datasets import StorySalonDataset
    root = str(tmp_path / "salon")
    _run("make_synth_storysalon.py", "--root", root, "--stories", "3",
         "--frames", "5", "--size", "64")
    train = StorySalonDataset(root, "train", size=64, seed=0)
    test = StorySalonDataset(root, "test", size=64)
    # 2 train stories x (5 - 3) windows; 1 held-out story
    assert len(train) == 4
    assert len(test) == 2
    s = train[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["ref_images"].shape == (3, 64, 64, 3)
    assert "story 0" in s["prompt"] or "story 1" in s["prompt"]
    # frames differ (procedural content, not constant fills)
    assert np.abs(s["ref_images"][0] - s["ref_images"][1]).max() > 0.01


def test_synth_coco_loads(tmp_path):
    from storygen_tpu.data.datasets import COCOMultiSegDataset
    root = str(tmp_path / "coco")
    _run("make_synth_coco.py", "--root", root, "--images", "4",
         "--size", "64")
    ds = COCOMultiSegDataset(root, size=64, cfg_dropout=False,
                             augment=False, seed=0)
    assert len(ds) == 4
    s = ds[1]  # image 1 has 2 entities
    assert s["image"].shape == (64, 64, 3)
    assert s["ref_images"].shape == (3, 64, 64, 3)
    assert s["ref_prompts"][0] in ("person", "dog", "car")
    assert s["ref_images"][0].max() > 0  # entity crop non-empty


def test_all_shipped_configs_parse():
    from storygen_tpu.configs import TrainConfig
    ymls = glob.glob(os.path.join(_REPO, "configs", "*.yml"))
    assert ymls
    for p in ymls:
        cfg = TrainConfig.from_yaml(p)
        assert cfg.train_batch_size >= 1
        assert cfg.gradient_accumulation_steps >= 1


def test_train_config_validates_at_parse_time():
    """Typos in attn_variant/attn_backend/mixed_precision must fail at
    config construction, not deep inside a jitted call."""
    import pytest
    from storygen_tpu.configs import TrainConfig
    for kw in ({"attn_variant": "bndd"}, {"attn_backend": "pallas"},
               {"mixed_precision": "fp8"}):
        with pytest.raises(ValueError):
            TrainConfig(**kw)
    # the reference YAMLs' AMP flag parses (mapped to bf16 on TPU)
    assert TrainConfig(mixed_precision="fp16").mixed_precision == "fp16"
    for v in ("bnd_guard", "bnd", "online_t", "grid"):
        assert TrainConfig(attn_variant=v).attn_variant == v
