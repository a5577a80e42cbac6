"""Eval scorer surface tests with a tiny local CLIP checkpoint
(zero-egress: random-init transformers CLIPModel saved to disk)."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_clip_path(tmp_path_factory):
    import transformers
    root = str(tmp_path_factory.mktemp("tiny_clip"))
    cfg = transformers.CLIPConfig(
        text_config={"vocab_size": 49408, "hidden_size": 32,
                     "intermediate_size": 64, "num_hidden_layers": 2,
                     "num_attention_heads": 4,
                     "max_position_embeddings": 77},
        vision_config={"hidden_size": 32, "intermediate_size": 64,
                       "num_hidden_layers": 2, "num_attention_heads": 4,
                       "image_size": 32, "patch_size": 16},
        projection_dim=16)
    model = transformers.CLIPModel(cfg)
    model.save_pretrained(root)
    # processor: tiny tokenizer + image processor
    from transformers import CLIPImageProcessor, CLIPProcessor, CLIPTokenizerFast
    tok = CLIPTokenizerFast.from_pretrained(
        "/root/reference/ckpt/stable-diffusion-v1-5/tokenizer")
    improc = CLIPImageProcessor(size={"shortest_edge": 32}, crop_size=32)
    CLIPProcessor(image_processor=improc, tokenizer=tok).save_pretrained(root)
    return root


def _imgs(n, seed=0):
    from PIL import Image
    rng = np.random.RandomState(seed)
    return [Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8))
            for _ in range(n)]


def test_clip_i_and_t(tiny_clip_path):
    from storygen_tpu.evaluation.clip_scores import CLIPScorer, clip_i, clip_t
    scorer = CLIPScorer(tiny_clip_path)
    gen, gt = _imgs(3, 0), _imgs(3, 1)
    v = clip_i(scorer, gen, gt)
    assert -1.0 <= v <= 1.0
    # self-similarity is 1
    assert abs(clip_i(scorer, gen, gen) - 1.0) < 1e-5
    t = clip_t(scorer, gen, ["a fox", "a bear", "a lantern"])
    assert -1.0 <= t <= 1.0


def test_evaluate_directory(tiny_clip_path, tmp_path):
    from storygen_tpu.evaluation.clip_scores import evaluate_directory
    gen_dir, gt_dir = tmp_path / "gen", tmp_path / "gt"
    gen_dir.mkdir(); gt_dir.mkdir()
    for i, (a, b) in enumerate(zip(_imgs(2, 2), _imgs(2, 3))):
        a.save(str(gen_dir / f"{i:06d}_01.png"))
        b.save(str(gt_dir / f"{i:06d}_01.png"))
    out = evaluate_directory(str(gen_dir), str(gt_dir), tiny_clip_path)
    assert "clip_i" in out and -1.0 <= out["clip_i"] <= 1.0
