"""Data-process pipeline tests: VTT cleanup, dedup, masking, DTW alignment,
TPU inpainting (tiny models), caption prompting."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from storygen_tpu.data_process import align, caption, dedup, extract, masking


class TestVTT:
    VTT = """WEBVTT
Kind: captions
Language: en

00:00:00.000 --> 00:00:02.500
Once upon a <c>time</c>

00:00:02.500 --> 00:00:04.000
Once upon a time

00:00:04.000 --> 00:00:06.000
there was a fox.
"""

    def test_remove_tags(self):
        assert extract.remove_tags("a <c>b</c> <00:00:01.000>c") == "a b c"

    def test_parse_and_merge(self):
        cues = extract.clean_vtt(self.VTT)
        assert len(cues) == 2
        assert cues[0] == ("00:00:00.000", "00:00:04.000",
                           "Once upon a time")
        assert cues[1][2] == "there was a fox."

    def test_transcript(self):
        assert extract.vtt_to_transcript(self.VTT) == \
            "Once upon a time there was a fox."


class TestDedup:
    def test_find_duplicates_drops_earlier(self):
        e = np.array([[1, 0], [1, 0.01], [0, 1.0]], np.float32)
        assert dedup.find_duplicates(e, threshold=0.75) == [0]

    def test_dedup_frames_with_fake_embedder(self, tmp_path):
        from PIL import Image
        paths = []
        # frames 0 and 1 identical (left-half white), frame 2 distinct
        # (right-half white) -> near-orthogonal flattened embeddings
        for i, left in enumerate([True, True, False]):
            arr = np.zeros((8, 8, 3), np.uint8)
            if left:
                arr[:, :4] = 255
            else:
                arr[:, 4:] = 255
            p = str(tmp_path / f"{i}.png")
            Image.fromarray(arr).save(p)
            paths.append(p)

        def embed(batch):
            return batch.reshape(len(batch), -1)

        kept = dedup.dedup_frames(paths, embed, threshold=0.99)
        assert kept == [paths[1], paths[2]]


class TestMasking:
    def test_boxes_to_mask(self):
        m = masking.boxes_to_mask((10, 10), [(2, 2, 5, 5)])
        assert m[3, 3] == 255 and m[0, 0] == 0

    def test_person_filter(self):
        img = np.zeros((10, 10, 3), np.uint8)
        big = lambda im: [(0, 0, 10, 10)]
        assert masking.build_frame_mask(img, person_detector=big) is None
        small = lambda im: [(0, 0, 2, 2)]
        m = masking.build_frame_mask(img, person_detector=small)
        assert m is not None and m[1, 1] == 255

    def test_process_directory(self, tmp_path):
        from PIL import Image
        img_dir = tmp_path / "img"
        img_dir.mkdir()
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            str(img_dir / "a.png"))
        kept = masking.process_directory(
            str(img_dir), str(tmp_path / "mask"),
            text_detector=lambda im: [(0, 0, 2, 2)])
        assert len(kept) == 1
        import os
        assert os.path.exists(str(tmp_path / "mask" / "a.png"))


class TestAlign:
    def test_split_sentences(self):
        s = align.split_sentences("One. Two!  Three? ")
        assert s == ["One.", "Two!", "Three?"]

    def test_dtw_identity(self):
        e = np.eye(4, dtype=np.float32)
        path = align.dtw_align(e, e, time_penalty=0.0)
        assert path == [(0, 0), (1, 1), (2, 2), (3, 3)]

    def test_dtw_more_frames_than_sentences(self):
        f = np.array([[1, 0], [1, 0], [0, 1], [0, 1]], np.float32)
        s = np.array([[1, 0], [0, 1]], np.float32)
        path = align.dtw_align(f, s)
        m = align.frames_to_sentences(path, 4)
        assert m[0] == [0] and m[3] == [1]

    def test_align_story_with_fake_models(self):
        frames = [np.full((4, 4, 3), v, np.float32) for v in (0.1, 0.9)]

        def image_embed(b):
            return b.reshape(len(b), -1)[:, :2]

        def text_embed(texts):
            return np.array([[0.1] * 2 if "fox" in t else [0.9] * 2
                             for t in texts], np.float32)

        out = align.align_story(frames, "The fox ran. The bear slept.",
                                image_embed, text_embed)
        assert out[0] == ["The fox ran."]
        assert out[1][-1] == "The bear slept."


class TestCaption:
    def test_build_prompt_context_window(self):
        p = caption.build_prompt(["a", "b", "c", "d"], max_context=3)
        assert "- b" in p and "- d" in p and "- a" not in p

    def test_caption_story(self, tmp_path):
        from PIL import Image
        paths = []
        for i in range(2):
            p = str(tmp_path / f"f{i}.png")
            Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(p)
            paths.append(p)

        def model(img, prompt):
            return f"caption with ctx {prompt.count('-')}"

        caps = caption.caption_story(paths, model, out_dir=str(tmp_path))
        assert caps == ["caption with ctx 0", "caption with ctx 1"]
        assert (tmp_path / "f1.txt").read_text() == caps[1]


class TestInpaint:
    @pytest.mark.slow
    def test_tpu_inpaint_preserves_unmasked(self):
        from storygen_tpu.configs import UNetConfig, VAEConfig
        from storygen_tpu.models.unet import UNet2DConditionModel
        from storygen_tpu.models.vae import AutoencoderKL
        from storygen_tpu.data_process.inpaint import TPUInpainter

        rng = jax.random.PRNGKey(0)
        unet = UNet2DConditionModel(config=UNetConfig(
            block_out_channels=(16, 32, 32, 32), attention_head_dim=4,
            norm_num_groups=4, cross_attention_dim=16))
        up = jax.jit(unet.init)(rng, jnp.zeros((1, 8, 8, 4)),
                                jnp.asarray([0]), jnp.zeros((1, 4, 16)))
        vae = AutoencoderKL(config=VAEConfig(
            block_out_channels=(8, 8, 8, 8), layers_per_block=1,
            norm_num_groups=2))
        vp = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
        inp = TPUInpainter(unet, vae)
        params = {"unet": up, "vae": vp}

        lat0 = jax.random.normal(rng, (1, 8, 8, 4)) * 0.3
        mask = jnp.zeros((1, 8, 8, 1)).at[:, 2:5, 2:5].set(1.0)
        text = jnp.zeros((1, 4, 16))
        out = inp.inpaint_latents(params, lat0, mask, text,
                                  jax.random.PRNGKey(1),
                                  num_inference_steps=4)
        # unmasked region exactly preserved
        keep = np.asarray(1 - mask)
        np.testing.assert_allclose(np.asarray(out) * keep,
                                   np.asarray(lat0) * keep, atol=1e-5)
        # masked region actually changed
        assert not np.allclose(np.asarray(out) * np.asarray(mask),
                               np.asarray(lat0) * np.asarray(mask))
