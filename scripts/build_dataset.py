"""Dataset-construction driver: chain the StorySalon preprocessing stages
over a directory of story videos (data_process/README.md:4-9 sequence:
extract -> dedup -> mask -> inpaint -> align -> caption).

External models (person/OCR detectors, embedders, captioners) plug in via
--*-backend flags; stages with missing backends are skipped with a notice,
so partial pipelines still run (e.g. extraction + dedup only).

  python scripts/build_dataset.py --videos ./videos --out ./StorySalon \
      --stages extract,dedup
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", required=True,
                    help="directory of <story_id>.mp4 (+ optional .vtt)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--stages", default="extract,dedup,mask,align",
                    help="comma list: extract,dedup,mask,inpaint,align,caption")
    ap.add_argument("--dedup_threshold", type=float, default=0.75)
    ap.add_argument("--ckpt", default=None,
                    help="SD checkpoint folder for TPU inpainting")
    ap.add_argument("--yolo_weights", default=None,
                    help="optional YOLO person-detector weights")
    ap.add_argument("--face_onnx", default=None,
                    help="optional cv2.FaceDetectorYN ONNX file")
    ap.add_argument("--caption_ckpt", default=None,
                    help="local HF image-to-text checkpoint folder for "
                         "the caption stage")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    from storygen_tpu.data_process import dedup, detectors, extract, masking

    videos = sorted(f for f in os.listdir(args.videos)
                    if f.endswith((".mp4", ".mkv", ".webm", ".avi",
                                   ".mov")))
    print(f"{len(videos)} videos, stages: {sorted(stages)}")

    embed_fn = None
    if "dedup" in stages:
        embed_fn = dedup.default_embedder()

    caption_model = None
    if "caption" in stages and args.caption_ckpt:
        from storygen_tpu.data_process import caption as caption_mod
        caption_model = caption_mod.hf_captioner(args.caption_ckpt)

    inpainter = None
    if "inpaint" in stages and args.ckpt:
        from storygen_tpu.checkpoint.hf_import import load_diffusers_pretrained
        from storygen_tpu.data_process.inpaint import TPUInpainter
        import jax.numpy as jnp
        bundle = load_diffusers_pretrained(args.ckpt, dtype=jnp.bfloat16)
        inpainter = (TPUInpainter(bundle["unet"], bundle["vae"]), bundle)

    for vid in videos:
        story = os.path.splitext(vid)[0]
        img_dir = os.path.join(args.out,
                               "image_inpainted_finally_checked", story)
        mask_dir = os.path.join(args.out, "mask", story)

        if "extract" in stages:
            frames = extract.extract_keyframes(
                os.path.join(args.videos, vid), img_dir)
            print(f"[{story}] extracted {len(frames)} keyframes")

        frames = sorted(os.path.join(img_dir, f)
                        for f in os.listdir(img_dir)) \
            if os.path.isdir(img_dir) else []

        if "dedup" in stages and frames:
            kept = dedup.dedup_frames(frames, embed_fn,
                                      threshold=args.dedup_threshold,
                                      delete=True)
            print(f"[{story}] dedup: kept {len(kept)}/{len(frames)}")
            frames = kept

        if "mask" in stages and frames:
            text_det = detectors.default_text_detector()
            person_det = detectors.default_person_detector(
                yolo_weights=args.yolo_weights, face_onnx=args.face_onnx)
            kept = masking.process_directory(
                img_dir, mask_dir, person_detector=person_det,
                text_detector=text_det, delete_rejected=True)
            note = "" if person_det else \
                " (no person detector: text-only masks, no person filter)"
            print(f"[{story}] masks written for {len(kept)} frames{note}")

        if "inpaint" in stages and inpainter and frames:
            import numpy as np
            from PIL import Image
            inp, bundle = inpainter
            from storygen_tpu.data.loader import Tokenizer
            tok = Tokenizer(os.path.join(args.ckpt, "tokenizer"))
            params = {"unet": bundle["unet_params"],
                      "vae": bundle["vae_params"]}
            for f in frames:
                mask_p = os.path.join(mask_dir, os.path.basename(f))
                if not os.path.exists(mask_p):
                    continue
                img = np.asarray(Image.open(f).convert("RGB")
                                 .resize((512, 512)), np.float32) / 255.0
                m = np.asarray(Image.open(mask_p).convert("L")
                               .resize((512, 512)), np.float32) / 255.0
                if m.max() == 0:
                    continue
                out = inp.inpaint_image(params, bundle["text_params"],
                                        bundle["text_encoder"], tok, img, m)
                Image.fromarray((out * 255).astype(np.uint8)).save(f)
            print(f"[{story}] inpainted masked regions")

        if "caption" in stages and caption_model and frames:
            from storygen_tpu.data_process import caption as caption_mod
            cap_dir = os.path.join(args.out, "Text", "Caption", story)
            caps = caption_mod.caption_story(frames, caption_model,
                                             out_dir=cap_dir)
            print(f"[{story}] captioned {len(caps)} frames -> {cap_dir}")

        if "align" in stages:
            vtt = os.path.join(args.videos, story + ".vtt")
            if os.path.exists(vtt):
                print(f"[{story}] transcript ready for align_story() — "
                      "plug CLIP embedders (see data_process/align.py)")

    print("done")


if __name__ == "__main__":
    main()
