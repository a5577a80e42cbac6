"""Generate a synthetic StorySalon-layout dataset (video source) for
end-to-end training runs without the real (unreleasable) corpus.

Layout produced under --root (matching data/datasets.py::StorySalonDataset
and the reference README's dataset section):
  image_inpainted_finally_checked/<story>/<i>.png   512px RGB
  mask/<story>/<i>.png                              binary
  Text/Caption/Video/<story>/<i>.txt                one caption per frame
  video_test_set.txt                                held-out story ids

Content is procedural (colored gradients + shapes keyed on story/frame) —
enough signal for the loss to move and for windows/refs to differ.
"""
import argparse
import os

import numpy as np
from PIL import Image


def frame(story: int, i: int, size: int) -> np.ndarray:
    r = np.random.RandomState(story * 1000 + i)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.stack([
        0.5 + 0.5 * np.sin(2 * np.pi * (xx * (1 + story % 3) + i * 0.1)),
        0.5 + 0.5 * np.cos(2 * np.pi * (yy * (1 + story % 2) - i * 0.07)),
        np.clip(xx * 0.5 + yy * 0.5 + 0.1 * r.randn(size, size), 0, 1),
    ], axis=-1)
    cx, cy = int(size * (0.2 + 0.1 * i)), int(size * (0.3 + 0.08 * story))
    rad = size // 8
    m = (yy * size - cy) ** 2 + (xx * size - cx) ** 2 < rad ** 2
    img[m] = [0.9, 0.3 + 0.1 * (i % 3), 0.2]
    return (img * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_storysalon")
    ap.add_argument("--stories", type=int, default=4)
    ap.add_argument("--frames", type=int, default=7)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--test-stories", type=int, default=1,
                    help="how many trailing stories go to the held-out "
                         "split (video_test_set.txt)")
    args = ap.parse_args()
    assert 0 < args.test_stories < args.stories

    img_root = os.path.join(args.root, "image_inpainted_finally_checked")
    mask_root = os.path.join(args.root, "mask")
    txt_root = os.path.join(args.root, "Text", "Caption", "Video")
    for s in range(args.stories):
        sid = f"synth{s:03d}"
        for d in (os.path.join(img_root, sid), os.path.join(mask_root, sid),
                  os.path.join(txt_root, sid)):
            os.makedirs(d, exist_ok=True)
        for i in range(args.frames):
            Image.fromarray(frame(s, i, args.size)).save(
                os.path.join(img_root, sid, f"{i}.png"))
            m = np.full((args.size, args.size), 255, np.uint8)
            m[: args.size // 10] = 0  # top band "text" region
            Image.fromarray(m).save(
                os.path.join(mask_root, sid, f"{i}.png"))
            with open(os.path.join(txt_root, sid, f"{i}.txt"), "w") as f:
                f.write(f"synthetic story {s} frame {i}: a red circle "
                        f"moves across a gradient field\n")
    # trailing stories held out for validation/quality scoring
    with open(os.path.join(args.root, "video_test_set.txt"), "w") as f:
        for s in range(args.stories - args.test_stories, args.stories):
            f.write(f"synth{s:03d}\n")
    print(f"wrote {args.stories} stories x {args.frames} frames "
          f"at {args.size}px under {args.root} "
          f"({args.test_stories} held out)")


if __name__ == "__main__":
    main()
