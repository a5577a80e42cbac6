"""Generate a synthetic COCO-2017-layout dataset (images + instance
polygons + captions) for end-to-end COCO-stage training runs without the
real corpus. Layout matches data/datasets.py::COCOMultiSegDataset:
  train2017/<id>.jpg
  annotations/instances_train2017.json  (images/annotations/categories)
  annotations/captions_train2017.json
"""
import argparse
import json
import os

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_coco")
    ap.add_argument("--images", type=int, default=12)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    os.makedirs(os.path.join(args.root, "train2017"), exist_ok=True)
    os.makedirs(os.path.join(args.root, "annotations"), exist_ok=True)
    cats = [{"id": 1, "name": "person"}, {"id": 2, "name": "dog"},
            {"id": 3, "name": "car"}]
    images, anns, caps = [], [], []
    s = args.size
    for i in range(args.images):
        r = np.random.RandomState(i)
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        img = np.stack([0.4 + 0.4 * np.sin(6 * xx + i),
                        0.4 + 0.4 * np.cos(5 * yy - i),
                        0.3 + 0.2 * r.rand(s, s)], -1)
        name = f"{i:012d}.jpg"
        # 1-3 colored rectangles = "entities" with polygon segmentations
        n_ent = 1 + i % 3
        for j in range(n_ent):
            x0, y0 = r.randint(0, s // 2, 2)
            w, h = r.randint(s // 8, s // 3, 2)
            x1, y1 = min(x0 + w, s - 1), min(y0 + h, s - 1)
            img[y0:y1, x0:x1] = [0.8, 0.2 + 0.2 * j, 0.1 * j]
            anns.append({"image_id": i, "category_id": cats[j]["id"],
                         "segmentation": [[float(x0), float(y0),
                                           float(x1), float(y0),
                                           float(x1), float(y1),
                                           float(x0), float(y1)]]})
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(args.root, "train2017", name), quality=92)
        images.append({"id": i, "file_name": name, "height": s, "width": s})
        caps.append({"image_id": i,
                     "caption": f"synthetic scene {i} with {n_ent} shapes"})
    with open(os.path.join(args.root, "annotations",
                           "instances_train2017.json"), "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": cats}, f)
    with open(os.path.join(args.root, "annotations",
                           "captions_train2017.json"), "w") as f:
        json.dump({"annotations": caps}, f)
    print(f"wrote {args.images} images at {s}px under {args.root}")


if __name__ == "__main__":
    main()
