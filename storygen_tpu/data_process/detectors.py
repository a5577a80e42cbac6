"""Out-of-the-box detector backends for the masking stage.

The reference masks person boxes from a vendored YOLOv7 and text boxes
from easyocr (data_process/yolov7/human_ocr_mask.py:15-70). This sandbox
(and many deployments) cannot download model weights, so the default
stack degrades gracefully:

  text:   easyocr when importable (reference parity) ->
          first-party classical detector (gradient + morphology +
          contour filtering; weights-free) otherwise.
  person: first-party flax YOLOv7 (detection/yolov7.py — runs the
          official yolov7.pt weights on TPU, no vendored torch repo) ->
          YOLO via torch.hub / TorchScript -> cv2.FaceDetectorYN when
          an ONNX file is provided (the masked regions the reference
          inpaints are presenter faces/hands, data_process/SDM/
          inpaint.py) -> None (stage still writes text-only masks).

All detectors share one contract:
  detector(image HWC uint8 RGB) -> [(x1, y1, x2, y2), ...]
"""
from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import numpy as np

Box = Tuple[float, float, float, float]


# ------------------------------------------------------------------ text
def classical_text_detector(min_height: int = 8,
                            max_height_frac: float = 0.25,
                            min_aspect: float = 1.1,
                            min_fill: float = 0.25,
                            connect_width: int = 15) -> Callable:
    """First-party weights-free text-region detector.

    Overlay text (subtitles, scene text the reference masks with easyocr
    boxes) is high-contrast and horizontally structured. Pipeline:
    morphological gradient -> Otsu binarize -> horizontal close (connects
    characters into line blobs) -> contour boxes filtered by height,
    aspect ratio and ink density.
    """
    import cv2

    def detect(image: np.ndarray) -> List[Box]:
        gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY) \
            if image.ndim == 3 else image
        h, w = gray.shape
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        grad = cv2.morphologyEx(gray, cv2.MORPH_GRADIENT, kernel)
        _, bw = cv2.threshold(grad, 0, 255,
                              cv2.THRESH_BINARY | cv2.THRESH_OTSU)
        connect = cv2.getStructuringElement(cv2.MORPH_RECT,
                                            (connect_width, 1))
        closed = cv2.morphologyEx(bw, cv2.MORPH_CLOSE, connect)
        contours, _ = cv2.findContours(closed, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        boxes: List[Box] = []
        for c in contours:
            x, y, bw_, bh = cv2.boundingRect(c)
            if bh < min_height or bh > h * max_height_frac:
                continue
            if bw_ < min_aspect * bh:
                continue
            patch = bw[y:y + bh, x:x + bw_]
            if float((patch > 0).mean()) < min_fill:
                continue
            boxes.append((float(x), float(y), float(x + bw_),
                          float(y + bh)))
        return boxes

    return detect


def easyocr_text_detector(langs=("en",), conf: float = 0.3
                          ) -> Optional[Callable]:
    """Reference-parity OCR boxes (human_ocr_mask.py:61-66); None when
    easyocr is not importable."""
    try:
        import easyocr
    except ImportError:
        return None
    reader = easyocr.Reader(list(langs))

    def detect(image: np.ndarray) -> List[Box]:
        boxes: List[Box] = []
        for quad, _text, score in reader.readtext(np.asarray(image)):
            if score < conf:
                continue
            xs = [p[0] for p in quad]
            ys = [p[1] for p in quad]
            boxes.append((min(xs), min(ys), max(xs), max(ys)))
        return boxes

    return detect


def default_text_detector() -> Callable:
    return easyocr_text_detector() or classical_text_detector()


# ---------------------------------------------------------------- person
def yolov7_person_detector(weights: str,
                           conf: float = 0.5) -> Optional[Callable]:
    """First-party TPU-native YOLOv7 (detection/yolov7.py): the flax
    re-implementation of the graph the reference vendors, fed by the
    official yolov7.pt (or any state_dict export of it). Returns None
    when the weights file is absent or unreadable."""
    if not (weights and os.path.exists(weights)):
        return None
    try:
        from storygen_tpu.detection.yolov7 import yolov7_person_detector \
            as build
        return build(weights, conf=conf)
    except Exception:
        return None


def yolo_person_detector(weights: Optional[str] = None,
                         conf: float = 0.5) -> Optional[Callable]:
    """YOLO person boxes (class 0), reference human_ocr_mask.py:15-56
    semantics. Loads local weights via torch.hub's yolov5 packaging or a
    TorchScript file; None when nothing loadable is available."""
    try:
        import torch
    except ImportError:
        return None
    model = None
    if weights and os.path.exists(weights):
        try:
            model = torch.jit.load(weights, map_location="cpu")
        except Exception:
            try:
                model = torch.hub.load("ultralytics/yolov5", "custom",
                                       path=weights, trust_repo=True)
            except Exception:
                return None
    if model is None:
        return None
    model.eval()

    def detect(image: np.ndarray) -> List[Box]:
        with torch.no_grad():
            res = model(np.asarray(image))
        det = res.xyxy[0].cpu().numpy() if hasattr(res, "xyxy") else \
            np.asarray(res[0])
        boxes = []
        for row in det:
            x1, y1, x2, y2, score, cls = row[:6]
            if int(cls) == 0 and score >= conf:
                boxes.append((float(x1), float(y1), float(x2), float(y2)))
        return boxes

    return detect


def face_person_detector(onnx_path: str, conf: float = 0.7,
                         expand: float = 0.35) -> Optional[Callable]:
    """cv2.FaceDetectorYN boxes (slightly expanded) as a stand-in for the
    person masking when no YOLO weights exist — the regions the reference
    inpaints away are presenter faces/hands."""
    import cv2
    if not (hasattr(cv2, "FaceDetectorYN_create")
            and os.path.exists(onnx_path)):
        return None
    det = cv2.FaceDetectorYN_create(onnx_path, "", (320, 320), conf)

    def detect(image: np.ndarray) -> List[Box]:
        h, w = image.shape[:2]
        det.setInputSize((w, h))
        _, faces = det.detect(
            np.ascontiguousarray(image[..., ::-1]))  # RGB -> BGR
        boxes: List[Box] = []
        if faces is None:
            return boxes
        for f in faces:
            x, y, bw, bh = f[:4]
            dx, dy = bw * expand, bh * expand
            boxes.append((max(x - dx, 0), max(y - dy, 0),
                          min(x + bw + dx, w), min(y + bh + dy, h)))
        return boxes

    return detect


def default_person_detector(yolo_weights: Optional[str] = None,
                            face_onnx: Optional[str] = None
                            ) -> Optional[Callable]:
    """Resolution order: first-party flax YOLOv7 (reference-weight
    compatible) -> torch-hub/TorchScript YOLO -> face-detector stand-in
    -> None (text-only masks)."""
    det = None
    if yolo_weights:
        det = yolov7_person_detector(yolo_weights)
        det = det or yolo_person_detector(weights=yolo_weights)
    if det is None and face_onnx:
        det = face_person_detector(face_onnx)
    return det
