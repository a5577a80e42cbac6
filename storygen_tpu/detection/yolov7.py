"""First-party TPU-native YOLOv7 person/object detector.

The reference vendors the entire YOLOv7 repository (~8.3k LoC of torch,
/root/reference/data_process/yolov7/) solely to produce person boxes for
the masking stage (human_ocr_mask.py:15-56). This module replaces it with
a self-contained jax/flax implementation:

  * the canonical YOLOv7-P5 graph (the public yolov7.yaml layer table)
    encoded as a data table and executed by a small NHWC interpreter —
    not a torch translation;
  * the DEPLOY form only: every Conv+BN+SiLU, RepConv branch trio and
    IDetect implicit pair is algebraically fused into a single
    conv(+bias) at import time, so the on-device graph is pure
    conv/concat/maxpool/upsample — exactly what XLA tiles best onto the
    MXU (reference keeps train-form modules and fuses at load,
    models/common.py:99-110,463-560; models/yolo.py:97-141);
  * a weight importer that extracts tensors from the official
    ``yolov7.pt`` release checkpoint WITHOUT the upstream package: a
    lenient unpickler stubs the missing module classes and walks the
    reconstructed object tree for parameters/buffers;
  * box decode + class-aware NMS as jittable JAX (reference:
    utils/general.py non_max_suppression + IDetect inference decode).

Behavioral parity is pinned by tests/test_yolov7.py: a plain-torch
mirror built from the SAME spec table in train form (BN, RepConv
branches, implicit knowledge) is fused through this importer and must
match the flax forward to fp32 tolerance.
"""
from __future__ import annotations

import pickle
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# --------------------------------------------------------------------- spec
# Canonical YOLOv7-P5 layer table (public yolov7.yaml, deploy indices).
# Entries: ('conv', from, c2, k, s) | ('mp', from) | ('up', from)
#        | ('cat', (from...)) | ('sppcspc', from, c2)
#        | ('repconv', from, c2) | ('detect', (from...))
# 'from' is the absolute producing layer index; -1 means the model input.
YOLOV7_P5_SPEC: Tuple[Tuple, ...] = (
    ('conv', -1, 32, 3, 1),    # 0
    ('conv', 0, 64, 3, 2),     # 1  P1/2
    ('conv', 1, 64, 3, 1),     # 2
    ('conv', 2, 128, 3, 2),    # 3  P2/4
    ('conv', 3, 64, 1, 1),     # 4
    ('conv', 3, 64, 1, 1),     # 5
    ('conv', 5, 64, 3, 1),     # 6
    ('conv', 6, 64, 3, 1),     # 7
    ('conv', 7, 64, 3, 1),     # 8
    ('conv', 8, 64, 3, 1),     # 9
    ('cat', (9, 7, 5, 4)),     # 10  ELAN
    ('conv', 10, 256, 1, 1),   # 11
    ('mp', 11),                # 12
    ('conv', 12, 128, 1, 1),   # 13
    ('conv', 11, 128, 1, 1),   # 14
    ('conv', 14, 128, 3, 2),   # 15
    ('cat', (15, 13)),         # 16  P3/8
    ('conv', 16, 128, 1, 1),   # 17
    ('conv', 16, 128, 1, 1),   # 18
    ('conv', 18, 128, 3, 1),   # 19
    ('conv', 19, 128, 3, 1),   # 20
    ('conv', 20, 128, 3, 1),   # 21
    ('conv', 21, 128, 3, 1),   # 22
    ('cat', (22, 20, 18, 17)),  # 23
    ('conv', 23, 512, 1, 1),   # 24
    ('mp', 24),                # 25
    ('conv', 25, 256, 1, 1),   # 26
    ('conv', 24, 256, 1, 1),   # 27
    ('conv', 27, 256, 3, 2),   # 28
    ('cat', (28, 26)),         # 29  P4/16
    ('conv', 29, 256, 1, 1),   # 30
    ('conv', 29, 256, 1, 1),   # 31
    ('conv', 31, 256, 3, 1),   # 32
    ('conv', 32, 256, 3, 1),   # 33
    ('conv', 33, 256, 3, 1),   # 34
    ('conv', 34, 256, 3, 1),   # 35
    ('cat', (35, 33, 31, 30)),  # 36
    ('conv', 36, 1024, 1, 1),  # 37
    ('mp', 37),                # 38
    ('conv', 38, 512, 1, 1),   # 39
    ('conv', 37, 512, 1, 1),   # 40
    ('conv', 40, 512, 3, 2),   # 41
    ('cat', (41, 39)),         # 42  P5/32
    ('conv', 42, 256, 1, 1),   # 43
    ('conv', 42, 256, 1, 1),   # 44
    ('conv', 44, 256, 3, 1),   # 45
    ('conv', 45, 256, 3, 1),   # 46
    ('conv', 46, 256, 3, 1),   # 47
    ('conv', 47, 256, 3, 1),   # 48
    ('cat', (48, 46, 44, 43)),  # 49
    ('conv', 49, 1024, 1, 1),  # 50
    # head
    ('sppcspc', 50, 512),      # 51
    ('conv', 51, 256, 1, 1),   # 52
    ('up', 52),                # 53
    ('conv', 37, 256, 1, 1),   # 54
    ('cat', (54, 53)),         # 55
    ('conv', 55, 256, 1, 1),   # 56
    ('conv', 55, 256, 1, 1),   # 57
    ('conv', 57, 128, 3, 1),   # 58
    ('conv', 58, 128, 3, 1),   # 59
    ('conv', 59, 128, 3, 1),   # 60
    ('conv', 60, 128, 3, 1),   # 61
    ('cat', (61, 60, 59, 58, 57, 56)),  # 62  ELAN-W
    ('conv', 62, 256, 1, 1),   # 63
    ('conv', 63, 128, 1, 1),   # 64
    ('up', 64),                # 65
    ('conv', 24, 128, 1, 1),   # 66
    ('cat', (66, 65)),         # 67
    ('conv', 67, 128, 1, 1),   # 68
    ('conv', 67, 128, 1, 1),   # 69
    ('conv', 69, 64, 3, 1),    # 70
    ('conv', 70, 64, 3, 1),    # 71
    ('conv', 71, 64, 3, 1),    # 72
    ('conv', 72, 64, 3, 1),    # 73
    ('cat', (73, 72, 71, 70, 69, 68)),  # 74
    ('conv', 74, 128, 1, 1),   # 75  P3 head
    ('mp', 75),                # 76
    ('conv', 76, 128, 1, 1),   # 77
    ('conv', 75, 128, 1, 1),   # 78
    ('conv', 78, 128, 3, 2),   # 79
    ('cat', (79, 77, 63)),     # 80
    ('conv', 80, 256, 1, 1),   # 81
    ('conv', 80, 256, 1, 1),   # 82
    ('conv', 82, 128, 3, 1),   # 83
    ('conv', 83, 128, 3, 1),   # 84
    ('conv', 84, 128, 3, 1),   # 85
    ('conv', 85, 128, 3, 1),   # 86
    ('cat', (86, 85, 84, 83, 82, 81)),  # 87
    ('conv', 87, 256, 1, 1),   # 88  P4 head
    ('mp', 88),                # 89
    ('conv', 89, 256, 1, 1),   # 90
    ('conv', 88, 256, 1, 1),   # 91
    ('conv', 91, 256, 3, 2),   # 92
    ('cat', (92, 90, 51)),     # 93
    ('conv', 93, 512, 1, 1),   # 94
    ('conv', 93, 512, 1, 1),   # 95
    ('conv', 95, 256, 3, 1),   # 96
    ('conv', 96, 256, 3, 1),   # 97
    ('conv', 97, 256, 3, 1),   # 98
    ('conv', 98, 256, 3, 1),   # 99
    ('cat', (99, 98, 97, 96, 95, 94)),  # 100
    ('conv', 100, 512, 1, 1),  # 101  P5 head
    ('repconv', 75, 256),      # 102
    ('repconv', 88, 512),      # 103
    ('repconv', 101, 1024),    # 104
    ('detect', (102, 103, 104)),  # 105
)

ANCHORS_P5 = np.array(
    [[[12, 16], [19, 36], [40, 28]],
     [[36, 75], [76, 55], [72, 146]],
     [[142, 110], [192, 243], [459, 401]]], np.float32)
STRIDES_P5 = (8, 16, 32)


def scaled_spec(width: float) -> Tuple[Tuple, ...]:
    """Channel-scaled copy of the P5 graph (test-size variants). Widths
    are rounded to multiples of 8 with a floor of 8."""
    def s(c):
        return max(8, int(round(c * width / 8)) * 8)
    out = []
    for e in YOLOV7_P5_SPEC:
        if e[0] in ('conv', 'repconv', 'sppcspc'):
            out.append((e[0], e[1], s(e[2])) + e[3:])
        else:
            out.append(e)
    return tuple(out)


# -------------------------------------------------------------------- model
class _FusedConv(nn.Module):
    """conv + bias (+SiLU): the deploy form of reference Conv/RepConv."""
    features: int
    kernel: int = 1
    stride: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, cin = self.kernel, x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        p = k // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            (self.stride, self.stride), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + b.astype(self.dtype)
        return nn.silu(y) if self.act else y


class _SPPCSPC(nn.Module):
    """CSP spatial pyramid (reference common.py:262-280), deploy-fused."""
    features: int
    pool_sizes: Tuple[int, ...] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_ = self.features  # e=0.5: hidden = 2*c2*0.5
        cv = lambda i, c, k: _FusedConv(c, k, dtype=self.dtype,
                                        name=f"cv{i}")
        x1 = cv(4, c_, 1)(cv(3, c_, 3)(cv(1, c_, 1)(x)))
        pools = [x1] + [
            nn.max_pool(x1, (k, k), strides=(1, 1),
                        padding=((k // 2, k // 2), (k // 2, k // 2)))
            for k in self.pool_sizes]
        y1 = cv(6, c_, 3)(cv(5, c_, 1)(jnp.concatenate(pools, -1)))
        y2 = cv(2, c_, 1)(x)
        return cv(7, self.features, 1)(jnp.concatenate([y1, y2], -1))


class YOLOv7(nn.Module):
    """Graph-interpreted YOLOv7 (deploy form), NHWC.

    Returns per-scale raw head maps (B, ny, nx, na*(5+nc)) — decode with
    :func:`decode_boxes`. Param tree: ``m{i}`` per spec row (fused convs
    carry kernel+bias only, so the official-checkpoint import is exact).
    """
    spec: Tuple[Tuple, ...] = YOLOV7_P5_SPEC
    num_classes: int = 80
    num_anchors: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        saved: Dict[int, jax.Array] = {-1: x.astype(self.dtype)}
        no = self.num_anchors * (5 + self.num_classes)
        outs: List[jax.Array] = []
        for i, e in enumerate(self.spec):
            kind = e[0]
            if kind == 'conv':
                y = _FusedConv(e[2], e[3], e[4], dtype=self.dtype,
                               name=f"m{i}")(saved[e[1]])
            elif kind == 'repconv':
                y = _FusedConv(e[2], 3, 1, dtype=self.dtype,
                               name=f"m{i}")(saved[e[1]])
            elif kind == 'sppcspc':
                y = _SPPCSPC(e[2], dtype=self.dtype,
                             name=f"m{i}")(saved[e[1]])
            elif kind == 'mp':
                y = nn.max_pool(saved[e[1]], (2, 2), strides=(2, 2))
            elif kind == 'up':
                s = saved[e[1]]
                y = jnp.repeat(jnp.repeat(s, 2, axis=1), 2, axis=2)
            elif kind == 'cat':
                y = jnp.concatenate([saved[f] for f in e[1]], -1)
            elif kind == 'detect':
                for j, f in enumerate(e[1]):
                    outs.append(_FusedConv(no, 1, act=False,
                                           dtype=self.dtype,
                                           name=f"m{i}_{j}")(saved[f]))
                continue
            else:  # pragma: no cover
                raise ValueError(f"unknown spec entry {e}")
            saved[i] = y
        return outs


def decode_boxes(outs: Sequence[jax.Array], num_classes: int = 80,
                 anchors: np.ndarray = ANCHORS_P5,
                 strides: Sequence[int] = STRIDES_P5) -> jax.Array:
    """IDetect inference decode (reference models/yolo.py:121-139):
    sigmoid everything; xy = (2s-0.5+grid)*stride, wh = (2s)^2*anchor.
    Returns (B, total_anchors, 5+nc) with xywh in input-pixel space."""
    na = anchors.shape[1]
    zs = []
    for i, o in enumerate(outs):
        b, ny, nx, _ = o.shape
        o = o.reshape(b, ny, nx, na, 5 + num_classes).astype(jnp.float32)
        y = jax.nn.sigmoid(o)
        gx, gy = jnp.meshgrid(jnp.arange(nx, dtype=jnp.float32),
                              jnp.arange(ny, dtype=jnp.float32))
        grid = jnp.stack([gx, gy], -1)[:, :, None, :]      # (ny,nx,1,2)
        anc = jnp.asarray(anchors[i])[None, None, :, :]    # (1,1,na,2)
        xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * float(strides[i])
        wh = (y[..., 2:4] * 2.0) ** 2 * anc
        zs.append(jnp.concatenate([xy, wh, y[..., 4:]], -1)
                  .reshape(b, ny * nx * na, 5 + num_classes))
    return jnp.concatenate(zs, axis=1)


# ---------------------------------------------------------------------- nms
def nms_jax(pred: jax.Array, conf_thres: float = 0.25,
            iou_thres: float = 0.45, max_det: int = 300,
            class_filter: Optional[int] = None) -> Tuple[jax.Array, ...]:
    """Class-aware greedy NMS over one image's decoded predictions,
    jittable with static output size (reference utils/general.py
    non_max_suppression semantics: conf = obj*cls, best-class-only,
    boxes offset by class so NMS never suppresses across classes).

    pred: (N, 5+nc) xywh+obj+cls. Returns (boxes_xyxy (max_det,4),
    scores (max_det,), classes (max_det,), valid mask (max_det,))."""
    nc = pred.shape[-1] - 5
    obj = pred[:, 4]
    cls_conf = pred[:, 5:] * obj[:, None]
    cls = jnp.argmax(cls_conf, axis=-1)
    score = jnp.max(cls_conf, axis=-1)
    keep = score >= conf_thres
    if class_filter is not None:
        keep &= cls == class_filter
    score = jnp.where(keep, score, 0.0)

    xy, wh = pred[:, 0:2], pred[:, 2:4]
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)  # xyxy

    n = min(max_det, pred.shape[0])
    top_score, top_idx = jax.lax.top_k(score, n)
    top_boxes = boxes[top_idx]
    top_cls = cls[top_idx]

    # class offset trick: shift each class into its own coordinate island
    off = top_cls.astype(jnp.float32)[:, None] * 7680.0
    ob = top_boxes + off  # same shift on x1,y1,x2,y2
    area = jnp.maximum(ob[:, 2] - ob[:, 0], 0) * \
        jnp.maximum(ob[:, 3] - ob[:, 1], 0)
    lt = jnp.maximum(ob[:, None, :2], ob[None, :, :2])
    rb = jnp.minimum(ob[:, None, 2:], ob[None, :, 2:])
    inter = jnp.prod(jnp.maximum(rb - lt, 0), -1)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)

    def body(i, alive):
        # i-th highest box, if still alive, kills later overlapping boxes
        row = (iou[i] > iou_thres) & (jnp.arange(n) > i) & alive[i]
        return alive & ~row

    alive = jax.lax.fori_loop(0, n, body, top_score > 0)
    return top_boxes, top_score, top_cls, alive


# ------------------------------------------------------------------ letterbox
def letterbox(image: np.ndarray, new_size: int = 640,
              stride: int = 32) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Aspect-preserving resize + gray pad (reference utils/datasets.py
    letterbox, auto minimal-rectangle mode). Returns (padded float image
    in [0,1], scale, (pad_x, pad_y))."""
    import cv2
    h, w = image.shape[:2]
    r = min(new_size / h, new_size / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    ph = (-nh) % stride
    pw = (-nw) % stride
    top, left = ph // 2, pw // 2
    resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    out = np.full((nh + ph, nw + pw, 3), 114, np.uint8)
    out[top:top + nh, left:left + nw] = resized
    return out.astype(np.float32) / 255.0, r, (left, top)


# ------------------------------------------------------------------ importer
class _Stub:
    """Placeholder instance for unresolvable pickled classes."""


class _LenientUnpickler(pickle.Unpickler):
    """Unpickles a torch checkpoint whose module classes are missing by
    substituting stub classes: tensors rebuild normally (torch._utils is
    importable), module objects become attribute bags we can walk."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return type(name, (_Stub,), {"__module__": module})


def _walk_state(obj, prefix, out):
    """Collect {dotted_key: tensor} from a stubbed nn.Module tree (its
    __dict__ keeps _parameters/_buffers/_modules ordered dicts)."""
    import torch
    if isinstance(obj, torch.Tensor):
        out[prefix.rstrip(".")] = obj
        return
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return
    for field in ("_parameters", "_buffers"):
        for k, v in (d.get(field) or {}).items():
            if v is not None:
                out[prefix + k] = v
    for k, v in (d.get("_modules") or {}).items():
        _walk_state(v, f"{prefix}{k}.", out)


def load_torch_state(path: str) -> Dict[str, "np.ndarray"]:
    """Extract a flat fp32 numpy state_dict from a YOLOv7 checkpoint.

    Handles: plain state_dict files, {'model': state_dict}, and the
    official release .pt (zipfile with a pickled Model whose class defs
    we don't have — stubbed and walked)."""
    import torch
    try:
        obj = torch.load(path, map_location="cpu", weights_only=False,
                         pickle_module=_LenientPickleModule)
    except TypeError:  # older torch without the weights_only kwarg
        obj = torch.load(path, map_location="cpu",
                         pickle_module=_LenientPickleModule)
    state: Dict[str, Any] = {}
    if isinstance(obj, dict):
        cand = obj.get("model", obj.get("ema", obj))
        if isinstance(cand, dict):
            state = dict(cand)
        else:  # stubbed or real nn.Module
            _walk_state(cand, "", state)
    else:
        _walk_state(obj, "", state)
    out = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().float().numpy()
    if not out:
        raise ValueError(f"no tensors found in {path}")
    return out


class _LenientPickleModule:
    Unpickler = _LenientUnpickler

    @staticmethod
    def load(f, **kw):
        return _LenientUnpickler(f).load()


def _fuse_conv_bn(w, bn_g, bn_b, bn_m, bn_v, eps=1e-3):
    """Fold BatchNorm into the preceding conv (OIHW in, OIHW out).
    YOLOv7 BatchNorm2d uses eps=1e-3 (models/yolo.py initialization)."""
    std = np.sqrt(bn_v + eps)
    scale = bn_g / std
    return w * scale[:, None, None, None], bn_b - bn_m * scale


def _oihw_to_hwio(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def import_yolov7_params(state: Dict[str, np.ndarray],
                         spec: Tuple[Tuple, ...] = YOLOV7_P5_SPEC,
                         num_classes: int = 80,
                         num_anchors: int = 3,
                         prefix: str = "model.") -> Dict:
    """Map an upstream train-form state_dict onto the fused flax tree.

    Per spec row i (upstream nn.Sequential index i):
      conv:    model.i.conv.weight + model.i.bn.* -> fused kernel/bias
      sppcspc: model.i.cv{1..7}.{conv,bn} -> fused
      repconv: 3x3 + padded 1x1 + identity-BN branches summed
               (common.py get_equivalent_kernel_bias)
      detect:  model.i.m.j (1x1 conv) with ImplicitA folded into bias
               and ImplicitM scaling both (yolo.py IDetect.fuse)
    """
    def g(k):
        key = prefix + k
        if key not in state:
            raise KeyError(f"missing {key}")
        return state[key]

    def fused(base):
        w, b = _fuse_conv_bn(g(f"{base}.conv.weight"),
                             g(f"{base}.bn.weight"), g(f"{base}.bn.bias"),
                             g(f"{base}.bn.running_mean"),
                             g(f"{base}.bn.running_var"))
        return {"kernel": _oihw_to_hwio(w), "bias": b}

    params: Dict[str, Any] = {}
    for i, e in enumerate(spec):
        kind = e[0]
        if kind == 'conv':
            params[f"m{i}"] = fused(str(i))
        elif kind == 'sppcspc':
            params[f"m{i}"] = {f"cv{j}": fused(f"{i}.cv{j}")
                               for j in range(1, 8)}
        elif kind == 'repconv':
            w3, b3 = _fuse_conv_bn(
                g(f"{i}.rbr_dense.0.weight"),
                g(f"{i}.rbr_dense.1.weight"), g(f"{i}.rbr_dense.1.bias"),
                g(f"{i}.rbr_dense.1.running_mean"),
                g(f"{i}.rbr_dense.1.running_var"), eps=1e-3)
            w1, b1 = _fuse_conv_bn(
                g(f"{i}.rbr_1x1.0.weight"),
                g(f"{i}.rbr_1x1.1.weight"), g(f"{i}.rbr_1x1.1.bias"),
                g(f"{i}.rbr_1x1.1.running_mean"),
                g(f"{i}.rbr_1x1.1.running_var"), eps=1e-3)
            w = w3 + np.pad(w1, ((0, 0), (0, 0), (1, 1), (1, 1)))
            b = b3 + b1
            if f"{prefix}{i}.rbr_identity.weight" in state:
                cin = w3.shape[1]
                wid = np.zeros_like(w3)
                wid[np.arange(w3.shape[0]), np.arange(cin) % cin, 1, 1] = 1
                wi, bi = _fuse_conv_bn(
                    wid, g(f"{i}.rbr_identity.weight"),
                    g(f"{i}.rbr_identity.bias"),
                    g(f"{i}.rbr_identity.running_mean"),
                    g(f"{i}.rbr_identity.running_var"), eps=1e-3)
                w, b = w + wi, b + bi
            params[f"m{i}"] = {"kernel": _oihw_to_hwio(w), "bias": b}
        elif kind == 'detect':
            for j in range(len(e[1])):
                w = g(f"{i}.m.{j}.weight")         # (no, c, 1, 1)
                b = g(f"{i}.m.{j}.bias")
                ia = g(f"{i}.ia.{j}.implicit").reshape(-1)   # (c,)
                im = g(f"{i}.im.{j}.implicit").reshape(-1)   # (no,)
                b = b + w[:, :, 0, 0] @ ia
                w = w * im[:, None, None, None]
                b = b * im
                params[f"m{i}_{j}"] = {"kernel": _oihw_to_hwio(w),
                                       "bias": b}
    return jax.tree_util.tree_map(jnp.asarray, {"params": params})


# ------------------------------------------------------------------ adapter
def yolov7_person_detector(weights: str, conf: float = 0.5,
                           iou: float = 0.45, img_size: int = 640,
                           dtype=jnp.float32) -> Callable:
    """detectors.py-contract adapter: image HWC uint8 RGB -> person
    boxes [(x1,y1,x2,y2)...] in original pixel coords, running the
    first-party flax YOLOv7 on the default JAX device."""
    state = load_torch_state(weights)
    model = YOLOv7(dtype=dtype)
    variables = import_yolov7_params(state)

    @jax.jit
    def run(x):
        outs = model.apply(variables, x)
        pred = decode_boxes(outs)
        return nms_jax(pred[0], conf_thres=conf, iou_thres=iou,
                       class_filter=0)

    def detect(image: np.ndarray) -> List[Tuple[float, float, float, float]]:
        padded, r, (px, py) = letterbox(np.asarray(image), img_size)
        boxes, _score, _cls, valid = jax.device_get(
            run(jnp.asarray(padded)[None]))
        h, w = image.shape[:2]
        out = []
        for bx, ok in zip(boxes, valid):
            if not ok:
                continue
            x1 = min(max((bx[0] - px) / r, 0), w)
            y1 = min(max((bx[1] - py) / r, 0), h)
            x2 = min(max((bx[2] - px) / r, 0), w)
            y2 = min(max((bx[3] - py) / r, 0), h)
            if x2 > x1 and y2 > y1:
                out.append((float(x1), float(y1), float(x2), float(y2)))
        return out

    return detect
