"""Cross-implementation goldens for the first-party YOLOv7.

A plain-torch TRAIN-FORM mirror (Conv+BN+SiLU, RepConv branch trio,
IDetect with implicit knowledge — the module semantics of the
reference's vendored yolov7, data_process/yolov7/models/common.py and
models/yolo.py) is built from the SAME spec table, its state_dict is
fused through ``import_yolov7_params``, and the flax deploy model must
reproduce the torch eval forward. This pins both the graph and every
fusion identity (conv+BN, RepConv reparam, implicitA/M folding)."""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from storygen_tpu.detection.yolov7 import (  # noqa: E402
    ANCHORS_P5, STRIDES_P5, YOLOv7, decode_boxes, import_yolov7_params,
    letterbox, load_torch_state, nms_jax, scaled_spec)

WIDTH = 0.25
NC = 6


# ----------------------------------------------------------- torch mirror
class TConv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TRepConv(tnn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.rbr_dense = tnn.Sequential(
            tnn.Conv2d(c1, c2, 3, 1, 1, bias=False),
            tnn.BatchNorm2d(c2, eps=1e-3))
        self.rbr_1x1 = tnn.Sequential(
            tnn.Conv2d(c1, c2, 1, 1, 0, bias=False),
            tnn.BatchNorm2d(c2, eps=1e-3))
        self.rbr_identity = (tnn.BatchNorm2d(c1, eps=1e-3)
                             if c1 == c2 else None)
        self.act = tnn.SiLU()

    def forward(self, x):
        idv = self.rbr_identity(x) if self.rbr_identity is not None else 0
        return self.act(self.rbr_dense(x) + self.rbr_1x1(x) + idv)


class TSPPCSPC(tnn.Module):
    def __init__(self, c1, c2, k=(5, 9, 13)):
        super().__init__()
        c_ = c2  # e=0.5 => hidden = 2*c2*0.5
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c1, c_, 1, 1)
        self.cv3 = TConv(c_, c_, 3, 1)
        self.cv4 = TConv(c_, c_, 1, 1)
        self.m = tnn.ModuleList(
            [tnn.MaxPool2d(kernel_size=x, stride=1, padding=x // 2)
             for x in k])
        self.cv5 = TConv(4 * c_, c_, 1, 1)
        self.cv6 = TConv(c_, c_, 3, 1)
        self.cv7 = TConv(2 * c_, c2, 1, 1)

    def forward(self, x):
        x1 = self.cv4(self.cv3(self.cv1(x)))
        y1 = self.cv6(self.cv5(
            torch.cat([x1] + [m(x1) for m in self.m], 1)))
        return self.cv7(torch.cat((y1, self.cv2(x)), 1))


class TImplicit(tnn.Module):
    def __init__(self, ch, mul):
        super().__init__()
        init = torch.ones(1, ch, 1, 1) if mul else torch.zeros(1, ch, 1, 1)
        self.implicit = tnn.Parameter(init + 0.05 * torch.randn_like(init))
        self.mul = mul

    def forward(self, x):
        return self.implicit * x if self.mul else self.implicit + x


class TDetect(tnn.Module):
    def __init__(self, nc, ch):
        super().__init__()
        self.no = nc + 5
        self.na = ANCHORS_P5.shape[1]
        self.m = tnn.ModuleList(
            tnn.Conv2d(c, self.no * self.na, 1) for c in ch)
        self.ia = tnn.ModuleList(TImplicit(c, mul=False) for c in ch)
        self.im = tnn.ModuleList(
            TImplicit(self.no * self.na, mul=True) for _ in ch)

    def forward(self, xs):
        return [self.im[i](self.m[i](self.ia[i](xs[i])))
                for i in range(len(xs))]


class TorchYOLOv7(tnn.Module):
    """Graph interpreter over the same spec table, NCHW train-form."""

    def __init__(self, spec, nc):
        super().__init__()
        self.spec = spec
        chans = {-1: 3}
        mods = []
        for i, e in enumerate(spec):
            kind = e[0]
            if kind == 'conv':
                mods.append(TConv(chans[e[1]], e[2], e[3], e[4]))
                chans[i] = e[2]
            elif kind == 'repconv':
                mods.append(TRepConv(chans[e[1]], e[2]))
                chans[i] = e[2]
            elif kind == 'sppcspc':
                mods.append(TSPPCSPC(chans[e[1]], e[2]))
                chans[i] = e[2]
            elif kind == 'mp':
                mods.append(tnn.MaxPool2d(2, 2))
                chans[i] = chans[e[1]]
            elif kind == 'up':
                mods.append(tnn.Upsample(scale_factor=2, mode='nearest'))
                chans[i] = chans[e[1]]
            elif kind == 'cat':
                mods.append(tnn.Identity())
                chans[i] = sum(chans[f] for f in e[1])
            elif kind == 'detect':
                mods.append(TDetect(nc, [chans[f] for f in e[1]]))
        self.model = tnn.Sequential(*mods)

    def forward(self, x):
        saved = {-1: x}
        for i, e in enumerate(self.spec):
            kind = e[0]
            if kind == 'cat':
                saved[i] = torch.cat([saved[f] for f in e[1]], 1)
            elif kind == 'detect':
                return self.model[i]([saved[f] for f in e[1]])
            else:
                saved[i] = self.model[i](saved[e[1]])


def _randomize_bn(model):
    """Give every BN nontrivial running stats so fusion is exercised."""
    g = torch.Generator().manual_seed(7)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(0.3 * torch.randn(
                m.num_features, generator=g))
            m.running_var.copy_(0.5 + torch.rand(
                m.num_features, generator=g))
            with torch.no_grad():
                m.weight.copy_(1 + 0.2 * torch.randn(
                    m.num_features, generator=g))
                m.bias.copy_(0.2 * torch.randn(
                    m.num_features, generator=g))


@pytest.fixture(scope="module")
def mirror():
    torch.manual_seed(0)
    spec = scaled_spec(WIDTH)
    tm = TorchYOLOv7(spec, NC).eval()
    _randomize_bn(tm)
    return spec, tm


def test_full_graph_golden(mirror):
    """Flax deploy forward == torch train-form eval forward, whole graph."""
    spec, tm = mirror
    x = torch.randn(2, 3, 128, 96)
    with torch.no_grad():
        t_outs = tm(x)
    variables = import_yolov7_params(
        {k: v.numpy() for k, v in tm.state_dict().items()},
        spec=spec, num_classes=NC)
    j_outs = YOLOv7(spec=spec, num_classes=NC).apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert len(j_outs) == 3
    for t, j in zip(t_outs, j_outs):
        np.testing.assert_allclose(
            np.transpose(t.numpy(), (0, 2, 3, 1)), np.asarray(j),
            atol=2e-4, rtol=2e-4)


def test_decode_matches_torch_reference_math(mirror):
    """decode_boxes == the IDetect inference decode (yolo.py:121-139)."""
    spec, tm = mirror
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        t_outs = tm(x)
    zs = []
    for i, o in enumerate(t_outs):
        bs, _, ny, nx = o.shape
        o = o.view(bs, 3, NC + 5, ny, nx).permute(0, 1, 3, 4, 2)
        y = o.sigmoid()
        yv, xv = torch.meshgrid(torch.arange(ny), torch.arange(nx),
                                indexing="ij")
        grid = torch.stack((xv, yv), 2).view(1, 1, ny, nx, 2).float()
        y[..., 0:2] = (y[..., 0:2] * 2. - 0.5 + grid) * STRIDES_P5[i]
        y[..., 2:4] = (y[..., 2:4] * 2) ** 2 * \
            torch.tensor(ANCHORS_P5[i]).view(1, 3, 1, 1, 2)
        # torch layout is (bs, na, ny, nx, no); ours (bs, ny, nx, na, no)
        zs.append(y.permute(0, 2, 3, 1, 4).reshape(bs, -1, NC + 5))
    ref = torch.cat(zs, 1).numpy()
    ours = decode_boxes(
        [jnp.asarray(o.numpy().transpose(0, 2, 3, 1)) for o in t_outs],
        num_classes=NC)
    np.testing.assert_allclose(ref, np.asarray(ours), atol=1e-4, rtol=1e-4)


def test_repconv_identity_branch_fusion():
    """c1==c2 RepConv (identity-BN branch) fuses exactly."""
    torch.manual_seed(1)
    rep = TRepConv(16, 16).eval()
    _randomize_bn(rep)
    state = {f"model.0.{k}": v.numpy() for k, v in rep.state_dict().items()}
    variables = import_yolov7_params(
        state, spec=(('repconv', -1, 16),), num_classes=NC)
    x = torch.randn(1, 16, 8, 8)
    with torch.no_grad():
        ref = rep(x)
    # a detect-less spec returns no head maps; apply the fused conv
    # params directly
    from storygen_tpu.detection.yolov7 import _FusedConv
    got = _FusedConv(16, 3).apply(
        {"params": variables["params"]["m0"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.transpose(ref.numpy(), (0, 2, 3, 1)), np.asarray(got),
        atol=1e-5, rtol=1e-5)


def test_nms_semantics():
    """conf = obj*cls, best class only, class-aware suppression."""
    nc = 3
    # xywh boxes: A and B overlap heavily same class; C same coords but
    # different class; D far away; E below confidence.
    def row(x, y, w, h, obj, cls_scores):
        return [x, y, w, h, obj] + cls_scores
    pred = jnp.array([
        row(50, 50, 20, 20, 0.9, [0.9, 0.05, 0.05]),   # A cls0 conf .81
        row(52, 51, 20, 20, 0.8, [0.8, 0.1, 0.1]),     # B cls0, iou>.45
        row(50, 50, 20, 20, 0.8, [0.1, 0.85, 0.05]),   # C cls1, survives
        row(200, 200, 10, 10, 0.7, [0.6, 0.2, 0.2]),   # D cls0, far
        row(300, 300, 10, 10, 0.2, [0.5, 0.3, 0.2]),   # E conf .1 < thres
    ], jnp.float32)
    boxes, score, cls, valid = nms_jax(pred, conf_thres=0.25,
                                       iou_thres=0.45, max_det=5)
    kept = {(int(c), round(float(s), 2))
            for c, s, v in zip(cls, score, valid) if v}
    assert (0, 0.81) in kept            # A
    assert (1, 0.68) in kept            # C not suppressed by A (class)
    assert (0, 0.42) in kept            # D
    assert len(kept) == 3               # B suppressed, E filtered
    # person-only filter
    _, _, cls2, valid2 = nms_jax(pred, conf_thres=0.25, class_filter=0)
    assert all(int(c) == 0 for c, v in zip(cls2, valid2) if v)


def test_letterbox_geometry():
    img = np.random.randint(0, 255, (100, 300, 3), np.uint8)
    out, r, (px, py) = letterbox(img, 320, stride=32)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert math.isclose(r, 320 / 300, rel_tol=1e-6)
    nh = round(100 * r)
    assert out.shape[1] == 320
    # content occupies [py, py+nh)
    assert np.all(out[:py] == 114 / 255) if py else True
    assert out.dtype == np.float32 and out.max() <= 1.0


def test_lenient_unpickler_extracts_pickled_module(tmp_path, mirror):
    """Official-release-style checkpoint (pickled nn.Module whose class
    defs are unavailable) loads through the stub unpickler."""
    import sys
    import types
    spec, tm = mirror
    # re-home the mirror classes in a throwaway module, pickle, delete it
    mod = types.ModuleType("yolov7_ephemeral")
    sys.modules["yolov7_ephemeral"] = mod
    for cls in (TorchYOLOv7, TConv, TRepConv, TSPPCSPC, TDetect, TImplicit):
        setattr(mod, cls.__name__, cls)
        cls.__module__ = "yolov7_ephemeral"
    path = str(tmp_path / "ckpt.pt")
    try:
        torch.save({"model": tm}, path)
    finally:
        del sys.modules["yolov7_ephemeral"]
        for cls in (TorchYOLOv7, TConv, TRepConv, TSPPCSPC, TDetect,
                    TImplicit):
            cls.__module__ = __name__
    state = load_torch_state(path)
    ref = {k: v.numpy() for k, v in tm.state_dict().items()}
    assert set(ref) <= set(state)
    for k in ref:
        np.testing.assert_array_equal(ref[k], state[k])


def test_detectors_chain_missing_weights():
    """detectors.py resolution order degrades to None cleanly."""
    from storygen_tpu.data_process import detectors
    assert detectors.yolov7_person_detector("/nonexistent.pt") is None
    assert detectors.default_person_detector(
        yolo_weights="/nonexistent.pt") is None
