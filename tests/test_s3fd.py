"""S3FD parity vs the reference torch implementation (net_s3fd.py loaded
standalone as a test oracle) and decode/NMS semantics vs the reference's
host-loop decode (detect.py:77-92, bbox.py:44-108)."""

import importlib.util
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from s2v_tpu.models.s3fd import (
    S3FD,
    best_boxes,
    decode_all,
    nms_fixed,
    pad_and_smooth_boxes,
)
from s2v_tpu.utils.weights import convert_s3fd

RNG = np.random.RandomState(33)


def load_ref_s3fd():
    spec = importlib.util.spec_from_file_location(
        "ref_net_s3fd",
        "/root/reference/third_part/face_detection/detection/sfd/net_s3fd.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.s3fd


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(3)
    ref = load_ref_s3fd()().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_s3fd(sd)
    return ref, variables


def test_s3fd_forward_parity(models):
    ref, variables = models
    x = RNG.randn(2, 128, 96, 3).astype(np.float32) * 50  # mean-subtracted BGR
    with torch.no_grad():
        olist = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        for i in range(6):
            olist[2 * i] = F.softmax(olist[2 * i], dim=1)

    outs = S3FD().apply(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x)
    )
    assert len(outs) == 6
    for i, (cls, reg) in enumerate(outs):
        want_cls = olist[2 * i].numpy().transpose(0, 2, 3, 1)
        want_reg = olist[2 * i + 1].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(cls), want_cls, rtol=0, atol=2e-4, err_msg=f"cls{i}"
        )
        np.testing.assert_allclose(
            np.asarray(reg), want_reg, rtol=0, atol=2e-3, err_msg=f"reg{i}"
        )


def reference_decode_loop(olist_np):
    """The host loop from detect.py:77-92 in numpy."""
    bboxlist = []
    for i in range(6):
        ocls, oreg = olist_np[2 * i], olist_np[2 * i + 1]  # NCHW
        stride = 2 ** (i + 2)
        for b in range(ocls.shape[0]):
            for hindex in range(ocls.shape[2]):
                for windex in range(ocls.shape[3]):
                    axc = stride / 2 + windex * stride
                    ayc = stride / 2 + hindex * stride
                    score = ocls[b, 1, hindex, windex]
                    loc = oreg[b, :, hindex, windex]
                    prior = np.array([axc, ayc, stride * 4, stride * 4])
                    cxcy = prior[:2] + loc[:2] * 0.1 * prior[2:]
                    wh = prior[2:] * np.exp(loc[2:] * 0.2)
                    box = np.concatenate([cxcy - wh / 2, cxcy - wh / 2 + wh])
                    bboxlist.append((b, box, score))
    return bboxlist


def test_decode_all_matches_reference_loop():
    olist_np = []
    h = w = 32
    for i in range(6):
        fh, fw = h >> (i + 2) if i < 4 else h >> 6 - 0, w >> (i + 2) if i < 4 else w >> 6
        fh = max(h // (2 ** (i + 2)), 1)
        fw = max(w // (2 ** (i + 2)), 1)
        cls = np.abs(RNG.rand(1, 2, fh, fw).astype(np.float32))
        reg = RNG.randn(1, 4, fh, fw).astype(np.float32) * 0.5
        olist_np.extend([cls, reg])

    want = reference_decode_loop(olist_np)
    outs = [
        (jnp.asarray(olist_np[2 * i].transpose(0, 2, 3, 1)),
         jnp.asarray(olist_np[2 * i + 1].transpose(0, 2, 3, 1)))
        for i in range(6)
    ]
    boxes, scores = decode_all(outs)
    boxes, scores = np.asarray(boxes), np.asarray(scores)
    assert boxes.shape[1] == len(want)
    for n, (b, box, score) in enumerate(want):
        np.testing.assert_allclose(boxes[b, n], box, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(scores[b, n], score, rtol=1e-5)


def test_best_box_equals_reference_top_detection():
    """d[0] after score-ordered NMS == global argmax box."""
    n = 50
    boxes = np.abs(RNG.rand(1, n, 4).astype(np.float32)) * 100
    boxes[..., 2:] += boxes[..., :2]  # valid x2 > x1
    scores = RNG.rand(1, n).astype(np.float32)
    outs_boxes = jnp.asarray(boxes)
    idx = int(np.argmax(scores[0]))

    cand, top_scores, keep = nms_fixed(outs_boxes[0], jnp.asarray(scores[0]))
    # the first kept candidate is the global max
    first_kept = int(np.asarray(jnp.argmax(keep)))
    np.testing.assert_allclose(np.asarray(cand)[first_kept], boxes[0, idx])


def test_nms_matches_reference():
    from importlib import util as _u

    n = 40
    dets = np.zeros((n, 5), np.float32)
    dets[:, 0] = RNG.rand(n) * 50
    dets[:, 1] = RNG.rand(n) * 50
    dets[:, 2] = dets[:, 0] + RNG.rand(n) * 40 + 5
    dets[:, 3] = dets[:, 1] + RNG.rand(n) * 40 + 5
    dets[:, 4] = RNG.rand(n)

    # reference nms (bbox.py:44-66)
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep_ref = []
    while order.size > 0:
        i = order[0]
        keep_ref.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[np.where(ovr <= 0.3)[0] + 1]
    want_kept = set(
        tuple(np.round(dets[i, :4], 4)) for i in keep_ref if dets[i, 4] > 0.5
    )

    cand, top_scores, keep = nms_fixed(
        jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]), top_k=n
    )
    got_kept = set(
        tuple(np.round(np.asarray(cand)[i], 4))
        for i in range(n) if bool(np.asarray(keep)[i])
    )
    assert got_kept == want_kept


def test_pad_and_smooth_matches_reference():
    n = 9
    raw = np.zeros((n, 4), np.float32)
    raw[:, 0] = RNG.rand(n) * 30
    raw[:, 1] = RNG.rand(n) * 30
    raw[:, 2] = raw[:, 0] + 50 + RNG.rand(n) * 10
    raw[:, 3] = raw[:, 1] + 50 + RNG.rand(n) * 10
    pads = (0, 20, 0, 0)
    img_h, img_w = 120, 110

    # reference (inference_utils.py:130-144 with int truncation)
    results = []
    for rect in raw:
        x1i, y1i, x2i, y2i = map(int, rect)
        y1 = max(0, y1i - pads[0])
        y2 = min(img_h, y2i + pads[1])
        x1 = max(0, x1i - pads[2])
        x2 = min(img_w, x2i + pads[3])
        results.append([x1, y1, x2, y2])
    boxes_ref = np.array(results)
    T = 5
    for i in range(len(boxes_ref)):
        if i + T > len(boxes_ref):
            window = boxes_ref[len(boxes_ref) - T:]
        else:
            window = boxes_ref[i: i + T]
        boxes_ref[i] = np.mean(window, axis=0)

    got = np.asarray(
        pad_and_smooth_boxes(jnp.asarray(raw), (img_h, img_w),
                             pads=(pads[0], pads[1], pads[2], pads[3]))
    )
    # note: reference pads are (pady1, pady2, padx1, padx2)
    np.testing.assert_array_equal(got.astype(np.int64), boxes_ref)
