"""Tests for device-side preprocessing and fixed-shape NMS.

NMS property tests per SURVEY §4: greedy order, IoU threshold semantics,
equivalence with an independent numpy re-implementation of the reference
algorithm (`inference/detector.py:225-256`).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yoloclip_tpu.ops.boxes import (pairwise_iou, xywh2xyxy, xyxy2xywh)
from yoloclip_tpu.ops.nms import nms_fixed, batched_nms
from yoloclip_tpu.ops.preprocess import letterbox, rescale_boxes


def numpy_greedy_nms(boxes, scores, iou_threshold):
    """Independent re-derivation of greedy class-agnostic NMS."""
    order = np.argsort(scores)[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        y2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(0, x2 - x1) * np.maximum(0, y2 - y1)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (area_i + area_r - inter + 1e-7)
        order = rest[iou <= iou_threshold]
    return keep


def random_boxes(n, seed, size=600):
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * 120 + 5
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_nms_matches_numpy_greedy(seed):
    boxes, scores = random_boxes(200, seed)
    conf, iou_t = 0.25, 0.45
    out = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                    conf_threshold=conf, iou_threshold=iou_t,
                    topk=256, max_detections=200)
    mask = scores > conf
    idx = np.where(mask)[0]
    want_keep = numpy_greedy_nms(boxes[idx], scores[idx], iou_t)
    want_scores = scores[idx][want_keep]
    n = int(out['count'])
    assert n == len(want_keep)
    got_scores = np.asarray(out['scores'])[:n]
    np.testing.assert_allclose(np.sort(got_scores)[::-1], got_scores)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-6)
    got_boxes = np.asarray(out['boxes'])[:n]
    np.testing.assert_allclose(got_boxes, boxes[idx][want_keep], rtol=1e-6)


def test_nms_conf_threshold_filters_everything():
    boxes, scores = random_boxes(50, 3)
    out = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                    conf_threshold=2.0, topk=64, max_detections=16)
    assert int(out['count']) == 0
    assert not bool(out['valid'].any())


def test_nms_identical_boxes_suppressed_to_one():
    box = np.array([[10, 10, 50, 50]], np.float32)
    boxes = np.repeat(box, 10, axis=0)
    scores = np.linspace(0.9, 0.5, 10).astype(np.float32)
    out = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                    conf_threshold=0.25, iou_threshold=0.45,
                    topk=16, max_detections=8)
    assert int(out['count']) == 1
    assert float(out['scores'][0]) == pytest.approx(0.9)


def test_nms_class_agnostic():
    # Overlapping boxes of DIFFERENT classes must still suppress each other
    # (reference behavior, SURVEY bug #12 kept by contract).
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    cls = jnp.array([0, 1])
    out = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.25, 0.45,
                    topk=4, max_detections=4, class_ids=cls)
    assert int(out['count']) == 1
    assert int(out['class_ids'][0]) == 0


def reference_unbounded_nms(boxes, scores, conf, iou_t):
    """The reference's OWN conf-filter + unbounded greedy `_nms`
    (`inference/detector.py:183-256`) on raw candidates -> kept scores
    (descending). Oracle for the prefilter tests; skips if the reference
    package is absent."""
    from yoloclip_tpu.utils import refbridge
    if not refbridge.reference_available():
        pytest.skip('reference package not present')
    ref = refbridge.load_reference()
    det = ref.detector.YOLOCLIPDetector.__new__(ref.detector.YOLOCLIPDetector)
    mask = scores > conf
    b, s = boxes[mask].astype(np.float64), scores[mask]
    keep = det._nms(b, s, iou_t)
    return s[keep], b[keep]


@pytest.mark.parametrize('seed', [0, 1])
def test_nms_prefilter_unsaturated_matches_reference(seed):
    """Low conf + dense overlapping candidates, but still <= topk above
    threshold: the fixed-K result must EQUAL the reference's unbounded
    greedy loop at the K boundary (round-2 verdict weak #6)."""
    rng = np.random.RandomState(seed)
    # 120 candidates clustered in a tiny region -> heavy suppression chains
    xy = rng.rand(120, 2) * 60
    wh = rng.rand(120, 2) * 50 + 20
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.rand(120).astype(np.float32)
    conf, iou_t = 0.01, 0.5            # everything passes conf
    out = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), conf, iou_t,
                    topk=128, max_detections=128)
    assert not bool(out['prefilter_saturated'])
    want_scores, want_boxes = reference_unbounded_nms(boxes, scores, conf,
                                                      iou_t)
    n = int(out['count'])
    assert n == len(want_scores)
    np.testing.assert_allclose(np.asarray(out['scores'])[:n], want_scores,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out['boxes'])[:n], want_boxes,
                               rtol=1e-6)


def test_nms_prefilter_saturation_flag():
    """More candidates above conf than topk: the sentinel must fire (and
    is exactly the condition under which fixed-K may drop candidates the
    unbounded reference loop would keep)."""
    boxes, scores = random_boxes(200, 7)
    out = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                    conf_threshold=0.01, iou_threshold=0.45,
                    topk=32, max_detections=32)
    assert bool(out['prefilter_saturated'])
    # sanity: kept results are the top-K-restricted greedy answer -- the
    # K highest-scoring candidates, greedily suppressed
    mask = scores > 0.01
    idx = np.argsort(scores[mask])[::-1][:32]
    want = numpy_greedy_nms(boxes[mask][idx], scores[mask][idx], 0.45)
    assert int(out['count']) == len(want)
    # below the threshold, same geometry -> flag clear
    out2 = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                     conf_threshold=0.01, iou_threshold=0.45,
                     topk=256, max_detections=32)
    assert not bool(out2['prefilter_saturated'])


def test_batched_nms_shapes():
    boxes, scores = random_boxes(100, 4)
    b = jnp.stack([jnp.asarray(boxes)] * 3)
    s = jnp.stack([jnp.asarray(scores)] * 3)
    c = jnp.zeros((3, 100), jnp.int32)
    out = batched_nms(b, s, c, topk=128, max_detections=32)
    assert out['boxes'].shape == (3, 32, 4)
    assert out['scores'].shape == (3, 32)
    assert out['count'].shape == (3,)
    # identical inputs -> identical outputs
    np.testing.assert_array_equal(np.asarray(out['count']),
                                  [out['count'][0]] * 3)


def test_letterbox_geometry():
    # 300x400 image -> scale = min(640/300, 640/400) = 1.6
    img = np.full((300, 400, 3), 255, np.uint8)
    canvas, scale = letterbox(jnp.asarray(img), (640, 640))
    assert canvas.shape == (640, 640, 3)
    assert float(scale) == pytest.approx(1.6)
    c = np.asarray(canvas)
    # top-left region filled, bottom strip black (480 = 300*1.6)
    assert c[:480, :, :].min() > 0.99
    assert c[480:, :, :].max() == 0.0


def test_letterbox_preserves_content_scale():
    rng = np.random.RandomState(0)
    img = (rng.rand(320, 320, 3) * 255).astype(np.uint8)
    canvas, scale = letterbox(jnp.asarray(img), (640, 640))
    assert float(scale) == pytest.approx(2.0)
    # nearest-equivalent check at even coordinates (bilinear at exact 2x
    # upsampling with half-pixel centers interpolates, so just check range)
    c = np.asarray(canvas)
    assert 0.0 <= c.min() and c.max() <= 1.0


def test_rescale_boxes_clip():
    boxes = jnp.asarray([[0., 0., 640., 640.], [-10., -10., 5000., 5000.]])
    out = np.asarray(rescale_boxes(boxes, jnp.float32(1.6), (300, 400)))
    np.testing.assert_allclose(out[0], [0, 0, 400, 300])
    np.testing.assert_allclose(out[1], [0, 0, 400, 300])


def test_box_format_roundtrip():
    rng = np.random.RandomState(5)
    xywh = jnp.asarray(rng.rand(17, 4) * 100 + 1)
    back = xyxy2xywh(xywh2xyxy(xywh))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xywh), rtol=1e-5)


def test_pairwise_iou_known_values():
    a = jnp.asarray([[0., 0., 10., 10.]])
    b = jnp.asarray([[0., 0., 10., 10.], [5., 5., 15., 15.], [20., 20., 30., 30.]])
    iou = np.asarray(pairwise_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], rtol=1e-4)


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
def test_fixpoint_nms_identical_to_sequential_greedy(seed):
    boxes, scores = random_boxes(300, seed + 10)
    a = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.25, 0.5,
                  topk=512, max_detections=512, method='greedy')
    b = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.25, 0.5,
                  topk=512, max_detections=512, method='fixpoint')
    assert int(a['count']) == int(b['count'])
    np.testing.assert_array_equal(np.asarray(a['valid']),
                                  np.asarray(b['valid']))
    np.testing.assert_allclose(np.asarray(a['boxes']),
                               np.asarray(b['boxes']))


def test_fixpoint_nms_suppression_chain():
    # a -> suppresses b -> would suppress c, but since b is suppressed, c
    # survives via a (if a,c don't overlap). Exercises >1 fixpoint sweep.
    boxes = np.array([
        [0, 0, 10, 10],      # a: kept (top score)
        [3, 0, 13, 10],      # b: IoU(a,b)=0.538 -> suppressed by a
        [6, 0, 16, 10],      # c: IoU(b,c)=0.538 but IoU(a,c)=0.25 -> kept,
    ], np.float32)           # only because b was suppressed (2 sweeps)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    out = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.25, 0.45,
                    topk=4, max_detections=4, method='fixpoint')
    ref = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.25, 0.45,
                    topk=4, max_detections=4, method='greedy')
    assert int(out['count']) == int(ref['count']) == 2
    np.testing.assert_array_equal(np.asarray(out['valid']),
                                  np.asarray(ref['valid']))


def test_resize_bilinear_matches_cv2():
    import cv2
    from yoloclip_tpu.ops.preprocess import resize_bilinear
    rng = np.random.RandomState(7)
    img = (rng.rand(97, 153, 3) * 255).astype(np.uint8)
    for out_hw in [(64, 101), (200, 300), (97, 153)]:
        got = np.asarray(resize_bilinear(
            jnp.asarray(img, jnp.float32), out_hw))
        want = cv2.resize(img, (out_hw[1], out_hw[0]),
                          interpolation=cv2.INTER_LINEAR).astype(np.float32)
        # cv2 uses fixed-point arithmetic; allow ~1 intensity level
        assert np.abs(got - want).max() <= 1.5, out_hw
        assert np.abs(got - want).mean() < 0.3


def test_class_aware_nms_keeps_cross_class_overlaps():
    """class_agnostic=False: identical boxes of DIFFERENT classes survive;
    same-class duplicates are still suppressed."""
    from yoloclip_tpu.ops.nms import batched_nms
    boxes = jnp.asarray([[[10., 10., 50., 50.],
                          [10., 10., 50., 50.],     # same box, other class
                          [11., 11., 51., 51.],     # near-dup of box 0
                          [200., 200., 240., 240.]]])
    scores = jnp.asarray([[0.9, 0.8, 0.7, 0.6]])
    cids = jnp.asarray([[0, 1, 0, 2]])

    ag = batched_nms(boxes, scores, cids, 0.25, 0.45, topk=4,
                     max_detections=4)
    assert int(ag['count'][0]) == 2           # reference behavior

    ca = batched_nms(boxes, scores, cids, 0.25, 0.45, topk=4,
                     max_detections=4, class_agnostic=False)
    assert int(ca['count'][0]) == 3
    kept = set(np.asarray(ca['class_ids'][0][:3]).tolist())
    assert kept == {0, 1, 2}


def test_letterbox_identity_skip_matches_resize_path():
    """Target-size inputs take the matmul-free branch; the half-pixel
    bilinear matrix at src==dst is exactly identity, so values must equal
    the general path's (and be the plain /255 image)."""
    from yoloclip_tpu.ops.preprocess import (_bilinear_matrix,
                                             letterbox_batch)
    # identity property of the interpolation matrix itself
    W = _bilinear_matrix(64, 64)
    np.testing.assert_allclose(W, np.eye(64, dtype=np.float32), atol=1e-7)

    rs = np.random.RandomState(0)
    imgs = (rs.rand(2, 96, 96, 3) * 255).astype(np.uint8)
    canvas, scale = letterbox_batch(jnp.asarray(imgs), (96, 96))
    assert float(scale) == 1.0
    np.testing.assert_allclose(np.asarray(canvas),
                               imgs.astype(np.float32) / 255.0, atol=1e-7)

    one, scale1 = letterbox(jnp.asarray(imgs[0]), (96, 96))
    np.testing.assert_allclose(np.asarray(one), np.asarray(canvas[0]),
                               atol=1e-7)

    # non-square target-width input: resize happens, then top-left paste
    wide = (rs.rand(48, 96, 3) * 255).astype(np.uint8)
    c2, s2 = letterbox(jnp.asarray(wide), (96, 96))
    assert float(s2) == 1.0
    np.testing.assert_allclose(np.asarray(c2[:48]),
                               wide.astype(np.float32) / 255.0, atol=1e-7)
    assert float(jnp.abs(c2[48:]).max()) == 0.0


def _un_s2d(c: np.ndarray) -> np.ndarray:
    """Inverse of preprocess._s2d for test verification."""
    B, Hh, Wh, C4 = c.shape
    C = C4 // 4
    x = c.reshape(B, Hh, Wh, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hh * 2, Wh * 2, C)


def test_letterbox_batch_u8_s2d_identity_is_pure_relayout():
    """At target resolution the u8-s2d letterbox is an exact byte
    relayout of the input (no resize, no rounding), and un-s2d'ing it
    recovers the float letterbox times 255 exactly."""
    from yoloclip_tpu.ops.preprocess import (letterbox_batch,
                                             letterbox_batch_u8_s2d)
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (2, 96, 96, 3)).astype(np.uint8)
    c, s = letterbox_batch_u8_s2d(jnp.asarray(imgs), (96, 96))
    assert c.dtype == jnp.uint8 and c.shape == (2, 48, 48, 12)
    assert float(s) == 1.0
    und = _un_s2d(np.asarray(c))
    np.testing.assert_array_equal(und, imgs)
    f, s2 = letterbox_batch(jnp.asarray(imgs), (96, 96))
    np.testing.assert_allclose(und.astype(np.float32),
                               np.asarray(f) * 255.0, atol=1e-3)


def test_letterbox_batch_u8_s2d_resize_rounds_like_cv2():
    """The resize path rounds the fp32 bilinear result to uint8 (the
    reference's cv2.resize operates on uint8 frames, so this is the
    MORE reference-faithful semantics) and pastes top-left."""
    from yoloclip_tpu.ops.preprocess import (letterbox_batch,
                                             letterbox_batch_u8_s2d,
                                             letterbox_u8_s2d)
    rng = np.random.RandomState(8)
    wide = rng.randint(0, 256, (1, 48, 128, 3)).astype(np.uint8)
    # scale = min(96/48, 96/128) = 0.75 -> a REAL bilinear resize to 36x96
    cw, sw = letterbox_batch_u8_s2d(jnp.asarray(wide), (96, 96))
    fw, sf = letterbox_batch(jnp.asarray(wide), (96, 96))
    assert float(sw) == float(sf) == 0.75
    undw = _un_s2d(np.asarray(cw)).astype(np.float32)
    want = np.round(np.asarray(fw, np.float64) * 255.0)
    # fp32 *255/255 round-trip can wobble a half-integer by 1 ulp
    assert (np.abs(undw - want) <= 1.0).all()
    # and the bulk of pixels round to the identical integer (scale 0.75
    # produces many exact half-integer bilinear values, where the fp32
    # *255/255 round-trip legitimately wobbles the tie by 1)
    assert (undw == want).mean() > 0.95
    # content lands top-left: rows 36+ of the canvas are the zero pad
    assert (undw[:, 36:, :, :] == 0).all()
    # single-image variant agrees with the batch one
    c1, s1 = letterbox_u8_s2d(jnp.asarray(wide[0]), (96, 96))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(cw[0]))


def test_letterbox_batch_u8_s2d_float_identity_rounds():
    """Float inputs through the identity (no-resize) path round+clip to
    uint8 instead of truncating/wrapping (advisor r3): 254.6 -> 255,
    -3.0 -> 0, 300.0 -> 255."""
    from yoloclip_tpu.ops.preprocess import letterbox_batch_u8_s2d
    img = np.zeros((1, 4, 4, 3), np.float32)
    img[0, 0, 0] = [254.6, -3.0, 300.0]
    img[0, 1, 1] = [0.4, 0.6, 128.5]
    c, s = letterbox_batch_u8_s2d(jnp.asarray(img), (4, 4))
    und = _un_s2d(np.asarray(c))
    assert float(s) == 1.0
    np.testing.assert_array_equal(und[0, 0, 0], [255, 0, 255])
    np.testing.assert_array_equal(und[0, 1, 1], [0, 1, 128])
