"""Micro-batching serving runtime + HTTP front-end tests (CPU, 160px).

Covers `inference/server.py` (no reference equivalent: the reference
serves one image per call) and `cli/serve.py`.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from yoloclip_tpu.config import InferenceConfig, ModelConfig


def _img(seed, h, w):
    return (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)


@pytest.fixture(scope='module')
def detector():
    from yoloclip_tpu.inference.detector import YOLOCLIPDetector
    cfg = InferenceConfig(
        model=ModelConfig(image_size=(160, 160)),
        conf_threshold=-10.0,   # random weights: accept everything
        nms_topk=64, max_detections=8)
    return YOLOCLIPDetector(class_names=['cat', 'dog', 'person'], config=cfg)


@pytest.fixture(scope='module')
def server(detector):
    """Shared instance: each DetectionServer jits its own batched program
    (a fresh trace per instance), so module scope avoids recompiling the
    same 160px/B=4 program per test. Tests that swap the vocabulary
    restore it."""
    from yoloclip_tpu.inference.server import DetectionServer
    srv = DetectionServer(detector, max_batch=4, max_delay_ms=50.0)
    yield srv
    srv.close()


def test_server_matches_direct_detect(detector, server):
    """The batched serving path must agree with the single-image public
    API on identical inputs (mixed resolutions in one batch)."""
    sizes = [(120, 200), (160, 160), (90, 60)]
    imgs = [_img(i, h, w) for i, (h, w) in enumerate(sizes)]
    futs = [server.submit(im) for im in imgs]
    got = [f.result(timeout=120) for f in futs]
    want = [detector.detect(im) for im in imgs]
    for g, w in zip(got, want):
        assert len(g) == len(w)
        for a, b in zip(g, w):
            assert a['class_id'] == b['class_id']
            assert a['class_name'] == b['class_name']
            np.testing.assert_allclose(a['score'], b['score'], rtol=1e-4,
                                       atol=1e-5)
            assert np.abs(np.array(a['box'])
                          - np.array(b['box'])).max() <= 1


def test_server_batches_concurrent_requests(detector):
    from yoloclip_tpu.inference.server import DetectionServer
    srv = DetectionServer(detector, max_batch=8, max_delay_ms=250.0)
    try:
        srv.detect(_img(0, 64, 64))   # warm the compile out of the timing
        results = [None] * 12

        def client(i):
            results[i] = srv.detect(_img(i, 100, 100), timeout=120)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(isinstance(r, list) for r in results)
        s = srv.stats()
        assert s['requests'] == 13
        # 12 concurrent requests + a 250 ms window must coalesce: strictly
        # fewer batches than requests
        assert s['batches'] < 13
        assert s['mean_occupancy'] > 1.0
        assert s['p50_latency_ms'] > 0.0
    finally:
        srv.close()


def test_server_vocab_hot_swap(detector, server):
    before = server.detect(_img(5, 160, 160), timeout=120)
    server.set_vocabulary(['apple', 'banana', 'cherry'])
    try:
        after = server.detect(_img(5, 160, 160), timeout=120)
    finally:
        server.set_vocabulary(['cat', 'dog', 'person'])
    for d in before:
        assert d['class_name'] in ('cat', 'dog', 'person')
    for d in after:
        assert d['class_name'] in ('apple', 'banana', 'cherry')
    # same class COUNT -> a swap reuses the compiled program; random
    # embeddings differ so only the schema is comparable
    assert isinstance(after, list)


def test_server_invalid_image_fails_future(server):
    fut = server.submit(np.zeros((3, 3), np.uint8))   # not (H, W, 3)
    with pytest.raises(ValueError):
        fut.result(timeout=10)


def test_server_bucketed_dispatch(detector):
    """Partial batches pad to the smallest power-of-two bucket, not to
    max_batch: results must match the single-image API and stats() must
    show mean_bucket < max_batch for a 3-request burst under max_batch=8
    (buckets 1/2/4/8 -> a 3-batch lands in bucket 4)."""
    import concurrent.futures as cf

    from yoloclip_tpu.inference.server import DetectionServer
    srv = DetectionServer(detector, max_batch=8, max_delay_ms=250.0)
    try:
        assert srv._buckets == [1, 2, 4, 8]
        srv.warmup()            # compiles all four bucket programs
        srv.reset_stats()
        imgs = [_img(40 + i, 100, 120) for i in range(3)]
        # submit from one burst so they coalesce into ONE batch
        futs = [srv.submit(im) for im in imgs]
        got = [f.result(timeout=120) for f in futs]
        s = srv.stats()
        assert s['batches'] == 1
        assert s['mean_occupancy'] == 3.0
        assert s['mean_bucket'] == 4.0          # padded to 4, not 8
        want = [detector.detect(im) for im in imgs]
        for g, w in zip(got, want):
            assert len(g) == len(w)
            for a, b in zip(g, w):
                assert a['class_id'] == b['class_id']
                np.testing.assert_allclose(a['score'], b['score'],
                                           rtol=1e-4, atol=1e-5)
    finally:
        srv.close()

    # bucket_batches=False restores the always-max_batch layout
    srv = DetectionServer(detector, max_batch=8, max_delay_ms=50.0,
                          bucket_batches=False)
    try:
        assert srv._buckets == [8]
        srv.detect(_img(50, 90, 90), timeout=120)
        assert srv.stats()['mean_bucket'] == 8.0
    finally:
        srv.close()


def test_server_bucketed_mesh_divisibility(detector):
    """Under a mesh every bucket must divide the 'data' axis: the
    smallest bucket is the axis size, so a 1-request batch on a 4-way
    mesh pads to 4 (never 1) and still shards correctly."""
    from yoloclip_tpu.inference.server import DetectionServer
    from yoloclip_tpu.parallel.mesh import create_mesh
    mesh = create_mesh(n_data=4, n_model=1)
    srv = DetectionServer(detector, max_batch=16, max_delay_ms=20.0,
                          mesh=mesh)
    try:
        assert srv._buckets == [4, 8, 16]
        got = srv.detect(_img(60, 100, 100), timeout=300)
        assert isinstance(got, list)
        assert srv.stats()['mean_bucket'] == 4.0
    finally:
        srv.close()


def test_server_requires_offline_vocab():
    from yoloclip_tpu.inference.detector import YOLOCLIPDetector
    from yoloclip_tpu.inference.server import DetectionServer
    cfg = InferenceConfig(model=ModelConfig(image_size=(160, 160)),
                          class_names=(), use_offline_vocab=False)
    det = YOLOCLIPDetector(config=cfg)   # online-prompt-only detector
    with pytest.raises(ValueError, match='offline vocabulary'):
        DetectionServer(det)


def test_server_close_semantics(detector):
    from yoloclip_tpu.inference.server import DetectionServer
    srv = DetectionServer(detector, max_batch=2, max_delay_ms=1.0)
    fut = srv.submit(_img(9, 80, 80))
    srv.close()
    assert fut.result(timeout=60) is not None   # drained before stop
    with pytest.raises(RuntimeError):
        srv.submit(_img(9, 80, 80))
    srv.close()   # idempotent


def test_server_sharded_over_mesh(detector, server):
    """DetectionServer(mesh=...) shards batch rows over 'data' and must
    agree with the single-device server on identical inputs."""
    from yoloclip_tpu.inference.server import DetectionServer
    from yoloclip_tpu.parallel.mesh import create_mesh
    mesh = create_mesh(n_data=4, n_model=1)
    srv = DetectionServer(detector, max_batch=4, max_delay_ms=50.0,
                          mesh=mesh)
    try:
        imgs = [_img(i, 100 + 7 * i, 140) for i in range(4)]
        futs = [srv.submit(im) for im in imgs]
        got = [f.result(timeout=300) for f in futs]
        want = [server.detect(im, timeout=300) for im in imgs]
        for g, w in zip(got, want):
            assert len(g) == len(w)
            for a, b in zip(g, w):
                assert a['class_id'] == b['class_id']
                np.testing.assert_allclose(a['score'], b['score'],
                                           rtol=1e-4, atol=1e-5)
                assert np.abs(np.array(a['box'])
                              - np.array(b['box'])).max() <= 1
    finally:
        srv.close()


def test_server_mesh_batch_divisibility(detector):
    from yoloclip_tpu.inference.server import DetectionServer
    from yoloclip_tpu.parallel.mesh import create_mesh
    mesh = create_mesh(n_data=4, n_model=1)
    with pytest.raises(ValueError, match='data'):
        DetectionServer(detector, max_batch=6, mesh=mesh)
    with pytest.raises(ValueError, match='spatial'):
        DetectionServer(detector, max_batch=4, spatial=True)


def test_server_spatial_mesh(detector, server):
    """spatial=True: batch over 'data' x frame height over 'model'
    (parallel/spatial.py recipe inside the serving program) must agree
    with the single-device server."""
    from yoloclip_tpu.inference.server import DetectionServer
    from yoloclip_tpu.parallel.mesh import create_mesh
    mesh = create_mesh(n_data=2, n_model=2)
    srv = DetectionServer(detector, max_batch=4, max_delay_ms=50.0,
                          mesh=mesh, spatial=True)
    try:
        imgs = [_img(i + 20, 100 + 7 * i, 140) for i in range(4)]
        futs = [srv.submit(im) for im in imgs]
        got = [f.result(timeout=300) for f in futs]
        want = [server.detect(im, timeout=300) for im in imgs]
        for g, w in zip(got, want):
            assert len(g) == len(w)
            for a, b in zip(g, w):
                assert a['class_id'] == b['class_id']
                np.testing.assert_allclose(a['score'], b['score'],
                                           rtol=1e-4, atol=1e-5)
                assert np.abs(np.array(a['box'])
                              - np.array(b['box'])).max() <= 1
    finally:
        srv.close()


# ---------------------------------------------------------------------------
# HTTP front-end
# ---------------------------------------------------------------------------

def _png_bytes(img: np.ndarray) -> bytes:
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format='PNG')
    return buf.getvalue()


@pytest.fixture(scope='module')
def http_server(detector, server):
    from http.server import ThreadingHTTPServer

    from yoloclip_tpu.cli.serve import make_handler
    httpd = ThreadingHTTPServer(('127.0.0.1', 0), make_handler(server))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f'http://127.0.0.1:{httpd.server_address[1]}'
    httpd.shutdown()


def _post(url, data, timeout=120):
    req = urllib.request.Request(url, data=data, method='POST')
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_detect_roundtrip(http_server):
    code, payload = _post(http_server + '/detect',
                          _png_bytes(_img(3, 120, 200)))
    assert code == 200
    dets = payload['detections']
    assert isinstance(dets, list)
    for d in dets:
        assert set(d) == {'box', 'score', 'class_id', 'class_name'}
        x1, y1, x2, y2 = d['box']
        assert 0 <= x1 <= 200 and 0 <= y1 <= 120


def test_http_stats_and_healthz(http_server):
    with urllib.request.urlopen(http_server + '/healthz', timeout=30) as r:
        assert json.loads(r.read())['status'] == 'ok'
    with urllib.request.urlopen(http_server + '/stats', timeout=30) as r:
        s = json.loads(r.read())
    assert {'requests', 'batches', 'mean_occupancy'} <= set(s)


def test_http_vocab_swap(http_server):
    # same class count as the fixture vocabulary -> the swap reuses the
    # already-compiled (C=3) program
    code, payload = _post(
        http_server + '/vocab',
        json.dumps({'class_names': ['tree', 'rock', 'pond']}).encode())
    assert code == 200 and payload['classes'] == 3
    try:
        code, payload = _post(http_server + '/detect',
                              _png_bytes(_img(4, 160, 160)))
        assert code == 200
        for d in payload['detections']:
            assert d['class_name'] in ('tree', 'rock', 'pond')
    finally:
        _post(http_server + '/vocab', json.dumps(
            {'class_names': ['cat', 'dog', 'person']}).encode())


def test_http_bad_requests(http_server):
    code, payload = _post(http_server + '/detect', b'not an image')
    assert code == 400
    code, payload = _post(http_server + '/vocab', b'{}')
    assert code == 400
    # empty class list must be rejected (C=0 would poison later batches)
    code, payload = _post(http_server + '/vocab', b'{"class_names": []}')
    assert code == 400
    code, _ = _post(http_server + '/nope', b'x')
    assert code == 404
    req = urllib.request.Request(http_server + '/healthz')
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 200


def test_build_server_stem_u8_s2d_flag():
    """cli/serve.py --stem-u8-s2d must reach ModelConfig.stem_u8_s2d (the
    bs>=256 deploy layout, RESULTS config 26); numeric equivalence of the
    layout itself is pinned in test_detector.py."""
    import argparse

    from yoloclip_tpu.cli.serve import build_server
    args = argparse.Namespace(
        model=None, classes='cat,dog', vocab=None, variant='n',
        image_size=160, conf=-10.0, iou=0.45, int8=False, calib_dir=None,
        max_batch=4, max_delay_ms=5.0, no_bucket=False, devices=None,
        spatial=1, stem_u8_s2d=True)
    srv, det = build_server(args)
    try:
        assert det.model_cfg.stem_u8_s2d is True
        # one request THROUGH the micro-batcher: the server's batched
        # canvas program must consume the uint8 s2d canvas (the
        # bench_suite config-30 serve path), not just carry the flag
        frame = (np.random.RandomState(0).rand(120, 150, 3) * 255
                 ).astype(np.uint8)
        dets = srv.detect(frame, timeout=600)
        assert isinstance(dets, list)
    finally:
        srv.close()


def test_decode_image_bytes_native_and_pil():
    from yoloclip_tpu.cli.serve import decode_image_bytes
    img = _img(7, 37, 53)
    out = decode_image_bytes(_png_bytes(img))
    np.testing.assert_array_equal(out, img)   # PNG is lossless
