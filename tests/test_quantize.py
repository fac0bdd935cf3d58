"""W8A8 int8 deploy-path quantization (yoloclip_tpu/ops/quantize.py).

No reference equivalent (the reference is fp32 torch end-to-end); these
tests pin the quantization math itself (BN fold, per-channel scales,
symmetric activation quant) and the end-to-end agreement between the int8
graph and the float graph it was derived from.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yoloclip_tpu.config import ModelConfig
from yoloclip_tpu.models.layers import ConvBlock, quant_eligible
from yoloclip_tpu.models.yolo_clip import YOLOCLIP
from yoloclip_tpu.ops.quantize import (calibrate_amax, quantize_model,
                                       quantize_variables,
                                       build_quant_forward)


def _convblock_pair(k=3, cin=64, cout=128, stride=1, seed=0):
    """Float ConvBlock with non-trivial BN stats + its int8 twin."""
    rng = jax.random.PRNGKey(seed)
    npr = np.random.RandomState(seed)
    block = ConvBlock(cout, k, stride)
    x = jnp.asarray(npr.randn(2, 16, 16, cin) * 0.5, jnp.float32)
    variables = jax.tree.map(np.asarray, block.init(rng, x))
    # randomize BN so folding is actually exercised
    variables['params']['bn']['scale'] = npr.rand(cout).astype(np.float32) + .5
    variables['params']['bn']['bias'] = npr.randn(cout).astype(np.float32) * .1
    variables['batch_stats']['bn']['mean'] = npr.randn(cout).astype(np.float32) * .1
    variables['batch_stats']['bn']['var'] = npr.rand(cout).astype(np.float32) + .5
    variables['params']['conv']['kernel'] = (
        npr.randn(k, k, cin, cout).astype(np.float32) * 0.2)
    return block, variables, x


def test_convblock_int8_matches_float():
    block, variables, x = _convblock_pair()
    y_f = block.apply(variables, x)

    calib = ConvBlock(block.features, block.kernel_size, block.stride,
                      quant='calib')
    _, state = calib.apply(variables, x, mutable=['intermediates'])
    amax = {'in_amax': np.asarray(state['intermediates']['in_amax'])}
    assert amax['in_amax'] == pytest.approx(float(jnp.abs(x).max()))

    qvars = quantize_variables(variables, amax)
    qp = qvars['params']
    assert set(qp) == {'wq', 'wscale', 'qbias', 'act_scale'}
    assert qp['wq'].dtype == np.int8
    assert np.abs(qp['wq']).max() <= 127

    qblock = ConvBlock(block.features, block.kernel_size, block.stride,
                       quant='int8')
    y_q = qblock.apply(qvars, x)
    # 8-bit symmetric quant on well-conditioned data: tight agreement
    err = np.abs(np.asarray(y_q) - np.asarray(y_f))
    scale = np.abs(np.asarray(y_f)).max()
    assert err.max() / scale < 0.05
    assert err.mean() / scale < 0.005


def test_quantize_variables_fold_math():
    """wq * wscale must reconstruct the BN-folded weights to 1/254 rel."""
    block, variables, x = _convblock_pair(k=3, cin=64, cout=128)
    qvars = quantize_variables(variables, {'in_amax': np.float32(1.0)})
    k = variables['params']['conv']['kernel']
    g = variables['params']['bn']['scale']
    b = variables['params']['bn']['bias']
    m = variables['batch_stats']['bn']['mean']
    v = variables['batch_stats']['bn']['var']
    s = g / np.sqrt(v + 1e-5)
    w_folded = k * s
    w_rec = qvars['params']['wq'].astype(np.float32) * qvars['params']['wscale']
    assert np.abs(w_rec - w_folded).max() <= (
        np.abs(w_folded).max(axis=(0, 1, 2)) / 254 + 1e-9).max()
    np.testing.assert_allclose(qvars['params']['qbias'], b - m * s, rtol=1e-6)


def test_ineligible_convblock_folds_bn_exactly():
    """Narrow/1x1 blocks (quant_eligible False) become BN-folded FLOAT
    convs: {wf, fbias} with wf = kernel * gamma/sqrt(var+eps), and the
    int8-mode apply matches the float block to fp roundoff (no 8-bit
    error -- nothing was quantized)."""
    assert not quant_eligible(1, 8, 8)
    assert not quant_eligible(3, 16, 32)
    assert not quant_eligible(1, 256, 256)   # 1x1 never eligible
    assert quant_eligible(3, 64, 128)
    assert quant_eligible(3, 256, 256)

    block, variables, x = _convblock_pair(k=1, cin=8, cout=8)
    qvars = quantize_variables(variables, {})   # no amax needed
    qp = qvars['params']
    assert set(qp) == {'wf', 'fbias'}

    k = variables['params']['conv']['kernel']
    g = variables['params']['bn']['scale']
    v = variables['batch_stats']['bn']['var']
    s = g / np.sqrt(v + 1e-5)
    np.testing.assert_allclose(np.asarray(qp['wf']), k * s, rtol=1e-6)

    y_f = block.apply(variables, x)
    qblock = ConvBlock(block.features, block.kernel_size, block.stride,
                       quant='int8')
    y_q = qblock.apply(qvars, x)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_f),
                               rtol=1e-4, atol=1e-5)


def test_full_model_int8_agreement():
    """int8 YOLO-CLIP stays close to its float parent on random weights."""
    cfg = ModelConfig(backbone_variant='n', image_size=(160, 160))
    model = YOLOCLIP(cfg)
    npr = np.random.RandomState(0)
    images = jnp.asarray(npr.rand(2, 160, 160, 3), jnp.float32)
    text = npr.randn(8, 512).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    variables = model.init(jax.random.PRNGKey(0), images, text)

    out_f = model.apply(variables, images, text)
    qmodel, qvars = quantize_model(cfg, variables, [(images, text)])
    assert 'batch_stats' not in qvars      # every BN folded away
    out_q = qmodel.apply(qvars, images, text)

    ef = np.asarray(out_f['obj_embeddings'])
    eq = np.asarray(out_q['obj_embeddings'])
    cos = (ef * eq).sum(-1) / (
        np.linalg.norm(ef, axis=-1) * np.linalg.norm(eq, axis=-1) + 1e-9)
    assert np.median(cos) > 0.99
    assert np.percentile(cos, 5) > 0.95

    # scores live on the cosine scale [-1, 1]
    ds = np.abs(np.asarray(out_f['scores']) - np.asarray(out_q['scores']))
    assert np.median(ds) < 0.01
    agree = (np.asarray(out_f['class_ids']) ==
             np.asarray(out_q['class_ids'])).mean()
    assert agree > 0.9

    bf = np.asarray(out_f['boxes'])
    bq = np.asarray(out_q['boxes'])
    # relative error: the exp-wh decode on random weights produces huge
    # boxes, so absolute pixel error is meaningless at this init
    rel = np.abs(bf - bq) / (1.0 + np.abs(bf))
    assert np.median(rel) < 0.01


def test_calibrate_amax_reduces_over_batches():
    cfg = ModelConfig(backbone_variant='n', image_size=(160, 160))
    import dataclasses
    calib_model = YOLOCLIP(dataclasses.replace(cfg, quant='calib'))
    model = YOLOCLIP(cfg)
    npr = np.random.RandomState(1)
    text = jnp.asarray(npr.randn(4, 512), jnp.float32)
    img_small = jnp.asarray(npr.rand(1, 160, 160, 3) * 0.1, jnp.float32)
    img_big = jnp.asarray(npr.rand(1, 160, 160, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img_big, text)

    a1 = calibrate_amax(calib_model, variables, [(img_small, text)])
    a2 = calibrate_amax(calib_model, variables,
                        [(img_small, text), (img_big, text)])
    # stem input amax: the running max must see the bigger batch
    stem1 = a1['backbone']['stem']['in_amax']
    stem2 = a2['backbone']['stem']['in_amax']
    assert stem2 >= stem1
    assert stem2 == pytest.approx(float(img_big.max()))


def test_percentile_calibration():
    """'percentile' calibration clips outliers: scales come from the
    99.9th |x| percentile (<= amax), and the quantized model still
    tracks float closely on an outlier-free input."""
    from yoloclip_tpu.ops.quantize import quantize_variables

    cfg = ModelConfig(backbone_variant='n', image_size=(160, 160))
    import dataclasses
    calib_model = YOLOCLIP(dataclasses.replace(cfg, quant='calib_pct'))
    model = YOLOCLIP(cfg)
    npr = np.random.RandomState(2)
    images = jnp.asarray(npr.rand(2, 160, 160, 3), jnp.float32)
    text = jnp.asarray(npr.randn(4, 512), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, text)

    amax = calibrate_amax(calib_model, variables, [(images, text)])
    # every calibrated block carries both stats, with p999 <= amax
    leaves_checked = 0

    def walk(node):
        nonlocal leaves_checked
        if isinstance(node, dict):
            if 'in_amax' in node:
                assert 'in_p999' in node
                assert float(node['in_p999']) <= float(node['in_amax']) + 1e-6
                leaves_checked += 1
            for v in node.values():
                walk(v)
    walk(amax)
    assert leaves_checked > 20

    qv_max = quantize_variables(variables, amax, calibration='max')
    qv_pct = quantize_variables(variables, amax, calibration='percentile')
    qmodel = YOLOCLIP(dataclasses.replace(cfg, quant='int8'))
    out_f = model.apply(variables, images, text)
    out_p = qmodel.apply(qv_pct, images, text)
    ds = np.abs(np.asarray(out_f['scores']) - np.asarray(out_p['scores']))
    assert np.median(ds) < 0.01
    # the two schemes really differ somewhere (p999 < amax on some block)
    a = jax.tree_util.tree_leaves(qv_max)
    b = jax.tree_util.tree_leaves(qv_pct)
    assert any(x.shape == y.shape and not np.allclose(x, y)
               for x, y in zip(a, b))

    with pytest.raises(ValueError):
        quantize_variables(variables, amax, calibration='entropy')

    # plain 'calib' stats lack in_p999: percentile must refuse loudly
    plain = calibrate_amax(
        YOLOCLIP(dataclasses.replace(cfg, quant='calib')), variables,
        [(images, text)])
    with pytest.raises(KeyError):
        quantize_variables(variables, plain, calibration='percentile')


def test_int8_edge_storage_matches_float(monkeypatch):
    """int8-STORED inter-block edges (layers.QT): with the element
    threshold lowered so the storable backbone edges actually fire at
    test resolution, the deploy graph must still track float closely and
    the variables must carry out_scale exactly where the graph asks."""
    from yoloclip_tpu.models import layers

    monkeypatch.setattr(layers, 'STORE_INT8_MIN_ELEMS', 10_000)

    cfg = ModelConfig(backbone_variant='n', image_size=(160, 160))
    model = YOLOCLIP(cfg)
    npr = np.random.RandomState(3)
    images = jnp.asarray(npr.rand(2, 160, 160, 3), jnp.float32)
    text = npr.randn(8, 512).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    variables = model.init(jax.random.PRNGKey(0), images, text)

    out_f = model.apply(variables, images, text)
    qmodel, qvars = quantize_model(cfg, variables, [(images, text)])

    # the storable marked edges materialized out_scale params: the
    # stage1 CSP output (cv3, single consumer = stage2_conv) stores
    flat = jax.tree_util.tree_flatten_with_path(qvars)[0]
    names = ['/'.join(str(k) for k in path) for path, _ in flat]
    # stem output has c=16 < the int8-tiling channel floor: never stored
    assert not any('stem' in n and 'out_scale' in n for n in names)
    assert any('stage1_csp' in n and 'cv3' in n and 'out_scale' in n
               for n in names)
    # unmarked blocks (store_out=False call sites) never store:
    # every stageN_conv output is read twice (CSP cv1+cv2) -> unmarked,
    # and CSP cv1 feeds a bottleneck whose residual re-reads it -> unmarked
    for stage in ('stage1_conv', 'stage2_conv', 'stage3_conv',
                  'stage4_conv'):
        assert not any(stage in n and 'out_scale' in n for n in names)
    # CSP cv1 is unmarked (bottleneck residual re-reads it); at this
    # config stage2_csp/cv1 clears floor+threshold, so absence here
    # proves the marker is really gone (DarkBottleneck cv1 edges stay
    # markable but are all below the element threshold at 160px 'n')
    assert not any('cv1' in n and 'out_scale' in n for n in names)
    assert not any('cv2' in n and 'out_scale' in n for n in names)

    out_q = qmodel.apply(qvars, images, text)
    ds = np.abs(np.asarray(out_f['scores']) - np.asarray(out_q['scores']))
    assert np.median(ds) < 0.02
    agree = (np.asarray(out_f['class_ids']) ==
             np.asarray(out_q['class_ids'])).mean()
    assert agree > 0.85


def test_detector_quantize_int8_end_to_end():
    """quantize_int8 swaps the serving model and detect() keeps its contract."""
    from yoloclip_tpu.config import InferenceConfig
    from yoloclip_tpu.inference.detector import YOLOCLIPDetector

    cfg = InferenceConfig(
        model=ModelConfig(backbone_variant='n', image_size=(160, 160)),
        class_names=('cat', 'dog', 'bus'), conf_threshold=-10.0,
        nms_topk=64, max_detections=16)
    det = YOLOCLIPDetector(config=cfg)
    npr = np.random.RandomState(0)
    frame = (npr.rand(120, 160, 3) * 255).astype(np.uint8)

    base = det.detect(frame)
    det.quantize_int8(frame[None])
    assert det.quantized
    out = det.detect(frame)
    assert len(out) > 0 and len(base) > 0
    for d in out:
        assert set(d) == {'box', 'score', 'class_id', 'class_name'}
        assert 0 <= d['class_id'] < 3
    # batched path runs on the quantized graph too
    batch = det.detect_batch(np.stack([frame, frame]))
    assert int(np.asarray(batch['count'])[0]) > 0


def test_sharded_int8_inference_matches_single_device():
    """The W8A8 model composes with the ('data','model') serving mesh:
    batch over data, vocabulary over model, identical outputs."""
    from yoloclip_tpu.parallel.mesh import create_mesh
    from yoloclip_tpu.parallel.train_step import (make_sharded_inference,
                                                  place_text)

    cfg = ModelConfig(backbone_variant='n', image_size=(128, 128))
    model = YOLOCLIP(cfg)
    npr = np.random.RandomState(3)
    images = jnp.asarray(npr.rand(4, 128, 128, 3), jnp.float32)
    text = jnp.asarray(npr.randn(8, 512), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, text)
    qmodel, qvars = quantize_model(cfg, variables, [(images, text)])

    out_single = qmodel.apply(qvars, images, text)

    mesh = create_mesh(n_data=2, n_model=2)
    with mesh:
        infer = make_sharded_inference(qmodel.apply, mesh)
        out_sharded = infer(qvars, images, place_text(text, mesh,
                                                      batched=False))
    # eligible blocks accumulate in exact int32; ineligible blocks are
    # BN-folded FLOAT convs (selective scheme), so sharded vs single-device
    # picks up fp reduction-order noise through the L2-normalized cosine
    # (measured ~1e-3 max on the [-1, 1] score scale at this size)
    np.testing.assert_allclose(np.asarray(out_sharded['boxes']),
                               np.asarray(out_single['boxes']),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_sharded['scores']),
                               np.asarray(out_single['scores']),
                               rtol=1e-3, atol=2e-3)


def test_build_quant_forward_jits_and_runs():
    cfg = ModelConfig(backbone_variant='n', image_size=(160, 160))
    model = YOLOCLIP(cfg)
    npr = np.random.RandomState(2)
    images = jnp.asarray(npr.rand(2, 160, 160, 3), jnp.float32)
    text = jnp.asarray(npr.randn(6, 512), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, text)

    fwd = build_quant_forward(cfg, variables, text, images)
    out = fwd(images)
    assert out['boxes'].shape == (2, cfg.num_anchors(), 4)
    assert np.isfinite(np.asarray(out['scores'])).all()


def test_build_quant_forward_with_fused_nms():
    cfg = ModelConfig(backbone_variant='n', image_size=(160, 160))
    model = YOLOCLIP(cfg)
    npr = np.random.RandomState(2)
    images = jnp.asarray(npr.rand(2, 160, 160, 3), jnp.float32)
    text = jnp.asarray(npr.randn(6, 512), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, text)

    fwd = build_quant_forward(
        cfg, variables, text, images,
        nms={'conf_threshold': -10.0, 'topk': 64, 'max_detections': 8})
    det = fwd(images)
    assert det['boxes'].shape == (2, 8, 4)
    assert int(np.asarray(det['count']).sum()) > 0


def test_int8_graph_stem_s2d_exact():
    """The int8 deploy graph's (BN-folded float) stem produces identical
    output under the space-to-depth execution layout: same quantized
    variables, stem_s2d on vs off."""
    import dataclasses

    from yoloclip_tpu.config import ModelConfig
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP
    from yoloclip_tpu.ops.quantize import quantize_model

    cfg = ModelConfig(image_size=(64, 64))
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    text = jnp.asarray(rng.randn(4, 512), jnp.float32)
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    model = YOLOCLIP(cfg)
    variables = model.init(jax.random.PRNGKey(0), images, text)
    qmodel, qvars = quantize_model(cfg, variables, [(images, text)])
    qmodel_s2d = YOLOCLIP(dataclasses.replace(qmodel.cfg, stem_s2d=True))
    a = qmodel.apply(qvars, images, text)
    b = qmodel_s2d.apply(qvars, images, text)
    for k in ('boxes', 'scores', 'class_ids'):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-5, atol=1e-5)


def test_int8_graph_stem_u8_s2d_exact():
    """The int8 deploy graph under the uint8 space-to-depth input layout
    (cfg.stem_u8_s2d) matches the plain-layout int8 graph on the same
    quantized variables: the stem's /255 fold and 2x2/s1 rewrite are
    exact up to fp32 kernel-fold rounding."""
    import dataclasses

    from yoloclip_tpu.config import ModelConfig
    from yoloclip_tpu.models.layers import space_to_depth2
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP
    from yoloclip_tpu.ops.quantize import quantize_model

    cfg = ModelConfig(image_size=(64, 64))
    rng = np.random.RandomState(9)
    xu8 = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    images = jnp.asarray(xu8, jnp.float32) / 255.0
    xs2d = space_to_depth2(jnp.asarray(xu8))
    text = jnp.asarray(rng.randn(4, 512), jnp.float32)
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    model = YOLOCLIP(cfg)
    variables = model.init(jax.random.PRNGKey(0), images, text)
    qmodel, qvars = quantize_model(cfg, variables, [(images, text)])
    qmodel_pre = YOLOCLIP(dataclasses.replace(qmodel.cfg, stem_u8_s2d=True))
    a = qmodel.apply(qvars, images, text)
    b = qmodel_pre.apply(qvars, xs2d, text)
    np.testing.assert_allclose(np.asarray(a['boxes']),
                               np.asarray(b['boxes']),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a['scores']),
                               np.asarray(b['scores']),
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(a['class_ids']) == np.asarray(b['class_ids'])).all()
