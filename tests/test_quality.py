"""Cross-stack quality agreement: TRAINED weights through our jitted
pipeline vs the reference's own torch forward + postprocess must produce
the same detections and the same mAP (the offline proxy for BASELINE's
"mAP within 0.5 pt"; the full converged number lives in
benchmarks/quality_eval.py / RESULTS.md).

Unlike test_parity_reference.py (random weights, raw-output parity), this
drives BOTH stacks end-to-end -- conf filter, NMS, evaluator -- on weights
that actually detect something, so systematic postprocess disagreements
can't hide in near-zero scores.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from yoloclip_tpu.config import ModelConfig, TrainingConfig
from yoloclip_tpu.data.synth import (make_synth_detection_set,
                                     synth_text_embeddings)
from yoloclip_tpu.models.yolo_clip import YOLOCLIP
from yoloclip_tpu.ops.nms import batched_nms
from yoloclip_tpu.ops.preprocess import rescale_boxes
from yoloclip_tpu.train.train_state import (create_train_state,
                                            make_train_step,
                                            set_learning_rate)
from yoloclip_tpu.utils import refbridge
from yoloclip_tpu.utils.metrics import calculate_map

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not refbridge.reference_available(),
                       reason='reference repo not mounted'),
]


@pytest.fixture(autouse=True)
def _torch_inference_only():
    # Scoped no_grad (module-level set_grad_enabled(False) leaks through
    # pytest collection into other modules' autograd oracles).
    with torch.no_grad():
        yield

CONF, IOU = 0.25, 0.45


@pytest.mark.slow
def test_trained_weights_same_detections_and_map_as_reference():
    S, B, C = 128, 8, 6
    mcfg = ModelConfig(image_size=(S, S))
    cfg = TrainingConfig(model=mcfg, max_objects=8, batch_size=B,
                         assigner='topk_center', contrastive_type='bce')
    model = YOLOCLIP(mcfg)
    train = make_synth_detection_set(32, seed=0, image_size=S)
    text = synth_text_embeddings(C)

    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, jnp.zeros((1, S, S, 3)),
                               jnp.zeros((C, 512)))
    state = set_learning_rate(state, 2e-3)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    textb = jnp.broadcast_to(jnp.asarray(text)[None], (B, C, 512))
    rs = np.random.RandomState(1)
    for i in range(150):
        idx = rs.randint(0, 32, B)
        batch = {k: jnp.asarray(train[k][idx])
                 for k in ('images', 'boxes', 'class_ids', 'valid_mask')}
        state, parts = step(state, batch, textb)
    assert np.isfinite(float(parts['loss']))

    val = make_synth_detection_set(16, seed=1000, image_size=S)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    # ours: jitted forward + fixed-shape NMS
    out = jax.jit(lambda v, im, tx: model.apply(v, im, tx))(
        variables, jnp.asarray(val['images']), jnp.asarray(text))
    # scale 1.0 rescale = the boundary clip the reference postprocess
    # applies before NMS (`inference/detector.py:193-202`)
    boxes = rescale_boxes(out['boxes'], jnp.float32(1.0), (S, S))
    det = batched_nms(boxes, out['scores'], out['class_ids'],
                      CONF, IOU, topk=512, max_detections=32)
    # int-truncate boxes exactly like the reference's detection dicts
    # (`detector.py:211` .astype(int)) so the two mAP runs see the same
    # coordinate quantization
    ours = [{'boxes': np.asarray(det['boxes'][b]).astype(int
                                                         ).astype(float)[None],
             'scores': np.asarray(det['scores'][b])[None],
             'class_ids': np.asarray(det['class_ids'][b])[None]}
            for b in range(16)]

    # theirs: reference torch forward + reference numpy postprocess
    ref = refbridge.load_reference()
    tmodel = refbridge.build_reference_composite(mcfg, variables, C, text,
                                                 ref=ref)
    t_out = tmodel(torch.from_numpy(
        val['images'].transpose(0, 3, 1, 2).copy()))
    theirs = []
    n_ref_total = 0
    for b in range(16):
        one = {k: t_out[k][b].numpy()
               for k in ('boxes', 'scores', 'class_ids')}
        dets = refbridge.reference_postprocess(one, (S, S), 1.0, CONF, IOU,
                                               image_size=(S, S), ref=ref)
        n_ref_total += len(dets)
        n_ours = int(det['count'][b])
        assert n_ours == len(dets), (b, n_ours, len(dets))
        for i, d in enumerate(dets):
            assert int(det['class_ids'][b][i]) == d['class_id']
            np.testing.assert_allclose(float(det['scores'][b][i]),
                                       d['score'], rtol=1e-3, atol=1e-3)
            assert np.abs(np.asarray(det['boxes'][b][i])
                          - np.asarray(d['box'])).max() <= 1.5
        theirs.append({
            'boxes': (np.array([d['box'] for d in dets], np.float64)
                      .reshape(1, -1, 4)),
            'scores': np.array([d['score'] for d in dets]).reshape(1, -1),
            'class_ids': (np.array([d['class_id'] for d in dets], np.int64)
                          .reshape(1, -1)),
        })
    assert n_ref_total > 0, 'training produced no detections to compare'

    targets = [{'boxes': val['boxes'][i][None],
                'class_ids': val['class_ids'][i][None],
                'valid_mask': val['valid_mask'][i][None]}
               for i in range(16)]
    our_map50, our_map = calculate_map(ours, targets)
    ref_map50, ref_map = calculate_map(theirs, targets)
    # BASELINE axis: "mAP within 0.5 pt of the PyTorch reference"
    assert abs(our_map50 - ref_map50) < 0.005, (our_map50, ref_map50)
    assert abs(our_map - ref_map) < 0.005, (our_map, ref_map)
