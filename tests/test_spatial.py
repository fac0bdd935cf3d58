"""Spatially-partitioned inference (parallel/spatial.py): N devices
cooperate on ONE frame via height-axis GSPMD sharding.

Runs on the virtual 8-device CPU mesh (testenv.py). The partitioned
programs must reproduce the single-device pipeline's detections exactly
up to float reassociation: conv/BN partitioning splits only the OUTPUT
rows (reductions stay shard-local), so tolerances are tight.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from yoloclip_tpu.config import InferenceConfig, ModelConfig


@pytest.fixture(scope='module')
def detector():
    from yoloclip_tpu.inference.detector import YOLOCLIPDetector
    cfg = InferenceConfig(
        model=ModelConfig(image_size=(160, 160)),
        conf_threshold=-10.0,   # random weights: accept everything
        nms_topk=64, max_detections=16)
    return YOLOCLIPDetector(class_names=['cat', 'dog', 'person'],
                            config=cfg)


def _mesh():
    from yoloclip_tpu.parallel.mesh import create_mesh
    return create_mesh(n_data=2, n_model=2)


def test_canvas_sharding_specs():
    from yoloclip_tpu.parallel.spatial import canvas_sharding
    mesh = _mesh()
    s = canvas_sharding(mesh)   # default: single image, fold both axes
    assert s.spec == P(None, ('data', 'model'), None, None)
    s2 = canvas_sharding(mesh, batch_axis='data', height_axis='model')
    assert s2.spec == P('data', 'model', None, None)


def test_spatial_detect_matches_single_device(detector):
    """detect() through a 4-way height split == unsharded detect()."""
    from yoloclip_tpu.parallel.spatial import spatialize_detector
    rng = np.random.RandomState(7)
    img = (rng.rand(120, 200, 3) * 255).astype(np.uint8)
    base = detector.detect(img)
    assert len(base) > 0          # random weights + conf -10: plenty

    mesh = _mesh()
    spatialize_detector(detector, mesh)
    assert detector.spatial_mesh is mesh
    spat = detector.detect(img)

    assert len(spat) == len(base)
    for a, b in zip(base, spat):
        assert a['class_id'] == b['class_id']
        assert a['score'] == pytest.approx(b['score'], abs=1e-4)
        np.testing.assert_allclose(a['box'], b['box'], atol=1)


def test_spatial_detect_batch_matches(detector):
    """detect_batch() with batch over 'data' x height over 'model'."""
    from yoloclip_tpu.parallel.spatial import spatialize_detector
    rng = np.random.RandomState(11)
    images = (rng.rand(4, 160, 160, 3) * 255).astype(np.uint8)

    # rebuild the unsharded programs for the baseline (the module-scope
    # detector was spatialized by the previous test)
    detector._detect_batch_fn = detector._build_detect_batch_fn()
    base = jax.tree_util.tree_map(np.asarray,
                                  dict(detector.detect_batch(images)))

    spatialize_detector(detector, _mesh(), batch_axis='data',
                        height_axis='model')
    out = jax.tree_util.tree_map(np.asarray,
                                 dict(detector.detect_batch(images)))

    np.testing.assert_array_equal(base['count'], out['count'])
    np.testing.assert_array_equal(base['class_ids'], out['class_ids'])
    np.testing.assert_allclose(base['scores'], out['scores'], atol=1e-4)
    np.testing.assert_allclose(base['boxes'], out['boxes'], atol=0.5)


def test_spatialize_drops_batch_axis_from_height_split(detector):
    """batch_axis must not reappear in the batched height split (a mesh
    axis cannot shard two dims); the fallback when every height axis is
    consumed is an unsharded height dim."""
    from yoloclip_tpu.parallel.spatial import (canvas_sharding,
                                               spatialize_detector)
    mesh = _mesh()
    spatialize_detector(detector, mesh, batch_axis='data',
                        height_axis=('data', 'model'))
    # equivalent spec: batch over 'data', height over the remaining axis
    want = canvas_sharding(mesh, batch_axis='data', height_axis='model')
    assert want.spec == P('data', 'model', None, None)
    spatialize_detector(detector, mesh, batch_axis='data',
                        height_axis='data')   # fully consumed -> None
    rng = np.random.RandomState(3)
    images = (rng.rand(2, 160, 160, 3) * 255).astype(np.uint8)
    out = detector.detect_batch(images)       # still runs (batch-only DP)
    assert int(np.asarray(out['count']).shape[0]) == 2
