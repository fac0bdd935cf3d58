"""Tests for general utils, visualization, profiling helpers."""

import logging
import os

import numpy as np
import jax.numpy as jnp
import pytest

from yoloclip_tpu.utils.general import (Timer, create_unique_output_dir,
                                        load_yaml, save_yaml, set_seed,
                                        setup_logger)
from yoloclip_tpu.utils.profiling import StageTimer, memory_stats
from yoloclip_tpu.utils.visualize import draw_detections, generate_colors
from yoloclip_tpu.ops.boxes import adjust_box_coordinates, compute_padding_size


def test_set_seed_reproducible():
    set_seed(7)
    a = np.random.rand(3)
    set_seed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_yaml_roundtrip(tmp_path):
    data = {'a': 1, 'b': [1, 2], 'c': {'d': 'x'}}
    p = str(tmp_path / 'sub' / 'x.yaml')
    save_yaml(data, p)
    assert load_yaml(p) == data


def test_unique_output_dir(tmp_path):
    d1 = create_unique_output_dir(str(tmp_path), 'run')
    d2 = create_unique_output_dir(str(tmp_path), 'run')
    assert d1 != d2
    assert os.path.isdir(d1) and os.path.isdir(d2)
    assert d1.endswith('run_000') and d2.endswith('run_001')


def test_timer_blocks_device_work():
    with Timer('t') as t:
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        t.block(x)
    assert t.elapsed > 0


def test_stage_timer():
    st = StageTimer()
    with st.stage('compute'):
        st.observe(jnp.ones((32, 32)) * 2)
    with st.stage('compute'):
        st.observe(jnp.ones((32, 32)) * 3)
    s = st.summary()
    assert s['compute']['count'] == 2
    assert s['compute']['total_s'] > 0


def test_memory_stats_shape():
    stats = memory_stats()
    assert len(stats) >= 1


def test_generate_colors_distinct():
    colors = generate_colors(80)
    assert len(colors) == 80
    assert len(set(colors)) > 70
    assert all(0 <= c <= 255 for rgb in colors for c in rgb)


def test_draw_detections_marks_pixels():
    img = np.zeros((64, 64, 3), np.uint8)
    dets = [{'box': [10, 10, 40, 40], 'score': 0.9, 'class_id': 0,
             'class_name': 'thing'}]
    out = draw_detections(img, dets, 3)
    assert out.sum() > 0
    assert img.sum() == 0   # input untouched


def test_centered_padding_helpers():
    pad = compute_padding_size((300, 400), (640, 640))
    # ratio = 1.6 -> resized (480, 640); pad_h = 160 split 80/80, pad_w 0
    assert pad == (80, 80, 0, 0)
    boxes = jnp.asarray([[0., 0., 100., 100.]])
    out = np.asarray(adjust_box_coordinates(boxes, pad, 1.6))
    np.testing.assert_allclose(out[0], [0, 80, 160, 240])


def test_setup_logger_no_duplicate_handlers(tmp_path):
    lg1 = setup_logger('ycl_test', str(tmp_path / 'log.txt'))
    n = len(lg1.handlers)
    lg2 = setup_logger('ycl_test')
    assert lg2 is lg1
    assert len(lg2.handlers) == n   # stream handler not duplicated
