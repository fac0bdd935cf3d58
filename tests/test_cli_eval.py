"""Standalone evaluation CLI: real serving path vs raw COCO ground truth."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope='module')
def tiny_coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp('coco_eval')
    img_dir = root / 'images'
    img_dir.mkdir()
    rng = np.random.RandomState(7)
    from PIL import Image
    images, annotations = [], []
    aid = 1
    for i in range(3):
        arr = (rng.rand(80, 120, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f'{i:06d}.png')
        images.append({'id': i + 10, 'file_name': f'{i:06d}.png',
                       'width': 120, 'height': 80})
        annotations.append({'id': aid, 'image_id': i + 10,
                            'category_id': 3,  # sparse ids on purpose
                            'bbox': [10.0, 10.0, 50.0, 40.0],
                            'area': 2000.0, 'iscrowd': 0})
        aid += 1
    anno = {'images': images, 'annotations': annotations,
            'categories': [{'id': 3, 'name': 'cat'},
                           {'id': 9, 'name': 'dog'}]}
    path = root / 'anno.json'
    with open(path, 'w') as f:
        json.dump(anno, f)
    return str(path), str(img_dir)


def test_eval_cli_end_to_end(tiny_coco_dir, tmp_path, capsys):
    """Random weights + conf=-10: every image yields detections through
    the real detect path; mAP is computed (finite), the compat evaluator
    runs, and the COCO results JSON carries the DATASET's sparse
    category ids."""
    from yoloclip_tpu.cli.eval import main

    anno, imgs = tiny_coco_dir
    cfg = tmp_path / 'cfg.yaml'
    cfg.write_text('model:\n  image_size: [96, 96]\n'
                   'nms_topk: 32\nmax_detections: 8\n')
    out_json = str(tmp_path / 'results.json')
    rc = main(['--anno', anno, '--images', imgs, '--config', str(cfg),
               '--conf', '-10', '--compat', '--per-class',
               '--coco-json', out_json, '--limit', '2'])
    assert rc == 0
    out = capsys.readouterr().out
    assert 'images: 2' in out and 'classes: 2' in out
    assert 'mAP@50:' in out and 'reference-compat evaluator:' in out
    assert 'cat' in out and '(no ground truth)' in out   # dog has no GT

    with open(out_json) as f:
        rows = json.load(f)
    assert rows, 'conf=-10 must produce detections'
    assert {r['image_id'] for r in rows} <= {10, 11}
    assert {r['category_id'] for r in rows} <= {3, 9}   # sparse remap
    for r in rows:
        assert r['bbox'][2] >= 0 and r['bbox'][3] >= 0


def test_eval_cli_no_matching_images(tiny_coco_dir, tmp_path):
    from yoloclip_tpu.cli.eval import main
    anno, imgs = tiny_coco_dir
    rc = main(['--anno', anno, '--images', imgs, '--classes', 'zebra'])
    assert rc == 1
