"""Data pipeline tests with a synthetic in-memory COCO fixture
(SURVEY §4: "a fake in-memory COCO fixture -- the reference's dataset
contract in §2.5 defines the schema")."""

import json
import os

import numpy as np
import pytest

from yoloclip_tpu.data.coco import COCODataset
from yoloclip_tpu.data.loader import DataLoader, collate
from yoloclip_tpu.data.augment import (ColorJitter, Compose, HorizontalFlip,
                                       RandomResizedCrop,
                                       default_train_transforms)

CLASSES = ['cat', 'dog', 'bird']


@pytest.fixture(scope='module')
def coco_dir(tmp_path_factory):
    """Tiny synthetic COCO dataset: 6 images with random boxes."""
    root = tmp_path_factory.mktemp('coco')
    img_dir = root / 'images'
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    from PIL import Image
    for i in range(6):
        h, w = int(rng.randint(80, 200)), int(rng.randint(80, 200))
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f'img_{i}.png'
        Image.fromarray(arr).save(img_dir / name)
        images.append({'id': i, 'file_name': name, 'width': w, 'height': h})
        for _ in range(int(rng.randint(1, 5))):
            bw, bh = float(rng.uniform(10, w / 2)), float(rng.uniform(10, h / 2))
            x, y = float(rng.uniform(0, w - bw)), float(rng.uniform(0, h - bh))
            annotations.append({
                'id': ann_id, 'image_id': i,
                'category_id': int(rng.randint(1, 4)),
                'bbox': [x, y, bw, bh], 'area': bw * bh, 'iscrowd': 0,
            })
            ann_id += 1
    categories = [{'id': k + 1, 'name': n} for k, n in enumerate(CLASSES)]
    anno = {'images': images, 'annotations': annotations,
            'categories': categories}
    anno_path = root / 'instances.json'
    with open(anno_path, 'w') as f:
        json.dump(anno, f)
    return str(anno_path), str(img_dir)


def test_dataset_item_contract(coco_dir):
    anno, imgs = coco_dir
    ds = COCODataset(anno, imgs, CLASSES, img_size=(320, 320), mode='val',
                     max_objects=50)
    assert len(ds) == 6
    item = ds[0]
    assert item['images'].shape == (320, 320, 3)
    assert item['images'].dtype == np.float32
    assert 0.0 <= item['images'].min() and item['images'].max() <= 1.0
    assert item['boxes'].shape == (50, 4)
    assert item['class_ids'].shape == (50,)
    assert item['valid_mask'].shape == (50,)
    n = int(item['valid_mask'].sum())
    assert n >= 1
    # valid boxes inside the letterboxed canvas
    b = item['boxes'][:n]
    assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
    assert b.max() <= 320
    # prompts reference the classes present
    assert all(p.startswith('a photo of a ') for p in item['text_prompts'])


def test_dataset_letterbox_scaling(coco_dir):
    anno, imgs = coco_dir
    ds = COCODataset(anno, imgs, CLASSES, img_size=(320, 320), mode='val')
    info = ds.image_infos[0]
    item = ds[0]
    ratio = min(320 / info['height'], 320 / info['width'])
    # content occupies exactly the top-left scaled region
    nh, nw = int(info['height'] * ratio), int(info['width'] * ratio)
    img = item['images']
    assert nh == 320 or img[nh:, :, :].max() == 0.0
    assert nw == 320 or img[:, nw:, :].max() == 0.0


def test_dataset_mosaic(coco_dir):
    anno, imgs = coco_dir
    ds = COCODataset(anno, imgs, CLASSES, img_size=(320, 320), mode='train',
                     mosaic_prob=1.0, max_objects=50, seed=3)
    item = ds[0]
    assert item['image_id'] == -1          # mosaic marker (ref :428)
    assert item['images'].shape == (320, 320, 3)
    n = int(item['valid_mask'].sum())
    b = item['boxes'][:n]
    if n:
        assert b.max() <= 320 and b.min() >= 0


def test_collate_and_loader(coco_dir):
    anno, imgs = coco_dir
    ds = COCODataset(anno, imgs, CLASSES, img_size=(160, 160), mode='val',
                     max_objects=20)
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                    drop_last=True, seed=1)
    assert len(dl) == 3
    batches = list(dl)
    assert len(batches) == 3
    b = batches[0]
    assert b['images'].shape == (2, 160, 160, 3)
    assert b['boxes'].shape == (2, 20, 4)
    assert b['class_ids'].shape == (2, 20)
    assert b['valid_mask'].shape == (2, 20)
    assert isinstance(b['text_prompts'], list)
    assert isinstance(b['text_prompts'][0], list)


def test_loader_orders_deterministically(coco_dir):
    anno, imgs = coco_dir
    ds = COCODataset(anno, imgs, CLASSES, img_size=(160, 160), mode='val')
    ids = [tuple(b['image_id'].tolist())
           for b in DataLoader(ds, 2, shuffle=True, num_workers=0, seed=7)]
    ids2 = [tuple(b['image_id'].tolist())
            for b in DataLoader(ds, 2, shuffle=True, num_workers=3, seed=7)]
    assert ids == ids2


def test_hflip_boxes():
    img = np.zeros((10, 20, 3), np.uint8)
    img[:, :5] = 255
    boxes = np.array([[0., 0., 5., 10.]], np.float32)
    t = HorizontalFlip(p=1.0)
    out, ob, _ = t(img, boxes, np.array([0]))
    assert out[:, 15:].max() == 255 and out[:, :15].max() == 0
    np.testing.assert_allclose(ob, [[15, 0, 20, 10]])


def test_random_resized_crop_keeps_shapes():
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    boxes = np.array([[10., 10., 50., 50.]], np.float32)
    t = RandomResizedCrop((64, 64), (0.8, 1.0), p=1.0)
    out, ob, oc = t(img, boxes, np.array([1]))
    assert out.shape == (64, 64, 3)
    if len(ob):
        assert (ob >= 0).all() and (ob <= 64).all()


def test_default_transform_pipeline_runs():
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    boxes = np.array([[5., 5., 30., 30.]], np.float32)
    t = default_train_transforms((64, 64), seed=0)
    out, ob, oc = t(img, boxes, np.array([2]))
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.uint8


# ---------------------------------------------------------------------
# open-vocabulary synthetic family (round-2 verdict missing #2)
# ---------------------------------------------------------------------
def test_open_vocab_family_links_color_and_embedding():
    from yoloclip_tpu.data.synth import make_open_vocab_family
    fam = make_open_vocab_family(32)
    fam2 = make_open_vocab_family(32)
    np.testing.assert_array_equal(fam['embeddings'], fam2['embeddings'])
    assert fam['colors'].shape == (32, 3)
    assert fam['embeddings'].shape == (32, 512)
    np.testing.assert_allclose(
        np.linalg.norm(fam['embeddings'], axis=-1), 1.0, rtol=1e-5)
    # colors stay drawable
    assert fam['colors'].min() >= 0.1 and fam['colors'].max() <= 0.9
    # embedding cosine == latent cosine (B orthonormal): the linkage that
    # makes zero-shot measurable
    u = fam['latent']
    e = fam['embeddings']
    np.testing.assert_allclose(e @ e.T, u @ u.T, atol=1e-4)
    # classes are separated: no two embeddings nearly collinear
    g = e @ e.T - np.eye(32)
    assert g.max() < 0.95


def test_open_vocab_detection_set_schema():
    from yoloclip_tpu.data.synth import (make_open_vocab_detection_set,
                                         make_open_vocab_family)
    fam = make_open_vocab_family(16)
    ids = np.array([1, 5, 9, 13])
    ds = make_open_vocab_detection_set(4, 0, fam, ids, image_size=96)
    assert ds['images'].shape == (4, 96, 96, 3)
    assert ds['boxes'].shape == (4, 8, 4)
    # labels are LOCAL indices into ids
    assert ds['class_ids'][ds['valid_mask']].max() < len(ids)
    assert ds['valid_mask'].any()
    # determinism
    ds2 = make_open_vocab_detection_set(4, 0, fam, ids, image_size=96)
    np.testing.assert_array_equal(ds['images'], ds2['images'])
    # objects really carry their class color: mean color inside a GT box
    # is closer to its own class color than to the furthest other color
    i = 0
    j = int(np.flatnonzero(ds['valid_mask'][i])[0])
    x1, y1, x2, y2 = ds['boxes'][i, j].astype(int)
    region = ds['images'][i, y1:y2, x1:x2].reshape(-1, 3)
    own = fam['colors'][ids[ds['class_ids'][i, j]]]
    d_own = np.linalg.norm(region - own, axis=-1).min()
    assert d_own < 0.2


def test_synth_density_param_and_default_bit_identity():
    """`objects=(lo, hi)` controls scene density; the default keeps
    previously seeded sets bit-identical (cached trained states depend
    on this)."""
    from yoloclip_tpu.data.synth import make_synth_detection_set
    base = make_synth_detection_set(4, seed=3, image_size=96)
    same = make_synth_detection_set(4, seed=3, image_size=96,
                                    objects=(2, 5))
    np.testing.assert_array_equal(base['images'], same['images'])
    dense = make_synth_detection_set(8, seed=3, image_size=160,
                                     objects=(6, 12), max_objects=12,
                                     min_side=16, max_side=40)
    assert dense['boxes'].shape == (8, 12, 4)
    # denser scenes really carry more objects on average
    assert dense['valid_mask'].sum(1).mean() > base['valid_mask'].sum(1).mean()
    assert dense['valid_mask'].sum(1).max() >= 6


def test_resize_numpy_bilinear_matches_cv2():
    """The pure-numpy bilinear fallback (no cv2/PIL hosts) must track
    cv2.resize INTER_LINEAR closely enough that host letterbox results
    are interchangeable (DetectionServer.submit relies on it)."""
    import cv2

    from yoloclip_tpu.data.coco import _resize_numpy_bilinear
    rs = np.random.RandomState(0)
    img = (rs.rand(37, 53, 3) * 255).astype(np.uint8)
    for w, h in [(26, 18), (80, 64), (53, 37)]:
        ours = _resize_numpy_bilinear(img, w, h)
        ref = cv2.resize(img, (w, h))
        assert ours.shape == ref.shape == (h, w, 3)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        # interior agrees to ~1 LSB; borders may differ by edge handling
        assert np.median(diff) <= 1
        assert diff.mean() <= 2.0
