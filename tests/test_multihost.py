"""Multi-host (pod-scale) scaffolding: parallel/multihost.py.

The heavy check spawns TWO real JAX processes (4 virtual CPU devices
each) that form ONE global 8-device mesh over jax.distributed/Gloo, run
the sharded train step on process-locally assembled global arrays, and
round-trip a coordinated orbax checkpoint through a shared directory.
Their loss must agree with the same step computed single-process on the
same 8-device mesh -- the GSPMD program is identical, only the process
boundary moves.
"""

import os
import re
import subprocess
import sys

import jax
import numpy as np
import pytest


def test_process_local_indices_cover_and_partition():
    from yoloclip_tpu.parallel.multihost import process_local_indices
    a = process_local_indices(10, process_index=0, process_count=3)
    b = process_local_indices(10, process_index=1, process_count=3)
    c = process_local_indices(10, process_index=2, process_count=3)
    assert sorted(a + b + c) == list(range(10))
    assert not (set(a) & set(b)) and not (set(b) & set(c))
    # strided, not contiguous: spreads annotation-file ordering
    assert a == [0, 3, 6, 9]


def test_process_local_indices_even_trims_to_equal_length():
    from yoloclip_tpu.parallel.multihost import process_local_indices
    shards = [process_local_indices(10, process_index=i, process_count=3,
                                    even=True) for i in range(3)]
    assert [len(s) for s in shards] == [3, 3, 3]   # not [4, 3, 3]
    merged = sorted(x for s in shards for x in s)
    assert len(set(merged)) == 9                   # still disjoint


def test_subset_remaps_indices():
    from yoloclip_tpu.parallel.multihost import Subset
    base = [10, 11, 12, 13, 14]
    s = Subset(base, [4, 0, 2])
    assert len(s) == 3
    assert [s[i] for i in range(3)] == [14, 10, 12]


def test_local_batch_size_divisibility():
    from yoloclip_tpu.parallel.multihost import local_batch_size
    assert local_batch_size(32) == 32   # single process here
    assert local_batch_size(32, process_count=4) == 8
    with pytest.raises(ValueError, match='divisible'):
        local_batch_size(33, process_count=2)


def test_make_global_batch_single_process():
    """Degenerate (1-process) case: global == local, sharded over 'data'."""
    from yoloclip_tpu.parallel.mesh import create_mesh
    from yoloclip_tpu.parallel.multihost import (make_global_batch,
                                                 make_global_text)
    mesh = create_mesh(n_data=4, n_model=2)
    local = {'images': np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
             'n': 3}
    g = make_global_batch(local, mesh)
    assert g['n'] == 3
    np.testing.assert_array_equal(np.asarray(g['images']), local['images'])
    assert g['images'].sharding.spec == jax.sharding.PartitionSpec('data')
    t = make_global_text(np.ones((8, 8, 16), np.float32), mesh)
    assert t.shape == (8, 8, 16)


_LOSS_RE = re.compile(r'MULTIHOST_SELFTEST pid=(\d) procs=2 '
                      r'loss=([-\d.]+)')


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    """2 processes x 4 devices == 1 process x 8 devices, same mesh, same
    global batch, same loss; coordinated checkpoint succeeds."""
    from yoloclip_tpu.parallel.multihost import _selftest_loss
    want = _selftest_loss(num_processes=1)

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PALLAS_AXON_POOL_IPS'] = ''
    flags = [f for f in env.get('XLA_FLAGS', '').split()
             if 'xla_force_host_platform_device_count' not in f]
    env['XLA_FLAGS'] = ' '.join(
        flags + ['--xla_force_host_platform_device_count=4'])
    ckpt = str(tmp_path / 'shared_ckpt')
    cmd = [sys.executable, '-m', 'yoloclip_tpu.parallel.multihost',
           '--selftest', '--num-processes', '2',
           '--coordinator', '127.0.0.1:19741', '--ckpt-dir', ckpt]
    procs = [subprocess.Popen(cmd + ['--process-id', str(i)], env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'rc={p.returncode}\n{out[-3000:]}'
    losses = []
    for out in outs:
        m = _LOSS_RE.search(out)
        assert m, f'no selftest line in output:\n{out[-3000:]}'
        losses.append(float(m.group(2)))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)
    assert losses[0] == pytest.approx(want, rel=2e-4)
    assert os.path.isdir(os.path.join(ckpt, 'state'))


_CLI_DRIVER = '''
import sys, zlib
import numpy as np

class Stub:   # deterministic across processes (no PYTHONHASHSEED skew)
    def __call__(self, prompts):
        out = []
        for p in prompts:
            rs = np.random.RandomState(zlib.crc32(p.encode()) % (2 ** 31))
            v = rs.randn(512).astype(np.float32)
            out.append(v / np.linalg.norm(v))
        return np.stack(out)

import yoloclip_tpu.text.encoder as enc
enc.CLIPTextEncoder = lambda *a, **k: Stub()
from yoloclip_tpu.cli import train as cli_train
sys.exit(cli_train.main(sys.argv[1:]))
'''


@pytest.mark.slow
def test_cli_train_multihost_two_processes(tmp_path):
    """`yolo-clip-train --multihost` end to end: 2 processes x 4 devices,
    per-host dataset shards, global batches, allgathered eval, coordinated
    checkpoints into one shared output dir."""
    import json

    import yaml
    from PIL import Image

    img_dir = tmp_path / 'images'
    img_dir.mkdir()
    rng = np.random.RandomState(3)
    classes = ['cat', 'dog', 'bird']
    images, annotations = [], []
    for i in range(4):
        arr = (rng.rand(100, 140, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f'{i}.png')
        images.append({'id': i, 'file_name': f'{i}.png',
                       'width': 140, 'height': 100})
        annotations.append({'id': i + 1, 'image_id': i,
                            'category_id': int(rng.randint(1, 4)),
                            'bbox': [10.0, 10.0, 40.0, 30.0],
                            'area': 1200.0, 'iscrowd': 0})
    anno_path = tmp_path / 'anno.json'
    with open(anno_path, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': [{'id': k + 1, 'name': n}
                                  for k, n in enumerate(classes)]}, f)
    cfg_path = tmp_path / 'cfg.yaml'
    with open(cfg_path, 'w') as f:
        yaml.safe_dump({
            'train_anno_path': str(anno_path), 'train_img_dir': str(img_dir),
            'val_anno_path': str(anno_path), 'val_img_dir': str(img_dir),
            'class_names': classes, 'image_size': [128, 128],
            'max_objects': 10, 'batch_size': 4, 'max_epochs': 1,
            'warmup_epochs': 1, 'num_workers': 0, 'mosaic_prob': 0.0,
            'eval_interval': 1,
            'output_dir': str(tmp_path / 'out')}, f)
    driver = tmp_path / 'driver.py'
    driver.write_text(_CLI_DRIVER)

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PALLAS_AXON_POOL_IPS'] = ''
    # the driver script lives in tmp_path, so only ITS dir lands on
    # sys.path -- the repo root must come via PYTHONPATH
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = os.pathsep.join(
        [repo] + [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
                  if p])
    flags = [f for f in env.get('XLA_FLAGS', '').split()
             if 'xla_force_host_platform_device_count' not in f]
    env['XLA_FLAGS'] = ' '.join(
        flags + ['--xla_force_host_platform_device_count=4'])
    cmd = [sys.executable, str(driver), '--config', str(cfg_path),
           '--multihost', '--num-processes', '2',
           '--coordinator', '127.0.0.1:19747']
    procs = [subprocess.Popen(cmd + ['--process-id', str(i)], env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'rc={p.returncode}\n{out[-3000:]}'
    assert os.path.isdir(str(tmp_path / 'out' / 'final_model'))
