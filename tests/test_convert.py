"""Checkpoint-conversion tests: the declarative key map must cover our whole
variable tree, and import(export(v)) must round-trip exactly. The export
side doubles as a synthetic "reference checkpoint" generator, so the import
path is exercised with true torch-layout arrays."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yoloclip_tpu.config import ModelConfig
from yoloclip_tpu.models.yolo_clip import YOLOCLIP
from yoloclip_tpu.utils.convert import (build_key_map,
                                        convert_reference_state_dict,
                                        export_reference_state_dict)


@pytest.fixture(scope='module')
def variables_and_cfg():
    cfg = ModelConfig(image_size=(128, 128))
    model = YOLOCLIP(cfg)
    rng = jax.random.PRNGKey(0)
    v = model.init(rng, jnp.zeros((1, 128, 128, 3)), jnp.zeros((4, 512)),
                   with_aux_box=True)
    return cfg, model, v


def _flat_paths(tree, prefix=()):
    for k, val in tree.items():
        if isinstance(val, dict):
            yield from _flat_paths(val, prefix + (k,))
        else:
            yield prefix + (k,)


def test_key_map_covers_full_tree(variables_and_cfg):
    cfg, _, variables = variables_and_cfg
    mapped = {p for _, p, _ in build_key_map(cfg)}
    actual = set(_flat_paths({'params': variables['params'],
                              'batch_stats': variables['batch_stats']}))
    missing = actual - mapped
    assert not missing, f'unmapped flax params: {sorted(missing)[:10]}'
    extra = mapped - actual
    assert not extra, f'map names nonexistent params: {sorted(extra)[:10]}'


def test_roundtrip_exact(variables_and_cfg):
    cfg, _, variables = variables_and_cfg
    sd = export_reference_state_dict(variables, cfg)
    # torch-layout sanity: conv weights are OIHW
    w = sd['backbone.stem.conv.weight']
    assert w.shape == (16, 3, 3, 3)
    assert sd['neck.text_csplayers.0.text_proj.weight'].shape == (32, 512)

    back = convert_reference_state_dict(sd, cfg)
    flat_a = dict(zip(_flat_paths(variables['params']),
                      jax.tree_util.tree_leaves(variables['params'])))
    for path in _flat_paths(back['params']):
        a = np.asarray(_lookup(variables['params'], path))
        b = np.asarray(_lookup(back['params'], path))
        np.testing.assert_array_equal(a, b, err_msg=str(path))
    for path in _flat_paths(back['batch_stats']):
        a = np.asarray(_lookup(variables['batch_stats'], path))
        b = np.asarray(_lookup(back['batch_stats'], path))
        np.testing.assert_array_equal(a, b, err_msg=str(path))


def _lookup(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def test_converted_weights_forward_identical(variables_and_cfg):
    """Model output with round-tripped weights must match bit-for-bit."""
    cfg, model, variables = variables_and_cfg
    sd = export_reference_state_dict(variables, cfg)
    back = convert_reference_state_dict(sd, cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))
    text = jax.random.normal(jax.random.PRNGKey(2), (4, 512))
    out_a = model.apply(variables, img, text)
    out_b = model.apply(back, img, text)
    np.testing.assert_array_equal(np.asarray(out_a['boxes']),
                                  np.asarray(out_b['boxes']))
    np.testing.assert_array_equal(np.asarray(out_a['scores']),
                                  np.asarray(out_b['scores']))


def test_missing_key_raises(variables_and_cfg):
    cfg, _, variables = variables_and_cfg
    sd = export_reference_state_dict(variables, cfg)
    del sd['backbone.stem.conv.weight']
    with pytest.raises(KeyError, match='backbone.stem.conv.weight'):
        convert_reference_state_dict(sd, cfg)
