"""General utilities: seeding, YAML IO, logging, timing, run dirs.

Covers `/root/reference/yolo_clip_detector/utils/general.py:15-192`
(set_seed, load_yaml/save_yaml, setup_logger, Timer,
create_unique_output_dir, copy_code_to_dir).
"""

from __future__ import annotations

import logging
import os
import random
import shutil
import time
from typing import Any, Dict, Optional

import numpy as np


def set_seed(seed: int = 42) -> None:
    """Seed python/numpy (JAX randomness is explicit via PRNGKey)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ['PYTHONHASHSEED'] = str(seed)


def load_yaml(path: str) -> Dict[str, Any]:
    import yaml
    with open(path) as f:
        return yaml.safe_load(f) or {}


def save_yaml(data: Dict[str, Any], path: str) -> None:
    import yaml
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, 'w') as f:
        yaml.safe_dump(data, f, sort_keys=False)


def setup_logger(name: str = 'yoloclip_tpu',
                 log_file: Optional[str] = None,
                 level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    fmt = logging.Formatter(
        '%(asctime)s - %(name)s - %(levelname)s - %(message)s')
    if not logger.handlers:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if log_file:
        d = os.path.dirname(log_file)
        if d:
            os.makedirs(d, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class Timer:
    """Context-manager stopwatch with named accumulation.

    For device work, call `.block(x)` (jax.block_until_ready) before exit so
    wall-clock covers the async dispatch -- the torch reference times eager
    ops which are synchronous on CPU.
    """

    def __init__(self, name: str = '', logger: Optional[logging.Logger] = None):
        self.name = name
        self.logger = logger
        self.elapsed = 0.0
        self._start = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def block(self, x):
        import jax
        jax.block_until_ready(x)
        return x

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._start
        if self.logger:
            self.logger.info('%s took %.4fs', self.name or 'block',
                             self.elapsed)
        return False


def enable_compile_cache(cache_dir: Optional[str] = None) -> None:
    """Turn on JAX's persistent compilation cache.

    First full-model compile on a remote/fresh TPU can take minutes; with
    the cache, subsequent process starts reuse it. Default location:
    <repo-or-install root>/.jax_cache.
    """
    import jax
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)


def create_unique_output_dir(base_dir: str, prefix: str = 'run') -> str:
    """Create base/prefix_NNN with the first free index."""
    os.makedirs(base_dir, exist_ok=True)
    i = 0
    while True:
        path = os.path.join(base_dir, f'{prefix}_{i:03d}')
        if not os.path.exists(path):
            os.makedirs(path)
            return path
        i += 1


def copy_code_to_dir(output_dir: str, src_dir: Optional[str] = None) -> str:
    """Snapshot the package source into the run dir for reproducibility."""
    if src_dir is None:
        src_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(output_dir, 'code')
    shutil.copytree(src_dir, dst,
                    ignore=shutil.ignore_patterns('__pycache__', '*.pyc'),
                    dirs_exist_ok=True)
    return dst
