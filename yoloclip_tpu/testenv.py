"""pytest early-load plugin: force the CPU backend for the test suite.

Loaded via `addopts = -p yoloclip_tpu.testenv` in pyproject.toml, which
imports this module during pytest's pre-parse phase -- BEFORE output capture
starts and before conftests load. This container registers a remote-TPU
PJRT plugin from `sitecustomize` at interpreter startup (JAX_PLATFORMS=axon)
which cannot be undone in-process, and every tiny test compile would cross a
network tunnel; re-exec'ing here with a scrubbed environment gets a clean
interpreter with a virtual 8-device CPU platform (SURVEY.md §4's multi-chip
test trick) while fds are still the caller's.
"""

import os
import sys

if (os.environ.get('_YOLOCLIP_TEST_REEXEC') != '1'
        and os.environ.get('JAX_PLATFORMS', '') not in ('', 'cpu')):
    env = dict(os.environ)
    env['_YOLOCLIP_TEST_REEXEC'] = '1'
    env['JAX_PLATFORMS'] = 'cpu'
    env['PALLAS_AXON_POOL_IPS'] = ''   # disable remote-TPU plugin registration
    flags = env.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        env['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, '-m', 'pytest'] + sys.argv[1:], env)
