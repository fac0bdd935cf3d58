"""Test configuration: run everything on a virtual 8-device CPU platform.

This is the standard JAX trick for testing multi-chip sharding/collectives
without hardware (SURVEY.md §4): tests that exercise `jax.sharding.Mesh`
paths see 8 devices, and single-device tests just use device 0.

This environment force-registers a remote-TPU PJRT plugin from
`sitecustomize` at interpreter startup (JAX_PLATFORMS=axon), which both
ignores in-process env changes and makes every tiny test compile cross a
network tunnel. The only reliable fix is to re-exec the interpreter with a
scrubbed environment before pytest proper starts.
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
    os.execve(sys.executable,
              [sys.executable, '-m', 'pytest'] + sys.argv[1:], env)

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_default_matmul_precision', 'highest')
