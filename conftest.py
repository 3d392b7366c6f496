import os
import sys

# Tests run on a virtual 8-device CPU mesh; the real TPU is reserved for
# bench.py and production runs. jax may already be imported (and
# JAX_PLATFORMS may already be 'axon' in the inherited environment), so
# setting env vars is not enough — force the config at runtime before
# any backend is initialized. Set HAPHIC_TEST_TPU=1 to let TPU-marked
# integration tests see the real chip instead.
if not os.environ.get('HAPHIC_TEST_TPU'):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: this box has few physical cores, so cold
# XLA:CPU compiles of the batched while-loops can take minutes — cache
# them across test processes. jax may be pre-imported at interpreter
# startup in this image, so env vars are too late; haphic_tpu.runtime
# applies the config at runtime (the package import below triggers it).
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          '.jax_cache')
os.environ.setdefault('HAPHIC_JAX_CACHE_DIR', _cache_dir)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import haphic_tpu  # noqa: E402,F401  (runs setup_jax)
