import os
import sys

# Tests run on a virtual 8-device CPU mesh; the real TPU is reserved for
# bench.py and production runs.
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

# Persistent compilation cache: this box has few physical cores, so cold
# XLA:CPU compiles of the batched while-loops can take minutes — cache
# them across test processes.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          '.jax_cache')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', _cache_dir)
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '0')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.1')

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
