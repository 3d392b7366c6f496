"""JAX runtime/session setup for haphic_tpu.

Two environment facts shape this module (both measured on the target
TPU v5e behind the 'axon' tunnel):

1. ``jax`` may be pre-imported at interpreter startup (sitecustomize /
   .pth hooks), so setting ``JAX_COMPILATION_CACHE_DIR`` or
   ``JAX_PLATFORMS`` in ``os.environ`` from user code is too late — the
   config flags snapshot the environment when ``jax._src.config`` is
   first imported. Only ``jax.config.update(...)`` at runtime works.

2. On the tunnel TPU backend, the persistent compilation cache was
   measured (round 3) as a *pessimization*: executable
   serialization/deserialization ran on the remote service at minutes
   per medium-sized executable (the batched-MCL while-loop: raw
   compile ~1-2 s; cache deserialize >400 s). Re-measured 2026-08-22
   the pathology is gone (sparse-MCL while-loop: 61.4 s raw compile
   -> 2.5 s cache hit), so the cache is a large win there too — but
   backend behavior has now flipped once per direction, so the
   conservative default stands and the bench opts in explicitly via
   ``HAPHIC_JAX_CACHE_DIR``. On CPU (the test mesh) the cache is
   local and saves minutes of XLA:CPU compile time, so it stays on.

Policy: enable the persistent cache iff the first configured JAX
platform is ``cpu``, or the user explicitly forces a cache directory
via ``HAPHIC_JAX_CACHE_DIR``. ``HAPHIC_NO_JAX_CACHE=1`` disables it
unconditionally.
"""

from __future__ import annotations

import os

_configured = False


def _machine_tag() -> str:
    """Fingerprint of the host CPU's feature set. XLA:CPU's persistent
    cache key does NOT include machine features, so an AOT executable
    compiled on one host loads on another with a features-mismatch
    warning and *different rounding* (observed: MCL convergence
    iteration counts shifted by a stale cross-machine cache). Scoping
    the cache directory per machine avoids that silently."""
    import hashlib
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    return hashlib.sha256(
                        line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def default_cache_dir() -> str:
    base = os.environ.get('XDG_CACHE_HOME') or os.path.join(
        os.path.expanduser('~'), '.cache')
    return os.path.join(base, 'haphic_tpu', 'jax-cache')


def _first_platform(jax) -> str:
    """The platform jax will initialize first, without forcing backend
    initialization. Empty string when unconstrained."""
    plats = None
    try:
        plats = jax.config.jax_platforms
    except AttributeError:
        pass
    plats = plats or os.environ.get('JAX_PLATFORMS') or ''
    return plats.split(',')[0].strip().lower()


def setup_jax(cache_dir: str | None = None) -> None:
    """Configure the persistent XLA compilation cache (idempotent).

    Explicit opt-in (argument or ``HAPHIC_JAX_CACHE_DIR``) always wins;
    otherwise the cache is enabled only on the CPU platform (see module
    docstring for why it is harmful on the tunnel TPU backend).
    Set ``HAPHIC_NO_JAX_CACHE=1`` to disable entirely.
    """
    global _configured
    if _configured:
        return
    _configured = True

    if os.environ.get('HAPHIC_NO_JAX_CACHE'):
        return

    try:
        import jax
    except ImportError:  # pure host-side use without jax installed
        return

    explicit = cache_dir or os.environ.get('HAPHIC_JAX_CACHE_DIR')
    if not explicit and _first_platform(jax) != 'cpu':
        return
    # per-machine subdirectory — see _machine_tag for why
    path = os.path.join(explicit or default_cache_dir(), _machine_tag())
    try:
        os.makedirs(path, exist_ok=True)
        # Don't clobber a value somebody already set programmatically.
        if getattr(jax.config, 'jax_compilation_cache_dir', None) is None:
            jax.config.update('jax_compilation_cache_dir', path)
        # Cache every executable: the pipeline is many medium kernels,
        # and the default 1 s / 32 KiB floors would skip most of them.
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    except Exception:
        # Cache is an optimization; never block startup on it.
        pass
