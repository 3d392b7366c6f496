"""JAX runtime/session setup for haphic_tpu.

Every fresh process pays XLA compilation for the jitted kernels (the
batched MCL while-loop alone was measured at ~40-200 s cold on a
TPU v5e behind the 'axon' tunnel).  JAX's persistent compilation cache
removes that cost for every process after the first — but in
environments where ``jax`` is pre-imported at interpreter startup
(sitecustomize/.pth hooks), setting ``JAX_COMPILATION_CACHE_DIR`` in
user code or even in ``os.environ`` before *our* import is too late:
the config flag snapshots the environment when ``jax._src.config`` is
first imported.  The only reliable mechanism is
``jax.config.update('jax_compilation_cache_dir', ...)`` at runtime,
which this module applies exactly once, package-wide.

Measured on the real chip: `` _mcl_batched`` cold compile 42.5 s →
1.4 s in a fresh process with the cache warm.

The reference has no analogous concern (pure CPU scipy/MKL,
scripts/HapHiC_cluster.py:2017-2062); this is TPU-framework
infrastructure the rebuild needs so `haphic pipeline` is usable in
production, not only in pre-warmed benches.
"""

from __future__ import annotations

import os

_configured = False


def default_cache_dir() -> str:
    base = os.environ.get('XDG_CACHE_HOME') or os.path.join(
        os.path.expanduser('~'), '.cache')
    return os.path.join(base, 'haphic_tpu', 'jax-cache')


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (idempotent).

    Resolution order for the cache directory:
      1. explicit ``cache_dir`` argument
      2. ``HAPHIC_JAX_CACHE_DIR`` environment variable
      3. ``JAX_COMPILATION_CACHE_DIR`` environment variable (re-applied
         here because a pre-imported jax never saw it)
      4. ``~/.cache/haphic_tpu/jax-cache``

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

    path = (cache_dir
            or os.environ.get('HAPHIC_JAX_CACHE_DIR')
            or os.environ.get('JAX_COMPILATION_CACHE_DIR')
            or default_cache_dir())
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
