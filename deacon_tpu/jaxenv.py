"""Process-wide JAX configuration for the deacon-tpu runtime.

Imported (and applied) before any jitted code compiles. The critical piece
is the persistent compilation cache: on the axon TPU backend, compiles are
erratically slow (the same program has been observed to compile in 1 s or
300+ s across sessions) and any multi-minute compile degrades the process's
dispatch latency ~100x for its remaining lifetime (PERFNOTES.md #7). With
the cache enabled, steady-state CLI runs execute only cache-hit loads.

The engine's compiled programs are deliberately index-independent (see
``build_probe_planes``'s quantized run bound), so one warm cache serves
every index/input combination at a given tile class.
"""

from __future__ import annotations

import os

_APPLIED = False


def ensure(cache_dir: str | None = None) -> None:
    """Enable the persistent compile cache (idempotent).

    Resolution order: explicit arg > $DEACON_TPU_JAX_CACHE > repo-local
    ``.jax_cache`` if it exists (dev checkouts) > ``~/.cache/deacon_tpu``.
    Set DEACON_TPU_JAX_CACHE=0 to disable.
    """
    global _APPLIED
    if _APPLIED:
        return
    _APPLIED = True

    env = os.environ.get("DEACON_TPU_JAX_CACHE")
    if env == "0":
        return
    if cache_dir is None:
        cache_dir = env
    if cache_dir is None:
        repo_cache = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
        if os.path.isdir(repo_cache):
            cache_dir = repo_cache
        else:
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "deacon_tpu", "jax_cache"
            )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        try:
            # honor JAX_PLATFORMS even under site hooks that force their
            # own platform (the axon deployment registers its plugin in
            # sitecustomize and wins over the env var unless the config
            # knob is set explicitly — cf. tests/conftest.py)
            env_platforms = os.environ.get("JAX_PLATFORMS")
            if env_platforms:
                jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass
        # persist everything, even sub-second compiles: the poisoned-regime
        # risk makes every avoided compile worth a disk entry
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it


def default_backend_is_tunneled() -> bool:
    """True when the default JAX backend is a remote/tunneled accelerator
    (the experimental `axon` platform) whose device->host materializations
    run ~100x below chip speed (PERFNOTES.md "cassette" notes). Auto device
    selection routes real workloads to the C++ host engine in that case;
    --device tpu still forces the device path."""
    import sys

    env = os.environ.get("JAX_PLATFORMS", "")
    if "axon" in env.lower():
        # env-first: answering via jax.devices() would import jax (~2 s of
        # CLI wall time) and initialize the tunneled backend just to learn
        # we should not use it
        return True
    if "jax" not in sys.modules:
        # jax not yet imported and no tunnel pinned in the env: don't pay
        # the import+backend init for a heuristic — assume not tunneled
        return False
    try:
        import jax

        return "axon" in jax.devices()[0].client.platform_version.lower()
    except Exception:
        return False
