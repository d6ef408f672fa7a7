"""Persistent XLA compilation cache for the production entry points.

The replicate flow runs generation and scoring as SEPARATE processes
(reference ``replicate.sh:73-103``), and on the axon-tunnel TPU backend
every process pays remote compiles measured in minutes (the full 5B
denoise program alone is ~8 min cold).  Pointing JAX's persistent
compilation cache at a repo-local directory makes every process after the
first start near-instantly: the cache key covers the HLO, the jax/XLA
version, and the device config, so source edits or shape changes simply
miss and recompile.

CPU runs (the test suite's virtual 8-device mesh, bench smoke mode) skip
the cache by default: CPU compiles are fast, and XLA:CPU's AOT loader
logs a machine-feature mismatch warning per cached load that would drown
test output.  ``force=True`` opts in anyway — used by the AOT 5B-train
memory proof, which compiles against a *TPU topology* even when the
default platform is CPU (``train/memory.py``).
"""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]


def enable_compile_cache(force: bool = False) -> None:
    """Point jax at a persistent compilation cache (idempotent).

    Resolution order: ``VIDEOGPA_COMPILE_CACHE=0`` disables;
    ``JAX_COMPILATION_CACHE_DIR`` overrides the location; otherwise the
    cache lives at ``<repo>/.jax_cache`` (gitignored).
    """
    if os.environ.get("VIDEOGPA_COMPILE_CACHE", "1") == "0":
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # already configured (possibly by the user)
    if not force:
        plats = (jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS") or "")
        if plats.strip().lower() == "cpu":
            return
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", default)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - older jax knob names
        pass
