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

Known limitations of the CPU-skip heuristic (it reads
``jax.config.jax_platforms`` WITHOUT initializing a backend — eager
backend init here would cost minutes of tunnel client startup):

- On a CPU-only machine with nothing set (``jax_platforms`` is None) the
  cache still gets armed, so implicit-CPU runs may see the noisy XLA:CPU
  AOT-loader warnings.  Set ``VIDEOGPA_COMPILE_CACHE=0`` (or
  ``JAX_PLATFORMS=cpu``, which populates the config default) there.
- On the axon TPU machine the plugin ignores ``JAX_PLATFORMS``; exporting
  ``JAX_PLATFORMS=cpu`` there makes the config *claim* cpu while the
  process actually runs on TPU, silently skipping the cache.  Use the
  config knob (``jax.config.update("jax_platforms", "cpu")``) to really
  run on CPU, as every repo entry point does.
"""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]


def enable_compile_cache(force: bool = False) -> None:
    """Point jax at a persistent compilation cache (idempotent).

    Resolution order: ``VIDEOGPA_COMPILE_CACHE=0`` (also ``false``/``no``/
    ``off``) disables; ``JAX_COMPILATION_CACHE_DIR`` overrides the
    location; otherwise the cache lives at ``<repo>/.jax_cache``
    (gitignored).
    """
    if os.environ.get("VIDEOGPA_COMPILE_CACHE", "1").strip().lower() in (
        "0", "false", "no", "off",
    ):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        # Dir already configured (by the user, or by jax reading the
        # JAX_COMPILATION_CACHE_DIR env var at import).  Leave the location
        # alone but still lower the min-compile-time threshold — jax's
        # default (1 s) silently skips caching fast-compiling programs —
        # unless the user pinned the threshold themselves via env.
        if "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in os.environ:
            try:
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 0.0
                )
            except Exception:  # pragma: no cover - older jax knob names
                pass
        return
    if not force:
        # jax_platforms defaults from the JAX_PLATFORMS env var at import,
        # so reading the config covers both; see module docstring for the
        # two known divergences (implicit CPU, axon plugin ignoring env).
        plats = jax.config.jax_platforms or ""
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
