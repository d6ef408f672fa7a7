"""Gating tests for the persistent compilation cache bootstrap.

The production entry points arm JAX's persistent compilation cache through
``videogpa_tpu.utils.compile_cache.enable_compile_cache`` (called from
``models/loader.py::resolve_model_dir``) so the reference-style
multi-process flows — ``replicate.sh``'s generate-then-score phases
(``/root/reference/replicate.sh:73-103``) — pay the minutes-long remote
TPU compiles once, not once per process.

These tests run the bootstrap in a SUBPROCESS: ``jax.config`` is process
global, and arming the cache inside the suite process would turn on CPU
AOT caching (and its per-load stderr warnings) for every later test.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(snippet: str, env_extra=None) -> str:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env.pop("VIDEOGPA_COMPILE_CACHE", None)
    if env_extra:
        env.update(env_extra)
    out = subprocess.run(
        [sys.executable, "-c", snippet],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout.strip()


SNIPPET = """
import jax
jax.config.update("jax_platforms", "cpu")
from videogpa_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache({kwargs})
print(repr(jax.config.jax_compilation_cache_dir))
"""


def test_cpu_platform_skips_by_default():
    assert _run(SNIPPET.format(kwargs="")) == "None"


def test_force_arms_repo_cache_dir():
    out = _run(SNIPPET.format(kwargs="force=True"))
    assert out.endswith(".jax_cache'"), out


def test_env_dir_override():
    out = _run(
        SNIPPET.format(kwargs="force=True"),
        env_extra={"JAX_COMPILATION_CACHE_DIR": "/tmp/videogpa_cache_test"},
    )
    assert out == "'/tmp/videogpa_cache_test'", out


def test_opt_out_env():
    out = _run(
        SNIPPET.format(kwargs="force=True"),
        env_extra={"VIDEOGPA_COMPILE_CACHE": "0"},
    )
    assert out == "None", out


def test_opt_out_falsey_spellings():
    for v in ("false", "no", "off", "FALSE"):
        out = _run(
            SNIPPET.format(kwargs="force=True"),
            env_extra={"VIDEOGPA_COMPILE_CACHE": v},
        )
        assert out == "None", (v, out)


def test_cache_entry_actually_written_and_reused(tmp_path):
    """End-to-end: a forced cache arm must WRITE an entry on first compile
    and produce no new entries on a second-process recompile of the same
    program — guarding against a jax upgrade renaming
    ``jax_persistent_cache_min_compile_time_secs`` (the ``except`` in
    ``enable_compile_cache`` would swallow it and fast-compiling programs
    would silently stop being cached)."""
    cache_dir = str(tmp_path / "cache")
    snippet = """
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from videogpa_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(force=True)
print(float(jax.jit(lambda x: (x * 2.0).sum())(jnp.ones((32, 32)))))
"""
    _run(snippet, env_extra={"JAX_COMPILATION_CACHE_DIR": cache_dir})
    entries = [f for f in os.listdir(cache_dir) if not f.startswith(".")]
    assert entries, "first process wrote no persistent-cache entry"
    _run(snippet, env_extra={"JAX_COMPILATION_CACHE_DIR": cache_dir})
    entries2 = [f for f in os.listdir(cache_dir) if not f.startswith(".")]
    assert sorted(entries2) == sorted(entries), (
        "second process missed the cache (new entries appeared)"
    )


def test_user_config_wins():
    snippet = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/user_chosen")
from videogpa_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(force=True)
print(repr(jax.config.jax_compilation_cache_dir))
"""
    assert _run(snippet) == "'/tmp/user_chosen'"
