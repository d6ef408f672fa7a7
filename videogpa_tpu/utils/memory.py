"""Device (HBM) memory introspection + cleanup helpers.

TPU-native equivalent of the reference's CUDA memory utilities
(``depth_anything_3/utils/memory.py:16-127``) used by the backend service
and CLI to make consistent load/infer decisions:

- ``get_device_memory_info``: snapshot of per-device HBM usage from the JAX
  runtime's allocator stats (keys mirror the reference: total_gb,
  allocated_gb, reserved_gb, free_gb, utilization).
- ``cleanup_device_memory``: drop dead references and — optionally — the
  jit compilation caches (XLA owns the allocator; there is no
  ``empty_cache`` analog, live buffers ARE the reservation).
- ``check_memory_availability`` / ``estimate_memory_requirement``: the same
  go / no-go policy surface as the reference.
"""

from __future__ import annotations

import gc
from typing import Any, Dict, Optional, Tuple


def get_device_memory_info(device=None) -> Optional[Dict[str, Any]]:
    """Memory snapshot of one device (default: first). None when the
    backend exposes no allocator statistics (e.g. CPU)."""
    import jax

    if device is None:
        devices = jax.devices()
        if not devices:
            return None
        device = devices[0]
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    if not stats:
        return None
    total = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    allocated = stats.get("bytes_in_use", 0)
    reserved = stats.get("peak_bytes_in_use", allocated)
    if not total:
        return None
    gb = 1024 ** 3
    return {
        "device": str(device),
        "total_gb": total / gb,
        "allocated_gb": allocated / gb,
        "reserved_gb": reserved / gb,
        "free_gb": (total - allocated) / gb,
        "utilization": allocated / total * 100.0,
    }


def cleanup_device_memory(clear_compile_cache: bool = False) -> None:
    """Free whatever host-side references are holding device buffers alive.

    XLA's allocator has no reserved-but-free cache to drop (unlike CUDA
    caching allocators) — device memory is freed when the owning
    ``jax.Array`` is garbage collected, so ``gc.collect()`` is the real
    lever. ``clear_compile_cache=True`` additionally drops jitted
    executables (their weight-sized constants can pin HBM) at the cost of
    recompiles — the analog of the reference's between-model-loads cleanup.
    """
    import jax

    before = get_device_memory_info()
    gc.collect()
    if clear_compile_cache:
        jax.clear_caches()
        gc.collect()
    after = get_device_memory_info()
    if before and after:
        freed = before["allocated_gb"] - after["allocated_gb"]
        print(
            f"device cleanup: freed {freed:.2f}GB, available: "
            f"{after['free_gb']:.2f}GB/{after['total_gb']:.2f}GB"
        )
    else:
        print("device memory cleanup completed")


def check_memory_availability(required_gb: float = 2.0) -> Tuple[bool, str]:
    """(ok, message) — does the first device have ``required_gb`` free?"""
    try:
        info = get_device_memory_info()
        if info is None:
            return True, "Cannot check memory, proceeding anyway"
        if info["free_gb"] < required_gb:
            return False, (
                f"Insufficient device memory: {info['free_gb']:.2f}GB "
                f"available, {required_gb:.2f}GB required. "
                f"Total: {info['total_gb']:.2f}GB, "
                f"Used: {info['allocated_gb']:.2f}GB "
                f"({info['utilization']:.1f}%)"
            )
        return True, (
            f"Memory check passed: {info['free_gb']:.2f}GB available, "
            f"{required_gb:.2f}GB required"
        )
    except Exception as e:  # pragma: no cover - defensive like the reference
        return True, f"Memory check failed: {e}, proceeding anyway"


def estimate_memory_requirement(num_images: int, process_res: int) -> float:
    """Heuristic GB estimate for an inference request (reference policy:
    base 2 GB + per-image quadratic-in-resolution term)."""
    base_memory = 2.0
    per_image_memory = (process_res / 504) ** 2 * 0.5
    return base_memory + num_images * per_image_memory * 0.1
