"""Device housekeeping: memory stats, live-buffer cleanup, profiling.

TPU-native equivalents of the reference's CUDA housekeeping
(``get_less_used_gpu``/``free_memory``, functions.py:151-212) plus the
structured tracing the reference lacks (SURVEY.md §5 "print-based only"):
``trace`` wraps a block in a jax.profiler trace annotation and a wall-clock
measurement, and ``profile_to`` captures a full profiler trace directory.
"""

from __future__ import annotations

import contextlib
import gc
import time
from typing import Dict, List, Optional

import jax


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, int]:
    """Allocation stats for one device (bytes). Empty dict if the backend
    doesn't expose them (CPU)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


def get_less_used_device(devices: Optional[List[jax.Device]] = None,
                         debug: bool = False) -> int:
    """Index of the device with the least allocated memory
    (reference get_less_used_gpu semantics on the jax device list)."""
    devs = devices or jax.devices()
    usage = {}
    for i, d in enumerate(devs):
        stats = device_memory_stats(d)
        usage[i] = stats.get("bytes_in_use", 0)
    best = min(usage, key=usage.get)
    if debug:
        print("Current allocated memory:", {f"{devs[k].platform}:{k}": v
                                            for k, v in usage.items()})
        print("Suggested device:", best)
    return best


def free_memory(to_delete: List[object], debug: bool = False) -> None:
    """Drop references and force deallocation of their device buffers.

    Unlike the reference's frame-locals hack (functions.py:195-212), callers
    pass the arrays themselves; buffers are deleted eagerly so HBM frees
    without waiting for GC.
    """
    if debug:
        print("Before:", device_memory_stats().get("bytes_in_use"))
    for arr in to_delete:
        if isinstance(arr, jax.Array):
            try:
                arr.delete()
            except RuntimeError:
                pass
    del to_delete
    gc.collect()
    if debug:
        print("After:", device_memory_stats().get("bytes_in_use"))


def live_arrays_bytes() -> int:
    """Total bytes of live jax arrays on all devices."""
    return sum(a.nbytes for a in jax.live_arrays())


@contextlib.contextmanager
def trace(name: str, verbose: bool = True):
    """Wall-clock + profiler annotation around a block."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    if verbose:
        print(f"[trace] {name}: {dt*1e3:.2f} ms")


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a jax profiler trace for offline analysis (tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
