"""Tracing / profiling: Chrome-trace scopes + stage timers.

Parity with the reference's Instrumentor (src/Instrumentor.h:37-139, enabled
by -DSAVE_PROFILE and the TIMEIT() macro) and the coarse `Timer` that prints
"Completed in N msec" after each stage (src/usher_graph.hpp:15-31).

  - `Instrumentor.begin_session(path)` / `end_session()` write the same
    chrome://tracing JSON the reference emits ({"otherData": {},
    "traceEvents": [...]} with "ph": "X" duration events in microseconds).
  - `timeit(name)` is the TIMEIT() macro: a context manager recording a
    trace scope (no-op when no session is active).
  - `Timer` mirrors the reference Timer: Start()/Stop() in milliseconds.
  - Sessions can be armed externally with USHER_TPU_PROFILE=<path> — the
    CLIs call `maybe_begin_session_from_env()` at startup.
  - `device_trace(logdir)` wraps jax.profiler for XLA-level traces of the
    device kernels (viewable in TensorBoard/XProf).
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import threading
import time


class Instrumentor:
    _instance = None

    def __init__(self):
        self._f = None
        self._count = 0
        self._lock = threading.Lock()

    @classmethod
    def get(cls) -> "Instrumentor":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    @property
    def active(self) -> bool:
        return self._f is not None

    def begin_session(self, filepath: str = "profile.json") -> None:
        self._f = open(filepath, "w")
        self._f.write('{"otherData": {},"traceEvents":[')
        self._f.flush()
        self._count = 0

    def end_session(self) -> None:
        if self._f is None:
            return
        self._f.write("]}")
        self._f.close()
        self._f = None

    def write_profile(self, name: str, start_us: int, end_us: int) -> None:
        if self._f is None:
            return
        with self._lock:
            if self._count > 0:
                self._f.write(",")
            self._count += 1
            self._f.write(json.dumps({
                "cat": "function",
                "dur": end_us - start_us,
                "name": name.replace('"', "'"),
                "ph": "X",
                "pid": 0,
                "tid": threading.get_ident() & 0xFFFFFFFF,
                "ts": start_us,
            }))
            self._f.flush()


@contextlib.contextmanager
def timeit(name: str):
    """The TIMEIT() macro: records a duration event when a session is
    active; near-zero cost otherwise."""
    inst = Instrumentor.get()
    if not inst.active:
        yield
        return
    start = time.time_ns() // 1000
    try:
        yield
    finally:
        inst.write_profile(name, start, time.time_ns() // 1000)


class Timer:
    """Reference src/usher_graph.hpp:15-31: Start(); ...; Stop() -> msec."""

    def __init__(self):
        self._t0 = time.time()

    def start(self) -> None:
        self._t0 = time.time()

    def stop(self) -> int:
        return int((time.time() - self._t0) * 1000)

    def report(self, stream=None) -> int:
        """Print the reference's stage line: 'Completed in N msec'."""
        ms = self.stop()
        print(f"Completed in {ms} msec \n", file=stream or sys.stderr)
        return ms


def apply_platform_env() -> None:
    """Process-level JAX setup for CLI entry points.

    - Honor USHER_TPU_PLATFORM=cpu|tpu: the environment's sitecustomize
      imports jax before env vars apply, so JAX_PLATFORMS set by a wrapper
      is read too late — route it through jax.config instead (see
      tests/conftest.py).
    - Enable the persistent compilation cache (enable_compile_cache): a
      serving CLI recompiles ~10 XLA programs per fresh process otherwise
      (measured ~67 s of a 105 s `usher --pb-direct` run on a tunneled
      chip before any sample is placed)."""
    plat = os.environ.get("USHER_TPU_PLATFORM", "")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    enable_compile_cache()


def enable_compile_cache(cache_dir: str | None = None) -> bool:
    """Point JAX at a persistent on-disk compilation cache so repeat CLI
    invocations skip XLA compilation entirely.  Default location is
    ~/.cache/usher_tpu/jax_cache; override with USHER_TPU_COMPILE_CACHE
    (set to an empty string to disable).  Returns True when enabled."""
    if cache_dir is None:
        cache_dir = os.environ.get(
            "USHER_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "usher_tpu",
                         "jax_cache"))
    if not cache_dir:
        return False
    try:
        import jax
        if jax.config.jax_compilation_cache_dir:
            return True   # caller (e.g. bench.py) already configured one
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:  # the cache is an optimization, never a requirement
        return False


def maybe_begin_session_from_env() -> bool:
    """Arm chrome-trace profiling when USHER_TPU_PROFILE=<path> is set;
    registers end_session at exit."""
    path = os.environ.get("USHER_TPU_PROFILE", "")
    if not path:
        return False
    inst = Instrumentor.get()
    if not inst.active:
        inst.begin_session(path)
        import atexit
        atexit.register(inst.end_session)
    return True


@contextlib.contextmanager
def device_trace(logdir: str):
    """XLA-level device profiling via jax.profiler (TensorBoard format)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
