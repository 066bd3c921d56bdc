"""Concurrent XLA compile-ahead for cold pipeline starts.

This environment's remote compile helper accepts CONCURRENT compiles
with near-perfect parallelism (measured on the tunneled v5e: four
distinct ~40 s sort programs compile in 48 s wall when submitted from
four threads, vs 368 s sequentially), and a jitted function's
``.lower(...).compile()`` populates the executable cache that the later
real call hits (the first call after a compile-ahead pays ~1 s of
re-trace instead of the compile). A cold pipeline run should therefore
fire the compile of every stage whose input shapes are already
derivable on a daemon thread, and join right before the foreground
call of the same signature (so a half-finished background compile never
races a foreground compile of the same program).

Stage input shapes are derived with ``jax.eval_shape`` chains from the
real leading-stage inputs — no duplicated shape logic, so drift can
only produce a wasted compile, never a wrong result.

No reference analogue: the AOT C++ binary (makefile-nersc:54-58) never
pays a JIT cold start; this is the TPU-native counterweight to it.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Dict, Tuple

__all__ = ["compile_ahead", "join_ahead", "spec_key"]

_PENDING: Dict[Tuple, threading.Thread] = {}
_LOCK = threading.Lock()


def _enabled() -> bool:
    """On by default only where it pays: the TPU backend's remote
    compile helper parallelizes, while on the CPU backend (tests, the
    8-device virtual mesh) background compiles just contend with the
    foreground for the same cores. BELLA_COMPILE_AHEAD=0/1 overrides."""
    import os

    v = os.environ.get("BELLA_COMPILE_AHEAD")
    if v is not None:
        return v not in ("0", "false", "no")
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def spec_key(fn, args, statics) -> Tuple:
    """Cache key: function identity + leaf (shape, dtype) signature +
    static kwargs. None leaves (optional operands) keyed as 'None'."""
    import jax

    leaves = jax.tree_util.tree_leaves(
        args, is_leaf=lambda x: x is None
    )
    sig = tuple(
        "None" if x is None else (tuple(x.shape), str(x.dtype))
        for x in leaves
    )
    return (id(fn), sig, tuple(sorted(statics.items())))


def compile_ahead(fn, *args, **statics) -> Callable[[], None]:
    """Compile ``fn(*args, **statics)`` on a daemon thread.

    ``args`` may be real arrays, ShapeDtypeStructs, or pytrees of
    either (None allowed for optional operands) — only shapes/dtypes
    are read. Returns a join callable; a duplicate submission returns
    the original thread's join. Failures are swallowed: a compile-ahead
    can only waste a compile, never take the pipeline down."""
    import jax

    if not _enabled():
        return lambda: None
    try:
        key = spec_key(fn, args, statics)
    except Exception:
        return lambda: None
    with _LOCK:
        t = _PENDING.get(key)
        if t is not None:
            return t.join
        specs = jax.tree_util.tree_map(
            lambda x: None if x is None
            else jax.ShapeDtypeStruct(x.shape, x.dtype),
            args,
            is_leaf=lambda x: x is None,
        )

        import os
        import time

        dbg = os.environ.get("BELLA_COMPILE_AHEAD_DEBUG")
        name = getattr(fn, "__name__", repr(fn))

        def _go():
            t0 = time.time()
            if dbg:
                print(f"[compile-ahead] fire {name}", flush=True)
            try:
                fn.lower(*specs, **statics).compile()
                if dbg:
                    print(f"[compile-ahead] done {name} "
                          f"{time.time()-t0:.1f}s", flush=True)
            except Exception as e:
                if dbg:
                    print(f"[compile-ahead] FAIL {name} "
                          f"{time.time()-t0:.1f}s {e!r}", flush=True)

        t = threading.Thread(
            target=_go, daemon=True, name="bella-compile-ahead"
        )
        _PENDING[key] = t
        t.start()
    return t.join


def join_ahead(fn, *args, **statics) -> None:
    """Join a pending compile-ahead matching this exact call signature
    (no-op when none was submitted): call right before the foreground
    invocation so it never races the background compile."""
    import os
    import time

    try:
        key = spec_key(fn, args, statics)
    except Exception:
        return
    with _LOCK:
        t = _PENDING.get(key)
    dbg = os.environ.get("BELLA_COMPILE_AHEAD_DEBUG")
    name = getattr(fn, "__name__", repr(fn))
    if t is not None:
        t0 = time.time()
        t.join()
        if dbg:
            print(f"[compile-ahead] join {name} waited "
                  f"{time.time()-t0:.1f}s", flush=True)
    elif dbg:
        print(f"[compile-ahead] MISS {name} (no pending key)", flush=True)
