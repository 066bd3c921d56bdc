"""Concurrent compile-ahead + persistent executable cache for cold
pipeline starts.

Two measured properties of this environment's TPU toolchain shape the
design (see BASELINE.md round-3 notes):

* the remote compile helper accepts CONCURRENT compiles with
  near-perfect parallelism (4 fresh ~40 s sort programs: 171 s
  sequential vs 55 s threaded), and
* ``jax.experimental.serialize_executable`` round-trips compiled
  executables on this backend (21 s compile -> 6 MB blob ->
  0.01 s deserialize), while JAX's own persistent compilation cache is
  bypassed by the remote-compile path.

So stage invocations route through ``ahead_call``: the executable comes
from (1) the in-process map, (2) the on-disk cache keyed by a hash of
the lowered StableHLO (exact — any code or shape change changes the
key), or (3) a fresh compile, serialized back to disk. ``compile_ahead``
fires (2)/(3) on daemon threads as soon as a stage's input shapes are
derivable — shapes chain through ``jax.eval_shape`` from the real
leading-stage inputs, so drift can only waste a compile, never change
a result. ``join_ahead`` (or ``ahead_call`` itself) joins right before
the foreground needs the program, so a half-finished background
compile never races a foreground compile of the same signature.

No reference analogue: the AOT C++ binary (makefile-nersc:54-58) never
pays a JIT cold start; this is the TPU-native counterweight to it.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Callable, Dict, Optional, Tuple

__all__ = ["ahead_call", "compile_ahead", "join_ahead", "spec_key"]

_PENDING: Dict[Tuple, threading.Thread] = {}
_EXES: Dict[Tuple, Any] = {}
_LOCK = threading.Lock()


def _xc_dir() -> str:
    return os.environ.get("BELLA_XC_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "bella_tpu", "xc"
    )


def _enabled() -> bool:
    """On by default only where it pays: the TPU backend's remote
    compile helper parallelizes and forgets, while on the CPU backend
    (tests, the 8-device virtual mesh) compiles are fast and background
    threads just contend with the foreground for the same cores.
    BELLA_COMPILE_AHEAD=0/1 overrides."""
    v = os.environ.get("BELLA_COMPILE_AHEAD")
    if v is not None:
        return v not in ("0", "false", "no")
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def spec_key(fn, args, statics) -> Tuple:
    """In-process cache key: function identity + leaf (shape, dtype)
    signature + static kwargs. None leaves (optional operands) keyed as
    'None'. (The DISK key is the lowered-HLO hash — exact; this key
    only routes within one process, where fn identity is stable.)"""
    import jax

    leaves = jax.tree_util.tree_leaves(args, is_leaf=lambda x: x is None)
    sig = tuple(
        "None" if x is None else (tuple(x.shape), str(x.dtype))
        for x in leaves
    )
    return (id(fn), sig, tuple(sorted(statics.items())))


def _to_specs(args):
    import jax

    return jax.tree_util.tree_map(
        lambda x: None if x is None
        else jax.ShapeDtypeStruct(x.shape, x.dtype),
        args,
        is_leaf=lambda x: x is None,
    )


def _hlo_key(lowered) -> str:
    import hashlib

    import jax

    dev = jax.devices()[0]
    salt = f"{jax.__version__}|{dev.platform}|{dev.device_kind}|"
    return hashlib.sha256(
        (salt + lowered.as_text()).encode()
    ).hexdigest()[:40]


_CODE_SALT: Optional[str] = None


def _code_salt() -> str:
    """Hash of the package's source state (path, mtime, size of every
    .py under bella_tpu/). Keys the spec->HLO shortcut map: any source
    change invalidates the shortcuts (one re-trace per signature
    re-records them), while the HLO-keyed blobs themselves survive for
    unchanged programs."""
    global _CODE_SALT
    if _CODE_SALT is None:
        import hashlib

        import bella_tpu

        root = os.path.dirname(os.path.abspath(bella_tpu.__file__))
        h = hashlib.sha256()
        for dirpath, _dirs, files in sorted(os.walk(root)):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    st = os.stat(p)
                    h.update(
                        f"{os.path.relpath(p, root)}|{st.st_mtime_ns}|"
                        f"{st.st_size}\n".encode()
                    )
        _CODE_SALT = h.hexdigest()[:16]
    return _CODE_SALT


_MOD_SALTS: Dict[str, str] = {}
_MOD_FILES: Dict[str, Optional[str]] = {}


def _module_path(modname: str) -> Optional[str]:
    if modname in _MOD_FILES:
        return _MOD_FILES[modname]
    path: Optional[str] = None
    try:
        import sys

        m = sys.modules.get(modname)
        if m is not None:
            path = getattr(m, "__file__", None)
        else:
            import importlib.util

            spec = importlib.util.find_spec(modname)
            path = spec.origin if spec else None
    except Exception:
        path = None
    if path is not None and not path.endswith(".py"):
        path = None
    _MOD_FILES[modname] = path
    return path


def _module_closure(modname: str, seen: set) -> None:
    """Transitive intra-package dependency closure of a module,
    discovered by scanning its SOURCE for bella_tpu.* references —
    both dotted uses and `from bella_tpu.x import y` forms (so lazy
    function-body imports are caught too; every import in this package
    is package-absolute)."""
    if modname in seen or not modname.startswith("bella_tpu"):
        return
    seen.add(modname)
    path = _module_path(modname)
    if not path:
        return
    try:
        with open(path) as f:
            src = f.read()
    except OSError:
        return
    import re

    cands = set(re.findall(r"bella_tpu(?:\.\w+)+", src))
    for base, names in re.findall(
        r"from\s+(bella_tpu(?:\.\w+)*)\s+import\s+([^\n(]+|\([^)]*\))", src
    ):
        cands.add(base)
        for nm in re.split(r"[,\s()]+", names):
            if nm and nm.isidentifier() and nm != "as":
                cands.add(f"{base}.{nm}")
    for c in cands:
        # a dotted ref may name a module or an attribute; walk prefixes
        parts = c.split(".")
        for end in range(len(parts), 1, -1):
            sub = ".".join(parts[:end])
            if sub in seen:
                break
            if _module_path(sub):
                _module_closure(sub, seen)
                break


def _module_salt(fn) -> str:
    """Per-stage source salt: hash over the defining module's file plus
    its intra-package import closure (path, mtime, size). An edit to
    align/xdrop.py no longer invalidates the detect ladder's spec->HLO
    shortcuts — each stage re-traces only when code it can actually
    reach changed (VERDICT r4: the global salt made every edit re-pay
    the full warm-up's trace+lower tax)."""
    mod = getattr(fn, "__module__", None) or ""
    if not mod.startswith("bella_tpu"):
        return _code_salt()
    s = _MOD_SALTS.get(mod)
    if s is None:
        import hashlib

        seen: set = set()
        _module_closure(mod, seen)
        files = sorted(p for m in seen if (p := _MOD_FILES.get(m)))
        if not files:
            return _code_salt()
        h = hashlib.sha256()
        for p in files:
            try:
                st = os.stat(p)
            except OSError:
                continue
            h.update(f"{p}|{st.st_mtime_ns}|{st.st_size}\n".encode())
        s = h.hexdigest()[:16]
        _MOD_SALTS[mod] = s
    return s


def _stable_key(fn, args, statics) -> Optional[str]:
    """Cross-process signature key: per-module source salt + toolchain
    + module-qualified function name + leaf (shape, dtype) signature +
    statics. Only valid for top-level jitted functions (no closure
    state) — which every pipeline stage is."""
    import hashlib

    import jax

    name = f"{getattr(fn, '__module__', '?')}.{getattr(fn, '__qualname__', None)}"
    if name.endswith(".None"):
        return None
    leaves = jax.tree_util.tree_leaves(args, is_leaf=lambda x: x is None)
    sig = tuple(
        "None" if x is None else (tuple(x.shape), str(x.dtype))
        for x in leaves
    )
    body = repr((
        jax.__version__, jax.default_backend(), name, sig,
        tuple(sorted(statics.items())),
    ))
    return hashlib.sha256(
        (_module_salt(fn) + body).encode()
    ).hexdigest()[:40]


def _map_path(skey: str) -> str:
    return os.path.join(_xc_dir(), "map", skey + ".k")


def _map_lookup(skey: Optional[str]) -> Optional[str]:
    if skey is None:
        return None
    try:
        with open(_map_path(skey)) as f:
            return f.read().strip() or None
    except OSError:
        return None


def _map_record(skey: Optional[str], hkey: str) -> None:
    if skey is None:
        return
    try:
        os.makedirs(os.path.join(_xc_dir(), "map"), exist_ok=True)
        tmp = _map_path(skey) + f".tmp{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "w") as f:
            f.write(hkey)
        os.replace(tmp, _map_path(skey))
    except OSError:
        pass


def _blob_load(hkey: str):
    import pickle

    from jax.experimental import serialize_executable as se

    with open(os.path.join(_xc_dir(), hkey + ".xc"), "rb") as f:
        blob, in_tree, out_tree = pickle.load(f)
    return se.deserialize_and_load(blob, in_tree, out_tree)


def _obtain_exe(fn, specs, statics, dbg: Optional[str] = None,
                skey: Optional[str] = None):
    """Resolve a stage executable: (1) the spec->HLO shortcut map skips
    even the trace for signatures this code version has seen before;
    (2) trace+lower (local, cheap) and hit the HLO-keyed disk cache;
    (3) compile on the helper and serialize back. Returns a callable
    executable taking the lowered positional args."""
    import pickle
    import time

    hk = _map_lookup(skey)
    if hk is not None:
        try:
            exe = _blob_load(hk)
            if dbg:
                print(f"[compile-ahead] map-hit {dbg}", flush=True)
            return exe
        except Exception:
            pass  # stale shortcut: fall through to the traced path
    lowered = fn.lower(*specs, **statics)
    hkey = _hlo_key(lowered)
    path = os.path.join(_xc_dir(), hkey + ".xc")
    if os.path.exists(path):
        try:
            exe = _blob_load(hkey)
            if dbg:
                print(f"[compile-ahead] disk-hit {dbg}", flush=True)
            _map_record(skey, hkey)
            return exe
        except Exception:
            pass  # stale/corrupt blob: fall through to a fresh compile
    t0 = time.time()
    compiled = lowered.compile()
    if dbg:
        print(f"[compile-ahead] compiled {dbg} {time.time()-t0:.1f}s",
              flush=True)
    try:
        from jax.experimental import serialize_executable as se

        blob, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(_xc_dir(), exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "wb") as f:
            pickle.dump((blob, in_tree, out_tree), f)
        os.replace(tmp, path)
        _map_record(skey, hkey)
    except Exception:
        pass  # serialization is an optimization, never a requirement
    return compiled


def compile_ahead(fn, *args, **statics) -> Callable[[], None]:
    """Obtain ``fn(*args, **statics)``'s executable on a daemon thread
    (disk cache or fresh compile).

    ``args`` may be real arrays, ShapeDtypeStructs, or pytrees of
    either (None allowed for optional operands) — only shapes/dtypes
    are read. Returns a join callable; a duplicate submission returns
    the original thread's join. Failures are swallowed: a compile-ahead
    can only waste a compile, never take the pipeline down."""
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
        specs = _to_specs(args)
        dbg = (getattr(fn, "__name__", repr(fn))
               if os.environ.get("BELLA_COMPILE_AHEAD_DEBUG") else None)

        try:
            skey = _stable_key(fn, args, statics)
        except Exception:
            skey = None

        def _go():
            try:
                exe = _obtain_exe(fn, specs, statics, dbg, skey)
                with _LOCK:
                    _EXES[key] = exe
            except Exception as e:
                if dbg:
                    print(f"[compile-ahead] FAIL {dbg} {e!r}", flush=True)

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
    try:
        key = spec_key(fn, args, statics)
    except Exception:
        return
    with _LOCK:
        t = _PENDING.get(key)
    if t is not None:
        t.join()


def ahead_call(fn, *args, **statics):
    """Invoke a jitted stage through the executable cache.

    Resolution order: join any in-flight compile-ahead for this
    signature, then use its executable; else trace+lower and hit the
    disk cache (or compile and populate it); any failure falls back to
    the plain jit call. Disabled (plain call) on non-TPU backends."""
    if not _enabled():
        return fn(*args, **statics)
    try:
        import jax

        leaves = jax.tree_util.tree_leaves(args)
        if any(isinstance(x, jax.core.Tracer) for x in leaves):
            # inside a trace (e.g. an eval_shape over a caller):
            # executables cannot consume tracers — stay on the jit path
            return fn(*args, **statics)
        key = spec_key(fn, args, statics)
    except Exception:
        return fn(*args, **statics)
    with _LOCK:
        t = _PENDING.get(key)
    if t is not None:
        t.join()
    with _LOCK:
        exe = _EXES.get(key)
    if exe is None:
        try:
            dbg = (getattr(fn, "__name__", repr(fn))
                   if os.environ.get("BELLA_COMPILE_AHEAD_DEBUG") else None)
            try:
                skey = _stable_key(fn, args, statics)
            except Exception:
                skey = None
            exe = _obtain_exe(fn, _to_specs(args), statics, dbg, skey)
            with _LOCK:
                _EXES[key] = exe
        except Exception:
            return fn(*args, **statics)
    try:
        return exe(*args)
    except Exception as e:
        # e.g. a donated buffer was already consumed by a failed call;
        # the jit path recompiles but never returns a wrong result
        if os.environ.get("BELLA_COMPILE_AHEAD_DEBUG"):
            print(f"[compile-ahead] exe-call FAIL "
                  f"{getattr(fn, '__name__', repr(fn))} {e!r}", flush=True)
        return fn(*args, **statics)
