"""Concurrent compile-ahead utility (utils/compile_ahead.py).

On the CPU test backend the utility is OFF by default (background
compiles would contend with the foreground for the same cores);
BELLA_COMPILE_AHEAD=1 force-enables it so the dedup/join handshake is
covered here without TPU hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bella_tpu.utils import compile_ahead as ca


@jax.jit
def _toy(a, b):
    return jnp.cumsum(a) + b


def test_disabled_on_cpu_by_default(monkeypatch):
    monkeypatch.delenv("BELLA_COMPILE_AHEAD", raising=False)
    join = ca.compile_ahead(_toy, jnp.zeros(7, jnp.int32),
                            jnp.zeros(7, jnp.int32))
    assert join() is None
    assert ca.spec_key(_toy, (jnp.zeros(7, jnp.int32),), {}) not in ca._PENDING


def test_compile_join_and_dedup(monkeypatch):
    monkeypatch.setenv("BELLA_COMPILE_AHEAD", "1")
    a = jnp.arange(33, dtype=jnp.int32)
    b = jnp.ones(33, jnp.int32)
    j1 = ca.compile_ahead(_toy, a, b)
    # duplicate submission returns the SAME thread's join
    j2 = ca.compile_ahead(_toy, a, b)
    j1()
    j2()
    key = ca.spec_key(_toy, (a, b), {})
    assert key in ca._PENDING and not ca._PENDING[key].is_alive()
    # the real call after the compile-ahead is correct
    out = np.asarray(_toy(a, b))
    np.testing.assert_array_equal(out, np.cumsum(np.arange(33)) + 1)
    # join_ahead with matching real args joins without error
    ca.join_ahead(_toy, a, b)


def test_specs_accept_sds_none_and_pytrees(monkeypatch):
    monkeypatch.setenv("BELLA_COMPILE_AHEAD", "1")

    @jax.jit
    def f(x, opt, cols):
        s = x.sum() + cols[0].sum() + cols[1].sum()
        return s if opt is None else s + opt.sum()

    sds = jax.ShapeDtypeStruct((5,), jnp.float32)
    join = ca.compile_ahead(f, sds, None, (sds, sds))
    join()
    x = jnp.ones(5, jnp.float32)
    ca.join_ahead(f, x, None, (x, x))
    assert float(f(x, None, (x, x))) == 15.0


def test_static_kwargs_in_key(monkeypatch):
    monkeypatch.setenv("BELLA_COMPILE_AHEAD", "1")

    @jax.jit
    def g(x, *, n: int = 1):
        return x * n

    a = jnp.ones(3, jnp.int32)
    k1 = ca.spec_key(g, (a,), {"n": 1})
    k2 = ca.spec_key(g, (a,), {"n": 2})
    assert k1 != k2


def test_failure_is_swallowed(monkeypatch):
    monkeypatch.setenv("BELLA_COMPILE_AHEAD", "1")

    class NotAFn:
        pass

    join = ca.compile_ahead(NotAFn(), jnp.zeros(3, jnp.int32))
    join()  # the thread swallowed the lowering failure


def test_ahead_call_matches_jit(monkeypatch, tmp_path):
    monkeypatch.setenv("BELLA_COMPILE_AHEAD", "1")
    monkeypatch.setenv("BELLA_XC_DIR", str(tmp_path))

    @jax.jit
    def h(x, y, *, k: int = 3):
        return jnp.cumsum(x) * k + y

    x = jnp.arange(17, dtype=jnp.int32)
    y = jnp.ones(17, jnp.int32)
    want = np.asarray(h(x, y, k=5))
    got = np.asarray(ca.ahead_call(h, x, y, k=5))
    np.testing.assert_array_equal(got, want)
    # the executable landed in the disk cache
    assert any(p.suffix == ".xc" for p in tmp_path.iterdir())
    # a cold in-process map (fresh key space) loads it back from disk
    key = ca.spec_key(h, (x, y), {"k": 5})
    ca._EXES.pop(key, None)
    got2 = np.asarray(ca.ahead_call(h, x, y, k=5))
    np.testing.assert_array_equal(got2, want)


def test_ahead_call_plain_when_disabled(monkeypatch):
    monkeypatch.setenv("BELLA_COMPILE_AHEAD", "0")

    @jax.jit
    def h2(x):
        return x + 1

    out = np.asarray(ca.ahead_call(h2, jnp.zeros(4, jnp.int32)))
    np.testing.assert_array_equal(out, np.ones(4))
    assert ca.spec_key(h2, (jnp.zeros(4, jnp.int32),), {}) not in ca._EXES


def test_ahead_call_fallback_on_bad_fn(monkeypatch):
    monkeypatch.setenv("BELLA_COMPILE_AHEAD", "1")

    def plain(x):  # not jitted: .lower missing -> falls back to call
        return x * 2

    out = np.asarray(ca.ahead_call(plain, jnp.arange(3)))
    np.testing.assert_array_equal(out, [0, 2, 4])


def test_module_salt_closure_is_per_stage():
    """The spec->HLO shortcut salt must be scoped to each stage's
    reachable code: the detect module's closure excludes the aligner
    (an aligner edit must not re-trace the detect ladder), while the
    aligner's closure includes the pairs module it imports; lazy
    function-body imports (segments inside kmers/count.py) are caught
    by the source scan."""
    import bella_tpu.align.xdrop  # noqa: F401  (populate sys.modules)
    import bella_tpu.overlap.pairs  # noqa: F401

    seen = set()
    ca._module_closure("bella_tpu.overlap.pairs", seen)
    assert "bella_tpu.utils.segments" in seen
    assert "bella_tpu.seq.encode" in seen
    assert not any(m.startswith("bella_tpu.align") for m in seen), seen

    seen_a = set()
    ca._module_closure("bella_tpu.align.xdrop", seen_a)
    assert "bella_tpu.align.pallas_xdrop" in seen_a
    # the aligner takes CandidatePairs duck-typed: no pairs dependency,
    # so detect edits don't re-trace align kernels either
    assert not any(m.startswith("bella_tpu.overlap") for m in seen_a), seen_a

    seen_c = set()
    ca._module_closure("bella_tpu.kmers.count", seen_c)
    assert "bella_tpu.utils.segments" in seen_c

    # distinct salts for distinct closures; stable within a process
    import bella_tpu.overlap.pairs as pp
    import bella_tpu.align.xdrop as xd

    s1 = ca._module_salt(pp.detect_overlaps)
    s2 = ca._module_salt(xd._seed_extend_batch)
    assert s1 != s2
    assert ca._module_salt(pp.detect_overlaps) == s1
