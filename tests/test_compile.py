"""tuned_jit (exsr/utils/compile.py) — TPU compiler-options jit wrapper.

Regression: on a TPU backend ``tuned_jit`` attaches ``compiler_options``,
which JAX only accepts on a TOP-LEVEL jit.  A tuned_jit callable traced
inside another jit (the session's crop forward closed over by the
Z-optimizer's compiled scan — session.py:368 -> optimizer.py:75) raised
``ValueError: compiler_options can only be passed to top-level jax.jit``
for every non-cacheable objective on the real TPU; CPU tests never saw it
because the options are TPU-only.  Found by driving the web surface on
the axon backend.
"""
import jax
import jax.numpy as jnp
import numpy as np

from exsr.utils import compile as compile_mod


def test_tuned_jit_nested_inside_jit(monkeypatch):
    # simulate the TPU branch: options attached (the CPU backend would
    # reject the TPU flag at compile time, so only the nested path —
    # which must NOT compile with the options — is exercised here)
    monkeypatch.setattr(compile_mod, '_on_tpu', lambda: True)
    calls = []

    def f(x):
        calls.append(1)
        return 2.0 * x

    tj = compile_mod.tuned_jit(f)

    @jax.jit
    def outer(x):
        return tj(x) + 1.0

    out = outer(jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(out), 3.0)
    # the raw function was inlined into the outer trace
    assert calls


def test_tuned_jit_exposes_lower(monkeypatch):
    # srragan.py:174-177 calls .lower() on the tuned_jit result
    monkeypatch.setattr(compile_mod, '_on_tpu', lambda: True)
    tj = compile_mod.tuned_jit(lambda x: x + 1)
    assert callable(tj.lower)
    assert callable(tj.clear_cache)


def test_session_objective_with_compiler_options(monkeypatch):
    """Full-stack regression for the on-TPU crash: with compiler options
    active (CPU-valid stand-in flag), a non-cacheable session objective
    must run — its tuned_jit crop forward is traced inside the
    Z-optimizer's own tuned_jit scan."""
    monkeypatch.setattr(compile_mod, '_on_tpu', lambda: True)
    monkeypatch.setattr(compile_mod, 'TPU_COMPILER_OPTIONS',
                        {'xla_cpu_enable_fast_math': False})
    from exsr.apps.session import EditSession
    s = EditSession(scale=4, nb=1, time_budget_s=5.0)
    s.init_random_params(0)
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    s.open_image(img, is_hr=True)
    m = np.zeros(s.region_mask_hr.shape, np.float32)
    m[16:48, 16:48] = 1.0
    s.set_region(m)
    r = s.optimize('STD_increase', max_iters=2)
    assert np.isfinite(r['final_loss'])


def test_tuned_jit_plain_on_cpu():
    # CPU branch: a plain jax.jit, usable top-level and nested
    tj = compile_mod.tuned_jit(lambda x: x * 3)
    np.testing.assert_allclose(np.asarray(tj(jnp.float32(2))), 6.0)

    @jax.jit
    def outer(x):
        return tj(x)

    np.testing.assert_allclose(np.asarray(outer(jnp.float32(2))), 6.0)
