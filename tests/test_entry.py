"""Driver-contract checks: __graft_entry__ traces/lowers on CPU."""
import sys
sys.path.insert(0, '.')


def test_entry_lowers():
    import jax
    import __graft_entry__ as ge
    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)  # trace + lower, no execution
    assert lowered is not None
