"""Driver entry points stay green: entry() compiles, dryrun runs."""
import jax
import pytest


def test_dryrun_multichip(eight_devices):
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    # lower+compile only (executing the 0.6B forward on CPU is slow)
    jax.jit(fn).lower(*args).compile()
