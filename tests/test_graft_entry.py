"""Driver entry-point contracts: entry() traces, dryrun runs (8-dev CPU)."""

import jax


def test_entry_traces_and_lowers():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    # trace + lower without executing (the driver compile-checks on real TPU)
    lowered = jax.jit(fn).lower(*args)
    assert "fusion" in lowered.as_text().lower() or lowered is not None


def test_entry_shapes():
    import __graft_entry__

    fn, (params, ids, mask) = __graft_entry__.entry()
    assert ids.shape == mask.shape
    out = jax.eval_shape(fn, params, ids, mask)
    assert out.shape == (ids.shape[0], 2)
