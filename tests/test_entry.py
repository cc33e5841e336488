"""Driver entry points: entry() compiles and runs; dryrun_multichip works."""

import jax
import numpy as np


def test_entry_compiles_small():
    import __graft_entry__ as g

    fn, (params, emb) = g.entry()
    # full flagship shapes are heavy for single-core CPU CI; run on a slice
    out, net_bits, lat_bits = jax.jit(fn)(params, emb[:8])
    assert out.shape == (8, 32, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()
    assert net_bits.shape == (7,)


def test_dryrun_multichip_small():
    import __graft_entry__ as g

    g.dryrun_multichip(2)
