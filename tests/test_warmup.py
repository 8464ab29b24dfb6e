"""Cold-start warmup: one call compiles the production programs."""

import numpy as np

import deltarice_tpu as drt


def test_warmup_runs_and_roundtrips():
    dt = drt.warmup(nseg=4, cfg=drt.RiceConfig(8, 256))
    assert dt > 0
    # the same geometry is now warm; a fresh call must still be correct
    rng = np.random.default_rng(0)
    x = np.round(np.cumsum(rng.normal(0, 9, (4, 256)), axis=-1)).astype(
        np.int16
    )
    cfg = drt.RiceConfig(8, 256)
    np.testing.assert_array_equal(
        drt.decompress(drt.compress(x, cfg), cfg).reshape(4, 256), x
    )
