"""Pallas fused encode kernel vs the XLA packer oracle (TPU only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deltarice_tpu.codec import _encode_segments_xla, encode_segments
from deltarice_tpu.config import RiceConfig
from deltarice_tpu.ops.pack_pallas import pack_encode_pallas

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a TPU for the Mosaic kernel"
)


def _compare(x, nvalid, cfg):
    mw = cfg.max_words(x.shape[1])
    xj = jnp.asarray(x)
    nv = jnp.asarray(nvalid)
    w_p, n_p = encode_segments(xj, nv, cfg, mw, "pallas")
    w_x, n_x, _ = _encode_segments_xla(xj, nv, cfg, mw, "segsum")
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))
    np.testing.assert_array_equal(np.asarray(w_p), np.asarray(w_x))


@tpu_only
@pytest.mark.parametrize("k", [0, 1, 3, 7, 13, 15])
def test_kernel_matches_xla_all_k(k):
    rng = np.random.default_rng(k)
    x = np.round(np.cumsum(rng.normal(0, 10, (9, 300)), axis=-1)).astype(
        np.int16
    )
    nv = np.full(9, 300, np.int32)
    _compare(x, nv, RiceConfig(1 << k, 300))


@tpu_only
def test_kernel_escape_heavy():
    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32768, (5, 700)).astype(np.int16)
    nv = np.full(5, 700, np.int32)
    _compare(x, nv, RiceConfig(8, 700))


@tpu_only
def test_kernel_short_segments():
    rng = np.random.default_rng(2)
    x = np.round(np.cumsum(rng.normal(0, 8, (6, 520)), axis=-1)).astype(
        np.int16
    )
    nv = np.array([520, 1, 100, 0, 519, 512], np.int32)
    _compare(x, nv, RiceConfig(8, 520))


@tpu_only
def test_kernel_multi_block():
    rng = np.random.default_rng(3)
    x = np.round(np.cumsum(rng.normal(0, 10, (1500, 96)), axis=-1)).astype(
        np.int16
    )
    nv = np.full(1500, 96, np.int32)
    _compare(x, nv, RiceConfig(8, 96))


@tpu_only
def test_kernel_generic_filter():
    rng = np.random.default_rng(4)
    x = np.round(np.cumsum(rng.normal(0, 10, (4, 200)), axis=-1)).astype(
        np.int16
    )
    nv = np.full(4, 200, np.int32)
    _compare(x, nv, RiceConfig(8, 200, (1, -2, 1)))


@tpu_only
def test_roundtrip_through_both_kernels():
    """pallas encode -> pallas decode reproduces the input exactly."""
    import deltarice_tpu as drt

    rng = np.random.default_rng(5)
    x = np.round(np.cumsum(rng.normal(0, 10, (700,)), axis=-1)).astype(
        np.int16
    )
    cfg = drt.RiceConfig(8, 100)
    blob = drt.compress(x, cfg, method="pallas")
    out = drt.decompress(blob, cfg, backend="pallas")
    np.testing.assert_array_equal(out, x)
    # and the bytes are identical to the XLA path's bytes
    assert blob == drt.compress(x, cfg, method="segsum")
