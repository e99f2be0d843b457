"""ERB filterbank parity vs the reference construction and checkpoint weights."""

import numpy as np
import pytest

import jax.numpy as jnp

from gtcrn_micro_tpu.dsp import erb_filter_banks, ErbBands

CKPT = "/root/reference/gtcrn_micro/ckpts/best_model_dns3.tar"


def test_erb_filters_shape_and_partition():
    f = erb_filter_banks(65, 64)
    assert f.shape == (64, 192)
    assert f.dtype == np.float32
    # triangular bands roughly partition unity over covered bins
    cov = f.sum(axis=0)
    assert cov.max() <= 1.5
    assert (cov[:-1] > 0.5).all()


def test_erb_matches_checkpoint_weights():
    torch = pytest.importorskip("torch")
    import os

    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoint unavailable")
    sd = torch.load(CKPT, map_location="cpu", weights_only=False)["model"]
    ref_bm = sd["erb.erb_fc.weight"].numpy()  # (64, 192)
    ref_bs = sd["erb.ierb_fc.weight"].numpy()  # (192, 64)
    ours = erb_filter_banks(65, 64)
    np.testing.assert_array_equal(ours, ref_bm)
    np.testing.assert_array_equal(ours.T, ref_bs)


def test_bm_bs_roundtrip_shapes():
    erb = ErbBands()
    p = erb.init_params()
    x = jnp.ones((2, 3, 10, 257))
    merged = erb.bm(p, x)
    assert merged.shape == (2, 3, 10, 129)
    split = erb.bs(p, merged)
    assert split.shape == (2, 3, 10, 257)
    # low bins pass through verbatim
    np.testing.assert_array_equal(np.asarray(merged[..., :65]), np.asarray(x[..., :65]))
