"""Core-layer golden tests vs torch oracles (reference
tests/streaming/conversion/test_convolution.py pattern): each primitive must
match torch's semantics AND its own streaming mode must equal offline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.nn.core import BatchNorm, CausalConv2d, Ctx, TRALite

torch = pytest.importorskip("torch")


def _stream(layer, params, x, mode):
    """Frame-by-frame streaming through a single layer.

    mode: False = shift caches, True = ring buffers, "psum" = ring buffers
    with the L==2 direct-form-II-transposed partial-output state."""
    ring = bool(mode)
    psum = mode == "psum"
    ctx0 = Ctx(state={}, initializing=True, ring=ring, l2_psum=psum)
    layer(ctx0, params, x[:, :1])
    state = {k: jnp.zeros(v.shape, v.dtype) for k, v in ctx0.new_state.items()}
    step = jnp.zeros((), jnp.int32)
    outs = []
    for t in range(x.shape[1]):
        ctx = Ctx(state=state, ring=ring, step=step if ring else None,
                  l2_psum=psum)
        outs.append(layer(ctx, params, x[:, t : t + 1]))
        state = ctx.new_state
        step = (step + 1) & 15
    return jnp.concatenate(outs, axis=1)


def test_causal_conv_matches_torch():
    """Causal (3,3) depthwise-ish conv == torch Conv2d with causal pad."""
    rng = np.random.default_rng(0)
    conv = CausalConv2d(4, 8, (3, 3), freq_pad=1, groups=2)
    params = conv.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((2, 10, 6, 4)).astype(np.float32)  # B,T,F,C

    ctx = Ctx()
    out = np.asarray(conv(ctx, params, jnp.asarray(x)))

    tconv = torch.nn.Conv2d(4, 8, (3, 3), padding=(0, 1), groups=2)
    with torch.no_grad():
        # HWIO (kT,kF,Ci/g,Co) -> OIHW (Co,Ci/g,kT,kF)
        tconv.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(params["w"]), (3, 2, 0, 1))))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["b"])))
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NCHW (T=H)
        xt = torch.nn.functional.pad(xt, (0, 0, 2, 0))  # causal time pad
        ref = tconv(xt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_deconv_matches_torch_conv_transpose():
    """freq_up=2 canonical flipped-kernel conv == torch ConvTranspose2d."""
    rng = np.random.default_rng(1)
    conv = CausalConv2d(4, 6, (1, 5), freq_pad=2, freq_up=2)
    params = conv.init(jax.random.PRNGKey(1))
    x = rng.standard_normal((1, 4, 9, 4)).astype(np.float32)

    out = np.asarray(conv(Ctx(), params, jnp.asarray(x)))

    tdeconv = torch.nn.ConvTranspose2d(4, 6, (1, 5), stride=(1, 2),
                                       padding=(0, 2))
    with torch.no_grad():
        # canonical HWIO-flipped -> torch (Ci, Co, kT, kF) unflipped
        w = np.asarray(params["w"])[::-1, ::-1]  # unflip
        tdeconv.weight.copy_(torch.from_numpy(
            np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))))
        tdeconv.bias.copy_(torch.from_numpy(np.asarray(params["b"])))
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ref = tdeconv(xt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_batchnorm_matches_torch():
    rng = np.random.default_rng(2)
    bn = BatchNorm(8)
    params = bn.init(jax.random.PRNGKey(2))
    params = dict(params,
                  running_mean=jnp.asarray(rng.standard_normal(8), jnp.float32),
                  running_var=jnp.asarray(rng.uniform(0.5, 2, 8), jnp.float32),
                  gamma=jnp.asarray(rng.standard_normal(8), jnp.float32),
                  beta=jnp.asarray(rng.standard_normal(8), jnp.float32))
    x = rng.standard_normal((2, 5, 7, 8)).astype(np.float32)

    out = np.asarray(bn(Ctx(), params, jnp.asarray(x)))

    tbn = torch.nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(np.asarray(params["gamma"])))
        tbn.bias.copy_(torch.from_numpy(np.asarray(params["beta"])))
        tbn.running_mean.copy_(torch.from_numpy(np.asarray(params["running_mean"])))
        tbn.running_var.copy_(torch.from_numpy(np.asarray(params["running_var"])))
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ref = tbn(xt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("ring", [False, True, "psum"])
@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_conv_streaming_equals_offline(ring, dilation):
    """The golden streaming property per primitive (reference
    test_convolution.py:13-85), for both cache mechanisms."""
    rng = np.random.default_rng(3)
    conv = CausalConv2d(4, 4, (3, 1), dilation=(dilation, 1), groups=4)
    params = conv.init(jax.random.PRNGKey(3))
    x = jnp.asarray(rng.standard_normal((1, 18, 5, 4)).astype(np.float32))

    offline = conv(Ctx(), params, x)
    streamed = _stream(conv, params, x, ring)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(offline),
                               atol=1e-6)


@pytest.mark.parametrize("ring", [False, True, "psum"])
def test_tra_streaming_equals_offline(ring):
    rng = np.random.default_rng(4)
    tra = TRALite(4)
    params = tra.init(jax.random.PRNGKey(4))
    x = jnp.asarray(rng.standard_normal((2, 12, 5, 4)).astype(np.float32))

    offline = tra(Ctx(), params, x)
    streamed = _stream(tra, params, x, ring)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(offline),
                               atol=1e-6)
