"""GTCRN-Micro building blocks -- one definition for offline AND streaming.

Every block is a frozen dataclass of sublayers; the forward takes a
:class:`~gtcrn_micro_tpu.nn.core.Ctx` that decides where temporal left-context
comes from (zeros offline / caches streaming).  Reference geometry citations:

- ConvBlock:     gtcrn_micro/models/gtcrn_micro.py:142-164
- GTConvBlock:   gtcrn_micro/models/gtcrn_micro.py:167-253
- TCN / GTCN:    gtcrn_micro/models/gtcrn_micro.py:256-336
- SFE_Lite:      gtcrn_micro/models/gtcrn_micro.py:77-90
- Encoder:       gtcrn_micro/models/gtcrn_micro.py:339-402
- Decoder:       gtcrn_micro/models/gtcrn_micro.py:405-469
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.nn.core import (
    BatchNorm,
    CausalConv2d,
    Ctx,
    Pointwise,
    PReLU,
    TRALite,
)


def _split_keys(key, n):
    return list(jax.random.split(key, n))


@dataclasses.dataclass(frozen=True)
class SFELite:
    """Depthwise (1,3) freq conv, groups=C, no bias (subband feature extract)."""

    channels: int = 3
    name: str = "sfe"

    def __post_init__(self):
        object.__setattr__(
            self,
            "conv",
            CausalConv2d(
                self.channels,
                self.channels,
                (1, 3),
                freq_pad=1,
                groups=self.channels,
                bias=False,
                name="depth_conv",
            ),
        )

    def init(self, key):
        return {"depth_conv": self.conv.init(key)}

    def __call__(self, ctx: Ctx, params, x):
        with ctx.scope(self.name):
            return self.conv(ctx, params["depth_conv"], x)


@dataclasses.dataclass(frozen=True)
class ConvBlock:
    """conv/deconv + BN + PReLU (Tanh on the final mask layer)."""

    c_in: int
    c_out: int
    kernel: tuple[int, int]
    freq_stride: int = 1
    freq_pad: int = 0
    groups: int = 1
    use_deconv: bool = False
    is_last: bool = False
    name: str = "conv_block"

    def __post_init__(self):
        conv = CausalConv2d(
            self.c_in,
            self.c_out,
            self.kernel,
            freq_stride=1 if self.use_deconv else self.freq_stride,
            freq_pad=self.freq_pad,
            groups=self.groups,
            freq_up=self.freq_stride if self.use_deconv else 1,
            name="conv",
        )
        object.__setattr__(self, "conv", conv)
        object.__setattr__(self, "bn", BatchNorm(self.c_out))

    def init(self, key):
        k1, k2 = _split_keys(key, 2)
        p = {"conv": self.conv.init(k1), "bn": self.bn.init(k2)}
        if not self.is_last:
            p["act"] = PReLU().init(key)
        return p

    def __call__(self, ctx: Ctx, params, x):
        with ctx.scope(self.name):
            h = self.conv(ctx, params["conv"], x)
            h = self.bn(ctx, params["bn"], h)
            if self.is_last:
                return jnp.tanh(h)
            return jnp.maximum(h, 0) + params["act"]["alpha"] * jnp.minimum(h, 0)


@dataclasses.dataclass(frozen=True)
class GTConvBlock:
    """Grouped temporal conv block with TRA gating and channel shuffle.

    Channel-split in halves; the active half runs pointwise C/2->H, causal
    depthwise-ish (3,3) conv (groups=16 enc / groups=1 dec-deconv), pointwise
    H->C/2, TRA gate, then interleaves with the passive half
    (reference :222-253).
    """

    c_in: int
    hidden: int
    kernel: tuple[int, int]
    freq_pad: int
    dilation: tuple[int, int] = (1, 1)
    use_deconv: bool = False
    name: str = "gt_conv_block"

    def __post_init__(self):
        half = self.c_in // 2
        object.__setattr__(self, "point1", Pointwise(half, self.hidden, name="pw1"))
        object.__setattr__(self, "bn1", BatchNorm(self.hidden, name="point_bn1"))
        depth = CausalConv2d(
            self.hidden,
            self.hidden,
            self.kernel,
            freq_pad=self.freq_pad,
            dilation=self.dilation,
            groups=1 if self.use_deconv else 16,
            freq_up=1,
            name="depth_conv",
        )
        object.__setattr__(self, "depth", depth)
        object.__setattr__(self, "bn2", BatchNorm(self.hidden, name="depth_bn"))
        object.__setattr__(self, "point2", Pointwise(self.hidden, half, name="pw2"))
        object.__setattr__(self, "bn3", BatchNorm(half, name="point_bn2"))
        object.__setattr__(self, "tra", TRALite(half))

    def init(self, key):
        ks = _split_keys(key, 8)
        return {
            "point_conv1": self.point1.init(ks[0]),
            "point_bn1": self.bn1.init(ks[1]),
            "point_act": PReLU().init(ks[2]),
            "depth_conv": self.depth.init(ks[3]),
            "depth_bn": self.bn2.init(ks[4]),
            "depth_act": PReLU().init(ks[5]),
            "point_conv2": self.point2.init(ks[6]),
            "point_bn2": self.bn3.init(ks[7]),
            "tra": self.tra.init(key),
        }

    @staticmethod
    def shuffle(x1, x2):
        """Interleave channels: out[..., 2c]=x1[..., c], out[..., 2c+1]=x2[..., c].

        Expressed as two one-hot channel mixes instead of stack+reshape:
        exact (0/1 weights, single-term sums) in every dtype, and XLA emits
        ONE fused materialisation instead of a copy+reshape pair per block --
        measured 10% off the whole serving step at 16k streams (PERF.md;
        the stack+reshape form cost ~90 us x 6 blocks of pure layout traffic).
        """
        half = x1.shape[-1]
        eye = jnp.eye(half, dtype=x1.dtype)
        zeros = jnp.zeros((half, half), x1.dtype)
        # (half, 2*half) scatter matrices: Eg places c at 2c, Ep at 2c+1
        eg = jnp.stack([eye, zeros], axis=-1).reshape(half, 2 * half)
        ep = jnp.stack([zeros, eye], axis=-1).reshape(half, 2 * half)
        return jnp.dot(x1, eg) + jnp.dot(x2, ep)

    def __call__(self, ctx: Ctx, params, x):
        with ctx.scope(self.name):
            half = self.c_in // 2
            x1, x2 = x[..., :half], x[..., half:]

            h = self.point1(ctx, params["point_conv1"], x1)
            h = self.bn1(ctx, params["point_bn1"], h)
            a = params["point_act"]["alpha"]
            h = jnp.maximum(h, 0) + a * jnp.minimum(h, 0)

            h = self.depth(ctx, params["depth_conv"], h)
            h = self.bn2(ctx, params["depth_bn"], h)
            a = params["depth_act"]["alpha"]
            h = jnp.maximum(h, 0) + a * jnp.minimum(h, 0)

            h = self.point2(ctx, params["point_conv2"], h)
            h = self.bn3(ctx, params["point_bn2"], h)

            h = self.tra(ctx, params["tra"], h)
            return self.shuffle(h, x2)


@dataclasses.dataclass(frozen=True)
class TCN:
    """Residual temporal conv block: 1x1 -> causal depthwise (k,1) dilated -> 1x1."""

    channels: int
    kernel: int = 3
    dilation: int = 1
    name: str = "tcn"

    def __post_init__(self):
        c = self.channels
        object.__setattr__(self, "pw1", Pointwise(c, c, name="pw1"))
        object.__setattr__(self, "bn1", BatchNorm(c, name="bn1"))
        depth = CausalConv2d(
            c,
            c,
            (self.kernel, 1),
            dilation=(self.dilation, 1),
            groups=c,
            name="conv2",
        )
        object.__setattr__(self, "depth", depth)
        object.__setattr__(self, "bn2", BatchNorm(c, name="bn2"))
        object.__setattr__(self, "pw3", Pointwise(c, c, name="pw3"))
        object.__setattr__(self, "bn3", BatchNorm(c, name="bn3"))

    def init(self, key):
        ks = _split_keys(key, 9)
        return {
            "conv1": self.pw1.init(ks[0]),
            "bn1": self.bn1.init(ks[1]),
            "act1": PReLU().init(ks[2]),
            "conv2": self.depth.init(ks[3]),
            "bn2": self.bn2.init(ks[4]),
            "act2": PReLU().init(ks[5]),
            "conv3": self.pw3.init(ks[6]),
            "bn3": self.bn3.init(ks[7]),
            "act3": PReLU().init(ks[8]),
        }

    def __call__(self, ctx: Ctx, params, x):
        with ctx.scope(self.name):
            residual = x
            y = self.pw1(ctx, params["conv1"], x)
            y = self.bn1(ctx, params["bn1"], y)
            y = jnp.maximum(y, 0) + params["act1"]["alpha"] * jnp.minimum(y, 0)

            y = self.depth(ctx, params["conv2"], y)
            y = self.bn2(ctx, params["bn2"], y)
            y = jnp.maximum(y, 0) + params["act2"]["alpha"] * jnp.minimum(y, 0)

            y = self.pw3(ctx, params["conv3"], y)
            y = self.bn3(ctx, params["bn3"], y)

            res = y + residual
            return jnp.maximum(res, 0) + params["act3"]["alpha"] * jnp.minimum(res, 0)


@dataclasses.dataclass(frozen=True)
class GTCN:
    """Stack of TCNs with geometric dilations 1,2,4,8 (replaces DPGRNN -- the
    model family is RNN-free, reference :313-336)."""

    channels: int
    n_layers: int = 4
    kernel: int = 3
    dilation_growth: int = 2
    name: str = "gtcn"

    def __post_init__(self):
        blocks = []
        d = 1
        for i in range(self.n_layers):
            blocks.append(
                TCN(self.channels, self.kernel, d, name=f"block{i}")
            )
            d *= self.dilation_growth
        object.__setattr__(self, "blocks", tuple(blocks))

    def init(self, key):
        ks = _split_keys(key, self.n_layers)
        return {b.name: b.init(k) for b, k in zip(self.blocks, ks)}

    def __call__(self, ctx: Ctx, params, x):
        with ctx.scope(self.name):
            for b in self.blocks:
                x = b(ctx, params[b.name], x)
            return x


@dataclasses.dataclass(frozen=True)
class Encoder:
    """2 strided freq ConvBlocks (129->65->33) + 3 GTConvBlocks; returns skips."""

    name: str = "encoder"

    def __post_init__(self):
        layers = (
            ConvBlock(3, 16, (1, 5), freq_stride=2, freq_pad=2, name="en0"),
            ConvBlock(16, 16, (1, 5), freq_stride=2, freq_pad=2, name="en1"),
            GTConvBlock(16, 16, (3, 3), freq_pad=1, name="en2"),
            GTConvBlock(16, 16, (3, 3), freq_pad=1, name="en3"),
            GTConvBlock(16, 16, (3, 3), freq_pad=1, name="en4"),
        )
        object.__setattr__(self, "layers", layers)

    def init(self, key):
        ks = _split_keys(key, len(self.layers))
        return {l.name: l.init(k) for l, k in zip(self.layers, ks)}

    def __call__(self, ctx: Ctx, params, x):
        with ctx.scope(self.name):
            outs = []
            for l in self.layers:
                x = l(ctx, params[l.name], x)
                outs.append(x)
            return x, outs


@dataclasses.dataclass(frozen=True)
class Decoder:
    """Mirror of the encoder with additive skips and transposed freq convs."""

    name: str = "decoder"

    def __post_init__(self):
        layers = (
            GTConvBlock(16, 16, (3, 3), freq_pad=1, use_deconv=True, name="de0"),
            GTConvBlock(16, 16, (3, 3), freq_pad=1, use_deconv=True, name="de1"),
            GTConvBlock(16, 16, (3, 3), freq_pad=1, use_deconv=True, name="de2"),
            ConvBlock(
                16, 16, (1, 5), freq_stride=2, freq_pad=2, use_deconv=True, name="de3"
            ),
            ConvBlock(
                16,
                2,
                (1, 5),
                freq_stride=2,
                freq_pad=2,
                use_deconv=True,
                is_last=True,
                name="de4",
            ),
        )
        object.__setattr__(self, "layers", layers)

    def init(self, key):
        ks = _split_keys(key, len(self.layers))
        return {l.name: l.init(k) for l, k in zip(self.layers, ks)}

    def __call__(self, ctx: Ctx, params, x, en_outs):
        with ctx.scope(self.name):
            n = len(self.layers)
            for i, l in enumerate(self.layers):
                x = l(ctx, params[l.name], x + en_outs[n - 1 - i])
            return x
