"""Flax 3D U-Net with exact PyTorch-reference semantics.

Architecture contract (reference: machine_learning/unet3d.py:37-105):

* channel ladder ``(32, 64, 128, 256, 512) * width_multiplier``;
* encoder = DoubleConv stem + 4 x (MaxPool3d(2) + DoubleConv);
* ``trilinear=True`` (default): bottleneck and decoder DoubleConv output
  channels are halved (``factor = 2``) and upsampling is trilinear with
  ``align_corners=True``; otherwise ConvTranspose3d(k=2, s=2);
* DoubleConv = [Conv3d(k=3, p=1) -> BatchNorm3d -> LeakyReLU(0.01)] x 2;
* decoder Up pads ``x1`` before channel-concat ``[skip, x1]`` using the
  reference's quirk: the pad amounts computed from the D/H size mismatch
  are applied to the H/W axes (torch ``F.pad`` pads the *last two* dims
  while ``diffY/diffX`` read ``size()[2]/size()[3]``; reference
  unet3d.py:281-288). Zero for the even power-of-two shapes this model is
  used with; replicated exactly for parity.
* returns raw logits -- sigmoid is applied by callers.

TPU-first: tensors are NDHWC (channels on the 128-wide lane dimension),
convs lower to MXU contractions, activations optionally run in bfloat16
while parameters and BatchNorm statistics stay float32. BatchNorm matches
torch exactly (biased variance for normalization, unbiased for the
running-variance update, momentum 0.1, eps 1e-5), so ``.pth`` checkpoints
round-trip bit-for-bit through ``models.convert``.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from aind_exaspim_neuron_segmentation_tpu.ops.upsample import (
    trilinear_upsample_x2,
    x2_support_trim,
)

DEFAULT_CHANNELS = (32, 64, 128, 256, 512)


class BatchNorm3d(nn.Module):
    """Torch-semantics batch norm over (B, D, H, W) per channel."""

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        in_dtype = x.dtype
        xf = x.astype(jnp.float32)
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            # E[x^2] - E[x]^2 in f32 can come out a few ulps NEGATIVE
            # for near-constant channels (e.g. a dead LeakyReLU channel
            # at its bias), and var < -eps makes rsqrt NaN -- poisoning
            # the forward AND the running stats. Clamp at 0 (exact
            # where it triggers: true var ~ 0). torch computes centered
            # variance, which cannot go negative.
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean),
                0.0,
            )
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        out = (xf - mean) * (inv * scale.astype(jnp.float32)) + bias.astype(
            jnp.float32
        )
        return out.astype(in_dtype)


class DoubleConv(nn.Module):
    """Two (Conv3d k=3 p=1 -> BN -> LeakyReLU 0.01) blocks.

    Reference: machine_learning/unet3d.py:108-165.

    ``fused_bn=True`` is the inference fast path: eval-mode BatchNorm is
    an affine transform, pre-folded into the conv kernel/bias by
    :func:`~..models.convert.fold_batchnorm`, so each block is a single
    conv whose bias-add + LeakyReLU epilogue XLA fuses into the conv --
    no separate full-resolution elementwise passes over HBM.
    """

    out_channels: int
    mid_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    fused_bn: bool = False
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fused_bn and train:
            raise ValueError("fused_bn is an inference-only fast path")
        mid = self.mid_channels or self.out_channels
        x = nn.Conv(
            mid, kernel_size=(3, 3, 3), padding=self.padding,
            dtype=self.dtype, name="conv1",
        )(x)
        if not self.fused_bn:
            x = BatchNorm3d(name="bn1")(x, train=train)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = nn.Conv(
            self.out_channels, kernel_size=(3, 3, 3), padding=self.padding,
            dtype=self.dtype, name="conv2",
        )(x)
        if not self.fused_bn:
            x = BatchNorm3d(name="bn2")(x, train=train)
        return nn.leaky_relu(x, negative_slope=0.01)


class Down(nn.Module):
    """MaxPool3d(2) then DoubleConv (reference unet3d.py:168-212)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    fused_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        return DoubleConv(
            self.out_channels, dtype=self.dtype, fused_bn=self.fused_bn,
            name="conv",
        )(x, train=train)


class Up(nn.Module):
    """Upsample, pad-to-skip, concat [skip, x], DoubleConv.

    Reference: machine_learning/unet3d.py:215-289, including the
    D/H-to-H/W pad quirk documented at module level.

    ``valid_trim=t`` (call arg, t > 0) returns only the central
    ``dim - 2t`` region of the full output along each spatial axis --
    the part callers keep after a ``t``-voxel border trim
    (reference inference.py:161-162). When the geometry allows
    (trilinear, exact x2 skip match, ``t >= 2``, eval mode) the block
    computes ONLY that region: the two 3^3 convs run unpadded (VALID)
    on the ``dim-2t+4 -> dim-2t+2 -> dim-2t`` cascade, whose interior
    conv windows see operands identical to the padded full-size
    forward, so every returned value matches the sliced full output.
    This removes ~1/3 of the FLOPs and HBM bytes of the dominant
    full-resolution stage for the default 96^3/trim=8 grid. Otherwise
    it falls back to the full forward followed by a slice (same return
    contract).

    ``x1_trim=s`` (call arg, s > 0) declares that ``x1`` holds only the
    central ``[s, a - s)`` rows of its nominal ``a``-row half-res grid
    on every spatial axis -- the previous decoder stage already ran
    valid-region decoding with ``valid_trim=s`` because the rows it
    dropped have zero weight in this block's row-sliced upsample
    (cascaded valid decoding; the upsample checks that statically).
    Only meaningful with the fast path; raises otherwise.
    """

    out_channels: int
    trilinear: bool = True
    dtype: jnp.dtype = jnp.float32
    fused_bn: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool = False, valid_trim: int = 0,
                 x1_trim: int = 0):
        t = int(valid_trim)
        s = int(x1_trim)
        fast = (
            t >= 2
            and self.trilinear
            and not train
            and all(
                2 * (a + 2 * s) == b and b - 2 * t > 0
                for a, b in zip(x1.shape[1:4], x2.shape[1:4])
            )
        )
        if s and not fast:
            raise ValueError(
                "x1_trim requires the valid-region fast path "
                f"(valid_trim={t}, trilinear={self.trilinear}, "
                f"train={train}, shapes {x1.shape[1:4]}/{x2.shape[1:4]})"
            )
        if fast:
            ranges = tuple(
                (t - 2, 2 * (a + 2 * s) - (t - 2)) for a in x1.shape[1:4]
            )
            x1 = trilinear_upsample_x2(x1, out_ranges=ranges, in_trim=s)
            x2 = x2[:, t - 2: x2.shape[1] - (t - 2),
                    t - 2: x2.shape[2] - (t - 2),
                    t - 2: x2.shape[3] - (t - 2), :]
            mid = (x1.shape[-1] + x2.shape[-1]) // 2
            x = jnp.concatenate([x2, x1], axis=-1)
            return DoubleConv(
                self.out_channels, mid_channels=mid, dtype=self.dtype,
                fused_bn=self.fused_bn, padding=0, name="conv",
            )(x, train=train)

        if self.trilinear:
            x1 = trilinear_upsample_x2(x1)
            mid = (x1.shape[-1] + x2.shape[-1]) // 2
        else:
            x1 = nn.ConvTranspose(
                x1.shape[-1] // 2, kernel_size=(2, 2, 2),
                strides=(2, 2, 2), dtype=self.dtype, name="up",
            )(x1)
            mid = None

        # Reference pad quirk: diffY from D-mismatch pads H, diffX from
        # H-mismatch pads W; D itself is never padded (unet3d.py:281-288).
        diff_y = x2.shape[1] - x1.shape[1]
        diff_x = x2.shape[2] - x1.shape[2]
        pad = (
            (0, 0),
            (0, 0),
            (diff_y // 2, diff_y - diff_y // 2),
            (diff_x // 2, diff_x - diff_x // 2),
            (0, 0),
        )
        if diff_y or diff_x:
            x1 = jnp.pad(x1, pad)
        x = jnp.concatenate([x2, x1], axis=-1)
        out = DoubleConv(
            self.out_channels, mid_channels=mid, dtype=self.dtype,
            fused_bn=self.fused_bn, name="conv",
        )(x, train=train)
        if t > 0:
            out = out[:, t:-t, t:-t, t:-t, :]
        return out


class UNet3D(nn.Module):
    """4-level 3D U-Net over NDHWC volumes, logits out.

    API mirrors reference unet3d.py:37 (``output_channels``, ``trilinear``,
    ``width_multiplier``); ``dtype`` selects the activation compute dtype
    (bfloat16 on TPU for MXU throughput, float32 for parity tests).
    """

    output_channels: int = 1
    trilinear: bool = True
    width_multiplier: float = 1
    channels: Sequence[int] = DEFAULT_CHANNELS
    dtype: jnp.dtype = jnp.float32
    fused_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, valid_trim: int = 0):
        """Forward logits; ``valid_trim=t`` returns only the central
        ``dim - 2t`` region per spatial axis (what callers keep after the
        reference's ``t``-voxel border trim, inference.py:161-162),
        computing the final full-resolution decoder stage only over that
        region when the geometry allows (see :class:`Up`). Values match
        the sliced full forward exactly; shapes must keep ``dim > 2t``.
        """
        ch = [int(c * self.width_multiplier) for c in self.channels]
        factor = 2 if self.trilinear else 1
        dt = self.dtype
        fb = self.fused_bn

        in_dtype = x.dtype
        x = x.astype(dt)
        x1 = DoubleConv(ch[0], dtype=dt, fused_bn=fb, name="inc")(
            x, train=train
        )
        x2 = Down(ch[1], dtype=dt, fused_bn=fb, name="down1")(x1, train=train)
        x3 = Down(ch[2], dtype=dt, fused_bn=fb, name="down2")(x2, train=train)
        x4 = Down(ch[3], dtype=dt, fused_bn=fb, name="down3")(x3, train=train)
        x5 = Down(ch[4] // factor, dtype=dt, fused_bn=fb, name="down4")(
            x4, train=train
        )

        # Cascaded valid decoding: when up4 will run its valid fast path,
        # its row-sliced upsample only reads the central rows of up3's
        # output -- so up3 itself runs valid-region decoding over exactly
        # that support (vt3 > 0), and up4 is told via x1_trim. Values are
        # unchanged: the dropped rows carry zero interpolation weight
        # (checked statically inside the upsample).
        t = int(valid_trim)
        vt3 = 0
        if t >= 2 and self.trilinear and not train:
            a_dims, b_dims = x2.shape[1:4], x1.shape[1:4]
            if all(2 * a == b and b - 2 * t > 0
                   for a, b in zip(a_dims, b_dims)):
                s = min(
                    x2_support_trim(a, t - 2, 2 * a - (t - 2))
                    for a in a_dims
                )
                if s >= 2 and all(a - 2 * s > 0 for a in a_dims):
                    vt3 = s

        y = Up(ch[3] // factor, self.trilinear, dtype=dt, fused_bn=fb,
               name="up1")(x5, x4, train=train)
        y = Up(ch[2] // factor, self.trilinear, dtype=dt, fused_bn=fb,
               name="up2")(y, x3, train=train)
        y = Up(ch[1] // factor, self.trilinear, dtype=dt, fused_bn=fb,
               name="up3")(y, x2, train=train, valid_trim=vt3)
        y = Up(ch[0], self.trilinear, dtype=dt, fused_bn=fb, name="up4")(
            y, x1, train=train, valid_trim=valid_trim, x1_trim=vt3
        )
        logits = nn.Conv(
            self.output_channels, kernel_size=(1, 1, 1), dtype=dt,
            name="outc",
        )(y)
        return logits.astype(in_dtype)


def init_unet3d(rng, output_channels=1, trilinear=True, width_multiplier=1,
                patch_shape=(96, 96, 96), dtype=jnp.float32):
    """Build the module and initialize variables on a dummy patch."""
    model = UNet3D(
        output_channels=output_channels,
        trilinear=trilinear,
        width_multiplier=width_multiplier,
        dtype=dtype,
    )
    dummy = jnp.zeros((1, *patch_shape, 1), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return model, variables
