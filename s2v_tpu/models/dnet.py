"""DNet — 3DMM-coefficient-driven face stabilizer (reference: models/DNet.py,
a PIRenderer-style reenactment net).

- MappingNet (DNet.py:30-54): 1-D convs over the 27-frame window of 73-d
  coefficient vectors -> 256-d descriptor (k7 then three dilated k3 residual
  convs, average-pooled).
- WarpingNet (DNet.py:56-90): ADAIN hourglass conditioned on the descriptor
  -> 2-channel flow at 64^2 -> deformation grid -> bilinear warp of the
  256^2 source image.
- EditingNet (DNet.py:93-118): encoder over (source | warped) -> FineDecoder
  with ADAIN residual blocks -> edited image (tanh).

Returns a dict with flow_field, warp_image, fake_image like the reference.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import (
    ADAINHourglass,
    Conv,
    FineDecoder,
    FineEncoder,
    LayerNorm2d,
    lrelu,
)
from s2v_tpu.ops.convs import bias_uniform_init, conv1d, kaiming_uniform_init
from s2v_tpu.ops.warp import convert_flow_to_deformation, warp_image


class MappingNet(nn.Module):
    """DNet.py:30-54. Input: [B, 27, 73] (frames, coeffs) in NLC."""

    coeff_nc: int = 73
    descriptor_nc: int = 256
    layer: int = 3

    @nn.compact
    def __call__(self, coeff_window):
        def conv(name, cin, k, dilation=1):
            w = self.param(f"{name}_weight", kaiming_uniform_init,
                           (k, cin, self.descriptor_nc))
            b = self.param(f"{name}_bias", bias_uniform_init(k * cin),
                           (self.descriptor_nc,))
            return w, b

        w, b = conv("first", self.coeff_nc, 7)
        out = conv1d(coeff_window, w, b)  # L: 27 -> 21
        for i in range(self.layer):
            w, b = conv(f"encoder{i}", self.descriptor_nc, 3, dilation=3)
            # residual is the PRE-activation tensor (DNet.py:52: the
            # nonlinearity lives inside the Sequential, the skip outside)
            out = conv1d(lrelu(out, 0.1), w, b, dilation=3) + out[:, 3:-3, :]
        return out.mean(axis=1)  # AdaptiveAvgPool1d(1) -> [B, 256]


class WarpingNet(nn.Module):
    """DNet.py:56-90."""

    descriptor_nc: int = 256
    base_nc: int = 32
    max_nc: int = 256
    encoder_layer: int = 5
    decoder_layer: int = 3

    @nn.compact
    def __call__(self, image, descriptor) -> Dict[str, jnp.ndarray]:
        feat = ADAINHourglass(
            self.base_nc, self.max_nc, self.encoder_layer, self.decoder_layer,
            self.descriptor_nc, name="hourglass",
        )(image, descriptor)
        x = LayerNorm2d(feat.shape[-1], name="flow_norm")(feat)
        x = lrelu(x, 0.1)
        flow = Conv(2, (7, 7), padding=(3, 3), name="flow_conv")(x)
        deformation = convert_flow_to_deformation(flow.astype(jnp.float32))
        warped = warp_image(image, deformation)
        return {"flow_field": flow, "warp_image": warped}


class EditingNet(nn.Module):
    """DNet.py:93-118."""

    image_nc: int = 3
    descriptor_nc: int = 256
    layer: int = 3
    base_nc: int = 64
    max_nc: int = 256
    num_res_blocks: int = 2

    @nn.compact
    def __call__(self, input_image, warp_image, descriptor):
        x = jnp.concatenate([input_image, warp_image], axis=-1)
        skips = FineEncoder(self.base_nc, self.max_nc, self.layer,
                            name="encoder")(x)
        return FineDecoder(
            self.image_nc, self.descriptor_nc, self.base_nc, self.max_nc,
            self.layer, self.num_res_blocks, name="decoder",
        )(skips, descriptor)


class DNet(nn.Module):
    """DNet.py:13-28. Inputs:

    - input_image: [B, 256, 256, 3] source frame in [-1, 1]
    - driving_source: [B, 27, 73] 3DMM coefficient window (NLC)

    Returns dict(flow_field, warp_image, fake_image).

    Width knobs (production defaults = the reference geometry,
    DNet.py:13-28): ``descriptor_nc`` the mapping descriptor,
    ``warp_base_nc``/``edit_base_nc`` the hourglass/editing stem widths,
    ``max_nc`` the channel cap. Small values give structurally-identical
    test graphs at a fraction of the FLOPs.
    """

    descriptor_nc: int = 256
    warp_base_nc: int = 32
    edit_base_nc: int = 64
    max_nc: int = 256

    @nn.compact
    def __call__(self, input_image, driving_source, stage: Optional[str] = None):
        descriptor = MappingNet(descriptor_nc=self.descriptor_nc,
                                name="mapping_net")(driving_source)
        output = WarpingNet(descriptor_nc=self.descriptor_nc,
                            base_nc=self.warp_base_nc, max_nc=self.max_nc,
                            name="warpping_net")(input_image, descriptor)
        if stage != "warp":
            output["fake_image"] = EditingNet(
                descriptor_nc=self.descriptor_nc, base_nc=self.edit_base_nc,
                max_nc=self.max_nc, name="editing_net",
            )(input_image, output["warp_image"], descriptor)
        return output
