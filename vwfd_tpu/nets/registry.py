"""Net factory — the `define_G/define_D/define_F` registry of
models/networks.py:13-61, as a name→constructor map so configs can select
architectures by string (the reference's `which_model_G` switch)."""

from typing import Any, Dict

from . import (
    InvertibleNet, InvRescaleNet, AttackNet, NormalGenerator, UNet,
    UNetDiscriminator, Discriminator, DGDiscriminator, DiscriminatorVGG128,
    EdgeGenerator, InpaintGenerator, SelfAttention, CropLocalizeNet,
    HiddenEncoder, HiddenDecoder, HiddenDiscriminator, MBRSEncoder,
    MBRSDecoder, MBRSPlainDecoder, FBCNN, QFPredictor, MantraNet, SUNet,
    SRMNet, BSR,
)

_REGISTRY: Dict[str, Any] = {
    # invertible family
    "invertible": InvertibleNet,          # Inveritible_Decolorization[_PAMI]
    "inv_rescale": InvRescaleNet,         # legacy IRN
    "attack_net": AttackNet,
    "normal_generator": NormalGenerator,
    # localizers / segmenters
    "unet": UNet,
    "unet_discriminator": UNetDiscriminator,
    "sunet": SUNet,
    "srmnet": SRMNet,
    "bsr": BSR,
    # discriminators
    "discriminator": Discriminator,
    "dg_discriminator": DGDiscriminator,
    "discriminator_vgg128": DiscriminatorVGG128,
    # generators
    "edge_generator": EdgeGenerator,
    "inpaint_generator": InpaintGenerator,
    # JPEG / QF family
    "fbcnn": FBCNN,
    "qf_predictor": QFPredictor,
    "mantranet": MantraNet,
    # watermark message family
    "hidden_encoder": HiddenEncoder,
    "hidden_decoder": HiddenDecoder,
    "hidden_discriminator": HiddenDiscriminator,
    "mbrs_encoder": MBRSEncoder,
    "mbrs_decoder": MBRSDecoder,
    "mbrs_plain_decoder": MBRSPlainDecoder,
    # misc
    "self_attention": SelfAttention,
    "crop_localize": CropLocalizeNet,
}


def define_net(name: str, **kwargs):
    """Build a network module by registry name (networks.py define_G parity)."""
    try:
        cls = _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown net {name!r}; known: {sorted(_REGISTRY)}")
    return cls(**kwargs)


def available_nets():
    return sorted(_REGISTRY)
