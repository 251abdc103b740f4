"""Network architectures — reference: models/invertible_net.py, models/networks.py,
network/, hidden_models/, mbrs_models/, models/conditional_jpeg_generator.py."""

from .blocks import SNConv, ResnetBlock, ConvBNRelu, scaled_glorot, scaled_kaiming
from .inn import (
    InvertibleNet, RNVPCoupling, DenseSubnet, ResSubnet, Gaussianize, squeeze2x,
)
from .unet import UNet, UNetTPU
from .localizer import UNetDiscriminator
from .discriminator import Discriminator, DGDiscriminator
from .hidden import (
    HiddenEncoder, HiddenDecoder, HiddenDiscriminator, HiddenEncoderDecoder,
)
from .mbrs import (
    SENet, SENetDecoder, ExpandNet, SEBottleneck,
    MBRSEncoder, MBRSDecoder, MBRSPlainDecoder,
    BalujaPrep, BalujaHiding, BalujaReveal,
)
from .fbcnn import FBCNN, QFPredictor
from .sunet import SUNet, SwinBlock, WindowAttention
from .srmnet import SRMNet, SKFF, SKRDB
from .wavelet import BSR, BBlock
from .zoo import (
    SelfAttention, NormalGenerator, EdgeGenerator, InpaintGenerator,
    DiscriminatorVGG128, CropLocalizeNet, InvBlockExp, InvRescaleNet,
    MantraNet, AttackNet,
)
from .registry import define_net, available_nets  # noqa: E402 (after all nets: avoids cycle)
