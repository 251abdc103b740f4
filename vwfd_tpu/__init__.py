"""vwfd_tpu — TPU-native robust video watermarking & forgery detection framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
yingqichao/video-watermarking-forgery-detection (MMSP 2022, arXiv 2207.03409):
invertible-network watermark embedding, a differentiable attack layer
(JPEG / blur / resize / crop / noise), and tamper-mask localization — built
for TPU from the start (NHWC layouts, jit-compiled train steps, explicit
PRNG threading, `jax.sharding` data parallelism, Pallas fused attack kernels).

Package layout (mirrors SURVEY.md §2 component inventory):
  ops/      : color transforms, blockwise DCT, quantization STE, resize, filters
  attacks/  : the differentiable distortion pool (reference: noise_layers/)
  metrics/  : PSNR/SSIM/F1 + losses (reference: metrics.py, loss.py, pytorch_ssim)
  nets/     : INN, UNet, localizers, HiDDeN, MBRS, FBCNN (reference: models/, network/)
  data/     : host-side loaders feeding device batches (reference: data/)
  models/   : training orchestrators (reference: models/*_model.py)
  parallel/ : mesh + sharding helpers (reference: train.py init_dist / DDP)
  utils/    : logging, progress bar, image montage (reference: utils/)
"""

__version__ = "0.1.0"
