"""Metrics & losses — reference: metrics.py, pytorch_ssim/, calculate_f1.py,
loss.py, models/modules/loss.py, dice_loss.py."""

from .metrics import (
    psnr, psnr255_int, postprocess_int, ssim, edge_accuracy,
    mask_confusion, f1_from_confusion, mask_scores, f1_sweep,
    bitwise_message_error,
)
from .losses import (
    bce_loss, bce_with_logits, smooth_l1, l1_loss, l2_loss,
    reconstruction_loss, ssim_loss_map, gan_loss, adversarial_loss,
    exclusion_loss, gradient_loss, grayscale_loss, extended_l1_loss,
    gradient_penalty,
    non_blurry_loss, std_loss, dice_loss, cw_loss,
)
from .perceptual import VGG19Features, perceptual_loss, style_loss
