from text2human_tpu.losses.vqgan_loss import (
    adopt_weight,
    calculate_adaptive_weight,
    diff_augment,
    hinge_d_loss,
)
from text2human_tpu.losses.ce import (
    accuracy,
    bce_with_logits,
    bce_with_quant,
    cross_entropy,
)
from text2human_tpu.losses.perceptual import LPIPS, lpips_params_from_torch
