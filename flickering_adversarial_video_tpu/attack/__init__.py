from .perturbation import (
    FlickerSpec,
    SparseSpec,
    TorchStyleFlickerSpec,
    init_delta,
    clip_delta,
    frame_mask,
    apply_perturbation,
    apply_perturbation_torch_style,
)
from .losses import (
    label_and_max_other,
    improved_hinge_loss,
    ce_attack_loss,
    adversarial_loss,
)
from .regularizers import (
    thinness_reg,
    first_order_diff_reg,
    second_order_diff_reg,
    flicker_regularizer,
    flicker_regularizer_torch,
    l12_regularizer,
)
from .metrics import (
    thickness,
    roughness,
    relative_percent,
    is_adversarial,
    fooling_counts,
)
