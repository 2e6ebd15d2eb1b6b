from .seg import (  # noqa: F401
    categorical_cross_entropy,
    binary_ce,
    categorical_nll,
    tversky_loss2,
    dice_loss,
    dice_entropy,
    area_ce_loss,
    area_hinge_loss,
)
from .lovasz import lovasz_softmax, lovasz_hinge  # noqa: F401
from .tversky import focal_binary_tversky, multi_tversky_loss  # noqa: F401
from .ohem import ohem_cross_entropy  # noqa: F401
from .disp import masked_l1, photo_consistency, smoothing_gradients  # noqa: F401
from .edge import balanced_edge_bce, dual_task_loss  # noqa: F401
from .multitask import multitask_loss  # noqa: F401
from .dispatch import (  # noqa: F401
    compose_seg_loss,
    compose_disp_loss,
    seg_class_weights,
    CITYSCAPES_SEG_WEIGHTS,
)
