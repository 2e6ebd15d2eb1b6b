from .segmetrics import (  # noqa: F401
    confusion_matrix,
    pixel_accuracy_from_preds,
    pixel_accuracy,
    pixel_accuracy_class,
    mean_iou,
    branch_prf1,
    SegBatchMetrics,
    seg_batch_metrics,
)
from .dispmetrics import (  # noqa: F401
    disparity_error_count,
    disp_metrics,
    DispBatchMetrics,
)
