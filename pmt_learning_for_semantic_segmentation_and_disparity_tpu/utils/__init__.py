from .analysis import (  # noqa: F401
    compute_mean_std,
    compute_disp_stats,
    count_classes_in_dataset,
    class_occurrence_csv,
    check_disparity_inversion,
)
from .viz import show_results  # noqa: F401
