from .resize import (  # noqa: F401
    resize_nearest,
    upsample_nearest,
    resize_bilinear,
    resize_bilinear_align_corners,
    avg_pool,
    adaptive_avg_pool,
)
from .correlation import (  # noqa: F401
    correlation,
    correlation_lax,
    correlation1d_pallas,
)
from .warp import apply_disparity  # noqa: F401
from .edges import (  # noqa: F401
    compute_grad_mag,
    numerical_gradients_2d,
    gaussian_smooth,
    box_count,
    sobel_edges,
    gauss2d_kernel,
)
from .costvolume import concat_cost_volume, soft_argmin  # noqa: F401
