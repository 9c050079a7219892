from .interpolate import (
    resize_bilinear,
    resize_nearest,
    upsample2x_bilinear,
    downsample2x_bicubic,
    pyramid_subsample,
    adaptive_avg_pool,
)
