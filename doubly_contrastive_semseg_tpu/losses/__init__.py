from .focal import boundary_aware_focal_loss, plain_focal_loss, cross_entropy_loss
from .supcon import supcon_loss
from .pixel_contrast import pixel_contrast_loss
from .combine import compute_total_loss, weather_classifier_metrics
