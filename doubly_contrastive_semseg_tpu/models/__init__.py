from .blocks import BNReluConv, UpsampleBlend, SpatialPyramidPooling
from .resnet_pyramid import PyramidResNet, resnet18_pyramid, resnet34_pyramid
from .weathernet import WeatherNet, WeatherClassifier, ProjectionHead, DCSSModel, build_model
from .stereo_extras import make_aggregation, make_refinement, REFINE_NEW_VARIANTS
