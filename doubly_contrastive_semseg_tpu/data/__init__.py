from .transforms import (
    Compose,
    RandomSquareCropAndScale,
    LabelBoundaryTransform,
    GammaCorrection,
    FixedResize,
    SetTargetSize,
    ToArrays,
    TwoCropTransform,
    CropBlackArea,
    ColorJitter,
    RandomHorizontalFlip,
    RandomVerticalFlip,
    RandomResizedCrop,
    RandomAffine,
    RandomErasing,
)
from .stereo_transforms import (
    LabelDistanceTransform,
    RandomBrightness,
    RandomColor,
    RandomContrast,
    RandomGamma,
    RandomHue,
    RandomSaturation,
    StereoRandomCrop,
    StereoRandomVerticalFlip,
    StereoToNumpy,
    StereoToPIL,
)
from .acdc import ACDC, CITYSCAPES_ID_TO_TRAIN_ID, TRAIN_ID_TO_COLOR, WEATHER_DICT
from .acdc_city import ACDC_City
from .cityscapes import Cityscapes
from .citylostfound import CityLostFound, LostFound
from .voc import VOCSegmentation
from .synthetic import SyntheticDataset
from .loader import DataLoader, collate
from .factory import get_dataset
from .weights import compute_class_frequencies, balanced_class_weights, load_or_compute_class_weights
