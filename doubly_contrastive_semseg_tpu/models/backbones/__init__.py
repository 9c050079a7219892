from .resnet import DilatedResNet, resnet50, resnet101
from .mobilenetv2 import MobileNetV2
