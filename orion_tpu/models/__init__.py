from .mlp import MLP
from .lola import LoLA
from .lenet import LeNet
from .alexnet import AlexNet
from .vgg import VGG, VGG11, VGG13, VGG16, VGG19
from .resnet import (ResNet, BasicBlock, Bottleneck, ResNet20, ResNet32,
                     ResNet44, ResNet56, ResNet110, ResNet1202, ResNet18,
                     ResNet34, ResNet50, ResNet101, ResNet152)
from .yolo import YOLOv1, YOLOv1_ResNet34

__all__ = [
    "MLP", "LoLA", "LeNet", "AlexNet",
    "VGG", "VGG11", "VGG13", "VGG16", "VGG19",
    "ResNet", "BasicBlock", "Bottleneck", "ResNet20", "ResNet32",
    "ResNet44", "ResNet56", "ResNet110", "ResNet1202", "ResNet18",
    "ResNet34", "ResNet50", "ResNet101", "ResNet152",
    "YOLOv1", "YOLOv1_ResNet34",
]
