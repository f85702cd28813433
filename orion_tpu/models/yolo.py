"""YOLOv1 detection head on a ResNet backbone (reference
`orion/models/yolo.py`)."""

import orion_tpu.nn as on

from .resnet import ResNet34


class YOLOv1(on.Module):
    def __init__(self, backbone, num_bboxes=2, num_classes=20):
        super().__init__()
        self.feature_size = 7
        self.num_bboxes = num_bboxes
        self.num_classes = num_classes

        self.backbone = backbone
        self.conv_layers = self._make_conv_layers()
        self.fc_layers = self._make_fc_layers()

        # strip the backbone's classification head
        self.backbone.avgpool = on.Identity()
        self.backbone.flatten = on.Identity()
        self.backbone.linear = on.Identity()

    def _make_conv_layers(self):
        return on.Sequential(
            on.Conv2d(512, 512, 3, padding=1),
            on.SiLU(degree=127),
            on.Conv2d(512, 512, 3, stride=2, padding=1),
            on.SiLU(degree=127),
            on.Conv2d(512, 512, 3, padding=1),
            on.SiLU(degree=127),
            on.Conv2d(512, 512, 3, padding=1),
            on.SiLU(degree=127),
        )

    def _make_fc_layers(self):
        S, B, C = self.feature_size, self.num_bboxes, self.num_classes
        return on.Sequential(
            on.Flatten(),
            on.Linear(7 * 7 * 512, 4096),
            on.SiLU(degree=127),
            on.Linear(4096, S * S * (5 * B + C)),
        )

    def forward(self, x):
        x = self.backbone(x)
        x = self.conv_layers(x)
        x = self.fc_layers(x)
        return x


def YOLOv1_ResNet34():
    return YOLOv1(ResNet34(), num_bboxes=2, num_classes=20)
