import torch
from torch import nn


class _TinyResNet(nn.Module):
    """Shape-compatible stand-in for torchvision resnet18: conv stem ->
    global pool -> fc(512 -> 1000).  Same attribute surface (`.fc`)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 512, kernel_size=7, stride=4, padding=3)
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, 1000)

    def forward(self, x):
        x = torch.relu(self.conv1(x))
        x = self.pool(x).flatten(1)
        return self.fc(x)


def resnet18(pretrained=False, **kwargs):
    if pretrained:
        raise RuntimeError(
            "refstubs torchvision has no pretrained weights (offline env)"
        )
    return _TinyResNet()
