"""torchvision stand-in: just enough for `from torchvision import models`
(egoego/model/resnet.py:3).  `models.resnet18` builds a tiny CPU CNN with the
same public surface (an `.fc` Linear with in_features=512) so `ResNet`
constructs; it is NOT a real resnet18 (the OF-feature eval paths never call
the CNN forward — input_of_feats=True)."""

from . import models  # noqa: F401
