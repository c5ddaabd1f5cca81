"""evo.core.lie_algebra stand-in: the se3 constructor evo uses to apply
alignment transforms."""

import numpy as np


def se3(r=np.eye(3), t=np.zeros(3)):
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = t
    return m
