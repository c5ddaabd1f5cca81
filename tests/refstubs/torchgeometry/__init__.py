"""torchgeometry import stand-in (relive/utils/torch_geometry_transforms.py:4).
Only `pi` and module presence are needed at import time; the wrapper file
defines its own functional re-implementations below its import.
"""
import torch

pi = torch.tensor(3.141592653589793)
