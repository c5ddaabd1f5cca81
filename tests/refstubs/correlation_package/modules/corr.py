"""Pure-torch Correlation stand-in for the absent CUDA correlation_package
(PWCNet.py:13).  Implements the published FlowNet/PWC cost-volume op for the
configuration PWC-DC uses (kernel_size=1, stride1=stride2=1, pad==md):
output channel (dy+md)*(2md+1)+(dx+md) = mean over input channels of
x1(y, x) * x2(y+dy, x+dx), zero-padded.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


class Correlation(nn.Module):
    def __init__(self, pad_size=4, kernel_size=1, max_displacement=4,
                 stride1=1, stride2=1, corr_multiply=1):
        super().__init__()
        assert kernel_size == 1 and stride1 == 1 and stride2 == 1, \
            "stub implements the PWC-DC configuration only"
        assert pad_size == max_displacement
        self.md = max_displacement

    def forward(self, x1, x2):
        b, c, h, w = x1.shape
        md = self.md
        x2p = F.pad(x2, (md, md, md, md))
        rows = []
        for dy in range(2 * md + 1):
            for dx in range(2 * md + 1):
                rows.append((x1 * x2p[:, :, dy:dy + h, dx:dx + w]).mean(dim=1))
        return torch.stack(rows, dim=1)
