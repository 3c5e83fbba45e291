"""Import the reference pycvvdp (torch-CPU) in this environment.

The container lacks ffmpeg-python and torchvision; both are stubbed exactly as
described in BASELINE.md ("Locally minted goldens") so the reference's image
and array paths run unmodified. Used ONLY to mint golden values for parity
tests — never shipped as part of the framework.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


def _install_stubs():
    if "ffmpeg" not in sys.modules:
        sys.modules["ffmpeg"] = types.ModuleType("ffmpeg")

    try:
        import torchvision  # noqa: F401
        return
    except ImportError:
        pass

    import torch
    import torch.nn.functional as F

    class GaussianBlur:
        """Faithful replica of torchvision.transforms.GaussianBlur for fp32
        tensors: linspace-sampled Gaussian, separable conv, reflect padding."""

        def __init__(self, kernel_size, sigma):
            self.kernel_size = (
                kernel_size if isinstance(kernel_size, int) else kernel_size[0]
            )
            self.sigma = float(sigma) if not isinstance(sigma, (list, tuple)) else float(sigma[0])

        def _kernel1d(self, dtype, device):
            ks = self.kernel_size
            half = (ks - 1) * 0.5
            x = torch.linspace(-half, half, steps=ks, dtype=dtype, device=device)
            pdf = torch.exp(-0.5 * (x / self.sigma) ** 2)
            return pdf / pdf.sum()

        def forward(self, img):
            k = self._kernel1d(img.dtype, img.device)
            ks = self.kernel_size
            pad = ks // 2
            sh = img.shape
            x = img.reshape(-1, 1, sh[-2], sh[-1])
            x = F.pad(x, (pad, pad, pad, pad), mode="reflect")
            kx = k.reshape(1, 1, 1, ks)
            ky = k.reshape(1, 1, ks, 1)
            x = F.conv2d(x, ky)
            x = F.conv2d(x, kx)
            return x.reshape(sh)

        __call__ = forward

    import torch.nn as nn

    class MLP(nn.Sequential):
        """Minimal torchvision.ops.MLP replica (Linear/activation stack)."""

        def __init__(self, in_channels, hidden_channels, activation_layer=nn.ReLU,
                     dropout=0.0, **kwargs):
            layers = []
            in_dim = in_channels
            for hidden_dim in hidden_channels[:-1]:
                layers.append(nn.Linear(in_dim, hidden_dim))
                layers.append(activation_layer())
                if dropout > 0:
                    layers.append(nn.Dropout(dropout))
                in_dim = hidden_dim
            layers.append(nn.Linear(in_dim, hidden_channels[-1]))
            super().__init__(*layers)

    tv = types.ModuleType("torchvision")
    tv.__path__ = []  # mark as package
    tr = types.ModuleType("torchvision.transforms")
    tr.GaussianBlur = GaussianBlur
    tops = types.ModuleType("torchvision.ops")
    tops.MLP = MLP
    tv.transforms = tr
    tv.ops = tops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.ops"] = tops


def import_reference():
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import pycvvdp

    return pycvvdp
