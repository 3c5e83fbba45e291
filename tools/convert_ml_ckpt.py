"""Convert a torch ColorVideoVDP-ML checkpoint (cvvdp.ckpt, Lightning-style
state_dict) into the cvvdp_ml.npz consumed by colorvideovdp_tpu.metrics.ml.

Usage:
    python tools/convert_ml_ckpt.py /path/to/cvvdp.ckpt [out.npz]

The reference fetches these checkpoints from huggingface.co/gfxdisp/cvvdp_ml;
run this converter wherever that download is possible and drop the npz onto a
config path (e.g. next to cvvdp_parameters.json, or a --config-paths dir).
"""

from __future__ import annotations

import sys

import numpy as np


def convert(ckpt_path: str, out_path: str):
    import torch

    state = torch.load(ckpt_path, map_location="cpu")
    if "state_dict" in state:
        state = state["state_dict"]
    arrays = {}
    for key, val in state.items():
        if hasattr(val, "detach"):
            arrays[key] = val.detach().cpu().numpy().astype(np.float32)
    np.savez_compressed(out_path, **arrays)
    print(f"Wrote {len(arrays)} tensors to {out_path}")


if __name__ == "__main__":
    ckpt = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "cvvdp_ml.npz"
    convert(ckpt, out)
