"""Adaptive chroma subsampling by optimisation (Fig. 21 of the ColorVideoVDP
paper): minimise a chroma-total-variation prior subject to the cvvdp loss
staying small — the metric decides where chromatic detail can be removed
(reference: examples/ex_adaptive_chroma_subsampling.py).

The JAX formulation: ``metric.get_loss_fn`` gives a pure, grad-able loss,
optimised with optax Adam; the whole update step is one jitted function.

Run from the repository root:  python examples/ex_adaptive_chroma_subsampling.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (when not pip-installed)

import colorvideovdp_tpu as cvvdp
from colorvideovdp_tpu.io.video_source_file import load_image_as_array

MEDIA = os.environ.get("CVVDP_MEDIA", "/root/reference/example_media")
ITERS = int(os.environ.get("ITERS", 200))

_RGB2YCBCR = jnp.array(
    [[0.299, 0.587, 0.114],
     [-0.168736, -0.331264, 0.5],
     [0.5, -0.418688, -0.081312]], jnp.float32)


def srgb2ycbcr(x):
    """(1, 3, 1, H, W) -> same shape, BT.601-style full-range YCbCr."""
    return jnp.einsum("ij,bjfhw->bifhw", _RGB2YCBCR, x)


def reduce_chroma(x):
    """Total variation of the two chroma planes."""
    Y = srgb2ycbcr(x)
    cb, cr = Y[:, 1], Y[:, 2]
    return (jnp.abs(jnp.diff(cb, axis=-1)).mean()
            + jnp.abs(jnp.diff(cb, axis=-2)).mean()
            + jnp.abs(jnp.diff(cr, axis=-1)).mean()
            + jnp.abs(jnp.diff(cr, axis=-2)).mean())


I_ref16 = load_image_as_array(os.path.join(MEDIA, "wavy_facade.png"))
patch = int(os.environ.get("PATCH", 256))
I_ref = (I_ref16[-patch:, -patch:, :].astype(np.float32)
         / np.iinfo(I_ref16.dtype).max)
H, W = I_ref.shape[:2]
ref = jnp.asarray(I_ref.transpose(2, 0, 1)[None, :, None])  # (1,3,1,H,W)

metric = cvvdp.cvvdp(display_name="standard_4k", quiet=True)
cvvdp_loss = metric.get_loss_fn(H, W, colorspace="sRGB")


def total_loss(img, ref_img):
    return cvvdp_loss(jnp.clip(img, 0.0, 1.0), ref_img) \
        + 100.0 * reduce_chroma(img)


opt = optax.adam(1e-3)
params = ref
opt_state = opt.init(params)


@jax.jit
def step(params, opt_state, ref_img):
    loss, g = jax.value_and_grad(total_loss)(params, ref_img)
    updates, opt_state = opt.update(g, opt_state)
    return optax.apply_updates(params, updates), opt_state, loss


for kk in range(ITERS):
    params, opt_state, loss = step(params, opt_state, ref)
    if kk % 20 == 0:
        print(f"Iteration {kk}: loss {float(loss):.5f}")

out = np.clip(np.asarray(params)[0, :, 0].transpose(1, 2, 0), 0, 1)
try:
    from PIL import Image

    Image.fromarray((out * 255).astype(np.uint8)).save(
        "adaptive_chroma_result.png")
    print("Saved adaptive_chroma_result.png")
except ImportError:
    pass

jod, _ = metric.predict(out, I_ref, dim_order="HWC")
print(f"Final quality vs reference: {float(jod):.3f} JOD, "
      f"chroma TV reduced to {float(reduce_chroma(params)):.5f} "
      f"(started at {float(reduce_chroma(ref)):.5f})")
