"""Use the metric as a differentiable loss: reconstruct an image by gradient
descent on (10 - JOD). Demonstrates the jax.grad training path.

Run from the repository root:  python examples/ex_image_reconstruction.py
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
from colorvideovdp_tpu.io.video_source import video_source_array
from colorvideovdp_tpu.io.video_source_file import load_image_as_array

MEDIA = os.environ.get("CVVDP_MEDIA", "/root/reference/example_media")

I_ref = load_image_as_array(os.path.join(MEDIA, "wavy_facade.png"))
I_ref = I_ref[:256, :384].astype(np.float32) / 255.0  # crop for speed

metric = cvvdp.cvvdp(display_name="standard_4k", quiet=True)
metric._ensure_pyramids(I_ref.shape[1], I_ref.shape[0])
vs = video_source_array(I_ref, I_ref, 0, dim_order="HWC",
                        display_photometry=metric.display_photometry)
dm = vs.dm_photometry
ref_bcfhw = I_ref.transpose(2, 0, 1)[None, :, None]  # (1, 3, 1, H, W)


def loss_fn(test_bcfhw):
    T = dm.source_2_target_colorspace(test_bcfhw, "DKLd65")
    R = dm.source_2_target_colorspace(jnp.asarray(ref_bcfhw), "DKLd65")
    B, C, F, H, W = T.shape
    Rfull = jnp.stack([T, R], axis=2).reshape(B, 6, 1, H, W)
    Q_per_ch, _, _ = metric._process_block(Rfull, temp_ch=1, is_image=True)
    Q_jod = metric.do_pooling_and_jods(Q_per_ch)
    return jnp.mean(10.0 - Q_jod)


grad_fn = jax.jit(jax.value_and_grad(loss_fn))

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(*ref_bcfhw.shape).astype(np.float32))
opt = optax.adam(0.02)
state = opt.init(x)
for it in range(50):
    loss, g = grad_fn(x)
    updates, state = opt.update(g, state)
    x = jnp.clip(optax.apply_updates(x, updates), 0.0, 1.0)
    if it % 10 == 0:
        print(f"iter {it}: loss (10-JOD) = {float(loss):.4f}")
print(f"final loss: {float(loss):.4f}")
