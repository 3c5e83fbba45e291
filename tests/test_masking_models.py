"""Parity of the non-default masking model family against the oracle."""

import numpy as np
import pytest

MODELS = [
    "mult-none",
    "mult-mutual",
    "add-mutual",
    "mult-transducer",
    "add-transducer",
    "mult-similarity",
    "add-similarity",
    "mult-mutual-old",
    "mult-transducer-texture",
    "min_mutual_masking_perc_norm2",
    "smooth_clamp_cont",
    "fvvdp_ch_gain",
]


@pytest.mark.parametrize("model", MODELS)
def test_masking_model_matches_oracle(reference, model):
    import torch

    import colorvideovdp_tpu as cv
    from colorvideovdp_tpu.ops import masking as mk

    rng = np.random.RandomState(0)
    C = 4
    T = (rng.rand(1, C, 2, 24, 32).astype(np.float32) - 0.5) * 2
    R = (rng.rand(1, C, 2, 24, 32).astype(np.float32) - 0.5) * 2
    S = rng.rand(1, C, 2, 24, 32).astype(np.float32) * 100 + 1

    my_m = cv.cvvdp(display_name="standard_4k", quiet=True)
    my_m.masking_model = model
    my_m.ce_g = 1.0
    my_m.k_c = 3.0
    D = np.asarray(
        mk.apply_masking_model(T, R, S, my_m._masking_params())
    )
    assert D.shape == T.shape and np.all(np.isfinite(D))

    if model in ("smooth_clamp_cont", "min_mutual_masking_perc_norm2",
                 "fvvdp_ch_gain"):
        # The reference's legacy fvvdp branch indexes the batch axis where it
        # means channels and crashes on 5-D input (cvvdp_metric.py:926-930);
        # we implement the documented intent, so there is no oracle to
        # compare against.
        return

    ref_m = reference.cvvdp(display_name="standard_4k", quiet=True,
                            device=torch.device("cpu"))
    ref_m.masking_model = model
    ref_m.ce_g = torch.as_tensor(1.0)
    ref_m.k_c = torch.as_tensor(3.0)
    if "texture" in model:
        from torchvision.transforms import GaussianBlur

        ref_m.tex_blur = GaussianBlur(33, 8.0)
        ref_m.tex_pad_size = 16
    with torch.no_grad():
        D_ref = ref_m.apply_masking_model(
            torch.tensor(T), torch.tensor(R), torch.tensor(S)
        ).numpy()

    if "transducer" in model:
        # pow_neg around the +/-C_t threshold amplifies 1-ulp branch flips:
        # a handful of isolated pixels can differ; require the bulk to agree.
        rel = np.abs(D - D_ref) / (np.abs(D_ref) + 1e-2)
        assert np.quantile(rel, 0.999) < 1e-2, np.quantile(rel, 0.999)
        assert np.median(rel) < 1e-4, np.median(rel)
    else:
        np.testing.assert_allclose(D, D_ref, rtol=2e-3, atol=2e-4)
