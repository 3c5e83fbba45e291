"""ColorVideoVDP metric — TPU-native JAX implementation.

Design (TPU-first, not a port):

* The whole per-block computation — temporal filtering, contrast pyramid,
  CSF, masking, spatial pooling, heatmap — is one pure function traced and
  compiled once per (shape, fps) configuration. Calibration constants are
  Python/numpy scalars folded into the graph at trace time.
* All shapes are static: band count, filter length and block size are derived
  from (H, W, ppd, fps) before jit.
* Frame blocks stream through a device-resident sliding-window buffer; the
  temporal-filter halo (filter_len - 1 frames) is the only carried state.

Behavioural parity is keyed to the reference pipeline
(reference: pycvvdp/cvvdp_metric.py); quirks replicated on purpose are
annotated inline.
"""

from __future__ import annotations

import json
import logging
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..display import vvdp_display_geometry, vvdp_display_photometry
from ..ops import masking as mk
from ..ops.csf import CastleCSF
from ..ops.pyramid import LaplacianPyramid, LogContrastPyramid, WeberContrastPyramid
from ..ops.temporal import get_temporal_filters
from ..utils.config import config_files, json2dict
from .base import register_metric, vq_exception, vq_metric


def _tail_donate_argnums():
    """Perf-bisection toggle: CVVDP_DONATE_TAILS=1 donates the temporal
    tails into the video step (the pre-round-3 behaviour). Default is NO
    donation — aliasing the tail outputs onto the inputs makes XLA insert
    full-tensor hazard copies (docs/step_profile.md finding 2)."""
    return (0, 1) if os.environ.get("CVVDP_DONATE_TAILS") == "1" else ()


class cvvdp(vq_metric):
    """Full-reference perceptual image/video quality metric (JOD units)."""

    def __init__(
        self,
        display_name="standard_4k",
        display_photometry=None,
        display_geometry=None,
        config_paths=None,
        heatmap=None,
        quiet=False,
        device=None,  # accepted for API compatibility; JAX picks the device
        temp_padding="replicate",
        use_checkpoints=False,
        dump_channels=None,
        gpu_mem=None,
        temp_resample=False,
        nominal_fps=240,
    ):
        config_paths = config_paths or []
        self.quiet = quiet
        self.heatmap = heatmap
        self.temp_padding = temp_padding
        self.use_checkpoints = use_checkpoints
        self.gpu_mem = gpu_mem
        self.training_mode = False

        assert heatmap in ["threshold", "supra-threshold", "raw", "none", None], (
            "Unknown heatmap type"
        )
        self.do_heatmap = heatmap is not None and heatmap != "none"

        self.set_display_model(
            display_name,
            display_photometry=display_photometry,
            display_geometry=display_geometry,
            config_paths=config_paths,
        )

        # Feature-space resampling of Q_per_ch to a nominal frame rate
        # (reference: cvvdp_metric.py:132-133,403-409).
        self.temp_resample = temp_resample
        self.nominal_fps = nominal_fps

        self.load_config(config_paths)
        self.dump_channels = dump_channels
        self._block_fns = {}

    # ------------------------------------------------------------------
    # Configuration

    def train(self, do_training=True):
        self.training_mode = do_training

    def load_config(self, config_paths=None):
        """Parse cvvdp_parameters.json into Python constants (reference:
        cvvdp_metric.py:146-229)."""
        config_paths = config_paths or []
        self.parameters_file = config_files.find(
            "cvvdp_parameters.json", config_paths
        )
        logging.debug(
            f"Loading ColorVideoVDP parameters from '{self.parameters_file}'"
        )
        p = json2dict(self.parameters_file)

        self.mask_p = float(p["mask_p"])
        self.mask_c = float(p["mask_c"])
        self.pu_dilate = p["pu_dilate"]
        self.beta = float(p["beta"])
        self.beta_t = float(p["beta_t"])
        self.beta_tch = float(p["beta_tch"])
        self.beta_sch = float(p["beta_sch"])
        self.csf_sigma = float(p["csf_sigma"])
        self.sensitivity_correction = float(p["sensitivity_correction"])
        self.masking_model = p["masking_model"]
        self.csf_version = p["csf"]
        self.local_adapt = p["local_adapt"]
        self.contrast = p["contrast"]
        self.jod_a = float(p["jod_a"])
        self.jod_exp = float(p["jod_exp"])
        self.ce_g = float(p["ce_g"]) if "ce_g" in p else None
        self.k_c = float(p["k_c"]) if "k_c" in p else None
        self.temp_filter = p.get("temp_filter", "default")
        if "mask_q" in p:
            self.mask_q = np.asarray(p["mask_q"], np.float32)
        else:
            self.mask_q_sust = float(p["mask_q_sust"])
            self.mask_q_trans = float(p["mask_q_trans"])
        self.filter_len = int(p["filter_len"])
        self.do_xchannel_masking = p["xchannel_masking"] == "on"
        self.xcm_weights = np.asarray(p["xcm_weights"], np.float32)
        self.image_int = float(p["image_int"])
        if "ch_chrom_w" in p:
            self.ch_chrom_w = float(p["ch_chrom_w"])
            self.ch_trans_w = float(p["ch_trans_w"])
        else:
            self.ch_weights = np.asarray(p["ch_weights"], np.float32)
        self.sigma_tf = np.asarray(p["sigma_tf"], np.float32)
        self.beta_tf = np.asarray(p["beta_tf"], np.float32)
        self.baseband_weight = np.atleast_1d(
            np.asarray(p["baseband_weight"], np.float32)
        )
        self.dclamp_type = p["dclamp_type"]
        self.d_max = float(p["d_max"]) if np.isscalar(p["d_max"]) else np.asarray(
            p["d_max"], np.float32
        )
        self.version = p["version"]
        self.do_Bloch_int = p["Bloch_int"] == "on"
        self.bfilt_duration = p["bfilt_duration"]
        self.omega = [0, 5]
        self.csf = CastleCSF(csf_version=self.csf_version, config_paths=config_paths)
        self.block_channels = (
            np.asarray(p["block_channels"], bool) if "block_channels" in p else None
        )
        self.debug = False
        # Fused Pallas masking kernels (single-chip fast path). Multi-chip
        # programs shard with GSPMD, which cannot partition custom calls —
        # parallel.sharding either disables this flag on the metric it wraps
        # (image path) or sets ``sharding_mesh`` so the kernels are re-issued
        # per shard through shard_map (video path).
        self.enable_fused_kernels = True
        # When set (a Mesh with a "space" axis), _process_block wraps the
        # fused kernels in shard_map over image rows and routes the CSF LUT
        # through its GSPMD-safe jnp form. Set inside traced fns with
        # save/restore (parallel/sharding.py) — never leaks to 1-chip use.
        self.sharding_mesh = None
        # Test hook: run the fused Pallas path in interpret mode off-TPU so
        # the shard_map'd kernels can be exercised on the CPU mesh.
        self.force_fused = False
        # Steady-state blocks per jit dispatch on the fast video path
        # (lax.scan over blocks, _get_video_scan_step). 0/1 disables.
        self.scan_group = 4
        self.lpyr = None
        self._block_fns = {}

    def update_from_checkpoint(self, ckpt):
        """Load calibrated parameters from a Lightning-style torch checkpoint
        (reference: cvvdp_metric.py:231-243)."""
        import torch

        state = torch.load(ckpt, map_location="cpu")["state_dict"]
        prefix = "params."
        for key, value in state.items():
            if key.startswith(prefix):
                v = value.detach().cpu().numpy()
                setattr(self, key[len(prefix):], v if v.ndim else float(v))
        self._block_fns = {}

    def set_display_model(self, display_name="standard_4k", display_photometry=None,
                          display_geometry=None, config_paths=None):
        super().set_display_model(
            display_name,
            display_photometry=display_photometry,
            display_geometry=display_geometry,
            config_paths=config_paths,
        )
        self.lpyr = None
        self._block_fns = {}

    # ------------------------------------------------------------------
    # Public API

    def loss(self, test_cont, reference_cont, dim_order="BCFHW",
             frames_per_second=0):
        Q_jod, _ = self.predict(
            test_cont, reference_cont, dim_order=dim_order,
            frames_per_second=frames_per_second,
        )
        return 10.0 - Q_jod

    def get_loss_fn(self, height, width, colorspace="sRGB", remat=True):
        """Return a pure, jit/grad-able loss over display-encoded BCFHW
        fp32 image pairs: fn(test, ref) -> mean(10 - JOD).

        The JAX replacement for the reference's autograd ``loss`` mode
        (reference: cvvdp_metric.py:294-298): compose with ``jax.grad`` /
        ``jax.jit`` and optimisers. ``remat`` wraps the per-block compute in
        ``jax.checkpoint`` to trade FLOPs for memory during training.
        """
        from ..display import vvdp_display_photo_eotf

        self._ensure_pyramids(width, height)
        dm = self.display_photometry
        met_colorspace = (
            "logLMS_DKLd65" if self.contrast == "log" else "DKLd65"
        )

        def block(test, ref):
            T = dm.source_2_target_colorspace(test, met_colorspace)
            R = dm.source_2_target_colorspace(ref, met_colorspace)
            B, C, F, H, W = T.shape
            Rfull = self._interleave_tr(T, R)
            Q_per_ch, _, _ = self._process_block(Rfull, temp_ch=1,
                                                 is_image=True)
            return Q_per_ch

        blk = jax.checkpoint(block) if remat else block

        def loss_fn(test, ref):
            Q_per_ch = blk(test, ref)
            Q_jod = self.do_pooling_and_jods(Q_per_ch)
            return jnp.mean(10.0 - Q_jod)

        return loss_fn

    def predict_video_source(self, vid_source):
        """Score a video source; returns (Q_jod, stats)."""
        h, w, N_frames = vid_source.get_video_size()
        batch_sz = vid_source.get_batch_size()

        if batch_sz > 1 and self.do_heatmap:
            raise vq_exception("Heatmaps not supported when batches are used")

        self._ensure_pyramids(w, h)

        is_image = N_frames == 1
        temp_ch = 1 if is_image else 2

        if not is_image:
            fps = vid_source.get_frames_per_second()
            self.F, _ = get_temporal_filters(
                fps, self.sigma_tf, self.beta_tf, self.temp_filter
            )
            self.filter_len = int(self.F[0].shape[0])

        met_colorspace = "logLMS_DKLd65" if self.contrast == "log" else "DKLd65"

        if self.dump_channels:
            self.dump_channels.open(vid_source.get_frames_per_second())

        if is_image:
            block_N_frames = 1
        else:
            block_N_frames = self.estimate_block_N(h * w * batch_sz, N_frames)

        if self.do_heatmap:
            dmap_channels = 1 if self.heatmap == "raw" else 3
            heatmap = np.zeros(
                (1, dmap_channels, N_frames, h, w), dtype=np.float16
            )
        else:
            heatmap = None

        use_fast = hasattr(vid_source, "get_raw_block")
        Q_blocks = []
        fb = {"sw": [None, None], "ra": [[], []]}
        tails = [None, None]
        prefetch = None  # [start_frame, thread, [raw_t, raw_r]]

        # Multi-block dispatch: queue steady-state full blocks and score K
        # of them per jit call with lax.scan (_get_video_scan_step) —
        # amortises the fixed per-dispatch cost. Only on the fast path with
        # no per-block host consumer (heatmap/dump read device output every
        # block) and only when at least one full group will form.
        scan_K = int(getattr(self, "scan_group", 0) or 0)
        if not is_image and use_fast and scan_K >= 2:
            n_full = N_frames // block_N_frames
            if (self.do_heatmap or self.dump_channels
                    or n_full < scan_K):
                scan_K = 0
        else:
            scan_K = 0
        pending = []  # queued (flat_t, flat_r) uploads awaiting a group
        pending_meta = [None, None]  # (shape, dtype) of the queued blocks

        def _check_finite(Qb, where):
            if self.debug and not np.all(np.isfinite(np.asarray(Qb))):
                raise RuntimeError(
                    f"Non-finite Q_per_ch in {where} "
                    "(masking produced NaN/Inf)"
                )

        def _flush_pending():
            # Score queued-but-ungrouped blocks through the single-block
            # step, preserving the temporal-tail order.
            for p_t, p_r in pending:
                fn1 = self._get_video_step(vid_source, met_colorspace,
                                           pending_meta[0], pending_meta[1],
                                           first=False)
                out1 = fn1(tails[0], tails[1], p_t, p_r)
                tails[0], tails[1] = out1[3], out1[4]
                _check_finite(out1[0], "flushed block")
                Q_blocks.append(out1[0])
            pending.clear()

        # Symmetric-padding head indices are static (reference:
        # cvvdp_metric.py:445-450,506-532).
        if not is_image:
            fl = self.filter_len
            if self.temp_padding == "replicate":
                head_idx = [0] * (fl - 1)
            elif self.temp_padding == "symmetric":
                head_idx = [
                    self._get_symmetric_frame_index(fi, N_frames)
                    for fi in range(-fl + 1, 0)
                ]
            else:
                raise RuntimeError(
                    f'Unknown padding method "{self.temp_padding}"'
                )

        from tqdm import tqdm

        show_progress = not is_image and not self.quiet
        for ff in tqdm(
            range(0, N_frames, block_N_frames), disable=not show_progress
        ):
            cur = min(block_N_frames, N_frames - ff)
            if is_image:
                if use_fast:
                    raw_t = vid_source.get_raw_block("test", 0, 1)
                    raw_r = vid_source.get_raw_block("reference", 0, 1)
                    fn = self._get_image_step(vid_source, met_colorspace,
                                              raw_t.shape, raw_t.dtype)
                    # Flat upload: multi-dim H2D pays a host-side relayout.
                    Q_per_ch_block, heatmap_block, context, dump = fn(
                        self._put_flat(raw_t), self._put_flat(raw_r)
                    )
                else:
                    T = vid_source.get_test_frame(0, colorspace=met_colorspace)
                    R = vid_source.get_reference_frame(
                        0, colorspace=met_colorspace
                    )
                    fn = self._get_block_fn(
                        ("image", batch_sz, T.shape[-4], h, w, self.do_heatmap)
                    )
                    Q_per_ch_block, heatmap_block, context, dump = fn(T, R)
            elif use_fast:
                # Fast path: contiguous zero-copy block slice on the host, one
                # flat DMA per source, one fused jit call per block; the
                # temporal halo (fl-1 DKL frames) stays device-resident.
                # Decode is prefetched one block ahead on a worker thread
                # (the producer/consumer split the reference gets from its
                # ffmpeg subprocess, SURVEY §2.9).
                if prefetch is not None and prefetch[0] == ff:
                    prefetch[1].join()
                    raw_t_np, raw_r_np = prefetch[2]
                else:
                    raw_t_np = vid_source.get_raw_block(
                        "test", ff, block_N_frames
                    )
                    raw_r_np = vid_source.get_raw_block(
                        "reference", ff, block_N_frames
                    )
                nxt = ff + block_N_frames
                # Symmetric padding reads head frames from the source after
                # this point on the first block — do not race it.
                if nxt < N_frames and (
                    ff > 0 or self.temp_padding == "replicate"
                ):
                    prefetch = [nxt, None, [None, None]]

                    def _fetch(slot=prefetch, start=nxt):
                        slot[2][0] = vid_source.get_raw_block(
                            "test", start, block_N_frames
                        )
                        slot[2][1] = vid_source.get_raw_block(
                            "reference", start, block_N_frames
                        )

                    import threading

                    prefetch[1] = threading.Thread(target=_fetch, daemon=True)
                    prefetch[1].start()
                else:
                    prefetch = None
                is_full = cur == block_N_frames
                if (not is_full and raw_t_np.ndim == 5
                        and not hasattr(vid_source, "unpack_raw_block")):
                    # Pad the trailing partial block to the full block shape
                    # by repeating its last frame: every block then runs the
                    # same steady-state program — no per-clip-length
                    # partial-shape compile. The padded frames' Q values are
                    # trimmed below (per-block :cur slice / final
                    # :N_frames slice for scanned groups); the tail after
                    # the last block is never consumed. Packed raw layouts
                    # (unpack_raw_block sources) keep their exact-shape
                    # program — no frame axis to pad generically.
                    pad_f = block_N_frames - raw_t_np.shape[1]
                    if pad_f > 0:
                        raw_t_np = np.concatenate(
                            [raw_t_np,
                             np.repeat(raw_t_np[:, -1:], pad_f, axis=1)],
                            axis=1,
                        )
                        raw_r_np = np.concatenate(
                            [raw_r_np,
                             np.repeat(raw_r_np[:, -1:], pad_f, axis=1)],
                            axis=1,
                        )
                        is_full = True
                raw_t = self._put_flat(raw_t_np)
                raw_r = self._put_flat(raw_r_np)
                if ff == 0:
                    # Initial DKL tails from the small tail-init program:
                    # block 0 then runs the same steady-state step as every
                    # other block (no specialised first-block program to
                    # compile) and can join the scanned group below.
                    if self.temp_padding == "replicate":
                        tfn = self._get_tail_init_fn(
                            vid_source, met_colorspace, raw_t_np.shape,
                            raw_t_np.dtype, "replicate",
                        )
                        tails[0] = tfn(raw_t)
                        tails[1] = tfn(raw_r)
                    else:
                        head_t_np = vid_source.get_raw_frame_list(
                            "test", head_idx
                        )
                        head_r_np = vid_source.get_raw_frame_list(
                            "reference", head_idx
                        )
                        tfn = self._get_tail_init_fn(
                            vid_source, met_colorspace, head_t_np.shape,
                            head_t_np.dtype, "symmetric",
                        )
                        tails[0] = tfn(self._put_flat(head_t_np))
                        tails[1] = tfn(self._put_flat(head_r_np))
                if ff == 0 and scan_K:
                    # Staged scan uploads live in HBM alongside the step
                    # program; shrink the group to what fits (r5: 4K blk=12
                    # K=4 hit a compile-time HBM OOM at 16.34 GB — see
                    # scan_group_limit). Below 2 the scan buys nothing.
                    scan_K = min(
                        scan_K,
                        self.scan_group_limit(
                            h * w * batch_sz, block_N_frames,
                            raw_t_np.nbytes,
                        ),
                    )
                    if scan_K < 2:
                        scan_K = 0
                if scan_K and is_full:
                    # Full (or padded-to-full) block: queue; dispatch K at a
                    # time through the scanned multi-block step.
                    pending.append((raw_t, raw_r))
                    pending_meta[0] = raw_t_np.shape
                    pending_meta[1] = raw_t_np.dtype
                    if len(pending) == scan_K:
                        sfn = self._get_video_scan_step(
                            vid_source, met_colorspace, raw_t_np.shape,
                            raw_t_np.dtype, scan_K,
                        )
                        flats = ([p[0] for p in pending]
                                 + [p[1] for p in pending])
                        Qg, tails[0], tails[1] = sfn(tails[0], tails[1],
                                                     *flats)
                        pending.clear()
                        _check_finite(Qg, f"scanned group ending at {ff}")
                        Q_blocks.append(Qg)
                    continue
                if pending:
                    # A non-groupable block (the trailing partial one)
                    # follows queued blocks: score the queue first so the
                    # temporal tails stay ordered.
                    _flush_pending()
                fn = self._get_video_step(
                    vid_source, met_colorspace, raw_t_np.shape, raw_t_np.dtype,
                    first=False,
                )
                out = fn(tails[0], tails[1], raw_t, raw_r)
                (Q_per_ch_block, heatmap_block, context, tails[0], tails[1],
                 dump) = out
                Q_per_ch_block = Q_per_ch_block[:, :, :cur]
                if heatmap_block is not None:
                    heatmap_block = heatmap_block[:, :, :cur]
                    context = context[:, :cur]
            else:
                self._advance_frame_buffers(
                    vid_source, fb, block_N_frames, met_colorspace, ff, cur,
                    N_frames,
                )
                fn = self._get_block_fn(
                    ("video", batch_sz, block_N_frames, h, w, self.filter_len,
                     float(vid_source.get_frames_per_second()), self.do_heatmap)
                )
                Q_per_ch_block, heatmap_block, context, dump = fn(
                    fb["sw"][0], fb["sw"][1]
                )
                Q_per_ch_block = Q_per_ch_block[:, :, :cur]
                if heatmap_block is not None:
                    heatmap_block = heatmap_block[:, :, :cur]
                    context = context[:, :cur]

            if self.dump_channels and dump is not None:
                self.dump_channels.dump_temp_ch(np.asarray(dump["R"])[:, :, :cur])
                self.dump_channels.dump_lpyr(
                    self.lpyr, [np.asarray(b)[:, :, :cur] for b in dump["bands"]]
                )
                self.dump_channels.set_diff_bands(
                    [np.asarray(b)[:, :, :cur] for b in dump["D_bands"]]
                )
                self.dump_channels.dump_diff()

            if self.debug:
                # Numeric sanitizer (reference asserts after masking,
                # cvvdp_metric.py:906-907; here the per-band pooled values
                # are checked — any NaN/Inf in the masked D propagates into
                # them, and they are small enough to read back cheaply).
                qb = np.asarray(Q_per_ch_block)
                if not np.all(np.isfinite(qb)):
                    raise RuntimeError(
                        f"Non-finite Q_per_ch in block at frame {ff} "
                        "(masking produced NaN/Inf)"
                    )

            Q_blocks.append(Q_per_ch_block)

            if self.do_heatmap:
                if self.heatmap == "raw":
                    hm = np.asarray(heatmap_block, np.float16)
                else:
                    from ..viz import visualize_diff_map

                    hm = np.asarray(
                        visualize_diff_map(
                            heatmap_block, context_image=context,
                            colormap_type=self.heatmap,
                        ),
                        np.float16,
                    )
                heatmap[:, :, ff : ff + cur] = hm

        if pending:
            _flush_pending()

        Q_per_ch = jnp.concatenate(Q_blocks, axis=2) if len(Q_blocks) > 1 else Q_blocks[0]
        if Q_per_ch.shape[2] > N_frames:
            # Drop the replicate-padded trailing frames of a padded-to-full
            # last block that went through a scanned group (per-block :cur
            # trimming covers the single-step routes).
            Q_per_ch = Q_per_ch[:, :, :N_frames]

        fps = vid_source.get_frames_per_second()
        if self.temp_resample:
            # NOTE: the reference's equivalent (cvvdp_metric.py:403-409) is
            # dead code with a latent layout bug — interp1dim2 resamples
            # axis 1, which was the frame axis before the batch dimension was
            # added (v0.5.3) but is the CHANNEL axis of today's
            # (B, C, F, bands) Q_per_ch; enabling it upstream trips
            # interp.py's shape assert. We implement the intent: linear
            # resampling of the FRAME axis to nominal_fps.
            from ..ops.interp import interp1dim2

            t_end = N_frames / fps
            t_org = jnp.linspace(0.0, t_end, N_frames)
            N_res = math.ceil(t_end * self.nominal_fps)
            t_res = jnp.linspace(0.0, N_res / self.nominal_fps, N_res)
            Q_per_ch = jnp.moveaxis(
                interp1dim2(t_org, jnp.moveaxis(Q_per_ch, 2, 1), t_res), 1, 2
            )
            N_frames = N_res
            fps = self.nominal_fps

        rho_band = self.lpyr.get_freqs()
        Q_jod = self.do_pooling_and_jods(Q_per_ch)

        stats = {
            "Q_per_ch": np.asarray(Q_per_ch),
            "rho_band": rho_band,
            "frames_per_second": fps,
            "width": w,
            "height": h,
            "N_frames": N_frames,
        }
        if self.dump_channels:
            self.dump_channels.close()
        if self.do_heatmap:
            stats["heatmap"] = heatmap

        Q_jod = jnp.squeeze(jnp.asarray(Q_jod))
        return (Q_jod, stats)

    # ------------------------------------------------------------------
    # Static setup helpers

    def _ensure_pyramids(self, width, height):
        if self.lpyr is not None and self.lpyr.W == width and self.lpyr.H == height:
            return
        if self.contrast.startswith("weber"):
            self.lpyr = WeberContrastPyramid(
                width, height, self.pix_per_deg, contrast=self.contrast
            )
        elif self.contrast.startswith("log"):
            self.lpyr = LogContrastPyramid(width, height, self.pix_per_deg)
        else:
            raise RuntimeError(f"Unknown contrast {self.contrast}")
        if self.do_heatmap:
            self.heatmap_pyr = LaplacianPyramid(width, height, self.pix_per_deg)
        self._block_fns = {}

    def _hbm_avail(self):
        """Usable HBM budget in bytes (device-reported minus a 1 GB reserve,
        or a v5e-class fallback when the backend exposes no memory_stats)."""
        try:
            stats = jax.devices()[0].memory_stats()
            mem_avail = stats.get("bytes_limit", 16e9) - stats.get(
                "bytes_in_use", 0
            ) - 1e9
        except Exception:
            # memory_stats() is unavailable on some backends (returns None
            # under the axon tunnel). 14 GB assumes a v5e-class 16 GB chip:
            # it yields blk=12 at 4K, which is executed-on-hardware safe
            # (r5: blk=12 runs at 59.7 fps; blk=14 OOMs; the >=6e6-pix cap
            # in estimate_block_N keeps larger estimates out of the
            # measured-OOM gap).
            mem_avail = 14e9
        if self.gpu_mem is not None:
            mem_avail = min(self.gpu_mem * 1e9, mem_avail)
        return mem_avail

    def estimate_block_N(self, pix_cnt, N_frames):
        """Static HBM budget model (TPU memory is predictable — no NVML).
        Same linear form as the reference (cvvdp_metric.py:565-594)."""
        mem_avail = self._hbm_avail()
        a = 0.6e9
        b = 24  # two fp32 3-channel sliding-window buffers
        # Working-set coefficient re-fit against the measured 4K OOM
        # boundary on a real v5e (r4): blk=16 at 3840x2160 requires
        # 16.35 GB total => per-frame footprint (16.35G - a - tails)/16
        # = 107 B/pix (the old guess of 184 was ~70% high; XLA's buffer
        # reuse is tighter than the reference's torch value of 320).
        # c = 86 working set (+ b = 24 tails) + 6 B/pix of raw uint8
        # block staging while a scan group of K blocks is queued
        # (predict_video_source `pending`), ~8% margin over measured.
        # blk=6..12 all execute at 4K; 12 is the model's 4K pick under
        # the 14 GB fallback, measured at 59.68 fps step latency (r5).
        c = 92 if not self.training_mode else 800
        if not getattr(self, "enable_fused_kernels", True):
            # Pure-XLA route keeps far more HLO temps live: the unfused 4K
            # step at blk=12 compiled to an 18.42 GB program on a 15.75 GB
            # v5e (r5 bench log) => (18.42G - a - tails)/(12*pix) ~ 161
            # B/pix incl. tails; 160 + the 24 B tails term gives ~15%
            # margin and picks blk=7 at 4K under the 14 GB fallback.
            c = max(c, 160)
        max_frames = int(
            math.floor(
                (mem_avail - a - pix_cnt * (self.filter_len - 1) * b)
                / (pix_cnt * b + pix_cnt * c)
            )
        )
        # Cap at 32: beyond ~32 frames/block the dispatch amortisation is
        # already >97% (measured 720p blk=32: 248 fps) while compile time
        # and first-block latency keep growing with the block shape.
        # At 4K-scale the measured-working region is blk<=12: blk=14 and
        # blk=16 both OOM on the real v5e (r5/r4 sweeps) — the cap is the
        # measured boundary, not a guess, so a full 15.75 GB device cannot
        # pick past it.
        if pix_cnt >= 6e6:
            max_frames = min(max_frames, 12)
        return max(1, min(max_frames, 32, N_frames))

    def scan_group_limit(self, pix_cnt, blk, block_nbytes):
        """Largest scan group K whose staged uploads fit in HBM NEXT TO the
        steady-state step program. The scan-grouped dispatch holds K raw
        blocks x 2 streams as live program arguments while it runs; the r5
        bench proved that staging is NOT free: at 4K blk=12 the K=4 group
        needed 12.63 GB program + 3.71 GB arguments = 16.34 GB on a
        15.75 GB v5e (compile-time HBM OOM), while blk=10 K=4 (13.0 GB
        total, r4) executes. Uses the same linear footprint model as
        estimate_block_N for the program side; a staged flat uint8 block
        measures ~1.55x its raw nbytes on device (TPU tile padding of the
        packed planes) — 1.6 is the margin-inclusive factor.
        Returns at least 1 (1 means: do not group, score per-block)."""
        a = 0.6e9
        b = 24
        c = 92 if not self.training_mode else 800
        if not getattr(self, "enable_fused_kernels", True):
            c = max(c, 160)
        fl = int(getattr(self, "filter_len", 9))
        step_total = a + pix_cnt * (fl - 1) * b + pix_cnt * blk * (b + c)
        headroom = self._hbm_avail() - step_total
        per_group = 2 * float(block_nbytes) * 1.6
        if headroom <= 0 or per_group <= 0:
            return 1
        return max(1, int(headroom // per_group))

    def get_ch_weights(self, no_channels):
        if hasattr(self, "ch_chrom_w"):
            w = np.array(
                [1.0, self.ch_chrom_w, self.ch_chrom_w, self.ch_trans_w], np.float32
            )
        else:
            w = np.asarray(self.ch_weights, np.float32)
        return w[:no_channels]

    def _masking_params(self) -> mk.MaskingParams:
        if hasattr(self, "mask_q"):
            mask_q = np.asarray(self.mask_q, np.float32)
        else:
            q_sust = float(np.clip(self.mask_q_sust, 1.0, 7.0))
            q_trans = float(np.clip(self.mask_q_trans, 1.0, 7.0))
            mask_q = np.array([q_sust, q_sust, q_sust, q_trans], np.float32)
        return mk.MaskingParams(
            masking_model=self.masking_model,
            mask_p=self.mask_p,
            mask_q=tuple(mask_q.tolist()),
            mask_c=self.mask_c,
            pu_dilate=self.pu_dilate,
            xcm_weights=tuple(np.asarray(self.xcm_weights, np.float32).tolist()),
            do_xchannel_masking=self.do_xchannel_masking,
            dclamp_type=self.dclamp_type,
            d_max=self.d_max,
            ce_g=self.ce_g,
            k_c=self.k_c,
        )

    # ------------------------------------------------------------------
    # Functional core

    def _get_block_fn(self, key):
        if key in self._block_fns:
            return self._block_fns[key]

        if key[0] == "image":

            def image_fn(T, R):
                # Interleave test/reference: single-channel (luminance-only)
                # input broadcasts into all three DKL slots (reference:
                # cvvdp_metric.py:462-465).
                _, C, _, h, w = T.shape
                B = max(T.shape[0], R.shape[0])
                T3 = jnp.broadcast_to(T, (B, 3, 1, h, w))
                R3 = jnp.broadcast_to(R, (B, 3, 1, h, w))
                Rfull = self._interleave_tr(T3, R3)
                Q, hm, dump = self._process_block(Rfull, temp_ch=1,
                                                  is_image=True)
                # Context for heatmap colour-mapping: channel 0 of the block
                # (test sustained Y, reference: cvvdp_metric.py:400).
                return Q, hm, Rfull[:, 0], dump

            fn = jax.jit(image_fn)
        else:

            def video_fn(sw_test, sw_ref):
                from ..ops.temporal import apply_temporal_filters

                filt = np.stack([f[::-1] for f in self.F])
                T4 = apply_temporal_filters(sw_test, filt)
                R4 = apply_temporal_filters(sw_ref, filt)
                B, _, nf, h, w = T4.shape
                Rfull = self._interleave_tr(T4, R4)
                Q, hm, dump = self._process_block(Rfull, temp_ch=2,
                                                  is_image=False)
                return Q, hm, Rfull[:, 0], dump

            fn = jax.jit(video_fn)

        self._block_fns[key] = fn
        return fn

    @staticmethod
    def _interleave_tr(T, R):
        """(B, C, F, H, W) x2 -> (B, 2C, F, H, W) with channels interleaved
        test-even / reference-odd. Concat + a channel-axis gather instead of
        stack+reshape: under GSPMD a stack forces a full rematerialisation of
        the row-sharded operands, while concat+gather keeps the 'space'
        sharding intact (identical values either way)."""
        C = T.shape[1]
        TR = jnp.concatenate([T, R], axis=1)
        idx = jnp.arange(2 * C) // 2 + (jnp.arange(2 * C) % 2) * C
        return jnp.take(TR, idx, axis=1)

    @staticmethod
    def _put_flat(a: np.ndarray):
        """Upload as a flat contiguous buffer (fast path through the host
        transfer layer); the consuming jit reshapes on device for free."""
        return jax.device_put(np.ascontiguousarray(a).reshape(-1))

    @staticmethod
    def _dm_key(dm):
        """Hashable identity of a photometric model for the jit cache."""
        return (
            type(dm).__name__,
            getattr(dm, "Y_peak", None),
            getattr(dm, "contrast", None),
            getattr(dm, "EOTF", None),
            getattr(dm, "E_ambient", None),
            getattr(dm, "k_refl", None),
            getattr(dm, "exposure", None),
            getattr(dm, "rgb2xyz", np.zeros(1)).tobytes(),
        )

    @staticmethod
    def _raw_to_float(x):
        """Source dtype ladder -> fp32, in-graph (mirrors
        video_source.frame_to_float32)."""
        if x.dtype == jnp.uint8:
            return x.astype(jnp.float32) / 255.0
        if x.dtype == jnp.uint16:
            return x.astype(jnp.float32) / 65535.0
        if x.dtype == jnp.int16:
            # uint16 content packed into int16 (reference trick for torch);
            # bitcast back losslessly.
            u = jax.lax.bitcast_convert_type(x, jnp.uint16)
            return u.astype(jnp.float32) / 65535.0
        return x.astype(jnp.float32)

    def _dm_to_met(self, dm, raw, met_colorspace):
        """Raw frames -> metric colour space, broadcast to 3 channels for
        luminance-only content (reference: cvvdp_metric.py:464-465 broadcast)."""
        I = dm.source_2_target_colorspace(self._raw_to_float(raw), met_colorspace)
        if I.shape[-4] == 1:
            sh = list(I.shape)
            sh[-4] = 3
            I = jnp.broadcast_to(I, sh)
        return I

    def _flat_to_met(self, dm, raw_flat, shape, met_colorspace, source=None):
        """Flat frame-major upload -> (B, 3, F, H, W) in the metric colour
        space. Sources with a packed representation (e.g. planar YUV) supply
        an ``unpack_raw_block`` hook traced into the same graph."""
        x = raw_flat.reshape(shape)
        if source is not None and hasattr(source, "unpack_raw_block"):
            rgb = source.unpack_raw_block(x)  # float32 (B, C, F, H, W)
            if rgb.shape[-4] == 1:
                sh = list(rgb.shape)
                sh[-4] = 3
                rgb = jnp.broadcast_to(rgb, sh)
            return dm.source_2_target_colorspace(rgb, met_colorspace)
        x = jnp.transpose(x, (0, 2, 1, 3, 4))  # (B,F,C,H,W) -> (B,C,F,H,W)
        return self._dm_to_met(dm, x, met_colorspace)

    def _get_image_step(self, vid_source, met_colorspace, shape, dtype):
        """Fully fused image path: dtype conversion + display model + metric
        in a single jit."""
        dm = vid_source.dm_photometry
        rk = vid_source.raw_block_key() if hasattr(vid_source, "raw_block_key") else None
        key = ("image_fused", self._dm_key(dm), rk, met_colorspace, shape,
               str(dtype), self.do_heatmap, bool(self.dump_channels))
        if key in self._block_fns:
            return self._block_fns[key]

        def fn(raw_t, raw_r):
            T = self._flat_to_met(dm, raw_t, shape, met_colorspace, vid_source)
            R = self._flat_to_met(dm, raw_r, shape, met_colorspace, vid_source)
            B = max(T.shape[0], R.shape[0])
            _, _, _, h, w = T.shape
            T = jnp.broadcast_to(T, (B, 3, 1, h, w))
            R = jnp.broadcast_to(R, (B, 3, 1, h, w))
            Rfull = self._interleave_tr(T, R)
            Q, hm, dump = self._process_block(Rfull, temp_ch=1, is_image=True)
            return Q, hm, Rfull[:, 0], dump

        jfn = jax.jit(fn)
        self._block_fns[key] = jfn
        return jfn

    def _get_video_step(self, vid_source, met_colorspace, shape, dtype, first):
        """Fused video block step: dtype conversion, display model, temporal
        FIR, pyramid, CSF, masking and pooling in one jit call per block.
        The first block assembles its temporal-padding head in-graph; later
        blocks carry the DKL temporal halo as device-resident state."""
        dm = vid_source.dm_photometry
        rk = vid_source.raw_block_key() if hasattr(vid_source, "raw_block_key") else None
        padding = self.temp_padding if first else "-"
        key = ("video_fused", self._dm_key(dm), rk, met_colorspace, shape,
               str(dtype), first, padding, self.filter_len, self.do_heatmap,
               bool(self.dump_channels))
        if key in self._block_fns:
            return self._block_fns[key]

        from ..ops.temporal import apply_temporal_filters

        filt = np.stack([f[::-1] for f in self.F])
        fl = self.filter_len

        # Fused Pallas ingest (dtype ladder + EOTF + DKL + FIR + interleave
        # in one pass over row tiles): the XLA chain costs ~20 ms/frame at 4K
        # in full-size HBM materialisations. Forward-only scoring path.
        from ..ops.kernels import ingest as _ingest

        use_ingest = (
            getattr(self, "enable_fused_kernels", True)
            and (jax.default_backend() == "tpu"
                 or getattr(self, "force_fused", False))
            and getattr(self, "sharding_mesh", None) is None
            and not hasattr(vid_source, "unpack_raw_block")
            and len(shape) == 5
            and shape[0] == 1 and shape[2] == 3
            and shape[-1] >= 128 and shape[-2] >= 8
            and _ingest.supports(dm, met_colorspace, dtype)
            and _ingest.pick_tiles(dtype, shape[1], fl, shape[-2],
                                   shape[-1]) is not None
        )
        if use_ingest:
            mode = ("tail" if not first
                    else ("replicate" if self.temp_padding == "replicate"
                          else "head"))
            ing = _ingest.make_ingest_fn(dm, dtype, shape, filt, fl, mode)
            head_shape = (shape[0], fl - 1) + shape[2:]

            if mode == "replicate":

                def fn(raw_t, raw_r):
                    Rfull, tail_t, tail_r = ing(raw_t.reshape(shape),
                                                raw_r.reshape(shape))
                    Q, hm, dump = self._process_block(Rfull, temp_ch=2,
                                                      is_image=False)
                    return Q, hm, Rfull[:, 0], tail_t, tail_r, dump

                jfn = jax.jit(fn)
            elif mode == "head":

                def fn(head_t, head_r, raw_t, raw_r):
                    Rfull, tail_t, tail_r = ing(
                        head_t.reshape(head_shape), head_r.reshape(head_shape),
                        raw_t.reshape(shape), raw_r.reshape(shape),
                    )
                    Q, hm, dump = self._process_block(Rfull, temp_ch=2,
                                                      is_image=False)
                    return Q, hm, Rfull[:, 0], tail_t, tail_r, dump

                jfn = jax.jit(fn)
            else:

                def fn(tail_t, tail_r, raw_t, raw_r):
                    Rfull, new_t, new_r = ing(tail_t, tail_r,
                                              raw_t.reshape(shape),
                                              raw_r.reshape(shape))
                    Q, hm, dump = self._process_block(Rfull, temp_ch=2,
                                                      is_image=False)
                    return Q, hm, Rfull[:, 0], new_t, new_r, dump

                # NOTE: tails are deliberately NOT donated. Donation
                # aliases the tail outputs onto the inputs, and the ingest
                # custom call both reads the old tails and writes the new
                # ones, so XLA breaks the in-place hazard by COPYING both
                # 796 MB inputs every step (profiled: copy.280/281,
                # 10 ms/step at 4K — docs/step_profile.md). The extra
                # 1.6 GB liveness is cheaper than the copies.
                # CVVDP_DONATE_TAILS=1 restores donation (bisection toggle).
                jfn = jax.jit(fn, donate_argnums=_tail_donate_argnums())

            self._block_fns[key] = jfn
            return jfn

        def core(T_buf, R_buf):
            # T_buf/R_buf: (B, 3, fl-1+blk, H, W) DKL sliding windows.
            blk = T_buf.shape[2] - (fl - 1)
            T4 = apply_temporal_filters(T_buf, filt)
            R4 = apply_temporal_filters(R_buf, filt)
            B, _, nf, h, w = T4.shape
            Rfull = self._interleave_tr(T4, R4)
            Q, hm, dump = self._process_block(Rfull, temp_ch=2, is_image=False)
            new_tail_t = T_buf[:, :, blk:]
            new_tail_r = R_buf[:, :, blk:]
            return Q, hm, Rfull[:, 0], new_tail_t, new_tail_r, dump

        if first and self.temp_padding == "replicate":

            def fn(raw_t, raw_r):
                T_new = self._flat_to_met(dm, raw_t, shape, met_colorspace, vid_source)
                R_new = self._flat_to_met(dm, raw_r, shape, met_colorspace, vid_source)
                B, C, _, H, W = T_new.shape
                head_t = jnp.broadcast_to(T_new[:, :, 0:1], (B, C, fl - 1, H, W))
                head_r = jnp.broadcast_to(R_new[:, :, 0:1], (B, C, fl - 1, H, W))
                return core(
                    jnp.concatenate([head_t, T_new], axis=2),
                    jnp.concatenate([head_r, R_new], axis=2),
                )

            jfn = jax.jit(fn)
        elif first:  # symmetric: mirror-index head frames uploaded separately

            head_shape = (shape[0], fl - 1) + shape[2:]

            def fn(head_t, head_r, raw_t, raw_r):
                T_h = self._flat_to_met(dm, head_t, head_shape, met_colorspace, vid_source)
                R_h = self._flat_to_met(dm, head_r, head_shape, met_colorspace, vid_source)
                T_new = self._flat_to_met(dm, raw_t, shape, met_colorspace, vid_source)
                R_new = self._flat_to_met(dm, raw_r, shape, met_colorspace, vid_source)
                return core(
                    jnp.concatenate([T_h, T_new], axis=2),
                    jnp.concatenate([R_h, R_new], axis=2),
                )

            jfn = jax.jit(fn)
        else:

            def fn(tail_t, tail_r, raw_t, raw_r):
                T_new = self._flat_to_met(dm, raw_t, shape, met_colorspace, vid_source)
                R_new = self._flat_to_met(dm, raw_r, shape, met_colorspace, vid_source)
                T_buf = jnp.concatenate([tail_t, T_new], axis=2)
                R_buf = jnp.concatenate([tail_r, R_new], axis=2)
                return core(T_buf, R_buf)

            # Tails not donated: aliasing the tail outputs onto the inputs
            # makes XLA insert full-tensor hazard copies (see the ingest
            # branch above / docs/step_profile.md).
            jfn = jax.jit(fn, donate_argnums=_tail_donate_argnums())

        self._block_fns[key] = jfn
        return jfn

    def _get_tail_init_fn(self, vid_source, met_colorspace, shape, dtype,
                          mode):
        """Synthesize the initial DKL temporal tails for the first block.

        The tails carried between video block steps are nothing but the
        last fl-1 display-encoded (DKL) frames, so the first block's
        temporal padding can be expressed as a *tail*: ``replicate``
        broadcasts frame 0 of the raw block, ``symmetric`` converts the
        mirror-indexed head frames (uploaded separately, as before). With
        the initial tails built by this small, fast-compiling program,
        block 0 runs through the same steady-state step as every other
        block — the specialised full-size first-block program (and its
        compile, ~30 s at 4K) disappears from the cold path, and block 0
        can join the scanned group dispatch.

        ``shape`` is the raw buffer shape: the full block for
        ``replicate`` (frame 0 is sliced on device after conversion — no
        extra upload), the head-frame list shape for ``symmetric``."""
        dm = vid_source.dm_photometry
        rk = (vid_source.raw_block_key()
              if hasattr(vid_source, "raw_block_key") else None)
        key = ("tail_init", self._dm_key(dm), rk, met_colorspace, shape,
               str(dtype), mode, self.filter_len)
        if key in self._block_fns:
            return self._block_fns[key]

        fl = self.filter_len

        if mode == "replicate":

            def fn(raw):
                # Convert the whole block and slice frame 0 in DKL space:
                # raw layouts are source-specific (packed YUV has no
                # (B, F, C, H, W) frame axis to slice before unpacking).
                T = self._flat_to_met(dm, raw, shape, met_colorspace,
                                      vid_source)
                B, C, _, H, W = T.shape
                return jnp.broadcast_to(T[:, :, 0:1], (B, C, fl - 1, H, W))
        else:  # symmetric: head frames are real (mirror-indexed) frames

            def fn(raw):
                return self._flat_to_met(dm, raw, shape, met_colorspace,
                                         vid_source)

        jfn = jax.jit(fn)
        self._block_fns[key] = jfn
        return jfn

    def _get_video_scan_step(self, vid_source, met_colorspace, shape, dtype,
                             K):
        """K steady-state video blocks in ONE jit dispatch via ``lax.scan``
        (the DKL temporal tails are the carry; one block per iteration).

        Every dispatch of the single-block step pays a fixed host/runtime
        cost on top of the device work (measured on v5e at 4K: step time
        fits 35 + 14.8*blk ms across blk in {1,2,4,6} — the 35 ms is this
        container's axon-tunnel RPC, but the constant is nonzero on any
        host). Scanning K blocks inside one program amortises that constant
        by K while the working set stays a single block: scan compiles one
        iteration body and reuses its buffers, unlike a K-fold unroll.
        TPU-native replacement for driving the per-block device loop from
        Python (reference: cvvdp_metric.py:506-532).

        Signature: ``fn(tail_t, tail_r, *flats)`` with ``flats`` = K flat
        test buffers then K flat reference buffers (the `_put_flat` layout);
        returns ``(Q, tail_t, tail_r)`` with Q shaped (B, C, K*blk, bands).
        Heatmap/dump consumers are per-block host work and are gated off by
        the caller. Nothing is donated: tail donation provokes XLA
        hazard copies (docs/step_profile.md) and the uint8 raws can never
        alias an output anyway."""
        dm = vid_source.dm_photometry
        rk = (vid_source.raw_block_key()
              if hasattr(vid_source, "raw_block_key") else None)
        key = ("video_scan", self._dm_key(dm), rk, met_colorspace, shape,
               str(dtype), K, self.filter_len)
        if key in self._block_fns:
            return self._block_fns[key]

        from ..ops.temporal import apply_temporal_filters

        filt = np.stack([f[::-1] for f in self.F])
        fl = self.filter_len

        from ..ops.kernels import ingest as _ingest

        use_ingest = (
            getattr(self, "enable_fused_kernels", True)
            and (jax.default_backend() == "tpu"
                 or getattr(self, "force_fused", False))
            and getattr(self, "sharding_mesh", None) is None
            and not hasattr(vid_source, "unpack_raw_block")
            and len(shape) == 5
            and shape[0] == 1 and shape[2] == 3
            and shape[-1] >= 128 and shape[-2] >= 8
            and _ingest.supports(dm, met_colorspace, dtype)
            and _ingest.pick_tiles(dtype, shape[1], fl, shape[-2],
                                   shape[-1]) is not None
        )
        if use_ingest:
            ing = _ingest.make_ingest_fn(dm, dtype, shape, filt, fl, "tail")

            def body(carry, raws):
                tail_t, tail_r = carry
                raw_t, raw_r = raws
                Rfull, new_t, new_r = ing(tail_t, tail_r,
                                          raw_t.reshape(shape),
                                          raw_r.reshape(shape))
                Q, _hm, _dump = self._process_block(Rfull, temp_ch=2,
                                                    is_image=False)
                return (new_t, new_r), Q
        else:

            def body(carry, raws):
                tail_t, tail_r = carry
                raw_t, raw_r = raws
                T_new = self._flat_to_met(dm, raw_t, shape, met_colorspace,
                                          vid_source)
                R_new = self._flat_to_met(dm, raw_r, shape, met_colorspace,
                                          vid_source)
                T_buf = jnp.concatenate([tail_t, T_new], axis=2)
                R_buf = jnp.concatenate([tail_r, R_new], axis=2)
                blk = T_buf.shape[2] - (fl - 1)
                T4 = apply_temporal_filters(T_buf, filt)
                R4 = apply_temporal_filters(R_buf, filt)
                Rfull = self._interleave_tr(T4, R4)
                Q, _hm, _dump = self._process_block(Rfull, temp_ch=2,
                                                    is_image=False)
                return (T_buf[:, :, blk:], R_buf[:, :, blk:]), Q

        def fn(tail_t, tail_r, *flats):
            raws_t = jnp.stack(flats[:K])
            raws_r = jnp.stack(flats[K:])
            (t_t, t_r), Qs = jax.lax.scan(body, (tail_t, tail_r),
                                          (raws_t, raws_r))
            Kk, B, C, blk, nb = Qs.shape
            Q = jnp.moveaxis(Qs, 0, 2).reshape(B, C, Kk * blk, nb)
            return Q, t_t, t_r

        # Tails not donated — same hazard-copy reasoning as
        # _get_video_step (docs/step_profile.md).
        jfn = jax.jit(fn, donate_argnums=_tail_donate_argnums())
        self._block_fns[key] = jfn
        return jfn

    def report_memory_analysis(self, jitted_fn, *example_args):
        """Log compiled per-stage HBM use for a jitted step (the TPU
        equivalent of the reference's --debug cuda.max_memory_allocated
        report, cvvdp_metric.py:432-439)."""
        try:
            ma = jitted_fn.lower(*example_args).compile().memory_analysis()
            logging.info(
                "HBM analysis: args %.1f MB, outputs %.1f MB, temps %.1f MB,"
                " total %.1f MB",
                ma.argument_size_in_bytes / 2**20,
                ma.output_size_in_bytes / 2**20,
                ma.temp_size_in_bytes / 2**20,
                (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes) / 2**20,
            )
            return ma
        except Exception as e:  # backend may not expose the analysis
            logging.debug(f"memory_analysis unavailable: {e}")
            return None

    def _process_block(self, R, temp_ch, is_image):
        """Pyramid -> CSF -> masking -> spatial pooling for one frame block
        (reference: cvvdp_metric.py:660-751). Pure traced function."""
        all_ch = 2 + temp_ch
        lpyr = self.lpyr
        n_bands = lpyr.get_band_count()
        params = self._masking_params()

        rho_band = lpyr.get_freqs()
        rho_band[n_bands - 1] = 0.1  # baseband CSF frequency

        sens_corr = 10.0 ** (self.sensitivity_correction / 20.0)
        per_ch_w = self.get_ch_weights(all_ch)
        t_int = self.image_int if is_image else 1.0

        # The calibrated default configuration runs through the fused Pallas
        # masking kernels (CSF + contrast coding + mutual masking transducer).
        can_fuse = (
            getattr(self, "enable_fused_kernels", True)
            and (jax.default_backend() == "tpu"
                 or getattr(self, "force_fused", False))
            and self.masking_model == "mult-mutual"
            and self.do_xchannel_masking
            and self.dclamp_type == "soft"
            and np.asarray(self.d_max).size == 1
        )
        mesh = getattr(self, "sharding_mesh", None)
        n_space = int(mesh.shape["space"]) if mesh is not None else 1
        n_batch = (int(dict(mesh.shape).get("batch", 1))
                   if mesh is not None else 1)

        # Raw-band mode: the interior levels skip the con/logL
        # materialisations entirely — the Weber division happens inside the
        # masking kernel (shard_map'd over row slabs under a mesh; dumps
        # need explicit bands).
        raw_pairs = (
            can_fuse and not self.dump_channels
            and isinstance(lpyr, WeberContrastPyramid)
            and self.contrast in ("weber_g1", "weber_g1_ref")
        )
        if raw_pairs:
            B_bands, L_bkg_pyr = lpyr.decompose(R, raw_pairs=True)
        else:
            B_bands, L_bkg_pyr = lpyr.decompose(R)

        # Stacked deep-band kernel (ops/kernels/band_stack.py): the narrow
        # interior bands below the per-band fused-route gate all run in ONE
        # Mosaic instance — per-band LUT rows through SMEM, the blur as
        # per-band matrices on the MXU, pooling in VMEM. Pooled scoring
        # path only (heatmap/dump need the per-band D tensors). Under a
        # sharded trace the deep bands are KB-sized: the whole expand +
        # stack pipeline runs REPLICATED inside shard_map (GSPMD
        # all-gathers the tiny levels; each device computes the identical
        # pooled values) instead of falling back to the per-band XLA chain
        # (VERDICT r4 item 4 — sharded-path overhead).
        stack_Q = {}
        if (raw_pairs and not self.do_heatmap
                and os.environ.get("CVVDP_NO_BAND_STACK") != "1"):
            force_f = getattr(self, "force_fused", False)
            min_w_gate = (128 if force_f
                          else int(os.environ.get("CVVDP_MIN_W", "360")))
            cand = []
            for bb in range(1, n_bands - 1):
                if not isinstance(B_bands[bb], tuple):
                    continue
                gi_b = B_bands[bb][0]
                h_b, w_b = gi_b.shape[-2], gi_b.shape[-1]
                if h_b >= 8 and w_b >= min_w_gate:
                    continue  # per-band fused route takes it
                cand.append(bb)
            if len(cand) >= 2:
                from ..ops.kernels.band_stack import (
                    make_band_stack,
                    plan_band_stack,
                )
                from ..ops.pyramid import gausspyr_expand

                shapes_c = [
                    (B_bands[bb][0].shape[-2], B_bands[bb][0].shape[-1])
                    for bb in cand
                ]
                inc, _hp, _wp = plan_band_stack(shapes_c, all_ch)
                if inc is not None:
                    sel = [cand[i] for i in inc]
                    shapes_sel = [shapes_c[i] for i in inc]
                    luts_sel = np.stack([
                        np.stack([
                            self.csf.logS_of_logL(
                                float(rho_band[bb]),
                                self.omega[0 if cc < 3 else 1],
                                cc if cc < 3 else 0,
                            )
                            for cc in range(all_ch)
                        ])
                        for bb in sel
                    ])
                    fstack = make_band_stack(
                        luts_sel, float(self.csf.log_L_bkg[0]),
                        float(self.csf.log_L_bkg[-1]),
                        np.array([1.0, 1.45, 1.0, 1.0],
                                 np.float32)[:all_ch],
                        sens_corr, params,
                        self.contrast.endswith("ref"), 2.0,
                        float(self.beta), shapes_sel,
                    )
                    if mesh is None:
                        gi_list, E_list = [], []
                        for bb in sel:
                            gi_b, gn_b = B_bands[bb]
                            E_list.append(gausspyr_expand(
                                gn_b, (gi_b.shape[-2], gi_b.shape[-1])
                            ))
                            gi_list.append(gi_b)
                        qs_out = fstack(gi_list, E_list)
                    else:
                        from jax import shard_map as _smap
                        from jax.sharding import PartitionSpec as _P

                        nsel = len(sel)
                        rep5 = _P(*([None] * B_bands[sel[0]][0].ndim))
                        repq = _P(None, None, None)

                        def _stack_body(*flat, _n=nsel):
                            gis = flat[:_n]
                            gns = flat[_n:]
                            Es = [gausspyr_expand(
                                gn, (gi.shape[-2], gi.shape[-1]))
                                for gi, gn in zip(gis, gns)]
                            return tuple(fstack(list(gis), Es))

                        qs_out = _smap(
                            _stack_body, mesh=mesh,
                            in_specs=(rep5,) * (2 * nsel),
                            out_specs=(repq,) * nsel,
                            check_vma=False,
                        )(*[B_bands[bb][0] for bb in sel],
                          *[B_bands[bb][1] for bb in sel])
                    for bb, q in zip(sel, qs_out):
                        stack_Q[bb] = q

        Q_cols = []
        hm_bands = [None] * n_bands
        dump_D = [] if self.dump_channels else None
        for bb in range(n_bands):
            if bb in stack_Q:
                Q_cols.append(stack_Q[bb])
                continue
            is_baseband = bb == n_bands - 1
            raw_band = isinstance(B_bands[bb], tuple)
            mul_band = 1.0 if (bb == 0 or is_baseband) else 2.0
            rho = float(rho_band[bb])
            luts = [
                (rho, self.omega[0 if cc < 3 else 1], cc if cc < 3 else 0)
                for cc in range(all_ch)
            ]

            def _lut_rows():
                return (
                    np.stack([self.csf.logS_of_logL(rho, om, cc)
                              for _r, om, cc in luts]),
                    float(self.csf.log_L_bkg[0]),
                    float(self.csf.log_L_bkg[-1]),
                    np.array([1.0, 1.45, 1.0, 1.0], np.float32)[:all_ch],
                )

            def blur_fn(M, _p=params):
                return mk.phase_uncertainty(M, _p)

            if raw_band:
                gi_b, gn_b = B_bands[bb]
                h_b, w_b = gi_b.shape[-2], gi_b.shape[-1]
                raw_shard_ok = (
                    mesh is None
                    or (h_b % n_space == 0 and h_b // n_space >= 8
                        and gi_b.shape[0] % n_batch == 0)
                )
                # Tiny deep bands stay on XLA: each Pallas instance is
                # another slow remote Mosaic compile for ~1% of the pixels.
                # 360 admits the 480-wide band (270x480 at 4K == band 2 at
                # 1080p — one cached Mosaic instance serves both) which the
                # XLA chain ran at ~0.8 ms/frame vs ~0.25 fused; widths
                # <= 240 are cheaper per band and wait for the stacked
                # deep-band kernel. force_fused (the CPU interpret-mode
                # test path) keeps the low threshold so kernel semantics
                # stay covered.
                force_f = getattr(self, "force_fused", False)
                min_w = (128 if force_f
                         else int(os.environ.get("CVVDP_MIN_W", "360")))
                # Without a heatmap/dump consumer the spatial pooling
                # fuses into the kernel too: the band's D tensor never
                # reaches HBM.
                pool = (None if (self.do_heatmap or dump_D is not None)
                        else float(self.beta))
                from ..ops.kernels.band_fused import can_band_fused

                # Mega-kernel route: expand + contrast + CSF + blur +
                # transducer (+ pooling) in one pallas_call — G_{i+1} is
                # read directly; E/M_pre/diff never reach HBM. Opt-in
                # (``use_band_mega=True``): measured on v5e at 4K it is
                # ~55% SLOWER than the XLA-expand + two-kernel route
                # (19.4 vs 12.5 ms per 2-frame band-0 call) because the
                # polyphase interleave runs as VPU sublane shuffles in
                # Mosaic, costing more than the ~2.6x HBM traffic it
                # saves. Kept as the measured proof that the per-band
                # expand materialisation is not worth removing on this
                # hardware. Single-device traces only (its halo DMA
                # crosses shard rows).
                use_mega = (
                    getattr(self, "use_band_mega", False)
                    and mesh is None
                    and params.pu_dilate != 0
                    and h_b > params.pu_padsize and w_b > params.pu_padsize
                    and can_band_fused(all_ch, h_b, w_b,
                                       params.pu_kernel_size,
                                       min_w=256 if force_f else 512)
                )
                if use_mega:
                    from ..ops.kernels.band_fused import make_band_fused

                    lut_rows, x0, x1, gains = _lut_rows()
                    fused = make_band_fused(
                        lut_rows, x0, x1, gains, sens_corr, params,
                        self.contrast.endswith("ref"), mul_band,
                        pool_beta=pool,
                    )
                    if pool is not None:
                        Q_cols.append(fused(gi_b, gn_b))
                        continue
                    D = fused(gi_b, gn_b)
                    T_f = None
                elif h_b >= 8 and w_b >= min_w and raw_shard_ok:
                    from ..ops.kernels.masking_fused import (
                        make_fused_mult_mutual_raw,
                    )
                    from ..ops.pyramid import gausspyr_expand

                    E_b = gausspyr_expand(gn_b, (h_b, w_b))
                    lut_rows, x0, x1, gains = _lut_rows()
                    fused = make_fused_mult_mutual_raw(
                        lut_rows, x0, x1, gains, sens_corr, params, blur_fn,
                        self.contrast.endswith("ref"), mul_band, mesh=mesh,
                        pool_beta=pool,
                    )
                    if pool is not None:
                        Q_cols.append(fused(gi_b, E_b))
                        continue
                    D = fused(gi_b, E_b)
                    T_f = None  # tiny/unshardable bands never take this route
                else:
                    # Tiny deep band: contrast coding in jnp, generic path.
                    from ..ops.pyramid import gausspyr_expand

                    E_b = gausspyr_expand(gn_b, (h_b, w_b))
                    lb_r = jnp.clip(E_b[:, 1:2], 0.01, None)
                    lb_t = (lb_r if self.contrast.endswith("ref")
                            else jnp.clip(E_b[:, 0:1], 0.01, None))
                    T_f = jnp.clip((gi_b[:, 0::2] - E_b[:, 0::2]) / lb_t,
                                   None, 1000.0) * mul_band
                    R_f = jnp.clip((gi_b[:, 1::2] - E_b[:, 1::2]) / lb_r,
                                   None, 1000.0) * mul_band
                    logL = jnp.log10(lb_r)
            else:
                B_bb = lpyr.get_band(B_bands, bb)
                T_f = B_bb[:, 0::2]
                R_f = B_bb[:, 1::2]
                # Sensitivity is extracted for the reference image's
                # adaptation field (the pyramid returns only that channel).
                logL = L_bkg_pyr[bb]
                h_b, w_b = T_f.shape[-2], T_f.shape[-1]

            # Under a sharded trace the fused kernels run per shard via
            # shard_map: each device must get an equal, tile-aligned row slab
            # (fall back to the GSPMD-partitioned jnp path otherwise).
            shard_ok = (
                mesh is None
                or (h_b % n_space == 0 and h_b // n_space >= 8
                    and B_bands[bb].shape[0] % n_batch == 0)
            ) if not raw_band else True
            if raw_band and T_f is None:
                pass  # D already computed by the raw fused kernel
            elif (not is_baseband and not raw_band and can_fuse and shard_ok
                    and h_b >= 8 and w_b >= 128
                    and T_f.shape[0] == logL.shape[0]):
                from ..ops.kernels.masking_fused import make_fused_mult_mutual

                lut_rows, x0, x1, gains = _lut_rows()
                fused = make_fused_mult_mutual(
                    lut_rows, x0, x1, gains, sens_corr, params, blur_fn,
                    mesh=mesh,
                )
                D = fused(T_f, R_f, logL)
            else:
                from ..ops.kernels import csf_lut as _csf_lut

                # Under a sharded trace the Pallas LUT kernel cannot be
                # GSPMD-partitioned — route through the jnp hat-basis form.
                saved_force = _csf_lut.FORCE_JNP
                if mesh is not None:
                    _csf_lut.FORCE_JNP = True
                try:
                    S = self.csf.sensitivity_multi_channel(
                        [l[0] for l in luts], [l[1] for l in luts], logL,
                        [l[2] for l in luts],
                    )
                finally:
                    _csf_lut.FORCE_JNP = saved_force
                # (all_ch, B, 1, F, h, w) -> (B, all_ch, F, h, w)
                S = jnp.moveaxis(S, 0, 1)[:, :, 0] * sens_corr

                if is_baseband:
                    D = jnp.abs(T_f - R_f) * S
                else:
                    D = mk.apply_masking_model(T_f, R_f, S, params)

            Q_cols.append(
                mk.lp_norm(D, self.beta, dim=(-2, -1), normalize=True,
                           keepdim=False)
            )

            if self.do_heatmap:
                w_ch = jnp.asarray(per_ch_w).reshape(-1, 1, 1, 1) * t_int
                if is_baseband:
                    w_ch = w_ch * jnp.asarray(
                        self.baseband_weight[:all_ch]
                    ).reshape(-1, 1, 1, 1)
                D_chr = mk.lp_norm(D * w_ch, self.beta_tch, dim=-4,
                                   normalize=False)
                # Interior bands are stored at half gain (lpyr_dec.py:308-314).
                mul = 1.0 if (bb == 0 or is_baseband) else 2.0
                hm_bands[bb] = D_chr / mul

            if dump_D is not None:
                w_d = jnp.asarray(per_ch_w).reshape(-1, 1, 1, 1) * t_int
                mul_d = 1.0 if (bb == 0 or is_baseband) else 2.0
                dump_D.append(D * w_d / mul_d)

        Q_per_ch_block = jnp.stack(Q_cols, axis=-1)  # (B, C, F, bands)

        if self.do_heatmap:
            recon = self.heatmap_pyr.reconstruct(hm_bands)
            heatmap_block = 1.0 - mk.met2jod(recon, self.jod_a, self.jod_exp) / 10.0
        else:
            heatmap_block = None

        dump = None
        if self.dump_channels:
            dump = {"R": R, "bands": B_bands, "D_bands": dump_D}
        return Q_per_ch_block, heatmap_block, dump

    def do_pooling_and_jods(self, Q_per_ch):
        """Band/channel/frame pooling and JOD mapping (reference:
        cvvdp_metric.py:610-643). Q_per_ch is (B, C, F, bands)."""
        Q_per_ch = jnp.asarray(Q_per_ch)
        no_channels = Q_per_ch.shape[1]
        no_frames = Q_per_ch.shape[2]
        no_bands = Q_per_ch.shape[3]

        per_ch_w = jnp.asarray(self.get_ch_weights(no_channels)).reshape(1, -1, 1, 1)
        per_sband_w = np.ones((1, no_channels, 1, no_bands), np.float32)
        per_sband_w[:, :, 0, -1] = self.baseband_weight[:no_channels]
        per_sband_w = jnp.asarray(per_sband_w)

        Q_sc = mk.lp_norm(
            Q_per_ch * per_ch_w * per_sband_w, self.beta_sch, dim=3,
            normalize=False,
        )

        is_image = no_frames == 1
        t_int = self.image_int if is_image else 1.0

        if self.block_channels is not None:
            # Channel-ablation mask. NOTE: the reference indexes the *batch*
            # axis here (cvvdp_metric.py:631) — an upstream bug; we mask the
            # channel axis, which is the documented intent.
            keep = np.nonzero(self.block_channels[:no_channels])[0]
            Q_sc = Q_sc[:, keep]
        Q_tc = mk.lp_norm(Q_sc, self.beta_tch, dim=1, normalize=False)

        if is_image:
            Q = Q_tc * t_int
        else:
            Q = mk.lp_norm(Q_tc, self.beta_t, dim=2, normalize=True)

        Q = jnp.squeeze(Q)
        return self.met2jod(Q)

    def met2jod(self, Q):
        return mk.met2jod(Q, self.jod_a, self.jod_exp)

    # ------------------------------------------------------------------
    # Frame-buffer management (video streaming)

    @staticmethod
    def _get_symmetric_frame_index(frame_ind, frame_count):
        """Ping-pong mirror index for symmetric temporal padding (reference:
        cvvdp_metric.py:445-450)."""
        is_even = (math.floor((abs(frame_ind) - 1) / (frame_count - 1)) % 2) == 0
        if is_even:
            return ((abs(frame_ind) - 1) % (frame_count - 1)) + 1
        return frame_ind % (frame_count - 1)

    def _advance_frame_buffers(
        self, vid_source, fb, block_N_frames, met_colorspace, ff, cur, N_frames
    ):
        """Maintain the device-resident sliding-window buffers (reference:
        cvvdp_metric.py:490-548)."""
        fl = self.filter_len
        buf_len = fl + block_N_frames - 1

        def fetch(which, idx):
            if which == 0:
                return vid_source.get_test_frame(idx, colorspace=met_colorspace)
            return vid_source.get_reference_frame(idx, colorspace=met_colorspace)

        if ff == 0:
            new_frames = [[fetch(s, ff + fi) for fi in range(cur)] for s in (0, 1)]
            for s in (0, 1):
                frames = new_frames[s]
                if self.temp_padding == "replicate":
                    head = [frames[0]] * (fl - 1)
                elif self.temp_padding == "symmetric":
                    # Read ahead if the first block is shorter than the filter.
                    for fi in range(max(fl - cur, 0)):
                        fb["ra"][s].append(fetch(s, ff + cur + fi))
                    head = []
                    for fi in range(-fl + 1, 0):
                        pos = self._get_symmetric_frame_index(fi, N_frames)
                        if pos < cur:
                            head.append(frames[pos])
                        else:
                            head.append(fb["ra"][s][pos - cur])
                else:
                    raise RuntimeError(
                        f'Unknown padding method "{self.temp_padding}"'
                    )
                parts = head + frames
                if cur < block_N_frames:
                    pad = jnp.zeros_like(frames[0])
                    parts = parts + [pad] * (block_N_frames - cur)
                fb["sw"][s] = jnp.concatenate(parts, axis=2)
        else:
            for s in (0, 1):
                frames = []
                for fi in range(cur):
                    if fb["ra"][s]:
                        frames.append(fb["ra"][s].pop(0))
                    else:
                        frames.append(fetch(s, ff + fi))
                tail = fb["sw"][s][:, :, block_N_frames:]
                parts = [tail] + frames
                if cur < block_N_frames:
                    pad = jnp.zeros_like(frames[0])
                    parts = parts + [pad] * (block_N_frames - cur)
                fb["sw"][s] = jnp.concatenate(parts, axis=2)

    # ------------------------------------------------------------------
    # Reporting

    def full_name(self):
        return "ColorVideoVDP"

    def short_name(self):
        return "cvvdp"

    def quality_unit(self):
        return "JOD"

    def get_info_string(self):
        if self.display_name.startswith("standard_"):
            standard_str = self.display_name
        else:
            standard_str = f"custom-display: {self.display_name}"
        L_black, L_refl = self.display_photometry.get_black_level()
        return (
            f'"{self.full_name()} v{self.version}, '
            f"{self.pix_per_deg:.4g} [pix/deg], "
            f"Lpeak={self.display_photometry.get_peak_luminance():.5g}, "
            f"Lblack={L_black:.4g}, Lrefl={L_refl:.4g} [cd/m^2], "
            f'({standard_str})"'
        )

    def write_features_to_json(self, stats, dest_fname):
        """Per-band feature export for calibration (reference:
        cvvdp_metric.py:1112-1127)."""
        Q_per_ch = stats["Q_per_ch"]
        fmap = {}
        for key, value in stats.items():
            if key not in ("Q_per_ch", "heatmap"):
                fmap[key] = value.tolist() if isinstance(value, np.ndarray) else value
        for cc in range(Q_per_ch.shape[1]):
            for bb in range(Q_per_ch.shape[3]):
                fmap[f"t{cc}_b{bb}"] = Q_per_ch[:, cc, :, bb].tolist()
        with open(dest_fname, "w", encoding="utf-8") as f:
            json.dump(fmap, f, ensure_ascii=False, indent=4)

    def save_to_config(self, fname, comment):
        """Write current (possibly re-calibrated) parameters back to JSON
        (reference: cvvdp_metric.py:1129-1154)."""
        from datetime import date

        assert fname.endswith(".json"), "Please provide a .json file"
        parameters = json2dict(self.parameters_file)
        remap = {"csf": "csf_version"}
        for key in parameters:
            attr = remap.get(key, key)
            if isinstance(parameters[key], str) or isinstance(parameters[key], int):
                continue
            if not hasattr(self, attr):
                continue
            val = getattr(self, attr)
            if isinstance(parameters[key], float):
                parameters[key] = float(np.asarray(val))
            elif isinstance(parameters[key], list):
                parameters[key] = [float(x) for x in np.asarray(val).flatten()]
        parameters["__comment"] = comment
        parameters["calibration_date"] = date.today().strftime("%d/%m/%Y")
        with open(fname, "w") as f:
            json.dump(parameters, f, indent=4)

    def export_distogram(self, stats, fname, jod_max=None, base_size=6):
        from ..viz import export_distogram

        export_distogram(self, stats, fname, jod_max=jod_max, base_size=base_size)

register_metric(cvvdp)
