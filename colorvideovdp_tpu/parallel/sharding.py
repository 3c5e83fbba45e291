"""Multi-chip scaling via jax.sharding: batch (clips) x space (image rows).

The metric has no gradient/weight exchange — the only cross-chip traffic is
conv halos from the pyramid/blur (a few pixels per level) and the final
pooling reductions (scalars), exactly the structure described in SURVEY.md
§5.7/§5.8. We express the whole pipeline once and let GSPMD insert the
collectives:

* ``batch`` axis: independent image pairs / clips (data parallel, DCN-safe).
* ``space`` axis: image height H (ICI): halo exchange for the 5-tap pyramid
  kernels, psum for the spatial p-norms.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, batch: int | None = None):
    """Build a (batch, space) mesh over the available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if batch is None:
        # Prefer spatial sharding; give batch parallelism any power-of-two
        # excess beyond 4-way spatial.
        batch = max(1, n // 4)
    space = n // batch
    arr = np.array(devs[: batch * space]).reshape(batch, space)
    return Mesh(arr, ("batch", "space"))


def image_pair_sharding(mesh: Mesh):
    """Sharding for raw frame-major blocks (B, F, C, H, W): batch over B,
    space over H."""
    return NamedSharding(mesh, P("batch", None, None, "space", None))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_scoring_fn(metric, vid_source, met_colorspace, raw_shape, dtype,
                     mesh: Mesh):
    """Compile the fused image-scoring step with multi-chip shardings.

    Returns a jitted fn(raw_t, raw_r) -> (Q_per_ch, heatmap, context, dump)
    whose inputs are (flattened) raw frame blocks laid out by
    ``image_pair_sharding``.
    """
    dm = vid_source.dm_photometry

    # The fused Pallas kernels stay enabled and run per shard via shard_map
    # (the same route the sharded VIDEO step uses,
    # metrics/cvvdp.py:_process_block) — VERDICT r2 measured the
    # kernel-less trace at 2.03x the fused step at 1080p. Batched pairs
    # ride the kernels' folded (C, B*F, H, W) layout with the L dim
    # sharded over "batch" (each device owns whole pairs), provided B
    # divides the batch axis. Heatmap traces keep the pure-XLA path.
    n_sp = int(mesh.shape["space"])
    n_b = int(mesh.shape["batch"])
    use_kernels = (
        int(raw_shape[0]) % n_b == 0
        and not metric.do_heatmap
        and getattr(metric, "enable_fused_kernels", True)
    )

    def _reshard_hint(x):
        if x.shape[-2] >= 8 * n_sp:
            spec = P("batch", None, None, "space", None)
        else:
            spec = P("batch")
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def fn(raw_t, raw_r):
        # GSPMD cannot partition Pallas custom calls: either wrap them in
        # shard_map (use_kernels) or trace the pure-XLA path. Flags are
        # restored after tracing — sharded use must not disable the fused
        # kernels for later single-chip scoring on the same metric object.
        from ..ops import pyramid as _pyr

        saved = getattr(metric, "enable_fused_kernels", True)
        saved_mesh = getattr(metric, "sharding_mesh", None)
        saved_hint = metric.lpyr.reshard_hint
        saved_red = _pyr.FORCE_XLA
        saved_ctx = _pyr.SHARD_CTX
        if use_kernels:
            metric.sharding_mesh = mesh
            metric.lpyr.reshard_hint = _reshard_hint
            _pyr.SHARD_CTX = (
                mesh, "batch" if "batch" in mesh.axis_names else None,
                getattr(metric, "force_fused", False))
        else:
            metric.enable_fused_kernels = False
        _pyr.FORCE_XLA = True
        try:
            # Inputs arrive shaped (B, F, C, H, W); reshape(shape) is a no-op
            # that keeps the named sharding intact.
            T = metric._flat_to_met(dm, raw_t, raw_shape, met_colorspace,
                                    vid_source)
            R = metric._flat_to_met(dm, raw_r, raw_shape, met_colorspace,
                                    vid_source)
            import jax.numpy as jnp

            # Concatenate T/R along the channel axis (no interleave
            # stack+reshape here: GSPMD handles concat on an unsharded axis
            # without resharding the 'space'-sharded H) and interleave with a
            # cheap gather on the tiny channel axis instead.
            B, C, F, H, W = T.shape
            TR = jnp.concatenate([T, R], axis=1)  # (B, 2C, F, H, W)
            idx = jnp.arange(2 * C) // 2 + (jnp.arange(2 * C) % 2) * C
            Rfull = jnp.take(TR, idx, axis=1)
            Q, hm, dump = metric._process_block(Rfull, temp_ch=1,
                                                is_image=True)
            return Q, hm
        finally:
            metric.enable_fused_kernels = saved
            metric.sharding_mesh = saved_mesh
            metric.lpyr.reshard_hint = saved_hint
            _pyr.FORCE_XLA = saved_red
            _pyr.SHARD_CTX = saved_ctx

    in_sh = image_pair_sharding(mesh)
    out_sh = replicated(mesh)
    return jax.jit(fn, in_shardings=(in_sh, in_sh),
                   out_shardings=(out_sh, out_sh))


def video_block_sharding(mesh: Mesh):
    """Sharding for (B, C/F, F/C, H, W) video buffers: batch over B, space
    over H (image rows)."""
    return NamedSharding(mesh, P("batch", None, None, "space", None))


def shard_video_fn(metric, vid_source, met_colorspace, raw_shape, dtype,
                   mesh: Mesh, first: bool):
    """Compile the fused video block step with multi-chip shardings.

    The whole per-block pipeline — dtype ladder, display model, temporal FIR,
    contrast pyramid, CSF, masking, pooling — is traced once with the H axis
    sharded over the mesh's "space" axis and B over "batch". GSPMD inserts
    the row-halo exchanges for the pyramid/blur convolutions and psums for
    the spatial pooling (SURVEY §5.7/§5.8); the fused Pallas masking kernels
    stay enabled and are re-issued per shard through shard_map
    (``metric.sharding_mesh``), since XLA cannot partition a custom call.

    Returns a jitted fn with the same signature as the single-chip
    ``_get_video_step`` fast path: ``fn(raw_t, raw_r)`` for the first
    (replicate-padded) block, ``fn(tail_t, tail_r, raw_t, raw_r)`` after,
    where raw blocks are shaped (B, F, C, H, W) and tails are DKL
    (B, 3, fl-1, H, W), all row-sharded. Outputs: (Q_per_ch, tail_t, tail_r).
    """
    import jax.numpy as jnp

    from ..ops.temporal import apply_temporal_filters

    dm = vid_source.dm_photometry
    filt = np.stack([f[::-1] for f in metric.F])
    fl = metric.filter_len

    n_sp = int(mesh.shape["space"])
    n_b = int(dict(mesh.shape).get("batch", 1))
    bax = "batch" if "batch" in mesh.axis_names else None

    def _reshard_hint(x):
        # Row-shard levels while each device still gets >= 8 rows; replicate
        # the (KB-sized) deeper levels — GSPMD otherwise falls back to
        # "involuntary full rematerialization" resharding them.
        if x.shape[-2] >= 8 * n_sp:
            spec = P("batch", None, None, "space", None)
        else:
            spec = P("batch")
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    import contextlib

    @contextlib.contextmanager
    def _mesh_ctx():
        from ..ops import pyramid as _pyr

        saved_mesh = getattr(metric, "sharding_mesh", None)
        saved_hint = metric.lpyr.reshard_hint
        saved_red = _pyr.FORCE_XLA
        saved_ctx = _pyr.SHARD_CTX
        metric.sharding_mesh = mesh
        metric.lpyr.reshard_hint = _reshard_hint
        _pyr.FORCE_XLA = True
        _pyr.SHARD_CTX = (mesh, bax, getattr(metric, "force_fused", False))
        try:
            yield
        finally:
            metric.sharding_mesh = saved_mesh
            metric.lpyr.reshard_hint = saved_hint
            _pyr.FORCE_XLA = saved_red
            _pyr.SHARD_CTX = saved_ctx

    def core(T_buf, R_buf):
        with _mesh_ctx():
            blk = T_buf.shape[2] - (fl - 1)
            T4 = apply_temporal_filters(T_buf, filt)
            R4 = apply_temporal_filters(R_buf, filt)
            Rfull = metric._interleave_tr(T4, R4)
            Q, _hm, _dump = metric._process_block(Rfull, temp_ch=2,
                                                  is_image=False)
            return Q, T_buf[:, :, blk:], R_buf[:, :, blk:]

    v_sh = video_block_sharding(mesh)
    out_sh = replicated(mesh)

    # Fused Pallas ingest under the mesh: the kernel is row-local (dtype
    # ladder + EOTF + DKL + temporal FIR + interleave touch no neighbour
    # rows), so it shard_maps over row slabs with no collectives — the
    # sharded video step otherwise pays the full-size XLA ingest chain
    # the single-chip path eliminated (VERDICT r4 item 4).
    from ..ops.kernels import ingest as _ingest

    H, W = int(raw_shape[-2]), int(raw_shape[-1])
    B = int(raw_shape[0])
    H_loc = H // n_sp if H % n_sp == 0 else 0
    use_ingest = (
        getattr(metric, "enable_fused_kernels", True)
        and (jax.default_backend() == "tpu"
             or getattr(metric, "force_fused", False))
        and not hasattr(vid_source, "unpack_raw_block")
        and len(raw_shape) == 5 and int(raw_shape[2]) == 3
        and (not first or metric.temp_padding == "replicate")
        and B % max(n_b, 1) == 0 and B // max(n_b, 1) == 1
        and H_loc >= 8 and W >= 128
        and _ingest.supports(dm, met_colorspace, dtype)
        and _ingest.pick_tiles(dtype, int(raw_shape[1]), fl, H_loc, W)
        is not None
    )
    if use_ingest:
        from jax import shard_map

        loc_shape = (1, int(raw_shape[1]), 3, H_loc, W)
        mode = "replicate" if first else "tail"
        ing = _ingest.make_ingest_fn(dm, dtype, loc_shape, filt, fl, mode)
        s5 = P(bax, None, None, "space", None)
        n_in = 2 if first else 4
        ing_sm = shard_map(ing, mesh=mesh, in_specs=(s5,) * n_in,
                           out_specs=(s5, s5, s5), check_vma=False)

        if first:

            def fn(raw_t, raw_r):
                Rfull, t_t, t_r = ing_sm(raw_t.reshape(raw_shape),
                                         raw_r.reshape(raw_shape))
                with _mesh_ctx():
                    Q, _hm, _dump = metric._process_block(
                        Rfull, temp_ch=2, is_image=False)
                return Q, t_t, t_r

            return jax.jit(fn, in_shardings=(v_sh, v_sh),
                           out_shardings=(out_sh, v_sh, v_sh))

        def fn(tail_t, tail_r, raw_t, raw_r):
            Rfull, t_t, t_r = ing_sm(tail_t, tail_r,
                                     raw_t.reshape(raw_shape),
                                     raw_r.reshape(raw_shape))
            with _mesh_ctx():
                Q, _hm, _dump = metric._process_block(
                    Rfull, temp_ch=2, is_image=False)
            return Q, t_t, t_r

        return jax.jit(fn, in_shardings=(v_sh, v_sh, v_sh, v_sh),
                       out_shardings=(out_sh, v_sh, v_sh))

    if first:

        def fn(raw_t, raw_r):
            T_new = metric._flat_to_met(dm, raw_t, raw_shape, met_colorspace,
                                        vid_source)
            R_new = metric._flat_to_met(dm, raw_r, raw_shape, met_colorspace,
                                        vid_source)
            B, C, _, H, W = T_new.shape
            head_t = jnp.broadcast_to(T_new[:, :, 0:1], (B, C, fl - 1, H, W))
            head_r = jnp.broadcast_to(R_new[:, :, 0:1], (B, C, fl - 1, H, W))
            return core(jnp.concatenate([head_t, T_new], axis=2),
                        jnp.concatenate([head_r, R_new], axis=2))

        return jax.jit(fn, in_shardings=(v_sh, v_sh),
                       out_shardings=(out_sh, v_sh, v_sh))

    def fn(tail_t, tail_r, raw_t, raw_r):
        T_new = metric._flat_to_met(dm, raw_t, raw_shape, met_colorspace,
                                    vid_source)
        R_new = metric._flat_to_met(dm, raw_r, raw_shape, met_colorspace,
                                    vid_source)
        return core(jnp.concatenate([tail_t, T_new], axis=2),
                    jnp.concatenate([tail_r, R_new], axis=2))

    # Tails not donated: output-onto-input aliasing makes XLA insert
    # full-tensor hazard copies (docs/step_profile.md).
    return jax.jit(fn, in_shardings=(v_sh, v_sh, v_sh, v_sh),
                   out_shardings=(out_sh, v_sh, v_sh))
