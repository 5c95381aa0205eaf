"""Pallas TPU kernel: fused multi-level RoIAlign.

The XLA fast path (``roi_align.multilevel_roi_align_fast``) materialises a
``(R, win, win, C)`` window tensor in HBM (~0.6 GB at train shapes) before
the interpolation matmuls.  This kernel fuses the whole pipeline per RoI —
window DMA (HBM->VMEM, double-buffered), two interpolation matmuls on the
MXU, 2x2 bin pooling — so each window is read once and never written back.

Inputs are prepared host/XLA-side (level routing, window origins, per-RoI
interpolation matrices); the kernel consumes:
  * ``stacked``  (sumH + win, maxW, C)   feature pyramid, rows stacked
  * ``row0``     (R,) int32              window start row (level offset incl.)
  * ``x0``       (R,) int32              window start column
  * ``wy``       (R, out*s, win)         row-interpolation matrices
  * ``wx``       (R, out*s, win_w)       column-interpolation matrices
and produces ``(R, out, out, C)`` pooled features.

Grid: one program; RoIs processed in a ``fori_loop`` with two DMA slots so
roi i+1's window streams in while roi i computes (double-buffering pattern
from the Pallas guide).

Alignment note: Mosaic requires the dynamic column (sublane) offset of the
window DMA to be *provably* divisible by the sublane tiling (8 for f32, 16
for bf16) — "Failed to prove that a tile index in dimension 1 is divisible
by the tiling (8)" otherwise.  The kernel therefore receives ``x0 // ALIGN``
as its prefetch scalar and multiplies by ALIGN inside, the DMA window is one
align-unit wider, and the column-interpolation matrix is shifted by
``x0 % ALIGN`` host-side so the sampled cells (and all boundary clamps) stay
bitwise-identical to ``multilevel_roi_align_fast``.  Row offsets need no
alignment (dimension 0 of the memref is untiled).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

try:  # pallas import kept lazy-safe for environments without Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


_NBUF = 4  # forward window DMA pipeline depth (~2 MB VMEM at 24x40x256 bf16)


def _kernel(out_size: int, win: int, win_w: int, align: int,
            row0_ref, x0a_ref, wy_ref, wx_ref, stacked_ref, out_ref):
    """wy/wx carry the 2x2 bin pooling pre-folded: (R, out, win[_w]).
    Output layout (R, out_x, out_y, C) keeps C on the 128-lane axis; the
    cheap x/y transpose to (R, out_y, out_x, C) happens in XLA outside.
    ``x0a_ref`` holds the window column origin divided by ``align`` so the
    in-kernel offset ``x0a * align`` is provably sublane-aligned.

    The window DMAs are ~0.5 MB each against ~1 us of MXU work, so the
    loop is DMA-latency-bound: ``_NBUF`` windows stay in flight (depth-2
    double buffering measured 8.6 ms at the flagship train geometry,
    leaving ~3x the HBM-traffic floor on the table)."""
    r = out_ref.shape[0]
    c = out_ref.shape[-1]

    def body(scratch, sems):
        def get_dma(slot, i):
            return pltpu.make_async_copy(
                stacked_ref.at[
                    pl.ds(row0_ref[i], win), pl.ds(x0a_ref[i] * align, win_w), :
                ],
                scratch.at[slot],
                sems.at[slot],
            )

        for j in range(min(_NBUF - 1, r)):  # static unroll: fill the pipe
            get_dma(j, j).start()

        def loop(i, _):
            slot = i % _NBUF

            @pl.when(i + _NBUF - 1 < r)
            def _():
                get_dma((i + _NBUF - 1) % _NBUF, i + _NBUF - 1).start()

            get_dma(slot, i).wait()
            window = scratch[slot]  # (win, win_w, C)
            wy = wy_ref[i]  # (out, win)
            wx = wx_ref[i]  # (out, win_w)
            # rows: (out, win) @ (win, win_w*C) -> (out, win_w, C)
            t = jax.lax.dot_general(
                wy, window.reshape(win, win_w * c),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(out_size, win_w, c)
            # cols: contract win_w -> (out_x, out_y, C); C stays on lanes
            sampled = jax.lax.dot_general(
                wx, t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[i] = sampled.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, r, loop, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM(
            (_NBUF, win, win_w, stacked_ref.shape[-1]), stacked_ref.dtype),
        sems=pltpu.SemaphoreType.DMA((_NBUF,)),
    )


def _sublane_align(dtype) -> int:
    """Sublane tiling: 8 rows for 4-byte types, 16 for 2-byte (bf16)."""
    return 8 if jnp.dtype(dtype).itemsize >= 4 else 16


def pallas_window_roi_align(
    stacked: jnp.ndarray,  # (sumH + win, maxW + align, C)
    row0: jnp.ndarray,  # (R,) int32
    x0: jnp.ndarray,  # (R,) int32  unaligned window column origin
    wy: jnp.ndarray,  # (R, out*s, win)
    wx: jnp.ndarray,  # (R, out*s, win_w)
    out_size: int = 7,
    s: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    assert _HAS_PALLAS, "pallas unavailable"
    r = row0.shape[0]
    c = stacked.shape[-1]
    # fold 2x2 bin pooling into the interpolation matrices
    pool = jnp.repeat(jnp.eye(out_size, dtype=wy.dtype), s, axis=1) / s
    wy = jnp.einsum("ok,rkw->row", pool, wy)
    wx = jnp.einsum("ok,rkw->row", pool, wx)
    win = wy.shape[-1]
    win_w = wx.shape[-1]
    # Mosaic alignment: DMA column origin must be provably divisible by the
    # sublane tiling.  Align the origin down, widen the window by one align
    # unit, and shift the interp-matrix columns by the residue host-side so
    # the referenced feature cells are unchanged.
    align = _sublane_align(stacked.dtype)
    x0a = x0 // align
    shift = (x0 - x0a * align).astype(jnp.int32)  # [0, align)
    win_w_dma = win_w + align
    cols = shift[:, None, None] + jnp.arange(win_w)[None, None, :]
    onehot = jax.nn.one_hot(cols, win_w_dma, dtype=wx.dtype)  # (R, 1, w, W)
    wx = jnp.einsum("row,rwW->roW", wx, onehot[:, 0])
    kern = functools.partial(_kernel, out_size, win, win_w_dma, align)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((r, out_size, out_size, c), stacked.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # row0, x0//align drive the DMAs
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # wy (small)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # wx
                pl.BlockSpec(memory_space=pl.ANY),  # stacked stays in HBM
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(row0, x0a, wy, wx, stacked)
    return out.transpose(0, 2, 1, 3)  # (R, out_y, out_x, C)


def multilevel_roi_align_pallas(
    feats: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    roi_valid: jnp.ndarray,
    strides: Sequence[int],
    out_size: int = 7,
    sample_num: int = 2,
    finest_scale: int = 56,
    num_route_levels: int | None = None,
    win: int = 24,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ``multilevel_roi_align_fast`` backed by the
    fused Pallas kernel (same geometry preparation, no window tensor).

    Channel counts that are not lane-aligned (C % 128 != 0 — shrunken dev
    models) fall back to the XLA path: the kernel's (win, W, C) ->
    (win, W*C) view is only a relayout-free Mosaic shape cast when C is a
    multiple of the 128-lane tile (observed: Mosaic rejects C=32 with
    'infer-vector-layout: unsupported shape cast')."""
    import numpy as np

    from .roi_align import _interp_matrix, map_roi_levels, multilevel_roi_align_fast

    if feats[0].shape[-1] % 128:
        return multilevel_roi_align_fast(
            feats, rois, roi_valid, strides, out_size=out_size,
            sample_num=sample_num, finest_scale=finest_scale,
            num_route_levels=num_route_levels, win=win,
        )

    nl = num_route_levels or len(feats)
    c = feats[0].shape[-1]
    s = sample_num
    max_w = max(f.shape[1] for f in feats[:nl])
    win_w = min(win, max_w)
    rows, row_off, acc = [], [], 0
    # pad one extra sublane-align unit of columns so the aligned, widened
    # window DMA never reads out of bounds
    from jax.numpy import dtype as _jdt  # noqa: F401

    pad_w = max_w + _sublane_align(feats[0].dtype)
    for f in feats[:nl]:
        h, w, _ = f.shape
        rows.append(jnp.pad(f, ((0, 0), (0, pad_w - w), (0, 0))))
        row_off.append(acc)
        acc += h
    rows.append(jnp.zeros((win, pad_w, c), feats[0].dtype))
    stacked = jnp.concatenate(rows, axis=0)
    row_off = jnp.asarray(row_off, jnp.int32)
    hs = jnp.asarray([f.shape[0] for f in feats[:nl]], jnp.int32)
    ws = jnp.asarray([f.shape[1] for f in feats[:nl]], jnp.int32)

    lvl = map_roi_levels(rois, nl, finest_scale)
    inv_strides = jnp.asarray([1.0 / strides[i] for i in range(nl)], jnp.float32)
    scale = inv_strides[lvl]
    x1 = rois[:, 0] * scale - 0.5
    y1 = rois[:, 1] * scale - 0.5
    bin_w = (rois[:, 2] * scale - 0.5 - x1) / out_size
    bin_h = (rois[:, 3] * scale - 0.5 - y1) / out_size
    wy0 = jnp.clip(jnp.floor(y1).astype(jnp.int32), 0, jnp.maximum(hs[lvl] - win, 0))
    wx0 = jnp.clip(jnp.floor(x1).astype(jnp.int32), 0, jnp.maximum(ws[lvl] - win_w, 0))
    row0 = row_off[lvl] + wy0
    hi_y = jnp.minimum(jnp.float32(win - 1), (hs[lvl] - 1 - wy0).astype(jnp.float32))
    hi_x = jnp.minimum(jnp.float32(win_w - 1), (ws[lvl] - 1 - wx0).astype(jnp.float32))
    wy = _interp_matrix(y1, bin_h, wy0.astype(jnp.float32), hi_y, out_size, s, win)
    wx = _interp_matrix(x1, bin_w, wx0.astype(jnp.float32), hi_x, out_size, s, win_w)
    pooled = pallas_window_roi_align(
        stacked, row0, wx0, wy.astype(stacked.dtype), wx.astype(stacked.dtype),
        out_size=out_size, s=s, interpret=interpret,
    )
    return pooled * roi_valid[:, None, None, None].astype(pooled.dtype)


def _bwd_kernel(out_size: int, win: int, win_w: int, align: int,
                cc_size: int, n_chunks: int, row_splits, r1p: int,
                row0_ref, x0a_ref, bounds_ref, idx_ref, wpk_ref,
                g_ref, out_ref):
    """RoIAlign backward wrt features (round-3 train-path lever).

    The transpose of R vmapped dynamic_slice gathers is an XLA scatter —
    measured at ~57ms of the 172ms train step (docs/TRAIN_PERF.md).  Here
    the scatter becomes sequential VMEM accumulation: per (row-range,
    channel-chunk) pass, zero an accumulator in VMEM, stream the pooled
    cotangents (double-buffered DMA), turn each RoI's (out, out) cotangent
    into its (win, win_w) window gradient with two MXU contractions, and
    add it at the RoI's dynamic (row, aligned-column) offset.  One DMA
    writes each pass out; no HBM read-modify-write ever happens.

    Mosaic legality: contractions are strictly 2-D with minor-dims
    collapses of (x, cc_size=128) only, with small explicit transposes in
    between; ``cc_size`` must be a multiple of 128 (or the full C).

    ``row_splits``: static (start, length) pairs partitioning the stacked
    rows; windows never straddle a level boundary (window origins are
    clamped inside their level when H_l >= win, and clamped-to-zero
    interpolation weights make any overhang rows all-zero), so the split
    at the level-0 boundary is exact.  The caller sorts the RoIs by the
    pass that owns their window and passes (a) the per-pass [lo, hi)
    ``bounds_ref`` (n_passes + 1 scalars) and (b) the sorted order itself
    as the prefetched ``idx_ref`` permutation — the kernel visits RoIs in
    pass order via *indexed DMA* out of the unpermuted ``g_ref``, so the
    caller never materializes ``g[order]`` (a 100-200 MB HBM gather at
    train geometry, ~4 ms of pure copies — round-4 trace).  Each pass
    loops only over its own RoIs — R * n_chunks sequential iterations
    total (the loop, not the MXU work, dominates this kernel).
    ``g_ref`` (n_chunks, R, out_y, out_x, cc) f32 in HBM (a bf16 g would
    tile sublanes in (2,1)-packed pairs and Mosaic rejects the per-RoI
    slice — see the callers); ``wpk_ref`` (R, rows_pk, 128) the
    ``_pack_rowwise``-packed
    interp matrices, streamed per-RoI out of HBM like the forward's
    (whole-array VMEM staging of the lane-padded matrices costs ~8 MB
    each at 4096 RoIs); ``out_ref`` (rows, Wpad, C) f32 in HBM — written
    via per-pass row slices + 128-aligned lane-dim slices, so the caller
    needs no chunk-axis transpose on the dense output.
    """

    def body(acc, gbuf, wbuf, g_sems, w_sems, out_sem):
        for p_idx, (p_start, p_len) in enumerate(row_splits):
            lo = bounds_ref[p_idx]
            hi = bounds_ref[p_idx + 1]
            for cc in range(n_chunks):  # static unroll

                def get_dma(slot, i, cc=cc):
                    # indexed DMA: i is the loop position, idx_ref[i] the
                    # RoI.  g is channel-pre-chunked host-side to
                    # (n_chunks, R, out, out, cc) so only untiled leading
                    # dims are indexed (a lane-dim slice of (R, out, out,
                    # C) would be legal, but the out_x sublane dim — 7,
                    # padded to 8 in storage — cannot be partially
                    # sliced: Mosaic 'Slice shape along dimension 2 must
                    # be aligned to tiling (8)').
                    return pltpu.make_async_copy(
                        g_ref.at[cc, idx_ref[i]],
                        gbuf.at[slot],
                        g_sems.at[slot],
                    )

                def getw_dma(slot, i):
                    return pltpu.make_async_copy(
                        wpk_ref.at[idx_ref[i]], wbuf.at[slot],
                        w_sems.at[slot])

                acc[...] = jnp.zeros_like(acc)

                for j in range(_NBUF - 1):  # static unroll: fill the pipe

                    @pl.when(lo + j < hi)
                    def _(j=j):
                        get_dma((lo + j) % _NBUF, lo + j).start()
                        getw_dma((lo + j) % _NBUF, lo + j).start()

                def roi_loop(i, _):
                    slot = i % _NBUF
                    ri = idx_ref[i]

                    @pl.when(i + _NBUF - 1 < hi)
                    def _():
                        get_dma(
                            (i + _NBUF - 1) % _NBUF, i + _NBUF - 1).start()
                        getw_dma(
                            (i + _NBUF - 1) % _NBUF, i + _NBUF - 1).start()

                    get_dma(slot, i).wait()
                    getw_dma(slot, i).wait()
                    r0 = row0_ref[ri]
                    # sorted RoIs make this guard vacuous; kept as a
                    # correctness belt (an out-of-pass window must never
                    # write outside the accumulator)
                    in_pass = jnp.logical_and(
                        r0 >= p_start, r0 < p_start + p_len)

                    @pl.when(in_pass)
                    def _():
                        wpk = wbuf[slot]
                        wy = wpk[0:out_size, 0:win]
                        wx = wpk[r1p:r1p + out_size, 0:win_w]
                        # Contract ox first, then oy, so the result lands
                        # directly in (win, win_w, cc) layout — the only
                        # transposes are of (out, out, cc) and
                        # (out, win_w, cc) tiles, not the (win_w, win, cc)
                        # window (3.4x less VPU shuffle per RoI than the
                        # oy-first order).
                        g3 = jnp.transpose(
                            gbuf[slot].astype(jnp.float32), (1, 0, 2))
                        # v[m, oy*cc] = sum_ox wx[ox,m] g3[ox, oy*cc]
                        v = jax.lax.dot_general(
                            wx.astype(jnp.float32),
                            g3.reshape(out_size, out_size * cc_size),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (win_w, oy*cc)
                        v3 = jnp.transpose(
                            v.reshape(win_w, out_size, cc_size), (1, 0, 2))
                        # dwin[k, m*cc] = sum_oy wy[oy,k] v3[oy, m*cc]
                        dwin = jax.lax.dot_general(
                            wy.astype(jnp.float32),
                            v3.reshape(out_size, win_w * cc_size),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).reshape(win, win_w, cc_size)
                        rl = r0 - p_start
                        c0 = x0a_ref[ri] * align
                        cur = acc[pl.ds(rl, win), pl.ds(c0, win_w), :]
                        acc[pl.ds(rl, win), pl.ds(c0, win_w), :] = cur + dwin

                    return 0

                jax.lax.fori_loop(lo, hi, roi_loop, 0)
                cpo = pltpu.make_async_copy(
                    acc.at[pl.ds(0, p_len)],
                    out_ref.at[pl.ds(p_start, p_len),
                               pl.ds(0, out_ref.shape[1]),
                               pl.ds(cc * cc_size, cc_size)],
                    out_sem,
                )
                cpo.start()
                cpo.wait()

    max_len = max(p[1] for p in row_splits)
    pl.run_scoped(
        body,
        # out_ref is (rows, Wpad, C): dim 1 is the padded width
        acc=pltpu.VMEM((max_len, out_ref.shape[1], cc_size), jnp.float32),
        gbuf=pltpu.VMEM((_NBUF, out_size, out_size, cc_size), g_ref.dtype),
        wbuf=pltpu.VMEM((_NBUF,) + wpk_ref.shape[1:], wpk_ref.dtype),
        g_sems=pltpu.SemaphoreType.DMA((_NBUF,)),
        w_sems=pltpu.SemaphoreType.DMA((_NBUF,)),
        out_sem=pltpu.SemaphoreType.DMA,
    )


_ACC_BUDGET_BYTES = 13 * 2**20  # VMEM accumulator cap (of ~16MB/core)


def pallas_window_roi_align_bwd(
    g: jnp.ndarray,  # (R, out_y, out_x, C) cotangent of the pooled output
    stacked_shape,  # (rows, Wpad, C) of the (padded) stacked pyramid
    row0: jnp.ndarray,
    x0: jnp.ndarray,
    wy: jnp.ndarray,  # (R, out*s, win) raw interp matrices (pre pool-fold)
    wx: jnp.ndarray,  # (R, out*s, win_w)
    stacked_dtype,
    h0: int,  # level-0 height in stacked rows (the exact split point)
    out_size: int = 7,
    s: int = 2,
    interpret: bool = False,
):
    """dStacked (f32) for the window RoIAlign — the sequential-accumulation
    Pallas kernel above; host prep mirrors the forward exactly.  Returns
    ``None`` when the geometry admits no VMEM-fitting accumulator split
    (caller falls back to the XLA VJP)."""
    assert _HAS_PALLAS, "pallas unavailable"
    rows, wpad, c = stacked_shape
    pool = jnp.repeat(jnp.eye(out_size, dtype=wy.dtype), s, axis=1) / s
    wy = jnp.einsum("ok,rkw->row", pool, wy)
    wx = jnp.einsum("ok,rkw->row", pool, wx)
    win = wy.shape[-1]
    win_w = wx.shape[-1]
    align = _sublane_align(stacked_dtype)
    x0a = x0 // align
    shift = (x0 - x0a * align).astype(jnp.int32)
    win_w_dma = win_w + align
    cols = shift[:, None, None] + jnp.arange(win_w)[None, None, :]
    onehot = jax.nn.one_hot(cols, win_w_dma, dtype=wx.dtype)
    wx = jnp.einsum("row,rwW->roW", wx, onehot[:, 0])

    # Mosaic-legal minor-dims collapses need lane-aligned chunks
    cc_size = min(128, c)
    if c % cc_size or (cc_size % 128 and cc_size != c):
        return None
    n_chunks = c // cc_size

    def acc_bytes(n_rows):
        return n_rows * wpad * cc_size * 4

    if acc_bytes(rows) <= _ACC_BUDGET_BYTES:
        row_splits = ((0, rows),)
    elif h0 >= win and acc_bytes(max(h0, rows - h0)) <= _ACC_BUDGET_BYTES:
        # windows never straddle the level-0 boundary when H0 >= win
        row_splits = ((0, h0), (h0, rows - h0))
    else:
        return None

    wpk, r1p = _pack_rowwise(wy, wx)
    kern = functools.partial(
        _bwd_kernel, out_size, win, win_w_dma, align, cc_size, n_chunks,
        row_splits, r1p)
    r = g.shape[0]
    # Sort RoIs by the pass (row split) that owns their window so the
    # kernel's sequential loop visits each RoI once per channel chunk
    # (addition commutes; the permutation needs no undo — outputs are
    # dense row gradients, not per-RoI values).  The permutation travels
    # as the prefetched ``order`` index array; g/wy/wx stay unpermuted
    # (the kernel's indexed DMA replaces a large host-side gather).
    if len(row_splits) > 1:
        starts = [p[0] for p in row_splits]
        pass_id = sum(
            (row0 >= s).astype(jnp.int32) for s in starts[1:])
        order = jnp.argsort(pass_id).astype(jnp.int32)
        bounds = jnp.searchsorted(
            pass_id[order], jnp.arange(len(row_splits) + 1))
    else:
        order = jnp.arange(r, dtype=jnp.int32)
        bounds = jnp.asarray([0, r])
    bounds = bounds.astype(jnp.int32)
    # channel chunks as a leading (untiled) dim so every DMA slice is
    # tile-aligned; stays in the cotangent's own dtype (bf16 halves the
    # stream; the kernel accumulates f32 regardless)
    # f32, not the cotangent's own dtype: a bf16 g would tile sublanes in
    # (2,1)-packed pairs, and Mosaic rejects the (out, out, cc) per-RoI DMA
    # slice ('Slice shape along dimension 3 must be aligned to tiling (8),
    # but is 7'); f32 full-logical-extent slices are legal.
    g5 = g.reshape(r, out_size, out_size, n_chunks, cc_size).transpose(
        3, 0, 1, 2, 4).astype(jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, wpad, c), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # row0, x0//align, per-pass bounds, roi visit order
            num_scalar_prefetch=4,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # packed wy|wx, per-RoI
                pl.BlockSpec(memory_space=pl.ANY),  # g stays in HBM
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
        ),
        interpret=interpret,
    )(row0, x0a, bounds, order, wpk, g5)
    return out


def multilevel_roi_align_pallas_bwd(
    feats, rois, roi_valid, g, strides, out_size=7, sample_num=2,
    finest_scale=56, num_route_levels=None, win: int = 24,
    interpret=False,
):
    """d_feats for ``multilevel_roi_align_pallas`` — full host-side
    geometry prep (identical to the forward) + the backward kernel +
    un-stacking of the pyramid gradient."""
    from .roi_align import _interp_matrix, map_roi_levels

    nl = num_route_levels or len(feats)
    c = feats[0].shape[-1]
    s = sample_num
    max_w = max(f.shape[1] for f in feats[:nl])
    win_w = min(win, max_w)
    align = _sublane_align(feats[0].dtype)
    pad_w = max_w + align
    row_off, acc = [], 0
    for f in feats[:nl]:
        row_off.append(acc)
        acc += f.shape[0]
    rows_total = acc + win
    row_off = jnp.asarray(row_off, jnp.int32)
    hs = jnp.asarray([f.shape[0] for f in feats[:nl]], jnp.int32)
    ws = jnp.asarray([f.shape[1] for f in feats[:nl]], jnp.int32)

    lvl = map_roi_levels(rois, nl, finest_scale)
    inv_strides = jnp.asarray([1.0 / strides[i] for i in range(nl)], jnp.float32)
    scale = inv_strides[lvl]
    x1 = rois[:, 0] * scale - 0.5
    y1 = rois[:, 1] * scale - 0.5
    bin_w = (rois[:, 2] * scale - 0.5 - x1) / out_size
    bin_h = (rois[:, 3] * scale - 0.5 - y1) / out_size
    wy0 = jnp.clip(jnp.floor(y1).astype(jnp.int32), 0, jnp.maximum(hs[lvl] - win, 0))
    wx0 = jnp.clip(jnp.floor(x1).astype(jnp.int32), 0, jnp.maximum(ws[lvl] - win_w, 0))
    row0 = row_off[lvl] + wy0
    hi_y = jnp.minimum(jnp.float32(win - 1), (hs[lvl] - 1 - wy0).astype(jnp.float32))
    hi_x = jnp.minimum(jnp.float32(win_w - 1), (ws[lvl] - 1 - wx0).astype(jnp.float32))
    wy = _interp_matrix(y1, bin_h, wy0.astype(jnp.float32), hi_y, out_size, s, win)
    wx = _interp_matrix(x1, bin_w, wx0.astype(jnp.float32), hi_x, out_size, s, win_w)
    wdt = feats[0].dtype
    g = g * roi_valid[:, None, None, None].astype(g.dtype)
    d_stacked = pallas_window_roi_align_bwd(
        g, (rows_total, pad_w, c), row0, wx0,
        wy.astype(wdt), wx.astype(wdt), wdt, h0=feats[0].shape[0],
        out_size=out_size, s=s, interpret=interpret,
    )
    if d_stacked is None:
        return None
    d_feats = []
    off = 0
    for f in feats[:nl]:
        h, w, _ = f.shape
        d_feats.append(d_stacked[off:off + h, :w, :].astype(f.dtype))
        off += h
    for f in feats[nl:]:
        d_feats.append(jnp.zeros_like(f))
    return tuple(d_feats)


_NBUF_FWD_FLAT = 6  # window pipeline depth for the batched (flat-R) kernel
# (not 8: at train geometry — 4096 rois, C=256, win 24x40 — depth 8 puts the
# kernel's scoped VMEM 36KB over the 16MB limit once the wy/wx operand
# staging is counted; depth 6 leaves ~1MB headroom at no measured cost)


def _pack_rowwise(wy, wx, lane: int = 128):
    """Stack per-RoI ``wy`` (R, r1, win) and ``wx`` (R, r2, win_w) into one
    lane-padded (R, r1p + r2, lane) array for single-DMA-per-RoI streaming
    out of HBM.  Mosaic requires a DMA'd region's minor dim to be a
    128-multiple of the (lane-padded) storage — logical extents of 24/40
    are rejected ('Slice shape along dimension 2 must be aligned to tiling
    (128)') — so the pad is explicit; ``r1p`` is 8-aligned so the
    in-kernel row slices stay sublane-aligned.  Returns (packed, r1p)."""
    r1p = -(-wy.shape[1] // 8) * 8
    r2p = -(-wx.shape[1] // 8) * 8  # total rows 8-aligned for the same rule
    wyp = jnp.pad(
        wy, ((0, 0), (0, r1p - wy.shape[1]), (0, lane - wy.shape[2])))
    wxp = jnp.pad(
        wx, ((0, 0), (0, r2p - wx.shape[1]), (0, lane - wx.shape[2])))
    return jnp.concatenate([wyp, wxp], axis=1), r1p


def _kernel_flat(out_size: int, win: int, win_w: int, align: int, nbuf: int,
                 r1p: int, row0_ref, x0a_ref, wpk_ref, stacked_ref, out_ref):
    """Flat-R forward: same interpolation pipeline as ``_kernel`` but with
    the output in HBM (``out_ref`` in ANY memory space) behind a small VMEM
    staging ring — a (B*R, out, out, C) output does not fit VMEM at train
    geometry (4096 x 7 x 7 x 256 bf16 = 100 MB), and staging lets one
    kernel call cover the whole batch instead of a vmap->while chain of
    per-image calls (round-4 trace: the 8-call chain spent ~5.5 ms/step on
    inter-call glue — dynamic-slice/update, layout copies — on top of
    ~10 ms of kernel time).

    The interp matrices stream through the same per-RoI pipeline as one
    ``_pack_rowwise`` tile (``wpk_ref`` in ANY/HBM, rows [0:out_pad) = wy,
    [r1p:r1p+out) = wx): staged whole in VMEM their lane padding (win and
    win_w of 24/40 pad to 128) costs ~8 MB each at 4096 RoIs, which blows
    the 16 MB scoped-VMEM limit; as ~4 KB per-RoI DMAs they ride the
    pipeline of the 481 KB window copies.

    ``wy`` rows (the out_y axis) arrive zero-padded to the sublane tile
    (``out_pad``): DMA slices on a tiled dimension must be tile-multiples
    (Mosaic: 'Slice shape along dimension 2 must be aligned to tiling (8)'
    for a 7-row bf16 staging copy), so every obuf slot and every out_ref
    row is copied at full padded extent and the pad is sliced off in XLA
    outside."""
    r = wpk_ref.shape[0]
    out_pad = r1p  # fwd wy rows are already the sublane-padded out_y axis
    c = stacked_ref.shape[-1]

    def body(scratch, wbuf, obuf, sems, wsems, osems):
        def get_dma(slot, i):
            return pltpu.make_async_copy(
                stacked_ref.at[
                    pl.ds(row0_ref[i], win), pl.ds(x0a_ref[i] * align, win_w), :
                ],
                scratch.at[slot],
                sems.at[slot],
            )

        def getw_dma(slot, i):
            return pltpu.make_async_copy(
                wpk_ref.at[i], wbuf.at[slot], wsems.at[slot])

        def put_dma(slot, i):
            return pltpu.make_async_copy(
                obuf.at[slot], out_ref.at[i], osems.at[slot])

        for j in range(min(nbuf - 1, r)):  # static unroll: fill the pipe
            get_dma(j, j).start()
            getw_dma(j, j).start()

        def loop(i, _):
            slot = i % nbuf

            @pl.when(i + nbuf - 1 < r)
            def _():
                get_dma((i + nbuf - 1) % nbuf, i + nbuf - 1).start()
                getw_dma((i + nbuf - 1) % nbuf, i + nbuf - 1).start()

            get_dma(slot, i).wait()
            getw_dma(slot, i).wait()
            wpk = wbuf[slot]
            wy = wpk[0:out_pad, 0:win]
            wx = wpk[r1p:r1p + out_size, 0:win_w]
            window = scratch[slot]  # (win, win_w, C)
            t = jax.lax.dot_general(
                wy, window.reshape(win, win_w * c),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(out_pad, win_w, c)
            sampled = jax.lax.dot_general(
                wx, t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (out_x, out_y_pad, C)

            @pl.when(i >= nbuf)  # slot's previous out copy must land first
            def _():
                put_dma(slot, i - nbuf).wait()

            obuf[slot] = sampled.astype(out_ref.dtype)
            put_dma(slot, i).start()
            return 0

        jax.lax.fori_loop(0, r, loop, 0)

        def drain(i, _):  # the last min(nbuf, r) copies are still in flight
            put_dma(i % nbuf, i).wait()
            return 0

        jax.lax.fori_loop(jnp.maximum(0, r - nbuf), r, drain, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM(
            (nbuf, win, win_w, stacked_ref.shape[-1]), stacked_ref.dtype),
        wbuf=pltpu.VMEM(
            (nbuf,) + wpk_ref.shape[1:], wpk_ref.dtype),
        obuf=pltpu.VMEM((nbuf, out_size, out_pad, c), out_ref.dtype),
        sems=pltpu.SemaphoreType.DMA((nbuf,)),
        wsems=pltpu.SemaphoreType.DMA((nbuf,)),
        osems=pltpu.SemaphoreType.DMA((nbuf,)),
    )


def _batched_geometry(feats, rois_flat, nl, strides, finest_scale,
                      out_size, s, win, win_w, rows_img):
    """Window origins + interpolation matrices for flat (B*R, 4) rois over
    a per-image stacked pyramid replicated B times along rows.  Returns
    (row0 incl. image base, wx0, wy, wx) — shared by the batched forward
    and backward (identical to the per-image prep in
    ``multilevel_roi_align_pallas`` except for the image-base row offset).
    """
    from .roi_align import _interp_matrix, map_roi_levels

    b = feats[0].shape[0]
    r = rois_flat.shape[0] // b
    row_off, acc = [], 0
    for f in feats[:nl]:
        row_off.append(acc)
        acc += f.shape[1]
    row_off = jnp.asarray(row_off, jnp.int32)
    hs = jnp.asarray([f.shape[1] for f in feats[:nl]], jnp.int32)
    ws = jnp.asarray([f.shape[2] for f in feats[:nl]], jnp.int32)

    lvl = map_roi_levels(rois_flat, nl, finest_scale)
    inv_strides = jnp.asarray(
        [1.0 / strides[i] for i in range(nl)], jnp.float32)
    scale = inv_strides[lvl]
    x1 = rois_flat[:, 0] * scale - 0.5
    y1 = rois_flat[:, 1] * scale - 0.5
    bin_w = (rois_flat[:, 2] * scale - 0.5 - x1) / out_size
    bin_h = (rois_flat[:, 3] * scale - 0.5 - y1) / out_size
    wy0 = jnp.clip(
        jnp.floor(y1).astype(jnp.int32), 0, jnp.maximum(hs[lvl] - win, 0))
    wx0 = jnp.clip(
        jnp.floor(x1).astype(jnp.int32), 0, jnp.maximum(ws[lvl] - win_w, 0))
    img_base = jnp.repeat(
        jnp.arange(b, dtype=jnp.int32) * rows_img, r)
    row0 = img_base + row_off[lvl] + wy0
    hi_y = jnp.minimum(
        jnp.float32(win - 1), (hs[lvl] - 1 - wy0).astype(jnp.float32))
    hi_x = jnp.minimum(
        jnp.float32(win_w - 1), (ws[lvl] - 1 - wx0).astype(jnp.float32))
    wy = _interp_matrix(y1, bin_h, wy0.astype(jnp.float32), hi_y,
                        out_size, s, win)
    wx = _interp_matrix(x1, bin_w, wx0.astype(jnp.float32), hi_x,
                        out_size, s, win_w)
    return row0, wx0, wy, wx


def _fold_and_align(wy, wx, x0, out_size, s, align):
    """Pool-fold the interpolation matrices and shift wx columns by the
    sublane-alignment residue (same transform as the per-image entry
    points)."""
    pool = jnp.repeat(jnp.eye(out_size, dtype=wy.dtype), s, axis=1) / s
    wy = jnp.einsum("ok,rkw->row", pool, wy)
    wx = jnp.einsum("ok,rkw->row", pool, wx)
    win_w = wx.shape[-1]
    x0a = x0 // align
    shift = (x0 - x0a * align).astype(jnp.int32)
    cols = shift[:, None, None] + jnp.arange(win_w)[None, None, :]
    onehot = jax.nn.one_hot(cols, win_w + align, dtype=wx.dtype)
    wx = jnp.einsum("row,rwW->roW", wx, onehot[:, 0])
    return wy, wx, x0a


def _batched_stack(feats, nl, pad_w, win):
    """(B, sumH + win, pad_w, C) stacked pyramid flattened to
    (B*(sumH+win), pad_w, C): one concat, one layout-free reshape."""
    b, c = feats[0].shape[0], feats[0].shape[-1]
    rows = [
        jnp.pad(f, ((0, 0), (0, 0), (0, pad_w - f.shape[2]), (0, 0)))
        for f in feats[:nl]
    ]
    rows.append(jnp.zeros((b, win, pad_w, c), feats[0].dtype))
    stacked = jnp.concatenate(rows, axis=1)
    rows_img = stacked.shape[1]
    return stacked.reshape(b * rows_img, pad_w, c), rows_img


def batched_multilevel_roi_align_pallas(
    feats: Sequence[jnp.ndarray],  # L x (B, H, W, C)
    rois: jnp.ndarray,  # (B, R, 4)
    roi_valid: jnp.ndarray,  # (B, R)
    strides: Sequence[int],
    out_size: int = 7,
    sample_num: int = 2,
    finest_scale: int = 56,
    num_route_levels: int | None = None,
    win: int = 24,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-batch fused RoIAlign: ONE kernel call over B*R rois (vs the
    vmapped per-image variant, which XLA lowers to a while chain of B
    kernel calls with per-image slice/copy glue).  Returns
    (B, R, out, out, C)."""
    assert _HAS_PALLAS, "pallas unavailable"
    b, r = rois.shape[:2]
    nl = num_route_levels or len(feats)
    c = feats[0].shape[-1]
    s = sample_num
    max_w = max(f.shape[2] for f in feats[:nl])
    win_w = min(win, max_w)
    align = _sublane_align(feats[0].dtype)
    pad_w = max_w + align
    stacked, rows_img = _batched_stack(feats, nl, pad_w, win)
    rois_flat = rois.reshape(b * r, 4)
    row0, wx0, wy, wx = _batched_geometry(
        feats, rois_flat, nl, strides, finest_scale, out_size, s, win,
        win_w, rows_img)
    wy, wx, x0a = _fold_and_align(
        wy.astype(stacked.dtype), wx.astype(stacked.dtype), wx0,
        out_size, s, align)
    # out_y staging pad: DMA slices on the tiled (sublane) dim must be
    # 8-row multiples; zero wy rows make the pad columns exact zeros
    out_pad = -(-out_size // 8) * 8
    wy = jnp.pad(wy, ((0, 0), (0, out_pad - out_size), (0, 0)))
    wpk, r1p = _pack_rowwise(wy, wx)
    nbuf = _NBUF_FWD_FLAT
    kern = functools.partial(
        _kernel_flat, out_size, win, win_w + align, align, nbuf, r1p)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (b * r, out_size, out_pad, c), stacked.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # packed wy|wx, per-RoI
                pl.BlockSpec(memory_space=pl.ANY),  # stacked in HBM
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),  # staged out, HBM
        ),
        interpret=interpret,
    )(row0, x0a, wpk, stacked)
    out = out[:, :, :out_size, :]  # drop the out_y staging pad
    out = out.transpose(0, 2, 1, 3)  # (B*R, out_y, out_x, C)
    out = out * roi_valid.reshape(b * r)[:, None, None, None].astype(out.dtype)
    return out.reshape(b, r, out_size, out_size, c)


def batched_multilevel_roi_align_pallas_bwd(
    feats, rois, roi_valid, g, strides, out_size=7, sample_num=2,
    finest_scale=56, num_route_levels=None, win: int = 24, interpret=False,
):
    """d_feats for the batched forward: the sequential-accumulation
    ``_bwd_kernel`` with per-image row splits (each image's stacked rows
    form one or two accumulator passes, exactly as the per-image backward
    splits at the level-0 boundary).  g: (B, R, out, out, C)."""
    b, r = rois.shape[:2]
    nl = num_route_levels or len(feats)
    c = feats[0].shape[-1]
    s = sample_num
    max_w = max(f.shape[2] for f in feats[:nl])
    win_w = min(win, max_w)
    align = _sublane_align(feats[0].dtype)
    pad_w = max_w + align
    h0 = feats[0].shape[1]
    rows_img = sum(f.shape[1] for f in feats[:nl]) + win
    rows_total = b * rows_img

    cc_size = min(128, c)
    if c % cc_size or (cc_size % 128 and cc_size != c):
        return None

    def acc_bytes(n_rows):
        return n_rows * pad_w * cc_size * 4

    # per-image passes: whole image if it fits, else split at the level-0
    # boundary (windows never straddle it — see _bwd_kernel docstring)
    if acc_bytes(rows_img) <= _ACC_BUDGET_BYTES:
        per_img = ((0, rows_img),)
    elif h0 >= win and acc_bytes(max(h0, rows_img - h0)) <= _ACC_BUDGET_BYTES:
        per_img = ((0, h0), (h0, rows_img - h0))
    else:
        return None
    row_splits = tuple(
        (i * rows_img + st, ln) for i in range(b) for (st, ln) in per_img)
    n_chunks = c // cc_size

    rois_flat = rois.reshape(b * r, 4)
    row0, wx0, wy, wx = _batched_geometry(
        feats, rois_flat, nl, strides, finest_scale, out_size, s, win,
        win_w, rows_img)
    wdt = feats[0].dtype
    wy, wx, x0a = _fold_and_align(
        wy.astype(wdt), wx.astype(wdt), wx0, out_size, s, align)

    g = g.reshape(b * r, out_size, out_size, c)
    g = g * roi_valid.reshape(b * r)[:, None, None, None].astype(g.dtype)

    n = b * r
    if len(row_splits) > 1:
        starts = jnp.asarray([p[0] for p in row_splits], jnp.int32)
        pass_id = (
            jnp.searchsorted(starts, row0, side="right") - 1).astype(jnp.int32)
        order = jnp.argsort(pass_id).astype(jnp.int32)
        bounds = jnp.searchsorted(
            pass_id[order], jnp.arange(len(row_splits) + 1))
    else:
        order = jnp.arange(n, dtype=jnp.int32)
        bounds = jnp.asarray([0, n])
    bounds = bounds.astype(jnp.int32)
    # channel chunks as a leading (untiled) dim so every DMA slice is
    # tile-aligned; f32 because a bf16 g tiles sublanes in (2,1)-packed
    # pairs and Mosaic rejects the (out, out, cc) per-RoI slice ('Slice
    # shape along dimension 3 must be aligned to tiling (8), but is 7')
    g5 = g.reshape(n, out_size, out_size, n_chunks, cc_size).transpose(
        3, 0, 1, 2, 4).astype(jnp.float32)
    wpk, r1p = _pack_rowwise(wy, wx)
    kern = functools.partial(
        _bwd_kernel, out_size, win, win_w + align, align, cc_size, n_chunks,
        row_splits, r1p)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows_total, pad_w, c), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # packed wy|wx, per-RoI
                pl.BlockSpec(memory_space=pl.ANY),  # g in HBM
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
        ),
        interpret=interpret,
    )(row0, x0a, bounds, order, wpk, g5)
    d_stacked = out.reshape(b, rows_img, pad_w, c)
    d_feats = []
    off = 0
    for f in feats[:nl]:
        h, w = f.shape[1], f.shape[2]
        d_feats.append(d_stacked[:, off:off + h, :w, :].astype(f.dtype))
        off += h
    for f in feats[nl:]:
        d_feats.append(jnp.zeros_like(f))
    return tuple(d_feats)


def batched_multilevel_roi_align(
    feats, rois, roi_valid, strides, out_size=7, sample_num=2,
    finest_scale=56, num_route_levels=None, interpret=False,
):
    """Batch-level entry point used by ``TwoStageNet.roi_out``: Pallas
    forward + Pallas backward over the whole (B, R) roi grid in single
    kernel calls; falls back to the vmapped XLA fast path off-TPU or for
    non-lane-aligned channels.  Returns (B, R, out, out, C)."""
    import os

    from .roi_align import multilevel_roi_align_fast

    kw = dict(
        out_size=out_size, sample_num=sample_num, finest_scale=finest_scale,
        num_route_levels=num_route_levels,
    )

    use_pallas = (
        (interpret or pallas_roi_available())
        and feats[0].shape[-1] % 128 == 0
    )
    if not use_pallas:
        return jax.vmap(
            lambda fl, rb, vb: multilevel_roi_align_fast(
                fl, rb, vb, strides, **kw)
        )(tuple(feats), jax.lax.stop_gradient(rois),
          jax.lax.stop_gradient(roi_valid) > 0.5)

    @jax.custom_vjp
    def _aligned(f, rb, vf):
        return batched_multilevel_roi_align_pallas(
            f, rb, vf > 0.5, strides, interpret=interpret, **kw)

    def _fwd(f, rb, vf):
        return _aligned.__wrapped__(f, rb, vf), (f, rb, vf)

    def _bwd(res, g):
        f, rb, vf = res
        d_feats = None
        if not os.environ.get("BRT_XLA_ROI_BWD"):
            d_feats = batched_multilevel_roi_align_pallas_bwd(
                f, rb, vf > 0.5, g, strides, interpret=interpret, **kw)
        if d_feats is None:  # no VMEM-fitting split for this geometry
            _, vjp = jax.vjp(
                lambda ff: jax.vmap(
                    lambda fl, rb_, vb_: multilevel_roi_align_fast(
                        fl, rb_, vb_, strides, **kw)
                )(ff, rb, vf > 0.5),
                f,
            )
            (d_feats,) = vjp(g)
        return (d_feats, jnp.zeros_like(rb), jnp.zeros_like(vf))

    _aligned.defvjp(_fwd, _bwd)
    return _aligned(
        tuple(feats),
        jax.lax.stop_gradient(rois),
        jax.lax.stop_gradient(roi_valid.astype(jnp.float32)),
    )


def pallas_roi_available() -> bool:
    """Use the fused kernel: pallas importable, TPU backend, not disabled by
    ``BRT_NO_PALLAS_ROI`` (escape hatch)."""
    import os

    if not _HAS_PALLAS or os.environ.get("BRT_NO_PALLAS_ROI"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def multilevel_roi_align_pallas_trainable(
    feats, rois, roi_valid, strides, out_size=7, sample_num=2,
    finest_scale=56, num_route_levels=None, interpret=False,
):
    """Pallas forward + Pallas backward.

    Forward runs the fused double-buffered kernel; backward runs the
    sequential VMEM-accumulation kernel (``_bwd_kernel``) — the transpose
    of the window gathers without an XLA scatter (round-3: the XLA scatter
    was ~57ms of the 172ms train step, docs/TRAIN_PERF.md).  Set
    ``BRT_XLA_ROI_BWD=1`` to fall back to the autodiff of the XLA fast
    path (numerically identical window function) for A/B measurement.
    rois/valid receive zero cotangents (mmcv RoIAlign backward semantics:
    features only).

    All traced values (feats, rois, valid) are explicit custom_vjp inputs —
    closing over them would leak tracers when the caller vmaps."""
    import os

    from .roi_align import multilevel_roi_align_fast

    kw = dict(
        out_size=out_size, sample_num=sample_num, finest_scale=finest_scale,
        num_route_levels=num_route_levels,
    )
    if feats[0].shape[-1] % 128:
        # non-lane-aligned channels: neither kernel compiles (see
        # multilevel_roi_align_pallas) — plain XLA fwd + autodiff bwd
        return multilevel_roi_align_fast(
            tuple(feats), jax.lax.stop_gradient(rois),
            jax.lax.stop_gradient(roi_valid) > 0.5, strides, **kw
        )

    @jax.custom_vjp
    def _aligned(f, rb, vf):
        return multilevel_roi_align_pallas(
            f, rb, vf > 0.5, strides, interpret=interpret, **kw
        )

    def _fwd(f, rb, vf):
        return _aligned.__wrapped__(f, rb, vf), (f, rb, vf)

    def _bwd(res, g):
        f, rb, vf = res
        d_feats = None
        if not os.environ.get("BRT_XLA_ROI_BWD"):
            d_feats = multilevel_roi_align_pallas_bwd(
                f, rb, vf > 0.5, g, strides, interpret=interpret, **kw
            )
        if d_feats is None:  # flag, or geometry with no VMEM-fitting split
            _, vjp = jax.vjp(
                lambda ff: multilevel_roi_align_fast(
                    ff, rb, vf > 0.5, strides, **kw
                ),
                f,
            )
            (d_feats,) = vjp(g)
        return (d_feats, jnp.zeros_like(rb), jnp.zeros_like(vf))

    _aligned.defvjp(_fwd, _bwd)
    return _aligned(
        tuple(feats),
        jax.lax.stop_gradient(rois),
        jax.lax.stop_gradient(roi_valid.astype(jnp.float32)),
    )
