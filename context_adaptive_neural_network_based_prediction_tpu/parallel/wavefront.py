"""Fully-jitted wavefront frame encoder: the TPU throughput path.

The reference encoder calls the NN once per (TB, RDO evaluation) through a TF
session inside a strictly sequential Z-scan (SURVEY.md §3.3 - its throughput
bottleneck).  This module restructures All-Intra encoding the TPU way
(SURVEY.md §2.4, §5 "long-context analog"): a fixed n x n block grid is
scheduled along the WPP-staggered wavefront t = bx + 2*by, so every block's
causal dependencies (left, above, above-left, above-right - identical to
raster order) are ready one step earlier, and ALL blocks of a step are
processed as one batch inside a single `lax.fori_loop` iteration:

    gather refs -> HM fill/filter -> 35-mode predict (static gather tables)
    -> batched DCT/quant/dequant/iDCT over (blocks x modes) -> RD-proxy cost
    -> argmin mode -> scatter reconstruction + levels.

The entire frame encode is ONE XLA computation; the host only packs the
device-chosen (mode, levels) streams through the shared CABAC serializer
(`codec.encoder.serialize_trees`), producing a bitstream the normative
`codec.decoder.FrameDecoder` reconstructs bit-exactly.

Integer semantics match the scalar codec ops exactly (same tables/shifts), so
wavefront reconstruction == decoder reconstruction - asserted in tests.
"""

from __future__ import annotations

import functools

import numpy as np

from ..codec import encoder as enc_mod
from ..codec import rdo
from ..ops import intra, transform
from ..ops.reference_samples import FILTER_THRESHOLD


@functools.lru_cache(maxsize=None)
def _jitted_wavefront(height: int, width: int, n: int, qp: int,
                      halo_axis: str | None = None, n_tiles: int = 1):
    """Builds the jitted wavefront encoder for one frame (or tile stripe).

    With `halo_axis`/`n_tiles` set, the returned fn is meant to run inside
    `shard_map` over that mesh axis: each device encodes a `height`-tall
    stripe on the GLOBAL wavefront schedule (device d's stripe is offset by
    2*d*nby steps) and after every step `ppermute`s its bottom reconstructed
    pixel row to the next stripe, whose blocks read it as their above
    reference exactly like the single-device encoder reads row y-1.  The
    cross-tile prediction therefore matches the unsharded wavefront
    bit-exactly (asserted in tests) - this is the framework's CP/halo
    analog over ICI (SURVEY.md §2.4 last row).
    """
    import jax
    import jax.numpy as jnp

    nbx, nbh = width // n, height // n
    nby = nbh
    top = 1 if halo_axis else 0          # halo pixel row above the stripe
    n_steps = (nbx - 1) + 2 * (nby * n_tiles - 1) + 1
    b_max = min(nby, (nbx + 1) // 2 + 1)
    lam = rdo.lambda_for_qp(qp)

    g0_np, g1_np, frac_np, _ = intra._angular_tables(n)
    use_filtered_np = np.array(
        [False if m == 1 else min(abs(m - 10), abs(m - 26)) > FILTER_THRESHOLD[n]
         for m in range(35)])

    t_mat = np.asarray(transform.dct_matrix(n), np.int32)
    log2n = n.bit_length() - 1
    shift1 = log2n + 8 + 6 - 15
    shift2 = log2n + 6
    add1 = (1 << (shift1 - 1)) if shift1 > 0 else 0
    add2 = 1 << (shift2 - 1)
    ishift1, ishift2 = 7, 12
    iadd1, iadd2 = 1 << 6, 1 << 11
    per, rem = qp // 6, qp % 6
    tshift = 15 - 8 - log2n
    qbits = 14 + per + tshift
    qadd = 171 << (qbits - 9)
    qscale = transform.QUANT_SCALES[rem]
    iq_shift = 6 - (tshift + per)
    iq_scale = transform.INV_QUANT_SCALES[rem]

    def build_refs(recon, x, y, bx, by, has_halo):
        """HM reference construction for the uniform raster grid (int32).

        `recon` rows are offset by `top` (halo row 0 holds the bottom pixel
        row of the stripe above when running tiled)."""
        # Clamped gathers.
        cols = jnp.clip(x - 1 + jnp.arange(2 * n + 1), 0, width - 1)
        top_raw = recon[jnp.clip(y - 1 + top, 0, height - 1 + top), cols]
        rows = jnp.clip(y + jnp.arange(2 * n) + top, 0, height - 1 + top)
        left_raw = recon[rows, jnp.clip(x - 1, 0, width - 1)]          # (2n,)

        has_above = jnp.logical_or(by > 0, has_halo)
        has_left = bx > 0
        has_ar = jnp.logical_and(has_above, bx < nbx - 1)

        # Below-left is never coded in raster order: replicate left[n-1].
        idx = jnp.arange(2 * n)
        left_col = jnp.where(idx < n, left_raw, left_raw[n - 1])
        # Above-right: replicate top[n-1] (position n in top_raw incl corner).
        tidx = jnp.arange(2 * n + 1)
        top_row = jnp.where(
            jnp.logical_or(tidx <= n, has_ar), top_raw, top_raw[n])

        # Availability cases.
        corner = top_raw[0]
        # Case both: as gathered.  Case left only (top row): everything above
        # replicates the top-most left sample.
        top_left_only = jnp.full(2 * n + 1, left_raw[0], jnp.int32)
        left_left_only = left_col
        # Case above only (left column): left+corner replicate first above
        # sample recon[y-1, x].
        first_above = top_raw[1]
        top_above_only = top_row.at[0].set(first_above)
        left_above_only = jnp.full(2 * n, first_above, jnp.int32)
        # Case neither: DC.
        dc = jnp.full(2 * n + 1, 128, jnp.int32)

        ref_top = jnp.where(
            has_above,
            jnp.where(has_left, top_row, top_above_only),
            jnp.where(has_left, top_left_only, dc))
        ref_left_body = jnp.where(
            has_above,
            jnp.where(has_left, left_col, left_above_only),
            jnp.where(has_left, left_left_only, dc[:2 * n]))
        ref_left = jnp.concatenate([ref_top[:1], ref_left_body])
        return ref_top, ref_left

    def filter_refs(ref_top, ref_left):
        corner = ref_top[0]
        top = ref_top[1:]
        left = ref_left[1:]
        ext_t = jnp.concatenate([left[:1], ref_top])
        f_top_vals = (ext_t[:-2] + 2 * ext_t[1:-1] + ext_t[2:] + 2) >> 2
        f_top = jnp.concatenate([f_top_vals[:2 * n], top[2 * n - 1:]])
        ext_l = jnp.concatenate([top[:1], jnp.concatenate([corner[None], left])])
        f_left_vals = (ext_l[:-2] + 2 * ext_l[1:-1] + ext_l[2:] + 2) >> 2
        f_left = jnp.concatenate([f_top[:1], f_left_vals[1:2 * n], left[2 * n - 1:]])
        return f_top, f_left

    def predict35(ref_top, ref_left):
        comb = jnp.concatenate([ref_top, ref_left])
        g0 = jnp.asarray(g0_np)
        g1 = jnp.asarray(g1_np)
        f = jnp.asarray(frac_np)
        ang = ((32 - f) * comb[g0] + f * comb[g1] + 16) >> 5
        if n <= 16:
            col_adj = (ref_left[1:n + 1] - ref_left[0]) >> 1
            ang = ang.at[26 - 2, :, 0].set(
                jnp.clip(ang[26 - 2, :, 0] + col_adj, 0, 255))
            row_adj = (ref_top[1:n + 1] - ref_top[0]) >> 1
            ang = ang.at[10 - 2, 0, :].set(
                jnp.clip(ang[10 - 2, 0, :] + row_adj, 0, 255))
        top_w = ref_top[1:n + 1]
        left_w = ref_left[1:n + 1]
        dc = (jnp.sum(top_w) + jnp.sum(left_w) + n) // (2 * n)
        dc_blk = jnp.full((n, n), dc, jnp.int32)
        if n <= 16:
            dc_blk = dc_blk.at[0, :].set((top_w + 3 * dc + 2) >> 2)
            dc_blk = dc_blk.at[1:, 0].set((left_w[1:] + 3 * dc + 2) >> 2)
            dc_blk = dc_blk.at[0, 0].set((top_w[0] + left_w[0] + 2 * dc + 2) >> 2)
        s = log2n
        T = top_w[None, :]
        L = left_w[:, None]
        TR = ref_top[n + 1]
        BL = ref_left[n + 1]
        xs = jnp.arange(n)[None, :]
        ys = jnp.arange(n)[:, None]
        planar = (((L << s) + n + (xs + 1) * (TR - L))
                  + ((T << s) + (ys + 1) * (BL - T))) >> (s + 1)
        return jnp.concatenate([planar[None], dc_blk[None], ang], axis=0)

    def fwd_t(resi):
        t = jnp.asarray(t_mat)
        a = (jnp.einsum("min,kn->mik", resi, t) + add1) >> shift1
        return (jnp.einsum("ki,mil->mkl", t, a) + add2) >> shift2

    def inv_t(coeff):
        t = jnp.asarray(t_mat)
        e = jnp.clip((jnp.einsum("ki,mkl->mil", t, coeff) + iadd1) >> ishift1,
                     -32768, 32767)
        return jnp.clip((jnp.einsum("mik,kn->min", e, t) + iadd2) >> ishift2,
                        -32768, 32767)

    def encode_block(frame, recon, modes, bx, by, valid, has_halo):
        x = bx * n
        y = by * n
        ref_top, ref_left = build_refs(recon, x, y, bx, by, has_halo)
        f_top, f_left = filter_refs(ref_top, ref_left)
        preds_u = predict35(ref_top, ref_left)
        preds_f = predict35(f_top, f_left)
        uf = jnp.asarray(use_filtered_np)[:, None, None]
        preds = jnp.where(uf, preds_f, preds_u)                 # (35, n, n)

        orig = jax.lax.dynamic_slice(frame, (y, x), (n, n)).astype(jnp.int32)
        resi = orig[None] - preds
        coeff = fwd_t(resi)
        # int32 is sufficient: |coeff| <= 2^15, scale < 2^15, add < 2^26.
        mag = (jnp.abs(coeff) * qscale + qadd) >> qbits
        q = jnp.sign(coeff) * mag
        if iq_shift > 0:
            deq = (q * iq_scale + (1 << (iq_shift - 1))) >> iq_shift
        else:
            deq = (q * iq_scale) << (-iq_shift)
        deq = jnp.clip(deq, -32768, 32767)
        rec_resi = inv_t(deq)
        rec = jnp.clip(preds + rec_resi, 0, 255)                # (35, n, n)
        sse = jnp.sum((rec - orig[None]) ** 2, axis=(1, 2)).astype(jnp.float32)

        # Rate proxy: ~2*log2(1+|q|)+1 bits per significant level + mode bits.
        absq = jnp.abs(q).astype(jnp.float32)
        coeff_bits = jnp.sum(
            jnp.where(absq > 0, 2.0 * jnp.log2(1.0 + absq) + 1.0, 0.0),
            axis=(1, 2)) + 4.0
        left_mode = jnp.where(bx > 0, modes[by, jnp.maximum(bx - 1, 0)], 1)
        mpms = _mpm_device(left_mode)
        mode_ids = jnp.arange(35)
        is_mpm0 = mode_ids == mpms[0]
        is_mpm = (mode_ids == mpms[0]) | (mode_ids == mpms[1]) | (mode_ids == mpms[2])
        mode_bits = jnp.where(is_mpm0, 2.0, jnp.where(is_mpm, 3.0, 6.0))
        cost = sse + lam * (coeff_bits + mode_bits)
        best = jnp.argmin(cost).astype(jnp.int32)
        return best, rec[best], q[best], x, y

    def _mpm_device(left_mode):
        # Above neighbour is in another "CTU row" (ctu == n): DC for MPM.
        above = jnp.int32(1)
        same = left_mode == above
        lm = left_mode
        # same & angular can only be DC here (above is DC).
        mpm_same = jnp.stack([jnp.int32(0), jnp.int32(1), jnp.int32(26)])
        m2 = jnp.where(jnp.logical_and(lm != 0, above != 0), 0,
                       jnp.where(lm + above < 2, 26, 1))
        mpm_diff = jnp.stack([lm, above, m2])
        return jnp.where(same, mpm_same, mpm_diff)

    def step(t, state):
        frame, recon, modes, qcoeffs = state
        if halo_axis is not None:
            d = jax.lax.axis_index(halo_axis)
            t_loc = t - 2 * nby * d       # global schedule, stripe offset
            has_halo = d > 0
        else:
            t_loc = t
            has_halo = jnp.bool_(False)
        slots = jnp.arange(b_max)
        # Blocks on step t: by in [max(0, ceil((t - nbx + 1)/2)), t//2].
        by0 = jnp.maximum(0, -((nbx - 1 - t_loc) // 2))
        by_ids = by0 + slots
        bx_ids = t_loc - 2 * by_ids
        valid = (by_ids < nby) & (bx_ids >= 0) & (bx_ids < nbx)

        def one(slot):
            b_y = jnp.minimum(by_ids[slot], nby - 1)
            b_x = jnp.clip(bx_ids[slot], 0, nbx - 1)
            return encode_block(frame, recon, modes, b_x, b_y, valid[slot],
                                has_halo)

        bests, recs, qs, xs, ys = jax.vmap(one)(slots)

        def commit(i, st):
            # Branchless (shard_map-friendly): invalid slots write into the
            # scratch pad row appended below the frame / block grids.
            recon_, modes_, qcoeffs_ = st
            yy = jnp.where(valid[i], ys[i] + top, height + top)
            xx = jnp.where(valid[i], xs[i], 0)
            recon_ = jax.lax.dynamic_update_slice(recon_, recs[i], (yy, xx))
            brow = jnp.where(valid[i], ys[i] // n, nby)
            bcol = jnp.where(valid[i], xs[i] // n, 0)
            modes_ = modes_.at[brow, bcol].set(bests[i])
            qcoeffs_ = qcoeffs_.at[brow, bcol].set(qs[i])
            return recon_, modes_, qcoeffs_

        recon, modes, qcoeffs = jax.lax.fori_loop(
            0, b_max, commit, (recon, modes, qcoeffs))
        if halo_axis is not None:
            # Causal halo over ICI: each stripe's (partially coded) bottom
            # pixel row flows to the stripe below, which needs column x only
            # two global steps after it is produced - one-step ppermute
            # latency is always in time.
            bottom = recon[height - 1 + top]
            recv = jax.lax.ppermute(
                bottom, halo_axis, [(i, i + 1) for i in range(n_tiles - 1)])
            d = jax.lax.axis_index(halo_axis)
            recon = recon.at[0].set(jnp.where(d == 0, recon[0], recv))
        return frame, recon, modes, qcoeffs

    def run(frame_u8):
        frame = frame_u8.astype(jnp.int32)
        # One scratch pad row below the frame / block grids for masked
        # writes (+ the top halo row when tiled).  Buffers are derived from
        # `frame` so that under shard_map they carry the same varying manual
        # axes as the input tile.
        zero = frame[0, 0] * 0
        recon = jnp.zeros((top + height + n, width), jnp.int32) + zero
        modes = jnp.full((nby + 1, nbx), -1, jnp.int32) + zero
        qcoeffs = jnp.zeros((nby + 1, nbx, n, n), jnp.int32) + zero
        state = (frame, recon, modes, qcoeffs)
        state = jax.lax.fori_loop(0, n_steps, step, state)
        _, recon, modes, qcoeffs = state
        return recon[top:height + top], modes[:nby], qcoeffs[:nby]

    return run if halo_axis is not None else jax.jit(run)


@functools.lru_cache(maxsize=None)
def _jitted_wavefront_batch(height: int, width: int, n: int, qp: int):
    import jax

    run = _jitted_wavefront(height, width, n, qp)
    return jax.jit(jax.vmap(run))


def encode_frames_wavefront_batch(frames_uint8: np.ndarray, qp: int, *,
                                  block_size: int = 16):
    """Encodes a batch of frames concurrently (vmapped wavefront).

    Independent frames pipeline through the wavefront steps together, hiding
    the per-step latency that bounds single-frame throughput - the intended
    production serving mode.  Returns (recons (B,H,W) uint8,
    modes (B,nby,nbx), qcoeffs (B,nby,nbx,n,n)) as numpy arrays.
    """
    import jax.numpy as jnp

    b, h, w = frames_uint8.shape
    run = _jitted_wavefront_batch(h, w, block_size, qp)
    recons, modes, qcoeffs = run(jnp.asarray(frames_uint8))
    return (np.asarray(recons).astype(np.uint8), np.asarray(modes),
            np.asarray(qcoeffs))


def encode_frame_wavefront(frame_uint8: np.ndarray, qp: int, *,
                           block_size: int = 16, serialize: bool = True,
                           use_native_pack: bool = True):
    """Whole-frame jitted wavefront encode on a uniform block grid.

    Returns an `EncodeResult` whose bitstream decodes bit-exactly with
    `codec.decoder.FrameDecoder` (header declares ctu_size = block_size).
    CABAC packing uses the native C++ packer when the toolchain is available
    (byte-identical with the Python serializer), else pure Python.
    """
    import jax.numpy as jnp

    h, w = frame_uint8.shape
    n = block_size
    if h % n or w % n:
        raise ValueError("frame dims must be multiples of the block size")
    run = _jitted_wavefront(h, w, n, qp)
    recon, modes, qcoeffs = run(jnp.asarray(frame_uint8))
    recon = np.asarray(recon)
    modes = np.asarray(modes)
    qcoeffs = np.asarray(qcoeffs)

    trees = []
    mode_map = np.full((h // 4, w // 4), -1, np.int32)
    for by in range(h // n):
        for bx in range(w // n):
            x, y = bx * n, by * n
            q = qcoeffs[by, bx]
            cbf = 1 if q.any() else 0
            pu = enc_mod.PuRecord(x, y, n, int(modes[by, bx]),
                                  [enc_mod.TuRecord(x, y, n, cbf, q if cbf else None)])
            trees.append(enc_mod.CuNode(x, y, n, 0, split=False, pus=[pu]))
            mode_map[y // 4:(y + n) // 4, x // 4:(x + n) // 4] = modes[by, bx]
    bitstream = b""
    if serialize:
        from ..codec import native

        if use_native_pack and native.available():
            bitstream = native.serialize_grid(modes, qcoeffs, width=w,
                                              height=h, n=n, qp=qp)
        else:
            bitstream = enc_mod.serialize_trees(
                trees, width=w, height=h, qp=qp, policy="regular", ctu_size=n,
                sign_hiding=False)
    return enc_mod.EncodeResult(
        bitstream=bitstream,
        reconstruction=recon.astype(np.uint8),
        num_bits=len(bitstream) * 8,
        ctu_trees=trees,
        mode_map=mode_map,
        qp=qp,
        policy="regular",
    )


def encode_frame_wavefront_hm(frame_uint8: np.ndarray, qp: int, *,
                              block_size: int = 16,
                              loop_filters: bool = True):
    """Wavefront device encode -> standard Annex-B HEVC stream.

    The stream declares CTB size 16 (legal HEVC: CtbLog2SizeY = 4), so the
    device's raster/wavefront causal availability IS the HEVC coding order -
    each 16x16 grid block is one CTU with a 2Nx2N PU and one unsplit TU.

    With `loop_filters`, deblocking is signalled and SAO parameters are
    estimated per CTB - both are normative POST-passes for All-Intra
    (prediction uses the unfiltered reconstruction), so the device encode is
    untouched and only the output picture improves.  Decoded-picture-hash
    SEI embedded; stock HM-16.15 TAppDecoderStatic reconstructs the final
    picture bit-exactly.  Returns (annexb_stream, EncodeResult).
    """
    from ..codec import deblock, hm_encoder, rdo
    from ..codec import sao as sao_mod

    if block_size != 16:
        raise ValueError("HM output is defined for the 16x16 grid (CTB 16)")
    res = encode_frame_wavefront(frame_uint8, qp, block_size=block_size,
                                 serialize=False)
    sao_grid = None
    if loop_filters:
        # The per-block grid is its own TU map (every block one CU/TU).
        h, w = frame_uint8.shape
        uh, uw = h // 4, w // 4
        tu_ids = (np.arange(uh)[:, None] // 4 * (uw // 4)
                  + np.arange(uw)[None, :] // 4)
        final = deblock.deblock_luma(res.reconstruction, tu_ids, qp)
        lam = rdo.lambda_for_qp(qp)
        sao_grid = sao_mod.estimate_frame(frame_uint8, final, block_size, lam)
        final = sao_mod.apply_sao(final, sao_grid, block_size)
        res.reconstruction = final
    stream = hm_encoder.assemble_hm_stream(
        res, sao_enabled=loop_filters, deblocking=loop_filters,
        sign_hiding=False, transform_skip=False, max_tu_depth=0,
        sao_grid=sao_grid, ctu_size=block_size)
    res.bitstream = stream
    res.num_bits = len(stream) * 8
    return stream, res
