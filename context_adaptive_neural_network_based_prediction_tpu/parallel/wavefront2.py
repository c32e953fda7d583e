"""Wavefront v2: fully-jitted quadtree device encoder (CTB 32 or 64).

The v1 wavefront (`wavefront.py`) trades ~26% BD-rate for throughput by
fixing a uniform 16x16 grid.  v2 keeps the whole-frame-as-one-XLA-program
design but adds the structure that carries most of HM's efficiency: a CU
quadtree decided on device - 32 -> 16 -> 8 (-> 4x4 NxN PUs), plus an
optional 64x64 CU level (`ctb=64`, HM's intra_main_rext geometry: one
signalled mode, four forced TU32s reconstructed TU-by-TU).

Exact-decodability discipline (the NN/codec is normative - SURVEY.md §3.4):
every candidate's prediction uses exactly the reference samples the decoder
will derive.  Two mechanisms guarantee this:

* **Static availability/fill tables**: HEVC reference availability depends
  only on geometry + coding order, so for every (block size, grid position)
  the full HM fill-with-substitution (ops/reference_samples.py, golden-
  tested against HM) is run ON AN ID-CODED IMAGE at table-build time,
  yielding per-position gather maps (source dy/dx per reference sample,
  or DC).  The device then builds bit-exact reference arrays with one
  gather - no control flow.
* **Z-order sub-stages**: inside a CTB the four 16x16 quadrants are
  processed in z-order; within a quadrant the four 8x8 blocks run strictly
  sequentially (the z-scan is a dependency chain: z2's above-right segment
  is z1's bottom row, which HEVC derives as available).  A quadrant's
  16x16 candidate and
  the CTB's 32x32 candidate predict from *outside* references only, so
  structure decisions can overwrite inner reconstruction without breaking
  any committed reference.  All CTBs on a wavefront anti-diagonal
  (t = bx + 2*by) run these sub-stages batched.

The host only walks the decided quadtree into CuNode trees and runs the
shared CABAC serializer: streams decode bit-exactly through the normative
decoders (own-format and Annex-B HEVC with CTB 32).

**Neural modes on the device path** (the framework's core thesis — the
reference runs one TF `Session::Run` per TB inside the sequential Z-scan,
`TComPrediction.cpp:556-607`): with `policy="substitution"` mode 18's
prediction is the PNN, with `policy="switch"` the PNN is a signalled 36th
candidate (PNNS), exactly as in the host codec — but here the context
extraction + forward of EVERY unit trial on a wavefront anti-diagonal runs
batched inside the jitted program (vmapped over slots).  The forward is the
*quantized deterministic* net (`models/pnn_q.py`): integer accumulation is
reduction-order invariant, so the batched device forwards agree bit-exactly
with the sequential host decoder's — a float net cannot be normative here.
Context availability and the per-4-sample-strip copy gating
(`TComPattern.cpp:109-175`, `extraction_context.cpp`) depend only on
geometry + coding order, so they are precomputed static mask tables.
"""

from __future__ import annotations

import functools

import numpy as np

from ..codec import encoder as enc_mod
from ..codec import rdo
from ..ops import intra, transform
from ..ops import reference_samples as rs
from . import rate_model

CTB = 32
PADW = 32           # right padding of the recon plane for NN context slices
PNNS_MODE = 35


def _z_offsets(ctb: int, cell: int):
    """(dy, dx) of every `cell`-sized unit inside a `ctb` CTB, in z-order."""
    if ctb == cell:
        return [(0, 0)]
    out = []
    half = ctb // 2
    for q in range(4):
        qy, qx = (q >> 1) * half, (q & 1) * half
        out.extend((qy + dy, qx + dx) for dy, dx in _z_offsets(half, cell))
    return out


@functools.lru_cache(maxsize=None)
def _coding_order4(height: int, width: int, ctb: int = CTB):
    """Coding-order index of every 4x4 cell (CTB raster + z-order inside,
    down to 4x4 NxN-PU granularity)."""
    h4, w4 = height // 4, width // 4
    order = np.zeros((h4, w4), np.int64)
    idx = 0
    offs = _z_offsets(ctb, 4)
    for cy in range(0, height, ctb):
        for cx in range(0, width, ctb):
            for dy, dx in offs:
                order[(cy + dy) // 4, (cx + dx) // 4] = idx
                idx += 1
    return order


@functools.lru_cache(maxsize=None)
def _fill_tables(height: int, width: int, n: int, ctb: int = CTB):
    """Per-position reference-sample gather tables for n x n blocks.

    Returns int32 arrays (nby, nbx, 2, 2n+1): [0] = dy, [1] = dx relative to
    the block origin, with dy == -(10**4) marking the DC-128 fill.  Built by
    running the golden-tested host fill on an id-coded image, so the device
    gather reproduces HM's availability + substitution rules bit-exactly.
    """
    order4 = _coding_order4(height, width, ctb)
    nby, nbx = height // n, width // n
    # Pixel ids offset past any DC_FILL (=128) value so the fill's DC
    # substitutions are distinguishable from copied/replicated samples.
    base = 10 ** 6
    ids = (np.arange(height, dtype=np.int64)[:, None] * width
           + np.arange(width, dtype=np.int64)[None, :] + base)
    sentinel = -(10 ** 4)
    tab_top = np.zeros((nby, nbx, 2, 2 * n + 1), np.int32)
    tab_left = np.zeros((nby, nbx, 2, 2 * n + 1), np.int32)
    for by in range(nby):
        for bx in range(nbx):
            x, y = bx * n, by * n
            # The z-order at 4-granularity nests the 8/16/32 orders, so one
            # order table serves every block size.
            my_ord = order4[y // 4, x // 4]
            unit_coded = order4 < my_ord
            flags = rs.neighbor_unit_flags(unit_coded, x, y, n,
                                           height, width)
            ref_top, ref_left = rs.fill_reference_samples(
                ids, x, y, n, flags)
            for tab, ref in ((tab_top, ref_top), (tab_left, ref_left)):
                for i, v in enumerate(np.asarray(ref)):
                    if v < base:   # DC fill
                        tab[by, bx, 0, i] = sentinel
                        tab[by, bx, 1, i] = 0
                    else:
                        sy, sx = divmod(int(v) - base, width)
                        tab[by, bx, 0, i] = sy - y
                        tab[by, bx, 1, i] = sx - x
    return tab_top, tab_left


@functools.lru_cache(maxsize=None)
def _nn_ctx_tables(height: int, width: int, n: int, ctb: int = CTB):
    """Static PNN-context availability tables for n x n units.

    Returns (ctx_ok (nby,nbx) bool, above_mask (nby,nbx,3n) f32,
    left_mask (nby,nbx,2n) f32): the anchor-CTU availability rule
    (`TComPattern.cpp:109-175` — anchor pixel (x-n, y-n) inside the picture)
    and the per-4-sample-strip copy gating of `extraction_context.cpp`,
    derived from coding order exactly like the host `extract_context` flags.
    """
    order4 = _coding_order4(height, width, ctb)
    nby, nbx = height // n, width // n
    n_units = (2 * n) // 4
    ctx_ok = np.zeros((nby, nbx), bool)
    amask = np.zeros((nby, nbx, 3 * n), np.float32)
    lmask = np.zeros((nby, nbx, 2 * n), np.float32)
    for by in range(nby):
        for bx in range(nbx):
            x, y = bx * n, by * n
            if x - n < 0 or y - n < 0:
                continue
            ctx_ok[by, bx] = True
            my_ord = order4[y // 4, x // 4]
            unit_coded = order4 < my_ord
            flags = rs.neighbor_unit_flags(unit_coded, x, y, n,
                                           height, width)
            amask[by, bx, :n] = 1.0    # above-left corner: always copied
            for i in range(n_units):
                if flags[n_units + 1 + i]:
                    amask[by, bx, n + 4 * i: n + 4 * i + 4] = 1.0
                if flags[n_units - 1 - i]:
                    lmask[by, bx, 4 * i: 4 * i + 4] = 1.0
    return ctx_ok, amask, lmask


# Explicit cache (lru_cache cannot key on a PnnBundle of numpy arrays).
# Bounded: entries pin the bundle (so id() stays valid) AND the compiled XLA
# executable; a long-running server encoding varied (h, w, qp, ...) combos
# must not accumulate them without end (ADVICE r3).  Python dicts preserve
# insertion order, so popping the first key evicts the oldest entry.
_W2_CACHE: dict = {}
_W2_CACHE_MAX = 16


def _cache_put(cache: dict, key, value):
    cache[key] = value
    while len(cache) > _W2_CACHE_MAX:
        cache.pop(next(iter(cache)))


def _jitted_wavefront2(height: int, width: int, qp: int,
                       lam_scale: float = 1.0, policy: str = "regular",
                       bundle=None, halo_axis: str | None = None,
                       n_tiles: int = 1, ctb: int = CTB,
                       enable_nxn: bool = True, n_frames: int = 1,
                       rate_evolve: bool | None = None):
    import os as _os
    if rate_evolve is None:
        rate_evolve = _os.environ.get("CANP_RATE_EVOLVE") == "1"
    key = (height, width, qp, lam_scale, policy, id(bundle), halo_axis,
           n_tiles, ctb, enable_nxn, n_frames, rate_evolve)
    hit = _W2_CACHE.get(key)
    if hit is not None:
        return hit[0]
    run = _build_wavefront2(height, width, qp, lam_scale, policy, bundle,
                            halo_axis, n_tiles, ctb, enable_nxn, n_frames,
                            rate_evolve)
    _cache_put(_W2_CACHE, key, (run, bundle))
    return run


def _build_wavefront2(height: int, width: int, qp: int,
                      lam_scale: float, policy: str, bundle,
                      halo_axis: str | None = None, n_tiles: int = 1,
                      ctb: int = CTB, enable_nxn: bool = True,
                      n_frames: int = 1, rate_evolve: bool = False):
    """Builds the jitted quadtree wavefront encoder (CTB `ctb` in {32, 64}).

    **Skewed (systolic) storage** — the round-4 restructure that removes the
    dispatch floor.  All spatial state (frame, reconstruction, MPM mode map,
    cell costs) is stored as per-CTB-row planes with row `by` shifted right
    by `2*ctb*by`: a wavefront anti-diagonal t = bx + 2*by then maps to ONE
    contiguous column window x' = t*ctb + [0, ctb) across ALL planes.  Every
    sub-stage commit becomes a single box `dynamic_update_slice` over the
    slot axis (all slots share the same in-CTB offset), and slot-masked
    writes need no masking at all: invalid slots land in void or padding
    regions that no valid read ever touches.  Round 3's per-slot scatter /
    fori-loop commits — each forcing SMEM index traffic or a whole-buffer
    copy — disappear entirely.

    Reference-sample fetch stays table-driven and bit-exact: for every
    (block size, grid position) the golden-tested host fill runs on an
    id-coded image at build time, and the resulting per-sample sources are
    stored as (plane delta, source row, x' offset relative to t*ctb)
    triplets.  Positions with identical triplet tables are DEDUPED into
    classes (interior positions all share one class), so the baked
    constants shrink by ~100x — this is also what lets the NN-policy
    program compile at 1080p (round-3 "known issue").

    With `halo_axis`/`n_tiles` the function runs per-device under
    `shard_map`: each device encodes a stripe of CTB rows on the GLOBAL
    wavefront schedule (stripe d offset by 2*d*sby steps) and after every
    step `ppermute`s its bottom reconstruction plane down the mesh into the
    receiver's halo plane (index 0), re-aligned into the receiver's skew
    frame by a static roll.  Tables for non-top stripes are the *interior*
    variants, so the sharded encode stays bit-exact vs single-device — the
    framework's CP/halo analog over ICI (SURVEY §2.4 last row).
    """
    import jax
    import jax.numpy as jnp

    from ..models import pnn_q

    if policy not in ("regular", "substitution", "switch"):
        raise ValueError(f"unknown policy {policy!r}")
    if policy != "regular" and bundle is None:
        raise ValueError("NN policies need a quantized PnnBundle")
    qmodels = bundle.quantized_for_qp(qp) if bundle is not None else {}
    if policy != "regular" and not qmodels:
        raise ValueError("bundle has no quantized models (call .quantize())")
    nn_widths = tuple(sorted(w for w in qmodels if w in (4, 8, 16, 32)))
    n_modes = 36 if policy == "switch" else 35
    if ctb not in (32, 64):
        raise ValueError("ctb must be 32 or 64")
    if ctb == 64 and halo_axis is not None:
        raise NotImplementedError("halo sharding currently ships for CTB 32")

    if height % ctb or width % ctb:
        raise ValueError(f"wavefront2 needs frame dims that are multiples "
                         f"of {ctb} (crop/pad first)")
    # Schedule grid: CTBs of the configured size.
    sbx, sby = width // ctb, height // ctb
    n_steps = (sbx - 1) + 2 * (sby * n_tiles - 1) + 1
    b_max = min(sby, (sbx + 1) // 2 + 1)
    if n_frames > 1 and halo_axis is not None:
        raise NotImplementedError("frame batching is a single-device mode")
    # Multi-frame batching lives INSIDE the program: plane index
    # (ROW0 + by) * n_frames + f interleaves B independent frames, so every
    # sub-stage's boxes/gathers just grow B-fold along the already-batched
    # slot axis.  (A vmapped program de-hoists the rate/transform constant
    # tables into per-iteration VMEM copies - measured 5x slower at b=2 -
    # and crashes the axon worker at b=4; this keeps ONE program shape.)
    NF = n_frames
    b_eff = b_max * NF
    # Skew geometry.  OFF: left margin so reads reaching two planes up
    # (x' -= 2*ctb) and 2n left stay in bounds at t=0.  PH: plane height
    # with 32 pad rows so NN left-portion slices never clamp-shift.
    # ROW0 = 1: plane 0 is the halo plane (zeros when unsharded; blocks
    # that would read it have availability masks 0 there).
    ROW0 = 1
    OFF = 2 * ctb + 64
    # +32 right margin: the NN above-portion slice reaches x + 2n - 1, i.e.
    # x' up to n_steps*ctb + OFF + n - 1; without the margin dynamic_slice
    # clamp-shifts the window at the frame's right edge.
    W_sk = n_steps * ctb + OFF + 32
    # Per-step working window: all of a step's reads (raw L strips, NN
    # portions reaching 2*ctb left through the skew, above-right raw up to
    # lx+2n-1) and commits (column [OFF, OFF+ctb)) land inside x' in
    # [t*ctb, t*ctb + WIN).  The step slices it once, every sub-stage works
    # on the small hot buffer, and one write-back DUS per step returns the
    # committed column - recon itself sees 2 ops/step, so XLA keeps it
    # in place (per-sub-stage slices of the carried 67 MB buffer forced a
    # whole-buffer copy per sub-stage - profiled 5.3 s/frame at 1080p).
    WIN = OFF + ctb + 32
    PH = ctb + 32
    n_planes = ROW0 + sby + b_max - 1       # per-frame by-planes
    cu8 = ctb // 8
    OFF8 = OFF // 8
    W8 = n_steps * cu8 + OFF8 + cu8
    # lam_scale compensates the static rate model's systematic underestimate
    # of real CABAC bits (no context adaptation): decisions use a stiffer
    # lambda so the operating point lands on HM's rate.
    lam = rdo.lambda_for_qp(qp) * lam_scale
    per, rem = qp // 6, qp % 6

    def skew_triplets(tt, tl, n):
        """(nbyn, nbxn, 3, 2(2n+1)) per-sample (plane delta | -9 DC,
        source row, x' offset relative to t*ctb) from (dy, dx) tables."""
        nbyn, nbxn = tt.shape[0], tt.shape[1]
        dy = np.concatenate([tt[:, :, 0, :], tl[:, :, 0, :]], -1)
        dx = np.concatenate([tt[:, :, 1, :], tl[:, :, 1, :]], -1)
        y = (np.arange(nbyn) * n)[:, None, None]
        x = (np.arange(nbxn) * n)[None, :, None]
        pb = y // ctb
        tpos = x // ctb + 2 * pb
        sy, sx = y + dy, x + dx
        ps = np.floor_divide(sy, ctb)
        d = (ps - pb).astype(np.int32)
        lys = (sy - ps * ctb).astype(np.int32)
        rxs = (sx + 2 * ctb * ps + OFF - tpos * ctb).astype(np.int32)
        sent = dy <= -(10 ** 4) // 2
        d[sent], lys[sent], rxs[sent] = -9, 0, 0
        return np.stack([d, lys, rxs], axis=2)

    def sel_tables(tt, tl, n):
        """Per-position SELECTION tables over the raw L strips.

        Every fill source is a pattern sample on the 1-px L (row y-1 or
        column x-1, `TComPattern::fillReferenceSamples`), so the bit-exact
        reference arrays are a tiny selection over two contiguous strips:
        raw = [row(y-1, x-1 .. x+2n-1) | col(y .. y+2n-1, x-1) | 128].
        Returns (nbyn, nbxn, S) int32 indices into that (4n+2)-long vector.
        A one-hot matmul then replaces the big-index recon gather that the
        TPU serializes on its scalar core (profiled 12 ms/step at 1080p).
        """
        nbyn, nbxn = tt.shape[0], tt.shape[1]
        dy = np.concatenate([tt[:, :, 0, :], tl[:, :, 0, :]], -1)
        dx = np.concatenate([tt[:, :, 1, :], tl[:, :, 1, :]], -1)
        sent = dy <= -(10 ** 4) // 2
        on_row = dy == -1
        on_col = dx == -1
        assert bool(np.all(sent | on_row | on_col)), \
            "fill source off the 1-px L pattern"
        sel = np.where(on_row, dx + 1, 2 * n + 1 + dy)
        sel = np.where(sent, 4 * n + 1, sel).astype(np.int32)
        assert sel.min() >= 0 and sel.max() <= 4 * n + 1
        return sel

    def dedupe(stacked):
        """(V, nby, nbx, ...) -> (class table (C, ...), cmap (V, nby, nbx))."""
        v, a, b = stacked.shape[:3]
        flat = stacked.reshape(v * a * b, -1)
        uniq, inv = np.unique(flat, axis=0, return_inverse=True)
        ctab = uniq.reshape((-1,) + stacked.shape[3:])
        return ctab, inv.reshape(v, a, b).astype(np.int32)

    # Per-size constant bundles.  4x4 luma intra TUs use the DST-VII
    # (normative, transform.py:68-84); all others the DCT-II.
    size_consts = {}
    for n in (4, 8, 16, 32):
        g0, g1, frac, _ = intra._angular_tables(n)
        use_filt = np.array(
            [False if m == 1 else
             min(abs(m - 10), abs(m - 26)) > rs.FILTER_THRESHOLD[n]
             for m in range(35)])
        # Variant 0 = frame-boundary (top stripe / unsharded); variant 1 =
        # interior (stripe-top CTB row sees a coded CTB row above through
        # the halo plane).  Interior tables are the rows-after-the-first-
        # CTB-row of a one-CTB-taller frame's tables.
        tt, tl = _fill_tables(height, width, n, ctb)
        trips = [skew_triplets(tt, tl, n)]
        sels = [sel_tables(tt, tl, n)]
        if halo_axis:
            k = CTB // n
            ti_t, ti_l = _fill_tables(height + CTB, width, n, ctb)
            # Local origin: shift dy by nothing (offsets are origin-
            # relative); sources above the stripe map to plane -1 (halo)
            # via the floor division in skew_triplets.
            trips.append(skew_triplets(ti_t[k:], ti_l[k:], n))
            sels.append(sel_tables(ti_t[k:], ti_l[k:], n))
        ctab, cmap = dedupe(np.stack(trips))
        stab, smap = dedupe(np.stack(sels))
        # One-hot selection matrices, (C, S, 4n+2) int8; the last raw slot
        # is the DC-128 constant.
        onehot = (stab[:, :, None]
                  == np.arange(4 * n + 2)[None, None, :]).astype(np.int8)
        log2n = n.bit_length() - 1
        tshift = 15 - 8 - log2n
        sig0, sig1 = rate_model.sig_bits_tables(qp, n)
        lastx, lasty = rate_model.last_bits_tables(qp, n)
        sgather, mode_scan = rate_model.scan_tables(n)
        if n_modes == 36:
            # PNNS residuals use mode-0 coefficient syntax
            # (`syntax.encode_coefficients(..., 0, ...)` for PNNS_MODE).
            mode_scan = np.concatenate([mode_scan, mode_scan[:1]])
        inv_gather = np.empty_like(sgather)
        for st in range(3):
            inv_gather[st, sgather[st]] = np.arange(n * n, dtype=np.int32)
        size_consts[n] = dict(
            g0=g0, g1=g1, frac=frac, use_filt=use_filt,
            ctab=ctab, cmap=cmap, onehot=onehot, smap=smap,
            t_fwd=np.asarray(transform.DST4_FWD if n == 4
                             else transform.dct_matrix(n, True), np.int32),
            t_inv=np.asarray(transform.DST4 if n == 4
                             else transform.dct_matrix(n), np.int32),
            shift1=log2n + 8 + transform.FWD_MATRIX_SHIFT - 15,
            shift2=log2n + transform.FWD_MATRIX_SHIFT,
            qbits=14 + per + tshift,
            iq_shift=6 - (tshift + per),
            err_scale=float(2.0 ** (-2.0 * tshift)
                            / float(transform.QUANT_SCALES[rem]) ** 2),
            # Scan-domain rate tables, pre-gathered per mode: (n_modes, n*n).
            sig0=sig0[mode_scan], sig1=sig1[mode_scan],
            lastx=lastx, lasty=lasty,
            sg=sgather[mode_scan], inv_sg=inv_gather[mode_scan],
        )
        # Gather-free (matmul/one-hot) scan machinery, the Mosaic-safe form
        # for the round-5 fused unit kernel (TPU serializes big-index
        # gathers on the scalar core).  For n > 8 the HEVC scan is always
        # diagonal (TComTrQuant getCoefScanIdx), so ONE permutation
        # suffices; 4/8 keep per-mode one-hots (tiny).
        sgm = sgather[mode_scan]
        if n > 8:
            p1 = np.zeros((n * n, n * n), np.int8)
            p1[np.arange(n * n), sgm[0]] = 1
            size_consts[n]["scan_p"] = p1           # (N_scan, N_raster)
        else:
            pm = np.zeros((len(sgm), n * n, n * n), np.int8)
            for m in range(len(sgm)):
                pm[m, np.arange(n * n), sgm[m]] = 1
            size_consts[n]["scan_p"] = pm
        if n in nn_widths:
            ctx_ok, am, lm = _nn_ctx_tables(height, width, n, ctb)
            variants = [np.concatenate(
                [ctx_ok[..., None].astype(np.float32), am, lm], -1)]
            if halo_axis:
                k = CTB // n
                io, ia, il = _nn_ctx_tables(height + CTB, width, n, ctb)
                variants.append(np.concatenate(
                    [io[k:][..., None].astype(np.float32), ia[k:], il[k:]],
                    -1))
            nn_tab, nn_cmap = dedupe(np.stack(variants))
            size_consts[n]["nn_ok_c"] = nn_tab[:, 0] > 0.5
            size_consts[n]["nn_am_c"] = nn_tab[:, 1:1 + 3 * n]
            size_consts[n]["nn_lm_c"] = nn_tab[:, 1 + 3 * n:]
            size_consts[n]["nn_cmap"] = nn_cmap
            size_consts[n]["nn_q"] = qmodels[n]
            # Arch follows the QP-SELECTED quantized model (pair selection
            # can flip it per width; the frozen dict stores its kind).
            size_consts[n]["nn_fc"] = (
                str(np.asarray(qmodels[n]["kind"])) == "fc"
                if "kind" in qmodels[n]
                else bundle.is_fully_connected[n])
            size_consts[n]["nn_mean"] = bundle.mean_for(n)
    qscale = transform.QUANT_SCALES[rem]
    iq_scale = transform.INV_QUANT_SCALES[rem]

    # Structure/mode syntax bits from the HM context-init states at this QP
    # (rate_model docstring; exact CABAC packing happens on the host).
    SB = rate_model.scalar_bits(qp)
    MODE_BITS = rate_model.mode_bits_table(qp)

    # Fused Pallas unit trials (ops/unit_fused.py): one custom call per
    # sub-stage in place of ~30 launched XLA ops, byte-identical by
    # construction and asserted by scripts/w2_golden.py across impls.
    # CANP_FUSED_UNIT: "pallas" (default on TPU), "xla" (inline twin, for
    # CPU exactness checks), "0"/unset elsewhere = off.
    import os as _os

    _fu = _os.environ.get("CANP_FUSED_UNIT", "auto")
    if _fu == "auto":
        # "axon" is the tunneled TPU platform name; same Mosaic target.
        fused_impl = ("pallas"
                      if jax.default_backend() in ("tpu", "axon") else None)
    else:
        fused_impl = _fu if _fu in ("xla", "pallas") else None
    if fused_impl is not None:
        from ..ops import unit_fused
        for n, grp in ((4, 1), (8, 1), (16, 6), (32, 36)):
            if policy == "substitution" and n in nn_widths:
                nnpol = "sub18"
            elif n_modes == 36:
                nnpol = "append"
            else:
                nnpol = None
            size_consts[n]["fused"] = unit_fused.build_consts(
                n, n_modes, size_consts[n], SB, lam, qscale, iq_scale,
                b_eff, nn_policy=nnpol, groups=grp)

    # ---- live (WPP-style) rate-state evolution (round-5 task 2) ----
    # HM re-loads its RD bit estimates from the LIVE CABAC contexts before
    # every TU (TEncSearch.cpp:1309 estimateBit / TEncSbac.h:160 estBit);
    # every static approximation measurably misprices candidates (init
    # +10.86%, two-pass +12.98% BD).  Here each CTB row carries aggregate
    # bin counts (sig per TU size, greater1/greater2, cbf) as one more
    # skewed state buffer; a row inherits the row above's state at its
    # first CTB (causal under the wavefront: the upper row has finished
    # its 2nd CTB - WPP semantics), and per-slot micro-bit DELTAS derived
    # from the counts via an integer -log2 lookup (platform-invariant)
    # feed the fused trial kernels additively.  Encoder-side only: rate
    # ESTIMATES steer decisions, serialization stays the exact CABAC.
    if rate_evolve:
        if halo_axis is not None or ctb != 32:
            raise NotImplementedError(
                "rate_evolve ships for single-device CTB-32 first")
        if fused_impl is None:
            raise ValueError("rate_evolve requires the fused unit path")
        _i = np.arange(64)
        RS_LUT0 = np.round(-np.log2(1.0 - (_i + 0.5) / 64.0)
                           * 256.0).astype(np.int32)
        RS_LUT1 = np.round(-np.log2((_i + 0.5) / 64.0)
                           * 256.0).astype(np.int32)
        _mb = lambda v: int(round(float(v) * 256.0))
        # Class order: sig4, sig8, sig16, sig32, g1, g2, cbf, (pad).
        RS_STAT0 = np.array(
            [_mb(np.mean(size_consts[4]["sig0"])),
             _mb(np.mean(size_consts[8]["sig0"])),
             _mb(np.mean(size_consts[16]["sig0"])),
             _mb(np.mean(size_consts[32]["sig0"])),
             _mb(SB["g1_0"]), _mb(SB["g2_0"]), _mb(SB["cbf0"]), 0],
            np.int32)
        RS_STAT1 = np.array(
            [_mb(np.mean(size_consts[4]["sig1"])),
             _mb(np.mean(size_consts[8]["sig1"])),
             _mb(np.mean(size_consts[16]["sig1"])),
             _mb(np.mean(size_consts[32]["sig1"])),
             _mb(SB["g1_1"]), _mb(SB["g2_1"]), _mb(SB["cbf1"]), 0],
            np.int32)
        RS_TMIN = 32

    def filter_refs(n, ref_top, ref_left):
        corner = ref_top[0]
        top = ref_top[1:]
        left = ref_left[1:]
        ext_t = jnp.concatenate([left[:1], ref_top])
        f_top_vals = (ext_t[:-2] + 2 * ext_t[1:-1] + ext_t[2:] + 2) >> 2
        f_top = jnp.concatenate([f_top_vals[:2 * n], top[2 * n - 1:]])
        ext_l = jnp.concatenate([top[:1],
                                 jnp.concatenate([corner[None], left])])
        f_left_vals = (ext_l[:-2] + 2 * ext_l[1:-1] + ext_l[2:] + 2) >> 2
        f_left = jnp.concatenate([f_top[:1], f_left_vals[1:2 * n],
                                  left[2 * n - 1:]])
        if n == 32:
            # Strong (bilinear) intra smoothing, normative at 32x32 when
            # the reference rows are near-linear (TComPattern.cpp:415-470).
            thr = 1 << 3
            bl = left[2 * n - 1]
            tr = top[2 * n - 1]
            cond = jnp.logical_and(
                jnp.abs(bl + corner - 2 * left[n - 1]) < thr,
                jnp.abs(corner + tr - 2 * top[n - 1]) < thr)
            i = jnp.arange(1, 2 * n)
            s_top = jnp.concatenate([
                corner[None],
                ((2 * n - i) * corner + i * tr + n) >> 6,
                tr[None]])
            s_left = jnp.concatenate([
                corner[None],
                ((2 * n - i) * corner + i * bl + n) >> 6,
                bl[None]])
            f_top = jnp.where(cond, s_top, f_top)
            f_left = jnp.where(cond, s_left, f_left)
        return f_top, f_left

    def predict35(n, ref_top, ref_left):
        c = size_consts[n]
        comb = jnp.concatenate([ref_top, ref_left])
        ang = (((32 - jnp.asarray(c["frac"])) * comb[jnp.asarray(c["g0"])]
                + jnp.asarray(c["frac"]) * comb[jnp.asarray(c["g1"])] + 16)
               >> 5)
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
            dc_blk = dc_blk.at[0, 0].set(
                (top_w[0] + left_w[0] + 2 * dc + 2) >> 2)
        s = n.bit_length() - 1
        T = top_w[None, :]
        L = left_w[:, None]
        TR = ref_top[n + 1]
        BL = ref_left[n + 1]
        xs = jnp.arange(n)[None, :]
        ys = jnp.arange(n)[:, None]
        planar = (((L << s) + n + (xs + 1) * (TR - L))
                  + ((T << s) + (ys + 1) * (BL - T))) >> (s + 1)
        return jnp.concatenate([planar[None], dc_blk[None], ang], axis=0)

    def fwd_t(n, resi):
        c = size_consts[n]
        t = jnp.asarray(c["t_fwd"])
        add1 = 1 << (c["shift1"] - 1)
        add2 = 1 << (c["shift2"] - 1)
        a = (jnp.einsum("min,kn->mik", resi, t) + add1) >> c["shift1"]
        hi, lo = a >> 8, a & 255
        hs = jnp.einsum("ki,mil->mkl", t, hi)
        ls = jnp.einsum("ki,mil->mkl", t, lo)
        return (hs + ((ls + add2) >> 8)) >> (c["shift2"] - 8)

    def inv_t(n, coeff):
        t = jnp.asarray(size_consts[n]["t_inv"])
        e = jnp.clip((jnp.einsum("ki,mkl->mil", t, coeff) + 64) >> 7,
                     -32768, 32767)
        return jnp.clip((jnp.einsum("mik,kn->min", e, t) + (1 << 11)) >> 12,
                        -32768, 32767)

    # All decision-steering rate/distortion REDUCTIONS below run in fixed-
    # point int32: float reductions are not reduction-order invariant, and
    # XLA orders them differently in differently-shaped programs (batch
    # width, shard_map halo variant) - measured as rare 1-ulp cost ties that
    # flipped mode/structure decisions between the sharded and single-device
    # encoders.  Integer sums are associative, so every program shape
    # decides identically.  MB = micro-bits per bit, DS = distortion scale.
    MB = 256.0
    DS = 4.0
    SBI = {k: jnp.int32(round(v * MB)) for k, v in SB.items()}

    def level_mbits(lvl):
        """Micro-bit (int32) cost of a nonzero level (sign included).

        greater1/greater2 flags + the HM Golomb-Rice escape at rice 0
        (syntax._ic_rate structure with c1/c2 available, EG0 tail).

        The Golomb tail's floor(log2) is computed by integer compares, not
        float log2: exhaustively equal over the whole level range, and it
        keeps the fused Pallas twin (ops/unit_fused.py) bit-identical
        without depending on two libm implementations agreeing."""
        s = lvl - 3
        m = jnp.maximum(s - 2, 1)
        g = jnp.zeros_like(lvl)
        for j in range(1, 16):
            g = g + jnp.where(m >= (1 << j), 1, 0)
        golomb = jnp.where(s < 3, s + 1, 4 + 2 * g)
        mb = jnp.int32(round(MB)) + jnp.where(
            lvl == 1, SBI["g1_0"],
            jnp.where(lvl == 2, SBI["g1_1"] + SBI["g2_0"],
                      SBI["g1_1"] + SBI["g2_1"]
                      + golomb * jnp.int32(round(MB))))
        return mb

    def level_bits(lvl):
        return level_mbits(lvl).astype(jnp.float32) * (1.0 / MB)

    def quantize_rd(n, coeff):
        """Vectorized RDOQ-lite + structure-aware TU rate.

        TIMING STUB (CANP_STUB_RDOQ).
        import os
        if os.environ.get("CANP_STUB_RDOQ"):
            q = jnp.clip(coeff >> 6, -4, 4)
            return q, jnp.sum(jnp.abs(q), axis=(1, 2)).astype(jnp.float32)

        Per-coefficient level choice among {round-half-up, -1, 0} minimizing
        coeff-domain distortion + lambda*bits (HM xGetCodedLevel's candidate
        set), then an all-zero CBF trade-off with last-position /
        coded-sub-block / sig-flag accounting in scan order.  Returns
        (q raster (n_modes,n,n), tu_bits (n_modes,)).
        """
        import os as _os

        c = size_consts[n]
        N = n * n
        qstep = float(2.0 ** c["qbits"])
        sg = jnp.asarray(c["sg"])
        inv_sg = jnp.asarray(c["inv_sg"])
        sig0 = jnp.asarray(c["sig0"])
        sig1 = jnp.asarray(c["sig1"])
        flat = coeff.reshape(n_modes, N)
        matmul_scan = bool(_os.environ.get("CANP_MATMUL_GATHERS"))
        if matmul_scan:
            # Permutation matmul instead of take_along_axis: identical
            # integers (one term per output), Mosaic-expressible.
            pmat = jnp.asarray(c["scan_p"], jnp.int32)
            if pmat.ndim == 2:
                cs = jnp.einsum("sp,mp->ms", pmat, flat)
            else:
                cs = jnp.einsum("msp,mp->ms", pmat, flat)
        else:
            cs = jnp.take_along_axis(flat, sg, axis=1)    # scan order
        sign = jnp.sign(cs)
        ldf = jnp.abs(cs).astype(jnp.float32) * float(qscale)
        ma = jnp.minimum(jnp.floor(ldf / qstep + 0.5), 32767.0)
        lo = jnp.maximum(ma - 1.0, 1.0)

        def coded_cost(lvl):
            err = ldf - lvl * qstep
            return (err * err * c["err_scale"]
                    + lam * (sig1 + level_bits(lvl.astype(jnp.int32))))

        d0 = ldf * ldf * c["err_scale"]
        cost0 = d0 + lam * sig0
        cost_hi = coded_cost(ma)
        cost_lo = coded_cost(lo)
        pick_lo = cost_lo < cost_hi
        lvl_nz = jnp.where(pick_lo, lo, ma)
        cost_nz = jnp.where(pick_lo, cost_lo, cost_hi)
        nz = jnp.logical_and(ma > 0, cost_nz < cost0)
        lvl = jnp.where(nz, lvl_nz, 0.0).astype(jnp.int32)

        # Structure-aware TU rate of the decided levels (micro-bit int32
        # sums: reduction-order invariant, see MB/DS note above).
        sig0_i = jnp.round(sig0 * MB).astype(jnp.int32)
        sig1_i = jnp.round(sig1 * MB).astype(jnp.int32)
        i = jnp.arange(N)
        last = jnp.max(jnp.where(lvl > 0, i[None], -1), axis=1)  # (n_modes,)
        cbf = last >= 0
        sig_paid = i[None] < last[:, None]
        ncg = max(N // 16, 1)
        if ncg > 1:
            cgnz = jnp.any((lvl > 0).reshape(n_modes, ncg, 16), axis=2)
            lastcg = last >> 4
            cgi = jnp.arange(ncg)
            csb_paid = jnp.logical_and(cgi[None] > 0,
                                       cgi[None] < lastcg[:, None])
            csb_mb = jnp.sum(
                jnp.where(csb_paid,
                          jnp.where(cgnz, SBI["csb1"], SBI["csb0"]), 0),
                axis=1)
            cg_coded = (cgi[None] == 0) | (cgi[None] == lastcg[:, None]) \
                | cgnz
            sig_paid = jnp.logical_and(
                sig_paid, jnp.repeat(cg_coded, 16, axis=1))
        else:
            csb_mb = jnp.zeros((n_modes,), jnp.int32)
        sig_mb = jnp.sum(
            jnp.where(sig_paid,
                      jnp.where(lvl > 0, sig1_i, sig0_i), 0), axis=1)
        lvl_mb = jnp.sum(jnp.where(lvl > 0, level_mbits(lvl), 0), axis=1)
        lastx_i = jnp.round(jnp.asarray(c["lastx"]) * MB).astype(jnp.int32)
        lasty_i = jnp.round(jnp.asarray(c["lasty"]) * MB).astype(jnp.int32)
        if matmul_scan:
            lsel = (i[None] == jnp.maximum(last, 0)[:, None])
            last_raster = jnp.sum(jnp.where(lsel, sg, 0), axis=1)
            lxsel = (jnp.arange(n)[None] == (last_raster % n)[:, None])
            lysel = (jnp.arange(n)[None] == (last_raster // n)[:, None])
            lb_mb = (jnp.sum(jnp.where(lxsel, lastx_i[None], 0), axis=1)
                     + jnp.sum(jnp.where(lysel, lasty_i[None], 0), axis=1))
        else:
            last_raster = jnp.take_along_axis(
                sg, jnp.maximum(last, 0)[:, None], axis=1)[:, 0]
            lb_mb = lastx_i[last_raster % n] + lasty_i[last_raster // n]
        mb_coded = SBI["cbf1"] + lb_mb + csb_mb + sig_mb + lvl_mb
        bits_coded = mb_coded.astype(jnp.float32) * (1.0 / MB)
        # All-zero option: compare in the coeff-distortion domain, with the
        # per-coefficient distortions snapped to the DS grid (elementwise)
        # so the sums are exact int32.
        dc_el = jnp.where(lvl > 0,
                          (ldf - lvl.astype(jnp.float32) * qstep) ** 2
                          * c["err_scale"], d0)
        d_coded = jnp.sum(jnp.round(dc_el * DS).astype(jnp.int32),
                          axis=1).astype(jnp.float32) * (1.0 / DS)
        d_zero = jnp.sum(jnp.round(d0 * DS).astype(jnp.int32),
                         axis=1).astype(jnp.float32) * (1.0 / DS)
        zero_cost = d_zero + lam * SB["cbf0"]
        keep = jnp.logical_and(
            cbf, d_coded + lam * bits_coded < zero_cost)
        lvl = jnp.where(keep[:, None], lvl, 0)
        tu_bits = jnp.where(keep, bits_coded, SB["cbf0"])

        # ---- sign-data hiding (device-side, normative) ----
        # Per CG with span >= SBH_THRESHOLD(4) the serializer omits the sign
        # of the first (forward-scan) nonzero; the decoder infers it from the
        # parity of the CG's level sum.  The parity must therefore be fixed
        # HERE, before dequant, so device reconstruction == decode.  HM does
        # this in the RDOQ tail (TComTrQuant.cpp:2533-2660); we pick the
        # cheapest +/-1 adjustment under the same cost model.
        ncg16 = max(N // 16, 1)
        lvr = lvl.reshape(n_modes, ncg16, 16)
        sgr = sign.reshape(n_modes, ncg16, 16)
        ldr = ldf.reshape(n_modes, ncg16, 16)
        pos = jnp.arange(16)
        nzr = lvr > 0
        firstp = jnp.min(jnp.where(nzr, pos, 16), axis=2)
        lastp = jnp.max(jnp.where(nzr, pos, -1), axis=2)
        span_ok = (lastp - firstp) >= 4
        parity = jnp.sum(lvr, axis=2) & 1
        if matmul_scan:
            fsel = (pos[None, None] == jnp.clip(firstp, 0, 15)[..., None])
            sfirst = jnp.sum(jnp.where(fsel, sgr, 0), axis=2)
        else:
            sfirst = jnp.take_along_axis(
                sgr, jnp.clip(firstp, 0, 15)[..., None], axis=2)[..., 0]
        want = (sfirst < 0).astype(jnp.int32)
        mismatch = jnp.logical_and(span_ok, parity != want)

        def dcost(new_lvl, old_lvl):
            dn = ((ldr - new_lvl.astype(jnp.float32) * qstep) ** 2
                  - (ldr - old_lvl.astype(jnp.float32) * qstep) ** 2)
            return (dn * c["err_scale"]
                    + lam * (level_bits(new_lvl) - level_bits(old_lvl)))

        big = jnp.float32(1e30)
        up = jnp.where(nzr, dcost(lvr + 1, lvr), big)
        dn = jnp.where(lvr >= 2, dcost(lvr - 1, lvr), big)
        best_adj = jnp.minimum(up, dn)
        pick = jnp.argmin(best_adj, axis=2)
        if matmul_scan:
            psel = (pos[None, None] == pick[..., None])
            up_p = jnp.sum(jnp.where(psel, up, 0.0), axis=2)
            dn_p = jnp.sum(jnp.where(psel, dn, 0.0), axis=2)
            delta = jnp.where(up_p <= dn_p, 1, -1)
        else:
            delta = jnp.where(
                jnp.take_along_axis(up, pick[..., None], 2)[..., 0]
                <= jnp.take_along_axis(dn, pick[..., None], 2)[..., 0],
                1, -1)
        onehot = (pos[None, None] == pick[..., None]).astype(jnp.int32)
        lvr = lvr + jnp.where(mismatch[..., None], onehot * delta[..., None],
                              0)
        lvl = lvr.reshape(n_modes, N)
        # Rate effect: one sign bit saved per hidden CG (the +/-1 level
        # adjustment's own cost is second-order for mode ranking).
        tu_bits = tu_bits - jnp.sum(
            jnp.where(span_ok, 1, 0), axis=1).astype(jnp.float32)

        q_scan = sign * lvl
        if matmul_scan:
            pmat = jnp.asarray(c["scan_p"], jnp.int32)
            if pmat.ndim == 2:
                q = jnp.einsum("sp,ms->mp", pmat, q_scan)
            else:
                q = jnp.einsum("msp,ms->mp", pmat, q_scan)
            q = q.reshape(n_modes, n, n)
        else:
            q = jnp.take_along_axis(q_scan, inv_sg,
                                    axis=1).reshape(n_modes, n, n)
        return q, tu_bits

    def step(state, t):
        if rate_evolve:
            (frame_sk, recon_sk, mode8_sk, c8_sk, rs_sk) = state
        else:
            (frame_sk, recon_sk, mode8_sk, c8_sk) = state
            rs_sk = None
        if halo_axis is not None:
            d = jax.lax.axis_index(halo_axis)
            t_loc = t - 2 * sby * d     # global schedule, stripe offset
            sel = jnp.where(d > 0, 1, 0)
        else:
            t_loc = t
            sel = 0
        ws = jnp.maximum(t_loc, 0) * ctb
        work = jax.lax.dynamic_slice(
            recon_sk, (0, 0, ws), (n_planes * NF, PH, WIN))
        slots = jnp.arange(b_eff)
        by0 = jnp.maximum(0, -((sbx - 1 - t_loc) // 2))
        # Composite (slot, frame) axis, ordered so plane indices
        # (by * NF + f) are contiguous across it.
        by_ids = by0 + jnp.repeat(jnp.arange(b_max), NF)
        f_ids = jnp.tile(jnp.arange(NF), b_max)
        bx_ids = t_loc - 2 * by_ids

        rate_rows_by_n = {4: None, 8: None, 16: None, 32: None}
        if rate_evolve:
            # WPP inherit: a slot entering its row (bx == 0) adopts the
            # row above's state (plane - NF; the halo plane's zeros for
            # the top row), which at step t has coded its 2nd CTB.
            above = jax.lax.dynamic_slice(
                rs_sk, ((by0 + ROW0 - 1) * NF, 0, 0), (b_eff, 8, 16))
            cur = jax.lax.dynamic_slice(
                rs_sk, ((by0 + ROW0) * NF, 0, 0), (b_eff, 8, 16))
            inh = jnp.where((bx_ids == 0)[:, None, None], above, cur)
            rs_sk = jax.lax.dynamic_update_slice(
                rs_sk, inh, ((by0 + ROW0) * NF, 0, 0))
            rs_row = inh[:, 0, :]                      # (b_eff, 16)
            n0s = rs_row[:, 0::2]
            n1s = rs_row[:, 1::2]                      # (b_eff, 8)
            tot = n0s + n1s
            ridx = jnp.clip((n1s * 64) // jnp.maximum(tot, 1), 0, 63)
            l0 = jnp.take(jnp.asarray(RS_LUT0), ridx)
            l1 = jnp.take(jnp.asarray(RS_LUT1), ridx)
            act = tot >= RS_TMIN
            rd0 = jnp.where(act, l0 - jnp.asarray(RS_STAT0)[None], 0)
            rd1 = jnp.where(act, l1 - jnp.asarray(RS_STAT1)[None], 0)

            def _rrows(si):
                return jnp.stack(
                    [rd0[:, si], rd1[:, si], rd0[:, 4], rd1[:, 4],
                     rd0[:, 5], rd1[:, 5], rd0[:, 6], rd1[:, 6]]
                ).astype(jnp.int32)

            rate_rows_by_n = {nsz: _rrows(i)
                              for i, nsz in enumerate((4, 8, 16, 32))}

        def refs_for_b(n, recon_now, ly, lx):
            """Batched bit-exact HM reference arrays for all slots.

            Two contiguous strip fetches (the 1-px L: row y-1 incl. corner
            and above-right, column x-1) + a per-class one-hot matmul that
            applies HM's availability substitution — dense vector math in
            place of a big-index gather (which the TPU serializes on the
            scalar core; profiled ~12 ms/step at 1080p for the 32x32 trial
            alone)."""
            c = size_consts[n]
            un = ctb // n
            by_n = jnp.clip(by_ids * un + ly // n, 0, height // n - 1)
            bx_n = jnp.clip(bx_ids * un + lx // n, 0, width // n - 1)
            cls = jnp.asarray(c["smap"])[sel, by_n, bx_n]
            up = jnp.where(ly == 0, 1, 0)
            row_above = jax.lax.dynamic_slice(
                recon_now,
                ((by0 + ROW0 - up) * NF,
                 jnp.where(ly == 0, ctb - 1, ly - 1),
                 lx - 1 - 2 * ctb * up + OFF),
                (b_eff, 1, 2 * n + 1))[:, 0, :]
            col_left = jax.lax.dynamic_slice(
                recon_now,
                ((by0 + ROW0) * NF, ly, lx - 1 + OFF),
                (b_eff, 2 * n, 1))[:, :, 0]
            raw = jnp.concatenate(
                [row_above, col_left,
                 jnp.full((b_eff, 1), 128, jnp.int32)], axis=1)
            m = jnp.asarray(c["onehot"])[cls].astype(jnp.int32)
            refs = jnp.einsum("bso,bo->bs", m, raw)
            s = 2 * n + 1
            return refs[:, :s], refs[:, s:]

        def mode_bits_b(n, mode8_now, ly, lx):
            """MPM-aware per-slot mode-bit estimates (b, n_modes); the
            8-granularity mode map is read with two box slices."""
            ly8 = ly // 8
            x8i = t_loc * cu8 + lx // 8 + OFF8
            lm_read = jax.lax.dynamic_slice(
                mode8_now, (by0 * NF, ly8, x8i - 1), (b_eff, 1, 1))[:, 0, 0]
            left_gate = (bx_ids * ctb + lx) >= 8
            lm = jnp.where(left_gate, lm_read, 1)
            # The mode map is kept at 8-granularity; 4x4 sub-blocks whose
            # top edge is not 8-aligned would read across the CTB row for
            # top cells — gate to DC so the estimate is sharding-invariant
            # (ly >= 8 also excludes the stripe-top row, y % ctb == 0).
            above_ok = jnp.logical_and(ly >= 8, (ly % 8) == 0)
            am_read = jax.lax.dynamic_slice(
                mode8_now, (by0 * NF, jnp.maximum(ly8 - 1, 0), x8i),
                (b_eff, 1, 1))[:, 0, 0]
            am = jnp.where(above_ok, am_read, 1)
            same = lm == am
            mpm_same = jnp.where(
                lm > 1,
                jnp.stack([lm, ((lm + 29) % 32) + 2, ((lm - 1) % 32) + 2]),
                jnp.stack([jnp.zeros_like(lm), jnp.ones_like(lm),
                           jnp.full_like(lm, 26)]))
            m2 = jnp.where(jnp.logical_and(lm != 0, am != 0), 0,
                           jnp.where(lm + am < 2, 26, 1))
            mpms = jnp.where(same, mpm_same, jnp.stack([lm, am, m2]))
            ids = jnp.arange(35)[:, None]
            is0 = ids == mpms[0][None]
            ismpm = is0 | (ids == mpms[1][None]) | (ids == mpms[2][None])
            base = jnp.where(is0, MODE_BITS[0],
                             jnp.where(ismpm, MODE_BITS[1],
                                       MODE_BITS[3])).T    # (b, 35)
            if n_modes == 36:
                # Every normal mode pays pnns_flag=0; PNNS pays only the
                # flag (TEncSbac::codeIntraDirLumaAng switch bin order).
                return jnp.concatenate(
                    [base + SB["pnns0"],
                     jnp.full((b_eff, 1), SB["pnns1"], jnp.float32)], axis=1)
            return base

        def nn_predict_b(n, recon_now, ly, lx):
            """Batched normative PNN predictions (b, n, n): two box slices
            from the evolving skewed reconstruction, per-class strip masks,
            one quantized forward over all slots (order-invariant, hence
            bit-exact vs the sequential host decoder)."""
            c = size_consts[n]
            un = ctb // n
            by_n = jnp.clip(by_ids * un + ly // n, 0, height // n - 1)
            bx_n = jnp.clip(bx_ids * un + lx // n, 0, width // n - 1)
            cls = jnp.asarray(c["nn_cmap"])[sel, by_n, bx_n]
            ok = jnp.asarray(c["nn_ok_c"])[cls]
            am = jnp.asarray(c["nn_am_c"])[cls]
            lmk = jnp.asarray(c["nn_lm_c"])[cls]
            mean = c["nn_mean"]
            up = jnp.where(ly == 0, 1, 0)        # planes up for the above
            pa = (by0 + ROW0 - up) * NF
            lya = jnp.where(ly == 0, ctb - n, ly - n)
            xa = lx - n - 2 * ctb * up + OFF
            above_pix = jax.lax.dynamic_slice(
                recon_now, (pa, lya, xa), (b_eff, n, 3 * n))
            left_pix = jax.lax.dynamic_slice(
                recon_now, ((by0 + ROW0) * NF, ly, lx - n + OFF),
                (b_eff, 2 * n, n))
            above_f = (above_pix.astype(jnp.float32) - mean) * am[:, None, :]
            left_f = (left_pix.astype(jnp.float32) - mean) * lmk[:, :, None]
            if c["nn_fc"]:
                inp = jnp.concatenate([above_f.reshape(b_eff, -1),
                                       left_f.reshape(b_eff, -1)], axis=1)
            else:
                inp = (above_f[..., None], left_f[..., None])
            pred = pnn_q.predict_pixels_q(c["nn_q"], inp, n, c["nn_fc"],
                                          mean)
            # Context unavailable -> zeros (TComPrediction.cpp:645-663).
            return jnp.where(ok[:, None, None], pred, 0)

        def encode_unit_b(n, recon_now, mode8_now, ly, lx):
            """n_modes-mode trial of the n x n units at in-CTB offset
            (ly, lx) for every slot; returns (cost, mode, rec, q), each with
            leading slot axis.  cost = SSE + lambda * (mode + calibrated TU
            bits), excluding structure flags (added per tree option)."""
            c = size_consts[n]
            if "fused" in c:
                from ..ops import unit_fused
                ref_top, ref_left = refs_for_b(n, recon_now, ly, lx)
                nn_pred = None
                if n in nn_widths and policy != "regular":
                    nn_pred = nn_predict_b(n, recon_now, ly, lx)
                elif n_modes == 36:
                    nn_pred = jnp.zeros((b_eff, n, n), jnp.int32)
                orig = jax.lax.dynamic_slice(
                    frame_sk, (by0 * NF, ly, t_loc * ctb + lx + OFF),
                    (b_eff, n, n))
                mbits = mode_bits_b(n, mode8_now, ly, lx)
                return unit_fused.trial_apply(
                    c["fused"], ref_top, ref_left, orig, mbits, nn_pred,
                    impl=fused_impl, rate_rows=rate_rows_by_n[n])
            ref_top, ref_left = refs_for_b(n, recon_now, ly, lx)
            f_top, f_left = jax.vmap(
                lambda a, b: filter_refs(n, a, b))(ref_top, ref_left)
            preds_u = jax.vmap(
                lambda a, b: predict35(n, a, b))(ref_top, ref_left)
            preds_f = jax.vmap(
                lambda a, b: predict35(n, a, b))(f_top, f_left)
            uf = jnp.asarray(c["use_filt"])[None, :, None, None]
            preds = jnp.where(uf, preds_f, preds_u)
            if n in nn_widths:
                nn_pred = nn_predict_b(n, recon_now, ly, lx)
                if policy == "substitution":
                    preds = preds.at[:, 18].set(nn_pred)
                else:
                    preds = jnp.concatenate([preds, nn_pred[:, None]], 1)
            elif n_modes == 36:
                # Switch without a model at this width: PNNS decodes to the
                # zero prediction (never competitive, but normative).
                preds = jnp.concatenate(
                    [preds, jnp.zeros((b_eff, 1, n, n), jnp.int32)], 1)
            orig = jax.lax.dynamic_slice(
                frame_sk, (by0 * NF, ly, t_loc * ctb + lx + OFF),
                (b_eff, n, n))
            resi = orig[:, None] - preds
            coeff = jax.vmap(lambda r: fwd_t(n, r))(resi)
            q, tu_bits = jax.vmap(lambda co: quantize_rd(n, co))(coeff)
            if c["iq_shift"] > 0:
                deq = (q * iq_scale + (1 << (c["iq_shift"] - 1))) \
                    >> c["iq_shift"]
            else:
                deq = (q * iq_scale) << (-c["iq_shift"])
            deq = jnp.clip(deq, -32768, 32767)
            rec = jnp.clip(preds + jax.vmap(lambda dq: inv_t(n, dq))(deq),
                           0, 255)
            sse = jnp.sum((rec - orig[:, None]) ** 2,
                          axis=(2, 3)).astype(jnp.float32)
            cost = sse + lam * (tu_bits
                                + mode_bits_b(n, mode8_now, ly, lx))
            best = jnp.argmin(cost, axis=1).astype(jnp.int32)
            rec_b = jnp.take_along_axis(
                rec, best[:, None, None, None], axis=1)[:, 0]
            q_b = jnp.take_along_axis(
                q, best[:, None, None, None], axis=1)[:, 0]
            cost_b = jnp.take_along_axis(cost, best[:, None], axis=1)[:, 0]
            return cost_b, best, rec_b, q_b, jnp.zeros((b_eff, 8),
                                                       jnp.int32)

        def commit_box(buf, upd, p0, r0, c0, cond=None):
            """One contiguous box commit for all slots.  Invalid slots'
            boxes land in void/padding regions no valid read touches, so no
            masking is needed; `cond` blends value-dependent commits."""
            if cond is not None:
                cur = jax.lax.dynamic_slice(buf, (p0, r0, c0), upd.shape)
                expand = (slice(None),) + (None,) * (upd.ndim - 1)
                upd = jnp.where(cond[expand], upd, cur)
            return jax.lax.dynamic_update_slice(buf, upd, (p0, r0, c0))

        def commit_rec(work_, rec, ly, lx, cond=None):
            return commit_box(work_, rec, (by0 + ROW0) * NF, ly,
                              lx + OFF, cond)

        def commit_cell8(buf, vals, ly, lx, cond=None):
            return commit_box(buf, vals[:, None, None], by0 * NF, ly // 8,
                              t_loc * cu8 + lx // 8 + OFF8, cond)

        def commit_mode_fill(mode8_sk, modes, ly, lx, k, cond):
            fill = jnp.broadcast_to(modes[:, None, None], (b_eff, k, k))
            return commit_box(mode8_sk, fill, by0 * NF, ly // 8,
                              t_loc * cu8 + lx // 8 + OFF8, cond)

        # The quadrant / z-cell / 4x4-sub-block chains are lax.scans (not
        # Python loops): the per-step HLO holds ONE instance of each
        # encode_unit size instead of 85, which keeps XLA compile time and
        # program size bounded (NOTES_ROUND1 §4 compile-budget issue).
        # `encode_ctb32` is the complete 32-root quadtree pipeline at pixel
        # offset (oy, ox) inside the schedule CTB: (0, 0) when ctb == 32,
        # a z-quadrant corner of a 64 CTB when ctb == 64.
        #
        # The decided mode/level/structure grids are NOT program state:
        # their write positions depend only on the static schedule, so each
        # sub-stage EMITS its per-slot decisions as scan outputs and the
        # host assembles the grids for free.  Only buffers later sub-stages
        # READ stay carried: the reconstruction, the 8-granularity mode map
        # (MPM context), and the 8x8 cell costs.
        def encode_ctb32(carry, oy, ox):
            (work, mode8_sk, c8_sk) = carry

            def quad_body(qc, quad):
                recon_, mode8_, c8_, qsum, qa4, qa8, qa16 = qc
                qdx, qdy = quad & 1, quad >> 1

                def z_body(zc, z):
                    """One 8x8 cell: 2Nx2N vs NxN (four DST 4x4 PUs,
                    TEncSearch.cpp:2295-2303)."""
                    recon_, mode8_, c8_, zb4, zb8 = zc
                    ly8 = oy + (qdy * 2 + (z >> 1)) * 8
                    lx8 = ox + (qdx * 2 + (z & 1)) * 8

                    ys = {}
                    if enable_nxn:
                        # NxN: 4x4s predict from the evolving reconstruction
                        # (the decoder reconstructs them in the same
                        # z-order); if 2Nx2N wins, its rec overwrites the
                        # whole cell, so the temporary 4x4 commits never
                        # leak outside it.
                        def s4_body(sc, s4):
                            recon4, cost_nxn, last_m4, cn4s = sc
                            ly4 = ly8 + (s4 >> 1) * 4
                            lx4 = lx8 + (s4 & 1) * 4
                            c4, m4b, rec4, q4b, cn4 = encode_unit_b(
                                4, recon4, mode8_, ly4, lx4)
                            recon4 = commit_rec(recon4, rec4, ly4, lx4)
                            cn4s = cn4s + cn4
                            # Narrow transfer dtypes: modes/flags fit int8,
                            # levels int16 (|level| <= 32767) - the
                            # device->host ys stream halves (the axon
                            # tunnel moves ~30 MB/s).
                            return ((recon4, cost_nxn + c4, m4b, cn4s),
                                    {"m4": m4b.astype(jnp.int8),
                                     "q4": q4b.astype(jnp.int16)})

                        # Inits derive from the (sharded, hence varying)
                        # frame so the scan carry matches the outputs'
                        # varying manual axes under shard_map.
                        z0 = frame_sk[0, 0, 0] * 0
                        (recon_, cost_nxn, last_m4, cnt_nxn), ys4 = \
                            jax.lax.scan(
                                s4_body,
                                (recon_,
                                 jnp.zeros((b_eff,), jnp.float32)
                                 + z0.astype(jnp.float32),
                                 jnp.zeros((b_eff,), jnp.int32) + z0,
                                 jnp.zeros((b_eff, 8), jnp.int32)
                                 + z0[None, None] * 0),
                                jnp.arange(4))
                        ys.update(ys4)
                        # The 8x8 2Nx2N trial reads only OUTSIDE the cell
                        # (its L-pattern and NN portions never overlap the
                        # 4x4 interior), so running it after the s4 chain
                        # is bit-identical - and keeps the reconstruction
                        # a single linear def-use chain XLA can update in
                        # place through the scan.
                        cost8, mode8b, rec8, q8b, cn8 = encode_unit_b(
                            8, recon_, mode8_, ly8, lx8)
                        use2n = (cost8 + lam * SB["part_2nx2n"]
                                 < cost_nxn + lam * SB["part_nxn"])
                        cell_cost = jnp.where(
                            use2n, cost8 + lam * SB["part_2nx2n"],
                            cost_nxn + lam * SB["part_nxn"])
                    else:
                        # Speed knob: 8x8 cells are always 2Nx2N leaves (the
                        # 4x4 z-chains are the critical-path hot spot).
                        cost8, mode8b, rec8, q8b, cn8 = encode_unit_b(
                            8, recon_, mode8_, ly8, lx8)
                        last_m4 = mode8b
                        cnt_nxn = jnp.zeros((b_eff, 8), jnp.int32)
                        use2n = jnp.ones_like(cost8, bool)
                        cell_cost = cost8 + lam * SB["part_2nx2n"]

                    recon_ = commit_rec(recon_, rec8, ly8, lx8, use2n)
                    # MPM context at 8-granularity: the 2Nx2N mode, or the
                    # bottom-right 4x4's mode when NxN wins.
                    mode8_ = commit_cell8(
                        mode8_, jnp.where(use2n, mode8b, last_m4), ly8, lx8)
                    c8_ = commit_cell8(c8_, cell_cost, ly8, lx8)
                    ys.update(m8=mode8b.astype(jnp.int8),
                              q8=q8b.astype(jnp.int16),
                              s8=jnp.where(use2n, 0, 1).astype(jnp.int8))
                    u2 = use2n[:, None]
                    zb4 = zb4 + jnp.where(u2, 0, cnt_nxn)
                    zb8 = zb8 + jnp.where(u2, cn8, 0)
                    return (recon_, mode8_, c8_, zb4, zb8), ys

                czero = (jnp.zeros((b_eff, 8), jnp.int32)
                         + frame_sk[0, 0, 0] * 0)
                (recon_, mode8_, c8_, zb4, zb8), ys_z = jax.lax.scan(
                    z_body, (recon_, mode8_, c8_, czero, czero),
                    jnp.arange(4))

                ly16 = oy + qdy * 16
                lx16 = ox + qdx * 16
                cost16, mode16, rec16, qq16, cn16 = encode_unit_b(
                    16, recon_, mode8_, ly16, lx16)

                # Fixed-order adds over the 2x2 cell costs (a 4-way float
                # reduce is not guaranteed order-stable across shapes).
                csub = jax.lax.dynamic_slice(
                    c8_, (by0 * NF, ly16 // 8,
                          t_loc * cu8 + lx16 // 8 + OFF8),
                    (b_eff, 2, 2))
                cost8s = (((csub[:, 0, 0] + csub[:, 0, 1]) + csub[:, 1, 0])
                          + csub[:, 1, 1]) + lam * SB["split1"]
                cost16f = cost16 + lam * SB["split0"]
                use16 = cost16f < cost8s
                qcost_q = jnp.where(use16, cost16f, cost8s)

                recon_ = commit_rec(recon_, rec16, ly16, lx16, use16)
                # Decided modes at 8-granularity feed later MPMs.
                mode8_ = commit_mode_fill(mode8_, mode16, ly16, lx16, 2,
                                          use16)
                ys = dict(ys_z)
                ys.update(m16=mode16.astype(jnp.int8),
                          q16=qq16.astype(jnp.int16),
                          s16=jnp.where(use16, 0, 1).astype(jnp.int8))
                u16 = use16[:, None]
                qa4 = qa4 + jnp.where(u16, 0, zb4)
                qa8 = qa8 + jnp.where(u16, 0, zb8)
                qa16 = qa16 + jnp.where(u16, cn16, 0)
                return (recon_, mode8_, c8_, qsum + qcost_q,
                        qa4, qa8, qa16), ys

            qzero = (jnp.zeros((b_eff, 8), jnp.int32)
                     + frame_sk[0, 0, 0] * 0)
            (work, mode8_sk, c8_sk, qsum, qa4, qa8, qa16), ys_q = \
                jax.lax.scan(
                    quad_body,
                    (work, mode8_sk, c8_sk,
                     jnp.zeros((b_eff,), jnp.float32)
                     + frame_sk[0, 0, 0].astype(jnp.float32) * 0,
                     qzero, qzero, qzero),
                    jnp.arange(4))

            # --- 32x32 candidate ---
            cost32, mode32, rec32, qq32, cn32 = encode_unit_b(
                32, work, mode8_sk, oy, ox)
            cost_quads = qsum + lam * SB["split1"]
            cost32f = cost32 + lam * SB["split0"]
            use32 = cost32f < cost_quads
            c32_best = jnp.where(use32, cost32f, cost_quads)

            work = commit_rec(work, rec32, oy, ox, use32)
            mode8_sk = commit_mode_fill(mode8_sk, mode32, oy, ox, 4, use32)

            ys = dict(ys_q)
            ys.update(m32=mode32.astype(jnp.int8),
                      q32=qq32.astype(jnp.int16),
                      s32=jnp.where(use32, 0, 1).astype(jnp.int8))
            if rate_evolve:
                u32 = use32[:, None]
                fb4 = jnp.where(u32, 0, qa4)
                fb8 = jnp.where(u32, 0, qa8)
                fb16 = jnp.where(u32, 0, qa16)
                fb32 = jnp.where(u32, cn32, 0)
                cnt_tree = (fb4, fb8, fb16, fb32)
            else:
                cnt_tree = None
            return (work, mode8_sk, c8_sk), c32_best, ys, cnt_tree

        carry = (work, mode8_sk, c8_sk)
        if ctb == 32:
            carry, _, ys_step, cnt_tree = encode_ctb32(carry, 0, 0)
            (work, mode8_sk, c8_sk) = carry
            if rate_evolve:
                fb4, fb8, fb16, fb32 = cnt_tree
                allb = fb4 + fb8 + fb16 + fb32
                upd = jnp.concatenate(
                    [fb4[:, 0:2], fb8[:, 0:2], fb16[:, 0:2], fb32[:, 0:2],
                     allb[:, 2:6],
                     allb[:, 7:8] - allb[:, 6:7], allb[:, 6:7],
                     jnp.zeros((b_eff, 2), jnp.int32)], axis=1)
                newrow = rs_row + upd
                n0n = newrow[:, 0::2]
                n1n = newrow[:, 1::2]
                # Exponential aging keeps the estimator adaptive (HM's
                # CABAC states have bounded memory too).
                big_t = (n0n + n1n) > 1024
                n0n = jnp.where(big_t, (n0n + 1) >> 1, n0n)
                n1n = jnp.where(big_t, (n1n + 1) >> 1, n1n)
                newrow = jnp.stack([n0n, n1n], axis=2).reshape(b_eff, 16)
                blk = jnp.concatenate(
                    [newrow[:, None, :],
                     jnp.zeros((b_eff, 7, 16), jnp.int32)], axis=1)
                rs_sk = jax.lax.dynamic_update_slice(
                    rs_sk, blk, ((by0 + ROW0) * NF, 0, 0))
        else:
            # --- CTB 64: four 32-quadrants in z-order, then a 64x64
            #     2Nx2N candidate (one signalled mode, four forced TU32s
            #     reconstructed per-TU exactly like HM's intra CU64,
            #     TEncCu.cpp:248 recursion / intra_main_rext.cfg depth 4) ---
            def quad64_body(qc, quad):
                carry, csum = qc
                qdx, qdy = quad & 1, quad >> 1
                carry, c32_best, ys32, _ = encode_ctb32(
                    carry, qdy * 32, qdx * 32)
                return (carry, csum + c32_best), ys32

            (carry, csum64), ys_sub = jax.lax.scan(
                quad64_body,
                (carry, jnp.zeros((b_eff,), jnp.float32)
                 + frame_sk[0, 0, 0].astype(jnp.float32) * 0),
                jnp.arange(4))
            (work, mode8_sk, c8_sk) = carry

            c32c = size_consts[32]
            uf35 = jnp.asarray(c32c["use_filt"])
            ufm = (jnp.concatenate([uf35, jnp.zeros((1,), bool)])
                   if n_modes == 36 else uf35)

            def predict_mode32(m, ref_top, ref_left):
                """Mode m's 32x32 prediction from ITS OWN references (the
                64-CU TU chain evolves per mode, so the all-modes-at-once
                `predict35` does not apply)."""
                comb = jnp.concatenate([ref_top, ref_left])
                mi = jnp.clip(m - 2, 0, 32)
                g0 = jnp.asarray(c32c["g0"])[mi]
                g1 = jnp.asarray(c32c["g1"])[mi]
                fr = jnp.asarray(c32c["frac"])[mi]
                ang = ((32 - fr) * comb[g0] + fr * comb[g1] + 16) >> 5
                top_w = ref_top[1:33]
                left_w = ref_left[1:33]
                dc = (jnp.sum(top_w) + jnp.sum(left_w) + 32) // 64
                dc_blk = jnp.full((32, 32), dc, jnp.int32)
                T = top_w[None, :]
                L = left_w[:, None]
                TR = ref_top[33]
                BL = ref_left[33]
                xs = jnp.arange(32)[None, :]
                ys = jnp.arange(32)[:, None]
                planar = (((L << 5) + 32 + (xs + 1) * (TR - L))
                          + ((T << 5) + (ys + 1) * (BL - T))) >> 6
                return jnp.where(m == 0, planar,
                                 jnp.where(m == 1, dc_blk, ang))

            patch = jnp.zeros((b_eff, n_modes, 64, 64), jnp.int32)
            qall = jnp.zeros((b_eff, n_modes, 64, 64), jnp.int32)
            cost64 = jnp.zeros((b_eff, n_modes), jnp.float32)
            for tz in range(4):       # static 4-iter python loop
                tdy, tdx = (tz >> 1) * 32, (tz & 1) * 32
                by_32 = jnp.clip(by_ids * 2 + (tz >> 1), 0,
                                 height // 32 - 1)
                bx_32 = jnp.clip(bx_ids * 2 + (tz & 1), 0, width // 32 - 1)
                cls = jnp.asarray(c32c["cmap"])[0, by_32, bx_32]
                trip = jnp.asarray(c32c["ctab"])[cls]
                dpl, lys, rxs = trip[:, 0], trip[:, 1], trip[:, 2]
                okd = dpl > -5
                plane = jnp.clip(by_ids[:, None] + ROW0 + dpl, 0,
                                 n_planes - 1) * NF + f_ids[:, None]
                wxi = jnp.clip(rxs, 0, WIN - 1)
                out_val = jnp.where(okd, work[plane, lys, wxi],
                                    128)                     # (b, S)
                # Composite source: per-mode patch inside the CU, committed
                # reconstruction outside (TU z-order == 32-block order, so
                # the same class tables apply).
                iy = dpl * 64 + lys                          # CU-relative
                ix = rxs - OFF - 128 * dpl
                inside = okd & (iy >= 0) & (iy < 64) & (ix >= 0) & (ix < 64)
                in_val = patch[slots[:, None], :, jnp.clip(iy, 0, 63),
                               jnp.clip(ix, 0, 63)]          # (b, S, modes)
                refs = jnp.where(inside[:, :, None], in_val,
                                 out_val[:, :, None])
                refs = jnp.moveaxis(refs, 2, 1)              # (b, modes, S)
                rt, rl = refs[..., :65], refs[..., 65:]
                ft, fl = jax.vmap(jax.vmap(
                    lambda a, b: filter_refs(32, a, b)))(rt, rl)
                rts = jnp.where(ufm[None, :, None], ft, rt)
                rls = jnp.where(ufm[None, :, None], fl, rl)
                preds = jax.vmap(lambda a, b: jax.vmap(predict_mode32)(
                    jnp.arange(n_modes), a, b))(rts, rls)
                orig = jax.lax.dynamic_slice(
                    frame_sk, (by0 * NF, tdy, t_loc * ctb + tdx + OFF),
                    (b_eff, 32, 32))
                resi = orig[:, None] - preds
                coeff = jax.vmap(lambda r: fwd_t(32, r))(resi)
                qq, tu_bits = jax.vmap(
                    lambda co: quantize_rd(32, co))(coeff)
                if c32c["iq_shift"] > 0:
                    deq = ((qq * iq_scale + (1 << (c32c["iq_shift"] - 1)))
                           >> c32c["iq_shift"])
                else:
                    deq = (qq * iq_scale) << (-c32c["iq_shift"])
                deq = jnp.clip(deq, -32768, 32767)
                rec = jnp.clip(
                    preds + jax.vmap(lambda dq: inv_t(32, dq))(deq), 0, 255)
                sse = jnp.sum((rec - orig[:, None]) ** 2,
                              axis=(2, 3)).astype(jnp.float32)
                cost64 = cost64 + sse + lam * tu_bits
                patch = jax.lax.dynamic_update_slice(
                    patch, rec, (0, 0, tdy, tdx))
                qall = jax.lax.dynamic_update_slice(
                    qall, qq, (0, 0, tdy, tdx))
            cost64 = cost64 + lam * mode_bits_b(64, mode8_sk, 0, 0)
            # The NN candidates are excluded at the 64 level (the decoder
            # would run the PNN per TU32 against the per-mode evolving
            # context; not picking them here is a legal encoder-side
            # restriction).
            big = jnp.float32(3e38)
            ids = jnp.arange(n_modes)[None]
            if policy == "substitution" and 32 in nn_widths:
                cost64 = jnp.where(ids == 18, big, cost64)
            if n_modes == 36:
                cost64 = jnp.where(ids == PNNS_MODE, big, cost64)
            best = jnp.argmin(cost64, axis=1).astype(jnp.int32)
            mode64 = best
            rec64 = jnp.take_along_axis(
                patch, best[:, None, None, None], axis=1)[:, 0]
            qq64 = jnp.take_along_axis(
                qall, best[:, None, None, None], axis=1)[:, 0]
            c64_best = jnp.take_along_axis(cost64, best[:, None],
                                           axis=1)[:, 0]
            use64 = c64_best + lam * SB["split0"] \
                < csum64 + lam * SB["split1"]

            work = commit_box(work, jnp.where(
                use64[:, None, None], rec64,
                jax.lax.dynamic_slice(
                    work, ((by0 + ROW0) * NF, 0, OFF),
                    (b_eff, 64, 64))), (by0 + ROW0) * NF, 0, OFF)
            mode8_sk = commit_mode_fill(mode8_sk, mode64, 0, 0, 8, use64)
            ys_step = dict(sub=ys_sub, m64=mode64.astype(jnp.int8),
                           q64=qq64.astype(jnp.int16),
                           s64=jnp.where(use64, 0, 1).astype(jnp.int8))

        # Write the committed CTB column back into the full skewed plane -
        # the only recon update of the step.
        recon_sk = jax.lax.dynamic_update_slice(
            recon_sk, jax.lax.dynamic_slice(
                work, (0, 0, OFF), (n_planes * NF, PH, ctb)),
            (0, 0, ws + OFF))

        if halo_axis is not None:
            # Causal halo over ICI: each stripe's bottom reconstruction
            # plane flows to the stripe below after every step, re-aligned
            # into the receiver's skew frame (receiver reads the halo at
            # x' = x - 2*ctb + OFF, sender stored it at
            # x' = x + 2*ctb*(sby-1) + OFF -> static roll by 2*ctb*sby).
            bottom = jax.lax.dynamic_slice(
                recon_sk, (ROW0 + sby - 1, 0, 0), (1, ctb, W_sk))[0]
            import os as _os
            if _os.environ.get("CANP_HALO_NOOP"):
                # Timing probe (scripts/measure_scaling_breakdown.py): same
                # program structure with the collective removed - outputs
                # are WRONG, only the compute/communication split is read.
                recv = bottom
            else:
                recv = jax.lax.ppermute(
                    bottom, halo_axis,
                    [(i, i + 1) for i in range(n_tiles - 1)])
            recv = jnp.roll(recv, -2 * ctb * sby, axis=1)
            keep = recon_sk[0, :ctb]
            new_halo = jnp.where(d == 0, keep, recv)
            recon_sk = jax.lax.dynamic_update_slice(
                recon_sk, new_halo[None], (0, 0, 0))

        if rate_evolve:
            return (frame_sk, recon_sk, mode8_sk, c8_sk, rs_sk), ys_step
        return (frame_sk, recon_sk, mode8_sk, c8_sk), ys_step

    def run(frame_u8):
        """Returns (recon int32, ys): recon is (height, width) for a single
        frame or (n_frames, height, width) for a batched build; ys is the
        pytree of per-step stacked decisions (leading axis n_steps, slot
        axis b_max * n_frames), assembled into the grid format by
        `_assemble_arrays` on the host."""
        frames = frame_u8.astype(jnp.int32)
        if frames.ndim == 2:
            frames = frames[None]
        zero = frames[0, 0, 0] * 0
        plane_list = []
        for by in range(sby):
            for f in range(NF):
                plane_list.append(jnp.pad(
                    frames[f, by * ctb:(by + 1) * ctb],
                    ((0, 0), (OFF + 2 * ctb * by,
                              W_sk - width - OFF - 2 * ctb * by))))
        frame_sk = jnp.concatenate(
            [jnp.stack(plane_list),
             jnp.zeros(((b_max - 1) * NF, ctb, W_sk), jnp.int32)], 0) + zero
        recon_sk = jnp.zeros((n_planes * NF, PH, W_sk), jnp.int32) + zero
        mode8_sk = jnp.full(((sby + b_max - 1) * NF, cu8, W8),
                            1, jnp.int32) + zero
        c8_sk = jnp.zeros(((sby + b_max - 1) * NF, cu8, W8), jnp.float32) \
            + zero.astype(jnp.float32)
        if rate_evolve:
            rs_sk0 = jnp.zeros((n_planes * NF, 8, 16), jnp.int32) + zero
            state = (frame_sk, recon_sk, mode8_sk, c8_sk, rs_sk0)
        else:
            state = (frame_sk, recon_sk, mode8_sk, c8_sk)
        state, ys = jax.lax.scan(step, state, jnp.arange(n_steps))
        recon_sk = state[1]
        outs = []
        for f in range(NF):
            out_rows = [jax.lax.slice(
                recon_sk[(ROW0 + by) * NF + f], (0, OFF + 2 * ctb * by),
                (ctb, OFF + 2 * ctb * by + width)) for by in range(sby)]
            outs.append(jnp.concatenate(out_rows, 0))
        recon = outs[0] if NF == 1 else jnp.stack(outs)
        return recon.astype(jnp.uint8), ys

    return run if halo_axis is not None else jax.jit(run)


def _schedule(sby, sbx, b_max, n_steps, t_offset=0):
    """Static wavefront schedule: (by, bx, valid), each (n_steps, b_max)."""
    ts = np.arange(n_steps) - t_offset
    by0 = np.maximum(0, -((sbx - 1 - ts) // 2))
    by = by0[:, None] + np.arange(b_max)[None, :]
    bx = ts[:, None] - 2 * by
    ok = (by < sby) & (bx >= 0) & (bx < sbx)
    return by, bx, ok


def _assemble_arrays(ys, height, width, ctb, t_offset=0):
    """Stacked per-step scan outputs -> the decided grid format.

    Every write position is a pure function of the static schedule, so the
    grids assemble on the HOST for free — no in-program scatters, no grid
    state carried through 10k sub-stages.  Returns the same tuple (minus
    recon) the round-3 device program produced.
    """
    def to_np(tree):
        if isinstance(tree, dict):
            return {k: to_np(v) for k, v in tree.items()}
        return np.asarray(tree)

    ys = to_np(ys)
    h4, w4 = height // 4, width // 4
    h8, w8 = height // 8, width // 8
    h16, w16 = height // 16, width // 16
    nby, nbx = height // 32, width // 32
    sby, sbx = height // ctb, width // ctb
    if ctb == 64:
        n_steps, b_max = ys["m64"].shape
    else:
        n_steps, b_max = ys["m32"].shape
    by, bx, ok = _schedule(sby, sbx, b_max, n_steps, t_offset)

    m8 = np.zeros((h8, w8), np.int32)
    q8 = np.zeros((h8, w8, 8, 8), np.int32)
    s8 = np.zeros((h8, w8), np.int32)
    m4 = np.zeros((h4, w4), np.int32)
    q4 = np.zeros((h4, w4, 4, 4), np.int32)
    m16 = np.zeros((h16, w16), np.int32)
    q16 = np.zeros((h16, w16, 16, 16), np.int32)
    s16 = np.zeros((h16, w16), np.int32)
    m32 = np.zeros((nby, nbx), np.int32)
    q32 = np.zeros((nby, nbx, 32, 32), np.int32)
    s32 = np.zeros((nby, nbx), np.int32)

    def fill32(sub, cby, cbx):
        """One 32-root ys bundle at 32-grid coords (n_steps, b_max)."""
        has_nxn = "m4" in sub
        for quad in range(4):
            qdx, qdy = quad & 1, quad >> 1
            for z in range(4):
                zdx2 = qdx * 2 + (z & 1)
                zdy2 = qdy * 2 + (z >> 1)
                b8y = (cby * 4 + zdy2)[ok]
                b8x = (cbx * 4 + zdx2)[ok]
                m8[b8y, b8x] = sub["m8"][:, quad, z][ok]
                q8[b8y, b8x] = sub["q8"][:, quad, z][ok]
                s8[b8y, b8x] = sub["s8"][:, quad, z][ok]
                if has_nxn:
                    for s4 in range(4):
                        sdx, sdy = s4 & 1, s4 >> 1
                        b4y = (cby * 4 + zdy2) * 2 + sdy
                        b4x = (cbx * 4 + zdx2) * 2 + sdx
                        m4[b4y[ok], b4x[ok]] = \
                            sub["m4"][:, quad, z, s4][ok]
                        q4[b4y[ok], b4x[ok]] = \
                            sub["q4"][:, quad, z, s4][ok]
            b16y = (cby * 2 + qdy)[ok]
            b16x = (cbx * 2 + qdx)[ok]
            m16[b16y, b16x] = sub["m16"][:, quad][ok]
            q16[b16y, b16x] = sub["q16"][:, quad][ok]
            s16[b16y, b16x] = sub["s16"][:, quad][ok]
        m32[cby[ok], cbx[ok]] = sub["m32"][ok]
        q32[cby[ok], cbx[ok]] = sub["q32"][ok]
        s32[cby[ok], cbx[ok]] = sub["s32"][ok]

    if ctb == 64:
        m64 = np.zeros((sby, sbx), np.int32)
        q64 = np.zeros((sby, sbx, 64, 64), np.int32)
        s64 = np.zeros((sby, sbx), np.int32)
        for q64i in range(4):
            qdx, qdy = q64i & 1, q64i >> 1
            sub = {k: v[:, q64i] for k, v in ys["sub"].items()}
            fill32(sub, by * 2 + qdy, bx * 2 + qdx)
        m64[by[ok], bx[ok]] = ys["m64"][ok]
        q64[by[ok], bx[ok]] = ys["q64"][ok]
        s64[by[ok], bx[ok]] = ys["s64"][ok]
        return (m8, q8, s8, m4, q4, m16, q16, s16, m32, q32, s32,
                m64, q64, s64)
    fill32(ys, by, bx)
    return (m8, q8, s8, m4, q4, m16, q16, s16, m32, q32, s32)


def encode_frame_wavefront2(frame_uint8: np.ndarray, qp: int, *,
                            serialize: bool = True, lam_scale: float = 1.0,
                            policy: str = "regular", pnn=None,
                            ctb: int = CTB, enable_nxn: bool = True,
                            rate_evolve: bool | None = None):
    """Quadtree wavefront encode -> EncodeResult (own bitstream).

    `ctb=64` adds the 64x64 CU level (HM's intra_main_rext.cfg CTU 64
    depth 4: a 64 leaf is one PU with four forced TU32s, reconstructed
    TU-by-TU like HM).

    `policy` in {regular, substitution, switch}; NN policies take `pnn` as a
    `PnnBundle` (with quantized models) or a `PnnPredictor` wrapping one.
    The resulting streams decode bit-exactly through the sequential host
    decoders (`codec.decoder`, `codec.hm_decoder`) — the quantized normative
    forward makes batched-device and per-TU-host predictions identical.
    """
    import jax.numpy as jnp

    bundle = getattr(pnn, "bundle", pnn)
    h, w = frame_uint8.shape
    run = _jitted_wavefront2(h, w, qp, lam_scale, policy, bundle, ctb=ctb,
                             enable_nxn=enable_nxn, rate_evolve=rate_evolve)
    recon, ys = run(jnp.asarray(frame_uint8))
    arrays = (np.asarray(recon),) + _assemble_arrays(ys, h, w, ctb)
    return _arrays_to_result(frame_uint8, qp, arrays, policy, serialize,
                             ctb=ctb)


def _serialize_grids(grids, trees, *, width, height, qp, policy, ctb):
    """Framework-container stream for decided grids: native packer when the
    toolchain is up (byte-identical, ~20x faster than the Python CABAC
    walk), Python serializer otherwise."""
    from ..codec import native

    if native.available():
        header = enc_mod.stream_header(
            width=width, height=height, qp=qp, policy=policy, ctu_size=ctb,
            sign_hiding=True)
        return header + native.pack_tree_payload(
            grids, width=width, height=height, qp=qp, ctu_size=ctb,
            policy=policy)
    return enc_mod.serialize_trees(
        trees, width=width, height=height, qp=qp, policy=policy,
        ctu_size=ctb, sign_hiding=True)


def _arrays_to_result(frame_uint8, qp, arrays, policy, serialize,
                      ctb: int = CTB):
    """Device output grids -> CuNode trees (+ optional CABAC serialization)."""
    if ctb == 64:
        (recon, m8, q8, s8, m4, q4, m16, q16, s16, m32, q32, s32,
         m64, q64, s64) = arrays
    else:
        (recon, m8, q8, s8, m4, q4, m16, q16, s16, m32, q32, s32) = arrays
    h, w = frame_uint8.shape
    trees = []
    mode_map = np.full((h // 4, w // 4), -1, np.int32)
    d0 = 1 if ctb == 64 else 0      # depth of the 32 level

    def leaf(x, y, n, mode, q, depth=0):
        cbf = 1 if q.any() else 0
        mode_map[y // 4:(y + n) // 4, x // 4:(x + n) // 4] = mode
        pu = enc_mod.PuRecord(x, y, n, int(mode),
                              [enc_mod.TuRecord(x, y, n, cbf,
                                                q if cbf else None)])
        return enc_mod.CuNode(x, y, n, depth, split=False, pus=[pu])

    def leaf8(x, y):
        """8x8 CU: 2Nx2N leaf, or NxN with four 4x4 PUs (DST TUs)."""
        if not s8[y // 8, x // 8]:
            return leaf(x, y, 8, m8[y // 8, x // 8], q8[y // 8, x // 8])
        node = enc_mod.CuNode(x, y, 8, 0, split=False, part_nxn=True)
        for s in range(4):
            sx, sy = x + (s & 1) * 4, y + (s >> 1) * 4
            mode = int(m4[sy // 4, sx // 4])
            q = q4[sy // 4, sx // 4]
            cbf = 1 if q.any() else 0
            mode_map[sy // 4, sx // 4] = mode
            node.pus.append(enc_mod.PuRecord(
                sx, sy, 4, mode,
                [enc_mod.TuRecord(sx, sy, 4, cbf, q if cbf else None)]))
        return node

    def tree32(x, y):
        """Decided 32-rooted subtree at pixel (x, y), depth-adjusted."""
        by, bx = y // 32, x // 32
        if not s32[by, bx]:
            node = leaf(x, y, 32, m32[by, bx], q32[by, bx])
            node.depth = d0
            return node
        root = enc_mod.CuNode(x, y, 32, d0, split=True)
        for quad in range(4):
            qx = x + (quad & 1) * 16
            qy = y + (quad >> 1) * 16
            b16y, b16x = qy // 16, qx // 16
            if not s16[b16y, b16x]:
                child = leaf(qx, qy, 16, m16[b16y, b16x], q16[b16y, b16x])
                child.depth = d0 + 1
            else:
                child = enc_mod.CuNode(qx, qy, 16, d0 + 1, split=True)
                for z in range(4):
                    zx = qx + (z & 1) * 8
                    zy = qy + (z >> 1) * 8
                    g = leaf8(zx, zy)
                    g.depth = d0 + 2
                    child.children.append(g)
            root.children.append(child)
        return root

    if ctb == 64:
        for by in range(h // 64):
            for bx in range(w // 64):
                x, y = bx * 64, by * 64
                if not s64[by, bx]:
                    # 64x64 2Nx2N PU with the forced TU32 quadtree split
                    # (MAX_TU = 32; serializer/decoder derive it, no flags).
                    mode = int(m64[by, bx])
                    q = q64[by, bx]
                    mode_map[y // 4:(y + 64) // 4,
                             x // 4:(x + 64) // 4] = mode
                    tus = []
                    for tz in range(4):
                        tx = x + (tz & 1) * 32
                        ty = y + (tz >> 1) * 32
                        tq = q[(tz >> 1) * 32:(tz >> 1) * 32 + 32,
                               (tz & 1) * 32:(tz & 1) * 32 + 32]
                        cbf = 1 if tq.any() else 0
                        tus.append(enc_mod.TuRecord(
                            tx, ty, 32, cbf, tq if cbf else None))
                    pu = enc_mod.PuRecord(x, y, 64, mode, tus)
                    trees.append(enc_mod.CuNode(x, y, 64, 0, split=False,
                                                pus=[pu]))
                    continue
                root = enc_mod.CuNode(x, y, 64, 0, split=True)
                for quad in range(4):
                    root.children.append(
                        tree32(x + (quad & 1) * 32, y + (quad >> 1) * 32))
                trees.append(root)
    else:
        for by in range(h // 32):
            for bx in range(w // 32):
                trees.append(tree32(bx * 32, by * 32))

    bitstream = b""
    if serialize:
        bitstream = _serialize_grids(
            arrays[1:], trees, width=w, height=h, qp=qp, policy=policy,
            ctb=ctb)
    return enc_mod.EncodeResult(
        bitstream=bitstream,
        reconstruction=recon.astype(np.uint8),
        num_bits=len(bitstream) * 8,
        ctu_trees=trees,
        mode_map=mode_map,
        qp=qp,
        policy=policy,
    )


def _jitted_wavefront2_batch(height, width, qp, lam_scale, policy, bundle,
                             ctb=CTB, enable_nxn=True, n_frames=4):
    """Multi-frame program (frames interleaved into the plane axis — NOT a
    vmap, which de-hoists the constant tables and crashes the axon worker
    at b>=4; see the n_frames note in `_build_wavefront2`)."""
    return _jitted_wavefront2(height, width, qp, lam_scale, policy, bundle,
                              ctb=ctb, enable_nxn=enable_nxn,
                              n_frames=n_frames)


def encode_frames_wavefront2_batch(frames_uint8: np.ndarray, qp: int, *,
                                   lam_scale: float = 1.0,
                                   policy: str = "regular", pnn=None,
                                   serialize: bool = False, ctb: int = CTB,
                                   enable_nxn: bool = True):
    """Encodes a BATCH of frames through one multi-frame wavefront program.

    The sustained-throughput serving mode: the wavefront's sequential
    z-order/quadtree sub-stages are op-overhead-bound at batch 1 (tiny
    tensors on a chip built for big ones); interleaving B independent
    frames into the plane axis multiplies every sub-stage's work by B at
    the same sequential depth — measured step time is FLAT in B up to 64
    at 1080p, so throughput scales ~linearly (0.32 -> 17.9 fps at b=128).

    Returns a list of `EncodeResult` (bitstreams empty unless `serialize`).
    """
    import jax
    import jax.numpy as jnp

    bundle = getattr(pnn, "bundle", pnn)
    b, h, w = frames_uint8.shape
    run = _jitted_wavefront2_batch(h, w, qp, lam_scale, policy, bundle, ctb,
                                   enable_nxn, n_frames=b)
    recon, ys = run(jnp.asarray(frames_uint8))
    recon = np.asarray(recon)
    ys = jax.tree_util.tree_map(np.asarray, ys)

    def extract(tree, f):
        # The composite slot axis is ordered (slot, frame); level arrays
        # ('q*') carry a trailing (n, n) block so their slot axis sits at
        # -3, scalar-per-slot leaves at -1.
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = extract(v, f)
            else:
                axis = -3 if k.startswith("q") else -1
                idx = np.arange(v.shape[axis] // b) * b + f
                out[k] = np.take(v, idx, axis=axis)
        return out

    out = []
    for i in range(b):
        arrays = (recon[i],) + _assemble_arrays(extract(ys, i), h, w, ctb)
        out.append(_arrays_to_result(frames_uint8[i], qp, arrays, policy,
                                     serialize, ctb=ctb))
    return out


def _host_pack_one(args):
    """Process-pool worker: per-frame grid assembly + native CABAC pack.

    Module-level so it pickles; each worker builds the native packer .so
    lazily on first use.  Returns the serialized stream bytes."""
    ys_i, h, w, qp, policy, ctb = args
    grids = _assemble_arrays(ys_i, h, w, ctb)
    return _serialize_grids(grids, None, width=w, height=h, qp=qp,
                            policy=policy, ctb=ctb)


def encode_stream_wavefront2(frames_iter, qp: int, *, batch: int = 16,
                             lam_scale: float = 1.0,
                             policy: str = "regular", pnn=None,
                             ctb: int = CTB, enable_nxn: bool = True,
                             build_trees: bool = False, workers: int = 0):
    """Sustained end-to-end encoder: device batches overlapped with host
    transfer + grid assembly + native CABAC packing.

    JAX dispatch is asynchronous, so launching batch k+1 before touching
    batch k's outputs overlaps the whole host half (tunnel transfer,
    schedule assembly, `native.pack_tree_grids`) with device compute — the
    production serving shape of SURVEY §7 stage 7's pipeline.  Yields
    `EncodeResult`s in input order (bitstreams always filled; `ctu_trees`
    only when `build_trees`, the packer reads the grids directly).

    `workers` > 0 fans the per-frame host half (schedule assembly + CABAC
    pack, both CPU-bound) over a process pool: with the fused-kernel
    device encoder sustaining ~5 fps at 1080p the single-threaded host
    side is the pipeline bottleneck (8x at b=4), and frames are
    independent, so this is the serving scale-out lever.  Output order is
    preserved; `workers=0` keeps the single-process path.
    """
    import jax
    import jax.numpy as jnp

    from ..codec import native

    bundle = getattr(pnn, "bundle", pnn)
    run = None
    h = w = None
    pool = None
    if workers > 0 and not build_trees:
        import concurrent.futures as _cf
        import multiprocessing as _mp

        # spawn, not fork: JAX's threads make fork()ed children unsafe.
        pool = _cf.ProcessPoolExecutor(
            max_workers=workers, mp_context=_mp.get_context("spawn"))

    def host_side(batch_frames, recon_dev, ys_dev, n_valid):
        recon = np.asarray(recon_dev)
        ys = jax.tree_util.tree_map(np.asarray, ys_dev)

        def extract(tree, f):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out[k] = extract(v, f)
                else:
                    axis = -3 if k.startswith("q") else -1
                    idx = np.arange(v.shape[axis] // batch) * batch + f
                    out[k] = np.take(v, idx, axis=axis)
            return out

        if pool is not None and native.available():
            futs = [pool.submit(_host_pack_one,
                                (extract(ys, i), h, w, qp, policy, ctb))
                    for i in range(n_valid)]
            for i, fut in enumerate(futs):
                stream = fut.result()
                yield enc_mod.EncodeResult(
                    bitstream=stream, reconstruction=recon[i],
                    num_bits=len(stream) * 8, ctu_trees=None,
                    mode_map=None, qp=qp, policy=policy)
            return
        for i in range(n_valid):
            grids = _assemble_arrays(extract(ys, i), h, w, ctb)
            if build_trees or not native.available():
                arrays = (recon[i],) + grids
                yield _arrays_to_result(batch_frames[i], qp, arrays,
                                        policy, True, ctb=ctb)
            else:
                stream = _serialize_grids(grids, None, width=w, height=h,
                                          qp=qp, policy=policy, ctb=ctb)
                yield enc_mod.EncodeResult(
                    bitstream=stream, reconstruction=recon[i],
                    num_bits=len(stream) * 8, ctu_trees=None,
                    mode_map=None, qp=qp, policy=policy)

    pending = None
    buf = []
    for frame in frames_iter:
        if h is None:
            h, w = frame.shape
            run = _jitted_wavefront2(h, w, qp, lam_scale, policy, bundle,
                                     ctb=ctb, enable_nxn=enable_nxn,
                                     n_frames=batch)
        buf.append(frame)
        if len(buf) == batch:
            stacked = np.stack(buf)
            dev = run(jnp.asarray(stacked))     # async dispatch
            if pending is not None:
                yield from host_side(*pending)
            pending = (stacked, dev[0], dev[1], batch)
            buf = []
    if buf:
        stacked = np.stack(buf + [buf[-1]] * (batch - len(buf)))
        dev = run(jnp.asarray(stacked))
        if pending is not None:
            yield from host_side(*pending)
        pending = (stacked, dev[0], dev[1], len(buf))
    if pending is not None:
        yield from host_side(*pending)


def encode_frame_wavefront2_hm(frame_uint8: np.ndarray, qp: int, *,
                               loop_filters: bool = True,
                               lam_scale: float = 1.0,
                               policy: str = "regular", pnn=None,
                               ctb: int = CTB, enable_nxn: bool = True):
    """Wavefront-v2 device encode -> standard Annex-B HEVC stream (CTB 32).

    Deblock + SAO are normative post-passes for All-Intra; decoded-picture-
    hash SEI embedded.  Returns (annexb_stream, EncodeResult).  NN-policy
    streams use the reference's extended syntax (substitution: unchanged
    container, PNN semantics on mode 18; switch: leading PNNS bin) and
    decode through `codec.hm_decoder` with the same bundle."""
    from ..codec import deblock, hm_encoder
    from ..codec import sao as sao_mod

    res = encode_frame_wavefront2(frame_uint8, qp, serialize=False,
                                  lam_scale=lam_scale, policy=policy,
                                  pnn=pnn, ctb=ctb, enable_nxn=enable_nxn)
    h, w = frame_uint8.shape
    sao_grid = None
    if loop_filters:
        uh, uw = h // 4, w // 4
        # Unit-granular TU ids from the decided tree (deblock edge rule).
        tu_ids = np.zeros((uh, uw), np.int32)
        tid = 0
        for node in res.ctu_trees:
            stack = [node]
            while stack:
                nd = stack.pop()
                if nd.split:
                    stack.extend(nd.children)
                    continue
                for pu in nd.pus:
                    for tu in pu.tus:
                        tu_ids[tu.y // 4:(tu.y + tu.n) // 4,
                               tu.x // 4:(tu.x + tu.n) // 4] = tid
                        tid += 1
        final = deblock.deblock_luma(res.reconstruction, tu_ids, qp)
        lam = rdo.lambda_for_qp(qp)
        sao_grid = sao_mod.estimate_frame(frame_uint8, final, ctb, lam)
        final = sao_mod.apply_sao(final, sao_grid, ctb)
        res.reconstruction = final
    stream = hm_encoder.assemble_hm_stream(
        res, sao_enabled=loop_filters, deblocking=loop_filters,
        sign_hiding=True, transform_skip=False, max_tu_depth=0,
        sao_grid=sao_grid, ctu_size=ctb)
    res.bitstream = stream
    res.num_bits = len(stream) * 8
    return stream, res
