"""Fused per-size-class unit-trial kernel for the wavefront encoder.

The wavefront2 device encoder is op-COUNT bound: ~85 sequential sub-stages
per wavefront step, each lowering to ~40 small XLA ops whose fixed dispatch
cost (~2-7 us) dwarfs their compute (NOTES_ROUND4: stubbing all unit math
leaves a skeleton at 830 fps; stubbing RDOQ alone changes nothing).  This
module collapses the entire n x n unit trial - reference filtering ->
35/36-mode prediction -> forward transform -> RDOQ-lite + TU rate ->
sign-data hiding -> dequant/inverse -> SSE + cost -> argmin/select - into
ONE Pallas kernel per size class, replacing ~30 launched ops per sub-stage
with a single custom call.  The recursion being replaced is HM's per-CU
mode search (`TEncCu.cpp:248`, `TEncSearch.cpp:2295-2303`); the framework
runs it batched over all wavefront slots x frames.

Bit-exactness contract (the encoder's decisions feed a normative CABAC
serializer, so the fused path must reproduce the XLA path BYTE-identically):

* Every integer op is transcribed 1:1 (same shifts, same rounding).
* Gathers/scatters are re-expressed as dense math the TPU likes:
  - the 33 angular + planar predictions are ONE f32 MXU matmul from the
    (raw | filtered | const) reference vector.  All operands are small
    integers (coefficients <= 64, samples <= 255), hence exactly
    representable in bf16, so the MXU's f32 passes are EXACT;
  - the scan-order permutation disappears entirely: RDOQ runs in raster
    (pixel) domain against per-mode raster-indexed rate tables, and scan
    positions are data (`scanpos` tables), not data movement;
  - 4x4 DST / DCT transforms are Kronecker-structured (n^2, n^2)
    left-matmuls with the XLA path's exact hi/lo 8-bit split wherever a
    product could leave the f32-exact integer range (< 2^24).
* Decision-steering reductions stay int32 (micro-bits / snapped
  distortions), so sums are associative and every program shape (XLA,
  Pallas, any batch width) decides identically - the same discipline the
  XLA path adopted in round 3 (wavefront2.py MB/DS note).

Data layout inside the kernel: arrays are (n^2, M*B) - pixel index on
sublanes in COEFFICIENT-GROUP-GROUPED raster order (a 4x4 CG is 16
contiguous sublanes, so HEVC's per-CG reductions are aligned slices), and
a composite (mode-major, slot-minor) lane axis with the slot block padded
to 128 so every per-mode slice sits on a lane-tile boundary.
"""

from __future__ import annotations

import functools

import numpy as np

M_PAD = 36          # mode blocks in the lane layout (35 + PNNS/dummy)
BIG_COST = 3e38


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pprime(n):
    """CG-grouped raster order: p' -> raster index (y*n+x)."""
    if n <= 4:
        return np.arange(n * n, dtype=np.int64)
    out = []
    for cgy in range(n // 4):
        for cgx in range(n // 4):
            for yy in range(4):
                for xx in range(4):
                    out.append((cgy * 4 + yy) * n + cgx * 4 + xx)
    return np.asarray(out, dtype=np.int64)


def _filter_matrix(n):
    """F (R, R) int64: filtered = (F @ comb + 2) >> 2, identity rows x4.

    Transcribes wavefront2.filter_refs (the HM [1 2 1] reference smoothing,
    `TComPattern::filterIntraReferences`) as a single linear map.
    """
    R = 4 * n + 2
    F = np.zeros((R, R), np.int64)
    TOP, LEFT = 0, 2 * n + 1

    def ext_t(k):        # ext_t = [ref_left[1], ref_top[0..2n]]
        return LEFT + 1 if k == 0 else TOP + (k - 1)

    def ext_l(k):        # ext_l = [ref_top[1], corner, ref_left[1..2n]]
        if k == 0:
            return TOP + 1
        if k == 1:
            return TOP + 0
        return LEFT + (k - 1)

    # f_top[j] = f_top_vals[j] for j < 2n, raw top[2n] at j == 2n.
    for j in range(2 * n):
        for w, k in ((1, j), (2, j + 1), (1, j + 2)):
            F[TOP + j, ext_t(k)] += w
    F[TOP + 2 * n, TOP + 2 * n] = 4
    # f_left[0] = f_top[0]; f_left[j] = f_left_vals[j] (1 <= j < 2n);
    # f_left[2n] raw.
    F[LEFT + 0] = F[TOP + 0]
    for j in range(1, 2 * n):
        for w, k in ((1, j), (2, j + 1), (1, j + 2)):
            F[LEFT + j, ext_l(k)] += w
    F[LEFT + 2 * n, LEFT + 2 * n] = 4
    return F


def _pred_matrix(n, use_filt, g0, g1, frac):
    """P (35, n*n, 2R+1) int64 mapping [raw | filtered | 1] -> 64*pred.

    pred[m, p] = (P[m, p] . comb2) >> 6, exactly predict35's planar/angular
    arithmetic (DC and the mode-10/26 edge adjustments are runtime fixups).
    """
    R = 4 * n + 2
    C = 2 * R           # constant column
    P = np.zeros((35, n * n, 2 * R + 1), np.int64)
    TOP, LEFT = 0, 2 * n + 1
    s = n.bit_length() - 1

    def col(idx, m):
        return idx + (R if use_filt[m] else 0)

    # Planar (mode 0): ((L<<s) + n + (x+1)(TR-L) + (T<<s) + (y+1)(BL-T))
    #                  >> (s+1), scaled by 2^(5-s) to the uniform >> 6.
    sc = 1 << (5 - s)
    for y in range(n):
        for x in range(n):
            p = y * n + x
            row = P[0, p]
            row[col(LEFT + 1 + y, 0)] += sc * ((1 << s) - (x + 1))
            row[col(TOP + n + 1, 0)] += sc * (x + 1)          # TR
            row[col(TOP + 1 + x, 0)] += sc * ((1 << s) - (y + 1))
            row[col(LEFT + n + 1, 0)] += sc * (y + 1)         # BL
            row[C] += sc * n
    # Angular modes 2..34 -> pred index m = mode: x2 to >> 6.
    for mi in range(33):
        m = mi + 2
        for y in range(n):
            for x in range(n):
                p = y * n + x
                f = int(frac[mi, y, x])
                P[m, p, col(int(g0[mi, y, x]), m)] += 2 * (32 - f)
                P[m, p, col(int(g1[mi, y, x]), m)] += 2 * f
                P[m, p, C] += 2 * 16
    return P


def _kron_mats(n, t_fwd, t_inv, pp):
    """Transform stage matrices (n^2, n^2) in p' order.

    fwd1[(i,k),(i,x)] = Tf[k,x]   (a = resi @ Tf^T)
    fwd2[(k,l),(i,l)] = Tf[k,i]   (coeff = Tf @ a, via hi/lo split)
    inv1[(i,l),(k,l)] = Ti[k,i]   (e = Ti^T @ coeff)
    inv2[(i,x),(i,k)] = Ti[k,x]   (r = e @ Ti)
    """
    nn = n * n
    f1 = np.zeros((nn, nn), np.int64)
    f2 = np.zeros((nn, nn), np.int64)
    i1 = np.zeros((nn, nn), np.int64)
    i2 = np.zeros((nn, nn), np.int64)
    for a in range(n):
        for b in range(n):
            for c in range(n):
                f1[a * n + b, a * n + c] = t_fwd[b, c]
                f2[b * n + a, c * n + a] = t_fwd[b, c]
                i1[b * n + a, c * n + a] = t_inv[c, b]
                i2[a * n + b, a * n + c] = t_inv[c, b]
    inv = np.empty_like(pp)
    inv[pp] = np.arange(len(pp))
    conj = lambda m: m[pp][:, pp]
    return conj(f1), conj(f2), conj(i1), conj(i2)


def build_consts(n, n_modes, c, SB, lam, qscale, iq_scale, b_eff,
                 nn_policy=None, groups=1):
    """Pack the fused-trial constants for size n.

    `c` is the wavefront2 per-size consts dict (g0/g1/frac/use_filt/
    t_fwd/t_inv/shift1/shift2/qbits/iq_shift/err_scale/sig0/sig1/
    lastx/lasty/sg/inv_sg), `SB` the scalar-bits dict.  `nn_policy` in
    {None, "sub18", "append"} controls where a PNN prediction is inserted.

    `groups` > 1 enables the mode-group GRID decomposition for the big
    sizes (16/32): the pallas kernel iterates over groups of
    36/groups mode blocks with a running argmin in scratch, bounding the
    VMEM footprint of the (n^2, modes*B) intermediates.  Requires a
    mode-independent scan (true for n > 8: HEVC uses the diagonal scan
    only, TComTrQuant::getCoefScanIdx), so the rate tables collapse to
    one (n^2, B) block shared by every group.
    """
    nn_px = n * n
    B = _round_up(max(b_eff, 1), 128)
    L = M_PAD * B
    R = 4 * n + 2
    Rp = _round_up(R, 8)
    RRp = _round_up(2 * Rp + 1, 8)
    pp = _pprime(n)
    ipp = np.empty_like(pp)
    ipp[pp] = np.arange(len(pp))

    g0 = np.asarray(c["g0"]); g1 = np.asarray(c["g1"])
    frac = np.asarray(c["frac"]); use_filt = np.asarray(c["use_filt"])
    P = _pred_matrix(n, use_filt, g0, g1, frac)      # (35, nn, 2R+1)
    # -> (M_PAD*nn, RRp) rows m*nn + p' (p' order), cols [raw Rp | filt Rp
    # at offset Rp | const at 2*Rp].
    P2 = np.zeros((M_PAD * nn_px, RRp), np.float32)
    for m in range(35):
        blk = P[m][pp]                               # (nn, 2R+1)
        P2[m * nn_px:(m + 1) * nn_px, :R] = blk[:, :R]
        P2[m * nn_px:(m + 1) * nn_px, Rp:Rp + R] = blk[:, R:2 * R]
        P2[m * nn_px:(m + 1) * nn_px, 2 * Rp] = blk[:, 2 * R]

    F = np.zeros((Rp, Rp), np.float32)
    F[:R, :R] = _filter_matrix(n)
    # Strong (bilinear) intra smoothing, normative at 32x32
    # (TComPattern.cpp:415-470): linear ramps corner<->TR / corner<->BL,
    # selected per slot by the near-linearity test computed in-kernel.
    Fs = np.zeros((8, 8), np.float32)
    if n == 32:
        Fs = np.zeros((Rp, Rp), np.float32)
        TOPs, LEFTs = 0, 2 * n + 1
        Fs[TOPs + 0, TOPs + 0] = 64
        Fs[TOPs + 2 * n, TOPs + 2 * n] = 64
        Fs[LEFTs + 0, TOPs + 0] = 64
        Fs[LEFTs + 2 * n, LEFTs + 2 * n] = 64
        for i in range(1, 2 * n):
            Fs[TOPs + i, TOPs + 0] = 2 * n - i
            Fs[TOPs + i, TOPs + 2 * n] = i
            Fs[LEFTs + i, TOPs + 0] = 2 * n - i
            Fs[LEFTs + i, LEFTs + 2 * n] = i

    # DC / edge-fixup selection rows (operate on comb2).
    TOP, LEFT = 0, 2 * n + 1
    dcw = np.zeros((8, RRp), np.float32)
    dcw[0, TOP + 1:TOP + 1 + n] = 1.0
    dcw[0, LEFT + 1:LEFT + 1 + n] = 1.0
    dcw[0, 2 * Rp] = float(n)
    selT = np.zeros((nn_px, RRp), np.float32)        # top_w[x(p')]
    selL = np.zeros((nn_px, RRp), np.float32)        # left_w[y(p')]
    adj26 = np.zeros((nn_px, RRp), np.float32)       # (left_w[y]-corner)
    adj10 = np.zeros((nn_px, RRp), np.float32)       # (top_w[x]-ref_top[0])
    y0 = np.zeros((nn_px, 1), np.float32)
    x0 = np.zeros((nn_px, 1), np.float32)
    for i, p in enumerate(pp):
        y, x = divmod(int(p), n)
        selT[i, TOP + 1 + x] = 1.0
        selL[i, LEFT + 1 + y] = 1.0
        adj26[i, LEFT + 1 + y] = 1.0
        adj26[i, LEFT + 0] = -1.0
        adj10[i, TOP + 1 + x] = 1.0
        adj10[i, TOP + 0] = -1.0
        y0[i] = 1.0 if y == 0 else 0.0
        x0[i] = 1.0 if x == 0 else 0.0

    f1, f2, i1, i2 = _kron_mats(n, np.asarray(c["t_fwd"]),
                                np.asarray(c["t_inv"]), pp)
    # The HEVC forward matrices are 2^14-scaled (FWD_MATRIX_SHIFT=14,
    # entries to +-23170): too wide for exact f32/bf16 matmuls.  Split
    # T = 256*Th + Tl (Th in [-91, 91], Tl in [0, 255], both bf16-exact);
    # the kernel recombines the two exact products in int32.  The inverse
    # matrices are 8-bit (<= 90) and stay whole.
    f1h, f1l = f1 >> 8, f1 & 255
    f2h, f2l = f2 >> 8, f2 & 255

    # Rate tables in p'-raster domain, expanded to the (nn, M*B) lane
    # layout (value constant across the slot block).
    n_modes_t = np.asarray(c["sig0"]).shape[0]       # 35 or 36
    inv_sg = np.asarray(c["inv_sg"])                 # (n_modes_t, nn) r->scan
    sig0s = np.asarray(c["sig0"], np.float32)        # scan-domain
    sig1s = np.asarray(c["sig1"], np.float32)
    scanpos = np.zeros((nn_px, M_PAD), np.int32)
    sig0r = np.zeros((nn_px, M_PAD), np.float32)
    sig1r = np.zeros((nn_px, M_PAD), np.float32)
    for m in range(M_PAD):
        mt = min(m, n_modes_t - 1)
        sp = inv_sg[mt][pp]                          # scanpos of p'
        scanpos[:, m] = sp
        sig0r[:, m] = sig0s[mt][sp]
        sig1r[:, m] = sig1s[mt][sp]
    lastx = np.asarray(c["lastx"], np.float32)
    lasty = np.asarray(c["lasty"], np.float32)
    MB = 256.0
    lastpb = np.zeros((nn_px, 1), np.int32)
    for i, p in enumerate(pp):
        y, x = divmod(int(p), n)
        lastpb[i, 0] = (int(np.round(lastx[x] * MB))
                        + int(np.round(lasty[y] * MB)))

    mg = M_PAD // groups
    assert mg * groups == M_PAD, "groups must divide 36"
    if groups > 1:
        assert np.all(scanpos == scanpos[:, :1]), \
            "mode-group grid needs a mode-independent scan (n > 8)"

    def expand(t):
        if groups > 1:
            return np.repeat(t[:, :1], B, axis=1)
        return np.repeat(t, B, axis=1)

    mode_valid = np.zeros((1, M_PAD), np.float32)
    mode_valid[0, n_modes:] = BIG_COST

    return dict(
        n=n, nn=nn_px, B=B, L=L, Rp=Rp, RRp=RRp, R=R, ipp=ipp,
        n_modes=n_modes, nn_policy=nn_policy, pp=pp,
        P2=P2, F=F, Fs=Fs, strong=(n == 32), dcw=dcw, selT=selT,
        selL=selL,
        adj26=adj26, adj10=adj10,
        y0=np.repeat(y0, B, axis=1), x0=np.repeat(x0, B, axis=1),
        f1h=f1h.astype(np.float32), f1l=f1l.astype(np.float32),
        f2h=f2h.astype(np.float32), f2l=f2l.astype(np.float32),
        i1=i1.astype(np.float32), i2=i2.astype(np.float32),
        sig0e=expand(sig0r), sig1e=expand(sig1r),
        scanpos_e=expand(scanpos),
        lastpb_e=np.repeat(lastpb, B if groups > 1 else L,
                           axis=1).astype(np.int32),
        mode_big=np.repeat(mode_valid, B, axis=1),
        groups=groups, mg=mg, tab_compact=groups > 1,
        shift1=int(c["shift1"]), shift2=int(c["shift2"]),
        qbits=int(c["qbits"]), iq_shift=int(c["iq_shift"]),
        err_scale=float(c["err_scale"]),
        qscale=float(qscale), iq_scale=int(iq_scale), lam=float(lam),
        SB={k: float(v) for k, v in SB.items()},
        dc_shift=n.bit_length(),      # >> (log2n + 1)
    )


def _trial_blocks(cst, tabs, comb, orig_p, mode_row, nn_pred_p,
                  gsel=None, rate_rows=None):
    """Core of the fused trial on (n^2, Mloc*B)-layout values.

    Processes all M_PAD mode blocks when `gsel` is None, or ONE mode group
    of cst["mg"] blocks when `gsel` is the (traced or static) group index
    (the table inputs then carry that group's slices).  Returns
    (cost_row (1, Mloc*B) f32, rec (nn, Mloc*B) i32, q (nn, Mloc*B) i32,
    counts (8, Mloc*B) i32).

    `rate_rows` (8, B) i32 carries the live rate-state micro-bit DELTAS
    (rows: dsig0, dsig1, dg1_0, dg1_1, dg2_0, dg2_1, dcbf0, dcbf1) applied
    ADDITIVELY to the static tables - all-zero deltas reproduce the static
    encoder bit-for-bit, so the plumbing is always on and the WPP-style
    evolution (wavefront2 rate_evolve) just feeds nonzero rows.  `counts`
    returns the chosen-relevant CABAC bin counts per mode (same row
    order's bins: sig0, sig1, g1_0, g1_1, g2_0, g2_1, cbf, zero) for the
    caller to fold into the evolving state.
    """
    import jax.numpy as jnp

    n = cst["n"]; nn = cst["nn"]; B = cst["B"]
    mg = cst["mg"] if gsel is not None else M_PAD

    def put_block(blocks, t, newblk):
        """Place mode-t's block, honouring the group decomposition."""
        if gsel is None:
            blocks[t] = newblk
            return
        gt, jt = divmod(t, mg)
        if isinstance(gsel, int):
            if gsel == gt:
                blocks[jt] = newblk
        else:
            blocks[jt] = jnp.where(gsel == gt, newblk, blocks[jt])
    lam = cst["lam"]; SB = cst["SB"]
    MBf = 256.0
    f32 = jnp.float32

    def fdot(a, b):
        import jax
        if a.dtype == jnp.bfloat16:
            # Exact: matrix entries <= 90 and operand values <= 255 in
            # magnitude (the hi/lo discipline guarantees it), so both
            # sides are bf16-representable and the f32 accumulation is
            # exact -- same integers as the int einsum, half the VMEM.
            b = b.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def floordiv2(x, s):
        # floor(x / 2^s) of integer-valued f32 == arithmetic >> s.
        return jnp.floor(x * f32(2.0 ** (-s)))

    # ---- references: filter + 35-mode prediction as matmuls ----
    combf = floordiv2(fdot(tabs["F"], comb) + 2.0, 2)
    if cst.get("strong"):
        LEFT = 2 * n + 1
        c0 = comb[0:1]
        tr = comb[2 * n:2 * n + 1]
        tn = comb[n:n + 1]
        bl = comb[LEFT + 2 * n:LEFT + 2 * n + 1]
        ln_ = comb[LEFT + n:LEFT + n + 1]
        cond = jnp.logical_and(jnp.abs(bl + c0 - 2.0 * ln_) < 8.0,
                               jnp.abs(c0 + tr - 2.0 * tn) < 8.0)
        combs = floordiv2(fdot(tabs["Fs"], comb) + 32.0, 6)
        combf = jnp.where(cond, combs, combf)
    ones = jnp.ones((cst["RRp"] - 2 * cst["Rp"], B), f32)
    comb2 = jnp.concatenate([comb, combf, ones], axis=0)
    predsA = floordiv2(fdot(tabs["P2"], comb2), 6)

    # DC plane (mode 1) + mode 10/26 edge adjustments (predict35 fixups).
    dc = floordiv2(fdot(tabs["dcw"], comb2), cst["dc_shift"])
    dcb = jnp.broadcast_to(dc[0:1, :], (nn, B))
    topx = fdot(tabs["selT"], comb2)
    lefty = fdot(tabs["selL"], comb2)
    y0 = tabs["y0"]; x0 = tabs["x0"]
    if n <= 16:
        e_top = floordiv2(topx + 3.0 * dcb + 2.0, 2)
        e_left = floordiv2(lefty + 3.0 * dcb + 2.0, 2)
        e_cor = floordiv2(topx + lefty + 2.0 * dcb + 2.0, 2)
        dcplane = jnp.where(y0 * x0 > 0.5, e_cor,
                            jnp.where(y0 > 0.5, e_top,
                                      jnp.where(x0 > 0.5, e_left, dcb)))
    else:
        dcplane = dcb
    blocks = [predsA[m * nn:(m + 1) * nn] for m in range(mg)]

    def blk_of(t):
        if gsel is None:
            return blocks[t]
        return blocks[t % mg]

    put_block(blocks, 1, dcplane)
    if n <= 16:
        a26 = floordiv2(fdot(tabs["adj26"], comb2), 1)
        put_block(blocks, 26, jnp.where(
            x0 > 0.5, jnp.clip(blk_of(26) + a26, 0.0, 255.0), blk_of(26)))
        a10 = floordiv2(fdot(tabs["adj10"], comb2), 1)
        put_block(blocks, 10, jnp.where(
            y0 > 0.5, jnp.clip(blk_of(10) + a10, 0.0, 255.0), blk_of(10)))
    nn_f = nn_pred_p.astype(f32)
    if cst["nn_policy"] == "sub18":
        put_block(blocks, 18, nn_f)
    elif cst["nn_policy"] == "append":
        put_block(blocks, 35, nn_f)
    preds = jnp.concatenate(blocks, axis=1)              # (nn, mg*B) f32

    orig_f = orig_p.astype(f32)
    orig_rep = jnp.concatenate([orig_f] * mg, axis=1)
    resi = orig_rep - preds

    # ---- forward transform, exact int32 via split matrices (the
    # operand ranges stay <= 255/180 so every partial matmul is f32-exact;
    # recombination and shifts happen in int32, matching the XLA int
    # einsum bit-for-bit) ----
    def tdot(kh, kl, x):
        return (256 * fdot(tabs[kh], x).astype(jnp.int32)
                + fdot(tabs[kl], x).astype(jnp.int32))

    add1 = jnp.int32(1 << (cst["shift1"] - 1))
    a_i = (tdot("f1h", "f1l", resi) + add1) >> cst["shift1"]
    hi = (a_i >> 8).astype(f32)
    lo = (a_i & 255).astype(f32)
    hs = tdot("f2h", "f2l", hi)
    ls = tdot("f2h", "f2l", lo)
    add2 = jnp.int32(1 << (cst["shift2"] - 1))
    coeff = ((hs + ((ls + add2) >> 8))
             >> (cst["shift2"] - 8)).astype(f32)

    # ---- RDOQ-lite (raster domain; transcribed from wavefront2) ----
    qstep = float(2.0 ** cst["qbits"])
    err_scale = f32(cst["err_scale"])
    if cst.get("tab_compact"):
        tile = lambda t: jnp.concatenate([t] * mg, axis=1)
        sig0 = tile(tabs["sig0e"])
        sig1 = tile(tabs["sig1e"])
        scanpos = tile(tabs["scanpos_e"])
        lastpb = tile(tabs["lastpb_e"])
    else:
        sig0 = tabs["sig0e"]
        sig1 = tabs["sig1e"]
        scanpos = tabs["scanpos_e"]
        lastpb = tabs["lastpb_e"]
    if rate_rows is None:
        rate_rows = jnp.zeros((8, B), jnp.int32)
    rr = jnp.concatenate([rate_rows] * mg, axis=1)       # (8, Mloc*B)
    dsig0_i = rr[0:1]
    dsig1_i = rr[1:2]
    dsig0_f = dsig0_i.astype(f32) * f32(1.0 / MBf)
    dsig1_f = dsig1_i.astype(f32) * f32(1.0 / MBf)
    dg = {"g1_0": rr[2:3], "g1_1": rr[3:4], "g2_0": rr[4:5],
          "g2_1": rr[5:6]}
    dcbf0_i = rr[6:7]
    dcbf1_i = rr[7:8]
    sign = jnp.sign(coeff)
    ldf = jnp.abs(coeff) * f32(cst["qscale"])
    ma = jnp.minimum(jnp.floor(ldf * f32(1.0 / qstep) + 0.5), 32767.0)
    lo_ = jnp.maximum(ma - 1.0, 1.0)

    def level_mbits_i(lvl_i):
        # Integer floor-log2 Golomb tail (== the float formulation for all
        # levels <= 40000; verified exhaustively).
        s = lvl_i - 3
        m = jnp.maximum(s - 2, 1)
        g = jnp.zeros_like(lvl_i)
        for j in range(1, 16):
            g = g + jnp.where(m >= (1 << j), 1, 0)
        golomb = jnp.where(s < 3, s + 1, 4 + 2 * g)
        sbi = lambda k: jnp.int32(round(SB[k] * MBf)) + dg[k]
        return jnp.int32(round(MBf)) + jnp.where(
            lvl_i == 1, sbi("g1_0"),
            jnp.where(lvl_i == 2, sbi("g1_1") + sbi("g2_0"),
                      sbi("g1_1") + sbi("g2_1")
                      + golomb * jnp.int32(round(MBf))))

    def level_bits(lvl_f):
        return (level_mbits_i(lvl_f.astype(jnp.int32)).astype(f32)
                * f32(1.0 / MBf))

    def coded_cost(lvl):
        err = ldf - lvl * f32(qstep)
        return (err * err * err_scale
                + f32(lam) * (sig1 + dsig1_f + level_bits(lvl)))

    d0 = ldf * ldf * err_scale
    cost0 = d0 + f32(lam) * (sig0 + dsig0_f)
    cost_hi = coded_cost(ma)
    cost_lo = coded_cost(lo_)
    pick_lo = cost_lo < cost_hi
    lvl_nz = jnp.where(pick_lo, lo_, ma)
    cost_nz = jnp.where(pick_lo, cost_lo, cost_hi)
    nz = jnp.logical_and(ma > 0, cost_nz < cost0)
    lvl = jnp.where(nz, lvl_nz, 0.0).astype(jnp.int32)

    sig0_i = jnp.round(sig0 * MBf).astype(jnp.int32) + dsig0_i
    sig1_i = jnp.round(sig1 * MBf).astype(jnp.int32) + dsig1_i
    sbi = lambda k: jnp.int32(round(SB[k] * MBf))
    nzb = lvl > 0
    last = jnp.max(jnp.where(nzb, scanpos, -1), axis=0, keepdims=True)
    cbf = last >= 0
    lastb = jnp.broadcast_to(last, (nn, preds.shape[1]))
    sig_paid = scanpos < lastb
    ncg = max(nn // 16, 1)
    if ncg > 1:
        cgs_row = scanpos >> 4                       # cg scan idx per pos
        lastcg = last >> 4
        csb_mb = jnp.zeros_like(last)
        cg_coded_full = []
        for cg in range(ncg):
            sl = slice(cg * 16, (cg + 1) * 16)
            cgnz = jnp.max(jnp.where(nzb[sl], 1, 0), axis=0, keepdims=True)
            cgi = cgs_row[cg * 16:cg * 16 + 1]
            paid = jnp.logical_and(cgi > 0, cgi < lastcg)
            csb_mb = csb_mb + jnp.where(
                paid, jnp.where(cgnz > 0, sbi("csb1"), sbi("csb0")), 0)
            coded = jnp.logical_or(jnp.logical_or(cgi == 0, cgi == lastcg),
                                   cgnz > 0)
            cg_coded_full.append(jnp.broadcast_to(coded,
                                                  (16, preds.shape[1])))
        sig_paid = jnp.logical_and(sig_paid,
                                   jnp.concatenate(cg_coded_full, axis=0))
    else:
        csb_mb = jnp.zeros_like(last)
    sig_mb = jnp.sum(jnp.where(sig_paid,
                               jnp.where(nzb, sig1_i, sig0_i), 0),
                     axis=0, keepdims=True)
    lvl_mb = jnp.sum(jnp.where(nzb, level_mbits_i(lvl), 0),
                     axis=0, keepdims=True)
    rsel = scanpos == jnp.broadcast_to(jnp.maximum(last, 0),
                                       (nn, preds.shape[1]))
    lb_mb = jnp.sum(jnp.where(rsel, lastpb, 0),
                    axis=0, keepdims=True)
    mb_coded = sbi("cbf1") + dcbf1_i + lb_mb + csb_mb + sig_mb + lvl_mb
    bits_coded = mb_coded.astype(f32) * f32(1.0 / MBf)
    DS = 4.0
    dc_el = jnp.where(nzb,
                      (ldf - lvl.astype(f32) * f32(qstep)) ** 2 * err_scale,
                      d0)
    d_coded = jnp.sum(jnp.round(dc_el * f32(DS)).astype(jnp.int32),
                      axis=0, keepdims=True).astype(f32) * f32(1.0 / DS)
    d_zero = jnp.sum(jnp.round(d0 * f32(DS)).astype(jnp.int32),
                     axis=0, keepdims=True).astype(f32) * f32(1.0 / DS)
    cbf0_extra = dcbf0_i.astype(f32) * f32(1.0 / MBf)
    zero_cost = d_zero + (f32(lam * SB["cbf0"]) + f32(lam) * cbf0_extra)
    keep = jnp.logical_and(cbf, d_coded + f32(lam) * bits_coded < zero_cost)
    keepb = jnp.broadcast_to(keep, (nn, preds.shape[1]))
    lvl = jnp.where(keepb, lvl, 0)
    tu_bits = jnp.where(keep, bits_coded, f32(SB["cbf0"]) + cbf0_extra)

    # ---- sign-data hiding (per 4x4 CG = 16 contiguous sublanes) ----
    wpos = scanpos & 15
    nzr = lvl > 0
    lvl_f = lvl.astype(f32)

    def dcost(new_lvl, old_lvl):
        dn_ = ((ldf - new_lvl * f32(qstep)) ** 2
               - (ldf - old_lvl * f32(qstep)) ** 2)
        return (dn_ * err_scale
                + f32(lam) * (level_bits(new_lvl) - level_bits(old_lvl)))

    big = f32(1e30)
    up = jnp.where(nzr, dcost(lvl_f + 1.0, lvl_f), big)
    dn = jnp.where(lvl >= 2, dcost(lvl_f - 1.0, lvl_f), big)
    best_adj = jnp.minimum(up, dn)
    hidden = jnp.zeros_like(last)
    adj_blocks = []
    for cg in range(ncg):
        sl = slice(cg * 16, (cg + 1) * 16)
        w = wpos[sl]
        nzg = nzr[sl]
        firstp = jnp.min(jnp.where(nzg, w, 16), axis=0, keepdims=True)
        lastp = jnp.max(jnp.where(nzg, w, -1), axis=0, keepdims=True)
        span_ok = (lastp - firstp) >= 4
        parity = jnp.sum(lvl[sl], axis=0, keepdims=True) & 1
        cf = jnp.clip(firstp, 0, 15)
        cfb = jnp.broadcast_to(cf, (16, preds.shape[1]))
        sfirst = jnp.sum(jnp.where(w == cfb, sign[sl].astype(jnp.int32), 0),
                         axis=0, keepdims=True)
        want = jnp.where(sfirst < 0, 1, 0)
        mismatch = jnp.logical_and(span_ok, parity != want)
        bag = best_adj[sl]
        minv = jnp.min(bag, axis=0, keepdims=True)
        minb = jnp.broadcast_to(minv, (16, preds.shape[1]))
        pick = jnp.min(jnp.where(bag == minb, w, 16), axis=0, keepdims=True)
        pickb = jnp.broadcast_to(jnp.clip(pick, 0, 15),
                                 (16, preds.shape[1]))
        at_pick = w == pickb
        up_p = jnp.sum(jnp.where(at_pick, up[sl], 0.0), axis=0,
                       keepdims=True)
        dn_p = jnp.sum(jnp.where(at_pick, dn[sl], 0.0), axis=0,
                       keepdims=True)
        delta = jnp.where(up_p <= dn_p, 1, -1)
        mmb = jnp.broadcast_to(mismatch, (16, preds.shape[1]))
        db = jnp.broadcast_to(delta, (16, preds.shape[1]))
        adj_blocks.append(jnp.where(jnp.logical_and(mmb, at_pick), db, 0))
        hidden = hidden + jnp.where(span_ok, 1, 0)
    lvl = lvl + jnp.concatenate(adj_blocks, axis=0)
    tu_bits = tu_bits - hidden.astype(f32)

    q = (sign * lvl.astype(f32)).astype(jnp.int32)

    # ---- dequant + inverse transform + reconstruction ----
    iq = cst["iq_shift"]
    if iq > 0:
        deq = (q * cst["iq_scale"] + (1 << (iq - 1))) >> iq
    else:
        deq = (q * cst["iq_scale"]) << (-iq)
    deq = jnp.clip(deq, -32768, 32767)
    dhi = (deq >> 8).astype(f32)
    dlo = (deq & 255).astype(f32)
    e1 = (256 * fdot(tabs["i1"], dhi).astype(jnp.int32)
          + fdot(tabs["i1"], dlo).astype(jnp.int32))
    e1 = jnp.clip((e1 + 64) >> 7, -32768, 32767)
    ehi = (e1 >> 8).astype(f32)
    elo = (e1 & 255).astype(f32)
    r2 = (256 * fdot(tabs["i2"], ehi).astype(jnp.int32)
          + fdot(tabs["i2"], elo).astype(jnp.int32))
    r2 = jnp.clip((r2 + (1 << 11)) >> 12, -32768, 32767)
    rec = jnp.clip(preds.astype(jnp.int32) + r2, 0, 255)

    sse = jnp.sum((rec - orig_rep.astype(jnp.int32)) ** 2,
                  axis=0, keepdims=True)
    cost = (sse.astype(f32)
            + f32(lam) * (tu_bits + mode_row[0:1, :])
            + tabs["mode_big"])

    # CABAC bin counts of this mode's decided TU (for the evolving rate
    # state): sig flags over paid positions, greater1/greater2 windows
    # approximated by all-nonzero (the same aggregation the static tables
    # use), cbf.  Row order matches rate_rows.
    nzf = lvl > 0
    cnt = jnp.concatenate([
        jnp.sum(jnp.where(jnp.logical_and(sig_paid, ~nzf), 1, 0),
                axis=0, keepdims=True),
        jnp.sum(jnp.where(jnp.logical_and(sig_paid, nzf), 1, 0),
                axis=0, keepdims=True),
        jnp.sum(jnp.where(lvl == 1, 1, 0), axis=0, keepdims=True),
        jnp.sum(jnp.where(lvl >= 2, 1, 0), axis=0, keepdims=True),
        jnp.sum(jnp.where(lvl == 2, 1, 0), axis=0, keepdims=True),
        jnp.sum(jnp.where(lvl >= 3, 1, 0), axis=0, keepdims=True),
        jnp.max(jnp.where(nzf, 1, 0), axis=0, keepdims=True),
        jnp.ones_like(dsig0_i),
    ], axis=0).astype(jnp.int32)
    return cost, rec, q, cnt


def _argmin_blocks(cst, cost, rec, q, cnt, m_cnt, m_offset, carry=None):
    """Running first-minimum argmin over mode blocks (strict <, ascending
    global mode ids == jnp.argmin tie-break).  `carry` continues a previous
    group's (minv, best, rec_b, q_b, cnt_b)."""
    import jax.numpy as jnp

    nn, B = cst["nn"], cst["B"]
    if carry is None:
        minv = cost[:, 0:B]
        best = jnp.zeros((1, B), jnp.int32) + m_offset * 1
        rec_b = rec[:, 0:B]
        q_b = q[:, 0:B]
        cnt_b = cnt[:, 0:B]
        start = 1
    else:
        minv, best, rec_b, q_b, cnt_b = carry
        start = 0
    for j in range(start, m_cnt):
        cm = cost[:, j * B:(j + 1) * B]
        better = cm < minv
        best = jnp.where(better, m_offset + j, best)
        minv = jnp.where(better, cm, minv)
        mk = jnp.broadcast_to(better, (nn, B))
        rec_b = jnp.where(mk, rec[:, j * B:(j + 1) * B], rec_b)
        q_b = jnp.where(mk, q[:, j * B:(j + 1) * B], q_b)
        ck = jnp.broadcast_to(better, (8, B))
        cnt_b = jnp.where(ck, cnt[:, j * B:(j + 1) * B], cnt_b)
    return minv, best, rec_b, q_b, cnt_b


def fused_trial_math(cst, tabs, comb, orig_p, mode_row, nn_pred_p,
                     rate_rows=None):
    """Single-block fused trial: blocks core + argmin/select, padded rows.

    Returns (cost (8,B) f32 row0, best (8,B) i32 row0, rec (nn,B) i32,
    q (nn,B) i32, counts (8,B) i32), bit-identical to the unfused XLA
    trial (counts are the chosen mode's CABAC bin counts)."""
    import jax.numpy as jnp

    B = cst["B"]
    cost, rec, q, cnt = _trial_blocks(cst, tabs, comb, orig_p, mode_row,
                                      nn_pred_p, rate_rows=rate_rows)
    minv, best, rec_b, q_b, cnt_b = _argmin_blocks(
        cst, cost, rec, q, cnt, M_PAD, 0)
    pad8 = jnp.zeros((7, B), jnp.float32)
    cost_out = jnp.concatenate([minv, pad8], axis=0)
    best_out = jnp.concatenate([best, pad8.astype(jnp.int32)], axis=0)
    return cost_out, best_out, rec_b, q_b, cnt_b


_TAB_KEYS = ("F", "Fs", "P2", "dcw", "selT", "selL", "adj26", "adj10",
             "y0", "x0", "f1h", "f1l", "f2h", "f2l", "i1", "i2", "sig0e",
             "sig1e", "scanpos_e", "lastpb_e", "mode_big")
_KRON_KEYS = ("f1h", "f1l", "f2h", "f2l", "i1", "i2")


def _load_tab(cst, k):
    import jax.numpy as jnp

    v = jnp.asarray(cst[k])
    if k in _KRON_KEYS and cst.get("groups", 1) > 1:
        v = v.astype(jnp.bfloat16)
    return v


def _pallas_run(cst):
    """One pallas_call fusing the whole trial; built once per consts.

    groups == 1: a single whole-array invocation.  groups > 1: a
    sequential grid over mode groups; each step runs _trial_blocks on its
    group's table slices and folds the result into a running argmin held
    in VMEM scratch (TPU grids are sequential, so the strict-< ascending
    update preserves jnp.argmin's first-minimum tie-break exactly); the
    last step writes the outputs.
    """
    run = cst.get("_pcall")
    if run is not None:
        return run
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nn, B, L = cst["nn"], cst["B"], cst["L"]
    G, mg = cst["groups"], cst["mg"]
    n_tab = len(_TAB_KEYS)
    out_shape = [
        jax.ShapeDtypeStruct((8, B), jnp.float32),
        jax.ShapeDtypeStruct((8, B), jnp.int32),
        jax.ShapeDtypeStruct((nn, B), jnp.int32),
        jax.ShapeDtypeStruct((nn, B), jnp.int32),
        jax.ShapeDtypeStruct((8, B), jnp.int32),
    ]
    tables = [_load_tab(cst, k) for k in _TAB_KEYS]
    interpret = jax.default_backend() not in ("tpu", "axon")

    if G == 1:
        def kernel(*refs):
            tabs = {k: refs[i][...] for i, k in enumerate(_TAB_KEYS)}
            comb = refs[n_tab][...]
            orig_p = refs[n_tab + 1][...]
            mode_row = refs[n_tab + 2][...]
            nn_pred = refs[n_tab + 3][...]
            rate_rows = refs[n_tab + 4][...]
            cost, best, rec, q, cnt = fused_trial_math(
                cst, tabs, comb, orig_p, mode_row, nn_pred,
                rate_rows=rate_rows)
            refs[n_tab + 5][...] = cost
            refs[n_tab + 6][...] = best
            refs[n_tab + 7][...] = rec
            refs[n_tab + 8][...] = q
            refs[n_tab + 9][...] = cnt

        call = pl.pallas_call(kernel, out_shape=out_shape,
                              interpret=interpret)

        def run(comb, orig_p, mode_row, nn_pred, rate_rows):
            return call(*tables, comb, orig_p, mode_row, nn_pred,
                        rate_rows)

        cst["_pcall"] = run
        return run

    def gkernel(*refs):
        g = pl.program_id(0)
        tabs = {k: refs[i][...] for i, k in enumerate(_TAB_KEYS)}
        comb = refs[n_tab][...]
        orig_p = refs[n_tab + 1][...]
        mode_row = refs[n_tab + 2][...]
        nn_pred = refs[n_tab + 3][...]
        rate_rows = refs[n_tab + 4][...]
        o_cost, o_best, o_rec, o_q, o_cnt = refs[n_tab + 5:n_tab + 10]
        s_min, s_best, s_rec, s_q, s_cnt = refs[n_tab + 10:n_tab + 15]
        cost, rec, q, cnt = _trial_blocks(cst, tabs, comb, orig_p,
                                          mode_row, nn_pred, gsel=g,
                                          rate_rows=rate_rows)

        @pl.when(g == 0)
        def _init():
            m0, b0, r0, q0, c0 = _argmin_blocks(cst, cost, rec, q, cnt,
                                                mg, 0)
            s_min[0:1, :] = m0
            s_best[0:1, :] = b0
            s_rec[...] = r0
            s_q[...] = q0
            s_cnt[...] = c0

        @pl.when(g > 0)
        def _fold():
            carry = (s_min[0:1, :], s_best[0:1, :], s_rec[...], s_q[...],
                     s_cnt[...])
            m1, b1, r1, q1, c1 = _argmin_blocks(cst, cost, rec, q, cnt,
                                                mg, g * mg, carry=carry)
            s_min[0:1, :] = m1
            s_best[0:1, :] = b1
            s_rec[...] = r1
            s_q[...] = q1
            s_cnt[...] = c1

        @pl.when(g == G - 1)
        def _emit():
            zero7f = jnp.zeros((7, B), jnp.float32)
            o_cost[...] = jnp.concatenate([s_min[0:1, :], zero7f], axis=0)
            o_best[...] = jnp.concatenate(
                [s_best[0:1, :], zero7f.astype(jnp.int32)], axis=0)
            o_rec[...] = s_rec[...]
            o_q[...] = s_q[...]
            o_cnt[...] = s_cnt[...]

    def spec(k):
        if k == "P2":
            return pl.BlockSpec((mg * nn, cst["RRp"]), lambda g: (g, 0))
        if k == "mode_big":
            return pl.BlockSpec((1, mg * B), lambda g: (0, g))
        shp = cst[k].shape
        return pl.BlockSpec(shp, lambda g: (0,) * len(shp))

    in_specs = [spec(k) for k in _TAB_KEYS] + [
        pl.BlockSpec((cst["Rp"], B), lambda g: (0, 0)),
        pl.BlockSpec((nn, B), lambda g: (0, 0)),
        pl.BlockSpec((8, mg * B), lambda g: (0, g)),
        pl.BlockSpec((nn, B), lambda g: (0, 0)),
        pl.BlockSpec((8, B), lambda g: (0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((8, B), lambda g: (0, 0)),
        pl.BlockSpec((8, B), lambda g: (0, 0)),
        pl.BlockSpec((nn, B), lambda g: (0, 0)),
        pl.BlockSpec((nn, B), lambda g: (0, 0)),
        pl.BlockSpec((8, B), lambda g: (0, 0)),
    ]
    params = {}
    if nn >= 1024:
        # The 32x32 kernel's six bf16 (n^2, n^2) transform matrices plus
        # working set need ~21 MB; raise the scoped-vmem ceiling past the
        # compiler's 16 MB default (v5e has headroom above it).
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    call = pl.pallas_call(
        gkernel, grid=(G,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((8, B), jnp.float32),
            pltpu.VMEM((8, B), jnp.int32),
            pltpu.VMEM((nn, B), jnp.int32),
            pltpu.VMEM((nn, B), jnp.int32),
            pltpu.VMEM((8, B), jnp.int32),
        ],
        interpret=interpret, **params)

    def run(comb, orig_p, mode_row, nn_pred, rate_rows):
        return call(*tables, comb, orig_p, mode_row, nn_pred, rate_rows)

    cst["_pcall"] = run
    return run


def trial_apply(cst, ref_top, ref_left, orig, mode_bits, nn_pred=None,
                impl="pallas", rate_rows=None):
    """Slot-major adapter around the fused trial.

    ref_top/ref_left (b, 2n+1) i32, orig (b, n, n) i32, mode_bits
    (b, n_modes) f32, nn_pred (b, n, n) i32 or None, rate_rows (8, b) i32
    live rate-state deltas or None (static tables).  Returns
    (cost (b,) f32, best (b,) i32, rec (b, n, n) i32, q (b, n, n) i32,
    counts (b, 8) i32), bit-identical to the unfused XLA trial.
    impl="xla" inlines the same math as plain ops (the exactness-test twin
    and CPU fallback).
    """
    import jax.numpy as jnp

    n, nn, B, L = cst["n"], cst["nn"], cst["B"], cst["L"]
    b = ref_top.shape[0]
    comb = jnp.concatenate([ref_top, ref_left], axis=1).astype(jnp.float32)
    comb = jnp.pad(comb, ((0, B - b), (0, cst["Rp"] - cst["R"]))).T
    pp = jnp.asarray(cst["pp"])
    orig_p = jnp.pad(orig.reshape(b, nn)[:, pp],
                     ((0, B - b), (0, 0))).T.astype(jnp.int32)
    if nn_pred is None:
        nnp = jnp.zeros((nn, B), jnp.int32)
    else:
        nnp = jnp.pad(nn_pred.reshape(b, nn)[:, pp],
                      ((0, B - b), (0, 0))).T.astype(jnp.int32)
    mb = jnp.pad(mode_bits.astype(jnp.float32),
                 ((0, B - b), (0, M_PAD - mode_bits.shape[1])))
    mode_row = jnp.pad(jnp.reshape(mb.T, (1, L)), ((0, 7), (0, 0)))
    if rate_rows is None:
        rr = jnp.zeros((8, B), jnp.int32)
    else:
        rr = jnp.pad(rate_rows.astype(jnp.int32), ((0, 0), (0, B - b)))
    if impl == "xla":
        tabs = {k: _load_tab(cst, k) for k in _TAB_KEYS}
        if cst["groups"] == 1:
            cost, best, rec, q, cnt = fused_trial_math(
                cst, tabs, comb, orig_p, mode_row, nnp, rate_rows=rr)
        else:
            mg = cst["mg"]
            carry = None
            for g in range(cst["groups"]):
                gt = dict(tabs)
                gt["P2"] = tabs["P2"][g * mg * nn:(g + 1) * mg * nn]
                gt["mode_big"] = tabs["mode_big"][:, g * mg * B:
                                                  (g + 1) * mg * B]
                mrow = mode_row[:, g * mg * B:(g + 1) * mg * B]
                c_r, r_r, q_r, n_r = _trial_blocks(cst, gt, comb, orig_p,
                                                   mrow, nnp, gsel=g,
                                                   rate_rows=rr)
                carry = _argmin_blocks(cst, c_r, r_r, q_r, n_r, mg,
                                       g * mg, carry=carry)
            minv, bestv, rec_b0, q_b0, cnt = carry
            pad8 = jnp.zeros((7, B), jnp.float32)
            cost = jnp.concatenate([minv, pad8], axis=0)
            best = jnp.concatenate([bestv, pad8.astype(jnp.int32)], axis=0)
            rec, q = rec_b0, q_b0
    else:
        cost, best, rec, q, cnt = _pallas_run(cst)(comb, orig_p, mode_row,
                                                   nnp, rr)
    ipp = jnp.asarray(cst["ipp"])
    rec_b = rec.T[:b][:, ipp].reshape(b, n, n)
    q_b = q.T[:b][:, ipp].reshape(b, n, n)
    return cost[0, :b], best[0, :b], rec_b, q_b, cnt.T[:b]
