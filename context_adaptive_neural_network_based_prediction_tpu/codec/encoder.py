"""All-Intra luma frame encoder with quadtree RDO and pluggable intra policy.

Re-designs the reference's three forked HM codecs (`hm_16_15_regular`,
`_substitution`, `_switch` - SURVEY.md N9-N11) as ONE encoder with a policy
switch:

* ``regular``      - the 35 HM intra modes;
* ``substitution`` - mode 18's prediction is replaced by the PNN when the
  context is available (`TComPrediction.cpp:510,556-663`), bitstream syntax
  unchanged;
* ``switch``       - the PNN is an extra signalled mode 35 ("PNNS") with its
  own CABAC context, MPM special cases and forced RD inclusion
  (`hm_16_15_switch`, SURVEY.md N11).

Structure (HM semantics, TPU-first layering):
* CU quadtree 64->8 with NxN (4x4 PUs) at the minimum CU size; TU = PU size
  capped at 32 (a 64x64 PU codes four 32x32 TUs sequentially);
* per-PU mode decision: batched 35-mode prediction + Hadamard-SATD fast pass
  (candidate counts per g_aucIntraModeNumFast_UseMPM) + MPMs, then full RD
  (transform/quant/recon + context-adaptive bit estimates) on the candidates;
* rate estimates evolve a dedicated context array along the committed syntax
  order, so estimation tracks CABAC adaptation; the real arithmetic pass
  serializes the decided tree afterwards.

The bitstream is this framework's own format (header + CABAC payload); HEVC
bit-exactness against HM NAL streams is a later-stage goal (SURVEY.md §7
stage 5); the decoder (`decoder.py`) reproduces the encoder reconstruction
bit-exactly, NN modes included.

The heavy math runs through the numpy twins of the jitted ops (identical
integer semantics, golden-tested against each other); the fully-jitted
wavefront path in `parallel/wavefront.py` is the TPU throughput engine.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..ops import intra, reference_samples as rs, transform
from . import cabac, rdo, syntax
from .contexts import OFFSETS, make_context_states
from .nn_intra import PnnPredictor

MAGIC = b"CPNN"
VERSION = 6
POLICIES = ("regular", "substitution", "switch")
PNNS_MODE = 35
MIN_CU = 8
MAX_TU = 32


@dataclass
class TuRecord:
    x: int
    y: int
    n: int
    cbf: int
    coeffs: Optional[np.ndarray]
    tskip: int = 0


@dataclass
class PuRecord:
    x: int
    y: int
    n: int
    mode: int
    tus: List[TuRecord] = field(default_factory=list)


@dataclass
class CuNode:
    x: int
    y: int
    size: int
    depth: int
    split: bool
    part_nxn: bool = False
    pus: List[PuRecord] = field(default_factory=list)
    children: list = field(default_factory=list)


@dataclass
class EncodeResult:
    bitstream: bytes
    reconstruction: np.ndarray
    num_bits: int
    ctu_trees: List[CuNode]
    mode_map: np.ndarray  # per 4x4 unit: chosen luma mode (-1 outside)
    qp: int
    policy: str


class FrameEncoder:
    def __init__(self, frame_uint8: np.ndarray, qp: int, *,
                 policy: str = "regular", pnn: Optional[PnnPredictor] = None,
                 ctu_size: int = 64, sign_hiding: bool = True,
                 strong_intra_smoothing: bool = True,
                 rd_candidates: Optional[dict] = None,
                 use_rdoq: bool = True, deblocking: bool = True,
                 max_tu_depth: int = 2, sao: bool = True,
                 transform_skip: bool = True, hm_speedup: bool = False,
                 tskip_fast: bool = True):
        if policy not in POLICIES:
            raise ValueError(f"unknown policy {policy!r}")
        if policy != "regular" and pnn is None:
            raise ValueError("NN policies need a PnnPredictor")
        frame = np.asarray(frame_uint8)
        if frame.dtype != np.uint8 or frame.ndim != 2:
            raise ValueError("frame must be a (H, W) uint8 luma channel")
        if frame.shape[0] % MIN_CU or frame.shape[1] % MIN_CU:
            raise ValueError("frame dims must be multiples of 8 (crop first)")
        self.frame = frame.astype(np.int32)
        self.h, self.w = frame.shape
        self.qp = qp
        self.policy = policy
        # QP-based single/pair model selection (TComPrediction.cpp:155-170).
        self.pnn = pnn.bind_qp(qp) if pnn is not None else None
        self.ctu = ctu_size
        self.sign_hiding = sign_hiding
        self.strong_smoothing = strong_intra_smoothing
        self.lam = rdo.lambda_for_qp(qp)
        self.sqrt_lam = self.lam ** 0.5
        self.use_rdoq = use_rdoq
        if sign_hiding and not use_rdoq:
            raise ValueError("sign_hiding requires RDOQ (the quantizer must "
                             "enforce the hidden sign's parity)")
        self.n_candidates = dict(rdo.NUM_FAST_CANDIDATES)
        if rd_candidates:
            self.n_candidates.update(rd_candidates)

        self.deblocking = deblocking
        self.sao = sao
        self.transform_skip = transform_skip
        # HHI_RQT_INTRA_SPEEDUP analog: mode decision at no-TU-split, full
        # TU search for the winner only.  Measured on rgb_library 384^2
        # (scripts/ablate_r2.py): the joint (mode, TU-tree) search beats the
        # two-stage HM structure by ~0.9-1.8% lambda-RD cost here, so the
        # speedup is OFF by default and kept as a fast preset.
        # tskip_fast = TransformSkipFast (neutral RD, fewer trials).
        self.hm_speedup = hm_speedup
        self.tskip_fast = tskip_fast
        self.max_tu_depth = max_tu_depth
        uh, uw = self.h // 4, self.w // 4
        self.recon = np.zeros((self.h, self.w), dtype=np.int32)
        self.unit_coded = np.zeros((uh, uw), dtype=bool)
        self.mode_map = np.full((uh, uw), -1, dtype=np.int32)
        self.depth_map = np.zeros((uh, uw), dtype=np.int32)
        self.tu_map = np.full((uh, uw), -1, dtype=np.int32)
        self.tu_counter = 0
        self.est_ctx = make_context_states(qp)

    # ------------------------------------------------------------ helpers --

    def _save(self, x, y, size):
        x1 = min(x + size, self.w)
        y1 = min(y + size, self.h)
        # Snapshot covers the CU area plus everything the trial may touch
        # (only the CU area itself changes; maps are unit-granular).
        return (self.recon[y:y1, x:x1].copy(),
                self.unit_coded[y // 4:y1 // 4, x // 4:x1 // 4].copy(),
                self.mode_map[y // 4:y1 // 4, x // 4:x1 // 4].copy(),
                self.depth_map[y // 4:y1 // 4, x // 4:x1 // 4].copy(),
                self.est_ctx.copy(),
                self.tu_map[y // 4:y1 // 4, x // 4:x1 // 4].copy())

    def _restore(self, x, y, size, snap):
        x1 = min(x + size, self.w)
        y1 = min(y + size, self.h)
        self.recon[y:y1, x:x1] = snap[0]
        self.unit_coded[y // 4:y1 // 4, x // 4:x1 // 4] = snap[1]
        self.mode_map[y // 4:y1 // 4, x // 4:x1 // 4] = snap[2]
        self.depth_map[y // 4:y1 // 4, x // 4:x1 // 4] = snap[3]
        self.est_ctx = snap[4]
        self.tu_map[y // 4:y1 // 4, x // 4:x1 // 4] = snap[5]

    def _neighbor_mode(self, x: int, y: int, left: bool) -> int:
        """Luma mode of the left/above PU for MPM (DC if unavailable)."""
        if left:
            nx, ny = x - 1, y
        else:
            nx, ny = x, y - 1
            if y % self.ctu == 0:
                return syntax.DC_IDX  # above CTU row: unavailable for MPM
        if nx < 0 or ny < 0:
            return syntax.DC_IDX
        m = int(self.mode_map[ny // 4, nx // 4])
        return m if m >= 0 else syntax.DC_IDX

    def _mpms(self, x: int, y: int):
        left = self._neighbor_mode(x, y, True)
        above = self._neighbor_mode(x, y, False)
        if self.policy == "switch":
            return self._mpms_switch(left, above)
        return syntax.mpm_candidates(left, above)

    @staticmethod
    def _mpms_switch(left: int, above: int):
        """hm_16_15_switch MPM rules (TComDataCU.cpp:1475-1596)."""
        if left == above:
            if 1 < left < PNNS_MODE:
                return [left, ((left + 29) % 32) + 2, ((left - 1) % 32) + 2]
            return [syntax.PLANAR_IDX, syntax.DC_IDX, syntax.VER_IDX]
        if left == PNNS_MODE or above == PNNS_MODE:
            m0 = above if left == PNNS_MODE else left
            if m0 > 1:
                return [m0, syntax.PLANAR_IDX, syntax.DC_IDX]
            if m0 == syntax.DC_IDX:
                return [syntax.DC_IDX, syntax.PLANAR_IDX, syntax.VER_IDX]
            return [syntax.PLANAR_IDX, syntax.DC_IDX, syntax.VER_IDX]
        return syntax.mpm_candidates(left, above)

    def _split_ctx(self, x: int, y: int, depth: int) -> int:
        ctx = 0
        ux, uy = x // 4, y // 4
        if x > 0 and self.unit_coded[uy, ux - 1]:
            ctx += 1 if self.depth_map[uy, ux - 1] > depth else 0
        if y > 0 and self.unit_coded[uy - 1, ux]:
            ctx += 1 if self.depth_map[uy - 1, ux] > depth else 0
        return ctx

    def _encode_mode_bits(self, counter, ctx, mode, mpms):
        if self.policy == "switch":
            counter.encode_bin(1 if mode == PNNS_MODE else 0, ctx, OFFSETS.pnns_flag)
            if mode == PNNS_MODE:
                return
        syntax.encode_intra_mode(counter, ctx, mode, mpms)

    # ------------------------------------------------------- prediction ----

    def _predict_modes(self, x, y, n):
        """All candidate-mode predictions for a TU/PU of size n at (x, y).

        Returns (preds dict mode->(n,n) int32 lazily materialized as array,
        flags) - concretely a (n_modes, n, n) array where entry m is mode m's
        prediction; for NN policies mode 18/35 are replaced appropriately.
        """
        flags = rs.neighbor_unit_flags(self.unit_coded, x, y, n, self.h, self.w)
        ref_top, ref_left = rs.fill_reference_samples(self.recon, x, y, n, flags)
        f_top, f_left = rs.filter_reference_samples(
            ref_top, ref_left, n, strong_intra_smoothing=self.strong_smoothing)
        both_top = np.stack([ref_top, f_top])
        both_left = np.stack([ref_left, f_left])
        preds_both = intra.predict_all_modes_np(both_top, both_left)
        use_filtered = np.array([rs.use_filtered_for_mode(m, n) for m in range(35)])
        preds = np.where(use_filtered[:, None, None], preds_both[1], preds_both[0])

        if self.policy == "substitution" and self.pnn.supports(n):
            # Widths without a model keep the angular mode-18 prediction
            # (the reference ships models for every width it runs; this
            # fallback only matters when the zoo is partial).
            preds[18] = self.pnn.predict(self.recon, x, y, n, flags)
        elif self.policy == "switch":
            pnns = self.pnn.predict(self.recon, x, y, n, flags)[None]
            preds = np.concatenate([preds, pnns], axis=0)
        return preds, flags

    def _predict_single(self, x, y, n, mode):
        """One-mode prediction for TU reconstruction (35x cheaper than the
        full sweep; NN modes route through the PnnPredictor)."""
        flags = rs.neighbor_unit_flags(self.unit_coded, x, y, n, self.h, self.w)
        if ((self.policy == "substitution" and mode == 18
             and self.pnn.supports(n)) or mode == PNNS_MODE):
            return self.pnn.predict(self.recon, x, y, n, flags)
        ref_top, ref_left = rs.fill_reference_samples(self.recon, x, y, n, flags)
        if rs.use_filtered_for_mode(mode, n):
            ref_top, ref_left = rs.filter_reference_samples(
                ref_top, ref_left, n,
                strong_intra_smoothing=self.strong_smoothing)
        return intra.predict_one_mode_np(ref_top, ref_left, mode)

    # ---------------------------------------------------------- PU search --

    def _code_tu(self, x, y, n, mode, counter_ctx, counter, *, tu_depth0: bool,
                 pred: Optional[np.ndarray] = None, allow_tskip: bool = True):
        """Transform-quant-recon one TU with `mode` prediction at current state.

        Returns (sse, tu_record); commits recon/unit_coded.  Rate is added to
        `counter` (cbf + coefficients).  `allow_tskip` gates the ts=1 *trial*
        (TransformSkipFast restricts it to NxN partitions,
        `TEncSearch.cpp:1528-1531`); the flag bin itself is always coded when
        the PPS enables transform skip.
        """
        if pred is None:
            pred = self._predict_single(x, y, n, mode)
        orig = self.frame[y:y + n, x:x + n]
        resi = orig - pred
        use_dst = n == 4
        syn_mode = mode if mode != PNNS_MODE else 0

        def quantize_path(coeff):
            if self.use_rdoq:
                from . import rdoq as rdoq_mod

                return rdoq_mod.rdoq(coeff, self.qp, syn_mode, self.lam,
                                     self.est_ctx,
                                     cbf_ctx_offset=1 if tu_depth0 else 0,
                                     sign_hiding=self.sign_hiding)
            return transform.quantize_np(coeff[None], self.qp)[0]

        coeff = transform.forward_transform_np(resi[None], use_dst=use_dst)[0]
        q = quantize_path(coeff)
        tskip = 0
        if self.transform_skip and n == 4 and (allow_tskip or not self.tskip_fast):
            # HM evaluates transform skip for 4x4 TUs: coeff = resi << tshift.
            tshift = transform.transform_shift(2)
            coeff_ts = (resi.astype(np.int32) << tshift)
            q_ts = quantize_path(coeff_ts)
            # RD compare the two (flag bit + coeff bits + distortion).
            def eval_path(qq, is_ts):
                c = rdo.BitCounter()
                scratch = counter_ctx.copy()
                cbf_ = 1 if qq.any() else 0
                c.encode_bin(cbf_, scratch,
                             OFFSETS.cbf_luma + (1 if tu_depth0 else 0))
                if cbf_:
                    c.encode_bin(1 if is_ts else 0, scratch,
                                 OFFSETS.transform_skip)
                    syntax.encode_coefficients(c, scratch, qq, syn_mode,
                                               self.sign_hiding)
                    deq_ = transform.dequantize_np(qq[None], self.qp)[0]
                    if is_ts:
                        add = 1 << (tshift - 1)
                        rr = (deq_ + add) >> tshift
                    else:
                        rr = transform.inverse_transform_np(
                            deq_[None], use_dst=True)[0]
                    rec_ = np.clip(pred + rr, 0, 255)
                else:
                    rec_ = pred
                sse_ = float(((orig - rec_) ** 2).sum())
                return sse_ + self.lam * c.frac_bits, rec_

            cost_t, _ = eval_path(q, False)
            cost_ts, _ = eval_path(q_ts, True)
            if cost_ts < cost_t:
                q = q_ts
                tskip = 1

        cbf = 1 if q.any() else 0
        # cbf context: TU at trafo depth 0 -> ctx 1; forced 64->32 split -> 0.
        cbf_ctx = OFFSETS.cbf_luma + (1 if tu_depth0 else 0)
        counter.encode_bin(cbf, counter_ctx, cbf_ctx)
        if cbf:
            if self.transform_skip and n == 4:
                counter.encode_bin(tskip, counter_ctx, OFFSETS.transform_skip)
            deq = transform.dequantize_np(q[None], self.qp)[0]
            if tskip:
                tshift = transform.transform_shift(2)
                rec_resi = (deq + (1 << (tshift - 1))) >> tshift
            else:
                rec_resi = transform.inverse_transform_np(deq[None],
                                                          use_dst=use_dst)[0]
            rec = np.clip(pred + rec_resi, 0, 255)
            syntax.encode_coefficients(counter, counter_ctx, q, syn_mode,
                                       self.sign_hiding)
        else:
            rec = pred
        self.recon[y:y + n, x:x + n] = rec
        self.unit_coded[y // 4:(y + n) // 4, x // 4:(x + n) // 4] = True
        self.tu_map[y // 4:(y + n) // 4, x // 4:(x + n) // 4] = self.tu_counter
        self.tu_counter += 1
        sse = int(((orig - rec) ** 2).sum())
        return sse, TuRecord(x, y, n, cbf, q if cbf else None, tskip)

    def _code_tu_tree(self, x, y, size, depth, mode, preds=None, *,
                      nxn: bool = False, no_split: bool = False):
        """Recursive TU quadtree RD search (xRecurIntraCodingLumaQT analog).

        Returns (sse, frac_bits, [TuRecord leaves in coding order]); commits
        the winning reconstruction/contexts.

        `nxn`: the PU is one 4x4 quadrant of an NxN CU — its TU sits at
        trafo depth 1 in the stream, so cbf_luma uses context 0 and transform
        skip may be trialled (TransformSkipFast).  `no_split`: evaluate the
        whole-TU option only (HM HHI_RQT_INTRA_SPEEDUP mode loop,
        `TEncSearch.cpp:1488-1506,2474`).
        """
        forced = size > MAX_TU
        half = size // 2
        quadrants = ((x, y), (x + half, y), (x, y + half), (x + half, y + half))
        if forced:
            sse, bits, tus = 0, 0.0, []
            for (cx, cy) in quadrants:
                s, b, t = self._code_tu_tree(cx, cy, half, depth + 1, mode,
                                             no_split=no_split)
                sse += s
                bits += b
                tus += t
            return sse, bits, tus

        flag_present = size > 4 and depth < self.max_tu_depth
        flag_ctx = OFFSETS.trans_subdiv + (5 - (size.bit_length() - 1))
        tu_depth0 = depth == 0 and not nxn
        pred = None
        if preds is not None and depth == 0:
            pred = preds[-1] if mode == PNNS_MODE else preds[mode]
        if not flag_present:
            counter = rdo.BitCounter()
            s, turec = self._code_tu(x, y, size, mode, self.est_ctx, counter,
                                     tu_depth0=tu_depth0, pred=pred,
                                     allow_tskip=nxn)
            return s, counter.frac_bits, [turec]

        pre = self._save(x, y, size)
        cw = rdo.BitCounter()
        cw.encode_bin(0, self.est_ctx, flag_ctx)
        s_w, turec = self._code_tu(x, y, size, mode, self.est_ctx, cw,
                                   tu_depth0=tu_depth0, pred=pred,
                                   allow_tskip=nxn)
        bits_w = cw.frac_bits
        if no_split:
            return s_w, bits_w, [turec]
        cost_w = s_w + self.lam * bits_w
        state_w = self._save(x, y, size)
        self._restore(x, y, size, pre)

        cs = rdo.BitCounter()
        cs.encode_bin(1, self.est_ctx, flag_ctx)
        sse_s, bits_s, tus_s = 0, cs.frac_bits, []
        for (cx, cy) in quadrants:
            s, b, t = self._code_tu_tree(cx, cy, half, depth + 1, mode)
            sse_s += s
            bits_s += b
            tus_s += t
        cost_s = sse_s + self.lam * bits_s
        if cost_w <= cost_s:
            self._restore(x, y, size, state_w)
            return s_w, bits_w, [turec]
        return sse_s, bits_s, tus_s

    def _try_pu(self, x, y, n, mode, mpms, preds=None, *, nxn: bool = False,
                no_split: bool = False) -> tuple:
        """Evaluate + commit one PU with a given mode.  Returns (cost, rec)."""
        counter = rdo.BitCounter()
        self._encode_mode_bits(counter, self.est_ctx, mode, mpms)
        pu = PuRecord(x, y, n, mode)
        sse, tu_bits, tus = self._code_tu_tree(x, y, n, 0, mode, preds,
                                               nxn=nxn, no_split=no_split)
        pu.tus = tus
        self.mode_map[y // 4:(y + n) // 4, x // 4:(x + n) // 4] = mode
        cost = sse + self.lam * (counter.frac_bits + tu_bits)
        return cost, pu

    def _search_pu(self, x, y, n, *, nxn: bool = False):
        """Candidate selection + RD over candidates; commits the winner.

        HM's HHI_RQT_INTRA_SPEEDUP structure (`TEncSearch.cpp:2474,2574`):
        the mode decision evaluates every candidate with the TU quadtree
        frozen at no-split, then the full TU-split search runs once, for the
        winning mode only.  Returns (cost, PuRecord).
        """
        mpms = self._mpms(x, y)
        preds, flags = self._predict_modes(x, y, n)
        orig = self.frame[y:y + n, x:x + n]

        resi = preds - orig[None]
        satd = rdo.satd(resi.astype(np.int32))
        n_modes = preds.shape[0]
        # Fast mode bits on a scratch context copy per mode.
        fast_costs = np.empty(n_modes)
        for m in range(n_modes):
            counter = rdo.BitCounter()
            scratch = self.est_ctx.copy()
            self._encode_mode_bits(counter, scratch, m if m < 35 else PNNS_MODE, mpms)
            fast_costs[m] = float(satd[m]) + self.sqrt_lam * counter.frac_bits

        k = self.n_candidates[n]
        order = np.argsort(fast_costs, kind="stable")
        candidates = list(order[:k])
        for m in mpms:
            if m not in candidates:
                candidates.append(m)
        if self.policy == "switch" and (n_modes - 1) not in candidates:
            candidates.append(n_modes - 1)  # force-include PNNS in full RD

        best = None
        pre = self._save(x, y, n)
        for m in candidates:
            mode = PNNS_MODE if (self.policy == "switch" and m == n_modes - 1) else int(m)
            cost, pu = self._try_pu(x, y, n, mode, mpms, preds=preds,
                                    nxn=nxn, no_split=self.hm_speedup)
            if best is None or cost < best[0]:
                best = (cost, pu, self._save(x, y, n))
            self._restore(x, y, n, pre)
        # TU-split refinement for the winner (the whole-TU option is part of
        # the full search, so its result can only match or beat the no-split
        # cost); 4x4 PUs have no split to search.
        if self.hm_speedup and n > 4:
            cost, pu = self._try_pu(x, y, n, best[1].mode, mpms, preds=preds,
                                    nxn=nxn)
            return cost, pu
        # Commit winner.
        self._restore(x, y, n, best[2])
        return best[0], best[1]

    # ---------------------------------------------------------- CU search --

    def compress_cu(self, x, y, size, depth):
        """Returns (cost, CuNode or None). Commits the winning state."""
        if x >= self.w or y >= self.h:
            return 0.0, None
        inside = x + size <= self.w and y + size <= self.h
        forced_split = not inside and size > MIN_CU
        can_split = size > MIN_CU
        node = CuNode(x, y, size, depth, split=False)

        split_flag_coded = can_split and inside
        best_whole = None
        if not forced_split:
            pre = self._save(x, y, size)
            counter = rdo.BitCounter()
            if split_flag_coded:
                counter.encode_bin(0, self.est_ctx,
                                   OFFSETS.split_cu + self._split_ctx(x, y, depth))
            flag_bits = counter.frac_bits
            cost_whole, node_whole = self._compress_leaf(x, y, size, depth)
            cost_whole += self.lam * flag_bits
            best_whole = (cost_whole, node_whole, self._save(x, y, size))
            self._restore(x, y, size, pre)

        if can_split:
            counter = rdo.BitCounter()
            if split_flag_coded:
                counter.encode_bin(1, self.est_ctx,
                                   OFFSETS.split_cu + self._split_ctx(x, y, depth))
            cost_split = self.lam * counter.frac_bits
            children = []
            half = size // 2
            for (cx, cy) in ((x, y), (x + half, y), (x, y + half), (x + half, y + half)):
                c_cost, c_node = self.compress_cu(cx, cy, half, depth + 1)
                cost_split += c_cost
                children.append(c_node)
            if best_whole is None or cost_split < best_whole[0]:
                node.split = True
                node.children = children
                return cost_split, node
            # Whole wins: roll back split state, re-apply whole state.
            self._restore(x, y, size, best_whole[2])
            return best_whole[0], best_whole[1]

        # Leaf-size CU: re-apply the whole-CU state (the trial loop restored
        # the pre-state).
        self._restore(x, y, size, best_whole[2])
        return best_whole[0], best_whole[1]

    def _compress_leaf(self, x, y, size, depth):
        """Leaf CU: 2Nx2N PU (and NxN alternative at the minimum CU size)."""
        node = CuNode(x, y, size, depth, split=False)
        if size > MIN_CU:
            cost, pu = self._search_pu(x, y, size)
            node.pus = [pu]
            self._commit_depth(x, y, size, depth)
            return cost, node

        # size == 8: compare 2Nx2N against NxN (four 4x4 PUs).
        pre = self._save(x, y, size)
        counter = rdo.BitCounter()
        counter.encode_bin(1, self.est_ctx, OFFSETS.part_size)  # 2Nx2N
        bits_part = counter.frac_bits
        cost_2n, pu_2n = self._search_pu(x, y, size)
        cost_2n += self.lam * bits_part
        state_2n = self._save(x, y, size)
        self._restore(x, y, size, pre)

        counter = rdo.BitCounter()
        counter.encode_bin(0, self.est_ctx, OFFSETS.part_size)  # NxN
        cost_nxn = self.lam * counter.frac_bits
        pus = []
        for (px, py) in ((x, y), (x + 4, y), (x, y + 4), (x + 4, y + 4)):
            c, pu = self._search_pu(px, py, 4, nxn=True)
            cost_nxn += c
            pus.append(pu)

        if cost_2n <= cost_nxn:
            self._restore(x, y, size, state_2n)
            node.pus = [pu_2n]
        else:
            node.part_nxn = True
            node.pus = pus
        self._commit_depth(x, y, size, depth)
        return min(cost_2n, cost_nxn), node

    def _commit_depth(self, x, y, size, depth):
        self.depth_map[y // 4:(y + size) // 4, x // 4:(x + size) // 4] = depth

    # ------------------------------------------------------------ driver ---

    def encode(self) -> EncodeResult:
        trees = []
        for cy in range(0, self.h, self.ctu):
            for cx in range(0, self.w, self.ctu):
                _cost, node = self.compress_cu(cx, cy, self.ctu, 0)
                trees.append(node)
        if self.deblocking:
            from . import deblock

            final = deblock.deblock_luma(self.recon.astype(np.uint8),
                                         self.tu_map, self.qp)
        else:
            final = self.recon.astype(np.uint8)
        sao_grid = None
        if self.sao:
            from . import sao as sao_mod

            sao_grid = sao_mod.estimate_frame(
                self.frame.astype(np.uint8), final, self.ctu, self.lam)
            final = sao_mod.apply_sao(final, sao_grid, self.ctu)
        self._sao_grid = sao_grid
        bitstream = self._serialize(trees)
        return EncodeResult(
            bitstream=bitstream,
            reconstruction=final,
            num_bits=len(bitstream) * 8,
            ctu_trees=trees,
            mode_map=self.mode_map.copy(),
            qp=self.qp,
            policy=self.policy,
        )

    # -------------------------------------------------------- serialization

    def _serialize(self, trees) -> bytes:
        return serialize_trees(trees, width=self.w, height=self.h, qp=self.qp,
                               policy=self.policy, ctu_size=self.ctu,
                               sign_hiding=self.sign_hiding,
                               deblocking=self.deblocking,
                               max_tu_depth=self.max_tu_depth,
                               sao_grid=self._sao_grid,
                               transform_skip=self.transform_skip)


def serialize_trees(trees, *, width: int, height: int, qp: int, policy: str,
                    ctu_size: int, sign_hiding: bool,
                    deblocking: bool = False, max_tu_depth: int = 0,
                    sao_grid=None, transform_skip: bool = False) -> bytes:
    """Real CABAC pass over decided CU trees -> framework bitstream.

    Shared by the RDO encoder and the wavefront (fixed-grid) encoder.
    """
    header = struct.pack("<4sBBBBBBBBBII", MAGIC, VERSION, POLICIES.index(policy),
                         qp, 1 if sign_hiding else 0, 1 if deblocking else 0,
                         max_tu_depth, 1 if sao_grid is not None else 0,
                         1 if transform_skip else 0, ctu_size, width, height)
    enc = cabac.CabacEncoder()
    ctx = make_context_states(qp)
    uh, uw = height // 4, width // 4
    mode_map = np.full((uh, uw), -1, dtype=np.int32)
    depth_map = np.zeros((uh, uw), dtype=np.int32)
    coded = np.zeros((uh, uw), dtype=bool)

    def split_ctx(x, y, depth):
        c = 0
        ux, uy = x // 4, y // 4
        if x > 0 and coded[uy, ux - 1]:
            c += 1 if depth_map[uy, ux - 1] > depth else 0
        if y > 0 and coded[uy - 1, ux]:
            c += 1 if depth_map[uy - 1, ux] > depth else 0
        return c

    def mpms_at(x, y):
        def nb(left):
            if left:
                nx, ny = x - 1, y
            else:
                nx, ny = x, y - 1
                if y % ctu_size == 0:
                    return syntax.DC_IDX
            if nx < 0 or ny < 0:
                return syntax.DC_IDX
            m = int(mode_map[ny // 4, nx // 4])
            return m if m >= 0 else syntax.DC_IDX
        left, above = nb(True), nb(False)
        if policy == "switch":
            return FrameEncoder._mpms_switch(left, above)
        return syntax.mpm_candidates(left, above)

    def ser_cu(node):
        if node is None:
            return
        x, y, size, depth = node.x, node.y, node.size, node.depth
        inside = x + size <= width and y + size <= height
        if size > MIN_CU and inside:
            enc.encode_bin(1 if node.split else 0, ctx,
                           OFFSETS.split_cu + split_ctx(x, y, depth))
        if node.split:
            for child in node.children:
                ser_cu(child)
            return
        if size == MIN_CU:
            enc.encode_bin(0 if node.part_nxn else 1, ctx, OFFSETS.part_size)
        for pu in node.pus:
            mpms = mpms_at(pu.x, pu.y)
            if policy == "switch":
                enc.encode_bin(1 if pu.mode == PNNS_MODE else 0, ctx,
                               OFFSETS.pnns_flag)
                if pu.mode != PNNS_MODE:
                    syntax.encode_intra_mode(enc, ctx, pu.mode, mpms)
            else:
                syntax.encode_intra_mode(enc, ctx, pu.mode, mpms)
            mode_map[pu.y // 4:(pu.y + pu.n) // 4,
                     pu.x // 4:(pu.x + pu.n) // 4] = pu.mode
            leaves = {(tu.x, tu.y, tu.n): tu for tu in pu.tus}

            def ser_tus(tx, ty, tsize, tdepth):
                forced = tsize > MAX_TU
                half = tsize // 2
                if forced:
                    for (cx, cy) in ((tx, ty), (tx + half, ty),
                                     (tx, ty + half), (tx + half, ty + half)):
                        ser_tus(cx, cy, half, tdepth + 1)
                    return
                leaf = leaves.get((tx, ty, tsize))
                if tsize > 4 and tdepth < max_tu_depth:
                    flag_ctx = OFFSETS.trans_subdiv + (5 - (tsize.bit_length() - 1))
                    enc.encode_bin(0 if leaf is not None else 1, ctx, flag_ctx)
                if leaf is None:
                    for (cx, cy) in ((tx, ty), (tx + half, ty),
                                     (tx, ty + half), (tx + half, ty + half)):
                        ser_tus(cx, cy, half, tdepth + 1)
                    return
                enc.encode_bin(leaf.cbf, ctx,
                               OFFSETS.cbf_luma + (1 if tdepth == 0 else 0))
                if leaf.cbf:
                    if transform_skip and leaf.n == 4:
                        enc.encode_bin(leaf.tskip, ctx, OFFSETS.transform_skip)
                    syntax.encode_coefficients(
                        enc, ctx, leaf.coeffs,
                        pu.mode if pu.mode != PNNS_MODE else 0, sign_hiding)

            # NxN PUs are quadrants of the CU-level transform tree: their TUs
            # sit at trafo depth 1 (cbf_luma context 0), like the HM layout.
            ser_tus(pu.x, pu.y, pu.n, 1 if node.part_nxn else 0)
        depth_map[y // 4:(y + size) // 4, x // 4:(x + size) // 4] = depth
        coded[y // 4:(y + size) // 4, x // 4:(x + size) // 4] = True

    for node in trees:
        ser_cu(node)
    if sao_grid is not None:
        from . import sao as sao_mod

        sao_mod.encode_params(enc, ctx, sao_grid)
    return header + enc.terminate_and_finish()


def encode_frame(frame_uint8: np.ndarray, qp: int, **kwargs) -> EncodeResult:
    """Convenience wrapper: encode one luma frame All-Intra at fixed QP."""
    return FrameEncoder(frame_uint8, qp, **kwargs).encode()
