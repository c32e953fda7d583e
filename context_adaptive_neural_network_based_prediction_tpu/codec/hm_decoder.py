"""HM-16.15 conformant HEVC decoder (All-Intra, 4:0:0, 8-bit).

Decodes *real* HM-16.15 bitstreams (Annex-B NAL stream as produced by
TAppEncoderStatic with `hevc/configuration/intra_main_rext.cfg`,
4:0:0 8-bit All-Intra) bit-exactly: NAL/SPS/PPS/slice-header parsing from
`hm_bitstream`, then HM-exact CABAC slice decoding (syntax order per
`TDecEntropy/TDecSbac/TDecCu` in
`/root/reference/hevc/hm_16_15_regular/source/Lib/TLibDecoder/`) and
normative reconstruction (intra prediction, dequant, inverse transform,
deblocking, SAO) on top of this framework's ops.

Output is verified against the decoded-picture-hash SEI that HM embeds
(SEIDecodedPictureHash checksum), making every decode self-checking.

Scope: I-slices, 4:0:0 (monochrome) or the luma plane of 4:2:0 with chroma
syntax parsed, no tiles/WPP/dependent slices, no scaling lists, no PCM — i.e.
exactly the configurations the reference uses for its experiments.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..ops import intra, reference_samples as rs, transform
from . import cabac, hm_bitstream, sao as sao_mod, syntax
from .contexts import OFFSETS, make_context_states


@dataclass
class HmDecodeResult:
    reconstruction: np.ndarray
    qp: int
    mode_map: np.ndarray
    hash_checked: bool
    hash_ok: bool


class HmFrameDecoder:
    def __init__(self, annexb: bytes):
        st = hm_bitstream.parse_stream(annexb)
        if st.sps.chroma_format_idc not in (0,):
            raise ValueError("only 4:0:0 streams supported")
        if st.sps.bit_depth_luma != 8:
            raise ValueError("only 8-bit streams supported")
        self.stream = st
        self.sps = st.sps
        self.pps = st.pps
        self.sh = st.slice_header
        self.qp = self.sh.qp
        self.w = st.sps.width
        self.h = st.sps.height
        self.ctu = st.sps.ctu_size
        self.min_cb = 1 << st.sps.log2_min_cb
        self.max_tb = 1 << st.sps.log2_max_tb
        self.min_tb = 1 << st.sps.log2_min_tb

        self.dec = cabac.CabacDecoder(self.sh.slice_data)
        self.ctx = make_context_states(self.qp)

        uh, uw = (self.h + 3) // 4, (self.w + 3) // 4
        self.recon = np.zeros((self.h, self.w), dtype=np.int32)
        self.unit_coded = np.zeros((uh, uw), dtype=bool)
        self.mode_map = np.full((uh, uw), -1, dtype=np.int32)
        self.depth_map = np.zeros((uh, uw), dtype=np.int32)
        self.tu_map = np.full((uh, uw), -1, dtype=np.int32)
        self.tu_counter = 0
        self.sao_grid = None

    # --------------------------------------------------------------- CUs ----

    def _split_ctx(self, x: int, y: int, depth: int) -> int:
        ctx = 0
        ux, uy = x // 4, y // 4
        if x > 0 and self.unit_coded[uy, ux - 1]:
            ctx += 1 if self.depth_map[uy, ux - 1] > depth else 0
        if y > 0 and self.unit_coded[uy - 1, ux]:
            ctx += 1 if self.depth_map[uy - 1, ux] > depth else 0
        return ctx

    def _neighbor_mode(self, nx: int, ny: int) -> int:
        """Intra mode of the 4x4 unit at sample (nx, ny); DC if unavailable.

        Availability follows *parse* order (mode recorded), matching HM's
        Z-scan neighbour availability in `getIntraDirPredictor` — inside an
        NxN CU the earlier PUs are valid MPM neighbours before their TUs
        reconstruct."""
        if nx < 0 or ny < 0:
            return syntax.DC_IDX
        m = int(self.mode_map[ny // 4, nx // 4])
        return m if m >= 0 else syntax.DC_IDX

    def _mpms(self, x: int, y: int):
        left = self._neighbor_mode(x - 1, y)
        if y % self.ctu == 0:
            # HM restricts the above neighbour to the current CTU row.
            above = syntax.DC_IDX
        else:
            above = self._neighbor_mode(x, y - 1)
        return syntax.mpm_candidates(left, above)

    def _decode_cu(self, x: int, y: int, log2_size: int, depth: int):
        size = 1 << log2_size
        inside = x + size <= self.w and y + size <= self.h
        if size > self.min_cb and inside:
            split = self.dec.decode_bin(
                self.ctx, OFFSETS.split_cu + self._split_ctx(x, y, depth))
        elif size > self.min_cb:
            split = 1  # partially outside: split inferred
        else:
            split = 0
        if split:
            half = size // 2
            for (cx, cy) in ((x, y), (x + half, y), (x, y + half),
                             (x + half, y + half)):
                if cx < self.w and cy < self.h:
                    self._decode_cu(cx, cy, log2_size - 1, depth + 1)
            return

        if self.pps.transquant_bypass_enabled:
            raise ValueError("transquant bypass unsupported")

        # part_mode: only present at the minimum CU size (intra).
        part_nxn = False
        if log2_size == self.sps.log2_min_cb:
            part_nxn = not self.dec.decode_bin(self.ctx, OFFSETS.part_size)

        if part_nxn:
            half = size // 2
            pu_xy = ((x, y), (x + half, y), (x, y + half), (x + half, y + half))
            # HM parses the four prev_intra_luma_pred_flags first, then the
            # four mpm_idx / rem_intra fields (TDecSbac::parseIntraDirLumaAng).
            prev_flags = [self.dec.decode_bin(self.ctx, OFFSETS.prev_intra)
                          for _ in range(4)]
            modes = []
            raw = []
            for i in range(4):
                if prev_flags[i]:
                    if self.dec.decode_bin_ep() == 0:
                        raw.append(("mpm", 0))
                    else:
                        raw.append(("mpm", 1 + self.dec.decode_bin_ep()))
                else:
                    raw.append(("rem", self.dec.decode_bins_ep(5)))
            for i, (px, py) in enumerate(pu_xy):
                mpms = self._mpms(px, py)
                kind, v = raw[i]
                if kind == "mpm":
                    mode = mpms[v]
                else:
                    rem = v
                    for m in sorted(mpms):
                        if rem >= m:
                            rem += 1
                    mode = rem
                modes.append(mode)
                # Record the mode before the next PU derives its MPMs.
                self.mode_map[py // 4:(py + half) // 4,
                              px // 4:(px + half) // 4] = mode
            self._transform_tree(x, y, log2_size, 0, modes,
                                 intra_split=True, max_depth_extra=1)
        else:
            if self.dec.decode_bin(self.ctx, OFFSETS.prev_intra):
                if self.dec.decode_bin_ep() == 0:
                    idx = 0
                else:
                    idx = 1 + self.dec.decode_bin_ep()
                mode = self._mpms(x, y)[idx]
            else:
                rem = self.dec.decode_bins_ep(5)
                for m in sorted(self._mpms(x, y)):
                    if rem >= m:
                        rem += 1
                mode = rem
            self.mode_map[y // 4:(y + size) // 4, x // 4:(x + size) // 4] = mode
            self._transform_tree(x, y, log2_size, 0, [mode] * 4,
                                 intra_split=False, max_depth_extra=0)

        self.depth_map[y // 4:(y + size) // 4, x // 4:(x + size) // 4] = depth

    # --------------------------------------------------------------- TUs ----

    def _transform_tree(self, x: int, y: int, log2_size: int, tr_depth: int,
                        pu_modes, *, intra_split: bool, max_depth_extra: int):
        max_depth = (self.sps.max_transform_hierarchy_depth_intra
                     + (1 if intra_split else 0))
        size = 1 << log2_size
        if log2_size > self.sps.log2_max_tb:
            split = 1
        elif intra_split and tr_depth == 0:
            split = 1
        elif (log2_size > self.sps.log2_min_tb and tr_depth < max_depth):
            split = self.dec.decode_bin(
                self.ctx, OFFSETS.trans_subdiv + (5 - log2_size))
        else:
            split = 0
        if split:
            half = size // 2
            for i, (cx, cy) in enumerate(((x, y), (x + half, y), (x, y + half),
                                          (x + half, y + half))):
                self._transform_tree(cx, cy, log2_size - 1, tr_depth + 1,
                                     pu_modes, intra_split=intra_split,
                                     max_depth_extra=max_depth_extra)
            return
        # Leaf TU: which PU does it belong to? (NxN -> quadrant index.)
        if intra_split:
            cu_size = 1 << self.sps.log2_min_cb
            qi = (2 if (y % cu_size) >= cu_size // 2 else 0) + \
                 (1 if (x % cu_size) >= cu_size // 2 else 0)
            mode = pu_modes[qi]
        else:
            mode = pu_modes[0]
        cbf = self.dec.decode_bin(
            self.ctx, OFFSETS.cbf_luma + (1 if tr_depth == 0 else 0))
        self._reconstruct_tu(x, y, size, mode, cbf)

    def _reconstruct_tu(self, x: int, y: int, n: int, mode: int, cbf: int):
        flags = rs.neighbor_unit_flags(self.unit_coded, x, y, n, self.h, self.w)
        ref_top, ref_left = rs.fill_reference_samples(self.recon, x, y, n, flags)
        if rs.use_filtered_for_mode(mode, n):
            ref_top, ref_left = rs.filter_reference_samples(
                ref_top, ref_left, n,
                strong_intra_smoothing=self.sps.strong_intra_smoothing)
        pred = intra.predict_one_mode_np(ref_top, ref_left, mode)
        if cbf:
            tskip = 0
            if self.pps.transform_skip_enabled and n == 4:
                tskip = self.dec.decode_bin(self.ctx, OFFSETS.transform_skip)
            q = syntax.decode_coefficients(self.dec, self.ctx, n, mode,
                                           self.pps.sign_data_hiding)
            deq = transform.dequantize_np(q[None], self.qp)[0]
            if tskip:
                tshift = transform.transform_shift(2)
                resi = (deq + (1 << (tshift - 1))) >> tshift
            else:
                resi = transform.inverse_transform_np(deq[None],
                                                      use_dst=(n == 4))[0]
            rec = np.clip(pred + resi, 0, 255)
        else:
            rec = pred
        self.recon[y:y + n, x:x + n] = rec
        self.unit_coded[y // 4:(y + n) // 4, x // 4:(x + n) // 4] = True
        self.tu_map[y // 4:(y + n) // 4, x // 4:(x + n) // 4] = self.tu_counter
        self.tu_counter += 1

    # -------------------------------------------------------------- frame ----

    def _decode_sao_ctu(self, cy: int, cx: int):
        grid = self.sao_grid
        if cx > 0 and self.dec.decode_bin(self.ctx, OFFSETS.sao_merge):
            grid[cy][cx] = grid[cy][cx - 1]
            return
        if cy > 0 and self.dec.decode_bin(self.ctx, OFFSETS.sao_merge):
            grid[cy][cx] = grid[cy - 1][cx]
            return
        if not self.dec.decode_bin(self.ctx, OFFSETS.sao_type):
            grid[cy][cx] = sao_mod.SaoParams()
            return
        is_eo = bool(self.dec.decode_bin_ep())
        mags = [sao_mod._decode_offset_mag(self.dec) for _ in range(4)]
        if not is_eo:
            offsets = []
            for m in mags:
                if m != 0 and self.dec.decode_bin_ep():
                    offsets.append(-m)
                else:
                    offsets.append(m)
            pos = self.dec.decode_bins_ep(5)
            grid[cy][cx] = sao_mod.SaoParams(sao_mod.MODE_BO, pos, tuple(offsets))
        else:
            eo_class = self.dec.decode_bins_ep(2)
            grid[cy][cx] = sao_mod.SaoParams(
                sao_mod.MODE_EO, eo_class, (mags[0], mags[1], -mags[2], -mags[3]))

    def decode(self) -> HmDecodeResult:
        n_ctu_y = (self.h + self.ctu - 1) // self.ctu
        n_ctu_x = (self.w + self.ctu - 1) // self.ctu
        if self.sh.sao_luma:
            self.sao_grid = [[None] * n_ctu_x for _ in range(n_ctu_y)]
        log2_ctu = self.sps.log2_max_cb
        for cy in range(n_ctu_y):
            for cx in range(n_ctu_x):
                if self.sh.sao_luma:
                    self._decode_sao_ctu(cy, cx)
                self._decode_cu(cx * self.ctu, cy * self.ctu, log2_ctu, 0)
                end = self.dec.decode_bin_trm()
                is_last = (cy == n_ctu_y - 1) and (cx == n_ctu_x - 1)
                if bool(end) != is_last:
                    raise ValueError(
                        f"end_of_slice_segment_flag desync at CTU ({cy},{cx})")

        out = self.recon.astype(np.uint8)
        if not self.sh.deblocking_disabled:
            from . import deblock

            out = deblock.deblock_luma(out, self.tu_map, self.qp)
        if self.sh.sao_luma:
            grid = [[p if p is not None else sao_mod.SaoParams() for p in row]
                    for row in self.sao_grid]
            out = sao_mod.apply_sao(out, grid, self.ctu)

        hash_checked = hash_ok = False
        if self.stream.picture_hash is not None:
            hash_type, values = self.stream.picture_hash
            if hash_type == 2 and values:
                hash_checked = True
                hash_ok = hm_bitstream.picture_checksum(out) == values[0]
        return HmDecodeResult(out, self.qp, self.mode_map.copy(),
                              hash_checked, hash_ok)


def decode_hm_stream(annexb: bytes) -> HmDecodeResult:
    """Decodes a real HM-16.15 All-Intra 4:0:0 8-bit bitstream."""
    return HmFrameDecoder(annexb).decode()
