"""Force our encoder to HM's decided tree and measure REAL bits/SSE.

Decomposes the real-lambda-cost deficit (scripts/real_cost_cmp.py: ours
~+1% J vs HM at every QP):

* free      - our encoder, own search (baseline);
* structure - HM's CU splits + NxN + PU modes forced, our TU search/RDOQ;
* full      - additionally HM's TU-split decisions forced.

If `structure` beats `free` under real bits, our structure/mode search is
mispriced; the remaining `full`-vs-HM gap is coefficient-level (RDOQ/SAO).
Usage: forced_structure_probe.py [qp]
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    cabac, encoder, hm_decoder, hm_encoder, rdo)
from context_adaptive_neural_network_based_prediction_tpu.codec.contexts import \
    OFFSETS
from context_adaptive_neural_network_based_prediction_tpu.evaluation import \
    hm_driver
from context_adaptive_neural_network_based_prediction_tpu.utils import yuv

QP = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def hm_encode(frame, qp):
    enc = hm_driver.hm_binary("TAppEncoderStatic")
    cfg = "/root/reference/hevc/configuration/intra_main_rext.cfg"
    h, w = frame.shape
    with tempfile.TemporaryDirectory() as tmp:
        yi = os.path.join(tmp, "in.yuv")
        bo = os.path.join(tmp, "out.bin")
        ro = os.path.join(tmp, "rec.yuv")
        yuv.write_400_or_420(frame[:, :, None, None], yi)
        subprocess.run(
            [enc, "-c", cfg, "-i", yi, "-b", bo, "-o", ro,
             "-wdt", str(w), "-hgt", str(h), "--InputBitDepth=8",
             "--InputChromaFormat=400", "--FramesToBeEncoded=1",
             f"--QP={qp}"], capture_output=True, check=True)
        stream = open(bo, "rb").read()
        rec = yuv.read_400_or_420(h, w, 1, np.uint8, True, ro)[:, :, 0, 0]
    return stream, rec


class RecordingDecoder(hm_decoder.HmFrameDecoder):
    """Python-path decode that records every tree decision."""

    def __init__(self, annexb):
        super().__init__(annexb)
        self.splits = {}
        self.nxn = {}
        self.tu_splits = {}

    def _decode_cu(self, x, y, log2_size, depth):
        size = 1 << log2_size
        inside = x + size <= self.w and y + size <= self.h
        # Peek the split decision exactly like the parser, then delegate by
        # re-running; instead record via wrapping decode_bin around super.
        return super()._decode_cu(x, y, log2_size, depth)


def record_tree(stream):
    dec = RecordingDecoder(stream)
    orig_bin = cabac.CabacDecoder.decode_bin
    state = {"cu": None}

    import types

    real_decode_cu = hm_decoder.HmFrameDecoder._decode_cu
    real_tt = hm_decoder.HmFrameDecoder._transform_tree

    def traced_cu(self, x, y, log2_size, depth):
        size = 1 << log2_size
        inside = x + size <= self.w and y + size <= self.h
        prev = state["cu"]
        state["cu"] = (x, y, size)
        res = real_decode_cu(self, x, y, log2_size, depth)
        state["cu"] = prev
        return res

    def traced_tt(self, x, y, x_base, y_base, log2_size, tr_depth, blk_idx,
                  modes, chroma_mode, cbf_cb, cbf_cr, *, intra_split):
        state.setdefault("tt", []).append((x, y, 1 << log2_size, tr_depth))
        return real_tt(self, x, y, x_base, y_base, log2_size, tr_depth,
                       blk_idx, modes, chroma_mode, cbf_cb, cbf_cr,
                       intra_split=intra_split)

    def bin_(self, ctx, idx):
        v = orig_bin(self, ctx, idx)
        if OFFSETS.split_cu <= idx < OFFSETS.split_cu + 3:
            dec.splits[state["cu"]] = v
        elif idx == OFFSETS.part_size:
            dec.nxn[state["cu"][:2]] = 1 - v
        elif OFFSETS.trans_subdiv <= idx < OFFSETS.trans_subdiv + 3:
            dec.tu_splits[state["tt"][-1]] = v
        return v

    hm_decoder.HmFrameDecoder._decode_cu = traced_cu
    hm_decoder.HmFrameDecoder._transform_tree = traced_tt
    cabac.CabacDecoder.decode_bin = bin_
    try:
        dec.decode(use_native="never")
    finally:
        cabac.CabacDecoder.decode_bin = orig_bin
        hm_decoder.HmFrameDecoder._decode_cu = real_decode_cu
        hm_decoder.HmFrameDecoder._transform_tree = real_tt
    return dec


class ForcedEncoder(encoder.FrameEncoder):
    """Follows a recorded HM tree: splits, NxN, modes; TU optionally forced."""

    def attach(self, rec: RecordingDecoder, force_tu: bool,
               coeffs: dict | None = None):
        self._rec = rec
        self._force_tu = force_tu
        self._coeffs = coeffs

    def _code_tu(self, x, y, n, mode, counter_ctx, counter, *, tu_depth0,
                 pred=None, allow_tskip=True):
        if self._coeffs is None:
            return super()._code_tu(x, y, n, mode, counter_ctx, counter,
                                    tu_depth0=tu_depth0, pred=pred,
                                    allow_tskip=allow_tskip)
        from context_adaptive_neural_network_based_prediction_tpu.codec import \
            syntax
        from context_adaptive_neural_network_based_prediction_tpu.ops import \
            transform
        if pred is None:
            pred = self._predict_single(x, y, n, mode)
        orig = self.frame[y:y + n, x:x + n]
        q, tskip = self._coeffs[(x, y, n)]
        cbf = 1 if q.any() else 0
        cbf_ctx = OFFSETS.cbf_luma + (1 if tu_depth0 else 0)
        counter.encode_bin(cbf, counter_ctx, cbf_ctx)
        if cbf:
            if self.transform_skip and n == 4:
                counter.encode_bin(tskip, counter_ctx,
                                   OFFSETS.transform_skip)
            deq = transform.dequantize_np(q[None], self.qp)[0]
            if tskip:
                tshift = transform.transform_shift(2)
                rec_resi = (deq + (1 << (tshift - 1))) >> tshift
            else:
                rec_resi = transform.inverse_transform_np(
                    deq[None], use_dst=(n == 4))[0]
            rec = np.clip(pred + rec_resi, 0, 255)
            syntax.encode_coefficients(counter, counter_ctx, q,
                                       mode, self.sign_hiding)
        else:
            rec = pred
        self.recon[y:y + n, x:x + n] = rec
        self.unit_coded[y // 4:(y + n) // 4, x // 4:(x + n) // 4] = True
        self.tu_map[y // 4:(y + n) // 4, x // 4:(x + n) // 4] = self.tu_counter
        self.tu_counter += 1
        sse = int(((orig - rec) ** 2).sum())
        return sse, encoder.TuRecord(x, y, n, cbf, q if cbf else None, tskip)

    def compress_cu(self, x, y, size, depth):
        if x >= self.w or y >= self.h:
            return 0.0, None
        inside = x + size <= self.w and y + size <= self.h
        node = encoder.CuNode(x, y, size, depth, split=False)
        key = (x, y, size)
        split = self._rec.splits.get(key, 1 if (not inside and
                                                size > encoder.MIN_CU) else 0)
        counter = rdo.BitCounter()
        if size > encoder.MIN_CU and inside:
            counter.encode_bin(split, self.est_ctx,
                               OFFSETS.split_cu + self._split_ctx(x, y, depth))
        if split:
            cost = self.lam * counter.frac_bits
            half = size // 2
            node.split = True
            for (cx, cy) in ((x, y), (x + half, y), (x, y + half),
                             (x + half, y + half)):
                c, child = self.compress_cu(cx, cy, half, depth + 1)
                cost += c
                node.children.append(child)
            return cost, node
        cost, leaf = self._forced_leaf(x, y, size, depth)
        return cost + self.lam * counter.frac_bits, leaf

    def _forced_leaf(self, x, y, size, depth):
        node = encoder.CuNode(x, y, size, depth, split=False)
        cost = 0.0
        if size == encoder.MIN_CU:
            nxn = self._rec.nxn.get((x, y), 0)
            counter = rdo.BitCounter()
            counter.encode_bin(0 if nxn else 1, self.est_ctx,
                               OFFSETS.part_size)
            cost += self.lam * counter.frac_bits
            if nxn:
                node.part_nxn = True
                for (px, py) in ((x, y), (x + 4, y), (x, y + 4),
                                 (x + 4, y + 4)):
                    c, pu = self._forced_pu(px, py, 4, nxn=True)
                    cost += c
                    node.pus.append(pu)
                self._commit_depth(x, y, size, depth)
                return cost, node
        c, pu = self._forced_pu(x, y, size, nxn=False)
        node.pus = [pu]
        self._commit_depth(x, y, size, depth)
        return cost + c, node

    def _forced_pu(self, x, y, n, *, nxn):
        mode = int(self._rec.mode_map[y // 4, x // 4])
        mpms = self._mpms(x, y)
        return self._try_pu(x, y, n, mode, mpms, nxn=nxn)

    def _code_tu_tree(self, x, y, size, depth, mode, preds=None, *,
                      nxn=False, no_split=False):
        if not self._force_tu:
            return super()._code_tu_tree(x, y, size, depth, mode, preds,
                                         nxn=nxn, no_split=no_split)
        forced = size > encoder.MAX_TU
        half = size // 2
        quadrants = ((x, y), (x + half, y), (x, y + half),
                     (x + half, y + half))
        if forced:
            sse, bits, tus = 0, 0.0, []
            for (cx, cy) in quadrants:
                s, b, t = self._code_tu_tree(cx, cy, half, depth + 1, mode)
                sse += s
                bits += b
                tus += t
            return sse, bits, tus
        flag_present = size > 4 and depth < self.max_tu_depth
        flag_ctx = OFFSETS.trans_subdiv + (5 - (size.bit_length() - 1))
        tu_depth0 = depth == 0 and not nxn
        # HM's trace records the flag at the TU node position/depth; NxN PUs
        # sit one trafo level deeper in the HM trace.
        trace_depth = depth + 1 if nxn else depth
        split = self._rec.tu_splits.get((x, y, size, trace_depth), 0)
        counter = rdo.BitCounter()
        if flag_present:
            counter.encode_bin(split, self.est_ctx, flag_ctx)
        if not flag_present or not split:
            pred = None
            if preds is not None and depth == 0:
                pred = preds[mode]
            s, turec = self._code_tu(x, y, size, mode, self.est_ctx, counter,
                                     tu_depth0=tu_depth0, pred=pred,
                                     allow_tskip=nxn)
            return s, counter.frac_bits, [turec]
        sse_s, bits_s, tus_s = 0, counter.frac_bits, []
        for (cx, cy) in quadrants:
            s, b, t = self._code_tu_tree(cx, cy, half, depth + 1, mode)
            sse_s += s
            bits_s += b
            tus_s += t
        return sse_s, bits_s, tus_s


def measure(fe):
    res = fe.encode()
    stream = hm_encoder.assemble_hm_stream(
        res, sao_enabled=fe.sao, deblocking=fe.deblocking,
        sign_hiding=fe.sign_hiding, transform_skip=fe.transform_skip,
        max_tu_depth=fe.max_tu_depth, sao_grid=fe._sao_grid,
        strong_intra_smoothing=fe.strong_smoothing, ctu_size=fe.ctu)
    hd = hm_decoder.decode_hm_stream(stream)
    assert np.array_equal(res.reconstruction, hd.reconstruction)
    return len(stream) * 8, res.reconstruction


def main():
    frame = hm_driver.load_luminance(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg")[:384, :384]
    lam = rdo.lambda_for_qp(QP)

    hm_stream, hm_rec = hm_encode(frame, QP)
    hm_bits = len(hm_stream) * 8
    hm_sse = float(((frame.astype(np.int64) - hm_rec.astype(np.int64)) ** 2)
                   .sum())
    rec = record_tree(hm_stream)
    print(f"QP{QP} HM       : bits {hm_bits:7d} sse {hm_sse:11.0f} "
          f"J {hm_sse + lam * hm_bits:13.0f}")

    def run(label, fe):
        bits, recon = measure(fe)
        sse = float(((frame.astype(np.int64) -
                      recon.astype(np.int64)) ** 2).sum())
        print(f"QP{QP} {label:9s}: bits {bits:7d} sse {sse:11.0f} "
              f"J {sse + lam * bits:13.0f}  (J/J_HM "
              f"{(sse + lam * bits) / (hm_sse + lam * hm_bits):.4f})")

    run("free", encoder.FrameEncoder(frame, QP))
    fe = ForcedEncoder(frame, QP)
    fe.attach(rec, force_tu=False)
    run("structure", fe)
    fe = ForcedEncoder(frame, QP, max_tu_depth=3)
    fe.attach(rec, force_tu=False)
    run("struct+d3", fe)
    fe = ForcedEncoder(frame, QP, max_tu_depth=3)
    fe.attach(rec, force_tu=True)
    run("full", fe)

    # Everything forced incl. HM's exact levels: isolates the pure coding
    # layer.  Pre-filter recon must equal HM's; NAL size should match HM's
    # (any excess = our CABAC/syntax serialization inefficiency).
    d2 = hm_decoder.HmFrameDecoder(hm_stream)
    from context_adaptive_neural_network_based_prediction_tpu.codec import \
        native
    nres = native.hm_decode_slice_native(
        d2.sh.slice_data, width=d2.w, height=d2.h, ctu_size=d2.ctu,
        log2_min_cb=d2.sps.log2_min_cb, log2_max_tb=d2.sps.log2_max_tb,
        log2_min_tb=d2.sps.log2_min_tb,
        max_tr_depth_intra=d2.sps.max_transform_hierarchy_depth_intra,
        chroma=d2.chroma, qp=d2.qp, qp_cb=0, qp_cr=0,
        transform_skip_enabled=d2.pps.transform_skip_enabled,
        sign_data_hiding=d2.pps.sign_data_hiding,
        sao_luma=d2.sh.sao_luma, sao_chroma=d2.sh.sao_chroma,
        strong_intra_smoothing=d2.sps.strong_intra_smoothing,
        policy=0, reconstruct=False)
    coeffs = {}
    for meta in nres["tu_meta"]:
        plane, x, y, n, mode, cbf, tskip, off = (int(v) for v in meta)
        if plane:
            continue
        q = (nres["coeffs"][off:off + n * n].reshape(n, n).astype(np.int32)
             if cbf else np.zeros((n, n), np.int32))
        coeffs[(x, y, n)] = (q, tskip)
    fe = ForcedEncoder(frame, QP, max_tu_depth=3)
    fe.attach(rec, force_tu=True, coeffs=coeffs)
    res = fe.encode()
    hm_prefilter = hm_decoder.HmFrameDecoder(hm_stream)
    hm_prefilter.decode(use_native="auto")
    same = np.array_equal(fe.recon, hm_prefilter.recon)
    import context_adaptive_neural_network_based_prediction_tpu.codec.hm_encoder as he
    stream = he.assemble_hm_stream(
        res, sao_enabled=fe.sao, deblocking=fe.deblocking,
        sign_hiding=fe.sign_hiding, transform_skip=fe.transform_skip,
        max_tu_depth=fe.max_tu_depth, sao_grid=fe._sao_grid,
        strong_intra_smoothing=fe.strong_smoothing, ctu_size=fe.ctu)
    print(f"QP{QP} everything: bits {len(stream)*8:7d} vs HM {hm_bits:7d}  "
          f"pre-filter recon equal: {same}")


if __name__ == "__main__":
    main()
