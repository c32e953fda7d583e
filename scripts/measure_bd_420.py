"""4:2:0 BD-rate vs HM-16.15 (Main profile) + the chroma-RDO ablation.

Round-4 task 4 (two rounds overdue per VERDICT): the host codec now folds
each CU's best chroma mode cost into the luma split RD trial exactly where
HM does (TEncCu.cpp:763,1544).  This measures, on the same 256x256 YCbCr
frame over 5 QPs:

  * HM-16.15 anchor (intra_main.cfg, artifacts/hm_bin),
  * ours with integrated chroma RDO (the new default),
  * ours with the round-3 decoupled chroma post-pass,

decoding every framework stream through the STOCK HM decoder (conformance)
and reporting BD-rate on PSNR-Y and on the 6/1/1-weighted YUV PSNR, plus
the integrated-vs-decoupled delta.  Writes artifacts/bd_420_vs_hm.json.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    hm_encoder)
from context_adaptive_neural_network_based_prediction_tpu.utils import (
    color, images, metrics)

QPS = [22, 27, 32, 37, 42]
ENC = "/root/repo/artifacts/hm_bin/TAppEncoderStatic"
DEC = "/root/repo/artifacts/hm_bin/TAppDecoderStatic"
CFG = "/root/reference/hevc/configuration/intra_main.cfg"


def read_planes(path, h, w):
    with open(path, "rb") as f:
        y = np.fromfile(f, np.uint8, h * w).reshape(h, w)
        cb = np.fromfile(f, np.uint8, h * w // 4).reshape(h // 2, w // 2)
        cr = np.fromfile(f, np.uint8, h * w // 4).reshape(h // 2, w // 2)
    return y, cb, cr


def psnrs(y, cb, cr, ry, rcb, rcr):
    py = float(metrics.compute_psnr(y, ry))
    pcb = float(metrics.compute_psnr(cb, rcb))
    pcr = float(metrics.compute_psnr(cr, rcr))
    return py, pcb, pcr, (6 * py + pcb + pcr) / 8.0


def hm_point(y, cb, cr, qp):
    h, w = y.shape
    with tempfile.TemporaryDirectory() as tmp:
        yi, bo, ro = (os.path.join(tmp, n) for n in ("in.yuv", "o.bin",
                                                     "r.yuv"))
        with open(yi, "wb") as f:
            f.write(y.tobytes() + cb.tobytes() + cr.tobytes())
        subprocess.run(
            [ENC, "-c", CFG, "-i", yi, "-b", bo, "-o", ro,
             "-wdt", str(w), "-hgt", str(h), "--InputBitDepth=8",
             "--InputChromaFormat=420", "--FramesToBeEncoded=1",
             f"--QP={qp}"], capture_output=True, check=True)
        bits = os.path.getsize(bo) * 8
        ry, rcb, rcr = read_planes(ro, h, w)
    return bits / (1.5 * h * w), psnrs(y, cb, cr, ry, rcb, rcr)


def ours_point(y, cb, cr, qp, integrated):
    h, w = y.shape
    t0 = time.time()
    stream, res, rcb, rcr = hm_encoder.encode_frame_hm_420(
        (y, cb, cr), qp, chroma_in_rdo=integrated)
    enc_s = time.time() - t0
    # Conformance: decode through STOCK HM.
    with tempfile.TemporaryDirectory() as tmp:
        bo, ro = os.path.join(tmp, "o.bin"), os.path.join(tmp, "r.yuv")
        with open(bo, "wb") as f:
            f.write(stream)
        out = subprocess.run([DEC, "-b", bo, "-o", ro],
                             capture_output=True, text=True, check=True)
        assert "OK" in out.stdout or os.path.exists(ro)
        ry, rcb2, rcr2 = read_planes(ro, h, w)
    assert np.array_equal(ry, res.reconstruction), "luma decode mismatch"
    assert np.array_equal(rcb2, rcb) and np.array_equal(rcr2, rcr), \
        "chroma decode mismatch"
    return (len(stream) * 8 / (1.5 * h * w),
            psnrs(y, cb, cr, ry, rcb, rcr), enc_s)


def bd_table(ref, test, idx):
    lo = metrics.compute_bjontegaard(
        [r[0] for r in ref[:3]], [r[1][idx] for r in ref[:3]],
        [t[0] for t in test[:3]], [t[1][idx] for t in test[:3]])
    hi = metrics.compute_bjontegaard(
        [r[0] for r in ref[2:]], [r[1][idx] for r in ref[2:]],
        [t[0] for t in test[2:]], [t[1][idx] for t in test[2:]])
    full = metrics.compute_bjontegaard(
        [r[0] for r in ref], [r[1][idx] for r in ref],
        [t[0] for t in test], [t[1][idx] for t in test])
    return {"low": round(float(lo), 3), "high": round(float(hi), 3),
            "full": round(float(full), 3)}


def main():
    rgb = images.read_image_mode(
        "/root/reference/hevc/pseudo_data/rgb_library.jpg", "RGB")
    ycbcr = color.rgb_to_ycbcr(rgb)[:256, :256]
    y = ycbcr[:, :, 0].copy()
    cb = ycbcr[::2, ::2, 1].copy()
    cr = ycbcr[::2, ::2, 2].copy()

    out = {"frame": "rgb_library 256x256 YCbCr 4:2:0", "qps": QPS,
           "points": {}}
    for name in ("hm", "integrated", "decoupled"):
        out["points"][name] = []
    for qp in QPS:
        out["points"]["hm"].append(hm_point(y, cb, cr, qp))
        for name, integ in (("integrated", True), ("decoupled", False)):
            bpp, ps, enc_s = ours_point(y, cb, cr, qp, integ)
            out["points"][name].append((bpp, ps))
            print(f"QP{qp} {name}: {bpp:.4f} bpp "
                  f"Y {ps[0]:.2f} U {ps[1]:.2f} V {ps[2]:.2f} "
                  f"({enc_s:.0f}s, HM-decoded OK)", flush=True)
        print(f"QP{qp} hm: {out['points']['hm'][-1][0]:.4f} bpp "
              f"Y {out['points']['hm'][-1][1][0]:.2f}", flush=True)

    hm = out["points"]["hm"]
    for name in ("integrated", "decoupled"):
        pts = out["points"][name]
        out[f"bd_{name}_vs_hm_y"] = bd_table(hm, pts, 0)
        out[f"bd_{name}_vs_hm_yuv"] = bd_table(hm, pts, 3)
    dec = out["points"]["decoupled"]
    out["bd_integrated_vs_decoupled_yuv"] = bd_table(
        dec, out["points"]["integrated"], 3)
    json.dump(out, open("artifacts/bd_420_vs_hm.json", "w"), indent=1)
    print(json.dumps({k: v for k, v in out.items() if k.startswith("bd_")},
                     indent=1))


if __name__ == "__main__":
    main()
