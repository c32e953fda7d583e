"""PNN-in-the-loop intra prediction: context extraction + normative forward.

Parity with the reference codecs:
* context availability (`hm_16_15_substitution/.../TComPattern.cpp:109-175`):
  the CTU containing the anchor pixel (x - n, y - n) must exist - i.e. the
  anchor must lie inside the picture (left/above/above-left CTUs are always
  previously coded in All-Intra raster order);
* context extraction (`hm_common/c++/source_common/extraction_context.cpp`):
  the w x w above-left corner region is always copied; the 4-wide column
  strips of the above-right part and 4-tall row strips of the left part are
  copied only where the corresponding reference-sample unit is available,
  everything else staying zero in mean-subtracted space;
* prediction post-processing (`TComPrediction.cpp:621-637`): clip(pred + mean,
  0, 255) then round; unavailable context -> all-zero prediction;
* "pair" model selection at QP >= 32 (`TComPrediction.cpp:155-170`).

The forward runs through `models.pnn` (jitted); predictions are cached per TU
position so the encoder's repeated RD evaluations pay for one forward.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from ..models import pnn

QP_PAIR_THRESHOLD = 32  # QP >= 32 selects artifact-trained ("pair") models


@dataclass
class PnnBundle:
    """Per-width PNN models + the training mean, as used inside the codec.

    `pair_params` optionally holds artifact-trained ("pair") models; at
    QP >= 32 the codec selects them over the clean-trained set
    (`TComPrediction.cpp:155-170`).

    `mean_training` is a single float (reference behaviour: one channel mean
    for every width) or a width->mean dict when mixing models trained on
    different datasets (e.g. the shipped 4/8 checkpoints + locally trained
    16/32 models).

    `quantized`/`pair_quantized` hold the frozen deterministic integer
    models (`models/pnn_q.py`).  When present for a width they are the
    normative forward — required whenever encode and decode may batch NN
    calls differently (the device wavefront encoder does), since the float
    forward is not reduction-order invariant.
    """
    params: Dict[int, dict]            # width -> param pytree
    is_fully_connected: Dict[int, bool]
    mean_training: object              # float | Dict[int, float]
    pair_params: Optional[Dict[int, dict]] = None
    quantized: Optional[Dict[int, dict]] = None
    pair_quantized: Optional[Dict[int, dict]] = None

    def params_for_qp(self, qp: int) -> Dict[int, dict]:
        if self.pair_params is not None and qp >= QP_PAIR_THRESHOLD:
            # Per-width fallback: widths without a pair model keep the
            # clean-trained one (a partial pair zoo must not lose widths).
            merged = dict(self.params)
            merged.update(self.pair_params)
            return merged
        return self.params

    def quantized_for_qp(self, qp: int) -> Dict[int, dict]:
        if self.quantized is None:
            return {}
        if self.pair_quantized is not None and qp >= QP_PAIR_THRESHOLD:
            merged = dict(self.quantized)
            merged.update(self.pair_quantized)
            return merged
        return self.quantized

    def quantize(self, calib_images=None, n_samples: int = 256) -> "PnnBundle":
        """Returns a bundle with frozen quantized models for every width."""
        from ..models import pnn_q

        def build(src):
            out = {}
            for w, p in src.items():
                calib = pnn_q.calibration_contexts(
                    w, self.is_fully_connected[w], images=calib_images,
                    n_samples=n_samples)
                out[w] = pnn_q.quantize_pnn(p, calib, w,
                                            self.is_fully_connected[w])
            return out

        return PnnBundle(
            self.params, dict(self.is_fully_connected), self.mean_training,
            pair_params=self.pair_params,
            quantized=build(self.params),
            pair_quantized=(build(self.pair_params)
                            if self.pair_params is not None else None))

    def mean_for(self, n: int) -> float:
        if isinstance(self.mean_training, dict):
            return float(self.mean_training[n])
        return float(self.mean_training)

    @classmethod
    def from_checkpoints(cls, paths: Dict[int, str], mean_training: float,
                         is_fully_connected: Optional[Dict[int, bool]] = None):
        from ..models import importer

        params = {}
        arch = {}
        for width, path in paths.items():
            p = importer.import_tf_checkpoint(path)
            params[width] = p
            arch[width] = "fully_connected" in p
        if is_fully_connected:
            arch.update(is_fully_connected)
        return cls(params, arch, mean_training)


def context_available(x: int, y: int, n: int) -> bool:
    """True iff the anchor pixel (x-n, y-n) lies inside the picture."""
    return x - n >= 0 and y - n >= 0


def extract_context(recon: np.ndarray, x: int, y: int, n: int,
                    flags: np.ndarray, mean_training: float):
    """Masked (above (n,3n), left (2n,n)) float32 context portions.

    `flags` are the reference-sample availability flags in HM line order
    (the same array used for fillReferenceSamples).
    """
    n_units = (2 * n) // 4
    above = np.zeros((n, 3 * n), dtype=np.float32)
    left = np.zeros((2 * n, n), dtype=np.float32)

    # Above-left corner region: always available when contextFlag holds.
    above[:, :n] = recon[y - n:y, x - n:x].astype(np.float32) - mean_training
    # Above / above-right strips gated by the above-unit flags.
    h_limit = recon.shape[0]
    w_limit = recon.shape[1]
    for i in range(n_units):
        if flags[n_units + 1 + i]:
            x0 = x + i * 4
            x1 = min(x0 + 4, w_limit)
            above[:, n + i * 4: n + i * 4 + (x1 - x0)] = (
                recon[y - n:y, x0:x1].astype(np.float32) - mean_training)
    # Left strips, top to bottom; flag order is bottom-to-top.
    for i in range(n_units):
        if flags[n_units - 1 - i]:
            y0 = y + i * 4
            y1 = min(y0 + 4, h_limit)
            left[i * 4: i * 4 + (y1 - y0), :] = (
                recon[y0:y1, x - n:x].astype(np.float32) - mean_training)
    return above, left


@dataclass
class PnnPredictor:
    """Normative PNN prediction for one frame encode/decode."""
    bundle: PnnBundle
    qp: Optional[int] = None   # set by the codec; selects single vs pair models
    _cache: dict = field(default_factory=dict)

    def bind_qp(self, qp: int) -> "PnnPredictor":
        """Codec-side model selection (QP >= 32 -> pair models when present)."""
        if self.qp == qp:
            return self
        return PnnPredictor(self.bundle, qp)

    @property
    def _params(self):
        return self.bundle.params_for_qp(self.qp) if self.qp is not None \
            else self.bundle.params

    @property
    def _quantized(self):
        return self.bundle.quantized_for_qp(self.qp if self.qp is not None
                                            else 0)

    def supports(self, n: int) -> bool:
        # A quantized-only width (present in the quantized manifest but not
        # the float one) still needs the bundle's arch/mean metadata, which
        # load_codec_bundle populates from the float manifest — without the
        # gate, predict() would KeyError in is_fully_connected/mean_for.
        if n not in self.bundle.is_fully_connected:
            return False
        return n in self._params or n in self._quantized

    def predict(self, recon: np.ndarray, x: int, y: int, n: int,
                flags: np.ndarray) -> np.ndarray:
        """(n, n) int32 prediction in [0, 255]; zeros if context unavailable."""
        if not context_available(x, y, n) or not self.supports(n):
            return np.zeros((n, n), dtype=np.int32)
        mean = self.bundle.mean_for(n)
        above, left = extract_context(recon, x, y, n, flags, mean)
        return self._forward(above, left, n, mean, (x, y))

    def _forward(self, above, left, n, mean, pos) -> np.ndarray:
        # The cache key fingerprints the *context pixels*, not just the
        # position: during RDO the same TU position is predicted under
        # different neighbouring reconstructions (e.g. interior TUs of a
        # 64x64 PU across candidate modes).
        key = pos + (n, hash(above.tobytes()) ^ hash(left.tobytes()))
        if key in self._cache:
            return self._cache[key]
        if len(self._cache) > 4096:
            self._cache.clear()
        quant = self._quantized
        # The architecture follows the SELECTED model (QP-dependent pair
        # selection can flip it: e.g. width-4 single is the reference-
        # imported conv net, width-4 pair the locally trained FC net); the
        # quantized dict stores its own kind.
        if n in quant and "kind" in quant[n]:
            is_fc = str(np.asarray(quant[n]["kind"])) == "fc"
        elif n in self._params and isinstance(self._params[n], dict):
            is_fc = "fully_connected" in self._params[n]
        else:
            is_fc = self.bundle.is_fully_connected[n]
        if is_fc:
            inputs = np.concatenate(
                [above.reshape(1, -1), left.reshape(1, -1)], axis=1)
        else:
            inputs = (above[None, :, :, None], left[None, :, :, None])
        if n in quant:
            # Normative deterministic integer forward (models/pnn_q.py).
            from ..models import pnn_q

            out = np.asarray(pnn_q.predict_pixels_q(
                quant[n], inputs, n, is_fc, mean))[0]
        else:
            pred = np.asarray(pnn.forward(self._params[n], inputs, n,
                                          is_fc))[0, :, :, 0]
            out = np.round(np.clip(pred + mean, 0.0, 255.0)).astype(np.int32)
        self._cache[key] = out
        return out

    def predict_chroma(self, plane: np.ndarray, unit_coded2: np.ndarray,
                       xc: int, yc: int, nc: int, hc: int,
                       wc: int) -> np.ndarray:
        """Switch chroma PNNS prediction (chroma candidate slot 35 / DM of a
        PNNS luma PU, `hm_16_15_switch/.../TComDataCU.cpp:1364-1400`).

        The reference ships LUMINANCE graphs only (three-key manifests list
        channel 0), so its switch codec runs the luma-trained nets on chroma
        planes too; we do the same.  Availability at chroma unit (2-sample)
        granularity is pooled to the 4-sample units `extract_context`
        expects (a 4-unit is available iff both 2-units are - equivalent
        here because All-Intra TB boundaries are >= 4 chroma samples).
        Deterministic in (plane, position), so encoder == decoder bit-exact.
        """
        from ..ops import reference_samples as rs

        if not context_available(xc, yc, nc) or not self.supports(nc):
            return np.zeros((nc, nc), dtype=np.int32)
        c2 = unit_coded2
        pooled = (c2[0::2, 0::2] & c2[0::2, 1::2]
                  & c2[1::2, 0::2] & c2[1::2, 1::2])
        flags = rs.neighbor_unit_flags(pooled.astype(bool), xc, yc, nc,
                                       hc, wc)
        mean = self.bundle.mean_for(nc)
        above, left = extract_context(plane, xc, yc, nc, flags, mean)
        return self._forward(above, left, nc, mean, ("c", xc, yc))

    def invalidate(self):
        self._cache.clear()
