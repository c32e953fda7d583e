"""At each PU our encoder searches, also evaluate HM's chosen mode (from the
decoded golden stream) under OUR cost model.  Classifies the MPM-hit-rate gap:

* ours genuinely cheaper under our model, but stream larger -> cost model
  miscalibrated vs real CABAC bits;
* HM's mode cheaper under our model too -> candidate search missed it.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from context_adaptive_neural_network_based_prediction_tpu.codec import (
    encoder, hm_decoder)

src = np.load("/root/repo/tests/golden_hm/128_full_q32_src.npy")
hm_stream = open("/root/repo/tests/golden_hm/128_full_q32.bin", "rb").read()
hm_dec = hm_decoder.HmFrameDecoder(hm_stream)
hm_res = hm_dec.decode(use_native="never")
hm_modes = hm_dec.mode_map

stats = {"same": 0, "diff": 0, "search_miss": 0, "model_pref": 0,
         "miss_bits": 0.0, "pref_margin": 0.0, "hm_not_in_cand": 0}


class Probe(encoder.FrameEncoder):
    def _search_pu(self, x, y, n):
        mpms = self._mpms(x, y)
        preds, flags = self._predict_modes(x, y, n)
        orig = self.frame[y:y + n, x:x + n]
        resi = preds - orig[None]
        from context_adaptive_neural_network_based_prediction_tpu.codec import rdo
        satd = rdo.satd(resi.astype(np.int32))
        n_modes = preds.shape[0]
        fast_costs = np.empty(n_modes)
        for m in range(n_modes):
            counter = rdo.BitCounter()
            scratch = self.est_ctx.copy()
            self._encode_mode_bits(counter, scratch, m, mpms)
            fast_costs[m] = float(satd[m]) + self.sqrt_lam * counter.frac_bits
        k = self.n_candidates[n]
        order = np.argsort(fast_costs, kind="stable")
        candidates = list(order[:k])
        for m in mpms:
            if m not in candidates:
                candidates.append(m)

        hm_mode = int(hm_modes[y // 4, x // 4])
        hm_uniform = np.all(hm_modes[y // 4:(y + n) // 4,
                                     x // 4:(x + n) // 4] == hm_mode)

        costs = {}
        best = None
        pre = self._save(x, y, n)
        for m in candidates:
            cost, pu = self._try_pu(x, y, n, int(m), mpms, preds=preds)
            costs[int(m)] = cost
            if best is None or cost < best[0]:
                best = (cost, pu, self._save(x, y, n))
            self._restore(x, y, n, pre)
        if hm_uniform and hm_mode < 35 and hm_mode not in costs:
            stats["hm_not_in_cand"] += 1
            cost, pu = self._try_pu(x, y, n, hm_mode, mpms, preds=preds)
            costs[hm_mode] = cost
            self._restore(x, y, n, pre)

        if hm_uniform and hm_mode < 35:
            win = best[1].mode
            if win == hm_mode:
                stats["same"] += 1
            else:
                stats["diff"] += 1
                if costs[hm_mode] < best[0]:
                    stats["search_miss"] += 1
                    stats["miss_bits"] += (best[0] - costs[hm_mode]) / self.lam
                else:
                    stats["model_pref"] += 1
                    stats["pref_margin"] += (costs[hm_mode] - best[0]) / self.lam
        self._restore(x, y, n, best[2])
        return best[0], best[1]


fe = Probe(src, 32)
res = fe.encode()
print(stats)
print("avg miss bits:", stats["miss_bits"] / max(stats["search_miss"], 1))
print("avg pref margin bits:", stats["pref_margin"] / max(stats["model_pref"], 1))
