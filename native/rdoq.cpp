// Native RDOQ: port of codec/rdoq.py (itself a faithful port of HM-16.15
// TComTrQuant::xRateDistOptQuant).  Must produce IDENTICAL levels to the
// Python implementation - asserted in tests.
//
// Compiled into libcabac_pack.so together with cabac_pack.cpp.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <vector>
#include <algorithm>
#include <limits>

namespace {

// Context layout offsets (stable prefix of codec/contexts.py).
enum {
  kCbfLuma = 5,
  kSigCg = 8,
  kSig = 10,
  kLastX = 38,
  kLastY = 53,
  kGreater1 = 68,
  kGreater2 = 84,
};

const int64_t kEntropyBits[128] = {
    0x07b23, 0x085f9, 0x074a0, 0x08cbc, 0x06ee4, 0x09354, 0x067f4, 0x09c1b,
    0x060b0, 0x0a62a, 0x05a9c, 0x0af5b, 0x0548d, 0x0b955, 0x04f56, 0x0c2a9,
    0x04a87, 0x0cbf7, 0x045d6, 0x0d5c3, 0x04144, 0x0e01b, 0x03d88, 0x0e937,
    0x039e0, 0x0f2cd, 0x03663, 0x0fc9e, 0x03347, 0x10600, 0x03050, 0x10f95,
    0x02d4d, 0x11a02, 0x02ad3, 0x12333, 0x0286e, 0x12cad, 0x02604, 0x136df,
    0x02425, 0x13f48, 0x021f4, 0x149c4, 0x0203e, 0x1527b, 0x01e4d, 0x15d00,
    0x01c99, 0x166de, 0x01b18, 0x17017, 0x019a5, 0x17988, 0x01841, 0x18327,
    0x016df, 0x18d50, 0x015d9, 0x19547, 0x0147c, 0x1a083, 0x0138e, 0x1a8a3,
    0x01251, 0x1b418, 0x01166, 0x1bd27, 0x01068, 0x1c77b, 0x00f7f, 0x1d18e,
    0x00eda, 0x1d91a, 0x00e19, 0x1e254, 0x00d4f, 0x1ec9a, 0x00c90, 0x1f6e0,
    0x00c01, 0x1fef8, 0x00b5f, 0x208b1, 0x00ab6, 0x21362, 0x00a15, 0x21e46,
    0x00988, 0x2285d, 0x00934, 0x22ea8, 0x008a8, 0x239b2, 0x0081d, 0x24577,
    0x007c9, 0x24ce6, 0x00763, 0x25663, 0x00710, 0x25e8f, 0x006a0, 0x26a26,
    0x00672, 0x26f23, 0x005e8, 0x27ef8, 0x005ba, 0x284b5, 0x0055e, 0x29057,
    0x0050c, 0x29bab, 0x004c1, 0x2a674, 0x004a7, 0x2aa5e, 0x0046f, 0x2b32f,
    0x0041f, 0x2c0ad, 0x003e7, 0x2ca8d, 0x003ba, 0x2d323, 0x0010c, 0x3bfbb};

const int32_t kQuantScales[6] = {26214, 23302, 20560, 18396, 16384, 14564};
const int32_t kInvQuantScales[6] = {40, 45, 51, 57, 64, 72};
const int32_t kGroupIdxR[32] = {0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7,
                                8, 8, 8, 8, 8, 8, 8, 8, 9, 9, 9, 9, 9, 9, 9, 9};
const int32_t kCtxIndMap4x4R[16] = {0, 1, 4, 5, 2, 3, 4, 5,
                                    6, 6, 8, 8, 7, 7, 8, 8};

enum { R_SCAN_DIAG = 0, R_SCAN_HOR = 1, R_SCAN_VER = 2 };

void r_pattern(int ncols, int nrows, int type, std::vector<int>& xs,
               std::vector<int>& ys) {
  if (type == R_SCAN_DIAG) {
    for (int d = 0; d < ncols + nrows - 1; d++)
      for (int x = 0; x <= d; x++) {
        int y = d - x;
        if (x < ncols && y < nrows) {
          xs.push_back(x);
          ys.push_back(y);
        }
      }
  } else if (type == R_SCAN_HOR) {
    for (int y = 0; y < nrows; y++)
      for (int x = 0; x < ncols; x++) {
        xs.push_back(x);
        ys.push_back(y);
      }
  } else {
    for (int x = 0; x < ncols; x++)
      for (int y = 0; y < nrows; y++) {
        xs.push_back(x);
        ys.push_back(y);
      }
  }
}

void r_build_scan(int n, int type, std::vector<int>& scan,
                  std::vector<int>& scan_cg) {
  std::vector<int> xs, ys;
  if (n <= 4) {
    r_pattern(n, n, type, xs, ys);
    for (size_t i = 0; i < xs.size(); i++) scan.push_back(xs[i] + ys[i] * n);
    scan_cg.push_back(0);
    return;
  }
  int cg = n / 4;
  std::vector<int> cx, cy, ix, iy;
  r_pattern(cg, cg, type, cx, cy);
  r_pattern(4, 4, type, ix, iy);
  for (size_t g = 0; g < cx.size(); g++) {
    scan_cg.push_back(cx[g] + cy[g] * cg);
    for (size_t i = 0; i < ix.size(); i++)
      scan.push_back((cx[g] * 4 + ix[i]) + (cy[g] * 4 + iy[i]) * n);
  }
}

int r_select_scan(int mode, int n) {
  if (n > 8) return R_SCAN_DIAG;
  if (std::abs(mode - 26) <= 4) return R_SCAN_HOR;
  if (std::abs(mode - 10) <= 4) return R_SCAN_VER;
  return R_SCAN_DIAG;
}

int r_sig_ctx(int pat, int px, int py, int log2n, int first_ctx) {
  if (px + py == 0) return kSig + 0;
  if (log2n == 2) return kSig + kCtxIndMap4x4R[4 * py + px];
  int sx = px & 3, sy = py & 3;
  int cnt;
  if (pat == 0) {
    int tot = sx + sy;
    cnt = tot >= 3 ? 0 : (tot >= 1 ? 1 : 2);
  } else if (pat == 1) {
    cnt = sy >= 2 ? 0 : (sy >= 1 ? 1 : 2);
  } else if (pat == 2) {
    cnt = sx >= 2 ? 0 : (sx >= 1 ? 1 : 2);
  } else {
    cnt = 2;
  }
  bool nf = ((px >> 2) + (py >> 2)) > 0;
  return kSig + first_ctx + (nf ? 3 : 0) + cnt;
}

inline int64_t bits_of(const int32_t* ctx, int idx, int bin) {
  return kEntropyBits[ctx[idx] ^ bin];
}

int64_t ic_rate(int abs_level, int64_t g1b0, int64_t g1b1, int64_t g2b0,
                int64_t g2b1, int go_rice, int c1_idx, int c2_idx) {
  int64_t rate = 1 << 15;  // sign
  int base_level = (c1_idx < 8) ? (2 + (c2_idx < 1 ? 1 : 0)) : 1;
  if (abs_level >= base_level) {
    int symbol = abs_level - base_level;
    if (symbol < (3 << go_rice)) {
      int length = symbol >> go_rice;
      rate += static_cast<int64_t>(length + 1 + go_rice) << 15;
    } else {
      int length = go_rice;
      symbol -= 3 << go_rice;
      while (symbol >= (1 << length)) {
        symbol -= 1 << length;
        length++;
      }
      rate += static_cast<int64_t>(3 + length + 1 - go_rice + length) << 15;
    }
    if (c1_idx < 8) {
      rate += g1b1;
      if (c2_idx < 1) rate += g2b1;
    }
  } else if (abs_level == 1) {
    rate += g1b0;
  } else if (abs_level == 2) {
    rate += g1b1 + g2b0;
  } else {
    rate = 0;
  }
  return rate;
}

}  // namespace

extern "C" {

// RD-optimized quantization of one n x n luma TU.  ctx is the running context
// state array (read-only).  Returns 0, or -1 on bad args.
int rdoq_tu(const int32_t* coeffs, int n, int qp, int mode, double lam,
            const int32_t* ctx, int cbf_ctx_offset, int sign_hiding,
            int32_t* out) {
  if (n < 4 || n > 32) return -1;
  int log2n = 0;
  while ((1 << log2n) < n) log2n++;
  const int per = qp / 6, rem = qp % 6;
  const int tshift = 15 - 8 - log2n;
  const int qbits = 14 + per + tshift;
  const int64_t qscale = kQuantScales[rem];
  const double err_scale =
      static_cast<double>(1 << 15) * std::pow(2.0, -2.0 * tshift) /
      qscale / qscale;
  const int64_t entropy_max = (1 << 15) - 1;

  const int scan_type = r_select_scan(mode, n);
  std::vector<int> scan, scan_cg;
  r_build_scan(n, scan_type, scan, scan_cg);
  const int wig = std::max(n / 4, 1);
  const int first_ctx =
      n == 4 ? 0 : (n == 8 ? (scan_type != R_SCAN_DIAG ? 15 : 9) : 21);
  const int total = n * n;
  const int cg_num = std::max(total >> 4, 1);
  const int cg_size = std::min(total, 16);

  std::vector<int64_t> level_double(total), max_abs(total);
  std::vector<double> cost_coeff0_blk(total);
  for (int i = 0; i < total; i++) {
    int64_t a = std::llabs(static_cast<int64_t>(coeffs[i]));
    level_double[i] = a * qscale;
    max_abs[i] = std::min<int64_t>(
        (level_double[i] + (static_cast<int64_t>(1) << (qbits - 1))) >> qbits,
        entropy_max);
    double e = static_cast<double>(level_double[i]);
    cost_coeff0_blk[i] = e * e * err_scale;
  }

  std::vector<int64_t> dst(total, 0), delta_u(total, 0), rate_inc_up(total, 0),
      rate_inc_down(total, 0), sig_rate_delta(total, 0);
  std::vector<double> cost_coeff(total, 0.0), cost_sig(total, 0.0),
      cost_coeff0(total, 0.0);
  std::vector<int64_t> sig_cg_flags(cg_num, 0);
  std::vector<double> cost_cg_sig(cg_num, 0.0);

  double block_uncoded_cost = 0.0, base_cost = 0.0;
  int last_scan_pos = -1, cg_last_scan_pos = -1;
  int ctx_set = 0, c1 = 1, c2 = 0, c1_idx = 0, c2_idx = 0, go_rice = 0;
  const double BIG = 1e30;

  for (int cg_scan_pos = cg_num - 1; cg_scan_pos >= 0; cg_scan_pos--) {
    int cg_blk = scan_cg[cg_scan_pos];
    int cg_y = cg_blk / wig, cg_x = cg_blk % wig;
    bool right = cg_x < wig - 1 && sig_cg_flags[cg_blk + 1];
    bool below = cg_y < wig - 1 && sig_cg_flags[cg_blk + wig];
    int pattern = (right ? 1 : 0) + (below ? 2 : 0);

    double rd_sig_cost = 0.0, rd_sig_cost_0 = 0.0;
    double rd_coded_dist = 0.0, rd_uncoded_dist = 0.0;
    int rd_nnz_before0 = 0;

    for (int pos_in_cg = cg_size - 1; pos_in_cg >= 0; pos_in_cg--) {
      int scan_pos = cg_scan_pos * cg_size + pos_in_cg;
      int blk = scan[scan_pos];
      int64_t ld = level_double[blk];
      int64_t ma = max_abs[blk];
      cost_coeff0[scan_pos] = cost_coeff0_blk[blk];
      block_uncoded_cost += cost_coeff0[scan_pos];
      dst[blk] = ma;
      if (ma > 0 && last_scan_pos < 0) {
        last_scan_pos = scan_pos;
        ctx_set = (scan_pos >> 4) > 0 ? 2 : 0;
        cg_last_scan_pos = cg_scan_pos;
      }

      if (last_scan_pos >= 0) {
        int one_ctx = 4 * ctx_set + c1;
        int abs_ctx = std::min(ctx_set + c2, 3);
        bool is_last = scan_pos == last_scan_pos;
        int sig_ctx_inc = 0;
        double cost_sig_1 = 0.0;
        if (!is_last) {
          int py = blk / n, px = blk % n;
          sig_ctx_inc = r_sig_ctx(pattern, px, py, log2n, first_ctx);
          cost_sig_1 = lam * bits_of(ctx, sig_ctx_inc, 1);
        }
        int64_t best_level = 0;
        double coded_cost;
        if (!is_last && ma < 3) {
          cost_sig[scan_pos] = lam * bits_of(ctx, sig_ctx_inc, 0);
          cost_coeff[scan_pos] = cost_coeff0[scan_pos] + cost_sig[scan_pos];
          coded_cost = cost_coeff[scan_pos];
        } else {
          coded_cost = BIG;
        }
        if (ma > 0) {
          int64_t min_abs = ma > 1 ? ma - 1 : 1;
          int64_t g1b0 = bits_of(ctx, kGreater1 + one_ctx, 0);
          int64_t g1b1 = bits_of(ctx, kGreater1 + one_ctx, 1);
          int64_t g2b0 = bits_of(ctx, kGreater2 + abs_ctx, 0);
          int64_t g2b1 = bits_of(ctx, kGreater2 + abs_ctx, 1);
          for (int64_t lvl = ma; lvl >= min_abs; lvl--) {
            double err = static_cast<double>(ld - (lvl << qbits));
            double cur = err * err * err_scale +
                         lam * ic_rate(static_cast<int>(lvl), g1b0, g1b1, g2b0,
                                       g2b1, go_rice, c1_idx, c2_idx) +
                         cost_sig_1;
            if (cur < coded_cost) {
              best_level = lvl;
              coded_cost = cur;
              cost_coeff[scan_pos] = cur;
              cost_sig[scan_pos] = cost_sig_1;
            }
          }
        }
        int64_t level = best_level;
        dst[blk] = level;
        base_cost += cost_coeff[scan_pos];
        if (!is_last) {
          sig_rate_delta[blk] =
              bits_of(ctx, sig_ctx_inc, 1) - bits_of(ctx, sig_ctx_inc, 0);
        }
        delta_u[blk] = (ld - (level << qbits)) >> (qbits - 8);
        if (level > 0) {
          int64_t g1b0 = bits_of(ctx, kGreater1 + one_ctx, 0);
          int64_t g1b1 = bits_of(ctx, kGreater1 + one_ctx, 1);
          int64_t g2b0 = bits_of(ctx, kGreater2 + abs_ctx, 0);
          int64_t g2b1 = bits_of(ctx, kGreater2 + abs_ctx, 1);
          int64_t rate_now = ic_rate(static_cast<int>(level), g1b0, g1b1, g2b0,
                                     g2b1, go_rice, c1_idx, c2_idx);
          rate_inc_up[blk] = ic_rate(static_cast<int>(level) + 1, g1b0, g1b1,
                                     g2b0, g2b1, go_rice, c1_idx, c2_idx) -
                             rate_now;
          rate_inc_down[blk] = ic_rate(static_cast<int>(level) - 1, g1b0, g1b1,
                                       g2b0, g2b1, go_rice, c1_idx, c2_idx) -
                               rate_now;
        } else {
          rate_inc_up[blk] = bits_of(ctx, kGreater1 + one_ctx, 0);
        }
        int base_level = (c1_idx < 8) ? (2 + (c2_idx < 1 ? 1 : 0)) : 1;
        if (level >= base_level && level > (3 << go_rice))
          go_rice = std::min(go_rice + 1, 4);
        if (level >= 1) c1_idx++;
        if (level > 1) {
          c1 = 0;
          c2 += (c2 < 2);
          c2_idx++;
        } else if (c1 < 3 && c1 > 0 && level) {
          c1++;
        }
        if (scan_pos % cg_size == 0 && scan_pos > 0) {
          ctx_set = (((scan_pos - 1) >> 4) > 0 ? 2 : 0) + (c1 == 0 ? 1 : 0);
          c1 = 1;
          c2 = 0;
          c1_idx = 0;
          c2_idx = 0;
          go_rice = 0;
        }
      } else {
        base_cost += cost_coeff0[scan_pos];
      }

      rd_sig_cost += cost_sig[scan_pos];
      if (pos_in_cg == 0) rd_sig_cost_0 = cost_sig[scan_pos];
      if (dst[blk]) {
        sig_cg_flags[cg_blk] = 1;
        rd_coded_dist += cost_coeff[scan_pos] - cost_sig[scan_pos];
        rd_uncoded_dist += cost_coeff0[scan_pos];
        if (pos_in_cg != 0) rd_nnz_before0++;
      }
    }

    if (cg_last_scan_pos >= 0) {
      if (cg_scan_pos) {
        int cg_ctx = (right || below) ? 1 : 0;
        if (sig_cg_flags[cg_blk] == 0) {
          double rate0 = lam * bits_of(ctx, kSigCg + cg_ctx, 0);
          base_cost += rate0 - rd_sig_cost;
          cost_cg_sig[cg_scan_pos] = rate0;
        } else if (cg_scan_pos < cg_last_scan_pos) {
          if (rd_nnz_before0 == 0) {
            base_cost -= rd_sig_cost_0;
            rd_sig_cost -= rd_sig_cost_0;
          }
          double cost_zero_cg = base_cost;
          double rate1 = lam * bits_of(ctx, kSigCg + cg_ctx, 1);
          double rate0 = lam * bits_of(ctx, kSigCg + cg_ctx, 0);
          base_cost += rate1;
          cost_zero_cg += rate0;
          cost_cg_sig[cg_scan_pos] = rate1;
          cost_zero_cg += rd_uncoded_dist;
          cost_zero_cg -= rd_coded_dist;
          cost_zero_cg -= rd_sig_cost;
          if (cost_zero_cg < base_cost) {
            sig_cg_flags[cg_blk] = 0;
            base_cost = cost_zero_cg;
            cost_cg_sig[cg_scan_pos] = rate0;
            for (int pos_in_cg = cg_size - 1; pos_in_cg >= 0; pos_in_cg--) {
              int scan_pos = cg_scan_pos * cg_size + pos_in_cg;
              int blk = scan[scan_pos];
              if (dst[blk]) {
                dst[blk] = 0;
                cost_coeff[scan_pos] = cost_coeff0[scan_pos];
                cost_sig[scan_pos] = 0.0;
              }
            }
          }
        }
      } else {
        sig_cg_flags[cg_blk] = 1;
      }
    }
  }

  std::memset(out, 0, sizeof(int32_t) * total);
  if (last_scan_pos < 0) return 0;

  int cbf_idx = kCbfLuma + cbf_ctx_offset;
  double best_cost = block_uncoded_cost + lam * bits_of(ctx, cbf_idx, 0);
  base_cost += lam * bits_of(ctx, cbf_idx, 1);
  int best_last_idx_p1 = 0;

  int blk_offset = (log2n - 2) * 3 + ((log2n - 1) >> 2);
  int shift = (log2n + 1) >> 2;
  int max_group = kGroupIdxR[n - 1];

  auto rate_last = [&](int pos_x, int pos_y) -> double {
    int gx = kGroupIdxR[pos_x], gy = kGroupIdxR[pos_y];
    int64_t cost = 0;
    for (int c = 0; c < gx; c++)
      cost += bits_of(ctx, kLastX + blk_offset + (c >> shift), 1);
    if (gx < max_group)
      cost += bits_of(ctx, kLastX + blk_offset + (gx >> shift), 0);
    for (int c = 0; c < gy; c++)
      cost += bits_of(ctx, kLastY + blk_offset + (c >> shift), 1);
    if (gy < max_group)
      cost += bits_of(ctx, kLastY + blk_offset + (gy >> shift), 0);
    if (gx > 3) cost += static_cast<int64_t>((gx - 2) >> 1) << 15;
    if (gy > 3) cost += static_cast<int64_t>((gy - 2) >> 1) << 15;
    return lam * cost;
  };

  bool found_last = false;
  for (int cg_scan_pos = cg_last_scan_pos; cg_scan_pos >= 0; cg_scan_pos--) {
    int cg_blk = scan_cg[cg_scan_pos];
    base_cost -= cost_cg_sig[cg_scan_pos];
    if (sig_cg_flags[cg_blk]) {
      for (int pos_in_cg = cg_size - 1; pos_in_cg >= 0; pos_in_cg--) {
        int scan_pos = cg_scan_pos * cg_size + pos_in_cg;
        if (scan_pos > last_scan_pos) continue;
        int blk = scan[scan_pos];
        if (dst[blk]) {
          int py = blk / n, px = blk % n;
          double cost_last = scan_type == R_SCAN_VER ? rate_last(py, px)
                                                     : rate_last(px, py);
          double total_cost = base_cost + cost_last - cost_sig[scan_pos];
          if (total_cost < best_cost) {
            best_last_idx_p1 = scan_pos + 1;
            best_cost = total_cost;
          }
          if (dst[blk] > 1) {
            found_last = true;
            break;
          }
          base_cost -= cost_coeff[scan_pos];
          base_cost += cost_coeff0[scan_pos];
        } else {
          base_cost -= cost_sig[scan_pos];
        }
      }
      if (found_last) break;
    }
  }

  int64_t abs_sum = 0;
  for (int scan_pos = 0; scan_pos < best_last_idx_p1; scan_pos++) {
    int blk = scan[scan_pos];
    int64_t level = dst[blk];
    abs_sum += level;
    out[blk] = coeffs[blk] < 0 ? static_cast<int32_t>(-level)
                               : static_cast<int32_t>(level);
  }

  if (sign_hiding && abs_sum >= 2) {
    double inv_scale = static_cast<double>(kInvQuantScales[rem]);
    int64_t rd_factor = static_cast<int64_t>(
        inv_scale * inv_scale * (1 << (2 * per)) / lam / 16 + 0.5);
    int last_cg = -1;
    const int64_t I64MAX = std::numeric_limits<int64_t>::max();
    for (int subset = (total - 1) >> 4; subset >= 0; subset--) {
      int sub_pos = subset << 4;
      int first_nz = cg_size, last_nz = -1;
      for (int i = cg_size - 1; i >= 0; i--)
        if (out[scan[sub_pos + i]]) {
          last_nz = i;
          break;
        }
      for (int i = 0; i < cg_size; i++)
        if (out[scan[sub_pos + i]]) {
          first_nz = i;
          break;
        }
      int64_t cg_abs_sum = 0;
      for (int i = std::max(first_nz, 0); i <= last_nz; i++)
        cg_abs_sum += std::abs(out[scan[sub_pos + i]]);
      if (last_nz >= 0 && last_cg == -1) last_cg = 1;
      if (last_nz - first_nz >= 4) {
        int signbit = out[scan[sub_pos + first_nz]] > 0 ? 0 : 1;
        if (signbit != (cg_abs_sum & 1)) {
          int64_t min_cost = I64MAX;
          int min_pos = -1, final_change = 0;
          int start = last_cg == 1 ? last_nz : cg_size - 1;
          for (int i = start; i >= 0; i--) {
            int blk = scan[sub_pos + i];
            int64_t cur_cost;
            int cur_change;
            if (out[blk] != 0) {
              int64_t cost_up = rd_factor * (-delta_u[blk]) + rate_inc_up[blk];
              int64_t cost_down =
                  rd_factor * delta_u[blk] + rate_inc_down[blk] -
                  (std::abs(out[blk]) == 1 ? sig_rate_delta[blk] : 0);
              if (last_cg == 1 && last_nz == i && std::abs(out[blk]) == 1)
                cost_down -= static_cast<int64_t>(4) << 15;
              if (cost_up < cost_down) {
                cur_cost = cost_up;
                cur_change = 1;
              } else {
                cur_change = -1;
                if (i == first_nz && std::abs(out[blk]) == 1)
                  cur_cost = I64MAX;
                else
                  cur_cost = cost_down;
              }
            } else {
              cur_cost = rd_factor * (-std::llabs(delta_u[blk])) + (1 << 15) +
                         rate_inc_up[blk] + sig_rate_delta[blk];
              cur_change = 1;
              if (i < first_nz) {
                int this_sign = coeffs[blk] >= 0 ? 0 : 1;
                if (this_sign != signbit) cur_cost = I64MAX;
              }
            }
            if (cur_cost < min_cost) {
              min_cost = cur_cost;
              final_change = cur_change;
              min_pos = blk;
            }
          }
          if (out[min_pos] == 32767 || out[min_pos] == -32768)
            final_change = -1;
          if (coeffs[min_pos] >= 0)
            out[min_pos] += final_change;
          else
            out[min_pos] -= final_change;
        }
      }
      if (last_cg == 1) last_cg = 0;
    }
  }
  return 0;
}

}  // extern "C"
