// Native CABAC bitstream packer for the wavefront (uniform-grid) encoder.
//
// The TPU side produces (modes, quantized levels) for every block of a frame
// in one XLA program; this C++ stage packs them into the framework bitstream.
// It is a port of the Python serializer (codec/cabac.py + codec/syntax.py +
// codec/encoder.py:serialize_trees) specialised to the uniform grid, and must
// stay byte-identical with it - asserted by tests.
//
// Engine parity: HM-16.15 TEncBinCoderCABAC (9-bit M-coder, 0xFF carry
// buffering); tables are normative HEVC constants.
//
// Build: g++ -O3 -shared -fPIC -o libcabac_pack.so cabac_pack.cpp

#include <cstdint>
#include <cstring>
#include <functional>
#include <vector>
#include <algorithm>

namespace {

// ----------------------------------------------------------- spec tables ---

const uint8_t kLpsTable[64][4] = {
    {128, 176, 208, 240}, {128, 167, 197, 227}, {128, 158, 187, 216},
    {123, 150, 178, 205}, {116, 142, 169, 195}, {111, 135, 160, 185},
    {105, 128, 152, 175}, {100, 122, 144, 166}, {95, 116, 137, 158},
    {90, 110, 130, 150}, {85, 104, 123, 142}, {81, 99, 117, 135},
    {77, 94, 111, 128}, {73, 89, 105, 122}, {69, 85, 100, 116},
    {66, 80, 95, 110}, {62, 76, 90, 104}, {59, 72, 86, 99},
    {56, 69, 81, 94}, {53, 65, 77, 89}, {51, 62, 73, 85},
    {48, 59, 69, 80}, {46, 56, 66, 76}, {43, 53, 63, 72},
    {41, 50, 59, 69}, {39, 48, 56, 65}, {37, 45, 54, 62},
    {35, 43, 51, 59}, {33, 41, 48, 56}, {32, 39, 46, 53},
    {30, 37, 43, 50}, {29, 35, 41, 48}, {27, 33, 39, 45},
    {26, 31, 37, 43}, {24, 30, 35, 41}, {23, 28, 33, 39},
    {22, 27, 32, 37}, {21, 26, 30, 35}, {20, 24, 29, 33},
    {19, 23, 27, 31}, {18, 22, 26, 30}, {17, 21, 25, 28},
    {16, 20, 23, 27}, {15, 19, 22, 25}, {14, 18, 21, 24},
    {14, 17, 20, 23}, {13, 16, 19, 22}, {12, 15, 18, 21},
    {12, 14, 17, 20}, {11, 14, 16, 19}, {11, 13, 15, 18},
    {10, 12, 15, 17}, {10, 12, 14, 16}, {9, 11, 13, 15},
    {9, 11, 12, 14}, {8, 10, 12, 14}, {8, 9, 11, 13},
    {7, 9, 11, 12}, {7, 9, 10, 12}, {7, 8, 10, 11},
    {6, 8, 9, 11}, {6, 7, 9, 10}, {6, 7, 8, 9}, {2, 2, 2, 2}};

const uint8_t kRenormTable[32] = {6, 5, 4, 4, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 2,
                                  2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                                  1, 1};

const uint8_t kNextStateMps[128] = {
    2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39,
    40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57,
    58, 59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75,
    76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89, 90, 91, 92, 93,
    94, 95, 96, 97, 98, 99, 100, 101, 102, 103, 104, 105, 106, 107, 108, 109,
    110, 111, 112, 113, 114, 115, 116, 117, 118, 119, 120, 121, 122, 123, 124,
    125, 124, 125, 126, 127};

const uint8_t kNextStateLps[128] = {
    1, 0, 0, 1, 2, 3, 4, 5, 4, 5, 8, 9, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17,
    18, 19, 18, 19, 22, 23, 22, 23, 24, 25, 26, 27, 26, 27, 30, 31, 30, 31,
    32, 33, 32, 33, 36, 37, 36, 37, 38, 39, 38, 39, 42, 43, 42, 43, 44, 45,
    44, 45, 46, 47, 48, 49, 48, 49, 50, 51, 52, 53, 52, 53, 54, 55, 54, 55,
    56, 57, 58, 59, 58, 59, 60, 61, 60, 61, 60, 61, 62, 63, 64, 65, 64, 65,
    66, 67, 66, 67, 66, 67, 68, 69, 68, 69, 70, 71, 70, 71, 70, 71, 72, 73,
    72, 73, 72, 73, 74, 75, 74, 75, 74, 75, 76, 77, 76, 77, 126, 127};

const int32_t kGroupIdx[32] = {0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7,
                               8, 8, 8, 8, 8, 8, 8, 8, 9, 9, 9, 9, 9, 9, 9, 9};
const int32_t kMinInGroup[10] = {0, 1, 2, 3, 4, 6, 8, 12, 16, 24};
const int32_t kCtxIndMap4x4[16] = {0, 1, 4, 5, 2, 3, 4, 5,
                                   6, 6, 8, 8, 7, 7, 8, 8};

// Context layout: must match codec/contexts.py exactly.
const int kInitValues[] = {
    /* split_cu   */ 139, 141, 157,
    /* part_size  */ 184,
    /* prev_intra */ 184,
    /* cbf_luma   */ 111, 141,
    /* tskip      */ 139,
    /* sig_cg     */ 91, 171,
    /* sig (28)   */ 111, 111, 125, 110, 110, 94, 124, 108, 124,
                     107, 125, 141, 179, 153, 125,
                     107, 125, 141, 179, 153, 125,
                     107, 125, 141, 179, 153, 125, 141,
    /* last_x     */ 110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111,
                     143, 127, 111, 79,
    /* last_y     */ 110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111,
                     143, 127, 111, 79,
    /* greater1   */ 140, 92, 137, 138, 140, 152, 138, 139, 153, 74, 149, 92,
                     139, 107, 122, 152,
    /* greater2   */ 138, 153, 136, 167,
    /* pnns_flag  */ 154};

enum Offsets {
  kSplitCu = 0,
  kPartSize = 3,
  kPrevIntra = 4,
  kCbfLuma = 5,
  kTSkip = 7,
  kSigCg = 8,
  kSig = 10,
  kLastX = 38,
  kLastY = 53,
  kGreater1 = 68,
  kGreater2 = 84,
  kPnnsFlag = 88,
  kNumContexts = 89
};

// --------------------------------------------------------------- encoder ---

struct Encoder {
  std::vector<uint8_t> bytes;
  uint32_t low = 0;
  uint32_t range = 510;
  int bits_left = 23;
  int num_buffered = 0;
  uint32_t buffered_byte = 0xFF;
  uint32_t partial_bits = 0;
  int partial_count = 0;
  uint8_t ctx[kNumContexts];

  void init_contexts(int qp) {
    qp = std::min(std::max(qp, 0), 51);
    for (int i = 0; i < kNumContexts; i++) {
      int iv = kInitValues[i];
      int slope = (iv >> 4) * 5 - 45;
      int offset = ((iv & 15) << 3) - 16;
      int st = std::min(std::max(1, ((slope * qp) >> 4) + offset), 126);
      int mps = st >= 64 ? 1 : 0;
      ctx[i] = static_cast<uint8_t>(((mps ? st - 64 : 63 - st) << 1) + mps);
    }
  }

  void write_out() {
    uint32_t lead = low >> (24 - bits_left);
    bits_left += 8;
    low &= 0xFFFFFFFFu >> bits_left;
    if (lead == 0xFF) {
      num_buffered++;
    } else if (num_buffered > 0) {
      uint32_t carry = lead >> 8;
      bytes.push_back(static_cast<uint8_t>(buffered_byte + carry));
      uint8_t fill = static_cast<uint8_t>(0xFF + carry);
      while (num_buffered > 1) {
        bytes.push_back(fill);
        num_buffered--;
      }
      buffered_byte = lead & 0xFF;
    } else {
      num_buffered = 1;
      buffered_byte = lead & 0xFF;
    }
  }

  inline void test_write() {
    if (bits_left < 12) write_out();
  }

  void encode_bin(int bin, int idx) {
    uint8_t state = ctx[idx];
    uint32_t lps = kLpsTable[state >> 1][(range >> 6) & 3];
    range -= lps;
    if (bin != (state & 1)) {
      int nb = kRenormTable[lps >> 3];
      low = (low + range) << nb;
      range = lps << nb;
      ctx[idx] = kNextStateLps[state];
      bits_left -= nb;
      test_write();
    } else {
      ctx[idx] = kNextStateMps[state];
      if (range < 256) {
        low <<= 1;
        range <<= 1;
        bits_left--;
        test_write();
      }
    }
  }

  void encode_bin_ep(int bin) {
    low <<= 1;
    if (bin) low += range;
    bits_left--;
    test_write();
  }

  void encode_bins_ep(uint32_t bins, int num) {
    while (num > 8) {
      num -= 8;
      uint32_t pattern = bins >> num;
      low = (low << 8) + range * pattern;
      bins -= pattern << num;
      bits_left -= 8;
      test_write();
    }
    low = (low << num) + range * bins;
    bits_left -= num;
    test_write();
  }

  void encode_bin_trm(int bin) {
    range -= 2;
    if (bin) {
      low += range;
      low <<= 7;
      range = 2 << 7;
      bits_left -= 7;
    } else if (range >= 256) {
      return;
    } else {
      low <<= 1;
      range <<= 1;
      bits_left--;
    }
    test_write();
  }

  void write_raw_bits(uint32_t value, int n) {
    for (int i = n - 1; i >= 0; i--) {
      partial_bits = (partial_bits << 1) | ((value >> i) & 1);
      if (++partial_count == 8) {
        bytes.push_back(static_cast<uint8_t>(partial_bits));
        partial_bits = 0;
        partial_count = 0;
      }
    }
  }

  void terminate_and_finish() {
    encode_bin_trm(1);
    if (low >> (32 - bits_left)) {
      bytes.push_back(static_cast<uint8_t>(buffered_byte + 1));
      while (num_buffered > 1) {
        bytes.push_back(0x00);
        num_buffered--;
      }
      low -= 1u << (32 - bits_left);
    } else {
      if (num_buffered > 0)
        bytes.push_back(static_cast<uint8_t>(buffered_byte));
      while (num_buffered > 1) {
        bytes.push_back(0xFF);
        num_buffered--;
      }
    }
    write_raw_bits(low >> 8, 24 - bits_left);
    write_raw_bits(1, 1);
    while (partial_count) write_raw_bits(0, 1);
  }
};

// -------------------------------------------------------------- scans ------

enum { SCAN_DIAG = 0, SCAN_HOR = 1, SCAN_VER = 2 };

void pattern(int ncols, int nrows, int type, std::vector<int>& xs,
             std::vector<int>& ys) {
  if (type == SCAN_DIAG) {
    for (int d = 0; d < ncols + nrows - 1; d++)
      for (int x = 0; x <= d; x++) {
        int y = d - x;
        if (x < ncols && y < nrows) {
          xs.push_back(x);
          ys.push_back(y);
        }
      }
  } else if (type == SCAN_HOR) {
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

void build_scan(int n, int type, std::vector<int>& scan,
                std::vector<int>& scan_cg) {
  std::vector<int> xs, ys;
  if (n <= 4) {
    pattern(n, n, type, xs, ys);
    for (size_t i = 0; i < xs.size(); i++) scan.push_back(xs[i] + ys[i] * n);
    scan_cg.push_back(0);
    return;
  }
  int cg = n / 4;
  std::vector<int> cx, cy, ix, iy;
  pattern(cg, cg, type, cx, cy);
  pattern(4, 4, type, ix, iy);
  for (size_t g = 0; g < cx.size(); g++) {
    scan_cg.push_back(cx[g] + cy[g] * cg);
    for (size_t i = 0; i < ix.size(); i++)
      scan.push_back((cx[g] * 4 + ix[i]) + (cy[g] * 4 + iy[i]) * n);
  }
}

int select_scan(int mode, int n) {
  if (n > 8) return SCAN_DIAG;
  if (std::abs(mode - 26) <= 4) return SCAN_HOR;
  if (std::abs(mode - 10) <= 4) return SCAN_VER;
  return SCAN_DIAG;
}

// ----------------------------------------------------- residual coding -----

int sig_ctx(int pat, int px, int py, int log2n, int first_ctx) {
  if (px + py == 0) return kSig + 0;
  if (log2n == 2) return kSig + kCtxIndMap4x4[4 * py + px];
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
  bool not_first = ((px >> 2) + (py >> 2)) > 0;
  return kSig + first_ctx + (not_first ? 3 : 0) + cnt;
}

void write_coef_remain(Encoder& e, int symbol, int r) {
  if (symbol < (3 << r)) {
    int length = symbol >> r;
    e.encode_bins_ep((1u << (length + 1)) - 2, length + 1);
    e.encode_bins_ep(symbol % (1 << r), r);
  } else {
    int length = r;
    int code = symbol - (3 << r);
    while (code >= (1 << length)) {
      code -= 1 << length;
      length++;
    }
    e.encode_bins_ep((1u << (3 + length + 1 - r)) - 2, 3 + length + 1 - r);
    e.encode_bins_ep(code, length);
  }
}

void encode_coefficients(Encoder& e, const int32_t* coeffs, int n, int mode,
                         int sign_hiding = 0) {
  int log2n = 0;
  while ((1 << log2n) < n) log2n++;
  int scan_type = select_scan(mode, n);
  std::vector<int> scan, scan_cg;
  build_scan(n, scan_type, scan, scan_cg);
  int wig = std::max(n / 4, 1);
  int first_ctx = n == 4 ? 0 : (n == 8 ? (scan_type != SCAN_DIAG ? 15 : 9) : 21);

  int scan_pos_last = -1;
  std::vector<uint8_t> sig_cg_flags(wig * wig, 0);
  for (int sp = 0; sp < n * n; sp++) {
    int rp = scan[sp];
    if (coeffs[rp] != 0) {
      scan_pos_last = sp;
      int py = rp / n, px = rp % n;
      sig_cg_flags[(py >> 2) * wig + (px >> 2)] = 1;
    }
  }
  int pos_last = scan[scan_pos_last];
  int ly = pos_last / n, lx = pos_last % n;
  if (scan_type == SCAN_VER) std::swap(lx, ly);
  int gx = kGroupIdx[lx], gy = kGroupIdx[ly];
  int blk_offset = (log2n - 2) * 3 + ((log2n - 1) >> 2);
  int shift = (log2n + 1) >> 2;
  int max_group = kGroupIdx[n - 1];
  for (int c = 0; c < gx; c++)
    e.encode_bin(1, kLastX + blk_offset + (c >> shift));
  if (gx < max_group) e.encode_bin(0, kLastX + blk_offset + (gx >> shift));
  for (int c = 0; c < gy; c++)
    e.encode_bin(1, kLastY + blk_offset + (c >> shift));
  if (gy < max_group) e.encode_bin(0, kLastY + blk_offset + (gy >> shift));
  if (gx > 3) {
    int count = (gx - 2) >> 1;
    int rem = lx - kMinInGroup[gx];
    for (int i = count - 1; i >= 0; i--) e.encode_bin_ep((rem >> i) & 1);
  }
  if (gy > 3) {
    int count = (gy - 2) >> 1;
    int rem = ly - kMinInGroup[gy];
    for (int i = count - 1; i >= 0; i--) e.encode_bin_ep((rem >> i) & 1);
  }

  int last_scan_set = scan_pos_last >> 4;
  int c1 = 1;
  int scan_pos_sig = scan_pos_last;
  for (int subset = last_scan_set; subset >= 0; subset--) {
    int sub_pos = subset << 4;
    int go_rice = 0;
    int abs_coeffs[16];
    uint32_t coeff_signs = 0;
    int num_nonzero = 0;
    int last_nz_in_cg = -1, first_nz_in_cg = 16;

    if (scan_pos_sig == scan_pos_last) {
      int v = coeffs[pos_last];
      abs_coeffs[0] = std::abs(v);
      coeff_signs = v < 0 ? 1 : 0;
      num_nonzero = 1;
      last_nz_in_cg = first_nz_in_cg = scan_pos_sig;
      scan_pos_sig--;
    }

    int cg_blk = scan_cg[subset];
    int cg_y = cg_blk / wig, cg_x = cg_blk % wig;
    bool right = cg_x < wig - 1 && sig_cg_flags[cg_blk + 1];
    bool below = cg_y < wig - 1 && sig_cg_flags[cg_blk + wig];
    if (subset == last_scan_set || subset == 0) {
      sig_cg_flags[cg_blk] = 1;
    } else {
      e.encode_bin(sig_cg_flags[cg_blk] ? 1 : 0,
                   kSigCg + ((right || below) ? 1 : 0));
    }

    if (sig_cg_flags[cg_blk]) {
      int pat = (right ? 1 : 0) + (below ? 2 : 0);
      for (; scan_pos_sig >= sub_pos; scan_pos_sig--) {
        int rp = scan[scan_pos_sig];
        int py = rp / n, px = rp % n;
        int sig = coeffs[rp] != 0 ? 1 : 0;
        if (scan_pos_sig > sub_pos || subset == 0 || num_nonzero) {
          e.encode_bin(sig, sig_ctx(pat, px, py, log2n, first_ctx));
        }
        if (sig) {
          abs_coeffs[num_nonzero] = std::abs(coeffs[rp]);
          coeff_signs = 2 * coeff_signs + (coeffs[rp] < 0 ? 1 : 0);
          num_nonzero++;
          if (last_nz_in_cg == -1) last_nz_in_cg = scan_pos_sig;
          first_nz_in_cg = scan_pos_sig;
        }
      }
    } else {
      scan_pos_sig = sub_pos - 1;
    }

    if (num_nonzero > 0) {
      int ctx_set = (subset > 0 ? 2 : 0) + (c1 == 0 ? 1 : 0);
      c1 = 1;
      int base_g1 = kGreater1 + 4 * ctx_set;
      bool escape = false;
      int num_c1 = std::min(num_nonzero, 8);
      int first_c2 = -1;
      for (int idx = 0; idx < num_c1; idx++) {
        int symbol = abs_coeffs[idx] > 1 ? 1 : 0;
        e.encode_bin(symbol, base_g1 + c1);
        if (symbol) {
          c1 = 0;
          if (first_c2 == -1)
            first_c2 = idx;
          else
            escape = true;
        } else if (c1 < 3 && c1 > 0) {
          c1++;
        }
      }
      if (c1 == 0 && first_c2 != -1) {
        int symbol = abs_coeffs[first_c2] > 2 ? 1 : 0;
        e.encode_bin(symbol, kGreater2 + ctx_set);
        if (symbol) escape = true;
      }
      escape = escape || (num_nonzero > 8);
      // Sign-data hiding: CGs whose first..last nonzero span >= 4 omit the
      // first (forward-scan) sign; the decoder infers it from the level-sum
      // parity (syntax.py:306-311 semantics).
      if (sign_hiding && last_nz_in_cg - first_nz_in_cg >= 4)
        e.encode_bins_ep(coeff_signs >> 1, num_nonzero - 1);
      else
        e.encode_bins_ep(coeff_signs, num_nonzero);
      if (escape) {
        int first2 = 1;
        for (int idx = 0; idx < num_nonzero; idx++) {
          int base_level = idx < 8 ? (2 + first2) : 1;
          if (abs_coeffs[idx] >= base_level) {
            write_coef_remain(e, abs_coeffs[idx] - base_level, go_rice);
            if (abs_coeffs[idx] > (3 << go_rice))
              go_rice = std::min(go_rice + 1, 4);
          }
          if (abs_coeffs[idx] >= 2) first2 = 0;
        }
      }
    }
  }
}

// ------------------------------------------------------------- modes -------

void mpm_candidates(int left, int above, int mpm[3]) {
  if (left == above) {
    if (left > 1) {
      mpm[0] = left;
      mpm[1] = ((left + 29) % 32) + 2;
      mpm[2] = ((left - 1) % 32) + 2;
    } else {
      mpm[0] = 0;
      mpm[1] = 1;
      mpm[2] = 26;
    }
  } else {
    mpm[0] = left;
    mpm[1] = above;
    if (left && above)
      mpm[2] = 0;
    else
      mpm[2] = (left + above) < 2 ? 26 : 1;
  }
}

void encode_intra_mode(Encoder& e, int mode, const int mpm[3]) {
  int idx = -1;
  for (int i = 0; i < 3; i++)
    if (mpm[i] == mode) {
      idx = i;
      break;
    }
  if (idx >= 0) {
    e.encode_bin(1, kPrevIntra);
    if (idx == 0) {
      e.encode_bin_ep(0);
    } else {
      e.encode_bin_ep(1);
      e.encode_bin_ep(idx - 1);
    }
  } else {
    e.encode_bin(0, kPrevIntra);
    int s[3] = {mpm[0], mpm[1], mpm[2]};
    std::sort(s, s + 3);
    int rem = mode;
    for (int i = 2; i >= 0; i--)
      if (rem > s[i]) rem--;
    e.encode_bins_ep(rem, 5);
  }
}

}  // namespace

extern "C" {

// Packs a uniform-grid frame: modes (nby*nbx), qcoeffs (nby*nbx*n*n).
// Writes CABAC payload into `out` (capacity `cap`); returns byte count, or
// -1 on overflow/-2 on bad args.
int64_t pack_grid(const int32_t* modes, const int32_t* qcoeffs, int32_t nby,
                  int32_t nbx, int32_t n, int32_t qp, uint8_t* out,
                  int64_t cap) {
  if (n < 4 || n > 32 || nby <= 0 || nbx <= 0) return -2;
  Encoder e;
  e.init_contexts(qp);
  for (int by = 0; by < nby; by++) {
    for (int bx = 0; bx < nbx; bx++) {
      int mode = modes[by * nbx + bx];
      const int32_t* q = qcoeffs + (static_cast<int64_t>(by) * nbx + bx) * n * n;
      if (n > 8) e.encode_bin(0, kSplitCu + 0);  // leaf CTU, split ctx 0
      if (n == 8) e.encode_bin(1, kPartSize);    // 2Nx2N
      // MPM: above neighbour is in another CTU row (ctu == n) -> DC.
      int left = bx > 0 ? modes[by * nbx + bx - 1] : 1;
      int mpm[3];
      mpm_candidates(left, 1, mpm);
      encode_intra_mode(e, mode, mpm);
      bool cbf = false;
      for (int i = 0; i < n * n; i++)
        if (q[i]) {
          cbf = true;
          break;
        }
      e.encode_bin(cbf ? 1 : 0, kCbfLuma + 1);
      if (cbf) encode_coefficients(e, q, n, mode);
    }
  }
  e.terminate_and_finish();
  if (static_cast<int64_t>(e.bytes.size()) > cap) return -1;
  std::memcpy(out, e.bytes.data(), e.bytes.size());
  return static_cast<int64_t>(e.bytes.size());
}


// Packs the wavefront2 decided-grid frame: the quadtree serializer of
// `codec/encoder.py:serialize_trees` walking the assembled grids directly
// (split flags with the left/above-depth context, 8x8 NxN partitions,
// MPM-coded intra modes incl. the switch policy's PNNS flag and MPM
// special cases, forced TU32 splits under 64x64 CUs, CBF + coefficients
// with sign-data hiding).  Byte-identical to the Python serializer; this
// is the host half of the encode pipeline, off the per-frame Python path.
// policy: 0 regular / 1 substitution / 2 switch.  m64/q64/s64 may be null
// when ctu_size == 32.  Returns payload bytes, -1 on overflow, -2 on args.
int64_t pack_tree_grids(const int32_t* m4, const int32_t* q4,
                        const int32_t* m8, const int32_t* q8,
                        const int32_t* s8, const int32_t* m16,
                        const int32_t* q16, const int32_t* s16,
                        const int32_t* m32, const int32_t* q32,
                        const int32_t* s32, const int32_t* m64,
                        const int32_t* q64, const int32_t* s64,
                        int32_t width, int32_t height, int32_t qp,
                        int32_t ctu_size, int32_t policy,
                        int32_t sign_hiding, uint8_t* out, int64_t cap) {
  if (width % ctu_size || height % ctu_size) return -2;
  if (ctu_size != 32 && ctu_size != 64) return -2;
  if (ctu_size == 64 && (!m64 || !q64 || !s64)) return -2;
  const int kPnnsMode = 35;
  const int uh = height / 4, uw = width / 4;
  std::vector<int32_t> mode_map(uh * uw, -1);
  std::vector<int8_t> depth_map(uh * uw, 0);
  std::vector<int8_t> coded(uh * uw, 0);
  Encoder e;
  e.init_contexts(qp);

  auto split_ctx = [&](int x, int y, int depth) {
    int c = 0;
    int ux = x / 4, uy = y / 4;
    if (x > 0 && coded[uy * uw + ux - 1])
      c += depth_map[uy * uw + ux - 1] > depth ? 1 : 0;
    if (y > 0 && coded[(uy - 1) * uw + ux])
      c += depth_map[(uy - 1) * uw + ux] > depth ? 1 : 0;
    return c;
  };

  auto neighbor_mode = [&](int x, int y, bool left) {
    int nx = left ? x - 1 : x;
    int ny = left ? y : y - 1;
    if (!left && y % ctu_size == 0) return 1;  // DC across the CTU row
    if (nx < 0 || ny < 0) return 1;
    int m = mode_map[(ny / 4) * uw + nx / 4];
    return m >= 0 ? m : 1;
  };

  auto mpms_at = [&](int x, int y, int mpm[3]) {
    int left = neighbor_mode(x, y, true);
    int above = neighbor_mode(x, y, false);
    if (policy == 2) {
      // hm_16_15_switch MPM rules (TComDataCU.cpp:1475-1596).
      if (left == above) {
        if (1 < left && left < kPnnsMode) {
          mpm[0] = left;
          mpm[1] = ((left + 29) % 32) + 2;
          mpm[2] = ((left - 1) % 32) + 2;
        } else {
          mpm[0] = 0; mpm[1] = 1; mpm[2] = 26;
        }
        return;
      }
      if (left == kPnnsMode || above == kPnnsMode) {
        int m0 = left == kPnnsMode ? above : left;
        if (m0 > 1) { mpm[0] = m0; mpm[1] = 0; mpm[2] = 1; }
        else if (m0 == 1) { mpm[0] = 1; mpm[1] = 0; mpm[2] = 26; }
        else { mpm[0] = 0; mpm[1] = 1; mpm[2] = 26; }
        return;
      }
    }
    mpm_candidates(left, above, mpm);
  };

  auto coeffs_for = [&](int x, int y, int n) -> const int32_t* {
    switch (n) {
      case 4: return q4 + (static_cast<int64_t>(y / 4) * uw + x / 4) * 16;
      case 8: return q8 + (static_cast<int64_t>(y / 8) * (width / 8)
                           + x / 8) * 64;
      case 16: return q16 + (static_cast<int64_t>(y / 16) * (width / 16)
                             + x / 16) * 256;
      default: return q32 + (static_cast<int64_t>(y / 32) * (width / 32)
                             + x / 32) * 1024;
    }
  };

  // One TU of size tn at (tx, ty); coefficients live in the size-tn grid
  // except under a 64-CU, where the four forced TU32s slice q64.
  auto code_tu = [&](const int32_t* q, int tn, int stride, int tdepth,
                     int pu_mode) {
    bool cbf = false;
    for (int r = 0; r < tn && !cbf; r++)
      for (int c = 0; c < tn; c++)
        if (q[r * stride + c]) { cbf = true; break; }
    e.encode_bin(cbf ? 1 : 0, kCbfLuma + (tdepth == 0 ? 1 : 0));
    if (!cbf) return;
    int32_t tmp[32 * 32];
    if (stride != tn) {
      for (int r = 0; r < tn; r++)
        for (int c = 0; c < tn; c++) tmp[r * tn + c] = q[r * stride + c];
      q = tmp;
    }
    encode_coefficients(e, q, tn, pu_mode == kPnnsMode ? 0 : pu_mode,
                        sign_hiding);
  };

  auto code_pu_mode = [&](int x, int y, int n, int mode) {
    int mpm[3];
    mpms_at(x, y, mpm);
    if (policy == 2) {
      e.encode_bin(mode == kPnnsMode ? 1 : 0, kPnnsFlag);
      if (mode != kPnnsMode) encode_intra_mode(e, mode, mpm);
    } else {
      encode_intra_mode(e, mode, mpm);
    }
    for (int r = y / 4; r < (y + n) / 4; r++)
      for (int c = x / 4; c < (x + n) / 4; c++) mode_map[r * uw + c] = mode;
  };

  auto finish_cu = [&](int x, int y, int size, int depth) {
    for (int r = y / 4; r < (y + size) / 4; r++)
      for (int c = x / 4; c < (x + size) / 4; c++) {
        depth_map[r * uw + c] = static_cast<int8_t>(depth);
        coded[r * uw + c] = 1;
      }
  };

  // Recursive CU walk over the decided structure grids.
  std::function<void(int, int, int, int)> ser_cu =
      [&](int x, int y, int size, int depth) {
        int split = 0;
        if (size == 64) split = s64[(y / 64) * (width / 64) + x / 64];
        else if (size == 32) split = s32[(y / 32) * (width / 32) + x / 32];
        else if (size == 16) split = s16[(y / 16) * (width / 16) + x / 16];
        if (size > 8)
          e.encode_bin(split, kSplitCu + split_ctx(x, y, depth));
        if (split) {
          int half = size / 2;
          ser_cu(x, y, half, depth + 1);
          ser_cu(x + half, y, half, depth + 1);
          ser_cu(x, y + half, half, depth + 1);
          ser_cu(x + half, y + half, half, depth + 1);
          return;
        }
        if (size == 8) {
          int nxn = s8[(y / 8) * (width / 8) + x / 8];
          e.encode_bin(nxn ? 0 : 1, kPartSize);
          if (nxn) {
            for (int sq = 0; sq < 4; sq++) {
              int sx = x + (sq & 1) * 4, sy = y + (sq >> 1) * 4;
              int mode = m4[(sy / 4) * uw + sx / 4];
              code_pu_mode(sx, sy, 4, mode);
              code_tu(coeffs_for(sx, sy, 4), 4, 4, 1, mode);
            }
            finish_cu(x, y, size, depth);
            return;
          }
        }
        int mode;
        switch (size) {
          case 8: mode = m8[(y / 8) * (width / 8) + x / 8]; break;
          case 16: mode = m16[(y / 16) * (width / 16) + x / 16]; break;
          case 32: mode = m32[(y / 32) * (width / 32) + x / 32]; break;
          default: mode = m64[(y / 64) * (width / 64) + x / 64]; break;
        }
        code_pu_mode(x, y, size, mode);
        if (size == 64) {
          // Forced TU32 quadtree under MAX_TU: z-order, trafo depth 1.
          const int32_t* q = q64
              + (static_cast<int64_t>(y / 64) * (width / 64) + x / 64) * 4096;
          for (int tz = 0; tz < 4; tz++) {
            int tdy = (tz >> 1) * 32, tdx = (tz & 1) * 32;
            code_tu(q + tdy * 64 + tdx, 32, 64, 1, mode);
          }
        } else {
          code_tu(coeffs_for(x, y, size), size, size, 0, mode);
        }
        finish_cu(x, y, size, depth);
      };

  for (int cy = 0; cy < height; cy += ctu_size)
    for (int cx = 0; cx < width; cx += ctu_size)
      ser_cu(cx, cy, ctu_size, 0);

  e.terminate_and_finish();
  if (static_cast<int64_t>(e.bytes.size()) > cap) return -1;
  std::memcpy(out, e.bytes.data(), e.bytes.size());
  return static_cast<int64_t>(e.bytes.size());
}

}  // extern "C"
