// Native HEVC All-Intra slice parser + reconstructor (the decode hot path).
//
// C++ twin of the framework's Python decoder stack:
//   codec/cabac.py      -> CABAC M-coder decode engine
//   codec/contexts.py   -> context layout + HEVC init formula
//   codec/scans.py      -> grouped diagonal/horizontal/vertical scans
//   codec/syntax.py     -> MPM + residual-coefficient decoding
//   codec/hm_decoder.py -> CU/TU trees, SAO parsing, reconstruction order
//   ops/reference_samples.py / ops/intra.py / ops/transform.py -> normative
//       reference-sample fill + filtering, 35-mode intra prediction,
//       dequantization and inverse DCT/DST
//
// (Semantics follow HM-16.15's TDecSbac/TDecCu/TComPattern/TComPrediction/
// TComTrQuant, reimplemented from the Rec. H.265 spec; see the Python files
// for the per-function HM anchors.)
//
// The entry point hm_decode_slice() decodes one I-slice's CABAC payload into
//   * flat TU records + coefficient blocks (always) so Python can replay
//     reconstruction when a neural predictor is in the loop, and
//   * fully reconstructed Y/Cb/Cr planes (policy "regular") so the common
//     case never re-enters Python until the loop filters.
//
// Bit-exactness vs the Python decoder is asserted by tests/test_native_decode.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

// ------------------------------------------------------------- CABAC tables

static const uint8_t kLps[64][4] = {
    {128, 176, 208, 240}, {128, 167, 197, 227}, {128, 158, 187, 216},
    {123, 150, 178, 205}, {116, 142, 169, 195}, {111, 135, 160, 185},
    {105, 128, 152, 175}, {100, 122, 144, 166}, {95, 116, 137, 158},
    {90, 110, 130, 150},  {85, 104, 123, 142},  {81, 99, 117, 135},
    {77, 94, 111, 128},   {73, 89, 105, 122},   {69, 85, 100, 116},
    {66, 80, 95, 110},    {62, 76, 90, 104},    {59, 72, 86, 99},
    {56, 69, 81, 94},     {53, 65, 77, 89},     {51, 62, 73, 85},
    {48, 59, 69, 80},     {46, 56, 66, 76},     {43, 53, 63, 72},
    {41, 50, 59, 69},     {39, 48, 56, 65},     {37, 45, 54, 62},
    {35, 43, 51, 59},     {33, 41, 48, 56},     {32, 39, 46, 53},
    {30, 37, 43, 50},     {29, 35, 41, 48},     {27, 33, 39, 45},
    {26, 31, 37, 43},     {24, 30, 35, 41},     {23, 28, 33, 39},
    {22, 27, 32, 37},     {21, 26, 30, 35},     {20, 24, 29, 33},
    {19, 23, 27, 31},     {18, 22, 26, 30},     {17, 21, 25, 28},
    {16, 20, 23, 27},     {15, 19, 22, 25},     {14, 18, 21, 24},
    {14, 17, 20, 23},     {13, 16, 19, 22},     {12, 15, 18, 21},
    {12, 14, 17, 20},     {11, 14, 16, 19},     {11, 13, 15, 18},
    {10, 12, 15, 17},     {10, 12, 14, 16},     {9, 11, 13, 15},
    {9, 11, 12, 14},      {8, 10, 12, 14},      {8, 9, 11, 13},
    {7, 9, 11, 12},       {7, 9, 10, 12},       {7, 8, 10, 11},
    {6, 8, 9, 11},        {6, 7, 9, 10},        {6, 7, 8, 9},
    {2, 2, 2, 2}};

static const uint8_t kRenorm[32] = {6, 5, 4, 4, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2,
                                    2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                                    1, 1, 1, 1};

// HM 7-bit state transitions (state = (pStateIdx << 1) | valMPS), identical
// to codec/cabac.py NEXT_STATE_MPS / NEXT_STATE_LPS.
static const uint8_t kNextMps[128] = {
    2,   3,   4,   5,   6,   7,   8,   9,   10,  11,  12,  13,  14,  15,
    16,  17,  18,  19,  20,  21,  22,  23,  24,  25,  26,  27,  28,  29,
    30,  31,  32,  33,  34,  35,  36,  37,  38,  39,  40,  41,  42,  43,
    44,  45,  46,  47,  48,  49,  50,  51,  52,  53,  54,  55,  56,  57,
    58,  59,  60,  61,  62,  63,  64,  65,  66,  67,  68,  69,  70,  71,
    72,  73,  74,  75,  76,  77,  78,  79,  80,  81,  82,  83,  84,  85,
    86,  87,  88,  89,  90,  91,  92,  93,  94,  95,  96,  97,  98,  99,
    100, 101, 102, 103, 104, 105, 106, 107, 108, 109, 110, 111, 112, 113,
    114, 115, 116, 117, 118, 119, 120, 121, 122, 123, 124, 125, 124, 125,
    126, 127};

static const uint8_t kNextLps[128] = {
    1,  0,  0,  1,  2,  3,  4,  5,  4,  5,  8,  9,  8,  9,  10, 11,
    12, 13, 14, 15, 16, 17, 18, 19, 18, 19, 22, 23, 22, 23, 24, 25,
    26, 27, 26, 27, 30, 31, 30, 31, 32, 33, 32, 33, 36, 37, 36, 37,
    38, 39, 38, 39, 42, 43, 42, 43, 44, 45, 44, 45, 46, 47, 48, 49,
    48, 49, 50, 51, 52, 53, 52, 53, 54, 55, 54, 55, 56, 57, 58, 59,
    58, 59, 60, 61, 60, 61, 60, 61, 62, 63, 64, 65, 64, 65, 66, 67,
    66, 67, 66, 67, 68, 69, 68, 69, 70, 71, 70, 71, 70, 71, 72, 73,
    72, 73, 72, 73, 74, 75, 74, 75, 74, 75, 76, 77, 76, 77, 126, 127};

// ------------------------------------------------------------ context init

static int init_context_state(int qp, int init_value) {
  qp = qp < 0 ? 0 : (qp > 51 ? 51 : qp);
  int slope = (init_value >> 4) * 5 - 45;
  int offset = ((init_value & 15) << 3) - 16;
  int st = ((slope * qp) >> 4) + offset;
  st = st < 1 ? 1 : (st > 126 ? 126 : st);
  int mps = st >= 64 ? 1 : 0;
  return ((mps ? (st - 64) : (63 - st)) << 1) + mps;
}

// Context layout — must mirror codec/contexts.py _build_layout() ordering.
struct CtxLayout {
  int split_cu, part_size, prev_intra, cbf_luma, transform_skip, sig_cg, sig;
  int last_x, last_y, greater1, greater2, pnns_flag, trans_subdiv;
  int sao_merge, sao_type, chroma_pred, cbf_chroma, sig_chroma;
  int last_x_chroma, last_y_chroma, greater1_chroma, greater2_chroma;
  int transform_skip_chroma, sig_cg_chroma;
  int total;
};

static CtxLayout make_layout(std::vector<int>* init_values) {
  static const int SPLIT_CU[] = {139, 141, 157};
  static const int PART_SIZE[] = {184};
  static const int PREV_INTRA[] = {184};
  static const int CBF_LUMA[] = {111, 141};
  static const int TSKIP[] = {139};
  static const int SIG_CG[] = {91, 171};
  static const int SIG[] = {111, 111, 125, 110, 110, 94,  124, 108, 124,
                            107, 125, 141, 179, 153, 125, 107, 125, 141,
                            179, 153, 125, 107, 125, 141, 179, 153, 125,
                            141};
  static const int LAST_X[] = {110, 110, 124, 125, 140, 153, 125, 127,
                               140, 109, 111, 143, 127, 111, 79};
  static const int GREATER1[] = {140, 92,  137, 138, 140, 152, 138, 139,
                                 153, 74,  149, 92,  139, 107, 122, 152};
  static const int GREATER2[] = {138, 153, 136, 167};
  static const int PNNS[] = {154};
  static const int TRANS_SUBDIV[] = {153, 138, 138};
  static const int SAO_MERGE[] = {153};
  static const int SAO_TYPE[] = {200};
  static const int CHROMA_PRED[] = {63};
  static const int CBF_CHROMA[] = {94, 138, 182, 154, 154};
  static const int SIG_CHROMA[] = {140, 139, 182, 182, 152, 136, 152, 136,
                                   153, 136, 139, 111, 136, 139, 111, 111};
  static const int LAST_X_CHROMA[] = {108, 123, 63, 154, 154, 154, 154, 154,
                                      154, 154, 154, 154, 154, 154, 154};
  static const int GREATER1_CHROMA[] = {140, 179, 166, 182, 140, 227, 122, 197};
  static const int GREATER2_CHROMA[] = {152, 152};
  static const int TSKIP_CHROMA[] = {139};
  static const int SIG_CG_CHROMA[] = {134, 141};

  CtxLayout L;
  int pos = 0;
  auto add = [&](const int* vals, int n) {
    int at = pos;
    for (int i = 0; i < n; ++i) init_values->push_back(vals[i]);
    pos += n;
    return at;
  };
#define ADD(field, arr) L.field = add(arr, (int)(sizeof(arr) / sizeof(int)))
  ADD(split_cu, SPLIT_CU);
  ADD(part_size, PART_SIZE);
  ADD(prev_intra, PREV_INTRA);
  ADD(cbf_luma, CBF_LUMA);
  ADD(transform_skip, TSKIP);
  ADD(sig_cg, SIG_CG);
  ADD(sig, SIG);
  ADD(last_x, LAST_X);
  ADD(last_y, LAST_X);
  ADD(greater1, GREATER1);
  ADD(greater2, GREATER2);
  ADD(pnns_flag, PNNS);
  ADD(trans_subdiv, TRANS_SUBDIV);
  ADD(sao_merge, SAO_MERGE);
  ADD(sao_type, SAO_TYPE);
  ADD(chroma_pred, CHROMA_PRED);
  ADD(cbf_chroma, CBF_CHROMA);
  ADD(sig_chroma, SIG_CHROMA);
  ADD(last_x_chroma, LAST_X_CHROMA);
  ADD(last_y_chroma, LAST_X_CHROMA);
  ADD(greater1_chroma, GREATER1_CHROMA);
  ADD(greater2_chroma, GREATER2_CHROMA);
  ADD(transform_skip_chroma, TSKIP_CHROMA);
  ADD(sig_cg_chroma, SIG_CG_CHROMA);
#undef ADD
  L.total = pos;
  return L;
}

// ----------------------------------------------------------- CABAC decoder

struct Dec {
  const uint8_t* data;
  int64_t len;
  int64_t pos;
  uint32_t range;
  int bits_needed;
  uint32_t value;

  void init(const uint8_t* d, int64_t n) {
    data = d;
    len = n;
    pos = 0;
    range = 510;
    bits_needed = -8;
    value = (read_byte() << 8) | read_byte();
  }
  uint32_t read_byte() { return pos < len ? data[pos++] : 0; }

  int decode_bin(int32_t* ctx, int idx) {
    int state = ctx[idx];
    uint32_t lps = kLps[state >> 1][(range >> 6) - 4];
    range -= lps;
    uint32_t scaled = range << 7;
    int bin;
    if (value < scaled) {
      bin = state & 1;
      ctx[idx] = kNextMps[state];
      if (scaled < (256u << 7)) {
        range = scaled >> 6;
        value += value;
        if (++bits_needed == 0) {
          bits_needed = -8;
          value += read_byte();
        }
      }
    } else {
      bin = 1 - (state & 1);
      int nb = kRenorm[lps >> 3];
      value = (value - scaled) << nb;
      range = lps << nb;
      ctx[idx] = kNextLps[state];
      bits_needed += nb;
      if (bits_needed >= 0) {
        value += read_byte() << bits_needed;
        bits_needed -= 8;
      }
    }
    return bin;
  }

  int decode_bin_ep() {
    value += value;
    if (++bits_needed >= 0) {
      bits_needed = -8;
      value += read_byte();
    }
    uint32_t scaled = range << 7;
    if (value >= scaled) {
      value -= scaled;
      return 1;
    }
    return 0;
  }

  uint32_t decode_bins_ep(int num) {
    uint32_t bins = 0;
    while (num > 8) {
      value = (value << 8) + (read_byte() << (8 + bits_needed));
      uint32_t scaled = range << 15;
      for (int i = 0; i < 8; ++i) {
        bins += bins;
        scaled >>= 1;
        if (value >= scaled) {
          bins += 1;
          value -= scaled;
        }
      }
      num -= 8;
    }
    bits_needed += num;
    value <<= num;
    if (bits_needed >= 0) {
      value += read_byte() << bits_needed;
      bits_needed -= 8;
    }
    uint32_t scaled = range << (num + 7);
    for (int i = 0; i < num; ++i) {
      bins += bins;
      scaled >>= 1;
      if (value >= scaled) {
        bins += 1;
        value -= scaled;
      }
    }
    return bins;
  }

  int decode_bin_trm() {
    range -= 2;
    uint32_t scaled = range << 7;
    if (value >= scaled) return 1;
    if (scaled < (256u << 7)) {
      range = scaled >> 6;
      value += value;
      if (++bits_needed == 0) {
        bits_needed = -8;
        value += read_byte();
      }
    }
    return 0;
  }
};

// ------------------------------------------------------------------- scans

enum { SCAN_DIAG = 0, SCAN_HOR = 1, SCAN_VER = 2 };

static const int kGroupIdx[32] = {0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6, 7, 7, 7,
                                  7, 8, 8, 8, 8, 8, 8, 8, 8, 9, 9, 9, 9, 9, 9,
                                  9, 9};
static const int kMinInGroup[10] = {0, 1, 2, 3, 4, 6, 8, 12, 16, 24};

static void pattern_xy(int cols, int rows, int type, std::vector<int>* xs,
                       std::vector<int>* ys) {
  if (type == SCAN_DIAG) {
    for (int d = 0; d < cols + rows - 1; ++d)
      for (int x = 0; x <= d; ++x) {
        int y = d - x;
        if (x < cols && y < rows) {
          xs->push_back(x);
          ys->push_back(y);
        }
      }
  } else if (type == SCAN_HOR) {
    for (int y = 0; y < rows; ++y)
      for (int x = 0; x < cols; ++x) {
        xs->push_back(x);
        ys->push_back(y);
      }
  } else {
    for (int x = 0; x < cols; ++x)
      for (int y = 0; y < rows; ++y) {
        xs->push_back(x);
        ys->push_back(y);
      }
  }
}

struct ScanTables {
  std::vector<int> scan;     // scanPos -> raster
  std::vector<int> cg_scan;  // cg scanPos -> cg raster
};

static const ScanTables& get_scans(int n, int type) {
  static ScanTables cache[6][3];  // log2n 2..5 (+slack), 3 types
  int li = 0;
  for (int t = n; t > 1; t >>= 1) ++li;  // log2(n)
  ScanTables& st = cache[li][type];
  if (!st.scan.empty()) return st;
  std::vector<int> xs, ys;
  if (n <= 4) {
    pattern_xy(n, n, type, &xs, &ys);
    for (size_t i = 0; i < xs.size(); ++i) st.scan.push_back(xs[i] + ys[i] * n);
  } else {
    int cg = n / 4;
    std::vector<int> gx, gy, ix, iy;
    pattern_xy(cg, cg, type, &gx, &gy);
    pattern_xy(4, 4, type, &ix, &iy);
    for (size_t g = 0; g < gx.size(); ++g)
      for (size_t i = 0; i < ix.size(); ++i)
        st.scan.push_back((gx[g] * 4 + ix[i]) + (gy[g] * 4 + iy[i]) * n);
  }
  int cg = n / 4 > 0 ? n / 4 : 1;
  std::vector<int> gx, gy;
  pattern_xy(cg, cg, type, &gx, &gy);
  for (size_t i = 0; i < gx.size(); ++i) st.cg_scan.push_back(gx[i] + gy[i] * cg);
  return st;
}

static int select_scan(int mode, int n) {
  if (n > 8) return SCAN_DIAG;
  int d26 = mode - 26;
  if (d26 < 0) d26 = -d26;
  if (d26 <= 4) return SCAN_HOR;
  int d10 = mode - 10;
  if (d10 < 0) d10 = -d10;
  if (d10 <= 4) return SCAN_VER;
  return SCAN_DIAG;
}

// ------------------------------------------------------------- transforms

static const int kDst4[4][4] = {{29, 55, 74, 84},
                                {74, 74, 0, -74},
                                {84, -29, -74, 55},
                                {55, -84, 74, -29}};

static void build_dct(int n, int64_t* t /* n*n */) {
  if (n == 2) {
    t[0] = 64; t[1] = 64; t[2] = 64; t[3] = -64;
    return;
  }
  std::vector<int64_t> half((n / 2) * (n / 2));
  build_dct(n / 2, half.data());
  std::memset(t, 0, sizeof(int64_t) * n * n);
  for (int m = 0; m < n / 2; ++m)
    for (int c = 0; c < n / 2; ++c) {
      t[2 * m * n + c] = half[m * (n / 2) + c];
      t[2 * m * n + (n - 1 - c)] = half[m * (n / 2) + c];
    }
  static const int odd4[] = {83, 36};
  static const int odd8[] = {89, 75, 50, 18};
  static const int odd16[] = {90, 87, 80, 70, 57, 43, 25, 9};
  static const int odd32[] = {90, 90, 88, 85, 82, 78, 73, 67,
                              61, 54, 46, 38, 31, 22, 13, 4};
  const int* odd = n == 4 ? odd4 : n == 8 ? odd8 : n == 16 ? odd16 : odd32;
  for (int k = 1; k < n; k += 2)
    for (int col = 0; col < n; ++col) {
      int p = (k * (2 * col + 1)) % (4 * n);
      int q = p < 4 * n - p ? p : 4 * n - p;
      if (q <= n)
        t[k * n + col] = odd[(q - 1) / 2];
      else
        t[k * n + col] = -odd[(2 * n - q - 1) / 2];
    }
}

static const int64_t* dct_matrix(int n) {
  static std::vector<int64_t> m4, m8, m16, m32;
  std::vector<int64_t>* m = n == 4 ? &m4 : n == 8 ? &m8 : n == 16 ? &m16 : &m32;
  if (m->empty()) {
    m->resize(n * n);
    build_dct(n, m->data());
  }
  return m->data();
}

static const int kInvQuantScales[6] = {40, 45, 51, 57, 64, 72};

static void dequantize(const int32_t* q, int n, int qp, int64_t* out) {
  int log2n = 0;
  for (int t = n; t > 1; t >>= 1) ++log2n;
  int per = qp / 6, rem = qp % 6;
  int tshift = 15 - 8 - log2n;
  int right_shift = 6 - (tshift + per);
  int64_t scale = kInvQuantScales[rem];
  const int64_t lo = -(1 << 15), hi = (1 << 15) - 1;
  for (int i = 0; i < n * n; ++i) {
    int64_t c;
    if (right_shift > 0)
      c = ((int64_t)q[i] * scale + ((int64_t)1 << (right_shift - 1))) >>
          right_shift;
    else
      c = ((int64_t)q[i] * scale) << (-right_shift);
    out[i] = c < lo ? lo : (c > hi ? hi : c);
  }
}

static void inverse_transform(const int64_t* c, int n, bool use_dst,
                              int32_t* out) {
  // e = clip((t^T @ c + 64) >> 7); r = clip((e @ t + 2048) >> 12).
  std::vector<int64_t> tt(n * n);
  if (use_dst) {
    for (int i = 0; i < 4; ++i)
      for (int j = 0; j < 4; ++j) tt[i * 4 + j] = kDst4[i][j];
  } else {
    std::memcpy(tt.data(), dct_matrix(n), sizeof(int64_t) * n * n);
  }
  const int64_t lo = -(1 << 15), hi = (1 << 15) - 1;
  std::vector<int64_t> e(n * n);
  for (int i = 0; i < n; ++i)
    for (int l = 0; l < n; ++l) {
      int64_t s = 0;
      for (int k = 0; k < n; ++k) s += tt[k * n + i] * c[k * n + l];
      s = (s + 64) >> 7;
      e[i * n + l] = s < lo ? lo : (s > hi ? hi : s);
    }
  for (int i = 0; i < n; ++i)
    for (int col = 0; col < n; ++col) {
      int64_t s = 0;
      for (int k = 0; k < n; ++k) s += e[i * n + k] * tt[k * n + col];
      s = (s + 2048) >> 12;
      out[i * n + col] = (int32_t)(s < -32768 ? -32768 : (s > 32767 ? 32767 : s));
    }
}

// --------------------------------------------------- intra reference/pred

static const int kAngTable[9] = {0, 2, 5, 9, 13, 17, 21, 26, 32};
static const int kInvAngTable[9] = {0, 4096, 1638, 910, 630, 482, 390, 315, 256};

static int filter_threshold(int n) {
  switch (n) {
    case 4: return 10;
    case 8: return 7;
    case 16: return 1;
    case 32: return 0;
    default: return 10;
  }
}

static bool use_filtered_for_mode(int mode, int n) {
  if (mode == 1) return false;
  int d10 = mode - 10; if (d10 < 0) d10 = -d10;
  int d26 = mode - 26; if (d26 < 0) d26 = -d26;
  int diff = d10 < d26 ? d10 : d26;
  return diff > filter_threshold(n);
}

struct RefLine {
  std::vector<int32_t> top;   // 2n+1
  std::vector<int32_t> left;  // 2n+1
};

// flags: [n_units left (bottom..top), corner, n_units above (left..right)].
static void neighbor_flags(const uint8_t* unit_coded, int uw, int uh, int x,
                           int y, int n, int pw, int ph, int unit,
                           std::vector<uint8_t>* flags) {
  int n_units = (2 * n) / unit;
  flags->assign(2 * n_units + 1, 0);
  auto ok = [&](int px, int py) -> uint8_t {
    if (px < 0 || py < 0 || px >= pw || py >= ph) return 0;
    return unit_coded[(py / unit) * uw + (px / unit)];
  };
  for (int j = 0; j < n_units; ++j)
    (*flags)[j] = ok(x - 1, y + 2 * n - unit - j * unit);
  (*flags)[n_units] = ok(x - 1, y - 1);
  for (int j = 0; j < n_units; ++j)
    (*flags)[n_units + 1 + j] = ok(x + j * unit, y - 1);
}

static void fill_reference_samples(const int32_t* plane, int pw, int ph, int x,
                                   int y, int n, const std::vector<uint8_t>& flags,
                                   int unit, RefLine* out) {
  const int DC_FILL = 128;
  int n_units = (2 * n) / unit;
  int total_units = 2 * n_units + 1;
  out->top.assign(2 * n + 1, DC_FILL);
  out->left.assign(2 * n + 1, DC_FILL);
  int num_avail = 0;
  for (auto f : flags) num_avail += f;
  if (num_avail == 0) return;

  // line: [left col bottom->top (2n), corner unit (unit), above (2n)].
  std::vector<int32_t> line(2 * n + unit + 2 * n, DC_FILL);
  std::vector<uint8_t> filled(total_units, 0);
  auto unit_start = [&](int j) {
    if (j < n_units) return j * unit;
    if (j == n_units) return 2 * n;
    return 2 * n + unit + (j - n_units - 1) * unit;
  };
  for (int j = 0; j < total_units; ++j) {
    if (!flags[j]) continue;
    int start = unit_start(j);
    if (j < n_units) {
      for (int i = 0; i < unit; ++i) {
        int py = y + 2 * n - 1 - (start + i);
        line[start + i] = py < ph ? plane[py * pw + (x - 1)] : 0;
      }
    } else if (j == n_units) {
      for (int i = 0; i < unit; ++i)
        line[start + i] = plane[(y - 1) * pw + (x - 1)];
    } else {
      int px0 = x + (j - n_units - 1) * unit;
      for (int i = 0; i < unit; ++i) {
        int px = px0 + i;
        line[start + i] = px < pw ? plane[(y - 1) * pw + px] : 0;
      }
    }
    filled[j] = 1;
  }
  if (!flags[0]) {
    int nxt = 1;
    while (nxt < total_units && !flags[nxt]) ++nxt;
    int32_t ref = line[unit_start(nxt)];
    for (int j = 0; j < nxt; ++j) {
      int start = unit_start(j);
      for (int i = 0; i < unit; ++i) line[start + i] = ref;
      filled[j] = 1;
    }
  }
  for (int j = 1; j < total_units; ++j) {
    if (!flags[j] && !filled[j]) {
      int start = unit_start(j);
      int32_t v = line[start - 1];  // replicate last sample of previous unit
      for (int i = 0; i < unit; ++i) line[start + i] = v;
      filled[j] = 1;
    }
  }
  out->top[0] = line[2 * n + unit - 1];
  for (int i = 0; i < 2 * n; ++i) out->top[1 + i] = line[2 * n + unit + i];
  out->left[0] = out->top[0];
  for (int i = 0; i < 2 * n; ++i) out->left[1 + i] = line[2 * n - 1 - i];
}

static void filter_reference_samples(const RefLine& in, int n,
                                     bool strong_smoothing, RefLine* out) {
  int corner = in.top[0];
  const int32_t* top = in.top.data() + 1;
  const int32_t* left = in.left.data() + 1;
  bool use_strong = false;
  if (strong_smoothing && n == 32) {
    int threshold = 1 << 3;
    int bl = left[2 * n - 1], tr = top[2 * n - 1];
    bool b_l = std::abs((bl + corner) - 2 * left[n - 1]) < threshold;
    bool b_a = std::abs((corner + tr) - 2 * top[n - 1]) < threshold;
    use_strong = b_l && b_a;
  }
  out->top.assign(2 * n + 1, 0);
  out->left.assign(2 * n + 1, 0);
  if (use_strong) {
    int shift = 0;
    for (int t = 2 * n; t > 1; t >>= 1) ++shift;
    int bl = left[2 * n - 1], tr = top[2 * n - 1];
    for (int i = 1; i < 2 * n; ++i) {
      out->left[i] = ((2 * n - i) * corner + i * bl + n) >> shift;
      out->top[i] = ((2 * n - i) * corner + i * tr + n) >> shift;
    }
    out->left[2 * n] = bl;
    out->top[2 * n] = tr;
    out->top[0] = corner;
    out->left[0] = corner;
  } else {
    // ext = [left[0], corner, top...]; filtered vals cover corner..top[2n-2].
    out->top[0] = (left[0] + 2 * corner + top[0] + 2) >> 2;
    for (int i = 1; i < 2 * n; ++i) {
      int a = i == 1 ? corner : top[i - 2];
      out->top[i] = (a + 2 * top[i - 1] + top[i] + 2) >> 2;
    }
    out->top[2 * n] = top[2 * n - 1];
    out->left[0] = out->top[0];
    for (int i = 1; i < 2 * n; ++i) {
      int a = i == 1 ? corner : left[i - 2];
      out->left[i] = (a + 2 * left[i - 1] + left[i] + 2) >> 2;
    }
    out->left[2 * n] = left[2 * n - 1];
  }
}

static void predict_mode(const int32_t* rt, const int32_t* rl, int n, int mode,
                         bool filtered_edges, int32_t* out) {
  const int32_t* top_w = rt + 1;
  const int32_t* left_w = rl + 1;
  bool filt = filtered_edges && n <= 16;
  if (mode == 0) {  // planar
    int s = 0;
    for (int t = n; t > 1; t >>= 1) ++s;
    int tr = rt[n + 1], bl = rl[n + 1];
    for (int y = 0; y < n; ++y)
      for (int x = 0; x < n; ++x) {
        int hor = (left_w[y] << s) + n + (x + 1) * (tr - left_w[y]);
        int ver = (top_w[x] << s) + (y + 1) * (bl - top_w[x]);
        out[y * n + x] = (hor + ver) >> (s + 1);
      }
    return;
  }
  if (mode == 1) {  // DC
    int64_t sum = 0;
    for (int i = 0; i < n; ++i) sum += top_w[i] + left_w[i];
    int dc = (int)((sum + n) / (2 * n));
    for (int i = 0; i < n * n; ++i) out[i] = dc;
    if (filt) {
      for (int x = 0; x < n; ++x) out[x] = (top_w[x] + 3 * dc + 2) >> 2;
      for (int y = 1; y < n; ++y) out[y * n] = (left_w[y] + 3 * dc + 2) >> 2;
      out[0] = (top_w[0] + left_w[0] + 2 * dc + 2) >> 2;
    }
    return;
  }
  // Angular.
  bool is_ver = mode >= 18;
  int ang_mode = is_ver ? mode - 26 : -(mode - 10);
  int a = ang_mode < 0 ? -ang_mode : ang_mode;
  int angle = (ang_mode >= 0 ? 1 : -1) * kAngTable[a];
  int inv_angle = kInvAngTable[a];
  const int32_t* main = is_ver ? rt : rl;
  const int32_t* side = is_ver ? rl : rt;
  // refMain[j] holds k = j - n for k in [-n .. 2n].
  std::vector<int32_t> ref_main(3 * n + 1, 0);
  for (int k = 0; k <= 2 * n; ++k) ref_main[k + n] = main[k];
  if (angle < 0)
    for (int j = 1; j <= n; ++j)
      ref_main[n - j] = side[(128 + j * inv_angle) >> 8];
  for (int y = 0; y < n; ++y)
    for (int x = 0; x < n; ++x) {
      int yy = is_ver ? y : x;
      int xx = is_ver ? x : y;
      int delta = (yy + 1) * angle;
      int di = delta >> 5;
      int f = delta & 31;
      int k0 = xx + di + 1;
      int k1 = k0 + 1 < 2 * n ? k0 + 1 : 2 * n;
      out[y * n + x] =
          ((32 - f) * ref_main[k0 + n] + f * ref_main[k1 + n] + 16) >> 5;
    }
  if (filt && mode == 26) {
    for (int y = 0; y < n; ++y) {
      int v = out[y * n] + ((left_w[y] - rl[0]) >> 1);
      out[y * n] = v < 0 ? 0 : (v > 255 ? 255 : v);
    }
  } else if (filt && mode == 10) {
    for (int x = 0; x < n; ++x) {
      int v = out[x] + ((top_w[x] - rt[0]) >> 1);
      out[x] = v < 0 ? 0 : (v > 255 ? 255 : v);
    }
  }
}

// --------------------------------------------------------------- the parser

constexpr int PLANAR_IDX = 0, DC_IDX = 1, VER_IDX = 26;
constexpr int PNNS_MODE = 35;
constexpr int C1FLAG_NUMBER = 8;
constexpr int SBH_THRESHOLD = 4;
constexpr int COEF_REMAIN_BIN_REDUCTION = 3;

constexpr int ERR_TU_CAP = -2, ERR_COEF_CAP = -3, ERR_EOS = -4, ERR_PARAM = -5;

static const int kCtxIndMap4x4[16] = {0, 1, 4, 5, 2, 3, 4, 5,
                                      6, 6, 8, 8, 7, 7, 8, 8};

struct Parser {
  // stream + params
  Dec dec;
  CtxLayout L;
  std::vector<int32_t> ctx;
  int W, H, ctu, log2_min_cb, log2_max_tb, log2_min_tb, max_tr_depth;
  bool chroma;
  int qp, qp_cb, qp_cr;
  bool tskip_en, sbh, sao_luma, sao_chroma, strong_smooth;
  int policy;  // 0 regular, 1 substitution, 2 switch
  bool reconstruct;

  // state
  int uw, uh;
  std::vector<uint8_t> unit_coded;
  std::vector<int32_t> depth_map;
  int tu_counter = 0;

  // outputs
  int32_t *recon_y, *recon_cb, *recon_cr;
  int32_t *mode_map, *tu_map;
  int32_t* tu_meta;
  int64_t tu_meta_cap, n_tu = 0;
  int32_t* coeff_buf;
  int64_t coeff_cap, n_coeff = 0;
  int32_t* sao_out;
  int err = 0;

  // -------------------------------------------------------------- helpers

  int neighbor_mode(int nx, int ny) {
    if (nx < 0 || ny < 0) return DC_IDX;
    int m = mode_map[(ny / 4) * uw + (nx / 4)];
    return m >= 0 ? m : DC_IDX;
  }

  void mpms_regular(int left, int above, int* m) {
    if (left == above) {
      if (left > 1) {
        m[0] = left;
        m[1] = ((left + 29) % 32) + 2;
        m[2] = ((left - 1) % 32) + 2;
      } else {
        m[0] = PLANAR_IDX; m[1] = DC_IDX; m[2] = VER_IDX;
      }
      return;
    }
    m[0] = left;
    m[1] = above;
    if (left && above) m[2] = PLANAR_IDX;
    else if (left + above < 2) m[2] = VER_IDX;
    else m[2] = DC_IDX;
  }

  void mpms_switch(int left, int above, int* m) {
    if (left == above) {
      if (1 < left && left < PNNS_MODE) {
        m[0] = left;
        m[1] = ((left + 29) % 32) + 2;
        m[2] = ((left - 1) % 32) + 2;
      } else {
        m[0] = PLANAR_IDX; m[1] = DC_IDX; m[2] = VER_IDX;
      }
      return;
    }
    if (left == PNNS_MODE || above == PNNS_MODE) {
      int m0 = left == PNNS_MODE ? above : left;
      if (m0 > 1) { m[0] = m0; m[1] = PLANAR_IDX; m[2] = DC_IDX; }
      else if (m0 == DC_IDX) { m[0] = DC_IDX; m[1] = PLANAR_IDX; m[2] = VER_IDX; }
      else { m[0] = PLANAR_IDX; m[1] = DC_IDX; m[2] = VER_IDX; }
      return;
    }
    mpms_regular(left, above, m);
  }

  void mpms(int x, int y, int* m) {
    int left = neighbor_mode(x - 1, y);
    int above = (y % ctu == 0) ? DC_IDX : neighbor_mode(x, y - 1);
    if (policy == 2) mpms_switch(left, above, m);
    else mpms_regular(left, above, m);
  }

  int split_ctx(int x, int y, int depth) {
    int c = 0, ux = x / 4, uy = y / 4;
    if (x > 0 && unit_coded[uy * uw + ux - 1])
      c += depth_map[uy * uw + ux - 1] > depth ? 1 : 0;
    if (y > 0 && unit_coded[(uy - 1) * uw + ux])
      c += depth_map[(uy - 1) * uw + ux] > depth ? 1 : 0;
    return c;
  }

  // ------------------------------------------------------------ residual

  int read_coef_remain(int r_param) {
    int prefix = 0;
    while (prefix < 32 && dec.decode_bin_ep()) ++prefix;
    if (prefix < COEF_REMAIN_BIN_REDUCTION) {
      int suffix = r_param ? (int)dec.decode_bins_ep(r_param) : 0;
      return (prefix << r_param) + suffix;
    }
    int suffix = (int)dec.decode_bins_ep(prefix - COEF_REMAIN_BIN_REDUCTION + r_param);
    return (((1 << (prefix - COEF_REMAIN_BIN_REDUCTION)) +
             COEF_REMAIN_BIN_REDUCTION - 1)
            << r_param) + suffix;
  }

  struct Ch {
    bool is_chroma;
    int sig, sig_cg, last_x, last_y, greater1, greater2;
  };
  Ch luma_ch() const {
    return {false, L.sig, L.sig_cg, L.last_x, L.last_y, L.greater1, L.greater2};
  }
  Ch chroma_ch() const {
    return {true, L.sig_chroma, L.sig_cg_chroma, L.last_x_chroma,
            L.last_y_chroma, L.greater1_chroma, L.greater2_chroma};
  }

  int first_sig_ctx(int n, int scan_type, const Ch& ch) {
    if (n == 4) return 0;
    if (ch.is_chroma) return n == 8 ? 9 : 12;
    if (n == 8) return 9 + (scan_type != SCAN_DIAG ? 6 : 0);
    return 21;
  }

  int sig_ctx(int pattern, int px, int py, int log2n, int first_ctx,
              const Ch& ch) {
    if (px + py == 0) return ch.sig + 0;
    if (log2n == 2) return ch.sig + kCtxIndMap4x4[4 * py + px];
    int x = px & 3, y = py & 3, cnt;
    if (pattern == 0) {
      int total = x + y;
      cnt = total >= 3 ? 0 : (total >= 1 ? 1 : 2);
    } else if (pattern == 1) {
      cnt = y >= 2 ? 0 : (y >= 1 ? 1 : 2);
    } else if (pattern == 2) {
      cnt = x >= 2 ? 0 : (x >= 1 ? 1 : 2);
    } else {
      cnt = 2;
    }
    bool nfg = ((px >> 2) + (py >> 2)) > 0;
    int nfg_off = nfg ? (ch.is_chroma ? 0 : 3) : 0;
    return ch.sig + first_ctx + nfg_off + cnt;
  }

  // Decodes one non-empty TU into coeff (n*n, zero-initialised by caller).
  void decode_coefficients(int n, int mode, const Ch& ch, int32_t* flat) {
    int log2n = 0;
    for (int t = n; t > 1; t >>= 1) ++log2n;
    int scan_type = (ch.is_chroma && n > 4) ? SCAN_DIAG : select_scan(mode, n);
    const ScanTables& st = get_scans(n, scan_type);
    const int* scan = st.scan.data();
    const int* scan_cg = st.cg_scan.data();
    int first_ctx = first_sig_ctx(n, scan_type, ch);
    int wig = n / 4 > 0 ? n / 4 : 1;

    int blk_offset, shift;
    if (ch.is_chroma) { blk_offset = 0; shift = log2n - 2; }
    else { blk_offset = (log2n - 2) * 3 + ((log2n - 1) >> 2); shift = (log2n + 1) >> 2; }

    int max_group = kGroupIdx[n - 1];
    int group_x = 0;
    while (group_x < max_group &&
           dec.decode_bin(ctx.data(), ch.last_x + blk_offset + (group_x >> shift)))
      ++group_x;
    int group_y = 0;
    while (group_y < max_group &&
           dec.decode_bin(ctx.data(), ch.last_y + blk_offset + (group_y >> shift)))
      ++group_y;
    int lx = kMinInGroup[group_x];
    if (group_x > 3) {
      int count = (group_x - 2) >> 1, rem = 0;
      for (int i = 0; i < count; ++i) rem = (rem << 1) | dec.decode_bin_ep();
      lx += rem;
    }
    int ly = kMinInGroup[group_y];
    if (group_y > 3) {
      int count = (group_y - 2) >> 1, rem = 0;
      for (int i = 0; i < count; ++i) rem = (rem << 1) | dec.decode_bin_ep();
      ly += rem;
    }
    if (scan_type == SCAN_VER) std::swap(lx, ly);
    int pos_last = ly * n + lx;
    int scan_pos_last = 0;
    for (int i = 0; i < n * n; ++i)
      if (scan[i] == pos_last) { scan_pos_last = i; break; }

    std::vector<uint8_t> sig_cg_map(wig * wig, 0);
    int last_scan_set = scan_pos_last >> 4;
    int c1 = 1;
    int scan_pos_sig = scan_pos_last;

    for (int subset = last_scan_set; subset >= 0; --subset) {
      int sub_pos = subset << 4;
      int go_rice = 0;
      int sig_positions[16];
      int num_nonzero = 0;
      int last_nz = -1, first_nz = 16;

      if (scan_pos_sig == scan_pos_last) {
        sig_positions[num_nonzero++] = scan_pos_sig;
        last_nz = first_nz = scan_pos_sig;
        --scan_pos_sig;
      }
      int cg_blk = scan_cg[subset];
      int cg_y = cg_blk / wig, cg_x = cg_blk % wig;
      if (subset == last_scan_set || subset == 0) {
        sig_cg_map[cg_blk] = 1;
      } else {
        bool right = cg_x < wig - 1 && sig_cg_map[cg_blk + 1];
        bool below = cg_y < wig - 1 && sig_cg_map[cg_blk + wig];
        int ctx_cg = (right || below) ? 1 : 0;
        sig_cg_map[cg_blk] =
            (uint8_t)dec.decode_bin(ctx.data(), ch.sig_cg + ctx_cg);
      }
      if (sig_cg_map[cg_blk]) {
        bool right = cg_x < wig - 1 && sig_cg_map[cg_blk + 1];
        bool below = cg_y < wig - 1 && sig_cg_map[cg_blk + wig];
        int pattern = (right ? 1 : 0) + (below ? 2 : 0);
        while (scan_pos_sig >= sub_pos) {
          int rp = scan[scan_pos_sig];
          int py = rp / n, px = rp % n;
          int sig;
          if (scan_pos_sig > sub_pos || subset == 0 || num_nonzero)
            sig = dec.decode_bin(ctx.data(),
                                 sig_ctx(pattern, px, py, log2n, first_ctx, ch));
          else
            sig = 1;
          if (sig) {
            sig_positions[num_nonzero++] = scan_pos_sig;
            if (last_nz == -1) last_nz = scan_pos_sig;
            first_nz = scan_pos_sig;
          }
          --scan_pos_sig;
        }
      } else {
        scan_pos_sig = sub_pos - 1;
      }

      if (num_nonzero > 0) {
        bool hidden = sbh && (last_nz - first_nz >= SBH_THRESHOLD);
        int base_set = (subset > 0 && !ch.is_chroma) ? 2 : 0;
        int ctx_set = base_set + (c1 == 0 ? 1 : 0);
        c1 = 1;
        int base_g1 = ch.greater1 + 4 * ctx_set;
        int abs_levels[16];
        int gt1[16] = {0};
        int num_c1 = num_nonzero < C1FLAG_NUMBER ? num_nonzero : C1FLAG_NUMBER;
        int first_c2_idx = -1;
        for (int idx = 0; idx < num_c1; ++idx) {
          int symbol = dec.decode_bin(ctx.data(), base_g1 + c1);
          gt1[idx] = symbol;
          if (symbol) {
            c1 = 0;
            if (first_c2_idx == -1) first_c2_idx = idx;
          } else if (0 < c1 && c1 < 3) {
            ++c1;
          }
        }
        int gt2 = 0;
        if (c1 == 0 && first_c2_idx != -1)
          gt2 = dec.decode_bin(ctx.data(), ch.greater2 + ctx_set);

        int n_signs = hidden ? num_nonzero - 1 : num_nonzero;
        uint32_t coeff_signs = n_signs ? dec.decode_bins_ep(n_signs) : 0;

        int first_coeff2 = 1;
        for (int idx = 0; idx < num_nonzero; ++idx) {
          int base_level, partial;
          if (idx < C1FLAG_NUMBER) {
            base_level = 2 + first_coeff2;
            partial = 1 + gt1[idx] + (idx == first_c2_idx ? gt2 : 0);
          } else {
            base_level = 1;
            partial = 1;
          }
          abs_levels[idx] = partial;
          if (partial >= base_level) {
            int rem = read_coef_remain(go_rice);
            abs_levels[idx] = base_level + rem;
            if (abs_levels[idx] > (3 << go_rice))
              go_rice = go_rice + 1 < 4 ? go_rice + 1 : 4;
          }
          if (abs_levels[idx] >= 2) first_coeff2 = 0;
        }
        int64_t total = 0;
        for (int i = 0; i < num_nonzero; ++i) total += abs_levels[i];
        for (int i = 0; i < num_nonzero; ++i) {
          int rp = scan[sig_positions[i]];
          int sign;
          if (hidden && i == num_nonzero - 1)
            sign = (total & 1) ? 1 : 0;
          else
            sign = (coeff_signs >> (n_signs - 1 - i)) & 1;
          flat[rp] = sign ? -abs_levels[i] : abs_levels[i];
        }
      }
    }
  }

  // --------------------------------------------------------- TU emission

  // record: [plane, x, y, n, mode, cbf, tskip, coef_off]
  int32_t* emit_record(int plane, int x, int y, int n, int mode, int cbf,
                       int tskip, int64_t coef_off) {
    if (n_tu >= tu_meta_cap) { err = ERR_TU_CAP; return nullptr; }
    int32_t* r = tu_meta + n_tu * 8;
    r[0] = plane; r[1] = x; r[2] = y; r[3] = n; r[4] = mode;
    r[5] = cbf; r[6] = tskip; r[7] = (int32_t)coef_off;
    ++n_tu;
    return r;
  }

  void reconstruct_tu(int x, int y, int n, int mode, int cbf) {
    int tskip = 0;
    int64_t coef_off = -1;
    int32_t* coef = nullptr;
    if (cbf) {
      if (tskip_en && n == 4)
        tskip = dec.decode_bin(ctx.data(), L.transform_skip);
      if (n_coeff + n * n > coeff_cap) { err = ERR_COEF_CAP; return; }
      coef_off = n_coeff;
      coef = coeff_buf + n_coeff;
      std::memset(coef, 0, sizeof(int32_t) * n * n);
      n_coeff += n * n;
      decode_coefficients(n, mode == PNNS_MODE ? 0 : mode, luma_ch(), coef);
    }
    if (emit_record(0, x, y, n, mode, cbf, tskip, coef_off) == nullptr) return;

    if (reconstruct) {
      // policy "regular" only: no PNN in the loop.
      std::vector<uint8_t> flags;
      neighbor_flags(unit_coded.data(), uw, uh, x, y, n, W, H, 4, &flags);
      RefLine ref, reff;
      fill_reference_samples(recon_y, W, H, x, y, n, flags, 4, &ref);
      const int32_t *rt = ref.top.data(), *rl = ref.left.data();
      if (use_filtered_for_mode(mode, n)) {
        filter_reference_samples(ref, n, strong_smooth, &reff);
        rt = reff.top.data();
        rl = reff.left.data();
      }
      std::vector<int32_t> pred(n * n);
      predict_mode(rt, rl, n, mode, true, pred.data());
      if (cbf) {
        std::vector<int64_t> deq(n * n);
        dequantize(coef, n, qp, deq.data());
        std::vector<int32_t> resi(n * n);
        if (tskip) {
          for (int i = 0; i < n * n; ++i)
            resi[i] = (int32_t)((deq[i] + 16) >> 5);
        } else {
          inverse_transform(deq.data(), n, n == 4, resi.data());
        }
        for (int yy = 0; yy < n; ++yy)
          for (int xx = 0; xx < n; ++xx) {
            int v = pred[yy * n + xx] + resi[yy * n + xx];
            recon_y[(y + yy) * W + x + xx] = v < 0 ? 0 : (v > 255 ? 255 : v);
          }
      } else {
        for (int yy = 0; yy < n; ++yy)
          for (int xx = 0; xx < n; ++xx)
            recon_y[(y + yy) * W + x + xx] = pred[yy * n + xx];
      }
    }
    for (int uy = y / 4; uy < (y + n) / 4; ++uy)
      for (int ux = x / 4; ux < (x + n) / 4; ++ux) {
        unit_coded[uy * uw + ux] = 1;
        tu_map[uy * uw + ux] = tu_counter;
      }
    ++tu_counter;
  }

  void chroma_tu(int xc, int yc, int nc, int chroma_mode, int cbf_cb,
                 int cbf_cr) {
    int32_t* planes[2] = {recon_cb, recon_cr};
    int cbfs[2] = {cbf_cb, cbf_cr};
    int qps[2] = {qp_cb, qp_cr};
    for (int p = 0; p < 2; ++p) {
      int cbf = cbfs[p];
      int tskip = 0;
      int64_t coef_off = -1;
      int32_t* coef = nullptr;
      if (cbf) {
        if (tskip_en && nc == 4)
          tskip = dec.decode_bin(ctx.data(), L.transform_skip_chroma);
        if (n_coeff + nc * nc > coeff_cap) { err = ERR_COEF_CAP; return; }
        coef_off = n_coeff;
        coef = coeff_buf + n_coeff;
        std::memset(coef, 0, sizeof(int32_t) * nc * nc);
        n_coeff += nc * nc;
        decode_coefficients(nc, chroma_mode, chroma_ch(), coef);
      }
      if (emit_record(1 + p, xc, yc, nc, chroma_mode, cbf, tskip, coef_off) ==
          nullptr)
        return;
      if (reconstruct) {
        std::vector<uint8_t> flags;
        neighbor_flags(unit_coded.data(), uw, uh, xc, yc, nc, W / 2, H / 2, 2,
                       &flags);
        RefLine ref;
        fill_reference_samples(planes[p], W / 2, H / 2, xc, yc, nc, flags, 2,
                               &ref);
        std::vector<int32_t> pred(nc * nc);
        predict_mode(ref.top.data(), ref.left.data(), nc, chroma_mode, false,
                     pred.data());
        if (cbf) {
          std::vector<int64_t> deq(nc * nc);
          dequantize(coef, nc, qps[p], deq.data());
          std::vector<int32_t> resi(nc * nc);
          if (tskip) {
            for (int i = 0; i < nc * nc; ++i)
              resi[i] = (int32_t)((deq[i] + 16) >> 5);
          } else {
            inverse_transform(deq.data(), nc, false, resi.data());
          }
          for (int yy = 0; yy < nc; ++yy)
            for (int xx = 0; xx < nc; ++xx) {
              int v = pred[yy * nc + xx] + resi[yy * nc + xx];
              planes[p][(yc + yy) * (W / 2) + xc + xx] =
                  v < 0 ? 0 : (v > 255 ? 255 : v);
            }
        } else {
          for (int yy = 0; yy < nc; ++yy)
            for (int xx = 0; xx < nc; ++xx)
              planes[p][(yc + yy) * (W / 2) + xc + xx] = pred[yy * nc + xx];
        }
      }
    }
  }

  // ------------------------------------------------------ transform tree

  void transform_tree(int x, int y, int x_base, int y_base, int log2_size,
                      int tr_depth, int blk_idx, const int* pu_modes,
                      int chroma_mode, int parent_cbf_cb, int parent_cbf_cr,
                      bool intra_split) {
    if (err) return;
    int max_depth = max_tr_depth + (intra_split ? 1 : 0);
    int size = 1 << log2_size;
    int split;
    if (log2_size > log2_max_tb) split = 1;
    else if (intra_split && tr_depth == 0) split = 1;
    else if (log2_size > log2_min_tb && tr_depth < max_depth)
      split = dec.decode_bin(ctx.data(), L.trans_subdiv + (5 - log2_size));
    else split = 0;

    int cbf_cb = parent_cbf_cb, cbf_cr = parent_cbf_cr;
    if (chroma && log2_size > 2) {
      if (tr_depth == 0 || parent_cbf_cb)
        cbf_cb = dec.decode_bin(ctx.data(), L.cbf_chroma + tr_depth);
      else
        cbf_cb = 0;
      if (tr_depth == 0 || parent_cbf_cr)
        cbf_cr = dec.decode_bin(ctx.data(), L.cbf_chroma + tr_depth);
      else
        cbf_cr = 0;
    }
    if (split) {
      int half = size / 2;
      int cxy[4][2] = {{x, y}, {x + half, y}, {x, y + half}, {x + half, y + half}};
      for (int i = 0; i < 4; ++i)
        transform_tree(cxy[i][0], cxy[i][1], x, y, log2_size - 1, tr_depth + 1,
                       i, pu_modes, chroma_mode, cbf_cb, cbf_cr, intra_split);
      return;
    }
    int mode;
    if (intra_split) {
      int cu_size = 1 << log2_min_cb;
      int qi = ((y % cu_size) >= cu_size / 2 ? 2 : 0) +
               ((x % cu_size) >= cu_size / 2 ? 1 : 0);
      mode = pu_modes[qi];
    } else {
      mode = pu_modes[0];
    }
    int cbf = dec.decode_bin(ctx.data(), L.cbf_luma + (tr_depth == 0 ? 1 : 0));
    reconstruct_tu(x, y, size, mode, cbf);
    if (err) return;
    if (chroma) {
      if (log2_size > 2)
        chroma_tu(x / 2, y / 2, size / 2, chroma_mode, cbf_cb, cbf_cr);
      else if (blk_idx == 3)
        chroma_tu(x_base / 2, y_base / 2, 4, chroma_mode, parent_cbf_cb,
                  parent_cbf_cr);
    }
  }

  int parse_chroma_mode(int luma_mode0) {
    if (!chroma) return -1;
    int index;
    if (dec.decode_bin(ctx.data(), L.chroma_pred) == 0)
      index = 4;
    else
      index = (int)dec.decode_bins_ep(2);
    if (index == 4) return luma_mode0;
    static const int cand[4] = {0, 26, 10, 1};
    int mode = cand[index];
    return mode == luma_mode0 ? 34 : mode;
  }

  int decode_one_mode(int x, int y) {
    // Non-NxN path (also used per-PU once raw symbols are known for NxN).
    if (policy == 2 && dec.decode_bin(ctx.data(), L.pnns_flag))
      return PNNS_MODE;
    int m[3];
    if (dec.decode_bin(ctx.data(), L.prev_intra)) {
      int idx;
      if (dec.decode_bin_ep() == 0) idx = 0;
      else idx = 1 + dec.decode_bin_ep();
      mpms(x, y, m);
      return m[idx];
    }
    int rem = (int)dec.decode_bins_ep(5);
    mpms(x, y, m);
    int sorted[3] = {m[0], m[1], m[2]};
    std::sort(sorted, sorted + 3);
    for (int i = 0; i < 3; ++i)
      if (rem >= sorted[i]) ++rem;
    return rem;
  }

  void decode_cu(int x, int y, int log2_size, int depth) {
    if (err) return;
    int size = 1 << log2_size;
    bool inside = x + size <= W && y + size <= H;
    int split;
    if (size > (1 << log2_min_cb) && inside)
      split = dec.decode_bin(ctx.data(), L.split_cu + split_ctx(x, y, depth));
    else if (size > (1 << log2_min_cb))
      split = 1;
    else
      split = 0;
    if (split) {
      int half = size / 2;
      int cxy[4][2] = {{x, y}, {x + half, y}, {x, y + half}, {x + half, y + half}};
      for (int i = 0; i < 4; ++i)
        if (cxy[i][0] < W && cxy[i][1] < H)
          decode_cu(cxy[i][0], cxy[i][1], log2_size - 1, depth + 1);
      return;
    }

    bool part_nxn = false;
    if (log2_size == log2_min_cb)
      part_nxn = !dec.decode_bin(ctx.data(), L.part_size);

    if (part_nxn) {
      int half = size / 2;
      int pu_xy[4][2] = {{x, y}, {x + half, y}, {x, y + half}, {x + half, y + half}};
      // Four leading flags first (TDecSbac::parseIntraDirLumaAng), then the
      // four mpm_idx / rem fields.
      int prev_flags[4];  // -1 = PNNS
      for (int i = 0; i < 4; ++i) {
        if (policy == 2 && dec.decode_bin(ctx.data(), L.pnns_flag))
          prev_flags[i] = -1;
        else
          prev_flags[i] = dec.decode_bin(ctx.data(), L.prev_intra);
      }
      int raw_kind[4];  // 0 = pnns, 1 = mpm, 2 = rem
      int raw_val[4];
      for (int i = 0; i < 4; ++i) {
        if (prev_flags[i] == -1) { raw_kind[i] = 0; raw_val[i] = 0; }
        else if (prev_flags[i]) {
          raw_kind[i] = 1;
          if (dec.decode_bin_ep() == 0) raw_val[i] = 0;
          else raw_val[i] = 1 + dec.decode_bin_ep();
        } else {
          raw_kind[i] = 2;
          raw_val[i] = (int)dec.decode_bins_ep(5);
        }
      }
      int modes[4];
      for (int i = 0; i < 4; ++i) {
        int m[3];
        mpms(pu_xy[i][0], pu_xy[i][1], m);
        int mode;
        if (raw_kind[i] == 0) mode = PNNS_MODE;
        else if (raw_kind[i] == 1) mode = m[raw_val[i]];
        else {
          int rem = raw_val[i];
          int sorted[3] = {m[0], m[1], m[2]};
          std::sort(sorted, sorted + 3);
          for (int j = 0; j < 3; ++j)
            if (rem >= sorted[j]) ++rem;
          mode = rem;
        }
        modes[i] = mode;
        for (int uy = pu_xy[i][1] / 4; uy < (pu_xy[i][1] + half) / 4; ++uy)
          for (int ux = pu_xy[i][0] / 4; ux < (pu_xy[i][0] + half) / 4; ++ux)
            mode_map[uy * uw + ux] = mode;
      }
      int chroma_mode = parse_chroma_mode(modes[0]);
      transform_tree(x, y, x, y, log2_size, 0, 0, modes, chroma_mode, 1, 1,
                     true);
    } else {
      int mode = decode_one_mode(x, y);
      for (int uy = y / 4; uy < (y + size) / 4; ++uy)
        for (int ux = x / 4; ux < (x + size) / 4; ++ux)
          mode_map[uy * uw + ux] = mode;
      int chroma_mode = parse_chroma_mode(mode);
      int modes[4] = {mode, mode, mode, mode};
      transform_tree(x, y, x, y, log2_size, 0, 0, modes, chroma_mode, 1, 1,
                     false);
    }
    for (int uy = y / 4; uy < (y + size) / 4; ++uy)
      for (int ux = x / 4; ux < (x + size) / 4; ++ux)
        depth_map[uy * uw + ux] = depth;
  }

  // ---------------------------------------------------------------- SAO

  int decode_offset_mag() {
    int mag = 0;
    while (mag < 7 && dec.decode_bin_ep()) ++mag;
    return mag;
  }

  // comp entry layout: [mode, aux, o0, o1, o2, o3].
  void parse_sao_offsets(int mode, int eo_class_or_m1, int32_t* entry) {
    int mags[4];
    for (int i = 0; i < 4; ++i) mags[i] = decode_offset_mag();
    if (mode == 1) {  // BO
      int offsets[4];
      for (int i = 0; i < 4; ++i) {
        if (mags[i] != 0 && dec.decode_bin_ep())
          offsets[i] = -mags[i];
        else
          offsets[i] = mags[i];
      }
      int pos = (int)dec.decode_bins_ep(5);
      entry[0] = 1; entry[1] = pos;
      for (int i = 0; i < 4; ++i) entry[2 + i] = offsets[i];
      return;
    }
    int eo = eo_class_or_m1 >= 0 ? eo_class_or_m1 : (int)dec.decode_bins_ep(2);
    entry[0] = 2; entry[1] = eo;
    entry[2] = mags[0]; entry[3] = mags[1];
    entry[4] = -mags[2]; entry[5] = -mags[3];
  }

  int parse_sao_type() {
    if (!dec.decode_bin(ctx.data(), L.sao_type)) return 0;
    return dec.decode_bin_ep() ? 2 : 1;  // EO : BO
  }

  void decode_sao_ctu(int ctu_idx, int cx, int cy, int n_ctu_x) {
    int32_t* e = sao_out + (int64_t)ctu_idx * 18;
    if (cx > 0 && dec.decode_bin(ctx.data(), L.sao_merge)) {
      std::memcpy(e, sao_out + (int64_t)(ctu_idx - 1) * 18, 18 * sizeof(int32_t));
      return;
    }
    if (cy > 0 && dec.decode_bin(ctx.data(), L.sao_merge)) {
      std::memcpy(e, sao_out + (int64_t)(ctu_idx - n_ctu_x) * 18,
                  18 * sizeof(int32_t));
      return;
    }
    if (sao_luma) {
      int mode = parse_sao_type();
      if (mode != 0) parse_sao_offsets(mode, -1, e);
    }
    if (chroma && sao_chroma) {
      int mode = parse_sao_type();
      if (mode != 0) {
        parse_sao_offsets(mode, -1, e + 6);
        int eo = e[6] == 2 ? e[7] : -1;
        parse_sao_offsets(mode, eo, e + 12);
      }
    }
  }

  // --------------------------------------------------------------- frame

  int run() {
    int n_ctu_y = (H + ctu - 1) / ctu;
    int n_ctu_x = (W + ctu - 1) / ctu;
    bool sao_any = sao_luma || (chroma && sao_chroma);
    int log2_ctu = 0;
    for (int t = ctu; t > 1; t >>= 1) ++log2_ctu;
    for (int cy = 0; cy < n_ctu_y && !err; ++cy)
      for (int cx = 0; cx < n_ctu_x && !err; ++cx) {
        if (sao_any) decode_sao_ctu(cy * n_ctu_x + cx, cx, cy, n_ctu_x);
        decode_cu(cx * ctu, cy * ctu, log2_ctu, 0);
        if (err) break;
        int end = dec.decode_bin_trm();
        bool is_last = cy == n_ctu_y - 1 && cx == n_ctu_x - 1;
        if ((end != 0) != is_last) { err = ERR_EOS; break; }
      }
    return err;
  }
};

}  // namespace

extern "C" {

// Returns 0 on success, negative error code otherwise.  out_counts receives
// [n_tu_records, n_coeff_values].
int64_t hm_decode_slice(
    const uint8_t* data, int64_t data_len, int width, int height, int ctu_size,
    int log2_min_cb, int log2_max_tb, int log2_min_tb, int max_tr_depth_intra,
    int chroma, int qp, int qp_cb, int qp_cr, int transform_skip_enabled,
    int sign_data_hiding, int sao_luma, int sao_chroma,
    int strong_intra_smoothing, int policy, int reconstruct,
    int32_t* recon_y, int32_t* recon_cb, int32_t* recon_cr, int32_t* mode_map,
    int32_t* tu_map, int32_t* tu_meta, int64_t tu_meta_cap, int32_t* coeff_buf,
    int64_t coeff_cap, int32_t* sao_out, int64_t* out_counts) {
  if (width <= 0 || height <= 0 || ctu_size <= 0) return ERR_PARAM;

  Parser p;
  p.W = width;
  p.H = height;
  p.ctu = ctu_size;
  p.log2_min_cb = log2_min_cb;
  p.log2_max_tb = log2_max_tb;
  p.log2_min_tb = log2_min_tb;
  p.max_tr_depth = max_tr_depth_intra;
  p.chroma = chroma != 0;
  p.qp = qp;
  p.qp_cb = qp_cb;
  p.qp_cr = qp_cr;
  p.tskip_en = transform_skip_enabled != 0;
  p.sbh = sign_data_hiding != 0;
  p.sao_luma = sao_luma != 0;
  p.sao_chroma = sao_chroma != 0;
  p.strong_smooth = strong_intra_smoothing != 0;
  p.policy = policy;
  p.reconstruct = reconstruct != 0;

  std::vector<int> init_values;
  p.L = make_layout(&init_values);
  p.ctx.resize(p.L.total);
  for (int i = 0; i < p.L.total; ++i)
    p.ctx[i] = init_context_state(qp, init_values[i]);
  p.dec.init(data, data_len);

  p.uw = (width + 3) / 4;
  p.uh = (height + 3) / 4;
  p.unit_coded.assign((size_t)p.uw * p.uh, 0);
  p.depth_map.assign((size_t)p.uw * p.uh, 0);

  p.recon_y = recon_y;
  p.recon_cb = recon_cb;
  p.recon_cr = recon_cr;
  p.mode_map = mode_map;
  p.tu_map = tu_map;
  p.tu_meta = tu_meta;
  p.tu_meta_cap = tu_meta_cap;
  p.coeff_buf = coeff_buf;
  p.coeff_cap = coeff_cap;
  p.sao_out = sao_out;
  for (int64_t i = 0; i < (int64_t)p.uw * p.uh; ++i) {
    mode_map[i] = -1;
    tu_map[i] = -1;
  }
  int n_ctus = ((height + ctu_size - 1) / ctu_size) *
               ((width + ctu_size - 1) / ctu_size);
  std::memset(sao_out, 0, sizeof(int32_t) * 18 * n_ctus);
  if (reconstruct) {
    std::memset(recon_y, 0, sizeof(int32_t) * (size_t)width * height);
    if (chroma) {
      std::memset(recon_cb, 0, sizeof(int32_t) * (size_t)(width / 2) * (height / 2));
      std::memset(recon_cr, 0, sizeof(int32_t) * (size_t)(width / 2) * (height / 2));
    }
  }

  int rc = p.run();
  out_counts[0] = p.n_tu;
  out_counts[1] = p.n_coeff;
  return rc;
}

// ------------------------------------------------------- deblocking filter
//
// C++ twin of codec/deblock.py (HM TComLoopFilter semantics for All-Intra:
// every 8-grid TU/PU edge has bS 2; vertical edges first, then horizontal).

static const int kTcTable[54] = {0,  0,  0,  0,  0,  0,  0,  0,  0,  0,  0,
                                 0,  0,  0,  0,  0,  0,  0,  1,  1,  1,  1,
                                 1,  1,  1,  1,  1,  2,  2,  2,  2,  3,  3,
                                 3,  3,  4,  4,  4,  5,  5,  6,  6,  7,  8,
                                 9,  10, 11, 13, 14, 16, 18, 20, 22, 24};
static const int kBetaTable[52] = {0,  0,  0,  0,  0,  0,  0,  0,  0,  0, 0,
                                   0,  0,  0,  0,  0,  6,  7,  8,  9,  10, 11,
                                   12, 13, 14, 15, 16, 17, 18, 20, 22, 24, 26,
                                   28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48,
                                   50, 52, 54, 56, 58, 60, 62, 64};

namespace {

static inline int iclip(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Filters one 4-line segment; samples accessed via base pointer + strides:
// sample (i, k) is at p[i * line_stride + k * cross_stride] with k in -4..3
// (k < 0 = P side).
static void filter_segment_luma(int32_t* p, int line_stride, int cross_stride,
                                int tc, int beta) {
  auto at = [&](int i, int k) -> int32_t& {
    return p[i * line_stride + k * cross_stride];
  };
  auto dp = [&](int i) {
    return std::abs(at(i, -3) - 2 * at(i, -2) + at(i, -1));
  };
  auto dq = [&](int i) {
    return std::abs(at(i, 0) - 2 * at(i, 1) + at(i, 2));
  };
  int dp0 = dp(0), dq0 = dq(0), dp3 = dp(3), dq3 = dq(3);
  int d0 = dp0 + dq0, d3 = dp3 + dq3;
  if (d0 + d3 >= beta) return;
  int side_threshold = (beta + (beta >> 1)) >> 3;
  bool filter_p = (dp0 + dp3) < side_threshold;
  bool filter_q = (dq0 + dq3) < side_threshold;
  auto strong = [&](int i, int d) {
    int d_strong =
        std::abs(at(i, -4) - at(i, -1)) + std::abs(at(i, 3) - at(i, 0));
    return d_strong < (beta >> 3) && d < (beta >> 2) &&
           std::abs(at(i, -1) - at(i, 0)) < ((tc * 5 + 1) >> 1);
  };
  bool sw = strong(0, 2 * d0) && strong(3, 2 * d3);
  int thr_cut = tc * 10;
  for (int i = 0; i < 4; ++i) {
    int m0 = at(i, -4), m1 = at(i, -3), m2 = at(i, -2), m3 = at(i, -1);
    int m4 = at(i, 0), m5 = at(i, 1), m6 = at(i, 2), m7 = at(i, 3);
    if (sw) {
      at(i, -1) = iclip((m1 + 2 * m2 + 2 * m3 + 2 * m4 + m5 + 4) >> 3,
                        m3 - 2 * tc, m3 + 2 * tc);
      at(i, 0) = iclip((m2 + 2 * m3 + 2 * m4 + 2 * m5 + m6 + 4) >> 3,
                       m4 - 2 * tc, m4 + 2 * tc);
      at(i, -2) = iclip((m1 + m2 + m3 + m4 + 2) >> 2, m2 - 2 * tc, m2 + 2 * tc);
      at(i, 1) = iclip((m3 + m4 + m5 + m6 + 2) >> 2, m5 - 2 * tc, m5 + 2 * tc);
      at(i, -3) = iclip((2 * m0 + 3 * m1 + m2 + m3 + m4 + 4) >> 3, m1 - 2 * tc,
                        m1 + 2 * tc);
      at(i, 2) = iclip((m3 + m4 + m5 + 3 * m6 + 2 * m7 + 4) >> 3, m6 - 2 * tc,
                       m6 + 2 * tc);
    } else {
      int delta = (9 * (m4 - m3) - 3 * (m5 - m2) + 8) >> 4;
      if (std::abs(delta) < thr_cut) {
        delta = iclip(delta, -tc, tc);
        at(i, -1) = iclip(m3 + delta, 0, 255);
        at(i, 0) = iclip(m4 - delta, 0, 255);
        int tc2 = tc >> 1;
        if (filter_p) {
          int d1 = iclip((((m1 + m3 + 1) >> 1) - m2 + delta) >> 1, -tc2, tc2);
          at(i, -2) = iclip(m2 + d1, 0, 255);
        }
        if (filter_q) {
          int d2 = iclip((((m6 + m4 + 1) >> 1) - m5 - delta) >> 1, -tc2, tc2);
          at(i, 1) = iclip(m5 + d2, 0, 255);
        }
      }
    }
  }
}

}  // namespace

extern "C" int deblock_luma_native(int32_t* plane, int h, int w,
                                   const int32_t* tu_map, int uw, int qp) {
  int idx_tc = iclip(qp + 2, 0, 53);
  int idx_b = iclip(qp, 0, 51);
  int tc = kTcTable[idx_tc];
  int beta = kBetaTable[idx_b];
  if (beta == 0) return 0;
  // Vertical edges (filter across columns) over the whole picture first.
  for (int x = 8; x < w; x += 8) {
    int ux = x / 4;
    for (int y0 = 0; y0 + 3 < h; y0 += 4) {
      int uy = y0 / 4;
      if (tu_map[uy * uw + ux - 1] == tu_map[uy * uw + ux]) continue;
      filter_segment_luma(plane + y0 * w + x, w, 1, tc, beta);
    }
  }
  for (int y = 8; y < h; y += 8) {
    int uy = y / 4;
    for (int x0 = 0; x0 + 3 < w; x0 += 4) {
      int ux = x0 / 4;
      if (tu_map[(uy - 1) * uw + ux] == tu_map[uy * uw + ux]) continue;
      filter_segment_luma(plane + y * w + x0, 1, w, tc, beta);
    }
  }
  return 0;
}

extern "C" int deblock_chroma_native(int32_t* plane, int hc, int wc,
                                     const int32_t* tu_map_luma, int uw,
                                     int qp_c) {
  int idx_tc = iclip(qp_c + 2, 0, 53);
  int tc = kTcTable[idx_tc];
  if (tc == 0) return 0;
  auto filter_pair = [&](int32_t& p0r, int32_t& q0r, int p1, int q1) {
    int p0 = p0r, q0 = q0r;
    int delta = (((q0 - p0) << 2) + p1 - q1 + 4) >> 3;
    delta = iclip(delta, -tc, tc);
    p0r = iclip(p0 + delta, 0, 255);
    q0r = iclip(q0 - delta, 0, 255);
  };
  for (int xc = 8; xc < wc; xc += 8) {
    int ux = (2 * xc) / 4;
    for (int y0 = 0; y0 + 1 < hc; y0 += 2) {
      int uy = (2 * y0) / 4;
      if (tu_map_luma[uy * uw + ux - 1] == tu_map_luma[uy * uw + ux]) continue;
      for (int i = 0; i < 2; ++i)
        filter_pair(plane[(y0 + i) * wc + xc - 1], plane[(y0 + i) * wc + xc],
                    plane[(y0 + i) * wc + xc - 2],
                    plane[(y0 + i) * wc + xc + 1]);
    }
  }
  for (int yc = 8; yc < hc; yc += 8) {
    int uy = (2 * yc) / 4;
    for (int x0 = 0; x0 + 1 < wc; x0 += 2) {
      int ux = (2 * x0) / 4;
      if (tu_map_luma[(uy - 1) * uw + ux] == tu_map_luma[uy * uw + ux])
        continue;
      for (int i = 0; i < 2; ++i)
        filter_pair(plane[(yc - 1) * wc + x0 + i], plane[yc * wc + x0 + i],
                    plane[(yc - 2) * wc + x0 + i],
                    plane[(yc + 1) * wc + x0 + i]);
    }
  }
  return 0;
}

}  // extern "C"
