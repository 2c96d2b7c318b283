// Single-core C++ reference carver implementing SPEC.md exactly.
//
// Role: the liblqr stand-in (liblqr is not installable in this environment).
// It serves as (a) the CPU-baseline timing target for bench.py ("seams/sec
// single core", the BASELINE.md >=50x comparison point) and (b) a second,
// independent implementation cross-checked bit-for-bit against the NumPy
// oracle (lqr_tpu/oracle.py) in tests.
//
// Numerical contract: float32 arithmetic with the pinned op order of
// SPEC.md §1-§5 (reciprocal-multiply constants, rank-ordered strict-min tie
// breaking, rigidity |dx|^1.5/H rounded to f32 once per dx). Compile WITHOUT
// -ffast-math and without FMA codegen (-O2, baseline x86-64) so every op is
// IEEE exactly-rounded like NumPy/XLA-CPU.
//
// Build: g++ -O2 -shared -fPIC -o liblqr_ref.so lqr_ref.cpp

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <vector>
#include <chrono>

namespace {

constexpr float kInf = __builtin_inff();

struct Carver {
  int H, W, C;          // W = current width
  int W0;               // reference width (row stride of vs/colmap)
  std::vector<uint8_t> img;   // [H, W0, C], compacted to W
  std::vector<float> bias;    // [H, W0]
  std::vector<float> rig;     // [H, W0]
  std::vector<int> colmap;    // [H, W0] compacted col -> reference col
  bool has_bias = false, has_rig = false;
  int delta_x = 1, nrg = 0, ssf = 2;
};

inline bool has_alpha(int c) { return c == 2 || c == 4; }

// SPEC.md §1 readers; pinned op order.
inline float bright_px(const uint8_t* p, int C) {
  int nc = C - (has_alpha(C) ? 1 : 0);
  float s = 0.f;
  for (int k = 0; k < nc; k++) s = s + (float)p[k];
  s = s * (float)(1.0 / (255.0 * nc));
  if (has_alpha(C)) s = s * ((float)p[C - 1] * (float)(1.0 / 255.0));
  return s;
}

inline float luma_px(const uint8_t* p, int C) {
  int nc = C - (has_alpha(C) ? 1 : 0);
  float s;
  if (nc >= 3) {
    s = (float)0.2126 * (float)p[0];
    s = s + (float)0.7152 * (float)p[1];
    s = s + (float)0.0722 * (float)p[2];
    s = s * (float)(1.0 / 255.0);
  } else {
    s = (float)p[0] * (float)(1.0 / 255.0);
  }
  if (has_alpha(C)) s = s * ((float)p[C - 1] * (float)(1.0 / 255.0));
  return s;
}

// Full-image reader pass -> B [H, W]
void reader_map(const Carver& cv, std::vector<float>& B) {
  bool use_luma = cv.nrg >= 3 && cv.nrg <= 5;
  B.resize((size_t)cv.H * cv.W);
  for (int y = 0; y < cv.H; y++) {
    const uint8_t* row = &cv.img[(size_t)y * cv.W0 * cv.C];
    float* b = &B[(size_t)y * cv.W];
    for (int x = 0; x < cv.W; x++)
      b[x] = use_luma ? luma_px(row + (size_t)x * cv.C, cv.C)
                      : bright_px(row + (size_t)x * cv.C, cv.C);
  }
}

// SPEC.md §2 energy. e: [H, W]
void energy_map(const Carver& cv, std::vector<float>& e) {
  int H = cv.H, W = cv.W;
  e.assign((size_t)H * W, 0.f);
  if (cv.nrg == 6) return;  // NULL
  static thread_local std::vector<float> B;
  reader_map(cv, B);
  bool want_y = (cv.nrg == 1 || cv.nrg == 2 || cv.nrg == 4 || cv.nrg == 5);
  bool is_norm = (cv.nrg == 2 || cv.nrg == 5);
  for (int y = 0; y < H; y++) {
    const float* b = &B[(size_t)y * W];
    const float* bu = &B[(size_t)(y > 0 ? y - 1 : 0) * W];
    const float* bd = &B[(size_t)(y < H - 1 ? y + 1 : H - 1) * W];
    float* er = &e[(size_t)y * W];
    for (int x = 0; x < W; x++) {
      int xm = x > 0 ? x - 1 : 0;
      int xp = x < W - 1 ? x + 1 : W - 1;
      float gx = (b[xp] - b[xm]) * 0.5f;
      if (!want_y) { er[x] = std::fabs(gx); continue; }
      float gy = (bd[x] - bu[x]) * 0.5f;
      if (is_norm) er[x] = std::sqrt(gx * gx + gy * gy);
      else er[x] = (std::fabs(gx) + std::fabs(gy)) * 0.5f;
    }
  }
}

// SPEC.md §5: rank-ordered candidate list for a side preference.
void dx_order(int delta_x, bool pref_left, std::vector<int>& order) {
  order.clear();
  order.push_back(0);
  for (int m = 1; m <= delta_x; m++) {
    if (pref_left) { order.push_back(-m); order.push_back(m); }
    else { order.push_back(m); order.push_back(-m); }
  }
}

// One seam on the current (compacted) image. seam: [H] compacted coords.
void find_seam(const Carver& cv, const std::vector<float>& e_tot,
               bool pref_left, std::vector<int>& seam) {
  int H = cv.H, W = cv.W;
  static thread_local std::vector<float> Mp, Mn;
  static thread_local std::vector<int8_t> bp;
  Mp.resize(W); Mn.resize(W);
  bp.assign((size_t)H * W, 0);
  for (int x = 0; x < W; x++) Mp[x] = e_tot[x];
  std::vector<int> order;
  dx_order(cv.delta_x, pref_left, order);
  std::vector<float> rigc(order.size());
  for (size_t j = 0; j < order.size(); j++)
    rigc[j] = (float)(std::pow((double)std::abs(order[j]), 1.5) / (double)H);
  for (int y = 1; y < H; y++) {
    const float* er = &e_tot[(size_t)y * W];
    const float* rr = cv.has_rig ? &cv.rig[(size_t)y * cv.W0] : nullptr;
    int8_t* bpr = &bp[(size_t)y * W];
    for (int x = 0; x < W; x++) {
      float best = kInf;
      int8_t bb = 0;
      for (size_t j = 0; j < order.size(); j++) {
        int dx = order[j];
        int src = x + dx;
        if (src < 0 || src >= W) continue;
        float c = Mp[src];
        if (cv.has_rig && dx != 0) c = c + rr[x] * rigc[j];
        if (c < best) { best = c; bb = (int8_t)dx; }
      }
      Mn[x] = er[x] + best;
      bpr[x] = bb;
    }
    std::swap(Mp, Mn);
  }
  // start point: min of last row; ties leftmost (pref_left) else rightmost
  float m = kInf;
  for (int x = 0; x < W; x++) m = Mp[x] < m ? Mp[x] : m;
  int x0 = -1;
  if (pref_left) {
    for (int x = 0; x < W; x++) if (Mp[x] == m) { x0 = x; break; }
  } else {
    for (int x = W - 1; x >= 0; x--) if (Mp[x] == m) { x0 = x; break; }
  }
  seam.resize(H);
  int x = x0;
  seam[H - 1] = x;
  for (int y = H - 1; y > 0; y--) {
    x = x + bp[(size_t)y * W + x];
    seam[y - 1] = x;
  }
}

template <typename T>
void remove_lane(T* row, int stride, int W, int s, int nelem) {
  std::memmove(row + (size_t)s * nelem, row + (size_t)(s + 1) * nelem,
               (size_t)(W - 1 - s) * nelem * sizeof(T));
  (void)stride;
}

// Carve n seams; record into vs (reference coords, 1-based order starting
// at start_seam).
void carve(Carver& cv, int n, int start_seam, int* vs) {
  static thread_local std::vector<float> e;
  std::vector<int> seam;
  for (int i = 0; i < n; i++) {
    int s = start_seam + i;
    bool pref_left =
        cv.ssf <= 0 ? true : (((s - 1) / cv.ssf) % 2 == 0);
    energy_map(cv, e);
    if (cv.has_bias) {
      for (int y = 0; y < cv.H; y++) {
        const float* br = &cv.bias[(size_t)y * cv.W0];
        float* er = &e[(size_t)y * cv.W];
        for (int x = 0; x < cv.W; x++) er[x] = er[x] + br[x];
      }
    }
    find_seam(cv, e, pref_left, seam);
    for (int y = 0; y < cv.H; y++) {
      int sx = seam[y];
      vs[(size_t)y * cv.W0 + cv.colmap[(size_t)y * cv.W0 + sx]] = s;
      remove_lane(&cv.img[(size_t)y * cv.W0 * cv.C], cv.W0, cv.W, sx, cv.C);
      remove_lane(&cv.colmap[(size_t)y * cv.W0], cv.W0, cv.W, sx, 1);
      if (cv.has_bias)
        remove_lane(&cv.bias[(size_t)y * cv.W0], cv.W0, cv.W, sx, 1);
      if (cv.has_rig)
        remove_lane(&cv.rig[(size_t)y * cv.W0], cv.W0, cv.W, sx, 1);
    }
    cv.W -= 1;
  }
}

void init_carver(Carver& cv, const uint8_t* img, int H, int W, int C,
                 const float* bias, const float* rig, int delta_x, int nrg,
                 int ssf) {
  cv.H = H; cv.W = W; cv.W0 = W; cv.C = C;
  cv.delta_x = delta_x; cv.nrg = nrg; cv.ssf = ssf;
  cv.img.assign(img, img + (size_t)H * W * C);
  cv.colmap.resize((size_t)H * W);
  for (int y = 0; y < H; y++)
    for (int x = 0; x < W; x++) cv.colmap[(size_t)y * W + x] = x;
  cv.has_bias = bias != nullptr;
  cv.has_rig = rig != nullptr;
  if (bias) cv.bias.assign(bias, bias + (size_t)H * W);
  if (rig) cv.rig.assign(rig, rig + (size_t)H * W);
}

}  // namespace

extern "C" {

// Carve n_seams; writes the visibility map ([H, W] int32, 0 = kept).
int lqr_ref_carve(const uint8_t* img, int H, int W, int C, const float* bias,
                  const float* rig, int delta_x, int nrg, int ssf,
                  int n_seams, int* vs_out) {
  if (n_seams >= W) return -1;
  Carver cv;
  init_carver(cv, img, H, W, C, bias, rig, delta_x, nrg, ssf);
  std::memset(vs_out, 0, (size_t)H * W * sizeof(int));
  carve(cv, n_seams, 1, vs_out);
  return 0;
}

// Materialize width w (SPEC.md §6) from (img, vs). out: [H, w, C].
int lqr_ref_materialize(const uint8_t* img, const int* vs, int H, int W,
                        int C, int w, uint8_t* out) {
  if (w <= W) {
    int k = W - w;
    for (int y = 0; y < H; y++) {
      const uint8_t* src = img + (size_t)y * W * C;
      const int* vr = vs + (size_t)y * W;
      uint8_t* dst = out + (size_t)y * w * C;
      int j = 0;
      for (int x = 0; x < W; x++) {
        if (vr[x] == 0 || vr[x] > k) {
          std::memcpy(dst + (size_t)j * C, src + (size_t)x * C, C);
          j++;
        }
      }
      if (j != w) return -1;
    }
    return 0;
  }
  int k = w - W;
  for (int y = 0; y < H; y++) {
    const uint8_t* src = img + (size_t)y * W * C;
    const int* vr = vs + (size_t)y * W;
    uint8_t* dst = out + (size_t)y * w * C;
    int j = 0;
    for (int x = 0; x < W; x++) {
      std::memcpy(dst + (size_t)j * C, src + (size_t)x * C, C);
      j++;
      if (vr[x] >= 1 && vr[x] <= k) {
        const uint8_t* nxt = src + (size_t)(x < W - 1 ? x + 1 : x) * C;
        for (int c = 0; c < C; c++)
          dst[(size_t)j * C + c] =
              (uint8_t)(((uint16_t)src[(size_t)x * C + c] +
                         (uint16_t)nxt[c]) / 2);
        j++;
      }
    }
    if (j != w) return -1;
  }
  return 0;
}

// Timed carve for the CPU baseline: returns seconds elapsed (single core).
double lqr_ref_bench(const uint8_t* img, int H, int W, int C, int delta_x,
                     int nrg, int ssf, int n_seams) {
  Carver cv;
  init_carver(cv, img, H, W, C, nullptr, nullptr, delta_x, nrg, ssf);
  std::vector<int> vs((size_t)H * W, 0);
  auto t0 = std::chrono::steady_clock::now();
  carve(cv, n_seams, 1, vs.data());
  auto t1 = std::chrono::steady_clock::now();
  return std::chrono::duration<double>(t1 - t0).count();
}

}  // extern "C"
