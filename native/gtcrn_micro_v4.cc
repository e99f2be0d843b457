// GTCRN-Micro full-integer per-channel engine (GTM8 v4).
//
// r4's verdict named the gap: the best-quality quantized grid (per-lane
// activation scales, GTM8 v3) ran fp32 MACs (native/gtcrn_micro_pc.cc)
// because a per-lane scale inside a mixing conv's contraction blocks the
// single-rescale integer epilogue.  v4 closes it the TFLite way, extended
// to per-channel inputs: io/export_native.py quantizes every weight slot
// on its act-scale-FOLDED tensor (w * s_in along the in-lane axis), so
//
//   y_o = b_o + s~_o * sum_i W~[o,i] * (q_i - z_i)
//
// is a pure integer MAC with one float rescale per output, where s~_o is
// the folded per-out-channel weight scale (carries both the act and weight
// scales) and z_i are the boundary's per-lane zero points.  Position-
// independent taps fold the zero offset out of the inner loop as
// sum_i W~[o,i] * z_i (exact in int32); boundary-clipped freq convs carry a
// per-position z-weighted tap sum, mirroring the per-tensor engine's wsum
// bookkeeping (native/gtcrn_micro_q.cc).
//
// Numerics == quant.ptq.QuantizedModel(v4=True) up to float associativity
// (tests/runtime).  Reference deployment analog: the full-integer TFLM
// runner, esp32_s3/main/main.cc:85-117.

#include <cmath>
#include <cstring>
#include <fstream>
#include <stdexcept>
#include <string>

#include "gtcrn_micro.h"

namespace gtcrn {

namespace {

constexpr uint32_t kMagicQ = 0x47544D38;  // "GTM8"
constexpr int kFAcc = kFErb + 3;

float Prelu(float x, float a) { return x > 0 ? x : a * x; }

inline int32_t ZLane(const ActQV& q, int c) {
  return q.zero.size() == 1 ? q.zero[0] : q.zero[c];
}
inline float SLane(const ActQV& q, int c) {
  return q.scale.size() == 1 ? q.scale[0] : q.scale[c];
}

// quantize one [C][F] activation block: per-LANE scale/zero, nearbyint
// (round-half-even, matching jnp.round), clamp to the boundary's grid.
template <typename TAct>
void QuantRows(const float* x, int c_n, int f_n, const ActQV& q, TAct* out) {
  for (int c = 0; c < c_n; ++c) {
    const float s = SLane(q, c);
    const float z = static_cast<float>(ZLane(q, c));
    const float* row = x + c * f_n;
    TAct* orow = out + c * f_n;
    for (int f = 0; f < f_n; ++f) {
      float v = std::nearbyint(row[f] / s) + z;
      if (v < q.qlo) v = q.qlo;
      if (v > q.qhi) v = q.qhi;
      orow[f] = static_cast<TAct>(v);
    }
  }
}

// ---------------------------------------------------------------------------
// loading: GTM8 v4 (io/export_native.py, act_bits=2 header)
// ---------------------------------------------------------------------------

struct Reader {
  std::ifstream f;
  explicit Reader(const std::string& path) : f(path, std::ios::binary) {
    if (!f) throw std::runtime_error("cannot open " + path);
  }
  template <typename T>
  T Scalar() {
    T v{};
    f.read(reinterpret_cast<char*>(&v), sizeof(T));
    if (!f) throw std::runtime_error("truncated GTM8 file");
    return v;
  }
  void Slot(Tensor* t, QTensor* q) {
    uint32_t rank = Scalar<uint32_t>();
    if (rank > 8) throw std::runtime_error("invalid GTM8: rank > 8");
    std::vector<uint32_t> dims(rank);
    for (auto& d : dims) d = Scalar<uint32_t>();
    size_t n = 1;
    for (auto d : dims) {
      if (d == 0 || d > (1u << 20))
        throw std::runtime_error("invalid GTM8: bad tensor dim");
      n *= d;
    }
    if (n > (1u << 20))
      throw std::runtime_error("invalid GTM8: tensor too large");
    uint32_t dtype = Scalar<uint32_t>();
    if (dtype == 0) {
      if (!t) throw std::runtime_error("GTM8: unexpected fp32 slot");
      t->dims = dims;
      t->data.resize(n);
      f.read(reinterpret_cast<char*>(t->data.data()), 4 * n);
    } else if (dtype == 1) {
      if (!q) throw std::runtime_error("GTM8: unexpected int8 slot");
      q->dims = dims;
      uint32_t n_ch = Scalar<uint32_t>();
      if (n_ch == 0 || n_ch > (1u << 16))
        throw std::runtime_error("invalid GTM8: bad channel count");
      q->scale.resize(n_ch);
      f.read(reinterpret_cast<char*>(q->scale.data()), 4 * n_ch);
      q->data.resize(n);
      f.read(reinterpret_cast<char*>(q->data.data()), n);
    } else {
      throw std::runtime_error("GTM8: unknown slot dtype");
    }
    if (!f) throw std::runtime_error("truncated GTM8 file");
  }
  Tensor F32() {
    Tensor t;
    Slot(&t, nullptr);
    return t;
  }
  QTensor I8() {
    QTensor q;
    Slot(nullptr, &q);
    return q;
  }
  float Alpha() { return F32().data.at(0); }
};

GTConvV4 ReadGtconvV4(Reader& r) {
  GTConvV4 g;
  g.pw1_w = r.I8();
  g.pw1_b = r.F32();
  g.a1 = r.Alpha();
  g.dw_w = r.I8();
  g.dw_b = r.F32();
  g.a2 = r.Alpha();
  g.pw2_w = r.I8();
  g.pw2_b = r.F32();
  g.tra_dw = r.I8();
  g.tra_db = r.F32();
  g.tra_pw = r.I8();
  g.tra_pb = r.F32();
  return g;
}

TcnV4 ReadTcnV4(Reader& r) {
  TcnV4 t;
  t.pw1_w = r.I8();
  t.pw1_b = r.F32();
  t.a1 = r.Alpha();
  t.dw_w = r.I8();
  t.dw_b = r.F32();
  t.a2 = r.Alpha();
  t.pw3_w = r.I8();
  t.pw3_b = r.F32();
  t.a3 = r.Alpha();
  return t;
}

// ---------------------------------------------------------------------------
// integer kernels (folded weights: rescale = w.scale[co] ONLY; zero offsets
// are per-LANE z-weighted tap sums)
// ---------------------------------------------------------------------------

// pointwise channel mix: pure int32 MACs; the per-co z-weighted weight sum
// is precomputed at load (PrecomputeZ)
template <typename TAct>
void PwV4(const QTensor& w, const Tensor& b, const TAct* qx,
          const int32_t* zoff, int ci_n, int f_n, float* out, int co_n) {
  for (int co = 0; co < co_n; ++co) {
    const int8_t* wr = w.data.data() + co * ci_n;
    int32_t acc[kFAcc];
    std::memset(acc, 0, f_n * sizeof(int32_t));
    for (int ci = 0; ci < ci_n; ++ci) {
      const int32_t wv = wr[ci];
      const TAct* row = qx + ci * f_n;
      for (int f = 0; f < f_n; ++f) {
        acc[f] += wv * static_cast<int32_t>(row[f]);
      }
    }
    const float rescale = w.scale[co];
    float* orow = out + co * f_n;
    for (int f = 0; f < f_n; ++f) {
      orow[f] = b.data[co] + rescale * static_cast<float>(acc[f] - zoff[co]);
    }
  }
}

// (1,5) freq conv stride 2 pad 2 + bias + PReLU, folded int8 (5, Co, Ci)
template <typename TAct>
void Conv5S2V4(const ConvV4& cw, const TAct* qx, int ci_n, int f_in,
               float* out, int co_n, int f_out) {
  const int8_t* w = cw.w.data.data();
  for (int co = 0; co < co_n; ++co) {
    int32_t acc[kFAcc], zsum[kFAcc];
    std::memset(acc, 0, f_out * sizeof(int32_t));
    std::memset(zsum, 0, f_out * sizeof(int32_t));
    for (int k = 0; k < 5; ++k) {
      const int f_lo = k >= 2 ? 0 : 1;
      const int f_hi = std::min(f_out, (f_in - 1 - (k - 2)) / 2 + 1);
      if (f_lo >= f_hi) continue;
      for (int ci = 0; ci < ci_n; ++ci) {
        const int32_t wv = w[(k * co_n + co) * ci_n + ci];
        const TAct* row = qx + ci * f_in;
        for (int f = f_lo; f < f_hi; ++f) {
          acc[f] += wv * static_cast<int32_t>(row[2 * f + k - 2]);
        }
      }
      const int32_t wkz = cw.kz[k * co_n + co];
      for (int f = f_lo; f < f_hi; ++f) zsum[f] += wkz;
    }
    const float rescale = cw.w.scale[co];
    for (int f = 0; f < f_out; ++f) {
      out[co * f_out + f] = Prelu(
          cw.b.data[co] + rescale * static_cast<float>(acc[f] - zsum[f]),
          cw.a);
    }
  }
}

// (1,5) transposed freq conv stride 2 pad 2, folded int8; output-parity
// split as in the per-tensor engine (native/gtcrn_micro_q.cc)
template <typename TAct>
void Deconv5Up2V4(const ConvV4& cw, const TAct* qx, int ci_n, int f_in,
                  float* out, int co_n, bool last_tanh) {
  const int f_out = 2 * f_in - 1;
  const int n_even = f_in;
  const int n_odd = f_in - 1;
  const int8_t* w = cw.w.data.data();
  for (int co = 0; co < co_n; ++co) {
    int32_t ae[kFAcc], ze[kFAcc], ao[kFAcc], zo[kFAcc];
    std::memset(ae, 0, n_even * sizeof(int32_t));
    std::memset(ze, 0, n_even * sizeof(int32_t));
    std::memset(ao, 0, n_odd * sizeof(int32_t));
    std::memset(zo, 0, n_odd * sizeof(int32_t));
    for (int k = 0; k < 5; ++k) {
      const bool even = (k & 1) == 0;
      int32_t* acc = even ? ae : ao;
      int32_t* zs = even ? ze : zo;
      const int di = even ? (k - 2) / 2 : (k - 1) / 2;
      const int j_lo = std::max(0, -di);
      const int j_hi = std::min(even ? n_even : n_odd, f_in - di);
      if (j_lo >= j_hi) continue;
      for (int ci = 0; ci < ci_n; ++ci) {
        const int32_t wv = w[(k * co_n + co) * ci_n + ci];
        const TAct* row = qx + ci * f_in;
        for (int j = j_lo; j < j_hi; ++j) {
          acc[j] += wv * static_cast<int32_t>(row[j + di]);
        }
      }
      const int32_t wkz = cw.kz[k * co_n + co];
      for (int j = j_lo; j < j_hi; ++j) zs[j] += wkz;
    }
    const float rescale = cw.w.scale[co];
    float* orow = out + co * f_out;
    for (int j = 0; j < n_even; ++j) {
      float v = cw.b.data[co] +
                rescale * static_cast<float>(ae[j] - ze[j]);
      orow[2 * j] = last_tanh ? std::tanh(v) : Prelu(v, cw.a);
    }
    for (int j = 0; j < n_odd; ++j) {
      float v = cw.b.data[co] +
                rescale * static_cast<float>(ao[j] - zo[j]);
      orow[2 * j + 1] = last_tanh ? std::tanh(v) : Prelu(v, cw.a);
    }
  }
}

// depthwise 3-tap freq conv row kt of folded int8 (9, C, 1, 1): pure MACs;
// the z-weighted tap sums are precomputed at load (PrecomputeZ) and
// applied once by the caller
template <typename TAct>
void DwFreq3AccV4(const QTensor& w9, int kt, const TAct* tap, int32_t* acc) {
  for (int c = 0; c < kC; ++c) {
    int32_t* arow = acc + c * kFDown;
    const TAct* trow = tap + c * kFDown;
    for (int kf = 0; kf < 3; ++kf) {
      const int f_lo = kf == 0 ? 1 : 0;
      const int f_hi = kf == 2 ? kFDown - 1 : kFDown;
      const int32_t wv = w9.data[(kt * 3 + kf) * kC + c];
      for (int f = f_lo; f < f_hi; ++f) {
        arow[f] += wv * static_cast<int32_t>(trow[f + kf - 1]);
      }
    }
  }
}

// full 3-tap freq conv row kt of folded int8 (3, 3, Co, Ci): pure MACs
// (zero offsets precomputed, see DwFreq3AccV4)
template <typename TAct>
void FullFreq3AccV4(const QTensor& w, int kt, const TAct* tap, int32_t* acc) {
  for (int co = 0; co < kC; ++co) {
    int32_t* arow = acc + co * kFDown;
    for (int kf = 0; kf < 3; ++kf) {
      const int f_lo = kf == 0 ? 1 : 0;
      const int f_hi = kf == 2 ? kFDown - 1 : kFDown;
      for (int ci = 0; ci < kC; ++ci) {
        const int32_t wv = w.data[((kt * 3 + kf) * kC + co) * kC + ci];
        const TAct* trow = tap + ci * kFDown;
        for (int f = f_lo; f < f_hi; ++f) {
          arow[f] += wv * static_cast<int32_t>(trow[f + kf - 1]);
        }
      }
    }
  }
}

template <typename TAct>
void GtconvStepV4(const GTConvV4& g, bool deconv, float* x,
                  std::vector<TAct>& dw_ring, std::vector<TAct>& tra_ring,
                  int t) {
  const int frame = kC * kFDown;
  TAct qa[kH * kFDown];
  QuantRows(x, kH, kFDown, g.pw1_in, qa);
  float h[kC * kFDown];
  PwV4(g.pw1_w, g.pw1_b, qa, g.pw1_zoff.data(), kH, kFDown, h, kC);
  for (int i = 0; i < frame; ++i) h[i] = Prelu(h[i], g.a1);

  TAct qh[kC * kFDown];
  QuantRows(h, kC, kFDown, g.dw_in, qh);
  int32_t acc[kC * kFDown];
  std::memset(acc, 0, sizeof(acc));
  const TAct* tap0 = dw_ring.data() + (t % 2) * frame;
  const TAct* tap1 = dw_ring.data() + ((t + 1) % 2) * frame;
  if (deconv) {
    FullFreq3AccV4(g.dw_w, 0, tap0, acc);
    FullFreq3AccV4(g.dw_w, 1, tap1, acc);
    FullFreq3AccV4(g.dw_w, 2, qh, acc);
  } else {
    DwFreq3AccV4(g.dw_w, 0, tap0, acc);
    DwFreq3AccV4(g.dw_w, 1, tap1, acc);
    DwFreq3AccV4(g.dw_w, 2, qh, acc);
  }
  std::memcpy(dw_ring.data() + (t % 2) * frame, qh, sizeof(qh));
  float y[kC * kFDown];
  for (int c = 0; c < kC; ++c) {
    const float rescale = g.dw_w.scale[c];
    // boundary-clipped taps: the full-range z sum applies everywhere,
    // minus the clipped kf==0 tap at f==0 / kf==2 tap at f==kFDown-1
    int32_t* arow = acc + c * kFDown;
    for (int f = 0; f < kFDown; ++f) arow[f] -= g.dw_zfull[c];
    arow[0] += g.dw_z0[c];
    arow[kFDown - 1] += g.dw_z32[c];
    for (int f = 0; f < kFDown; ++f) {
      int i = c * kFDown + f;
      y[i] = Prelu(g.dw_b.data[c] + rescale * static_cast<float>(acc[i]),
                   g.a2);
    }
  }

  TAct qy[kC * kFDown];
  QuantRows(y, kC, kFDown, g.pw2_in, qy);
  float h3[kH * kFDown];
  PwV4(g.pw2_w, g.pw2_b, qy, g.pw2_zoff.data(), kC, kFDown, h3, kH);

  float e[kH];
  for (int c = 0; c < kH; ++c) {
    float s = 0.f;
    for (int f = 0; f < kFDown; ++f)
      s += h3[c * kFDown + f] * h3[c * kFDown + f];
    e[c] = s / kFDown;
  }
  TAct qe[kH];
  QuantRows(e, kH, 1, g.energy, qe);
  const TAct* e0 = tra_ring.data() + (t % 2) * kH;
  const TAct* e1 = tra_ring.data() + ((t + 1) % 2) * kH;
  float yg[kH];
  for (int c = 0; c < kH; ++c) {
    int32_t acc_e =
        static_cast<int32_t>(g.tra_dw.data[0 * kH + c]) *
            static_cast<int32_t>(e0[c]) +
        static_cast<int32_t>(g.tra_dw.data[1 * kH + c]) *
            static_cast<int32_t>(e1[c]) +
        static_cast<int32_t>(g.tra_dw.data[2 * kH + c]) *
            static_cast<int32_t>(qe[c]) -
        g.tra_dw_zoff[c];
    yg[c] = g.tra_db.data[c] +
            g.tra_dw.scale[c] * static_cast<float>(acc_e);
  }
  std::memcpy(tra_ring.data() + (t % 2) * kH, qe, sizeof(qe));
  TAct qyg[kH];
  QuantRows(yg, kH, 1, g.gate_in, qyg);
  float gate[kH];
  for (int c = 0; c < kH; ++c) {
    int32_t acc_g = -g.tra_pw_zoff[c];
    for (int i = 0; i < kH; ++i) {
      acc_g += static_cast<int32_t>(g.tra_pw.data[c * kH + i]) *
               static_cast<int32_t>(qyg[i]);
    }
    float v = g.tra_pb.data[c] +
              g.tra_pw.scale[c] * static_cast<float>(acc_g);
    gate[c] = 1.f / (1.f + std::exp(-v));
  }

  float out[kC * kFDown];
  for (int c = 0; c < kH; ++c) {
    for (int f = 0; f < kFDown; ++f) {
      out[(2 * c) * kFDown + f] = h3[c * kFDown + f] * gate[c];
      out[(2 * c + 1) * kFDown + f] = x[(kH + c) * kFDown + f];
    }
  }
  std::memcpy(x, out, sizeof(out));
}

template <typename TAct>
void TcnStepV4(const TcnV4& w, int d, float* x, std::vector<TAct>& ring,
               int t) {
  const int frame = kC * kFDown;
  const int L = 2 * d;
  TAct qx[kC * kFDown];
  QuantRows(x, kC, kFDown, w.pw1_in, qx);
  float h[kC * kFDown];
  PwV4(w.pw1_w, w.pw1_b, qx, w.pw1_zoff.data(), kC, kFDown, h, kC);
  for (int i = 0; i < frame; ++i) h[i] = Prelu(h[i], w.a1);

  TAct qh[kC * kFDown];
  QuantRows(h, kC, kFDown, w.dw_in, qh);
  const TAct* tap0 = ring.data() + (t % L) * frame;        // x_{t-2d}
  const TAct* tap1 = ring.data() + ((t + d) % L) * frame;  // x_{t-d}
  float y[kC * kFDown];
  for (int c = 0; c < kC; ++c) {
    const int32_t zoff = w.dw_zoff[c];
    const float rescale = w.dw_w.scale[c];
    const int32_t w0 = w.dw_w.data[0 * kC + c];
    const int32_t w1 = w.dw_w.data[1 * kC + c];
    const int32_t w2 = w.dw_w.data[2 * kC + c];
    for (int f = 0; f < kFDown; ++f) {
      int i = c * kFDown + f;
      int32_t acc = w0 * static_cast<int32_t>(tap0[i]) +
                    w1 * static_cast<int32_t>(tap1[i]) +
                    w2 * static_cast<int32_t>(qh[i]) - zoff;
      y[i] = Prelu(w.dw_b.data[c] + rescale * static_cast<float>(acc), w.a2);
    }
  }
  std::memcpy(ring.data() + (t % L) * frame, qh, sizeof(qh));

  TAct qy[kC * kFDown];
  QuantRows(y, kC, kFDown, w.pw3_in, qy);
  float h3[kC * kFDown];
  PwV4(w.pw3_w, w.pw3_b, qy, w.pw3_zoff.data(), kC, kFDown, h3, kC);
  for (int i = 0; i < frame; ++i) x[i] = Prelu(h3[i] + x[i], w.a3);
}

// ---------------------------------------------------------------------------
// zero-offset precomputation: weights and per-lane zeros are both artifact
// constants, so every z-weighted tap sum the kernels need is computed once
// at load and the hot loops stay pure integer MACs
// ---------------------------------------------------------------------------

std::vector<int32_t> PwZoff(const QTensor& w, const ActQV& aq, int co_n,
                            int ci_n) {
  std::vector<int32_t> z(co_n);
  for (int co = 0; co < co_n; ++co) {
    int32_t s = 0;
    for (int ci = 0; ci < ci_n; ++ci) {
      s += static_cast<int32_t>(w.data[co * ci_n + ci]) * ZLane(aq, ci);
    }
    z[co] = s;
  }
  return z;
}

std::vector<int32_t> ConvKz(const QTensor& w, const ActQV& aq) {
  const int co_n = static_cast<int>(w.dims[1]);
  const int ci_n = static_cast<int>(w.dims[2]);
  std::vector<int32_t> kz(5 * co_n);
  for (int k = 0; k < 5; ++k) {
    for (int co = 0; co < co_n; ++co) {
      int32_t s = 0;
      for (int ci = 0; ci < ci_n; ++ci) {
        s += static_cast<int32_t>(w.data[(k * co_n + co) * ci_n + ci]) *
             ZLane(aq, ci);
      }
      kz[k * co_n + co] = s;
    }
  }
  return kz;
}

void PrecomputeGtconvZ(GTConvV4& g, bool deconv) {
  g.pw1_zoff = PwZoff(g.pw1_w, g.pw1_in, kC, kH);
  g.pw2_zoff = PwZoff(g.pw2_w, g.pw2_in, kH, kC);
  g.tra_pw_zoff = PwZoff(g.tra_pw, g.gate_in, kH, kH);
  g.tra_dw_zoff.resize(kH);
  for (int c = 0; c < kH; ++c) {
    int32_t s = 0;
    for (int k = 0; k < 3; ++k) {
      s += static_cast<int32_t>(g.tra_dw.data[k * kH + c]);
    }
    g.tra_dw_zoff[c] = s * ZLane(g.energy, c);
  }
  g.dw_zfull.assign(kC, 0);
  g.dw_z0.assign(kC, 0);
  g.dw_z32.assign(kC, 0);
  for (int c = 0; c < kC; ++c) {
    for (int kt = 0; kt < 3; ++kt) {
      for (int kf = 0; kf < 3; ++kf) {
        int32_t s = 0;
        if (deconv) {  // (3, 3, Co, Ci): z varies with ci
          for (int ci = 0; ci < kC; ++ci) {
            s += static_cast<int32_t>(
                     g.dw_w.data[((kt * 3 + kf) * kC + c) * kC + ci]) *
                 ZLane(g.dw_in, ci);
          }
        } else {  // (9, C, 1, 1): the lane is the channel
          s = static_cast<int32_t>(g.dw_w.data[(kt * 3 + kf) * kC + c]) *
              ZLane(g.dw_in, c);
        }
        g.dw_zfull[c] += s;
        if (kf == 0) g.dw_z0[c] += s;
        if (kf == 2) g.dw_z32[c] += s;
      }
    }
  }
}

void PrecomputeZ(WeightsV4& w) {
  w.en0.kz = ConvKz(w.en0.w, w.en0.in);
  w.en1.kz = ConvKz(w.en1.w, w.en1.in);
  w.de3.kz = ConvKz(w.de3.w, w.de3.in);
  w.de4.kz = ConvKz(w.de4.w, w.de4.in);
  for (auto& g : w.enc) PrecomputeGtconvZ(g, /*deconv=*/false);
  for (auto& g : w.dec) PrecomputeGtconvZ(g, /*deconv=*/true);
  for (auto& t : w.tcn) {
    t.pw1_zoff = PwZoff(t.pw1_w, t.pw1_in, kC, kC);
    t.pw3_zoff = PwZoff(t.pw3_w, t.pw3_in, kC, kC);
    t.dw_zoff.resize(kC);
    for (int c = 0; c < kC; ++c) {
      int32_t s = 0;
      for (int k = 0; k < 3; ++k) {
        s += static_cast<int32_t>(t.dw_w.data[k * kC + c]);
      }
      t.dw_zoff[c] = s * ZLane(t.dw_in, c);
    }
  }
}

}  // namespace

WeightsV4 WeightsV4::Load(const std::string& path) {
  Reader r(path);
  uint32_t magic = r.Scalar<uint32_t>();
  uint32_t count = r.Scalar<uint32_t>();
  if (magic != kMagicQ) throw std::runtime_error("bad GTM8 magic");
  if (count != 158) {
    throw std::runtime_error("GTM8 has " + std::to_string(count) +
                             " tensors, expected 158 (packing ABI drift?)");
  }

  WeightsV4 w;
  w.bm_w = r.F32();
  w.bs_w = r.F32();
  w.sfe_w = r.I8();
  for (ConvV4* cw : {&w.en0, &w.en1}) {
    cw->w = r.I8();
    cw->b = r.F32();
    cw->a = r.Alpha();
  }
  for (auto& g : w.enc) g = ReadGtconvV4(r);
  for (auto& t : w.tcn) t = ReadTcnV4(r);
  for (auto& g : w.dec) g = ReadGtconvV4(r);
  w.de3.w = r.I8();
  w.de3.b = r.F32();
  w.de3.a = r.Alpha();
  w.de4.w = r.I8();
  w.de4.b = r.F32();

  uint32_t act_bits = r.Scalar<uint32_t>();
  if (act_bits != 2) {
    throw std::runtime_error(
        "GTM8 artifact has act_bits=" + std::to_string(act_bits) +
        "; the v4 integer per-channel engine expects act_bits=2 -- use the "
        "int8/int16 engines for v1/v2 and the pc engine for v3");
  }
  uint32_t n_act = r.Scalar<uint32_t>();
  if (n_act != 59) {
    throw std::runtime_error("GTM8 has " + std::to_string(n_act) +
                             " act qparams, expected 59");
  }
  struct SlotRef {
    ActQV* q;
    uint32_t lanes;
  };
  SlotRef slots[59];
  int i = 0;
  slots[i++] = {&w.sfe_in, 3};
  slots[i++] = {&w.en0.in, 3};
  slots[i++] = {&w.en1.in, 16};
  for (auto& g : w.enc) {
    slots[i++] = {&g.pw1_in, 8};
    slots[i++] = {&g.dw_in, 16};
    slots[i++] = {&g.pw2_in, 16};
    slots[i++] = {&g.energy, 8};
    slots[i++] = {&g.gate_in, 8};
  }
  for (auto& t : w.tcn) {
    slots[i++] = {&t.pw1_in, 16};
    slots[i++] = {&t.dw_in, 16};
    slots[i++] = {&t.pw3_in, 16};
  }
  for (auto& g : w.dec) {
    slots[i++] = {&g.pw1_in, 8};
    slots[i++] = {&g.dw_in, 16};
    slots[i++] = {&g.pw2_in, 16};
    slots[i++] = {&g.energy, 8};
    slots[i++] = {&g.gate_in, 8};
  }
  slots[i++] = {&w.de3.in, 16};
  slots[i++] = {&w.de4.in, 16};
  w.max_bits = 8;
  for (int j = 0; j < 59; ++j) {
    uint32_t bits = r.Scalar<uint32_t>();
    if (bits != 8 && bits != 16) {
      throw std::runtime_error("GTM8 v4: bad per-boundary act bits " +
                               std::to_string(bits));
    }
    if (bits > w.max_bits) w.max_bits = bits;
    uint32_t lanes = r.Scalar<uint32_t>();
    if (lanes != 1 && lanes != slots[j].lanes) {
      throw std::runtime_error(
          "GTM8 v4: boundary " + std::to_string(j) + " has " +
          std::to_string(lanes) + " lanes, expected " +
          std::to_string(slots[j].lanes));
    }
    ActQV a;
    a.scale.resize(lanes);
    r.f.read(reinterpret_cast<char*>(a.scale.data()), 4 * lanes);
    a.zero.resize(lanes);
    r.f.read(reinterpret_cast<char*>(a.zero.data()), 4 * lanes);
    if (!r.f) throw std::runtime_error("truncated GTM8 file");
    a.qlo = bits == 8 ? -128.f : -32768.f;
    a.qhi = bits == 8 ? 127.f : 32767.f;
    *slots[j].q = a;
  }
  PrecomputeZ(w);
  return w;
}

template <typename TAct>
void EngineV4T<TAct>::CheckActBits() const {
  if (w_.max_bits > 8 * sizeof(TAct)) {
    throw std::runtime_error(
        "GTM8 v4 artifact has " + std::to_string(w_.max_bits) +
        "-bit boundaries; this engine stores " +
        std::to_string(8 * sizeof(TAct)) + "-bit activations");
  }
}

template <typename TAct>
void EngineV4T<TAct>::InitState(StreamStateQT<TAct>& st) const {
  // fresh rings hold each boundary's PER-LANE zero point (float 0
  // quantizes to q == zero[c] on lane c)
  auto fill_cf = [](std::vector<TAct>& ring, const ActQV& q, int slabs) {
    ring.assign(static_cast<size_t>(slabs) * kC * kFDown, 0);
    for (int s = 0; s < slabs; ++s) {
      for (int c = 0; c < kC; ++c) {
        TAct z = static_cast<TAct>(ZLane(q, c));
        TAct* row = ring.data() + (static_cast<size_t>(s) * kC + c) * kFDown;
        for (int f = 0; f < kFDown; ++f) row[f] = z;
      }
    }
  };
  for (int i = 0; i < 3; ++i) {
    fill_cf(st.dw_ring[i], w_.enc[i].dw_in, 2);
    fill_cf(st.dw_ring[3 + i], w_.dec[i].dw_in, 2);
    st.tra_ring[i].resize(2 * kH);
    st.tra_ring[3 + i].resize(2 * kH);
    for (int s = 0; s < 2; ++s) {
      for (int c = 0; c < kH; ++c) {
        st.tra_ring[i][s * kH + c] =
            static_cast<TAct>(ZLane(w_.enc[i].energy, c));
        st.tra_ring[3 + i][s * kH + c] =
            static_cast<TAct>(ZLane(w_.dec[i].energy, c));
      }
    }
  }
  for (int i = 0; i < 8; ++i) {
    int d = 1 << (i % 4);
    fill_cf(st.tcn_ring[i], w_.tcn[i].dw_in, 2 * d);
  }
  st.t = 0;
}

template <typename TAct>
void EngineV4T<TAct>::Step(StreamStateQT<TAct>& st, const float* spec_re,
                           const float* spec_im, float* out_re,
                           float* out_im) const {
  const int t = st.t;

  // feature stack [mag, re, im] -> ERB band merge (fp32: not a boundary)
  float feat[3][kFErb];
  const float* chans[3];
  float mag[kFFull];
  for (int f = 0; f < kFFull; ++f) {
    mag[f] = std::sqrt(spec_re[f] * spec_re[f] + spec_im[f] * spec_im[f] +
                       1e-12f);
  }
  chans[0] = mag;
  chans[1] = spec_re;
  chans[2] = spec_im;
  for (int ch = 0; ch < 3; ++ch) {
    for (int f = 0; f < 65; ++f) feat[ch][f] = chans[ch][f];
    for (int j = 0; j < 64; ++j) {
      float acc = 0.f;
      for (int i = 0; i < 192; ++i) {
        acc += w_.bm_w.data[j * 192 + i] * chans[ch][65 + i];
      }
      feat[ch][65 + j] = acc;
    }
  }

  // SFE-Lite depthwise freq conv (folded per-channel int8)
  TAct qfeat[3 * kFErb];
  QuantRows(&feat[0][0], 3, kFErb, w_.sfe_in, qfeat);
  float x129[3 * kFErb];
  for (int c = 0; c < 3; ++c) {
    const int32_t z = ZLane(w_.sfe_in, c);
    const float rescale = w_.sfe_w.scale[c];
    for (int f = 0; f < kFErb; ++f) {
      int32_t acc = 0;
      for (int kf = 0; kf < 3; ++kf) {
        int src = f + kf - 1;
        if (src < 0 || src >= kFErb) continue;
        acc += static_cast<int32_t>(w_.sfe_w.data[kf * 3 + c]) *
               (static_cast<int32_t>(qfeat[c * kFErb + src]) - z);
      }
      x129[c * kFErb + f] = rescale * static_cast<float>(acc);
    }
  }

  // encoder
  TAct q129[3 * kFErb];
  QuantRows(x129, 3, kFErb, w_.en0.in, q129);
  float skip0[kC * 65], skip1[kC * kFDown];
  Conv5S2V4(w_.en0, q129, 3, kFErb, skip0, kC, 65);
  TAct q65[kC * 65];
  QuantRows(skip0, kC, 65, w_.en1.in, q65);
  Conv5S2V4(w_.en1, q65, kC, 65, skip1, kC, kFDown);
  float x[kC * kFDown];
  std::memcpy(x, skip1, sizeof(x));
  float skips[3][kC * kFDown];
  for (int i = 0; i < 3; ++i) {
    GtconvStepV4(w_.enc[i], false, x, st.dw_ring[i], st.tra_ring[i], t);
    std::memcpy(skips[i], x, sizeof(x));
  }

  for (int i = 0; i < 8; ++i) {
    TcnStepV4(w_.tcn[i], 1 << (i % 4), x, st.tcn_ring[i], t);
  }

  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < kC * kFDown; ++j) x[j] += skips[2 - i][j];
    GtconvStepV4(w_.dec[i], true, x, st.dw_ring[3 + i], st.tra_ring[3 + i],
                 t);
  }
  for (int j = 0; j < kC * kFDown; ++j) x[j] += skip1[j];
  TAct q33[kC * kFDown];
  QuantRows(x, kC, kFDown, w_.de3.in, q33);
  float x65[kC * 65];
  Deconv5Up2V4(w_.de3, q33, kC, kFDown, x65, kC, /*last_tanh=*/false);
  for (int j = 0; j < kC * 65; ++j) x65[j] += skip0[j];
  TAct qx65[kC * 65];
  QuantRows(x65, kC, 65, w_.de4.in, qx65);
  float m129[2 * kFErb];
  Deconv5Up2V4(w_.de4, qx65, kC, 65, m129, 2, /*last_tanh=*/true);

  // ERB band split + CRM mask (fp32)
  float m[2][kFFull];
  for (int ch = 0; ch < 2; ++ch) {
    for (int f = 0; f < 65; ++f) m[ch][f] = m129[ch * kFErb + f];
    for (int i = 0; i < 192; ++i) {
      float acc = 0.f;
      for (int j = 0; j < 64; ++j) {
        acc += w_.bs_w.data[i * 64 + j] * m129[ch * kFErb + 65 + j];
      }
      m[ch][65 + i] = acc;
    }
  }
  for (int f = 0; f < kFFull; ++f) {
    out_re[f] = spec_re[f] * m[0][f] - spec_im[f] * m[1][f];
    out_im[f] = spec_im[f] * m[0][f] + spec_re[f] * m[1][f];
  }

  st.t = (t + 1) & 15;
}

template <typename TAct>
void EngineV4T<TAct>::StepBatch(StreamStateQT<TAct>* states,
                                const float* spec_re, const float* spec_im,
                                float* out_re, float* out_im, int n) const {
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (n > 1)
#endif
  for (int i = 0; i < n; ++i) {
    Step(states[i], spec_re + i * kFFull, spec_im + i * kFFull,
         out_re + i * kFFull, out_im + i * kFFull);
  }
}

template <typename TAct>
std::vector<float> EngineV4T<TAct>::EnhanceWav(
    const std::vector<float>& samples) const {
  StreamStateQT<TAct> st;
  InitState(st);
  return dsp::EnhanceOla(
      samples, [&](const float* re, const float* im, float* ore, float* oim) {
        Step(st, re, im, ore, oim);
      });
}

template class EngineV4T<int8_t>;
template class EngineV4T<int16_t>;

}  // namespace gtcrn
