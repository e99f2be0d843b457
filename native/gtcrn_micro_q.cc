// GTCRN-Micro native full-integer quantized engine (int8 and 16x8 modes).
//
// The deployment-format counterpart of the reference's int8 TFLite artifact
// run by TFLM (reference scripts/onnx2tf.sh:50-64 -oiqt full-integer PTQ;
// esp32_s3/main/main.cc int8 interpreter): per-out-channel symmetric int8
// weights (BN folded), per-tensor asymmetric integer activations (int8 or,
// in the 16x8 mode, int16 -- TFLite's high-dynamic-range variant), int32
// accumulation, float rescale.  Ring buffers hold the activation type.
//
// Numerics mirror the JAX fake-quant simulation (gtcrn_micro_tpu/quant) on
// BN-folded params exactly: dequant(q) = (q - z) * s, so an integer MAC
// sum_i (qx_i - zx) * qw_i * (sx * sw[c]) equals the simulated
// fp32-of-fake-quant dot up to float associativity (tests/runtime).

#include <cmath>
#include <cstring>
#include <fstream>
#include <limits>
#include <stdexcept>

#include "gtcrn_micro.h"

namespace gtcrn {

namespace {

constexpr uint32_t kMagicQ = 0x47544D38;  // "GTM8"

float Prelu(float x, float a) { return x > 0 ? x : a * x; }

// quantize one activation value; nearbyint = round-half-even, matching the
// JAX simulation's jnp.round exactly.  Clamps to the BOUNDARY's grid (q.qlo
// .. q.qhi), not TAct's: in a mixed-precision artifact an int8 boundary
// executed by the int16 engine must clip at +/-127 exactly like a pure-int8
// engine would (CheckActBits guarantees the bounds fit TAct).
template <typename TAct>
inline TAct QuantAct(float x, const ActQ& q) {
  float v = std::nearbyint(x / q.scale) + static_cast<float>(q.zero);
  if (v < q.qlo) v = q.qlo;
  if (v > q.qhi) v = q.qhi;
  return static_cast<TAct>(v);
}

template <typename TAct>
void QuantFrame(const float* x, int n, const ActQ& q, TAct* out) {
  for (int i = 0; i < n; ++i) out[i] = QuantAct<TAct>(x[i], q);
}

// ---------------------------------------------------------------------------
// loading (format: io/export_native.py GTM8)
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
  // one slot: either fp32 Tensor or per-channel int8 QTensor.  Rank/dims
  // are validated against small ceilings BEFORE any allocation so a
  // corrupted artifact fails with the descriptive error below instead of a
  // multi-GB resize/bad_alloc (the largest real tensor is the 192x64 ERB
  // pair; 1<<20 elements leaves generous headroom for model variants).
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
  ActQ Act() {
    ActQ a;
    a.scale = Scalar<float>();
    a.zero = Scalar<int32_t>();
    return a;
  }
};

GTConvQ ReadGtconvQ(Reader& r) {
  GTConvQ g;
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

TcnQ ReadTcnQ(Reader& r) {
  TcnQ t;
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
// integer compute helpers ([C][F] activations; q* buffers hold TAct)
// ---------------------------------------------------------------------------

// Integer kernels below keep the frequency axis as the INNERMOST,
// unit-stride loop over a contiguous int32 accumulator row so the compiler
// auto-vectorizes the widening MACs (AVX-512 on the dev host; the same
// shape feeds the ESP32-S3 vector unit the reference targets).  The
// activation zero point is folded OUT of the inner loops where the tap set
// is position-independent (exact in int32: sum((x-z)*w) == sum(x*w) -
// z*sum(w)); boundary-clipped convs carry a per-position weight sum.
constexpr int kFAcc = kFErb + 3;  // widest integer-conv row (129) + margin

// pointwise channel mix on a quantized input: int32 MACs, float rescale
template <typename TAct>
void PwQ(const QTensor& w, const Tensor& b, const TAct* qx, const ActQ& aq,
         int ci_n, int f_n, float* out, int co_n) {
  for (int co = 0; co < co_n; ++co) {
    const int8_t* wr = w.data.data() + co * ci_n;
    int32_t wsum = 0;
    for (int ci = 0; ci < ci_n; ++ci) wsum += wr[ci];
    int32_t acc[kFAcc];
    std::memset(acc, 0, f_n * sizeof(int32_t));
    for (int ci = 0; ci < ci_n; ++ci) {
      const int32_t wv = wr[ci];
      const TAct* row = qx + ci * f_n;
      for (int f = 0; f < f_n; ++f) {
        acc[f] += wv * static_cast<int32_t>(row[f]);
      }
    }
    const float rescale = aq.scale * w.scale[co];
    const int32_t zoff = aq.zero * wsum;
    float* orow = out + co * f_n;
    for (int f = 0; f < f_n; ++f) {
      orow[f] = b.data[co] + rescale * static_cast<float>(acc[f] - zoff);
    }
  }
}

// (1,5) freq conv stride 2 pad 2 + bias + PReLU, int8 weights (5, Co, Ci)
template <typename TAct>
void Conv5S2Q(const ConvQ& cw, const TAct* qx, int ci_n, int f_in,
              float* out, int co_n, int f_out) {
  const int8_t* w = cw.w.data.data();
  for (int co = 0; co < co_n; ++co) {
    int32_t acc[kFAcc], wsum[kFAcc];
    std::memset(acc, 0, f_out * sizeof(int32_t));
    std::memset(wsum, 0, f_out * sizeof(int32_t));
    for (int k = 0; k < 5; ++k) {
      // src = 2f + k - 2 in [0, f_in)
      const int f_lo = k >= 2 ? 0 : 1;
      const int f_hi = std::min(f_out, (f_in - 1 - (k - 2)) / 2 + 1);
      if (f_lo >= f_hi) continue;
      int32_t wk = 0;
      for (int ci = 0; ci < ci_n; ++ci) {
        const int32_t wv = w[(k * co_n + co) * ci_n + ci];
        wk += wv;
        const TAct* row = qx + ci * f_in;
        for (int f = f_lo; f < f_hi; ++f) {
          acc[f] += wv * static_cast<int32_t>(row[2 * f + k - 2]);
        }
      }
      for (int f = f_lo; f < f_hi; ++f) wsum[f] += wk;
    }
    const float rescale = cw.in.scale * cw.w.scale[co];
    for (int f = 0; f < f_out; ++f) {
      out[co * f_out + f] = Prelu(
          cw.b.data[co] + rescale * static_cast<float>(
                              acc[f] - cw.in.zero * wsum[f]),
          cw.a);
    }
  }
}

// (1,5) transposed freq conv stride 2 pad 2, int8 weights (5, Co, Ci).
// Output position f draws on zero-stuffed source f+k-2 (even, in range);
// split by output parity so every loop is unit-stride: even outputs
// f=2j <- taps k in {0,2,4} at input i = j-1+k/2; odd outputs f=2j+1 <-
// taps k in {1,3} at i = j+(k-1)/2.
template <typename TAct>
void Deconv5Up2Q(const ConvQ& cw, const TAct* qx, int ci_n, int f_in,
                 float* out, int co_n, bool last_tanh) {
  const int f_out = 2 * f_in - 1;
  const int n_even = f_in;      // outputs 0, 2, .., 2*(f_in-1)
  const int n_odd = f_in - 1;   // outputs 1, 3, .., 2*f_in-3
  const int8_t* w = cw.w.data.data();
  for (int co = 0; co < co_n; ++co) {
    int32_t ae[kFAcc], we[kFAcc], ao[kFAcc], wo[kFAcc];
    std::memset(ae, 0, n_even * sizeof(int32_t));
    std::memset(we, 0, n_even * sizeof(int32_t));
    std::memset(ao, 0, n_odd * sizeof(int32_t));
    std::memset(wo, 0, n_odd * sizeof(int32_t));
    for (int k = 0; k < 5; ++k) {
      const bool even = (k & 1) == 0;
      int32_t* acc = even ? ae : ao;
      int32_t* ws = even ? we : wo;
      // j range: input i = j + (k - 2 + even) / 2 must lie in [0, f_in)
      const int di = even ? (k - 2) / 2 : (k - 1) / 2;  // input i = j + di
      const int j_lo = std::max(0, -di);
      const int j_hi = std::min(even ? n_even : n_odd, f_in - di);
      if (j_lo >= j_hi) continue;
      int32_t wk = 0;
      for (int ci = 0; ci < ci_n; ++ci) {
        const int32_t wv = w[(k * co_n + co) * ci_n + ci];
        wk += wv;
        const TAct* row = qx + ci * f_in;
        for (int j = j_lo; j < j_hi; ++j) {
          acc[j] += wv * static_cast<int32_t>(row[j + di]);
        }
      }
      for (int j = j_lo; j < j_hi; ++j) ws[j] += wk;
    }
    const float rescale = cw.in.scale * cw.w.scale[co];
    float* orow = out + co * f_out;
    for (int j = 0; j < n_even; ++j) {
      float v = cw.b.data[co] +
                rescale * static_cast<float>(ae[j] - cw.in.zero * we[j]);
      orow[2 * j] = last_tanh ? std::tanh(v) : Prelu(v, cw.a);
    }
    for (int j = 0; j < n_odd; ++j) {
      float v = cw.b.data[co] +
                rescale * static_cast<float>(ao[j] - cw.in.zero * wo[j]);
      orow[2 * j + 1] = last_tanh ? std::tanh(v) : Prelu(v, cw.a);
    }
  }
}

// depthwise 3-tap freq conv row kt of int8 (9, C, 1, 1); taps TAct
template <typename TAct>
void DwFreq3AccQ(const QTensor& w9, int kt, const TAct* tap, const ActQ& aq,
                 int32_t* acc) {
  for (int c = 0; c < kC; ++c) {
    int32_t* arow = acc + c * kFDown;
    const TAct* trow = tap + c * kFDown;
    for (int kf = 0; kf < 3; ++kf) {
      // src = f + kf - 1 in [0, kFDown)
      const int f_lo = kf == 0 ? 1 : 0;
      const int f_hi = kf == 2 ? kFDown - 1 : kFDown;
      const int32_t wv = w9.data[(kt * 3 + kf) * kC + c];
      for (int f = f_lo; f < f_hi; ++f) {
        arow[f] += wv * (static_cast<int32_t>(trow[f + kf - 1]) - aq.zero);
      }
    }
  }
}

// full 3-tap freq conv row kt of int8 (3, 3, Co, Ci); per-Co acc
template <typename TAct>
void FullFreq3AccQ(const QTensor& w, int kt, const TAct* tap, const ActQ& aq,
                   int32_t* acc) {
  for (int co = 0; co < kC; ++co) {
    int32_t* arow = acc + co * kFDown;
    for (int kf = 0; kf < 3; ++kf) {
      const int f_lo = kf == 0 ? 1 : 0;
      const int f_hi = kf == 2 ? kFDown - 1 : kFDown;
      for (int ci = 0; ci < kC; ++ci) {
        const int32_t wv = w.data[((kt * 3 + kf) * kC + co) * kC + ci];
        const TAct* trow = tap + ci * kFDown;
        for (int f = f_lo; f < f_hi; ++f) {
          arow[f] += wv * (static_cast<int32_t>(trow[f + kf - 1]) - aq.zero);
        }
      }
    }
  }
}

// GTConvBlock: x [16][33] fp32 in place; integer rings updated.
template <typename TAct>
void GtconvStepQ(const GTConvQ& g, bool deconv, float* x,
                 std::vector<TAct>& dw_ring, std::vector<TAct>& tra_ring,
                 int t) {
  const int frame = kC * kFDown;
  // pw1 on the active half (channels 0..8) + PReLU
  TAct qa[kH * kFDown];
  QuantFrame(x, kH * kFDown, g.pw1_in, qa);
  float h[kC * kFDown];
  PwQ(g.pw1_w, g.pw1_b, qa, g.pw1_in, kH, kFDown, h, kC);
  for (int i = 0; i < frame; ++i) h[i] = Prelu(h[i], g.a1);

  // depthwise over time: integer ring taps + current quantized frame
  TAct qh[kC * kFDown];
  QuantFrame(h, frame, g.dw_in, qh);
  int32_t acc[kC * kFDown];
  std::memset(acc, 0, sizeof(acc));
  const TAct* tap0 = dw_ring.data() + (t % 2) * frame;
  const TAct* tap1 = dw_ring.data() + ((t + 1) % 2) * frame;
  if (deconv) {
    FullFreq3AccQ(g.dw_w, 0, tap0, g.dw_in, acc);
    FullFreq3AccQ(g.dw_w, 1, tap1, g.dw_in, acc);
    FullFreq3AccQ(g.dw_w, 2, qh, g.dw_in, acc);
  } else {
    DwFreq3AccQ(g.dw_w, 0, tap0, g.dw_in, acc);
    DwFreq3AccQ(g.dw_w, 1, tap1, g.dw_in, acc);
    DwFreq3AccQ(g.dw_w, 2, qh, g.dw_in, acc);
  }
  std::memcpy(dw_ring.data() + (t % 2) * frame, qh, sizeof(qh));
  float y[kC * kFDown];
  for (int c = 0; c < kC; ++c) {
    const float rescale = g.dw_in.scale * g.dw_w.scale[c];
    for (int f = 0; f < kFDown; ++f) {
      int i = c * kFDown + f;
      y[i] = Prelu(g.dw_b.data[c] + rescale * static_cast<float>(acc[i]),
                   g.a2);
    }
  }

  TAct qy[kC * kFDown];
  QuantFrame(y, frame, g.pw2_in, qy);
  float h3[kH * kFDown];
  PwQ(g.pw2_w, g.pw2_b, qy, g.pw2_in, kC, kFDown, h3, kH);

  // TRA gate: energy -> integer causal depthwise k=3 -> pointwise -> sigmoid
  float e[kH];
  for (int c = 0; c < kH; ++c) {
    float s = 0.f;
    for (int f = 0; f < kFDown; ++f)
      s += h3[c * kFDown + f] * h3[c * kFDown + f];
    e[c] = s / kFDown;
  }
  TAct qe[kH];
  QuantFrame(e, kH, g.energy, qe);
  const TAct* e0 = tra_ring.data() + (t % 2) * kH;
  const TAct* e1 = tra_ring.data() + ((t + 1) % 2) * kH;
  float yg[kH];
  for (int c = 0; c < kH; ++c) {
    int32_t acc_e =
        static_cast<int32_t>(g.tra_dw.data[0 * kH + c]) *
            (static_cast<int32_t>(e0[c]) - g.energy.zero) +
        static_cast<int32_t>(g.tra_dw.data[1 * kH + c]) *
            (static_cast<int32_t>(e1[c]) - g.energy.zero) +
        static_cast<int32_t>(g.tra_dw.data[2 * kH + c]) *
            (static_cast<int32_t>(qe[c]) - g.energy.zero);
    yg[c] = g.tra_db.data[c] +
            g.energy.scale * g.tra_dw.scale[c] * static_cast<float>(acc_e);
  }
  std::memcpy(tra_ring.data() + (t % 2) * kH, qe, sizeof(qe));
  TAct qyg[kH];
  QuantFrame(yg, kH, g.gate_in, qyg);
  float gate[kH];
  for (int c = 0; c < kH; ++c) {
    int32_t acc_g = 0;
    for (int i = 0; i < kH; ++i) {
      acc_g += static_cast<int32_t>(g.tra_pw.data[c * kH + i]) *
               (static_cast<int32_t>(qyg[i]) - g.gate_in.zero);
    }
    float v = g.tra_pb.data[c] +
              g.gate_in.scale * g.tra_pw.scale[c] * static_cast<float>(acc_g);
    gate[c] = 1.f / (1.f + std::exp(-v));
  }

  // gated active half interleaved with the passive half (channel shuffle)
  float out[kC * kFDown];
  for (int c = 0; c < kH; ++c) {
    for (int f = 0; f < kFDown; ++f) {
      out[(2 * c) * kFDown + f] = h3[c * kFDown + f] * gate[c];
      out[(2 * c + 1) * kFDown + f] = x[(kH + c) * kFDown + f];
    }
  }
  std::memcpy(x, out, sizeof(out));
}

// Residual TCN block, dilation d: x [16][33] fp32 in place.
template <typename TAct>
void TcnStepQ(const TcnQ& w, int d, float* x, std::vector<TAct>& ring,
              int t) {
  const int frame = kC * kFDown;
  const int L = 2 * d;
  TAct qx[kC * kFDown];
  QuantFrame(x, frame, w.pw1_in, qx);
  float h[kC * kFDown];
  PwQ(w.pw1_w, w.pw1_b, qx, w.pw1_in, kC, kFDown, h, kC);
  for (int i = 0; i < frame; ++i) h[i] = Prelu(h[i], w.a1);

  TAct qh[kC * kFDown];
  QuantFrame(h, frame, w.dw_in, qh);
  const TAct* tap0 = ring.data() + (t % L) * frame;        // x_{t-2d}
  const TAct* tap1 = ring.data() + ((t + d) % L) * frame;  // x_{t-d}
  float y[kC * kFDown];
  for (int c = 0; c < kC; ++c) {
    const float rescale = w.dw_in.scale * w.dw_w.scale[c];
    for (int f = 0; f < kFDown; ++f) {
      int i = c * kFDown + f;
      int32_t acc =
          static_cast<int32_t>(w.dw_w.data[0 * kC + c]) *
              (static_cast<int32_t>(tap0[i]) - w.dw_in.zero) +
          static_cast<int32_t>(w.dw_w.data[1 * kC + c]) *
              (static_cast<int32_t>(tap1[i]) - w.dw_in.zero) +
          static_cast<int32_t>(w.dw_w.data[2 * kC + c]) *
              (static_cast<int32_t>(qh[i]) - w.dw_in.zero);
      y[i] = Prelu(w.dw_b.data[c] + rescale * static_cast<float>(acc), w.a2);
    }
  }
  std::memcpy(ring.data() + (t % L) * frame, qh, sizeof(qh));

  TAct qy[kC * kFDown];
  QuantFrame(y, frame, w.pw3_in, qy);
  float h3[kC * kFDown];
  PwQ(w.pw3_w, w.pw3_b, qy, w.pw3_in, kC, kFDown, h3, kC);
  for (int i = 0; i < frame; ++i) x[i] = Prelu(h3[i] + x[i], w.a3);
}

}  // namespace

WeightsQ WeightsQ::Load(const std::string& path) {
  Reader r(path);
  uint32_t magic = r.Scalar<uint32_t>();
  uint32_t count = r.Scalar<uint32_t>();
  if (magic != kMagicQ) throw std::runtime_error("bad GTM8 magic");
  constexpr uint32_t kExpectedTensors = 158;  // pack_weights ABI
  if (count != kExpectedTensors) {
    throw std::runtime_error("GTM8 has " + std::to_string(count) +
                             " tensors, expected 158 (packing ABI drift?)");
  }

  WeightsQ w;
  w.bm_w = r.F32();
  w.bs_w = r.F32();
  w.sfe_w = r.I8();
  for (ConvQ* cw : {&w.en0, &w.en1}) {
    cw->w = r.I8();
    cw->b = r.F32();
    cw->a = r.Alpha();
  }
  for (auto& g : w.enc) g = ReadGtconvQ(r);
  for (auto& t : w.tcn) t = ReadTcnQ(r);
  for (auto& g : w.dec) g = ReadGtconvQ(r);
  w.de3.w = r.I8();
  w.de3.b = r.F32();
  w.de3.a = r.Alpha();
  w.de4.w = r.I8();
  w.de4.b = r.F32();

  // activation qparams: bit width, then (scale, zero) in traversal order
  // (io/export_native.act_path_order).  act_bits 0 = MIXED (v2 layout: a
  // per-boundary bits field precedes each qparam pair).
  w.act_bits = r.Scalar<uint32_t>();
  if (w.act_bits != 8 && w.act_bits != 16 && w.act_bits != 0) {
    throw std::runtime_error("GTM8: unsupported act_bits " +
                             std::to_string(w.act_bits));
  }
  uint32_t n_act = r.Scalar<uint32_t>();
  if (n_act != 59) {
    throw std::runtime_error("GTM8 has " + std::to_string(n_act) +
                             " act qparams, expected 59");
  }
  ActQ* slots[59];
  int i = 0;
  slots[i++] = &w.sfe_in;
  slots[i++] = &w.en0.in;
  slots[i++] = &w.en1.in;
  for (auto& g : w.enc) {
    slots[i++] = &g.pw1_in;
    slots[i++] = &g.dw_in;
    slots[i++] = &g.pw2_in;
    slots[i++] = &g.energy;
    slots[i++] = &g.gate_in;
  }
  for (auto& t : w.tcn) {
    slots[i++] = &t.pw1_in;
    slots[i++] = &t.dw_in;
    slots[i++] = &t.pw3_in;
  }
  for (auto& g : w.dec) {
    slots[i++] = &g.pw1_in;
    slots[i++] = &g.dw_in;
    slots[i++] = &g.pw2_in;
    slots[i++] = &g.energy;
    slots[i++] = &g.gate_in;
  }
  slots[i++] = &w.de3.in;
  slots[i++] = &w.de4.in;
  for (int j = 0; j < 59; ++j) {
    uint32_t bits = w.act_bits;
    if (bits == 0) {  // mixed: per-boundary bits field
      bits = r.Scalar<uint32_t>();
      if (bits != 8 && bits != 16) {
        throw std::runtime_error("GTM8: bad per-boundary act bits " +
                                 std::to_string(bits));
      }
    }
    ActQ a = r.Act();
    a.qlo = bits == 8 ? -128.f : -32768.f;
    a.qhi = bits == 8 ? 127.f : 32767.f;
    *slots[j] = a;
  }
  return w;
}

template <typename TAct>
StreamStateQT<TAct>::StreamStateQT() {
  for (auto& r : dw_ring) r.assign(2 * kC * kFDown, 0);
  for (auto& r : tra_ring) r.assign(2 * kH, 0);
  for (int i = 0; i < 8; ++i) {
    int d = 1 << (i % 4);
    tcn_ring[i].assign(2 * d * kC * kFDown, 0);
  }
  t = 0;
}

template <typename TAct>
void EngineQT<TAct>::CheckActBits() const {
  // uniform artifacts bind to the matching engine; MIXED artifacts
  // (act_bits=0) need int16 storage for their widest boundaries
  const uint32_t want = w_.act_bits == 0 ? 16 : w_.act_bits;
  if (want != 8 * sizeof(TAct)) {
    throw std::runtime_error(
        "GTM8 artifact has act_bits=" + std::to_string(w_.act_bits) +
        (w_.act_bits == 0 ? " (mixed)" : "") + "; this engine expects " +
        std::to_string(8 * sizeof(TAct)));
  }
}

template <typename TAct>
void EngineQT<TAct>::InitState(StreamStateQT<TAct>& st) const {
  auto z = [](const ActQ& a) { return static_cast<TAct>(a.zero); };
  for (int i = 0; i < 3; ++i) {
    st.dw_ring[i].assign(2 * kC * kFDown, z(w_.enc[i].dw_in));
    st.dw_ring[3 + i].assign(2 * kC * kFDown, z(w_.dec[i].dw_in));
    st.tra_ring[i].assign(2 * kH, z(w_.enc[i].energy));
    st.tra_ring[3 + i].assign(2 * kH, z(w_.dec[i].energy));
  }
  for (int i = 0; i < 8; ++i) {
    int d = 1 << (i % 4);
    st.tcn_ring[i].assign(2 * d * kC * kFDown, z(w_.tcn[i].dw_in));
  }
  st.t = 0;
}

template <typename TAct>
void EngineQT<TAct>::Step(StreamStateQT<TAct>& st, const float* spec_re,
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

  // SFE-Lite depthwise freq conv (per-channel scales over c)
  TAct qfeat[3 * kFErb];
  QuantFrame(&feat[0][0], 3 * kFErb, w_.sfe_in, qfeat);
  float x129[3 * kFErb];
  for (int c = 0; c < 3; ++c) {
    const float rescale = w_.sfe_in.scale * w_.sfe_w.scale[c];
    for (int f = 0; f < kFErb; ++f) {
      int32_t acc = 0;
      for (int kf = 0; kf < 3; ++kf) {
        int src = f + kf - 1;
        if (src < 0 || src >= kFErb) continue;
        acc += static_cast<int32_t>(w_.sfe_w.data[kf * 3 + c]) *
               (static_cast<int32_t>(qfeat[c * kFErb + src]) - w_.sfe_in.zero);
      }
      x129[c * kFErb + f] = rescale * static_cast<float>(acc);
    }
  }

  // encoder
  TAct q129[3 * kFErb];
  QuantFrame(x129, 3 * kFErb, w_.en0.in, q129);
  float skip0[kC * 65], skip1[kC * kFDown];
  Conv5S2Q(w_.en0, q129, 3, kFErb, skip0, kC, 65);
  TAct q65[kC * 65];
  QuantFrame(skip0, kC * 65, w_.en1.in, q65);
  Conv5S2Q(w_.en1, q65, kC, 65, skip1, kC, kFDown);
  float x[kC * kFDown];
  std::memcpy(x, skip1, sizeof(x));
  float skips[3][kC * kFDown];
  for (int i = 0; i < 3; ++i) {
    GtconvStepQ(w_.enc[i], false, x, st.dw_ring[i], st.tra_ring[i], t);
    std::memcpy(skips[i], x, sizeof(x));
  }

  // GTCN x2
  for (int i = 0; i < 8; ++i) {
    TcnStepQ(w_.tcn[i], 1 << (i % 4), x, st.tcn_ring[i], t);
  }

  // decoder with additive skips
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < kC * kFDown; ++j) x[j] += skips[2 - i][j];
    GtconvStepQ(w_.dec[i], true, x, st.dw_ring[3 + i], st.tra_ring[3 + i], t);
  }
  for (int j = 0; j < kC * kFDown; ++j) x[j] += skip1[j];
  TAct q33[kC * kFDown];
  QuantFrame(x, kC * kFDown, w_.de3.in, q33);
  float x65[kC * 65];
  Deconv5Up2Q(w_.de3, q33, kC, kFDown, x65, kC, /*last_tanh=*/false);
  for (int j = 0; j < kC * 65; ++j) x65[j] += skip0[j];
  TAct qx65[kC * 65];
  QuantFrame(x65, kC * 65, w_.de4.in, qx65);
  float m129[2 * kFErb];
  Deconv5Up2Q(w_.de4, qx65, kC, 65, m129, 2, /*last_tanh=*/true);

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
void EngineQT<TAct>::StepBatch(StreamStateQT<TAct>* states,
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
std::vector<float> EngineQT<TAct>::EnhanceWav(
    const std::vector<float>& samples) const {
  StreamStateQT<TAct> st;
  InitState(st);
  return dsp::EnhanceOla(
      samples, [&](const float* re, const float* im, float* ore, float* oim) {
        Step(st, re, im, ore, oim);
      });
}

template struct StreamStateQT<int8_t>;
template struct StreamStateQT<int16_t>;
template class EngineQT<int8_t>;
template class EngineQT<int16_t>;

}  // namespace gtcrn
