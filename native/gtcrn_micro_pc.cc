// GTCRN-Micro per-channel-activation engine (GTM8 v3).
//
// r4b finding (EVAL.md): per-TENSOR activation scales are the binding
// quality constraint of the integer artifacts -- the hot boundaries spread
// up to 26x across their 16 lanes; per-LANE scales lift held-out quality
// 5-9 dB (16x8: 24.3 -> 29.7 dB untrained).  A per-lane scale on a MIXING
// conv input cannot ride an integer MAC without folding the scales into
// the quantized weights (which would change the artifact's numerics vs the
// JAX per-channel fake-quant sim), so this engine makes the opposite
// trade: int8 weights are dequantized ONCE at load (the flash-size win of
// the artifact is retained -- dequantization bit-matches
// quant/fake_quant.weight_qparams because io/export_native.py quantized
// with the same float32 arithmetic), activations pass through per-lane
// quantize-dequantize at each of the 59 boundaries, and the MACs run
// fp32.  Numerics == QuantizedModel(per_channel act_qp) exactly (up to
// float associativity); on FPU hosts this engine is FASTER than the
// integer ones (the MAC kernels are the fp32 engine's, which beat the
// int8 kernels on the dev host -- PERF.md native table).
//
// The float kernels are local copies of native/gtcrn_micro.cc's (that
// file's codegen is frozen by the bit-identical-output invariant, so it
// must not be refactored to export them).

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

// fake-quantize one [C][F] activation block in place: per-lane scale/zero,
// nearbyint (round-half-even) matching jnp.round, clamp to the boundary's
// integer grid.  lanes == 1 broadcasts (a per-tensor boundary inside a v3
// artifact).
void FakeQuantRows(float* x, int c_n, int f_n, const ActQV& q) {
  for (int c = 0; c < c_n; ++c) {
    const int lane = q.scale.size() == 1 ? 0 : c;
    const float s = q.scale[lane];
    const float z = static_cast<float>(q.zero[lane]);
    float* row = x + c * f_n;
    for (int f = 0; f < f_n; ++f) {
      float v = std::nearbyint(row[f] / s) + z;
      if (v < q.qlo) v = q.qlo;
      if (v > q.qhi) v = q.qhi;
      row[f] = (v - z) * s;
    }
  }
}

// ---------------------------------------------------------------------------
// loading: GTM8 v3 (io/export_native.py); int8 slots dequantized to float
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
  // one slot, dequantized: fp32 slots pass through; int8 slots multiply by
  // their per-channel scale along the given PACKED-layout axis
  // (io/export_native._slot_axes).
  Tensor Slot(int q_axis) {
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
    Tensor t;
    t.dims = dims;
    t.data.resize(n);
    if (dtype == 0) {
      if (q_axis >= 0)
        throw std::runtime_error("GTM8: expected int8 slot, got fp32");
      f.read(reinterpret_cast<char*>(t.data.data()), 4 * n);
    } else if (dtype == 1) {
      if (q_axis < 0)
        throw std::runtime_error("GTM8: expected fp32 slot, got int8");
      uint32_t n_ch = Scalar<uint32_t>();
      if (q_axis >= static_cast<int>(rank) || dims[q_axis] != n_ch)
        throw std::runtime_error("GTM8: channel axis mismatch");
      std::vector<float> scale(n_ch);
      f.read(reinterpret_cast<char*>(scale.data()), 4 * n_ch);
      std::vector<int8_t> qd(n);
      f.read(reinterpret_cast<char*>(qd.data()), n);
      // strides for indexing the channel axis
      size_t inner = 1;
      for (uint32_t a = q_axis + 1; a < rank; ++a) inner *= dims[a];
      const size_t block = inner * n_ch;
      for (size_t i = 0; i < n; ++i) {
        const size_t ch = (i % block) / inner;
        t.data[i] = static_cast<float>(qd[i]) * scale[ch];
      }
    } else {
      throw std::runtime_error("GTM8: unknown slot dtype");
    }
    if (!f) throw std::runtime_error("truncated GTM8 file");
    return t;
  }
  Tensor F32() { return Slot(-1); }
  float Alpha() { return F32().data.at(0); }
};

GTConvPC ReadGtconvPC(Reader& r, bool deconv) {
  GTConvPC g;
  g.pw1_w = r.Slot(0);
  g.pw1_b = r.F32();
  g.a1 = r.Alpha();
  g.dw_w = r.Slot(deconv ? 2 : 1);  // enc (9,16,1,1) / dec (3,3,16,16)
  g.dw_b = r.F32();
  g.a2 = r.Alpha();
  g.pw2_w = r.Slot(0);
  g.pw2_b = r.F32();
  g.tra_dw = r.Slot(1);  // (3,8,1)
  g.tra_db = r.F32();
  g.tra_pw = r.Slot(0);  // (8,8)
  g.tra_pb = r.F32();
  return g;
}

TcnPC ReadTcnPC(Reader& r) {
  TcnPC t;
  t.pw1_w = r.Slot(0);
  t.pw1_b = r.F32();
  t.a1 = r.Alpha();
  t.dw_w = r.Slot(1);  // (3,16,1,1)
  t.dw_b = r.F32();
  t.a2 = r.Alpha();
  t.pw3_w = r.Slot(0);
  t.pw3_b = r.F32();
  t.a3 = r.Alpha();
  return t;
}

// ---------------------------------------------------------------------------
// float kernels ([C][F] activations) -- local copies of gtcrn_micro.cc's
// ---------------------------------------------------------------------------

void Conv5S2(const ConvPC& cw, const float* x, int ci_n, int f_in, float* out,
             int co_n, int f_out) {
  const float* w = cw.w.data.data();  // (5, Co, Ci)
  for (int co = 0; co < co_n; ++co) {
    float acc[kFAcc];
    for (int f = 0; f < f_out; ++f) acc[f] = cw.b.data[co];
    for (int k = 0; k < 5; ++k) {
      const int f_lo = k >= 2 ? 0 : 1;
      const int f_hi = std::min(f_out, (f_in - 1 - (k - 2)) / 2 + 1);
      for (int ci = 0; ci < ci_n; ++ci) {
        const float wv = w[(k * co_n + co) * ci_n + ci];
        const float* row = x + ci * f_in;
        for (int f = f_lo; f < f_hi; ++f) {
          acc[f] += wv * row[2 * f + k - 2];
        }
      }
    }
    for (int f = 0; f < f_out; ++f) {
      out[co * f_out + f] = Prelu(acc[f], cw.a);
    }
  }
}

void Deconv5Up2(const ConvPC& cw, const float* x, int ci_n, int f_in,
                float* out, int co_n, bool last_tanh) {
  const int f_out = 2 * f_in - 1;
  const int n_even = f_in;
  const int n_odd = f_in - 1;
  const float* w = cw.w.data.data();  // (5, Co, Ci)
  for (int co = 0; co < co_n; ++co) {
    float ae[kFAcc], ao[kFAcc];
    for (int j = 0; j < n_even; ++j) ae[j] = cw.b.data[co];
    for (int j = 0; j < n_odd; ++j) ao[j] = cw.b.data[co];
    for (int k = 0; k < 5; ++k) {
      const bool even = (k & 1) == 0;
      float* acc = even ? ae : ao;
      const int di = even ? (k - 2) / 2 : (k - 1) / 2;
      const int j_lo = std::max(0, -di);
      const int j_hi = std::min(even ? n_even : n_odd, f_in - di);
      for (int ci = 0; ci < ci_n; ++ci) {
        const float wv = w[(k * co_n + co) * ci_n + ci];
        const float* row = x + ci * f_in;
        for (int j = j_lo; j < j_hi; ++j) {
          acc[j] += wv * row[j + di];
        }
      }
    }
    float* orow = out + co * f_out;
    for (int j = 0; j < n_even; ++j) {
      orow[2 * j] = last_tanh ? std::tanh(ae[j]) : Prelu(ae[j], cw.a);
    }
    for (int j = 0; j < n_odd; ++j) {
      orow[2 * j + 1] = last_tanh ? std::tanh(ao[j]) : Prelu(ao[j], cw.a);
    }
  }
}

void Pw(const Tensor& w, const Tensor& b, const float* x, int ci_n, int f_n,
        float* out, int co_n) {
  for (int co = 0; co < co_n; ++co) {
    float acc[kFAcc];
    for (int f = 0; f < f_n; ++f) acc[f] = b.data[co];
    for (int ci = 0; ci < ci_n; ++ci) {
      const float wv = w.data[co * ci_n + ci];
      const float* row = x + ci * f_n;
      for (int f = 0; f < f_n; ++f) {
        acc[f] += wv * row[f];
      }
    }
    float* orow = out + co * f_n;
    for (int f = 0; f < f_n; ++f) {
      orow[f] = acc[f];
    }
  }
}

void DwFreq3Acc(const Tensor& w9, int kt, const float* tap, float* acc) {
  for (int c = 0; c < kC; ++c) {
    float v[kFDown] = {};
    const float* trow = tap + c * kFDown;
    for (int kf = 0; kf < 3; ++kf) {
      const int f_lo = kf == 0 ? 1 : 0;
      const int f_hi = kf == 2 ? kFDown - 1 : kFDown;
      const float wv = w9.data[(kt * 3 + kf) * kC + c];
      for (int f = f_lo; f < f_hi; ++f) {
        v[f] += wv * trow[f + kf - 1];
      }
    }
    float* arow = acc + c * kFDown;
    for (int f = 0; f < kFDown; ++f) {
      arow[f] += v[f];
    }
  }
}

void FullFreq3Acc(const Tensor& w, int kt, const float* tap, float* acc) {
  for (int co = 0; co < kC; ++co) {
    float v[kFDown] = {};
    for (int kf = 0; kf < 3; ++kf) {
      const int f_lo = kf == 0 ? 1 : 0;
      const int f_hi = kf == 2 ? kFDown - 1 : kFDown;
      for (int ci = 0; ci < kC; ++ci) {
        const float wv = w.data[((kt * 3 + kf) * kC + co) * kC + ci];
        const float* trow = tap + ci * kFDown;
        for (int f = f_lo; f < f_hi; ++f) {
          v[f] += wv * trow[f + kf - 1];
        }
      }
    }
    float* arow = acc + co * kFDown;
    for (int f = 0; f < kFDown; ++f) {
      arow[f] += v[f];
    }
  }
}

// GTConvBlock with per-lane boundary fake-quant; rings hold fake-quantized
// floats (what the JAX sim's rings hold -- fake-quant is idempotent).
void GtconvStepPC(const GTConvPC& g, bool deconv, float* x,
                  std::vector<float>& dw_ring, std::vector<float>& tra_ring,
                  int t) {
  const int frame = kC * kFDown;
  float qa[kH * kFDown];
  std::memcpy(qa, x, sizeof(qa));  // active half (channels 0..8)
  FakeQuantRows(qa, kH, kFDown, g.pw1_in);
  float h[kC * kFDown];
  Pw(g.pw1_w, g.pw1_b, qa, kH, kFDown, h, kC);
  for (int i = 0; i < frame; ++i) h[i] = Prelu(h[i], g.a1);

  FakeQuantRows(h, kC, kFDown, g.dw_in);
  float y[kC * kFDown];
  for (int c = 0; c < kC; ++c)
    for (int f = 0; f < kFDown; ++f) y[c * kFDown + f] = g.dw_b.data[c];
  const float* tap0 = dw_ring.data() + (t % 2) * frame;
  const float* tap1 = dw_ring.data() + ((t + 1) % 2) * frame;
  if (deconv) {
    FullFreq3Acc(g.dw_w, 0, tap0, y);
    FullFreq3Acc(g.dw_w, 1, tap1, y);
    FullFreq3Acc(g.dw_w, 2, h, y);
  } else {
    DwFreq3Acc(g.dw_w, 0, tap0, y);
    DwFreq3Acc(g.dw_w, 1, tap1, y);
    DwFreq3Acc(g.dw_w, 2, h, y);
  }
  std::memcpy(dw_ring.data() + (t % 2) * frame, h, sizeof(h));
  for (int i = 0; i < frame; ++i) y[i] = Prelu(y[i], g.a2);

  FakeQuantRows(y, kC, kFDown, g.pw2_in);
  float h3[kH * kFDown];
  Pw(g.pw2_w, g.pw2_b, y, kC, kFDown, h3, kH);

  float e[kH];
  for (int c = 0; c < kH; ++c) {
    float s = 0.f;
    for (int f = 0; f < kFDown; ++f)
      s += h3[c * kFDown + f] * h3[c * kFDown + f];
    e[c] = s / kFDown;
  }
  FakeQuantRows(e, kH, 1, g.energy);
  const float* e0 = tra_ring.data() + (t % 2) * kH;
  const float* e1 = tra_ring.data() + ((t + 1) % 2) * kH;
  float yg[kH];
  for (int c = 0; c < kH; ++c) {
    yg[c] = g.tra_db.data[c] + g.tra_dw.data[0 * kH + c] * e0[c] +
            g.tra_dw.data[1 * kH + c] * e1[c] +
            g.tra_dw.data[2 * kH + c] * e[c];
  }
  std::memcpy(tra_ring.data() + (t % 2) * kH, e, sizeof(e));
  FakeQuantRows(yg, kH, 1, g.gate_in);
  float gate[kH];
  for (int c = 0; c < kH; ++c) {
    float acc = g.tra_pb.data[c];
    for (int i = 0; i < kH; ++i) acc += g.tra_pw.data[c * kH + i] * yg[i];
    gate[c] = 1.f / (1.f + std::exp(-acc));
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

void TcnStepPC(const TcnPC& w, int d, float* x, std::vector<float>& ring,
               int t) {
  const int frame = kC * kFDown;
  const int L = 2 * d;
  float qx[kC * kFDown];
  std::memcpy(qx, x, sizeof(qx));
  FakeQuantRows(qx, kC, kFDown, w.pw1_in);
  float h[kC * kFDown];
  Pw(w.pw1_w, w.pw1_b, qx, kC, kFDown, h, kC);
  for (int i = 0; i < frame; ++i) h[i] = Prelu(h[i], w.a1);

  FakeQuantRows(h, kC, kFDown, w.dw_in);
  const float* tap0 = ring.data() + (t % L) * frame;        // x_{t-2d}
  const float* tap1 = ring.data() + ((t + d) % L) * frame;  // x_{t-d}
  float y[kC * kFDown];
  for (int c = 0; c < kC; ++c) {
    for (int f = 0; f < kFDown; ++f) {
      int i = c * kFDown + f;
      y[i] = w.dw_b.data[c] + w.dw_w.data[0 * kC + c] * tap0[i] +
             w.dw_w.data[1 * kC + c] * tap1[i] +
             w.dw_w.data[2 * kC + c] * h[i];
    }
  }
  std::memcpy(ring.data() + (t % L) * frame, h, sizeof(h));
  for (int i = 0; i < frame; ++i) y[i] = Prelu(y[i], w.a2);

  FakeQuantRows(y, kC, kFDown, w.pw3_in);
  float h3[kC * kFDown];
  Pw(w.pw3_w, w.pw3_b, y, kC, kFDown, h3, kC);
  for (int i = 0; i < frame; ++i) x[i] = Prelu(h3[i] + x[i], w.a3);
}

}  // namespace

WeightsPC WeightsPC::Load(const std::string& path) {
  Reader r(path);
  uint32_t magic = r.Scalar<uint32_t>();
  uint32_t count = r.Scalar<uint32_t>();
  if (magic != kMagicQ) throw std::runtime_error("bad GTM8 magic");
  if (count != 158) {
    throw std::runtime_error("GTM8 has " + std::to_string(count) +
                             " tensors, expected 158 (packing ABI drift?)");
  }

  WeightsPC w;
  w.bm_w = r.F32();
  w.bs_w = r.F32();
  w.sfe_w = r.Slot(1);  // (3, c, 1, 1)
  for (ConvPC* cw : {&w.en0, &w.en1}) {
    cw->w = r.Slot(1);  // (5, Co, Ci)
    cw->b = r.F32();
    cw->a = r.Alpha();
  }
  for (auto& g : w.enc) g = ReadGtconvPC(r, /*deconv=*/false);
  for (auto& t : w.tcn) t = ReadTcnPC(r);
  for (auto& g : w.dec) g = ReadGtconvPC(r, /*deconv=*/true);
  w.de3.w = r.Slot(1);
  w.de3.b = r.F32();
  w.de3.a = r.Alpha();
  w.de4.w = r.Slot(1);
  w.de4.b = r.F32();

  uint32_t act_bits = r.Scalar<uint32_t>();
  if (act_bits != 1) {
    throw std::runtime_error(
        "GTM8 artifact has act_bits=" + std::to_string(act_bits) +
        "; the per-channel engine expects a v3 artifact (act_bits=1) -- "
        "use the int8/int16 engines for v1/v2");
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
  for (int j = 0; j < 59; ++j) {
    uint32_t bits = r.Scalar<uint32_t>();
    if (bits != 8 && bits != 16) {
      throw std::runtime_error("GTM8 v3: bad per-boundary act bits " +
                               std::to_string(bits));
    }
    uint32_t lanes = r.Scalar<uint32_t>();
    if (lanes != 1 && lanes != slots[j].lanes) {
      throw std::runtime_error(
          "GTM8 v3: boundary " + std::to_string(j) + " has " +
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
  return w;
}

void EnginePC::Step(StreamState& st, const float* spec_re,
                    const float* spec_im, float* out_re,
                    float* out_im) const {
  const int t = st.t;

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

  // SFE-Lite depthwise freq conv
  FakeQuantRows(&feat[0][0], 3, kFErb, w_.sfe_in);
  float x129[3 * kFErb];
  for (int c = 0; c < 3; ++c) {
    for (int f = 0; f < kFErb; ++f) {
      float acc = 0.f;
      for (int kf = 0; kf < 3; ++kf) {
        int src = f + kf - 1;
        if (src < 0 || src >= kFErb) continue;
        acc += w_.sfe_w.data[kf * 3 + c] * feat[c][src];
      }
      x129[c * kFErb + f] = acc;
    }
  }

  // encoder
  FakeQuantRows(x129, 3, kFErb, w_.en0.in);
  float skip0[kC * 65], skip1[kC * kFDown];
  Conv5S2(w_.en0, x129, 3, kFErb, skip0, kC, 65);
  float q65[kC * 65];
  std::memcpy(q65, skip0, sizeof(q65));
  FakeQuantRows(q65, kC, 65, w_.en1.in);
  Conv5S2(w_.en1, q65, kC, 65, skip1, kC, kFDown);
  float x[kC * kFDown];
  std::memcpy(x, skip1, sizeof(x));
  float skips[3][kC * kFDown];
  for (int i = 0; i < 3; ++i) {
    GtconvStepPC(w_.enc[i], false, x, st.dw_ring[i], st.tra_ring[i], t);
    std::memcpy(skips[i], x, sizeof(x));
  }

  for (int i = 0; i < 8; ++i) {
    TcnStepPC(w_.tcn[i], 1 << (i % 4), x, st.tcn_ring[i], t);
  }

  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < kC * kFDown; ++j) x[j] += skips[2 - i][j];
    GtconvStepPC(w_.dec[i], true, x, st.dw_ring[3 + i], st.tra_ring[3 + i],
                 t);
  }
  for (int j = 0; j < kC * kFDown; ++j) x[j] += skip1[j];
  FakeQuantRows(x, kC, kFDown, w_.de3.in);
  float x65[kC * 65];
  Deconv5Up2(w_.de3, x, kC, kFDown, x65, kC, /*last_tanh=*/false);
  for (int j = 0; j < kC * 65; ++j) x65[j] += skip0[j];
  FakeQuantRows(x65, kC, 65, w_.de4.in);
  float m129[2 * kFErb];
  Deconv5Up2(w_.de4, x65, kC, 65, m129, 2, /*last_tanh=*/true);

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

void EnginePC::StepBatch(StreamState* states, const float* spec_re,
                         const float* spec_im, float* out_re, float* out_im,
                         int n) const {
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (n > 1)
#endif
  for (int i = 0; i < n; ++i) {
    Step(states[i], spec_re + i * kFFull, spec_im + i * kFFull,
         out_re + i * kFFull, out_im + i * kFFull);
  }
}

std::vector<float> EnginePC::EnhanceWav(
    const std::vector<float>& samples) const {
  StreamState st;
  return dsp::EnhanceOla(
      samples, [&](const float* re, const float* im, float* ore, float* oim) {
        Step(st, re, im, ore, oim);
      });
}

}  // namespace gtcrn
