// GTCRN-Micro native streaming engine implementation.
//
// Math mirrors gtcrn_micro_tpu/ops/fused_step.py `_forward_values` exactly
// (one packed-weight layout serves the Pallas kernel, the XLA paths and this
// runtime).  Activations are laid out [channel][freq] contiguous.

#include "gtcrn_micro.h"

#include <cmath>
#include <complex>
#include <cstring>
#include <fstream>
#include <stdexcept>

namespace gtcrn {

namespace {

constexpr uint32_t kMagic = 0x47544D31;  // "GTM1"

float Prelu(float x, float a) { return x > 0 ? x : a * x; }

// ---------------------------------------------------------------------------
// weight loading (format: io/export_native.py)
// ---------------------------------------------------------------------------

Tensor ReadTensor(std::ifstream& f) {
  uint32_t rank = 0;
  f.read(reinterpret_cast<char*>(&rank), 4);
  Tensor t;
  t.dims.resize(rank);
  f.read(reinterpret_cast<char*>(t.dims.data()), 4 * rank);
  size_t n = 1;
  for (auto d : t.dims) n *= d;
  t.data.resize(n);
  f.read(reinterpret_cast<char*>(t.data.data()), 4 * n);
  if (!f) throw std::runtime_error("truncated weights file");
  return t;
}

float ReadScalar(std::ifstream& f) { return ReadTensor(f).data.at(0); }

GTConvW ReadGtconv(std::ifstream& f) {
  GTConvW g;
  g.pw1_w = ReadTensor(f);
  g.pw1_b = ReadTensor(f);
  g.a1 = ReadScalar(f);
  g.dw_w = ReadTensor(f);
  g.dw_b = ReadTensor(f);
  g.a2 = ReadScalar(f);
  g.pw2_w = ReadTensor(f);
  g.pw2_b = ReadTensor(f);
  g.tra_dw = ReadTensor(f);
  g.tra_db = ReadTensor(f);
  g.tra_pw = ReadTensor(f);
  g.tra_pb = ReadTensor(f);
  return g;
}

TcnW ReadTcn(std::ifstream& f) {
  TcnW t;
  t.pw1_w = ReadTensor(f);
  t.pw1_b = ReadTensor(f);
  t.a1 = ReadScalar(f);
  t.dw_w = ReadTensor(f);
  t.dw_b = ReadTensor(f);
  t.a2 = ReadScalar(f);
  t.pw3_w = ReadTensor(f);
  t.pw3_b = ReadTensor(f);
  t.a3 = ReadScalar(f);
  return t;
}

// ---------------------------------------------------------------------------
// compute helpers ([C][F] activations)
// ---------------------------------------------------------------------------

// Kernels keep the frequency axis as the INNERMOST unit-stride loop over a
// contiguous accumulator row so the compiler auto-vectorizes them (each f
// lane is independent -- no float reduction, so no -ffast-math needed and
// the per-output addition ORDER matches the scalar form exactly: results
// are bit-identical).
constexpr int kFAcc = kFErb + 3;  // widest conv row (129) + margin

// (1,5) freq conv stride 2 pad 2 + bias + PReLU: in [Ci][F] -> out [Co][outF]
void Conv5S2(const ConvW& cw, const float* x, int ci_n, int f_in, float* out,
             int co_n, int f_out) {
  const float* w = cw.w.data.data();  // (5, Co, Ci)
  for (int co = 0; co < co_n; ++co) {
    float acc[kFAcc];
    for (int f = 0; f < f_out; ++f) acc[f] = cw.b.data[co];
    for (int k = 0; k < 5; ++k) {
      // src = 2f + k - 2 in [0, f_in)
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

// (1,5) transposed freq conv stride 2 pad 2: in [Ci][F] -> out [Co][2F-1].
// Split by output parity so the zero-stuffed taps become unit-stride: even
// outputs f=2j <- taps k in {0,2,4} at input i = j + (k-2)/2; odd outputs
// f=2j+1 <- taps k in {1,3} at i = j + (k-1)/2.
void Deconv5Up2(const ConvW& cw, const float* x, int ci_n, int f_in,
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
      const int di = even ? (k - 2) / 2 : (k - 1) / 2;  // input i = j + di
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

// pointwise channel mix: out[co][f] = b[co] + sum_ci w[co][ci] x[ci][f]
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

// depthwise 3-tap freq conv row kt of (9,C,1,1): acc += w[kt*3+kf][c]*tap.
// The per-position partial v[f] is accumulated in its own row first so the
// grouping (acc += (t0 + t1 + t2)) matches the scalar form bit-for-bit.
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

// full 3-tap freq conv row kt of (3,3,Co,Ci)
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

// GTConvBlock: x [16][33] in place; rings updated.  deconv selects the
// full-conv depthwise path (decoder).
void GtconvStep(const GTConvW& g, bool deconv, float* x,
                std::vector<float>& dw_ring, std::vector<float>& tra_ring,
                int t) {
  const int frame = kC * kFDown;
  float h[kC * kFDown];
  // pw1 on the active half (channels 0..8) + PReLU
  Pw(g.pw1_w, g.pw1_b, x, kH, kFDown, h, kC);
  for (int i = 0; i < kC * kFDown; ++i) h[i] = Prelu(h[i], g.a1);

  // depthwise over time taps: x_{t-2} at slot t%2, x_{t-1} at slot (t+1)%2
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
  for (int i = 0; i < kC * kFDown; ++i) y[i] = Prelu(y[i], g.a2);

  float h3[kH * kFDown];
  Pw(g.pw2_w, g.pw2_b, y, kC, kFDown, h3, kH);

  // TRA gate: frame energy -> causal depthwise k=3 -> pointwise -> sigmoid
  float e[kH];
  for (int c = 0; c < kH; ++c) {
    float s = 0.f;
    for (int f = 0; f < kFDown; ++f) s += h3[c * kFDown + f] * h3[c * kFDown + f];
    e[c] = s / kFDown;
  }
  const float* e0 = tra_ring.data() + (t % 2) * kH;
  const float* e1 = tra_ring.data() + ((t + 1) % 2) * kH;
  float yg[kH];
  for (int c = 0; c < kH; ++c) {
    yg[c] = g.tra_db.data[c] + g.tra_dw.data[0 * kH + c] * e0[c] +
            g.tra_dw.data[1 * kH + c] * e1[c] + g.tra_dw.data[2 * kH + c] * e[c];
  }
  std::memcpy(tra_ring.data() + (t % 2) * kH, e, sizeof(e));
  float gate[kH];
  for (int c = 0; c < kH; ++c) {
    float acc = g.tra_pb.data[c];
    for (int i = 0; i < kH; ++i) acc += g.tra_pw.data[c * kH + i] * yg[i];
    gate[c] = 1.f / (1.f + std::exp(-acc));
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

// Residual TCN block, dilation d: x [16][33] in place.
void TcnStep(const TcnW& w, int d, float* x, std::vector<float>& ring, int t) {
  const int frame = kC * kFDown;
  const int L = 2 * d;
  float h[kC * kFDown];
  Pw(w.pw1_w, w.pw1_b, x, kC, kFDown, h, kC);
  for (int i = 0; i < frame; ++i) h[i] = Prelu(h[i], w.a1);

  const float* tap0 = ring.data() + (t % L) * frame;        // x_{t-2d}
  const float* tap1 = ring.data() + ((t + d) % L) * frame;  // x_{t-d}
  float y[kC * kFDown];
  for (int c = 0; c < kC; ++c) {
    for (int f = 0; f < kFDown; ++f) {
      int i = c * kFDown + f;
      y[i] = w.dw_b.data[c] + w.dw_w.data[0 * kC + c] * tap0[i] +
             w.dw_w.data[1 * kC + c] * tap1[i] + w.dw_w.data[2 * kC + c] * h[i];
    }
  }
  std::memcpy(ring.data() + (t % L) * frame, h, sizeof(h));
  for (int i = 0; i < frame; ++i) y[i] = Prelu(y[i], w.a2);

  float h3[kC * kFDown];
  Pw(w.pw3_w, w.pw3_b, y, kC, kFDown, h3, kC);
  for (int i = 0; i < frame; ++i) x[i] = Prelu(h3[i] + x[i], w.a3);
}

}  // namespace

Weights Weights::Load(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  uint32_t magic = 0, count = 0;
  f.read(reinterpret_cast<char*>(&magic), 4);
  f.read(reinterpret_cast<char*>(&count), 4);
  if (magic != kMagic) throw std::runtime_error("bad weights magic");
  // the packing ABI (ops/fused_step.pack_weights) is 158 tensors; reject
  // drifted exports instead of silently loading weights into wrong fields
  constexpr uint32_t kExpectedTensors = 158;
  if (count != kExpectedTensors) {
    throw std::runtime_error(
        "weights file has " + std::to_string(count) + " tensors, expected " +
        std::to_string(kExpectedTensors) + " (packing ABI drift?)");
  }

  Weights w;
  w.bm_w = ReadTensor(f);
  w.bs_w = ReadTensor(f);
  w.sfe_w = ReadTensor(f);
  for (ConvW* cw : {&w.en0, &w.en1}) {
    cw->w = ReadTensor(f);
    cw->b = ReadTensor(f);
    cw->a = ReadScalar(f);
  }
  for (auto& g : w.enc) g = ReadGtconv(f);
  for (auto& t : w.tcn) t = ReadTcn(f);
  for (auto& g : w.dec) g = ReadGtconv(f);
  w.de3.w = ReadTensor(f);
  w.de3.b = ReadTensor(f);
  w.de3.a = ReadScalar(f);
  w.de4.w = ReadTensor(f);
  w.de4.b = ReadTensor(f);
  return w;
}

StreamState::StreamState() { Reset(); }

void StreamState::Reset() {
  for (auto& r : dw_ring) r.assign(2 * kC * kFDown, 0.f);
  for (auto& r : tra_ring) r.assign(2 * kH, 0.f);
  for (int i = 0; i < 8; ++i) {
    int d = 1 << (i % 4);
    tcn_ring[i].assign(2 * d * kC * kFDown, 0.f);
  }
  t = 0;
}

void Engine::Step(StreamState& st, const float* spec_re, const float* spec_im,
                  float* out_re, float* out_im) const {
  const int t = st.t;

  // feature stack [mag, re, im] -> ERB band merge (reference :512-517)
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

  // SFE-Lite depthwise freq conv (reference :77-90)
  float x129[3][kFErb];
  for (int c = 0; c < 3; ++c) {
    for (int f = 0; f < kFErb; ++f) {
      float acc = 0.f;
      for (int kf = 0; kf < 3; ++kf) {
        int src = f + kf - 1;
        if (src < 0 || src >= kFErb) continue;
        acc += w_.sfe_w.data[kf * 3 + c] * feat[c][src];
      }
      x129[c][f] = acc;
    }
  }

  // encoder
  float skip0[kC * 65], skip1[kC * kFDown];
  Conv5S2(w_.en0, &x129[0][0], 3, kFErb, skip0, kC, 65);
  Conv5S2(w_.en1, skip0, kC, 65, skip1, kC, kFDown);
  float x[kC * kFDown];
  std::memcpy(x, skip1, sizeof(x));
  float skips[3][kC * kFDown];
  for (int i = 0; i < 3; ++i) {
    GtconvStep(w_.enc[i], false, x, st.dw_ring[i], st.tra_ring[i], t);
    std::memcpy(skips[i], x, sizeof(x));
  }

  // GTCN x2 (dilations 1,2,4,8 each)
  for (int i = 0; i < 8; ++i) {
    TcnStep(w_.tcn[i], 1 << (i % 4), x, st.tcn_ring[i], t);
  }

  // decoder with additive skips (reference :468)
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < kC * kFDown; ++j) x[j] += skips[2 - i][j];
    GtconvStep(w_.dec[i], true, x, st.dw_ring[3 + i], st.tra_ring[3 + i], t);
  }
  for (int j = 0; j < kC * kFDown; ++j) x[j] += skip1[j];
  float x65[kC * 65];
  Deconv5Up2(w_.de3, x, kC, kFDown, x65, kC, /*last_tanh=*/false);
  for (int j = 0; j < kC * 65; ++j) x65[j] += skip0[j];
  float m129[2 * kFErb];
  Deconv5Up2(w_.de4, x65, kC, 65, m129, 2, /*last_tanh=*/true);

  // ERB band split + CRM mask (reference :69-73, :472-482)
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

// ---------------------------------------------------------------------------
// DSP: sqrt-Hann STFT / iSTFT (torch-compatible: center, reflect pad,
// synthesis-window-square OLA normalization)
// ---------------------------------------------------------------------------

namespace dsp {

std::vector<float> SqrtHann512() {
  std::vector<float> w(512);
  for (int i = 0; i < 512; ++i) {
    double h = 0.5 * (1.0 - std::cos(2.0 * M_PI * i / 512.0));
    w[i] = static_cast<float>(std::sqrt(h));
  }
  return w;
}

namespace {
void FftRec(std::complex<double>* a, int n) {  // iterative radix-2
  // bit reversal
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (int len = 2; len <= n; len <<= 1) {
    double ang = -2.0 * M_PI / len;
    std::complex<double> wl(std::cos(ang), std::sin(ang));
    for (int i = 0; i < n; i += len) {
      std::complex<double> w(1.0, 0.0);
      for (int j = 0; j < len / 2; ++j) {
        auto u = a[i + j], v = a[i + j + len / 2] * w;
        a[i + j] = u + v;
        a[i + j + len / 2] = u - v;
        w *= wl;
      }
    }
  }
}
}  // namespace

void Fft512(const float* re_in, float* re_out, float* im_out) {
  std::complex<double> buf[512];
  for (int i = 0; i < 512; ++i) buf[i] = {re_in[i], 0.0};
  FftRec(buf, 512);
  for (int k = 0; k <= 256; ++k) {
    re_out[k] = static_cast<float>(buf[k].real());
    im_out[k] = static_cast<float>(buf[k].imag());
  }
}

namespace {
// inverse rfft of 257 bins -> 512 real samples
void Irfft512(const float* re, const float* im, float* out) {
  std::complex<double> buf[512];
  for (int k = 0; k <= 256; ++k) buf[k] = {re[k], im[k]};
  for (int k = 257; k < 512; ++k) {
    buf[k] = std::conj(buf[512 - k]);
  }
  // inverse via conj trick
  for (int k = 0; k < 512; ++k) buf[k] = std::conj(buf[k]);
  FftRec(buf, 512);
  for (int i = 0; i < 512; ++i) {
    out[i] = static_cast<float>(std::conj(buf[i]).real() / 512.0);
  }
}
}  // namespace

}  // namespace dsp

namespace dsp {

std::vector<float> EnhanceOla(
    const std::vector<float>& samples,
    const std::function<void(const float*, const float*, float*, float*)>&
        step) {
  const int n = static_cast<int>(samples.size());
  const int hop = 256, nfft = 512, pad = 256;
  if (n < 2) return samples;  // reflection undefined; nothing to enhance
  auto win = SqrtHann512();

  // center reflect pad (torch.stft center=True); iterate the reflection so
  // inputs shorter than the pad bounce correctly instead of clamping
  std::vector<float> x(n + 2 * pad);
  for (int i = 0; i < n + 2 * pad; ++i) {
    int src = i - pad;
    while (src < 0 || src >= n) {
      if (src < 0) src = -src;
      if (src >= n) src = 2 * (n - 1) - src;
    }
    x[i] = samples[src];
  }
  const int frames = n / hop + 1;

  std::vector<float> ola(n + 2 * pad + nfft, 0.f);
  std::vector<float> wsum(n + 2 * pad + nfft, 0.f);
  std::vector<float> fr(nfft), re(kFFull), im(kFFull), ore(kFFull),
      oim(kFFull), t512(nfft);
  for (int k = 0; k < frames; ++k) {
    for (int i = 0; i < nfft; ++i) fr[i] = x[k * hop + i] * win[i];
    Fft512(fr.data(), re.data(), im.data());
    step(re.data(), im.data(), ore.data(), oim.data());
    Irfft512(ore.data(), oim.data(), t512.data());
    for (int i = 0; i < nfft; ++i) {
      ola[k * hop + i] += t512[i] * win[i];
      wsum[k * hop + i] += win[i] * win[i];
    }
  }
  std::vector<float> out(n);
  for (int i = 0; i < n; ++i) {
    float d = wsum[i + pad];
    out[i] = d > 1e-11f ? ola[i + pad] / d : 0.f;
  }
  return out;
}

AudioStream::AudioStream()
    : win_(SqrtHann512()), env_(256), in_buf_(256, 0.f), ola_buf_(256, 0.f) {
  // squared-window OLA envelope at emitted samples: the 2-term Hann
  // partition of unity (every partial-envelope sample lies inside the
  // center trim the stream never emits)
  for (int i = 0; i < 256; ++i) {
    env_[i] = win_[i] * win_[i] + win_[i + 256] * win_[i + 256];
  }
}

void AudioStream::Push(
    const std::function<void(const float*, const float*, float*, float*)>&
        step,
    const float* hop_in, float* hop_out) {
  float fr[512], re[kFFull], im[kFFull], ore[kFFull], oim[kFFull], t512[512];
  for (int i = 0; i < 256; ++i) fr[i] = in_buf_[i] * win_[i];
  for (int i = 0; i < 256; ++i) fr[256 + i] = hop_in[i] * win_[256 + i];
  Fft512(fr, re, im);
  step(re, im, ore, oim);
  Irfft512(ore, oim, t512);
  for (int i = 0; i < 256; ++i) {
    hop_out[i] = (ola_buf_[i] + t512[i] * win_[i]) / env_[i];
    ola_buf_[i] = t512[256 + i] * win_[256 + i];
    in_buf_[i] = hop_in[i];
  }
}

}  // namespace dsp

std::vector<float> Engine::EnhanceWav(const std::vector<float>& samples) const {
  StreamState st;
  return dsp::EnhanceOla(
      samples, [&](const float* re, const float* im, float* ore, float* oim) {
        Step(st, re, im, ore, oim);
      });
}

void Engine::StepBatch(StreamState* states, const float* spec_re,
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

}  // namespace gtcrn
