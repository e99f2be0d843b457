// GTCRN-Micro native streaming engine (C++17, no dependencies).
//
// The TPU-native framework's deployment runtime: the counterpart of the
// reference's ESP32-S3 TFLite-Micro runner (reference esp32_s3/main/main.cc)
// -- a self-contained C++ engine that loads the exported weights
// (io/export_native.py, BN-folded, same packing as the Pallas kernel) and
// runs the streaming model frame-by-frame with O(1) ring-buffer state.
//
// Reference model graph: gtcrn_micro/models/gtcrn_micro.py:485-532.

#pragma once

#include <array>
#include <cstdint>
#include <functional>
#include <string>
#include <vector>

namespace gtcrn {

constexpr int kFFull = 257;
constexpr int kFErb = 129;
constexpr int kFDown = 33;
constexpr int kC = 16;
constexpr int kH = 8;

struct Tensor {
  std::vector<uint32_t> dims;
  std::vector<float> data;
  float at(size_t i) const { return data[i]; }
};

// Weights for one GTConvBlock (encoder: depthwise 3x3; decoder: full 3x3).
struct GTConvW {
  Tensor pw1_w, pw1_b;  // (16,8), (16,1,1)
  float a1;
  Tensor dw_w, dw_b;  // enc (9,16,1,1) / dec (3,3,16,16), (16,1,1)
  float a2;
  Tensor pw2_w, pw2_b;  // (8,16), (8,1,1)
  Tensor tra_dw, tra_db, tra_pw, tra_pb;  // (3,8,1),(8,1),(8,8),(8,1)
};

struct TcnW {
  Tensor pw1_w, pw1_b;  // (16,16), (16,1,1)
  float a1;
  Tensor dw_w, dw_b;  // (3,16,1,1), (16,1,1)
  float a2;
  Tensor pw3_w, pw3_b;
  float a3;
};

struct ConvW {
  Tensor w, b;  // (5,Co,Ci), (Co,1,1)
  float a = 0.f;
};

struct Weights {
  Tensor bm_w, bs_w, sfe_w;  // (64,192), (192,64), (3,3,1,1)
  ConvW en0, en1, de3, de4;
  std::array<GTConvW, 3> enc;
  std::array<GTConvW, 3> dec;
  std::array<TcnW, 8> tcn;  // gtcn1 b0..b3, gtcn2 b0..b3

  static Weights Load(const std::string& path);  // throws on error
};

// Per-stream ring-buffer state (the reference's canonical cache inventory,
// gtcrn_micro_stream.py:617-623, as rings with a mod-16 step counter).
struct StreamState {
  // GTConv depthwise rings: (2, 16, 33) each; TRA rings: (2, 8)
  std::array<std::vector<float>, 6> dw_ring;   // enc0..2, dec0..2
  std::array<std::vector<float>, 6> tra_ring;  // matching order
  // TCN rings: (2d, 16, 33), d = 1,2,4,8 x2
  std::array<std::vector<float>, 8> tcn_ring;
  int t = 0;

  StreamState();
  void Reset();
};

class Engine {
 public:
  explicit Engine(const std::string& weights_path)
      : w_(Weights::Load(weights_path)) {}
  explicit Engine(Weights w) : w_(std::move(w)) {}

  // One frame: spec_re/spec_im are 257 floats each (STFT bin values);
  // enhanced spectrum written to out_re/out_im.  Advances the state.
  void Step(StreamState& st, const float* spec_re, const float* spec_im,
            float* out_re, float* out_im) const;

  // Batched serving: n independent streams, buffers laid out [n][257].
  // (The reference's TFLM runner serves ONE stream per device; this is the
  // multi-stream server API, parallelised across cores when OpenMP exists.)
  void StepBatch(StreamState* states, const float* spec_re,
                 const float* spec_im, float* out_re, float* out_im,
                 int n) const;

  // Whole-utterance enhancement: 16 kHz samples in, same length out
  // (sqrt-Hann STFT 512/256, streaming steps, iSTFT overlap-add).
  std::vector<float> EnhanceWav(const std::vector<float>& samples) const;

 private:
  Weights w_;
};

// ---------------------------------------------------------------------------
// Full-integer int8 engine (the reference's actual deployment format:
// full-integer .tflite via onnx2tf -oiqt, scripts/onnx2tf.sh:50-64, executed
// by the TFLM int8 interpreter on the ESP32-S3, esp32_s3/main/main.cc).
//
// Quantization scheme == gtcrn_micro_tpu/quant (TFLite-compatible):
// per-out-channel symmetric int8 weights (BN-folded), per-tensor asymmetric
// int8 activations at every conv/matmul boundary, int32 accumulation,
// float rescale.  Ring buffers store int8: HALF the state memory of the
// fp32 engine.  Artifact: io/export_native.py GTM8 format.
// ---------------------------------------------------------------------------

struct QTensor {
  std::vector<uint32_t> dims;
  std::vector<int8_t> data;
  std::vector<float> scale;  // per out-channel
};

struct ActQ {  // activation qparams: x ~ (q - zero) * scale
  float scale = 1.f;
  int32_t zero = 0;
  // clamp bounds of this boundary's integer grid (int8: [-128,127];
  // int16: [-32768,32767]).  Mixed-precision artifacts (GTM8 v2,
  // io/export_native.py) carry per-boundary bounds; uniform artifacts get
  // them from the global act_bits at load.
  float qlo = -128.f;
  float qhi = 127.f;
};

struct GTConvQ {
  QTensor pw1_w, dw_w, pw2_w, tra_dw, tra_pw;
  Tensor pw1_b, dw_b, pw2_b, tra_db, tra_pb;
  float a1, a2;
  ActQ pw1_in, dw_in, pw2_in, energy, gate_in;
};

struct TcnQ {
  QTensor pw1_w, dw_w, pw3_w;
  Tensor pw1_b, dw_b, pw3_b;
  float a1, a2, a3;
  ActQ pw1_in, dw_in, pw3_in;
};

struct ConvQ {
  QTensor w;
  Tensor b;
  float a = 0.f;
  ActQ in;
};

struct WeightsQ {
  Tensor bm_w, bs_w;  // ERB filterbank stays fp32 (not a quant boundary)
  QTensor sfe_w;
  ActQ sfe_in;
  ConvQ en0, en1, de3, de4;
  std::array<GTConvQ, 3> enc;
  std::array<GTConvQ, 3> dec;
  std::array<TcnQ, 8> tcn;
  // 8 = full-int8; 16 = TFLite-style 16x8 mode; 0 = MIXED per-boundary
  // precision (GTM8 v2: int16 at the quality-binding boundaries, int8
  // elsewhere -- runs on the int16 engine)
  uint32_t act_bits = 8;

  static WeightsQ Load(const std::string& path);  // throws on error
};

// Integer ring-buffer state: same inventory as StreamState, TAct-sized.
// Fresh rings must hold each boundary's ZERO POINT (a float 0 quantizes to
// q == zero, not q == 0), so initialisation needs the engine:
// EngineQT::InitState.  The default constructor leaves rings at raw 0 --
// always pass states through InitState/engine reset before stepping.
template <typename TAct>
struct StreamStateQT {
  std::array<std::vector<TAct>, 6> dw_ring;   // enc0..2, dec0..2
  std::array<std::vector<TAct>, 6> tra_ring;  // quantized energy frames
  std::array<std::vector<TAct>, 8> tcn_ring;
  int t = 0;

  StreamStateQT();
};

// TAct = int8_t: the full-int8 artifact (the reference's deployment
// format); TAct = int16_t: the 16x8 mode (int16 activations, int8 weights
// -- TFLite's high-dynamic-range escape hatch, and the quality-viable
// quantized mode for this model family: EVAL.md).
template <typename TAct>
class EngineQT {
 public:
  explicit EngineQT(const std::string& weights_path)
      : w_(WeightsQ::Load(weights_path)) {
    CheckActBits();
  }
  explicit EngineQT(WeightsQ w) : w_(std::move(w)) { CheckActBits(); }

  // Fill rings with the respective boundaries' zero points (== float 0).
  void InitState(StreamStateQT<TAct>& st) const;

  void Step(StreamStateQT<TAct>& st, const float* spec_re,
            const float* spec_im, float* out_re, float* out_im) const;
  void StepBatch(StreamStateQT<TAct>* states, const float* spec_re,
                 const float* spec_im, float* out_re, float* out_im,
                 int n) const;
  std::vector<float> EnhanceWav(const std::vector<float>& samples) const;

 private:
  void CheckActBits() const;
  WeightsQ w_;
};

using StreamStateQ = StreamStateQT<int8_t>;
using StreamStateQ16 = StreamStateQT<int16_t>;
using EngineQ = EngineQT<int8_t>;
using EngineQ16 = EngineQT<int16_t>;

extern template struct StreamStateQT<int8_t>;
extern template struct StreamStateQT<int16_t>;
extern template class EngineQT<int8_t>;
extern template class EngineQT<int16_t>;

// ---------------------------------------------------------------------------
// Per-channel activation engine (GTM8 v3, native/gtcrn_micro_pc.cc).
//
// r4b finding (EVAL.md): per-tensor activation scales are the binding
// quality constraint of the integer artifacts -- the hot boundaries spread
// up to 26x across their 16 lanes, and per-lane scales lift held-out
// quality 5-9 dB (16x8 mode: 24.3 -> 29.7 dB untrained).  Per-lane scales
// on MIXING conv inputs cannot ride an integer MAC without folding, so
// this engine trades integer compute for quality: int8 weights are
// dequantized once at load (flash-size win retained), activations pass
// through per-lane quantize-dequantize at each of the 59 boundaries
// (numerics == the JAX per-channel fake-quant sim), and the MACs run
// fp32 (on FPU hosts this is FASTER than the int engines; MCU vector
// units keep the v1/v2 per-tensor engines).
// ---------------------------------------------------------------------------

struct ActQV {  // per-lane activation qparams: x_c ~ (q - zero[c]) * scale[c]
  std::vector<float> scale;
  std::vector<int32_t> zero;
  float qlo = -128.f;
  float qhi = 127.f;
};

struct GTConvPC {
  Tensor pw1_w, pw1_b, dw_w, dw_b, pw2_w, pw2_b;  // dequantized at load
  float a1, a2;
  Tensor tra_dw, tra_db, tra_pw, tra_pb;
  ActQV pw1_in, dw_in, pw2_in, energy, gate_in;
};

struct TcnPC {
  Tensor pw1_w, pw1_b, dw_w, dw_b, pw3_w, pw3_b;
  float a1, a2, a3;
  ActQV pw1_in, dw_in, pw3_in;
};

struct ConvPC {
  Tensor w, b;
  float a = 0.f;
  ActQV in;
};

struct WeightsPC {
  Tensor bm_w, bs_w, sfe_w;
  ActQV sfe_in;
  ConvPC en0, en1, de3, de4;
  std::array<GTConvPC, 3> enc;
  std::array<GTConvPC, 3> dec;
  std::array<TcnPC, 8> tcn;

  static WeightsPC Load(const std::string& path);  // throws on error
};

// Rings hold fake-quantized FLOATS (exactly what the JAX sim's rings hold:
// fake-quant is idempotent, nn/core.py), so fresh rings are plain zeros
// (float 0 is exactly representable on every boundary's grid).
class EnginePC {
 public:
  explicit EnginePC(const std::string& weights_path)
      : w_(WeightsPC::Load(weights_path)) {}
  explicit EnginePC(WeightsPC w) : w_(std::move(w)) {}

  void Step(StreamState& st, const float* spec_re, const float* spec_im,
            float* out_re, float* out_im) const;
  void StepBatch(StreamState* states, const float* spec_re,
                 const float* spec_im, float* out_re, float* out_im,
                 int n) const;
  std::vector<float> EnhanceWav(const std::vector<float>& samples) const;

 private:
  WeightsPC w_;
};

// ---------------------------------------------------------------------------
// Full-integer per-channel engine (GTM8 v4, native/gtcrn_micro_v4.cc).
//
// The v3 PC engine above buys per-lane activation quality with fp32 MACs.
// v4 gets BOTH: at export every int8 weight slot is quantized on its
// act-scale-FOLDED tensor (w * s_in along the in-lane axis), so the integer
// dot  sum_i W[o,i] * (q_i - z_i)  needs only ONE float rescale -- the
// folded per-out-channel weight scale -- per output, exactly like the
// per-tensor engines.  This is the reference deployment story
// (full-integer TFLM, esp32_s3/main/main.cc:85-117) carried to the
// per-channel grid.  Numerics == quant.ptq.QuantizedModel(v4=True).
// ---------------------------------------------------------------------------

struct GTConvV4 {
  QTensor pw1_w, dw_w, pw2_w, tra_dw, tra_pw;  // act-scale-folded int8
  Tensor pw1_b, dw_b, pw2_b, tra_db, tra_pb;
  float a1, a2;
  ActQV pw1_in, dw_in, pw2_in, energy, gate_in;
  // zero-offset tables precomputed at load (weights x per-lane zeros are
  // both artifact constants), so the hot loops run pure integer MACs:
  // pw*_zoff[co] = sum_ci w[co,ci]*z_ci; dw_z{full,0,32}[c] = the 3-tap
  // freq conv's z-weighted tap sums (full range / f==0 / f==kFDown-1
  // boundary-clip corrections, summed over all 3 time taps).
  std::vector<int32_t> pw1_zoff, pw2_zoff, tra_pw_zoff, tra_dw_zoff;
  std::vector<int32_t> dw_zfull, dw_z0, dw_z32;
};

struct TcnV4 {
  QTensor pw1_w, dw_w, pw3_w;
  Tensor pw1_b, dw_b, pw3_b;
  float a1, a2, a3;
  ActQV pw1_in, dw_in, pw3_in;
  std::vector<int32_t> pw1_zoff, pw3_zoff, dw_zoff;  // see GTConvV4
};

struct ConvV4 {
  QTensor w;
  Tensor b;
  float a = 0.f;
  ActQV in;
  std::vector<int32_t> kz;  // per (tap k, co): sum_ci w[k,co,ci]*z_ci
};

struct WeightsV4 {
  Tensor bm_w, bs_w;
  QTensor sfe_w;
  ActQV sfe_in;
  ConvV4 en0, en1, de3, de4;
  std::array<GTConvV4, 3> enc;
  std::array<GTConvV4, 3> dec;
  std::array<TcnV4, 8> tcn;
  uint32_t max_bits = 16;  // widest per-boundary act grid in the artifact

  static WeightsV4 Load(const std::string& path);  // throws on error
};

// Rings hold per-lane-quantized integers (StreamStateQT); fresh rings take
// each boundary's PER-LANE zero points -- use InitState.
template <typename TAct>
class EngineV4T {
 public:
  explicit EngineV4T(const std::string& weights_path)
      : w_(WeightsV4::Load(weights_path)) {
    CheckActBits();
  }
  explicit EngineV4T(WeightsV4 w) : w_(std::move(w)) { CheckActBits(); }

  void InitState(StreamStateQT<TAct>& st) const;
  void Step(StreamStateQT<TAct>& st, const float* spec_re,
            const float* spec_im, float* out_re, float* out_im) const;
  void StepBatch(StreamStateQT<TAct>* states, const float* spec_re,
                 const float* spec_im, float* out_re, float* out_im,
                 int n) const;
  std::vector<float> EnhanceWav(const std::vector<float>& samples) const;

 private:
  void CheckActBits() const;
  WeightsV4 w_;
};

using EngineV4 = EngineV4T<int16_t>;   // 16x8 per-channel (quality grid)
using EngineV48 = EngineV4T<int8_t>;   // full-int8 per-channel

extern template class EngineV4T<int8_t>;
extern template class EngineV4T<int16_t>;

// torch-compatible sqrt-Hann STFT helpers (torch.stft center=true, reflect
// pad; istft with synthesis-window-square normalization).
namespace dsp {
void Fft512(const float* re_in, float* re_out, float* im_out);  // real FFT
std::vector<float> SqrtHann512();
// whole-utterance STFT -> per-frame step -> iSTFT overlap-add, shared by the
// fp32 and int8 engines.  step(spec_re, spec_im, out_re, out_im) advances
// its own captured state.
std::vector<float> EnhanceOla(
    const std::vector<float>& samples,
    const std::function<void(const float*, const float*, float*, float*)>&
        step);

// Online (chunked) framing: one 256-sample hop in -> one enhanced hop out,
// with O(1) carried state -- TRUE streaming (EnhanceOla above, like the
// reference runner, needs the whole wav to reflect-pad).  Mirrors the JAX
// dsp/stream_dsp.py contract exactly: the analysis left context starts at
// zeros (offline frame 0 reflects a future sample a live stream has not
// seen), output runs one hop behind the input, and the FIRST emitted hop
// is the offline center-trim region -- callers drop it.  Feed one zero hop
// at end-of-stream to flush the final output hop.
class AudioStream {
 public:
  AudioStream();
  // step() is one engine frame (spec_re, spec_im, out_re, out_im), e.g. a
  // lambda closing over Engine::Step and a StreamState.
  void Push(
      const std::function<void(const float*, const float*, float*, float*)>&
          step,
      const float* hop_in, float* hop_out);

 private:
  std::vector<float> win_, env_, in_buf_, ola_buf_;
};
}  // namespace dsp

}  // namespace gtcrn
