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

  // Whole-utterance enhancement: 16 kHz samples in, same length out
  // (sqrt-Hann STFT 512/256, streaming steps, iSTFT overlap-add).
  std::vector<float> EnhanceWav(const std::vector<float>& samples) const;

 private:
  Weights w_;
};

// torch-compatible sqrt-Hann STFT helpers (torch.stft center=true, reflect
// pad; istft with synthesis-window-square normalization).
namespace dsp {
void Fft512(const float* re_in, float* re_out, float* im_out);  // real FFT
std::vector<float> SqrtHann512();
}  // namespace dsp

}  // namespace gtcrn
