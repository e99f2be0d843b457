// C ABI for the native engine (consumed by gtcrn_micro_tpu/runtime/native.py
// via ctypes -- pybind11 is not available in this environment).

#include <cstring>
#include <new>

#include "gtcrn_micro.h"

extern "C" {

void* gtm_engine_create(const char* weights_path) {
  try {
    return new gtcrn::Engine(weights_path);
  } catch (...) {
    return nullptr;
  }
}

void gtm_engine_destroy(void* engine) {
  delete static_cast<gtcrn::Engine*>(engine);
}

void* gtm_state_create() { return new (std::nothrow) gtcrn::StreamState(); }

void gtm_state_destroy(void* state) {
  delete static_cast<gtcrn::StreamState*>(state);
}

void gtm_state_reset(void* state) {
  static_cast<gtcrn::StreamState*>(state)->Reset();
}

// spec / out: 257 re followed by 257 im
void gtm_step(void* engine, void* state, const float* spec, float* out) {
  auto* e = static_cast<gtcrn::Engine*>(engine);
  auto* s = static_cast<gtcrn::StreamState*>(state);
  e->Step(*s, spec, spec + 257, out, out + 257);
}

// samples in/out, same length
void gtm_enhance(void* engine, const float* samples, int n, float* out) {
  auto* e = static_cast<gtcrn::Engine*>(engine);
  std::vector<float> in(samples, samples + n);
  auto res = e->EnhanceWav(in);
  std::memcpy(out, res.data(), sizeof(float) * n);
}

}  // extern "C"
