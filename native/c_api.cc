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

// engine arg unused for fp32 (zero-filled rings are correct) -- kept for
// signature symmetry with the int8 variants
void* gtm_state_create(void* /*engine*/) {
  return new (std::nothrow) gtcrn::StreamState();
}

void gtm_state_destroy(void* state) {
  delete static_cast<gtcrn::StreamState*>(state);
}

void gtm_state_reset(void* /*engine*/, void* state) {
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

// Batched serving: n streams, spec laid out [n][2][257] (re then im per
// stream, matching gtm_step), states created by gtm_state_batch_create.
void* gtm_state_batch_create(void* /*engine*/, int n) {
  return new (std::nothrow) std::vector<gtcrn::StreamState>(n);
}

void gtm_state_batch_destroy(void* states) {
  delete static_cast<std::vector<gtcrn::StreamState>*>(states);
}

void gtm_step_batch(void* engine, void* states, const float* spec, float* out,
                    int n) {
  auto* e = static_cast<gtcrn::Engine*>(engine);
  auto* s = static_cast<std::vector<gtcrn::StreamState>*>(states);
  // de-interleave [n][2][257] into [n][257] re / im planes
  std::vector<float> re(n * 257), im(n * 257), ore(n * 257), oim(n * 257);
  for (int i = 0; i < n; ++i) {
    std::memcpy(re.data() + i * 257, spec + i * 514, 257 * sizeof(float));
    std::memcpy(im.data() + i * 257, spec + i * 514 + 257,
                257 * sizeof(float));
  }
  e->StepBatch(s->data(), re.data(), im.data(), ore.data(), oim.data(), n);
  for (int i = 0; i < n; ++i) {
    std::memcpy(out + i * 514, ore.data() + i * 257, 257 * sizeof(float));
    std::memcpy(out + i * 514 + 257, oim.data() + i * 257,
                257 * sizeof(float));
  }
}

// ---- full-integer int8 engine (GTM8 artifact) ----

void* gtm_qengine_create(const char* weights_path) {
  try {
    return new gtcrn::EngineQ(weights_path);
  } catch (...) {
    return nullptr;
  }
}

void gtm_qengine_destroy(void* engine) {
  delete static_cast<gtcrn::EngineQ*>(engine);
}

// int8 states need the engine: fresh rings hold the boundaries' zero points
void* gtm_qstate_create(void* engine) {
  auto* s = new (std::nothrow) gtcrn::StreamStateQ();
  if (s && engine) static_cast<gtcrn::EngineQ*>(engine)->InitState(*s);
  return s;
}

void gtm_qstate_destroy(void* state) {
  delete static_cast<gtcrn::StreamStateQ*>(state);
}

void gtm_qstate_reset(void* engine, void* state) {
  static_cast<gtcrn::EngineQ*>(engine)->InitState(
      *static_cast<gtcrn::StreamStateQ*>(state));
}

void gtm_qstep(void* engine, void* state, const float* spec, float* out) {
  auto* e = static_cast<gtcrn::EngineQ*>(engine);
  auto* s = static_cast<gtcrn::StreamStateQ*>(state);
  e->Step(*s, spec, spec + 257, out, out + 257);
}

void gtm_qenhance(void* engine, const float* samples, int n, float* out) {
  auto* e = static_cast<gtcrn::EngineQ*>(engine);
  std::vector<float> in(samples, samples + n);
  auto res = e->EnhanceWav(in);
  std::memcpy(out, res.data(), sizeof(float) * n);
}

void* gtm_qstate_batch_create(void* engine, int n) {
  auto* v = new (std::nothrow) std::vector<gtcrn::StreamStateQ>(n);
  if (v && engine) {
    for (auto& s : *v) static_cast<gtcrn::EngineQ*>(engine)->InitState(s);
  }
  return v;
}

void gtm_qstate_batch_destroy(void* states) {
  delete static_cast<std::vector<gtcrn::StreamStateQ>*>(states);
}

void gtm_qstep_batch(void* engine, void* states, const float* spec,
                     float* out, int n) {
  auto* e = static_cast<gtcrn::EngineQ*>(engine);
  auto* s = static_cast<std::vector<gtcrn::StreamStateQ>*>(states);
  std::vector<float> re(n * 257), im(n * 257), ore(n * 257), oim(n * 257);
  for (int i = 0; i < n; ++i) {
    std::memcpy(re.data() + i * 257, spec + i * 514, 257 * sizeof(float));
    std::memcpy(im.data() + i * 257, spec + i * 514 + 257,
                257 * sizeof(float));
  }
  e->StepBatch(s->data(), re.data(), im.data(), ore.data(), oim.data(), n);
  for (int i = 0; i < n; ++i) {
    std::memcpy(out + i * 514, ore.data() + i * 257, 257 * sizeof(float));
    std::memcpy(out + i * 514 + 257, oim.data() + i * 257,
                257 * sizeof(float));
  }
}

// ---- 16x8 engine (int16 activations / int8 weights GTM8 artifact) ----

void* gtm_q16engine_create(const char* weights_path) {
  try {
    return new gtcrn::EngineQ16(weights_path);
  } catch (...) {
    return nullptr;
  }
}

void gtm_q16engine_destroy(void* engine) {
  delete static_cast<gtcrn::EngineQ16*>(engine);
}

void* gtm_q16state_create(void* engine) {
  auto* s = new (std::nothrow) gtcrn::StreamStateQ16();
  if (s && engine) static_cast<gtcrn::EngineQ16*>(engine)->InitState(*s);
  return s;
}

void gtm_q16state_destroy(void* state) {
  delete static_cast<gtcrn::StreamStateQ16*>(state);
}

void gtm_q16state_reset(void* engine, void* state) {
  static_cast<gtcrn::EngineQ16*>(engine)->InitState(
      *static_cast<gtcrn::StreamStateQ16*>(state));
}

void gtm_q16step(void* engine, void* state, const float* spec, float* out) {
  auto* e = static_cast<gtcrn::EngineQ16*>(engine);
  auto* s = static_cast<gtcrn::StreamStateQ16*>(state);
  e->Step(*s, spec, spec + 257, out, out + 257);
}

void gtm_q16enhance(void* engine, const float* samples, int n, float* out) {
  auto* e = static_cast<gtcrn::EngineQ16*>(engine);
  std::vector<float> in(samples, samples + n);
  auto res = e->EnhanceWav(in);
  std::memcpy(out, res.data(), sizeof(float) * n);
}

void* gtm_q16state_batch_create(void* engine, int n) {
  auto* v = new (std::nothrow) std::vector<gtcrn::StreamStateQ16>(n);
  if (v && engine) {
    for (auto& s : *v) static_cast<gtcrn::EngineQ16*>(engine)->InitState(s);
  }
  return v;
}

void gtm_q16state_batch_destroy(void* states) {
  delete static_cast<std::vector<gtcrn::StreamStateQ16>*>(states);
}

void gtm_q16step_batch(void* engine, void* states, const float* spec,
                       float* out, int n) {
  auto* e = static_cast<gtcrn::EngineQ16*>(engine);
  auto* s = static_cast<std::vector<gtcrn::StreamStateQ16>*>(states);
  std::vector<float> re(n * 257), im(n * 257), ore(n * 257), oim(n * 257);
  for (int i = 0; i < n; ++i) {
    std::memcpy(re.data() + i * 257, spec + i * 514, 257 * sizeof(float));
    std::memcpy(im.data() + i * 257, spec + i * 514 + 257,
                257 * sizeof(float));
  }
  e->StepBatch(s->data(), re.data(), im.data(), ore.data(), oim.data(), n);
  for (int i = 0; i < n; ++i) {
    std::memcpy(out + i * 514, ore.data() + i * 257, 257 * sizeof(float));
    std::memcpy(out + i * 514 + 257, oim.data() + i * 257,
                257 * sizeof(float));
  }
}

// ---- per-channel-activation engine (GTM8 v3 artifact) ----
// fp32 StreamState (rings hold fake-quantized floats), so the fp32 state
// helpers are reused; fresh zero rings are already correct.

void* gtm_pcengine_create(const char* weights_path) {
  try {
    return new gtcrn::EnginePC(weights_path);
  } catch (...) {
    return nullptr;
  }
}

void gtm_pcengine_destroy(void* engine) {
  delete static_cast<gtcrn::EnginePC*>(engine);
}

void* gtm_pcstate_create(void* /*engine*/) {
  return new (std::nothrow) gtcrn::StreamState();
}

void gtm_pcstate_destroy(void* state) {
  delete static_cast<gtcrn::StreamState*>(state);
}

void gtm_pcstate_reset(void* /*engine*/, void* state) {
  static_cast<gtcrn::StreamState*>(state)->Reset();
}

void gtm_pcstep(void* engine, void* state, const float* spec, float* out) {
  auto* e = static_cast<gtcrn::EnginePC*>(engine);
  auto* s = static_cast<gtcrn::StreamState*>(state);
  e->Step(*s, spec, spec + 257, out, out + 257);
}

void gtm_pcenhance(void* engine, const float* samples, int n, float* out) {
  auto* e = static_cast<gtcrn::EnginePC*>(engine);
  std::vector<float> in(samples, samples + n);
  auto res = e->EnhanceWav(in);
  std::memcpy(out, res.data(), sizeof(float) * n);
}

void* gtm_pcstate_batch_create(void* /*engine*/, int n) {
  return new (std::nothrow) std::vector<gtcrn::StreamState>(n);
}

void gtm_pcstate_batch_destroy(void* states) {
  delete static_cast<std::vector<gtcrn::StreamState>*>(states);
}

void gtm_pcstep_batch(void* engine, void* states, const float* spec,
                      float* out, int n) {
  auto* e = static_cast<gtcrn::EnginePC*>(engine);
  auto* s = static_cast<std::vector<gtcrn::StreamState>*>(states);
  std::vector<float> re(n * 257), im(n * 257), ore(n * 257), oim(n * 257);
  for (int i = 0; i < n; ++i) {
    std::memcpy(re.data() + i * 257, spec + i * 514, 257 * sizeof(float));
    std::memcpy(im.data() + i * 257, spec + i * 514 + 257,
                257 * sizeof(float));
  }
  e->StepBatch(s->data(), re.data(), im.data(), ore.data(), oim.data(), n);
  for (int i = 0; i < n; ++i) {
    std::memcpy(out + i * 514, ore.data() + i * 257, 257 * sizeof(float));
    std::memcpy(out + i * 514 + 257, oim.data() + i * 257,
                257 * sizeof(float));
  }
}

// ---- full-integer per-channel engine (GTM8 v4 artifact) ----
// int16 activation storage handles any v4 artifact (8- and 16-bit
// boundaries); gtm_v48_* is the int8-storage variant for pure-int8 grids.

void* gtm_v4engine_create(const char* weights_path) {
  try {
    return new gtcrn::EngineV4(weights_path);
  } catch (...) {
    return nullptr;
  }
}

void gtm_v4engine_destroy(void* engine) {
  delete static_cast<gtcrn::EngineV4*>(engine);
}

void* gtm_v4state_create(void* engine) {
  auto* s = new (std::nothrow) gtcrn::StreamStateQ16();
  if (s && engine) static_cast<gtcrn::EngineV4*>(engine)->InitState(*s);
  return s;
}

void gtm_v4state_destroy(void* state) {
  delete static_cast<gtcrn::StreamStateQ16*>(state);
}

void gtm_v4state_reset(void* engine, void* state) {
  static_cast<gtcrn::EngineV4*>(engine)->InitState(
      *static_cast<gtcrn::StreamStateQ16*>(state));
}

void gtm_v4step(void* engine, void* state, const float* spec, float* out) {
  auto* e = static_cast<gtcrn::EngineV4*>(engine);
  auto* s = static_cast<gtcrn::StreamStateQ16*>(state);
  e->Step(*s, spec, spec + 257, out, out + 257);
}

void gtm_v4enhance(void* engine, const float* samples, int n, float* out) {
  auto* e = static_cast<gtcrn::EngineV4*>(engine);
  std::vector<float> in(samples, samples + n);
  auto res = e->EnhanceWav(in);
  std::memcpy(out, res.data(), sizeof(float) * n);
}

void* gtm_v4state_batch_create(void* engine, int n) {
  auto* v = new (std::nothrow) std::vector<gtcrn::StreamStateQ16>(n);
  if (v && engine) {
    for (auto& s : *v) static_cast<gtcrn::EngineV4*>(engine)->InitState(s);
  }
  return v;
}

void gtm_v4state_batch_destroy(void* states) {
  delete static_cast<std::vector<gtcrn::StreamStateQ16>*>(states);
}

void gtm_v4step_batch(void* engine, void* states, const float* spec,
                      float* out, int n) {
  auto* e = static_cast<gtcrn::EngineV4*>(engine);
  auto* s = static_cast<std::vector<gtcrn::StreamStateQ16>*>(states);
  std::vector<float> re(n * 257), im(n * 257), ore(n * 257), oim(n * 257);
  for (int i = 0; i < n; ++i) {
    std::memcpy(re.data() + i * 257, spec + i * 514, 257 * sizeof(float));
    std::memcpy(im.data() + i * 257, spec + i * 514 + 257,
                257 * sizeof(float));
  }
  e->StepBatch(s->data(), re.data(), im.data(), ore.data(), oim.data(), n);
  for (int i = 0; i < n; ++i) {
    std::memcpy(out + i * 514, ore.data() + i * 257, 257 * sizeof(float));
    std::memcpy(out + i * 514 + 257, oim.data() + i * 257,
                257 * sizeof(float));
  }
}

void* gtm_v48engine_create(const char* weights_path) {
  try {
    return new gtcrn::EngineV48(weights_path);
  } catch (...) {
    return nullptr;
  }
}

void gtm_v48engine_destroy(void* engine) {
  delete static_cast<gtcrn::EngineV48*>(engine);
}

void* gtm_v48state_create(void* engine) {
  auto* s = new (std::nothrow) gtcrn::StreamStateQ();
  if (s && engine) static_cast<gtcrn::EngineV48*>(engine)->InitState(*s);
  return s;
}

void gtm_v48state_destroy(void* state) {
  delete static_cast<gtcrn::StreamStateQ*>(state);
}

void gtm_v48state_reset(void* engine, void* state) {
  static_cast<gtcrn::EngineV48*>(engine)->InitState(
      *static_cast<gtcrn::StreamStateQ*>(state));
}

void gtm_v48step(void* engine, void* state, const float* spec, float* out) {
  auto* e = static_cast<gtcrn::EngineV48*>(engine);
  auto* s = static_cast<gtcrn::StreamStateQ*>(state);
  e->Step(*s, spec, spec + 257, out, out + 257);
}

void gtm_v48enhance(void* engine, const float* samples, int n, float* out) {
  auto* e = static_cast<gtcrn::EngineV48*>(engine);
  std::vector<float> in(samples, samples + n);
  auto res = e->EnhanceWav(in);
  std::memcpy(out, res.data(), sizeof(float) * n);
}

void* gtm_v48state_batch_create(void* engine, int n) {
  auto* v = new (std::nothrow) std::vector<gtcrn::StreamStateQ>(n);
  if (v && engine) {
    for (auto& s : *v) static_cast<gtcrn::EngineV48*>(engine)->InitState(s);
  }
  return v;
}

void gtm_v48state_batch_destroy(void* states) {
  delete static_cast<std::vector<gtcrn::StreamStateQ>*>(states);
}

void gtm_v48step_batch(void* engine, void* states, const float* spec,
                       float* out, int n) {
  auto* e = static_cast<gtcrn::EngineV48*>(engine);
  auto* s = static_cast<std::vector<gtcrn::StreamStateQ>*>(states);
  std::vector<float> re(n * 257), im(n * 257), ore(n * 257), oim(n * 257);
  for (int i = 0; i < n; ++i) {
    std::memcpy(re.data() + i * 257, spec + i * 514, 257 * sizeof(float));
    std::memcpy(im.data() + i * 257, spec + i * 514 + 257,
                257 * sizeof(float));
  }
  e->StepBatch(s->data(), re.data(), im.data(), ore.data(), oim.data(), n);
  for (int i = 0; i < n; ++i) {
    std::memcpy(out + i * 514, ore.data() + i * 257, 257 * sizeof(float));
    std::memcpy(out + i * 514 + 257, oim.data() + i * 257,
                257 * sizeof(float));
  }
}

}  // extern "C"
