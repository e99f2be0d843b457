// Standalone streaming enhancement CLI (the reference's esp32_s3/main/main.cc
// analog, but a full wav -> wav pipeline instead of a dummy-input Invoke):
//
//   gtcrn_stream <weights.bin> <noisy.wav> <enhanced.wav>
//
// Reads 16-bit PCM mono 16 kHz wav, enhances frame-by-frame through the
// streaming engine, reports per-frame latency (the reference prints TFLM
// invoke time, main.cc:150-160), writes the result.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <memory>
#include <vector>

#include "gtcrn_micro.h"

namespace {

bool ReadWav16(const char* path, std::vector<float>* out, uint32_t* fs) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char riff[12];
  f.read(riff, 12);
  if (std::memcmp(riff, "RIFF", 4) || std::memcmp(riff + 8, "WAVE", 4)) {
    return false;
  }
  uint16_t n_ch = 1, bits = 16;
  while (f) {
    char cid[4];
    uint32_t csize = 0;
    f.read(cid, 4);
    f.read(reinterpret_cast<char*>(&csize), 4);
    if (!f) break;
    if (!std::memcmp(cid, "fmt ", 4)) {
      std::vector<char> fmt(csize);
      f.read(fmt.data(), csize);
      n_ch = *reinterpret_cast<uint16_t*>(fmt.data() + 2);
      *fs = *reinterpret_cast<uint32_t*>(fmt.data() + 4);
      bits = *reinterpret_cast<uint16_t*>(fmt.data() + 14);
    } else if (!std::memcmp(cid, "data", 4)) {
      if (bits != 16) return false;
      std::vector<int16_t> raw(csize / 2);
      // read an even byte count: an odd chunk size in a malformed file
      // must not overflow the int16 buffer by one byte
      f.read(reinterpret_cast<char*>(raw.data()),
             static_cast<std::streamsize>(raw.size() * 2));
      if (f.gcount() < static_cast<std::streamsize>(raw.size() * 2)) {
        std::fprintf(stderr, "truncated wav: data chunk promises %u bytes\n",
                     csize);
        return false;
      }
      out->resize(raw.size() / n_ch);
      for (size_t i = 0; i < out->size(); ++i) {
        (*out)[i] = raw[i * n_ch] / 32768.f;
      }
      return true;
    } else {
      f.seekg(csize + (csize & 1), std::ios::cur);
    }
  }
  return false;
}

bool WriteWav16(const char* path, const std::vector<float>& x, uint32_t fs) {
  std::ofstream f(path, std::ios::binary);
  if (!f) return false;
  uint32_t data_size = static_cast<uint32_t>(x.size() * 2);
  uint32_t riff_size = 36 + data_size;
  uint16_t fmt16 = 1, ch = 1, bits = 16, block = 2;
  uint32_t byte_rate = fs * 2, fmt_size = 16;
  f.write("RIFF", 4);
  f.write(reinterpret_cast<char*>(&riff_size), 4);
  f.write("WAVEfmt ", 8);
  f.write(reinterpret_cast<char*>(&fmt_size), 4);
  f.write(reinterpret_cast<char*>(&fmt16), 2);
  f.write(reinterpret_cast<char*>(&ch), 2);
  f.write(reinterpret_cast<char*>(&fs), 4);
  f.write(reinterpret_cast<char*>(&byte_rate), 4);
  f.write(reinterpret_cast<char*>(&block), 2);
  f.write(reinterpret_cast<char*>(&bits), 2);
  f.write("data", 4);
  f.write(reinterpret_cast<char*>(&data_size), 4);
  for (float v : x) {
    float c = v < -1.f ? -1.f : (v > 1.f ? 1.f : v);
    int16_t s = static_cast<int16_t>(c * 32767.f);
    f.write(reinterpret_cast<char*>(&s), 2);
  }
  return true;
}

}  // namespace

// Multi-stream serving benchmark: n independent streams stepped through
// StepBatch on zero spectra; reports us/frame/stream (the reference prints
// one TFLM invoke time, esp32_s3/main/main.cc:150-160).
// Quantized engines require InitState (rings start at the boundary zero
// points, not raw 0 -- see gtcrn_micro.h); the fp32 engine's
// default-constructed state is already valid.
template <typename EngineT, typename StateT>
void InitStates(const EngineT&, std::vector<StateT>&) {}
template <>
void InitStates(const gtcrn::EngineQ& e,
                std::vector<gtcrn::StreamStateQ>& v) {
  for (auto& s : v) e.InitState(s);
}
template <>
void InitStates(const gtcrn::EngineQ16& e,
                std::vector<gtcrn::StreamStateQ16>& v) {
  for (auto& s : v) e.InitState(s);
}
template <>
void InitStates(const gtcrn::EngineV4& e,
                std::vector<gtcrn::StreamStateQ16>& v) {
  for (auto& s : v) e.InitState(s);
}
template <>
void InitStates(const gtcrn::EngineV48& e,
                std::vector<gtcrn::StreamStateQ>& v) {
  for (auto& s : v) e.InitState(s);
}

template <typename EngineT, typename StateT>
int RunBench(const char* weights, int n_streams, int frames) {
  std::unique_ptr<EngineT> loaded;
  try {
    loaded = std::make_unique<EngineT>(std::string(weights));
  } catch (const std::exception& e) {
    std::fprintf(stderr, "failed to load weights: %s\n", e.what());
    return 1;
  }
  EngineT& engine = *loaded;
  std::vector<StateT> states(n_streams);
  InitStates(engine, states);
  std::vector<float> re(n_streams * 257, 0.f), im(n_streams * 257, 0.f);
  std::vector<float> ore(n_streams * 257), oim(n_streams * 257);
  engine.StepBatch(states.data(), re.data(), im.data(), ore.data(),
                   oim.data(), n_streams);  // warm-up
  auto t0 = std::chrono::steady_clock::now();
  for (int k = 0; k < frames; ++k) {
    engine.StepBatch(states.data(), re.data(), im.data(), ore.data(),
                     oim.data(), n_streams);
  }
  auto us = std::chrono::duration_cast<std::chrono::microseconds>(
                std::chrono::steady_clock::now() - t0)
                .count();
  double per = static_cast<double>(us) / frames / n_streams;
  std::printf("%d streams x %d frames: %.2f us/frame/stream\n", n_streams,
              frames, per);
  // one 256-sample hop = 16 ms of audio; capacity = how many streams fit
  // in that budget at the measured per-stream cost
  std::printf("real-time capacity: %.0f streams\n", 16000.0 / per);
  return 0;
}

int main(int argc, char** argv) {
  int quant = 0;  // 0 = fp32, 8 = int8, 16 = 16x8, 1 = per-channel (v3),
                  // 2 = full-integer per-channel (v4), 3 = v4 int8 storage
  bool online = false;  // true: hop-by-hop AudioStream framing (O(1) state)
  int argi = 1;
  for (; argi < argc; ++argi) {
    if (!std::strcmp(argv[argi], "--int8")) {
      quant = 8;
    } else if (!std::strcmp(argv[argi], "--int16")) {
      quant = 16;
    } else if (!std::strcmp(argv[argi], "--pc")) {
      quant = 1;
    } else if (!std::strcmp(argv[argi], "--v4")) {
      quant = 2;
    } else if (!std::strcmp(argv[argi], "--v48")) {
      quant = 3;
    } else if (!std::strcmp(argv[argi], "--online")) {
      online = true;
    } else {
      break;
    }
  }
  if (argi + 1 < argc && !std::strcmp(argv[argi], "--bench")) {
    int n = argi + 2 < argc ? std::atoi(argv[argi + 2]) : 16;
    if (quant == 8) {
      return RunBench<gtcrn::EngineQ, gtcrn::StreamStateQ>(argv[argi + 1], n,
                                                           200);
    }
    if (quant == 16) {
      return RunBench<gtcrn::EngineQ16, gtcrn::StreamStateQ16>(argv[argi + 1],
                                                               n, 200);
    }
    if (quant == 1) {
      return RunBench<gtcrn::EnginePC, gtcrn::StreamState>(argv[argi + 1], n,
                                                           200);
    }
    if (quant == 2) {
      return RunBench<gtcrn::EngineV4, gtcrn::StreamStateQ16>(argv[argi + 1],
                                                              n, 200);
    }
    if (quant == 3) {
      return RunBench<gtcrn::EngineV48, gtcrn::StreamStateQ>(argv[argi + 1],
                                                             n, 200);
    }
    return RunBench<gtcrn::Engine, gtcrn::StreamState>(argv[argi + 1], n,
                                                       200);
  }
  if (argc - argi != 3) {
    std::fprintf(stderr,
                 "usage: %s [--int8|--int16|--pc|--v4|--v48] [--online]"
                 " <weights.bin> <in.wav> <out.wav>\n"
                 "       %s [--int8|--int16|--pc|--v4|--v48] --bench"
                 " <weights.bin> [n]\n",
                 argv[0], argv[0]);
    return 1;
  }
  std::vector<float> samples;
  uint32_t fs = 0;
  if (!ReadWav16(argv[argi + 1], &samples, &fs) || fs != 16000) {
    std::fprintf(stderr, "need 16-bit PCM 16 kHz wav\n");
    return 1;
  }

  std::unique_ptr<gtcrn::Engine> engine;
  std::unique_ptr<gtcrn::EngineQ> engine_q;
  std::unique_ptr<gtcrn::EngineQ16> engine_q16;
  std::unique_ptr<gtcrn::EnginePC> engine_pc;
  std::unique_ptr<gtcrn::EngineV4> engine_v4;
  std::unique_ptr<gtcrn::EngineV48> engine_v48;
  try {
    if (quant == 8) {
      engine_q = std::make_unique<gtcrn::EngineQ>(std::string(argv[argi]));
    } else if (quant == 16) {
      engine_q16 = std::make_unique<gtcrn::EngineQ16>(std::string(argv[argi]));
    } else if (quant == 1) {
      engine_pc = std::make_unique<gtcrn::EnginePC>(std::string(argv[argi]));
    } else if (quant == 2) {
      engine_v4 = std::make_unique<gtcrn::EngineV4>(std::string(argv[argi]));
    } else if (quant == 3) {
      engine_v48 = std::make_unique<gtcrn::EngineV48>(std::string(argv[argi]));
    } else {
      engine = std::make_unique<gtcrn::Engine>(std::string(argv[argi]));
    }
  } catch (const std::exception& e) {
    std::fprintf(stderr, "failed to load weights: %s\n", e.what());
    return 1;
  }
  auto t0 = std::chrono::steady_clock::now();
  std::vector<float> out;
  if (online) {
    // true streaming: one hop in -> one hop out, O(1) carried state (the
    // whole-wav path below reflect-pads up front, like the reference's
    // runner).  Output runs one hop behind; one zero hop flushes the tail
    // and the first emitted hop (the offline center-trim region) is
    // dropped -- so out[i] aligns with the offline pipeline's out[i].
    gtcrn::StreamState st;
    gtcrn::StreamStateQ st_q;
    gtcrn::StreamStateQ16 st_q16;
    if (quant == 8) engine_q->InitState(st_q);
    if (quant == 16) engine_q16->InitState(st_q16);
    if (quant == 2) engine_v4->InitState(st_q16);
    if (quant == 3) engine_v48->InitState(st_q);
    std::function<void(const float*, const float*, float*, float*)> step;
    if (quant == 8) {
      step = [&](const float* re, const float* im, float* ore, float* oim) {
        engine_q->Step(st_q, re, im, ore, oim);
      };
    } else if (quant == 16) {
      step = [&](const float* re, const float* im, float* ore, float* oim) {
        engine_q16->Step(st_q16, re, im, ore, oim);
      };
    } else if (quant == 2) {
      step = [&](const float* re, const float* im, float* ore, float* oim) {
        engine_v4->Step(st_q16, re, im, ore, oim);
      };
    } else if (quant == 3) {
      step = [&](const float* re, const float* im, float* ore, float* oim) {
        engine_v48->Step(st_q, re, im, ore, oim);
      };
    } else if (quant == 1) {
      step = [&](const float* re, const float* im, float* ore, float* oim) {
        engine_pc->Step(st, re, im, ore, oim);
      };
    } else {
      step = [&](const float* re, const float* im, float* ore, float* oim) {
        engine->Step(st, re, im, ore, oim);
      };
    }
    gtcrn::dsp::AudioStream stream;
    const size_t hops = samples.size() / 256;
    out.assign(hops * 256, 0.f);
    std::vector<float> hop_out(256);
    const float zero_hop[256] = {};
    for (size_t t = 0; t <= hops; ++t) {
      const float* in = t < hops ? samples.data() + 256 * t : zero_hop;
      stream.Push(step, in, hop_out.data());
      if (t > 0) {  // t == 0 emits the discarded center-trim hop
        std::copy(hop_out.begin(), hop_out.end(),
                  out.begin() + 256 * (t - 1));
      }
    }
  } else {
    out = quant == 8    ? engine_q->EnhanceWav(samples)
          : quant == 16 ? engine_q16->EnhanceWav(samples)
          : quant == 1  ? engine_pc->EnhanceWav(samples)
          : quant == 2  ? engine_v4->EnhanceWav(samples)
          : quant == 3  ? engine_v48->EnhanceWav(samples)
                        : engine->EnhanceWav(samples);
  }
  auto us = std::chrono::duration_cast<std::chrono::microseconds>(
                std::chrono::steady_clock::now() - t0)
                .count();
  int frames = static_cast<int>(samples.size()) / 256 + 1;
  std::printf("enhanced %zu samples (%d frames) in %lld us: %.1f us/frame, "
              "%.2fx real-time\n",
              samples.size(), frames, static_cast<long long>(us),
              static_cast<double>(us) / frames,
              (samples.size() / 16000.0) / (us / 1e6));

  if (!WriteWav16(argv[argi + 2], out, fs)) {
    std::fprintf(stderr, "cannot write %s\n", argv[argi + 2]);
    return 1;
  }
  return 0;
}
