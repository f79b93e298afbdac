// Native audio data loader: multithreaded WAV decode + fixed-length batch
// assembly.
//
// TPU-native replacement for the reference's data-layer native dependencies
// (libsndfile via librosa/torchaudio + torch DataLoader worker processes,
// SURVEY.md §2.7): the feeding pipeline decodes PCM WAV files straight into
// a caller-provided float32 batch buffer from a C++ thread pool — no Python
// object churn, no worker-process IPC. Exposed through a C ABI consumed by
// ctypes (audiopure_tpu/data/native.py).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread wavloader.cpp -o
//        libwavloader.so

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct FmtChunk {
  uint16_t audio_format = 0;
  uint16_t n_channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
};

// Decode one WAV file into out[0..max_len), truncating or zero-padding to
// exactly target_len samples (mono mixdown). Returns the decoded sample
// count (pre-pad/truncate), or a negative error code.
int decode_one(const char* path, float* out, int64_t target_len,
               int* sample_rate_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  char hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12 || std::memcmp(hdr, "RIFF", 4) ||
      std::memcmp(hdr + 8, "WAVE", 4)) {
    std::fclose(f);
    return -2;
  }

  FmtChunk fmt;
  std::vector<uint8_t> data;
  while (true) {
    char cid[4];
    uint32_t size;
    if (std::fread(cid, 1, 4, f) != 4) break;
    if (std::fread(&size, 4, 1, f) != 1) break;
    if (!std::memcmp(cid, "fmt ", 4)) {
      uint8_t buf[16];
      if (size < 16 || std::fread(buf, 1, 16, f) != 16) {
        std::fclose(f);
        return -3;
      }
      std::memcpy(&fmt.audio_format, buf + 0, 2);
      std::memcpy(&fmt.n_channels, buf + 2, 2);
      std::memcpy(&fmt.sample_rate, buf + 4, 4);
      std::memcpy(&fmt.bits, buf + 14, 2);
      if (size > 16) std::fseek(f, size - 16 + (size & 1), SEEK_CUR);
    } else if (!std::memcmp(cid, "data", 4)) {
      data.resize(size);
      if (std::fread(data.data(), 1, size, f) != size) {
        std::fclose(f);
        return -4;
      }
      if (size & 1) std::fseek(f, 1, SEEK_CUR);
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  if (!fmt.n_channels || data.empty()) return -5;
  if (sample_rate_out) *sample_rate_out = (int)fmt.sample_rate;

  const int ch = fmt.n_channels;
  int64_t n_frames;
  // mono mixdown accumulator
  auto emit = [&](int64_t i, float v) {
    if (i < target_len) out[i] += v / ch;
  };

  std::memset(out, 0, sizeof(float) * target_len);
  if (fmt.audio_format == 1 && fmt.bits == 16 && ch == 1) {
    // fast path: mono PCM16 (the Speech Commands corpus) — tight
    // vectorizable loop, no per-sample branch
    const int16_t* s = reinterpret_cast<const int16_t*>(data.data());
    n_frames = (int64_t)(data.size() / 2);
    const int64_t m = n_frames < target_len ? n_frames : target_len;
    constexpr float kScale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < m; ++i) out[i] = s[i] * kScale;
  } else if (fmt.audio_format == 1 && fmt.bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(data.data());
    n_frames = (int64_t)(data.size() / 2) / ch;
    for (int64_t i = 0; i < n_frames; ++i)
      for (int c = 0; c < ch; ++c)
        emit(i, (float)s[i * ch + c] / 32768.0f);
  } else if (fmt.audio_format == 1 && fmt.bits == 32) {
    const int32_t* s = reinterpret_cast<const int32_t*>(data.data());
    n_frames = (int64_t)(data.size() / 4) / ch;
    for (int64_t i = 0; i < n_frames; ++i)
      for (int c = 0; c < ch; ++c)
        emit(i, (float)((double)s[i * ch + c] / 2147483648.0));
  } else if (fmt.audio_format == 3 && fmt.bits == 32) {
    const float* s = reinterpret_cast<const float*>(data.data());
    n_frames = (int64_t)(data.size() / 4) / ch;
    for (int64_t i = 0; i < n_frames; ++i)
      for (int c = 0; c < ch; ++c) emit(i, s[i * ch + c]);
  } else if (fmt.audio_format == 1 && fmt.bits == 8) {
    const uint8_t* s = data.data();
    n_frames = (int64_t)data.size() / ch;
    for (int64_t i = 0; i < n_frames; ++i)
      for (int c = 0; c < ch; ++c)
        emit(i, ((float)s[i * ch + c] - 128.0f) / 128.0f);
  } else {
    return -6;  // unsupported encoding: caller falls back to Python
  }
  return (int)(n_frames < target_len ? n_frames : target_len);
}

}  // namespace

extern "C" {

// Single-file decode. Returns decoded length (<= target_len) or <0 on error.
int wavloader_decode(const char* path, float* out, int64_t target_len,
                     int* sample_rate_out) {
  return decode_one(path, out, target_len, sample_rate_out);
}

// Batch decode: n files into out (n x target_len, contiguous), each
// zero-padded/truncated. lengths[i] receives per-file decoded length (or
// negative error). Uses up to n_threads workers. Returns the number of
// files decoded successfully.
int wavloader_decode_batch(const char** paths, int n, float* out,
                           int64_t target_len, int* lengths,
                           int* sample_rates, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), ok(0);
  auto work = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int sr = 0;
      int r = decode_one(paths[i], out + (int64_t)i * target_len,
                         target_len, &sr);
      if (lengths) lengths[i] = r;
      if (sample_rates) sample_rates[i] = sr;
      if (r >= 0) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  int workers = n_threads < n ? n_threads : n;
  for (int t = 0; t < workers; ++t) pool.emplace_back(work);
  for (auto& t : pool) t.join();
  return ok.load();
}

}  // extern "C"
