// Native audio-loading runtime for vae_music_tpu.
//
// The reference delegates audio IO to librosa (Python) at
// data_utils.py:43-48; here the host-side hot path — RIFF/WAV decode, mono
// mixdown, linear resampling, overlapping-window segmentation — is C++ so a
// multi-genre GTZAN sweep never stalls the TPU input pipeline.  Exposed via a
// plain C ABI consumed with ctypes (vae_music_tpu/data/native.py).
//
// Build: make -C runtime   (produces runtime/build/libaudio_loader.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavData {
  std::vector<float> samples;  // mono, [-1, 1]
  int sample_rate = 0;
};

// Minimal RIFF/WAVE parser: PCM 8/16/32-bit and IEEE float32, any channel
// count (averaged to mono).  Returns false on malformed input.
bool parse_wav(const uint8_t* data, size_t size, WavData* out) {
  if (size < 44 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0) {
    return false;
  }
  size_t pos = 12;
  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const uint8_t* pcm = nullptr;
  size_t pcm_size = 0;

  while (pos + 8 <= size) {
    const char* id = reinterpret_cast<const char*>(data + pos);
    uint32_t chunk_size;
    std::memcpy(&chunk_size, data + pos + 4, 4);
    const uint8_t* body = data + pos + 8;
    if (pos + 8 + chunk_size > size) chunk_size = size - pos - 8;

    if (std::memcmp(id, "fmt ", 4) == 0 && chunk_size >= 16) {
      std::memcpy(&format, body + 0, 2);
      std::memcpy(&channels, body + 2, 2);
      std::memcpy(&sample_rate, body + 4, 4);
      std::memcpy(&bits, body + 14, 2);
    } else if (std::memcmp(id, "data", 4) == 0) {
      pcm = body;
      pcm_size = chunk_size;
    }
    pos += 8 + chunk_size + (chunk_size & 1);  // chunks are word-aligned
  }
  if (!pcm || channels == 0 || sample_rate == 0) return false;

  const size_t bytes_per_sample = bits / 8;
  if (bytes_per_sample == 0) return false;
  const size_t frames = pcm_size / (bytes_per_sample * channels);
  out->samples.resize(frames);
  out->sample_rate = static_cast<int>(sample_rate);

  for (size_t f = 0; f < frames; ++f) {
    double acc = 0.0;
    for (unsigned c = 0; c < channels; ++c) {
      const uint8_t* s = pcm + (f * channels + c) * bytes_per_sample;
      double v = 0.0;
      if (format == 3 && bits == 32) {  // IEEE float
        float fv;
        std::memcpy(&fv, s, 4);
        v = fv;
      } else if (bits == 16) {
        int16_t iv;
        std::memcpy(&iv, s, 2);
        v = iv / 32768.0;
      } else if (bits == 8) {
        v = (static_cast<int>(*s) - 128) / 128.0;
      } else if (bits == 32) {
        int32_t iv;
        std::memcpy(&iv, s, 4);
        v = iv / 2147483648.0;
      } else {
        return false;
      }
      acc += v;
    }
    out->samples[f] = static_cast<float>(acc / channels);
  }
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  buf->resize(static_cast<size_t>(n));
  size_t got = std::fread(buf->data(), 1, buf->size(), f);
  std::fclose(f);
  return got == buf->size();
}

// Linear resampling (matches numpy.interp semantics used in the fallback).
void resample_linear(const std::vector<float>& in, int sr_in, int sr_out,
                     std::vector<float>* out) {
  if (sr_in == sr_out) {
    *out = in;
    return;
  }
  const size_t n_out = static_cast<size_t>(
      in.size() * static_cast<double>(sr_out) / sr_in + 0.5);
  out->resize(n_out);
  const double step = n_out > 1
      ? static_cast<double>(in.size() - 1) / (n_out - 1) : 0.0;
  for (size_t i = 0; i < n_out; ++i) {
    double t = i * step;
    size_t lo = static_cast<size_t>(t);
    size_t hi = std::min(lo + 1, in.size() - 1);
    double frac = t - lo;
    (*out)[i] = static_cast<float>(in[lo] * (1.0 - frac) + in[hi] * frac);
  }
}

}  // namespace

extern "C" {

// Decode a WAV file to mono float32.  Writes up to `capacity` samples into
// `out`, the true length into `out_len`, the file's sample rate into
// `out_sr`.  Returns 0 on success.
int vmt_load_wav(const char* path, float* out, long capacity, long* out_len,
                 int* out_sr) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return 1;
  WavData wav;
  if (!parse_wav(buf.data(), buf.size(), &wav)) return 2;
  const long n = std::min<long>(static_cast<long>(wav.samples.size()), capacity);
  std::memcpy(out, wav.samples.data(), n * sizeof(float));
  *out_len = n;
  *out_sr = wav.sample_rate;
  return 0;
}

// Decode + resample to `target_sr` + truncate to `max_len` samples.
int vmt_load_wav_resampled(const char* path, int target_sr, long max_len,
                           float* out, long capacity, long* out_len) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return 1;
  WavData wav;
  if (!parse_wav(buf.data(), buf.size(), &wav)) return 2;
  std::vector<float> res;
  resample_linear(wav.samples, wav.sample_rate, target_sr, &res);
  long n = static_cast<long>(res.size());
  if (max_len > 0) n = std::min(n, max_len);
  n = std::min(n, capacity);
  std::memcpy(out, res.data(), n * sizeof(float));
  *out_len = n;
  return 0;
}

// Overlapping-window segmentation (data_utils.py:65-91 semantics):
// chunk = floor(len * window); offset = floor(chunk * (1 - overlap));
// boundary remainders dropped.  Returns the number of segments written.
long vmt_split_windows(const float* signal, long len, double window,
                       double overlap, float* out, long out_capacity) {
  const long chunk = static_cast<long>(len * window);
  if (chunk <= 0) return 0;
  long offset = static_cast<long>(chunk * (1.0 - overlap));
  if (offset <= 0) offset = 1;
  long count = 0;
  for (long i = 0; i + chunk <= len; i += offset) {
    if ((count + 1) * chunk > out_capacity) break;
    std::memcpy(out + count * chunk, signal + i, chunk * sizeof(float));
    ++count;
  }
  return count;
}

// Parallel batch loader: decode+resample+truncate `n_files` WAVs with a
// thread pool into a dense (n_files, max_len) row-major buffer (zero-padded).
// lengths[i] receives each file's true sample count; returns files loaded OK.
long vmt_load_batch(const char** paths, long n_files, int target_sr,
                    long max_len, float* out, long* lengths, int n_threads) {
  std::atomic<long> next(0), ok(0);
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  auto worker = [&]() {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= n_files) return;
      long len = 0;
      std::memset(out + i * max_len, 0, max_len * sizeof(float));
      int rc = vmt_load_wav_resampled(paths[i], target_sr, max_len,
                                      out + i * max_len, max_len, &len);
      lengths[i] = (rc == 0) ? len : -1;
      if (rc == 0) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Background batch prefetcher: a thread pool decodes+resamples WAV batches
// into a bounded ring buffer ahead of the consumer, so host IO overlaps
// device compute (the reference loads everything eagerly in Python via
// librosa, data_utils.py:100-136).
// ---------------------------------------------------------------------------

#include <condition_variable>
#include <deque>
#include <mutex>
#include <random>

namespace {

struct Prefetcher {
  std::vector<std::string> paths;
  int target_sr = 0;
  long max_len = 0;
  long batch = 0;
  bool shuffle = true;
  uint64_t seed = 0;

  std::mutex mu;
  std::condition_variable not_full, not_empty;
  std::deque<std::vector<float>> ready;  // each: batch * max_len samples
  size_t capacity = 4;
  bool stop = false;
  std::vector<std::thread> workers;

  std::mutex order_mu;
  std::vector<size_t> order;
  size_t next_idx = 0;
  std::mt19937_64 rng;

  // Hand out the next batch's file indices (reshuffling each epoch).
  std::vector<size_t> take_batch_indices() {
    std::lock_guard<std::mutex> l(order_mu);
    std::vector<size_t> idx;
    idx.reserve(batch);
    for (long i = 0; i < batch; ++i) {
      if (next_idx >= order.size()) {
        if (shuffle) std::shuffle(order.begin(), order.end(), rng);
        next_idx = 0;
      }
      idx.push_back(order[next_idx++]);
    }
    return idx;
  }

  void worker_loop() {
    for (;;) {
      {
        std::unique_lock<std::mutex> l(mu);
        not_full.wait(l, [&] { return stop || ready.size() < capacity; });
        if (stop) return;
      }
      std::vector<size_t> idx = take_batch_indices();
      std::vector<float> buf(static_cast<size_t>(batch) * max_len, 0.0f);
      for (long i = 0; i < batch; ++i) {
        long len = 0;
        vmt_load_wav_resampled(paths[idx[i]].c_str(), target_sr, max_len,
                               buf.data() + i * max_len, max_len, &len);
      }
      {
        std::unique_lock<std::mutex> l(mu);
        if (stop) return;
        if (ready.size() >= capacity) continue;  // raced; drop and retry
        ready.push_back(std::move(buf));
      }
      not_empty.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* vmt_prefetcher_create(const char** paths, long n_files, int target_sr,
                            long max_len, long batch, int n_threads,
                            int shuffle, uint64_t seed) {
  auto* p = new Prefetcher();
  p->paths.assign(paths, paths + n_files);
  p->target_sr = target_sr;
  p->max_len = max_len;
  p->batch = batch;
  p->shuffle = shuffle != 0;
  p->rng.seed(seed);
  p->order.resize(n_files);
  for (long i = 0; i < n_files; ++i) p->order[i] = i;
  if (p->shuffle) std::shuffle(p->order.begin(), p->order.end(), p->rng);
  if (n_threads <= 0) n_threads = 2;
  for (int t = 0; t < n_threads; ++t)
    p->workers.emplace_back([p] { p->worker_loop(); });
  return p;
}

// Blocks until a prefetched batch is available; copies batch*max_len floats.
int vmt_prefetcher_next(void* handle, float* out) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::vector<float> buf;
  {
    std::unique_lock<std::mutex> l(p->mu);
    p->not_empty.wait(l, [&] { return p->stop || !p->ready.empty(); });
    if (p->stop && p->ready.empty()) return 1;
    buf = std::move(p->ready.front());
    p->ready.pop_front();
  }
  p->not_full.notify_all();
  std::memcpy(out, buf.data(), buf.size() * sizeof(float));
  return 0;
}

void vmt_prefetcher_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  {
    std::lock_guard<std::mutex> l(p->mu);
    p->stop = true;
  }
  p->not_full.notify_all();
  p->not_empty.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
