/* vface_io implementation — see vface_io.h for the design rationale. */

#include "vface_io.h"

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------- BT.601 limited-range YUV420P <-> RGB24 ----------

inline uint8_t clamp_u8(int v) { return v < 0 ? 0 : (v > 255 ? 255 : (uint8_t)v); }

void yuv420_to_rgb(const uint8_t* y, const uint8_t* u, const uint8_t* v,
                   int w, int h, uint8_t* rgb) {
  for (int j = 0; j < h; ++j) {
    const uint8_t* yr = y + (size_t)j * w;
    const uint8_t* ur = u + (size_t)(j / 2) * (w / 2);
    const uint8_t* vr = v + (size_t)(j / 2) * (w / 2);
    uint8_t* out = rgb + (size_t)j * w * 3;
    for (int i = 0; i < w; ++i) {
      int c = (int)yr[i] - 16;
      int d = (int)ur[i / 2] - 128;
      int e = (int)vr[i / 2] - 128;
      out[3 * i + 0] = clamp_u8((298 * c + 409 * e + 128) >> 8);
      out[3 * i + 1] = clamp_u8((298 * c - 100 * d - 208 * e + 128) >> 8);
      out[3 * i + 2] = clamp_u8((298 * c + 516 * d + 128) >> 8);
    }
  }
}

void rgb_to_yuv420(const uint8_t* rgb, int w, int h,
                   uint8_t* y, uint8_t* u, uint8_t* v) {
  for (int j = 0; j < h; ++j) {
    const uint8_t* in = rgb + (size_t)j * w * 3;
    uint8_t* yr = y + (size_t)j * w;
    for (int i = 0; i < w; ++i) {
      int r = in[3 * i], g = in[3 * i + 1], b = in[3 * i + 2];
      yr[i] = clamp_u8(((66 * r + 129 * g + 25 * b + 128) >> 8) + 16);
    }
  }
  for (int j = 0; j < h / 2; ++j) {
    uint8_t* ur = u + (size_t)j * (w / 2);
    uint8_t* vr = v + (size_t)j * (w / 2);
    for (int i = 0; i < w / 2; ++i) {
      // average the 2x2 block
      int r = 0, g = 0, b = 0;
      for (int dj = 0; dj < 2; ++dj)
        for (int di = 0; di < 2; ++di) {
          const uint8_t* p = rgb + ((size_t)(2 * j + dj) * w + 2 * i + di) * 3;
          r += p[0]; g += p[1]; b += p[2];
        }
      r /= 4; g /= 4; b /= 4;
      ur[i] = clamp_u8(((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128);
      vr[i] = clamp_u8(((112 * r - 94 * g - 18 * b + 128) >> 8) + 128);
    }
  }
}

void put_le32(std::vector<uint8_t>& b, uint32_t v) {
  b.push_back(v & 0xff); b.push_back((v >> 8) & 0xff);
  b.push_back((v >> 16) & 0xff); b.push_back((v >> 24) & 0xff);
}

void put_le16(std::vector<uint8_t>& b, uint16_t v) {
  b.push_back(v & 0xff); b.push_back((v >> 8) & 0xff);
}

void put_tag(std::vector<uint8_t>& b, const char* t) {
  b.insert(b.end(), t, t + 4);
}

}  // namespace

// ------------------------------------------------------------------ Y4M read

struct VfY4mReader {
  FILE* f = nullptr;
  int w = 0, h = 0, fn = 30, fd = 1;
  std::vector<uint8_t> yuv;
};

extern "C" VfY4mReader* vf_y4m_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  char line[512];
  if (!std::fgets(line, sizeof(line), f)) { std::fclose(f); return nullptr; }
  if (std::strncmp(line, "YUV4MPEG2", 9) != 0) { std::fclose(f); return nullptr; }
  auto* r = new VfY4mReader;
  r->f = f;
  // parse " W<w> H<h> F<num>:<den> ..."
  for (char* p = line + 9; *p;) {
    while (*p == ' ') ++p;
    if (*p == 'W') r->w = std::atoi(p + 1);
    else if (*p == 'H') r->h = std::atoi(p + 1);
    else if (*p == 'F') { std::sscanf(p + 1, "%d:%d", &r->fn, &r->fd); }
    while (*p && *p != ' ' && *p != '\n') ++p;
    if (*p == '\n' || !*p) break;
  }
  if (r->w <= 0 || r->h <= 0) { vf_y4m_close(r); return nullptr; }
  r->yuv.resize((size_t)r->w * r->h * 3 / 2);
  return r;
}

extern "C" int vf_y4m_width(const VfY4mReader* r) { return r->w; }
extern "C" int vf_y4m_height(const VfY4mReader* r) { return r->h; }
extern "C" int vf_y4m_fps_num(const VfY4mReader* r) { return r->fn; }
extern "C" int vf_y4m_fps_den(const VfY4mReader* r) { return r->fd; }

extern "C" int vf_y4m_read_rgb(VfY4mReader* r, uint8_t* rgb_out) {
  char line[256];
  if (!std::fgets(line, sizeof(line), r->f)) return 0;  // EOF
  if (std::strncmp(line, "FRAME", 5) != 0) return -1;
  size_t n = (size_t)r->w * r->h;
  if (std::fread(r->yuv.data(), 1, n * 3 / 2, r->f) != n * 3 / 2) return -1;
  yuv420_to_rgb(r->yuv.data(), r->yuv.data() + n, r->yuv.data() + n + n / 4,
                r->w, r->h, rgb_out);
  return 1;
}

extern "C" void vf_y4m_close(VfY4mReader* r) {
  if (!r) return;
  if (r->f) std::fclose(r->f);
  delete r;
}

// ----------------------------------------------------------------- Y4M write

struct VfY4mWriter {
  FILE* f = nullptr;
  int w = 0, h = 0;
  std::vector<uint8_t> yuv;
};

extern "C" VfY4mWriter* vf_y4m_create(const char* path, int w, int h,
                                      int fps_num, int fps_den) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  std::fprintf(f, "YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n", w, h, fps_num, fps_den);
  auto* wr = new VfY4mWriter;
  wr->f = f; wr->w = w; wr->h = h;
  wr->yuv.resize((size_t)w * h * 3 / 2);
  return wr;
}

extern "C" int vf_y4m_write_rgb(VfY4mWriter* w, const uint8_t* rgb) {
  std::fprintf(w->f, "FRAME\n");
  size_t n = (size_t)w->w * w->h;
  rgb_to_yuv420(rgb, w->w, w->h, w->yuv.data(), w->yuv.data() + n,
                w->yuv.data() + n + n / 4);
  return std::fwrite(w->yuv.data(), 1, n * 3 / 2, w->f) == n * 3 / 2 ? 1 : -1;
}

extern "C" void vf_y4m_close_writer(VfY4mWriter* w) {
  if (!w) return;
  if (w->f) std::fclose(w->f);
  delete w;
}

// ----------------------------------------------------------------- AVI write

struct AviChunkRec {
  char tag[4];
  uint32_t offset;  // from start of 'movi' data (after the "movi" fourcc)
  uint32_t size;
};

struct VfAviWriter {
  FILE* f = nullptr;
  int w = 0, h = 0, fps = 30;
  // audio stream (0 sample_rate = video only)
  int sr = 0, ch = 0, bits = 16;
  uint32_t nframes = 0;
  uint32_t audio_bytes = 0;
  long movi_start = 0;
  long pos_riff_size = 0, pos_total_frames = 0, pos_vid_length = 0;
  long pos_aud_length = 0, pos_movi_size = 0;
  std::vector<AviChunkRec> chunks;  // for idx1
  std::vector<uint8_t> bgr;
};

namespace {

void write_chunk(VfAviWriter* a, const char* tag, const uint8_t* data,
                 uint32_t n) {
  AviChunkRec rec;
  std::memcpy(rec.tag, tag, 4);
  rec.offset = (uint32_t)(std::ftell(a->f) - a->movi_start + 4);
  rec.size = n;
  a->chunks.push_back(rec);
  std::vector<uint8_t> ck;
  put_tag(ck, tag);
  put_le32(ck, n);
  std::fwrite(ck.data(), 1, ck.size(), a->f);
  std::fwrite(data, 1, n, a->f);
  if (n & 1) std::fputc(0, a->f);  // RIFF chunks are word-aligned
}

}  // namespace

extern "C" VfAviWriter* vf_avi_create2(const char* path, int w, int h, int fps,
                                       int sample_rate, int channels,
                                       int bits_per_sample) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  auto* a = new VfAviWriter;
  a->f = f; a->w = w; a->h = h; a->fps = fps;
  a->sr = sample_rate; a->ch = channels > 0 ? channels : 1;
  a->bits = bits_per_sample > 0 ? bits_per_sample : 16;
  a->bgr.resize((size_t)w * h * 3);
  const bool audio = sample_rate > 0;
  const uint32_t block_align = (uint32_t)(a->ch * (a->bits / 8));

  // Header with placeholder sizes; fixup positions are recorded as the
  // header is emitted (no magic offsets).
  std::vector<uint8_t> hd;
  auto mark = [&]() { return (long)hd.size(); };
  long m_riff, m_frames, m_vlen, m_alen = 0;

  put_tag(hd, "RIFF"); m_riff = mark(); put_le32(hd, 0); put_tag(hd, "AVI ");
  const uint32_t strl_vid = 4 + 8 + 56 + 8 + 40;          // "strl"+strh+strf
  const uint32_t strl_aud = audio ? (4 + 8 + 56 + 8 + 16) : 0;
  uint32_t hdrl = 4 + 8 + 56 + 8 + strl_vid + (audio ? 8 + strl_aud : 0);
  put_tag(hd, "LIST"); put_le32(hd, hdrl); put_tag(hd, "hdrl");
  // avih
  put_tag(hd, "avih"); put_le32(hd, 56);
  put_le32(hd, 1000000u / (uint32_t)fps);            // us per frame
  put_le32(hd, (uint32_t)((size_t)w * h * 3 * fps)); // max bytes/sec
  put_le32(hd, 0); put_le32(hd, 0x10 /* HASINDEX */);
  m_frames = mark(); put_le32(hd, 0 /* frames, fixup */); put_le32(hd, 0);
  put_le32(hd, audio ? 2 : 1 /* streams */);
  put_le32(hd, (uint32_t)((size_t)w * h * 3));
  put_le32(hd, (uint32_t)w); put_le32(hd, (uint32_t)h);
  put_le32(hd, 0); put_le32(hd, 0); put_le32(hd, 0); put_le32(hd, 0);
  // video strl
  put_tag(hd, "LIST"); put_le32(hd, strl_vid); put_tag(hd, "strl");
  put_tag(hd, "strh"); put_le32(hd, 56);
  put_tag(hd, "vids"); put_tag(hd, "DIB ");
  put_le32(hd, 0); put_le16(hd, 0); put_le16(hd, 0);
  put_le32(hd, 0); put_le32(hd, 1); put_le32(hd, (uint32_t)fps);
  put_le32(hd, 0); m_vlen = mark(); put_le32(hd, 0 /* length, fixup */);
  put_le32(hd, (uint32_t)((size_t)w * h * 3)); put_le32(hd, 0xFFFFFFFF);
  put_le32(hd, 0); put_le16(hd, 0); put_le16(hd, (uint16_t)w);
  put_le16(hd, 0); put_le16(hd, (uint16_t)h);
  put_tag(hd, "strf"); put_le32(hd, 40);
  put_le32(hd, 40); put_le32(hd, (uint32_t)w); put_le32(hd, (uint32_t)h);
  put_le16(hd, 1); put_le16(hd, 24); put_le32(hd, 0 /* BI_RGB */);
  put_le32(hd, (uint32_t)((size_t)w * h * 3));
  put_le32(hd, 0); put_le32(hd, 0); put_le32(hd, 0); put_le32(hd, 0);
  if (audio) {
    // audio strl: PCM ('auds' + WAVEFORMATEX without cbSize)
    put_tag(hd, "LIST"); put_le32(hd, strl_aud); put_tag(hd, "strl");
    put_tag(hd, "strh"); put_le32(hd, 56);
    put_tag(hd, "auds"); put_le32(hd, 0 /* handler */);
    put_le32(hd, 0); put_le16(hd, 0); put_le16(hd, 0);
    put_le32(hd, 0);
    put_le32(hd, block_align /* dwScale */);
    put_le32(hd, (uint32_t)sample_rate * block_align /* dwRate */);
    put_le32(hd, 0); m_alen = mark(); put_le32(hd, 0 /* length, fixup */);
    put_le32(hd, block_align * (uint32_t)sample_rate /* suggested buf */);
    put_le32(hd, 0xFFFFFFFF); put_le32(hd, block_align /* dwSampleSize */);
    put_le16(hd, 0); put_le16(hd, 0); put_le16(hd, 0); put_le16(hd, 0);
    put_tag(hd, "strf"); put_le32(hd, 16);
    put_le16(hd, 1 /* WAVE_FORMAT_PCM */); put_le16(hd, (uint16_t)a->ch);
    put_le32(hd, (uint32_t)sample_rate);
    put_le32(hd, (uint32_t)sample_rate * block_align);
    put_le16(hd, (uint16_t)block_align); put_le16(hd, (uint16_t)a->bits);
  }
  // movi list
  put_tag(hd, "LIST"); long m_movi = mark(); put_le32(hd, 0 /* fixup */);
  put_tag(hd, "movi");
  std::fwrite(hd.data(), 1, hd.size(), f);
  a->movi_start = std::ftell(f);
  a->pos_riff_size = m_riff;
  a->pos_total_frames = m_frames;
  a->pos_vid_length = m_vlen;
  a->pos_aud_length = m_alen;
  a->pos_movi_size = m_movi;
  return a;
}

extern "C" VfAviWriter* vf_avi_create(const char* path, int w, int h, int fps) {
  return vf_avi_create2(path, w, h, fps, 0, 0, 0);
}

extern "C" int vf_avi_write_rgb(VfAviWriter* a, const uint8_t* rgb) {
  // DIB frames are bottom-up BGR
  for (int j = 0; j < a->h; ++j) {
    const uint8_t* src = rgb + (size_t)(a->h - 1 - j) * a->w * 3;
    uint8_t* dst = a->bgr.data() + (size_t)j * a->w * 3;
    for (int i = 0; i < a->w; ++i) {
      dst[3 * i + 0] = src[3 * i + 2];
      dst[3 * i + 1] = src[3 * i + 1];
      dst[3 * i + 2] = src[3 * i + 0];
    }
  }
  write_chunk(a, "00db", a->bgr.data(), (uint32_t)a->bgr.size());
  a->nframes++;
  return 1;
}

extern "C" int vf_avi_write_audio(VfAviWriter* a, const uint8_t* pcm,
                                  uint32_t nbytes) {
  if (a->sr <= 0 || nbytes == 0) return 0;
  write_chunk(a, "01wb", pcm, nbytes);
  a->audio_bytes += nbytes;
  return 1;
}

extern "C" int vf_avi_finish(VfAviWriter* a) {
  long movi_end = std::ftell(a->f);
  // idx1 covers every chunk (video + audio) in file order
  std::vector<uint8_t> idx;
  put_tag(idx, "idx1"); put_le32(idx, (uint32_t)(a->chunks.size() * 16));
  for (const AviChunkRec& rec : a->chunks) {
    idx.insert(idx.end(), rec.tag, rec.tag + 4);
    put_le32(idx, 0x10 /* KEYFRAME */);
    put_le32(idx, rec.offset - 8);
    put_le32(idx, rec.size);
  }
  std::fwrite(idx.data(), 1, idx.size(), a->f);
  long file_end = std::ftell(a->f);

  auto fixup = [&](long pos, uint32_t v) {
    std::fseek(a->f, pos, SEEK_SET);
    uint8_t b[4] = {(uint8_t)(v & 0xff), (uint8_t)((v >> 8) & 0xff),
                    (uint8_t)((v >> 16) & 0xff), (uint8_t)((v >> 24) & 0xff)};
    std::fwrite(b, 1, 4, a->f);
  };
  fixup(a->pos_riff_size, (uint32_t)(file_end - 8));
  fixup(a->pos_total_frames, a->nframes);
  fixup(a->pos_vid_length, a->nframes);
  if (a->pos_aud_length) {
    uint32_t block_align = (uint32_t)(a->ch * (a->bits / 8));
    fixup(a->pos_aud_length, a->audio_bytes / (block_align ? block_align : 1));
  }
  fixup(a->pos_movi_size, (uint32_t)(movi_end - a->movi_start + 4));
  std::fclose(a->f);
  a->f = nullptr;
  delete a;
  return 1;
}

// ------------------------------------------------------------- prefetch ring

struct VfPrefetch {
  VfY4mReader* rd = nullptr;
  int depth = 0, w = 0, h = 0;
  std::vector<std::vector<float>> ring;
  std::vector<int> status;  // 0 empty, 1 full, 2 eof-marker
  size_t head = 0, tail = 0, count = 0;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::thread producer;
  std::atomic<bool> stop{false};

  void run() {
    std::vector<uint8_t> rgb((size_t)w * h * 3);
    for (;;) {
      int rc = vf_y4m_read_rgb(rd, rgb.data());
      std::unique_lock<std::mutex> lk(mu);
      cv_empty.wait(lk, [&] { return count < (size_t)depth || stop; });
      if (stop) return;
      if (rc == 1) {
        float* dst = ring[head].data();
        size_t n = (size_t)w * h * 3;
        for (size_t i = 0; i < n; ++i) dst[i] = rgb[i] * (1.0f / 255.0f);
        status[head] = 1;
      } else {
        status[head] = 2;  // EOF / error marker
      }
      head = (head + 1) % depth;
      ++count;
      cv_full.notify_one();
      if (rc != 1) return;
    }
  }
};

extern "C" VfPrefetch* vf_prefetch_open(const char* path, int depth) {
  VfY4mReader* rd = vf_y4m_open(path);
  if (!rd) return nullptr;
  auto* p = new VfPrefetch;
  p->rd = rd; p->depth = depth > 0 ? depth : 2;
  p->w = rd->w; p->h = rd->h;
  p->ring.assign(p->depth, std::vector<float>((size_t)p->w * p->h * 3));
  p->status.assign(p->depth, 0);
  p->producer = std::thread([p] { p->run(); });
  return p;
}

extern "C" int vf_prefetch_width(const VfPrefetch* p) { return p->w; }
extern "C" int vf_prefetch_height(const VfPrefetch* p) { return p->h; }

extern "C" int vf_prefetch_next(VfPrefetch* p, float* out) {
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_full.wait(lk, [&] { return p->count > 0; });
  int st = p->status[p->tail];
  if (st == 1) {
    std::memcpy(out, p->ring[p->tail].data(),
                sizeof(float) * (size_t)p->w * p->h * 3);
  }
  p->status[p->tail] = 0;
  p->tail = (p->tail + 1) % p->depth;
  --p->count;
  p->cv_empty.notify_one();
  return st == 1 ? 1 : 0;
}

extern "C" void vf_prefetch_close(VfPrefetch* p) {
  if (!p) return;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_empty.notify_all();
  if (p->producer.joinable()) p->producer.join();
  vf_y4m_close(p->rd);
  delete p;
}
