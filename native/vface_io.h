/* vface_io — self-contained host video IO for the vface_tpu framework.
 *
 * TPU-native replacement for the reference's host video stack
 * (cv2.VideoCapture demux at scripts/VFace_inference_batch.py:240-245 and the
 * moviepy/ffmpeg mux at :646-666 of /root/reference/REFace — both external
 * native wheels; SURVEY §2.9). This library has zero dependencies beyond the
 * C++17 standard library:
 *
 *  - Y4M (YUV4MPEG2) reader/writer with BT.601 YUV420P <-> RGB conversion
 *    (the standard raw interchange format; `ffmpeg -i in.mp4 out.y4m` on any
 *    host produces it, and every player/encoder consumes it).
 *  - Uncompressed AVI (DIB/BGR24) writer for directly playable output.
 *  - A threaded prefetch ring: a producer thread decodes+converts frames to
 *    float32 RGB [0,1] HWC buffers while the consumer (the JAX host loop)
 *    drains them — host decode overlaps device compute (SURVEY §7 hard part 5).
 *
 * C ABI for ctypes binding (vface_tpu/io/native.py).
 */
#ifndef VFACE_IO_H_
#define VFACE_IO_H_

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct VfY4mReader VfY4mReader;
typedef struct VfY4mWriter VfY4mWriter;
typedef struct VfAviWriter VfAviWriter;
typedef struct VfPrefetch VfPrefetch;

/* ---- Y4M reader ---- */
VfY4mReader* vf_y4m_open(const char* path);
int vf_y4m_width(const VfY4mReader* r);
int vf_y4m_height(const VfY4mReader* r);
int vf_y4m_fps_num(const VfY4mReader* r);
int vf_y4m_fps_den(const VfY4mReader* r);
/* next frame as uint8 RGB24 HWC; returns 1 on success, 0 on EOF, <0 error */
int vf_y4m_read_rgb(VfY4mReader* r, uint8_t* rgb_out);
void vf_y4m_close(VfY4mReader* r);

/* ---- Y4M writer ---- */
VfY4mWriter* vf_y4m_create(const char* path, int w, int h, int fps_num, int fps_den);
int vf_y4m_write_rgb(VfY4mWriter* w, const uint8_t* rgb);
void vf_y4m_close_writer(VfY4mWriter* w);

/* ---- AVI (uncompressed DIB) writer ---- */
VfAviWriter* vf_avi_create(const char* path, int w, int h, int fps);
/* with an interleaved PCM audio stream (the reference muxes the source audio
 * into its output, VFace_inference_batch.py:646-666). sample_rate==0 means
 * video-only (same as vf_avi_create). */
VfAviWriter* vf_avi_create2(const char* path, int w, int h, int fps,
                            int sample_rate, int channels, int bits_per_sample);
int vf_avi_write_rgb(VfAviWriter* w, const uint8_t* rgb);
/* append one '01wb' PCM chunk (interleave roughly one frame's worth of
 * samples after each vf_avi_write_rgb for smooth playback) */
int vf_avi_write_audio(VfAviWriter* w, const uint8_t* pcm, uint32_t nbytes);
int vf_avi_finish(VfAviWriter* w); /* writes index + header fixups, closes */

/* ---- Prefetch ring over a Y4M file ---- */
/* Producer thread reads + converts to float32 RGB [0,1]; `depth` buffers. */
VfPrefetch* vf_prefetch_open(const char* path, int depth);
int vf_prefetch_width(const VfPrefetch* p);
int vf_prefetch_height(const VfPrefetch* p);
/* blocks for the next frame; returns 1 ok, 0 EOF, <0 error */
int vf_prefetch_next(VfPrefetch* p, float* out);
void vf_prefetch_close(VfPrefetch* p);

#ifdef __cplusplus
}
#endif

#endif /* VFACE_IO_H_ */
