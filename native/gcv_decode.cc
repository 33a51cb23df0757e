// gcv_decode — batched FFmpeg video decoder for genconvit_tpu.
//
// First-party replacement for the reference's decord dependency
// (ref: model/pred_func.py:13,138-143): opens a container, exposes the frame
// count, and decodes an arbitrary set of frame indices as packed RGB24 into a
// caller-owned contiguous buffer — shaped so the Python side can hand the
// whole multi-video block to the device in one transfer.
//
// Design notes:
//   * seek-then-drain per requested index, falling back to sequential decode
//     when the container's seek table is unreliable (matches what decord's
//     eager reader effectively does for stepped access patterns);
//   * sws_scale converts native pix_fmt -> RGB24 (and optional target size)
//     with the swscaler reused across frames;
//   * C ABI (gcv_*) consumed via ctypes (genconvit_tpu/data/native.py) —
//     no pybind11 dependency.
//
// Build: make -C native   (links libavformat/avcodec/avutil/swscale)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct GcvVideo {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;       // -> RGB24
  SwsContext* sws_yuv = nullptr;   // -> YUV420P (lazily created)
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int stream_idx = -1;
  int64_t num_frames = 0;
  int width = 0;
  int height = 0;
  int out_width = 0;
  int out_height = 0;
  int64_t next_frame = 0;  // next frame number the decoder will emit
  bool eof = false;

  ~GcvVideo() {
    if (sws) sws_freeContext(sws);
    if (sws_yuv) sws_freeContext(sws_yuv);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }
};

// Count frames by stream metadata; fall back to demuxing packet count.
int64_t count_frames(AVFormatContext* fmt, int stream_idx) {
  AVStream* st = fmt->streams[stream_idx];
  if (st->nb_frames > 0) return st->nb_frames;
  // estimate from duration * fps
  if (st->duration > 0 && st->avg_frame_rate.num > 0) {
    double sec = st->duration * av_q2d(st->time_base);
    int64_t est = (int64_t)(sec * av_q2d(st->avg_frame_rate) + 0.5);
    if (est > 0) return est;
  }
  // last resort: demux and count (no decode)
  int64_t n = 0;
  AVPacket* pkt = av_packet_alloc();
  while (av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == stream_idx) ++n;
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  av_seek_frame(fmt, stream_idx, 0, AVSEEK_FLAG_BACKWARD);
  return n;
}

// Decode forward until frame number `target` is emitted; write RGB24 (or
// planar YUV420) to out. Returns 0 on success.
int decode_until(GcvVideo* v, int64_t target, uint8_t* out, bool yuv = false) {
  if (target < v->next_frame) {
    // need to go backwards: seek to keyframe before target and drain
    AVStream* st = v->fmt->streams[v->stream_idx];
    double fps = av_q2d(st->avg_frame_rate);
    int64_t ts = (fps > 0)
                     ? (int64_t)(target / fps / av_q2d(st->time_base))
                     : target;
    if (av_seek_frame(v->fmt, v->stream_idx, ts, AVSEEK_FLAG_BACKWARD) < 0) {
      av_seek_frame(v->fmt, v->stream_idx, 0, AVSEEK_FLAG_BACKWARD);
    }
    avcodec_flush_buffers(v->codec);
    v->next_frame = -1;  // unknown until first pts
    v->eof = false;
  }
  while (true) {
    int ret = avcodec_receive_frame(v->codec, v->frame);
    if (ret == 0) {
      int64_t num;
      if (v->next_frame >= 0) {
        num = v->next_frame;
      } else {
        // derive frame number from pts after a seek
        AVStream* st = v->fmt->streams[v->stream_idx];
        int64_t pts = v->frame->best_effort_timestamp;
        double fps = av_q2d(st->avg_frame_rate);
        num = (pts == AV_NOPTS_VALUE || fps <= 0)
                  ? target  // give up on exactness; treat as target
                  : (int64_t)(pts * av_q2d(st->time_base) * fps + 0.5);
      }
      v->next_frame = num + 1;
      if (num >= target) {
        if (yuv) {
          if (!v->sws_yuv) {
            v->sws_yuv = sws_getContext(
                v->width, v->height, v->codec->pix_fmt, v->out_width,
                v->out_height, AV_PIX_FMT_YUV420P, SWS_AREA, nullptr,
                nullptr, nullptr);
          }
          const int w = v->out_width, h2 = v->out_height;
          uint8_t* dst[3] = {out, out + (size_t)w * h2,
                             out + (size_t)w * h2 + (size_t)(w / 2) * (h2 / 2)};
          int dst_stride[3] = {w, w / 2, w / 2};
          sws_scale(v->sws_yuv, v->frame->data, v->frame->linesize, 0,
                    v->height, dst, dst_stride);
        } else {
          uint8_t* dst[1] = {out};
          int dst_stride[1] = {3 * v->out_width};
          sws_scale(v->sws, v->frame->data, v->frame->linesize, 0, v->height,
                    dst, dst_stride);
        }
        av_frame_unref(v->frame);
        return 0;
      }
      av_frame_unref(v->frame);
      continue;
    }
    if (ret == AVERROR(EAGAIN)) {
      if (v->eof) return -1;
      while (true) {
        ret = av_read_frame(v->fmt, v->pkt);
        if (ret < 0) {
          v->eof = true;
          avcodec_send_packet(v->codec, nullptr);  // flush
          break;
        }
        if (v->pkt->stream_index == v->stream_idx) {
          avcodec_send_packet(v->codec, v->pkt);
          av_packet_unref(v->pkt);
          break;
        }
        av_packet_unref(v->pkt);
      }
      continue;
    }
    return -1;  // EOF or error
  }
}

}  // namespace

extern "C" {

void* gcv_open_scaled(const char* path, int out_w, int out_h) {
  auto v = new GcvVideo();
  if (avformat_open_input(&v->fmt, path, nullptr, nullptr) < 0) {
    delete v;
    return nullptr;
  }
  if (avformat_find_stream_info(v->fmt, nullptr) < 0) {
    delete v;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  v->stream_idx =
      av_find_best_stream(v->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (v->stream_idx < 0 || !dec) {
    delete v;
    return nullptr;
  }
  AVStream* st = v->fmt->streams[v->stream_idx];
  v->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(v->codec, st->codecpar);
  v->codec->thread_count = 0;  // auto
  if (avcodec_open2(v->codec, dec, nullptr) < 0) {
    delete v;
    return nullptr;
  }
  v->width = v->codec->width;
  v->height = v->codec->height;
  v->out_width = out_w > 0 ? out_w : v->width;
  v->out_height = out_h > 0 ? out_h : v->height;
  int sws_flags = (out_w > 0 ? SWS_AREA : SWS_BILINEAR) | SWS_ACCURATE_RND |
                  SWS_FULL_CHR_H_INT;
  v->sws = sws_getContext(v->width, v->height, v->codec->pix_fmt, v->out_width,
                          v->out_height, AV_PIX_FMT_RGB24, sws_flags, nullptr,
                          nullptr, nullptr);
  if (!v->sws) {
    delete v;
    return nullptr;
  }
  v->frame = av_frame_alloc();
  v->pkt = av_packet_alloc();
  v->num_frames = count_frames(v->fmt, v->stream_idx);
  return v;
}

void* gcv_open(const char* path) { return gcv_open_scaled(path, 0, 0); }

// Colorspace info for device-side YUV->RGB: space 1 = BT.709, 0 = BT.601
// (swscale-style heuristic when unspecified: HD => 709); range 1 = full.
int gcv_color_info(void* h, int* space, int* range) {
  auto v = static_cast<GcvVideo*>(h);
  AVColorSpace cs = v->codec->colorspace;
  if (cs == AVCOL_SPC_BT709) {
    *space = 1;
  } else if (cs == AVCOL_SPC_BT470BG || cs == AVCOL_SPC_SMPTE170M) {
    *space = 0;
  } else {
    *space = (v->height > 576) ? 1 : 0;
  }
  *range = (v->codec->color_range == AVCOL_RANGE_JPEG) ? 1 : 0;
  return 0;
}

// Planar YUV420 variant of gcv_read_frames: out is [n] frames of
// W*H + 2*(W/2)*(H/2) bytes each (Y then U then V planes).
int gcv_read_frames_yuv(void* h, const long long* indices, int n,
                        uint8_t* out) {
  auto v = static_cast<GcvVideo*>(h);
  const size_t frame_bytes = (size_t)v->out_width * v->out_height +
                             2 * (size_t)(v->out_width / 2) *
                                 (v->out_height / 2);
  int got = 0;
  for (int i = 0; i < n; ++i) {
    if (decode_until(v, indices[i], out + (size_t)got * frame_bytes, true) != 0) {
      break;
    }
    ++got;
  }
  return got;
}

long long gcv_num_frames(void* h) {
  return static_cast<GcvVideo*>(h)->num_frames;
}

int gcv_frame_size(void* h, int* w, int* hgt) {
  auto v = static_cast<GcvVideo*>(h);
  *w = v->out_width;
  *hgt = v->out_height;
  return 0;
}

// Decode `n` frames by index into out (packed [n, H, W, 3] RGB24).
// Indices must be non-decreasing for best performance (the sampler's stepped
// pattern is). Returns number of frames decoded, or -1 on hard error.
int gcv_read_frames(void* h, const long long* indices, int n, uint8_t* out) {
  auto v = static_cast<GcvVideo*>(h);
  const size_t frame_bytes = (size_t)v->out_width * v->out_height * 3;
  int got = 0;
  for (int i = 0; i < n; ++i) {
    if (decode_until(v, indices[i], out + (size_t)got * frame_bytes) != 0) {
      break;
    }
    ++got;
  }
  return got;
}

void gcv_close(void* h) { delete static_cast<GcvVideo*>(h); }

// Batched multi-video decode with an internal thread pool: for each of
// `n_videos` paths, sample the reference's evenly-stepped `frames_per_video`
// indices (step = max(1, n/F) — model/pred_func.py:138-143) and decode into
// out[v] = [frames_per_video, out_h, out_w, 3] RGB24 (scaled via swscale).
// counts[v] receives the number of frames actually decoded (0 on open
// failure — per-video fault tolerance). Returns 0.
int gcv_decode_videos(const char** paths, int n_videos, int frames_per_video,
                      int out_w, int out_h, uint8_t* out,
                      long long* counts, int n_threads);

int gcv_decode_videos(const char** paths, int n_videos, int frames_per_video,
                      int out_w, int out_h, uint8_t* out,
                      long long* counts, int n_threads) {
  const size_t video_bytes =
      (size_t)frames_per_video * out_h * out_w * 3;
  std::vector<std::thread> pool;
  std::atomic<int> next{0};
  // hardware_concurrency() may legally return 0 — clamp to >= 1 so the
  // pool always spawns at least one worker (0 workers = silent no-op).
  if (n_threads <= 0)
    n_threads = std::max(1, (int)std::thread::hardware_concurrency());
  if (n_threads > n_videos) n_threads = n_videos;
  auto worker = [&]() {
    for (;;) {
      int v = next.fetch_add(1);
      if (v >= n_videos) return;
      counts[v] = 0;
      void* h = gcv_open_scaled(paths[v], out_w, out_h);
      if (!h) continue;
      long long n = gcv_num_frames(h);
      if (n <= 0) {
        gcv_close(h);
        continue;
      }
      long long step = n / frames_per_video;
      if (step < 1) step = 1;
      std::vector<long long> idx;
      for (long long i = 0; i < n && (int)idx.size() < frames_per_video;
           i += step) {
        idx.push_back(i);
      }
      counts[v] = gcv_read_frames(h, idx.data(), (int)idx.size(),
                                  out + (size_t)v * video_bytes);
      gcv_close(h);
    }
  };
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

}  // extern "C"
