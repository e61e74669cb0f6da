// tstar_tpu native video decode runtime.
//
// Replaces the reference's decord/OpenCV host decode path (reference
// TStar/interface_searcher.py:157-169 VideoReader.get_batch;
// interface_searcher.py:60-65 cv2.VideoCapture property probe) with a
// first-party FFmpeg (libavformat/libavcodec/libswscale) module exposed to
// Python via a C ABI + ctypes.
//
// Two access patterns, matching how the TPU pipeline consumes frames:
//   * vd_decode_sweep — one forward pass over the whole file picking one
//     frame per sampling period (the 1-fps prefetch that fills the HBM frame
//     cache once per video; far faster than per-index seeks for dense reads).
//   * vd_decode_batch — random-access batched reads with keyframe seeks
//     (keyframe JPEG export, QA frame extraction, eval tooling).
//
// All outputs are RGB24, scaled with SWS_BILINEAR into caller-provided
// buffers (shape [n, out_h, out_w, 3]).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int stream_index = -1;
  double fps = 0.0;
  int64_t total_frames = 0;
  int width = 0;
  int height = 0;
  AVRational time_base{1, 1};
  int64_t start_pts = 0;
  // current decode position as a presentation timestamp; <0 = unknown
  int64_t last_pts = INT64_MIN;
  int sws_w = 0, sws_h = 0;
  std::string error;
};

void set_error(Decoder* d, const std::string& msg) { d->error = msg; }

double frame_pts_seconds(const Decoder* d, const AVFrame* f) {
  int64_t pts = f->pts != AV_NOPTS_VALUE ? f->pts : f->best_effort_timestamp;
  return (pts - d->start_pts) * av_q2d(d->time_base);
}

bool ensure_sws(Decoder* d, int out_w, int out_h) {
  if (d->sws && d->sws_w == out_w && d->sws_h == out_h) return true;
  if (d->sws) sws_freeContext(d->sws);
  d->sws = sws_getContext(d->codec->width, d->codec->height, d->codec->pix_fmt,
                          out_w, out_h, AV_PIX_FMT_RGB24, SWS_BILINEAR,
                          nullptr, nullptr, nullptr);
  d->sws_w = out_w;
  d->sws_h = out_h;
  return d->sws != nullptr;
}

void scale_into(Decoder* d, const AVFrame* f, uint8_t* out, int out_w, int out_h) {
  uint8_t* dst[4] = {out, nullptr, nullptr, nullptr};
  int dst_stride[4] = {out_w * 3, 0, 0, 0};
  sws_scale(d->sws, f->data, f->linesize, 0, d->codec->height, dst, dst_stride);
}

// Pull the next decoded frame in presentation order. Returns 1 on frame,
// 0 on EOF, <0 on error.
int next_frame(Decoder* d) {
  while (true) {
    int ret = avcodec_receive_frame(d->codec, d->frame);
    if (ret == 0) {
      int64_t pts = d->frame->pts != AV_NOPTS_VALUE ? d->frame->pts
                                                    : d->frame->best_effort_timestamp;
      d->last_pts = pts;
      return 1;
    }
    if (ret == AVERROR_EOF) return 0;
    if (ret != AVERROR(EAGAIN)) return ret;

    // feed more packets
    while (true) {
      ret = av_read_frame(d->fmt, d->pkt);
      if (ret == AVERROR_EOF) {
        avcodec_send_packet(d->codec, nullptr);  // flush
        break;
      }
      if (ret < 0) return ret;
      if (d->pkt->stream_index == d->stream_index) {
        ret = avcodec_send_packet(d->codec, d->pkt);
        av_packet_unref(d->pkt);
        if (ret < 0 && ret != AVERROR(EAGAIN)) return ret;
        break;
      }
      av_packet_unref(d->pkt);
    }
  }
}

int seek_to(Decoder* d, double target_sec) {
  int64_t ts = d->start_pts + (int64_t)(target_sec / av_q2d(d->time_base));
  int ret = av_seek_frame(d->fmt, d->stream_index, ts, AVSEEK_FLAG_BACKWARD);
  if (ret < 0) return ret;
  avcodec_flush_buffers(d->codec);
  d->last_pts = INT64_MIN;
  return 0;
}

}  // namespace

extern "C" {

void* vd_open(const char* path) {
  auto* d = new Decoder();
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    delete d;
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  d->stream_index = av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (d->stream_index < 0 || !dec) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  AVStream* st = d->fmt->streams[d->stream_index];
  d->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(d->codec, st->codecpar);
  d->codec->thread_count = 0;  // auto
  if (avcodec_open2(d->codec, dec, nullptr) < 0) {
    avcodec_free_context(&d->codec);
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  d->time_base = st->time_base;
  d->start_pts = st->start_time != AV_NOPTS_VALUE ? st->start_time : 0;

  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  d->fps = fr.den ? av_q2d(fr) : 0.0;
  d->total_frames = st->nb_frames;
  if (d->total_frames <= 0 && d->fps > 0 && st->duration != AV_NOPTS_VALUE) {
    d->total_frames = (int64_t)(st->duration * av_q2d(st->time_base) * d->fps + 0.5);
  }
  if (d->total_frames <= 0 && d->fps > 0 && d->fmt->duration != AV_NOPTS_VALUE) {
    d->total_frames = (int64_t)(d->fmt->duration / (double)AV_TIME_BASE * d->fps + 0.5);
  }
  d->width = d->codec->width;
  d->height = d->codec->height;
  d->frame = av_frame_alloc();
  d->pkt = av_packet_alloc();
  return d;
}

void vd_close(void* h) {
  if (!h) return;
  auto* d = (Decoder*)h;
  if (d->sws) sws_freeContext(d->sws);
  if (d->frame) av_frame_free(&d->frame);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

int vd_probe(void* h, double* fps, int64_t* total_frames, int* width, int* height) {
  auto* d = (Decoder*)h;
  *fps = d->fps;
  *total_frames = d->total_frames;
  *width = d->width;
  *height = d->height;
  return 0;
}

const char* vd_error(void* h) { return ((Decoder*)h)->error.c_str(); }

// Decode frames at the given presentation indices (need not be sorted).
// out: [n, out_h, out_w, 3] RGB24. Returns number of frames written, <0 error.
int vd_decode_batch(void* h, const int64_t* indices, int n, uint8_t* out,
                    int out_w, int out_h) {
  auto* d = (Decoder*)h;
  if (!ensure_sws(d, out_w, out_h)) {
    set_error(d, "swscale init failed");
    return -1;
  }
  if (d->fps <= 0) {
    set_error(d, "unknown fps");
    return -2;
  }

  // Process in sorted order, write to original slots.
  std::vector<int> order(n);
  for (int i = 0; i < n; i++) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return indices[a] < indices[b]; });

  const double frame_dur = 1.0 / d->fps;
  const size_t frame_bytes = (size_t)out_w * out_h * 3;
  int written = 0;

  for (int k = 0; k < n; k++) {
    int slot = order[k];
    double target = indices[slot] / d->fps;
    double cur = d->last_pts == INT64_MIN
                     ? -1.0
                     : (d->last_pts - d->start_pts) * av_q2d(d->time_base);
    // Seek when jumping backward or far forward (> 3 s of decode work).
    if (cur < 0 || target < cur - frame_dur * 0.5 || target > cur + 3.0) {
      if (seek_to(d, target) < 0) {
        set_error(d, "seek failed");
        return written;
      }
    }
    // Decode forward until we reach the target timestamp.
    bool got = false;
    while (true) {
      int ret = next_frame(d);
      if (ret <= 0) break;
      double sec = frame_pts_seconds(d, d->frame);
      if (sec >= target - frame_dur * 0.5) {
        scale_into(d, d->frame, out + frame_bytes * slot, out_w, out_h);
        got = true;
        break;
      }
    }
    if (!got) {
      // EOF before target: replicate the last decoded frame if any.
      if (d->last_pts != INT64_MIN) {
        scale_into(d, d->frame, out + frame_bytes * slot, out_w, out_h);
      } else {
        set_error(d, "decode failed before target");
        return written;
      }
    }
    written++;
  }
  return written;
}

// Single forward sweep: emit one frame per `period` seconds, starting at 0,
// up to `count` frames. This fills the 1-fps HBM cache (period = 1.0).
// out: [count, out_h, out_w, 3]. Returns frames written.
int vd_decode_sweep(void* h, double period, int count, uint8_t* out,
                    int out_w, int out_h) {
  auto* d = (Decoder*)h;
  if (!ensure_sws(d, out_w, out_h)) {
    set_error(d, "swscale init failed");
    return -1;
  }
  if (seek_to(d, 0.0) < 0) {
    set_error(d, "rewind failed");
    return -2;
  }
  const size_t frame_bytes = (size_t)out_w * out_h * 3;
  int written = 0;
  double next_target = 0.0;
  bool have_prev = false;

  while (written < count) {
    int ret = next_frame(d);
    if (ret < 0) {
      set_error(d, "decode error in sweep");
      break;
    }
    if (ret == 0) break;  // EOF
    double sec = frame_pts_seconds(d, d->frame);
    while (written < count && sec >= next_target) {
      scale_into(d, d->frame, out + frame_bytes * written, out_w, out_h);
      written++;
      next_target = written * period;
    }
    have_prev = true;
  }
  // Pad the tail with the last decoded frame (videos whose container
  // duration overestimates the stream).
  if (have_prev) {
    while (written < count) {
      std::memcpy(out + frame_bytes * written,
                  out + frame_bytes * (written - 1), frame_bytes);
      written++;
    }
  }
  return written;
}

}  // extern "C"
