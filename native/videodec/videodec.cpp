// Native video decoder: seek-based selective frame extraction via libav.
//
// Replaces the reference's data-path decode strategy — an ffmpeg-python
// subprocess that decodes the ENTIRE video to raw RGB over a pipe per
// sample (/root/reference/vgqa/data/vidstg_dataset.py:105-141) and decord
// in the inference path (vgqa/inference/video_utils.py:17-43). This
// implementation seeks to the nearest keyframe before each requested frame
// and decodes forward only as far as needed, converting to packed RGB24
// with swscale. Two additional levers over the round-2 version:
//
//  * vd_read_frames_scaled_mt: the sorted unique frame list is split into
//    contiguous ranges decoded CONCURRENTLY, one independent
//    format/codec/sws context per thread (serving hosts have many cores;
//    the decode itself was the serving-path bottleneck).
//  * skip_frame=NONREF while the decode position is far from the next
//    wanted frame: non-reference frames that are neither output nor needed
//    as prediction sources are dropped at the decoder level (bit-exact for
//    every emitted frame, since skipped frames are by definition never
//    referenced).
//
// Exposed as a C ABI consumed through ctypes (vgqa_tpu/native/videodec.py).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Decoding sequentially is cheaper than a seek for short skips.
constexpr long kSeekThreshold = 64;
// Keep decoding ALL frames (incl. non-ref) within this distance of the next
// wanted frame; beyond it non-reference frames are discarded pre-decode.
// Must exceed the codec's max reorder depth (h264 <= 16).
constexpr long kSkipMargin = 24;

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  int stream_idx = -1;
  int width = 0;
  int height = 0;
  double fps = 0.0;
  int64_t start_pts = 0;
  double pts_per_frame = 0.0;

  ~Decoder() {
    if (sws) sws_freeContext(sws);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }

  // avcodec frame-threading: 0 = auto (core count). Range-sliced decode
  // passes a divided budget so k contexts don't each spawn ncores threads
  // (O(ncores^2) oversubscription on many-core serving hosts).
  int codec_threads = 0;

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    stream_idx =
        av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (stream_idx < 0) return -3;
    AVStream* st = fmt->streams[stream_idx];
    const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!dec) return -4;
    codec = avcodec_alloc_context3(dec);
    if (avcodec_parameters_to_context(codec, st->codecpar) < 0) return -5;
    codec->thread_count = codec_threads;
    if (avcodec_open2(codec, dec, nullptr) < 0) return -6;

    width = codec->width;
    height = codec->height;
    AVRational fr =
        st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
    fps = fr.den && fr.num ? av_q2d(fr) : 30.0;
    start_pts = st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time;
    pts_per_frame = 1.0 / (fps * av_q2d(st->time_base));
    return 0;
  }

  int64_t frame_to_pts(long frame_idx) const {
    return start_pts + (int64_t)llround(frame_idx * pts_per_frame);
  }

  long pts_to_frame(int64_t pts) const {
    return lround((double)(pts - start_pts) / pts_per_frame);
  }

  int total_frames() {
    AVStream* st = fmt->streams[stream_idx];
    if (st->nb_frames > 0) return (int)st->nb_frames;
    double dur = 0;
    if (st->duration != AV_NOPTS_VALUE)
      dur = st->duration * av_q2d(st->time_base);
    else if (fmt->duration != AV_NOPTS_VALUE)
      dur = (double)fmt->duration / AV_TIME_BASE;
    return (int)(dur * fps + 0.5);
  }
};

// Decode uniq[lo..hi) (sorted, unique frame indices) into decoded[lo..hi)
// with an independent Decoder instance. Thread-safe: ranges are disjoint.
// yuv != 0 scales to planar YUV420P (I420 layout: Y then U then V) instead
// of RGB24 — half the bytes per pixel; the consumer converts to RGB
// on-device (colorspace math is free on a vector unit, host-to-device
// bytes are the serving bottleneck).
int decode_range(const char* path, const std::vector<long>& uniq, size_t lo,
                 size_t hi, std::vector<std::vector<uint8_t>>& decoded,
                 int out_w, int out_h, int yuv, int codec_threads) {
  Decoder d;
  d.codec_threads = codec_threads;
  int rc = d.open(path);
  if (rc != 0) return rc;
  if (out_w <= 0) out_w = d.width;
  if (out_h <= 0) out_h = d.height;
  const int frame_bytes =
      yuv ? out_w * out_h + 2 * ((out_w / 2) * (out_h / 2))
          : out_w * out_h * 3;

  d.sws = sws_getContext(d.width, d.height, d.codec->pix_fmt, out_w, out_h,
                         yuv ? AV_PIX_FMT_YUV420P : AV_PIX_FMT_RGB24,
                         SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!d.sws) return -7;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();

  size_t cursor = lo;       // first uniq index not yet decoded
  long last_decoded = -1;   // highest frame index seen since last seek
  bool at_eof = false;

  auto convert_into = [&](size_t i, AVFrame* f) {
    decoded[i].resize(frame_bytes);
    uint8_t* base = decoded[i].data();
    if (yuv) {
      uint8_t* dst[3] = {base, base + out_w * out_h,
                         base + out_w * out_h + (out_w / 2) * (out_h / 2)};
      int dst_stride[3] = {out_w, out_w / 2, out_w / 2};
      sws_scale(d.sws, f->data, f->linesize, 0, d.height, dst, dst_stride);
    } else {
      uint8_t* dst[1] = {base};
      int dst_stride[1] = {out_w * 3};
      sws_scale(d.sws, f->data, f->linesize, 0, d.height, dst, dst_stride);
    }
  };

  // Store a decoded frame: exact index matches, plus overshoot fallback
  // (seek landed past a wanted frame -> take the nearest-after frame).
  auto handle_frame = [&](AVFrame* f) {
    long fidx = d.pts_to_frame(
        f->best_effort_timestamp != AV_NOPTS_VALUE ? f->best_effort_timestamp
                                                   : f->pts);
    last_decoded = std::max(last_decoded, fidx);
    for (size_t i = cursor; i < hi && uniq[i] <= fidx; ++i) {
      if (decoded[i].empty()) convert_into(i, f);
    }
    while (cursor < hi && !decoded[cursor].empty()) ++cursor;
  };

  while (cursor < hi && !at_eof) {
    long target = uniq[cursor];
    if (last_decoded < 0 || target > last_decoded + kSeekThreshold ||
        target <= last_decoded) {
      av_seek_frame(d.fmt, d.stream_idx, d.frame_to_pts(target),
                    AVSEEK_FLAG_BACKWARD);
      avcodec_flush_buffers(d.codec);
      last_decoded = -1;
    }
    // decode until the target frame is stored or EOF
    while (cursor < hi && uniq[cursor] == target) {
      int read_rc = av_read_frame(d.fmt, pkt);
      if (read_rc < 0) {
        d.codec->skip_frame = AVDISCARD_DEFAULT;
        avcodec_send_packet(d.codec, nullptr);  // flush
        while (avcodec_receive_frame(d.codec, frame) == 0) {
          handle_frame(frame);
          av_frame_unref(frame);
        }
        at_eof = true;
        break;
      }
      if (pkt->stream_index != d.stream_idx) {
        av_packet_unref(pkt);
        continue;
      }
      // Far from the target, non-reference frames can't influence any
      // output pixel — drop them pre-decode. Decided PER PACKET from the
      // packet's own pts-derived frame index: the margin covers reorder
      // depth, and a packet whose frame is itself wanted is never
      // discarded (a >margin run of consecutive non-ref frames could
      // otherwise swallow a wanted frame at its tail — last_decoded only
      // advances on decoded frames, so the distance check alone stays
      // true across the whole run). No packet pts -> conservative decode.
      bool drop_nonref = false;
      if (last_decoded >= 0 && target - last_decoded > kSkipMargin &&
          pkt->pts != AV_NOPTS_VALUE) {
        long pfidx = d.pts_to_frame(pkt->pts);
        drop_nonref = pfidx < target - kSkipMargin ||
                      !std::binary_search(uniq.begin() + cursor,
                                          uniq.begin() + hi, pfidx);
      }
      d.codec->skip_frame =
          drop_nonref ? AVDISCARD_NONREF : AVDISCARD_DEFAULT;
      int src = avcodec_send_packet(d.codec, pkt);
      av_packet_unref(pkt);
      if (src < 0 && src != AVERROR(EAGAIN)) {
        at_eof = true;
        break;
      }
      while (avcodec_receive_frame(d.codec, frame) == 0) {
        handle_frame(frame);
        av_frame_unref(frame);
      }
    }
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  return 0;
}

int read_frames_impl(const char* path, const long* frame_ids, int n,
                     uint8_t* out, int out_w, int out_h, int num_threads,
                     int yuv = 0, int* full_range = nullptr) {
  if (out_w <= 0 || out_h <= 0 || full_range) {
    Decoder probe;
    int rc = probe.open(path);
    if (rc != 0) return rc;
    if (out_w <= 0) out_w = probe.width;
    if (out_h <= 0) out_h = probe.height;
    if (full_range) {
      // full-range (JPEG) sources need different YUV->RGB coefficients on
      // the device side; the flag also covers yuvj* pix fmts whose range
      // tag is unspecified
      AVCodecParameters* par = probe.fmt->streams[probe.stream_idx]->codecpar;
      int fmt = par->format;
      *full_range = (par->color_range == AVCOL_RANGE_JPEG ||
                     fmt == AV_PIX_FMT_YUVJ420P || fmt == AV_PIX_FMT_YUVJ422P ||
                     fmt == AV_PIX_FMT_YUVJ444P)
                        ? 1
                        : 0;
    }
  }
  if (yuv && (out_w % 2 || out_h % 2)) return -9;
  const int frame_bytes =
      yuv ? out_w * out_h + 2 * ((out_w / 2) * (out_h / 2))
          : out_w * out_h * 3;

  std::vector<long> wanted(frame_ids, frame_ids + n);
  std::vector<long> uniq(wanted);
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());

  std::vector<std::vector<uint8_t>> decoded(uniq.size());

  size_t k = (size_t)std::max(1, num_threads);
  // no point spinning up a decoder for fewer than a handful of frames
  k = std::min(k, (uniq.size() + 7) / 8);
  k = std::max<size_t>(k, 1);

  if (k == 1) {
    int rc = decode_range(path, uniq, 0, uniq.size(), decoded, out_w, out_h,
                          yuv, /*codec_threads=*/0);
    if (rc != 0) return rc;
  } else {
    // split the core budget across the k range decoders: each codec gets
    // ~ncores/k frame threads instead of ncores each (which would put
    // O(ncores^2) threads on a many-core host)
    unsigned hc = std::thread::hardware_concurrency();
    int per_ctx = hc ? std::max(1, (int)(hc / k)) : 1;
    std::vector<std::thread> threads;
    std::vector<int> rcs(k, 0);
    size_t per = (uniq.size() + k - 1) / k;
    for (size_t t = 0; t < k; ++t) {
      size_t lo = t * per;
      size_t hi = std::min(uniq.size(), lo + per);
      if (lo >= hi) break;
      threads.emplace_back([&, t, lo, hi]() {
        rcs[t] = decode_range(path, uniq, lo, hi, decoded, out_w, out_h, yuv,
                              per_ctx);
      });
    }
    for (auto& th : threads) th.join();
    for (size_t t = 0; t < k; ++t)
      if (rcs[t] != 0) return rcs[t];
  }

  // frames past EOF (metadata frame counts can overshoot): reuse the
  // nearest earlier decoded frame (the reference's whole-video decode has
  // the same failure mode handled by numpy fancy-index wrap/clamp)
  for (size_t i = 0; i < uniq.size(); ++i) {
    if (decoded[i].empty()) {
      size_t j = i;
      while (j > 0 && decoded[j].empty()) --j;
      if (decoded[j].empty()) return -8;
      decoded[i] = decoded[j];
    }
  }

  for (int i = 0; i < n; ++i) {
    auto it = std::lower_bound(uniq.begin(), uniq.end(), wanted[i]);
    size_t j = (size_t)(it - uniq.begin());
    std::memcpy(out + (size_t)i * frame_bytes, decoded[j].data(), frame_bytes);
  }
  return 0;
}

}  // namespace

extern "C" {

// Returns 0 on success.
int vd_info(const char* path, int* total_frames, double* fps, int* width,
            int* height) {
  Decoder d;
  int rc = d.open(path);
  if (rc != 0) return rc;
  *total_frames = d.total_frames();
  *fps = d.fps;
  *width = d.width;
  *height = d.height;
  return 0;
}

// Decode the frames listed in frame_ids (any order, repeats allowed) into
// `out` (n * out_h * out_w * 3 bytes, RGB24), scaling to (out_w, out_h)
// inside the same swscale pass that converts pixel format (out_w/out_h of
// 0 keep the native size). Returns 0 on success.
int vd_read_frames_scaled(const char* path, const long* frame_ids, int n,
                          uint8_t* out, int out_w, int out_h) {
  return read_frames_impl(path, frame_ids, n, out, out_w, out_h, 1);
}

// As above, but the sorted unique frame list is split into num_threads
// contiguous ranges decoded concurrently (independent demux/codec/sws
// contexts per thread; output is bit-identical to the single-thread path).
int vd_read_frames_scaled_mt(const char* path, const long* frame_ids, int n,
                             uint8_t* out, int out_w, int out_h,
                             int num_threads) {
  return read_frames_impl(path, frame_ids, n, out, out_w, out_h, num_threads);
}

// YUV420P variant: `out` receives n * (out_w*out_h*3/2) bytes, each frame
// in I420 plane order (Y [h,w], U [h/2,w/2], V [h/2,w/2]) scaled to
// (out_w, out_h) — half the bytes of RGB24, for links where
// host-to-device upload dominates; the consumer converts to RGB
// on-device. `full_range` (out) is 1 when the source is full-range
// (JPEG/yuvj*) so the consumer can pick matching coefficients. out_w and
// out_h must be even (returns -9 otherwise).
int vd_read_frames_scaled_yuv_mt(const char* path, const long* frame_ids,
                                 int n, uint8_t* out, int out_w, int out_h,
                                 int num_threads, int* full_range) {
  return read_frames_impl(path, frame_ids, n, out, out_w, out_h, num_threads,
                          /*yuv=*/1, full_range);
}

// Back-compat: native-size decode.
int vd_read_frames(const char* path, const long* frame_ids, int n,
                   uint8_t* out) {
  return read_frames_impl(path, frame_ids, n, out, 0, 0, 1);
}

}  // extern "C"
