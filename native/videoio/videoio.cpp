// videoio: native video decode/encode for the data layer and app IO.
//
// TPU-native replacement for the reference's decord dependency (C++ ffmpeg
// wrapper used by data/dataloader/video_decode.py and
// utils/common_utils.py:414 read_video_to_tensor) and for torchvision's mp4
// writer (app.py:97-99). Links the system libavformat/libavcodec/libswscale.
//
// C ABI (consumed via ctypes from t2v_turbo_tpu/data/videoio.py):
//   vio_probe(path, &info)                      -> 0 on success
//   vio_decode(path, n_frames, target_fps, mode, seed, out_w, out_h, buf)
//       decodes n_frames sampled at target_fps (uniform from a random or
//       zero temporal offset), scaled to (out_w, out_h) RGB24 rows into buf
//   vio_encode(path, frames, t, h, w, fps, codec) -> mp4/mpeg4 by default
//   vio_decode_audio(data, size, rate, nch, max_s, out, &ch, &src_rate)
//       decodes an in-memory audio blob (tar member) to planar f32 PCM
//   vio_last_error()                            -> thread-local message
//
// Build: make -C native/videoio

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <string>
#include <vector>

static thread_local std::string g_err;

static int fail(const std::string& msg) {
  g_err = msg;
  return -1;
}

extern "C" {

struct VioInfo {
  int width;
  int height;
  double fps;
  int64_t n_frames;
  double duration;
};

const char* vio_last_error() { return g_err.c_str(); }

// RAII helpers -------------------------------------------------------------
struct FmtCtx {
  AVFormatContext* p = nullptr;
  ~FmtCtx() {
    if (p) avformat_close_input(&p);
  }
};
struct CodecCtx {
  AVCodecContext* p = nullptr;
  ~CodecCtx() {
    if (p) avcodec_free_context(&p);
  }
};

static int open_video(const char* path, FmtCtx& fmt, CodecCtx& dec, int* stream_idx) {
  if (avformat_open_input(&fmt.p, path, nullptr, nullptr) < 0)
    return fail(std::string("cannot open ") + path);
  if (avformat_find_stream_info(fmt.p, nullptr) < 0)
    return fail("no stream info");
  const AVCodec* codec = nullptr;
  int idx = av_find_best_stream(fmt.p, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (idx < 0 || !codec) return fail("no video stream");
  *stream_idx = idx;
  dec.p = avcodec_alloc_context3(codec);
  if (!dec.p) return fail("alloc codec ctx");
  avcodec_parameters_to_context(dec.p, fmt.p->streams[idx]->codecpar);
  dec.p->thread_count = 0;  // auto
  if (avcodec_open2(dec.p, codec, nullptr) < 0) return fail("open codec");
  return 0;
}

int vio_probe(const char* path, VioInfo* out) {
  FmtCtx fmt;
  CodecCtx dec;
  int idx;
  if (open_video(path, fmt, dec, &idx) != 0) return -1;
  AVStream* st = fmt.p->streams[idx];
  out->width = dec.p->width;
  out->height = dec.p->height;
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  out->fps = fr.den ? av_q2d(fr) : 0.0;
  out->duration = (st->duration > 0)
                      ? st->duration * av_q2d(st->time_base)
                      : (fmt.p->duration > 0 ? fmt.p->duration / (double)AV_TIME_BASE
                                             : 0.0);
  out->n_frames = st->nb_frames > 0
                      ? st->nb_frames
                      : (int64_t)(out->duration * out->fps + 0.5);
  return 0;
}

// mode: 0 = start at t=0; 1 = random temporal offset (seeded)
int vio_decode(const char* path, int n_frames, double target_fps, int mode,
               unsigned seed, int out_w, int out_h, uint8_t* out) {
  FmtCtx fmt;
  CodecCtx dec;
  int idx;
  if (open_video(path, fmt, dec, &idx) != 0) return -1;
  AVStream* st = fmt.p->streams[idx];
  double tb = av_q2d(st->time_base);

  VioInfo info;
  {
    AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
    info.fps = fr.den ? av_q2d(fr) : 30.0;
    info.duration = (st->duration > 0)
                        ? st->duration * tb
                        : (fmt.p->duration > 0 ? fmt.p->duration / (double)AV_TIME_BASE : 0.0);
  }
  if (target_fps <= 0) target_fps = info.fps;
  if (out_w <= 0) out_w = dec.p->width;
  if (out_h <= 0) out_h = dec.p->height;

  double clip_len = (n_frames - 1) / target_fps;
  double max_off = std::max(0.0, info.duration - clip_len - 1e-3);
  double offset = 0.0;
  if (mode == 1 && max_off > 0) {
    std::mt19937 rng(seed);
    offset = std::uniform_real_distribution<double>(0.0, max_off)(rng);
  }
  std::vector<double> want(n_frames);
  for (int i = 0; i < n_frames; i++) want[i] = offset + i / target_fps;

  SwsContext* sws =
      sws_getContext(dec.p->width, dec.p->height, dec.p->pix_fmt, out_w, out_h,
                     AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!sws) return fail("sws ctx");

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int next = 0;          // next wanted index
  int64_t filled = 0;    // frames written
  double last_t = -1e9;
  const size_t frame_bytes = (size_t)out_w * out_h * 3;

  auto emit = [&](AVFrame* f, double t) {
    while (next < n_frames && t + 1e-9 >= want[next]) {
      uint8_t* dst[1] = {out + (size_t)next * frame_bytes};
      int dst_stride[1] = {out_w * 3};
      sws_scale(sws, f->data, f->linesize, 0, dec.p->height, dst, dst_stride);
      next++;
      filled++;
    }
  };

  int ret = 0;
  while (next < n_frames && (ret = av_read_frame(fmt.p, pkt)) >= 0) {
    if (pkt->stream_index == idx) {
      if (avcodec_send_packet(dec.p, pkt) == 0) {
        while (avcodec_receive_frame(dec.p, frame) == 0) {
          int64_t pts = frame->best_effort_timestamp != AV_NOPTS_VALUE
                            ? frame->best_effort_timestamp
                            : frame->pts;
          double t = pts != AV_NOPTS_VALUE ? pts * tb : last_t + 1.0 / info.fps;
          last_t = t;
          emit(frame, t);
          if (next >= n_frames) break;
        }
      }
    }
    av_packet_unref(pkt);
  }
  // flush decoder
  if (next < n_frames) {
    avcodec_send_packet(dec.p, nullptr);
    while (next < n_frames && avcodec_receive_frame(dec.p, frame) == 0) {
      int64_t pts = frame->best_effort_timestamp != AV_NOPTS_VALUE
                        ? frame->best_effort_timestamp
                        : frame->pts;
      double t = pts != AV_NOPTS_VALUE ? pts * tb : last_t + 1.0 / info.fps;
      last_t = t;
      emit(frame, t);
    }
  }
  // pad by repeating the last decoded frame (short clips)
  while (next < n_frames && filled > 0) {
    std::memcpy(out + (size_t)next * frame_bytes,
                out + (size_t)(next - 1) * frame_bytes, frame_bytes);
    next++;
  }

  sws_freeContext(sws);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (filled == 0) return fail("decoded zero frames");
  return next;
}

// decord get_batch analog (reference video_decode.py:222-224 decodes only
// the frame indices the cut-aware sampler chose): decode exact frame
// indices start, start+stride, ..., start+(n_frames-1)*stride, scaled to
// (out_w, out_h) RGB24 into out. Seeks to the nearest prior keyframe and
// derives each decoded frame's index from its timestamp, so the cost is
// O(window + keyframe distance), not O(start).
int vio_decode_window(const char* path, int64_t start, int stride,
                      int n_frames, int out_w, int out_h, uint8_t* out) {
  FmtCtx fmt;
  CodecCtx dec;
  int idx;
  if (open_video(path, fmt, dec, &idx) != 0) return -1;
  AVStream* st = fmt.p->streams[idx];
  double tb = av_q2d(st->time_base);
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  double fps = fr.den ? av_q2d(fr) : 30.0;
  if (fps <= 0) fps = 30.0;
  if (stride < 1) stride = 1;
  if (out_w <= 0) out_w = dec.p->width;
  if (out_h <= 0) out_h = dec.p->height;

  if (start > 0) {
    int64_t ts = (int64_t)(start / fps / tb);
    av_seek_frame(fmt.p, idx, ts, AVSEEK_FLAG_BACKWARD);
    avcodec_flush_buffers(dec.p);
  }

  SwsContext* sws =
      sws_getContext(dec.p->width, dec.p->height, dec.p->pix_fmt, out_w, out_h,
                     AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!sws) return fail("sws ctx");

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int next = 0;
  int64_t filled = 0;
  double last_t = -1e9;
  const size_t frame_bytes = (size_t)out_w * out_h * 3;

  auto emit = [&](AVFrame* f, double t) {
    int64_t fidx = (int64_t)(t * fps + 0.5);
    while (next < n_frames && fidx >= start + (int64_t)next * stride) {
      uint8_t* dst[1] = {out + (size_t)next * frame_bytes};
      int dst_stride[1] = {out_w * 3};
      sws_scale(sws, f->data, f->linesize, 0, dec.p->height, dst, dst_stride);
      next++;
      filled++;
    }
  };

  int ret = 0;
  while (next < n_frames && (ret = av_read_frame(fmt.p, pkt)) >= 0) {
    if (pkt->stream_index == idx) {
      if (avcodec_send_packet(dec.p, pkt) == 0) {
        while (avcodec_receive_frame(dec.p, frame) == 0) {
          int64_t pts = frame->best_effort_timestamp != AV_NOPTS_VALUE
                            ? frame->best_effort_timestamp
                            : frame->pts;
          double t = pts != AV_NOPTS_VALUE ? pts * tb : last_t + 1.0 / fps;
          last_t = t;
          emit(frame, t);
          if (next >= n_frames) break;
        }
      }
    }
    av_packet_unref(pkt);
  }
  if (next < n_frames) {
    avcodec_send_packet(dec.p, nullptr);
    while (next < n_frames && avcodec_receive_frame(dec.p, frame) == 0) {
      int64_t pts = frame->best_effort_timestamp != AV_NOPTS_VALUE
                        ? frame->best_effort_timestamp
                        : frame->pts;
      double t = pts != AV_NOPTS_VALUE ? pts * tb : last_t + 1.0 / fps;
      last_t = t;
      emit(frame, t);
    }
  }
  while (next < n_frames && filled > 0) {
    std::memcpy(out + (size_t)next * frame_bytes,
                out + (size_t)(next - 1) * frame_bytes, frame_bytes);
    next++;
  }

  sws_freeContext(sws);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (filled == 0) return fail("decoded zero frames in window");
  return next;
}

int vio_encode(const char* path, const uint8_t* frames, int t, int h, int w,
               double fps, const char* codec_name) {
  AVFormatContext* oc = nullptr;
  avformat_alloc_output_context2(&oc, nullptr, nullptr, path);
  if (!oc) return fail("alloc output ctx");

  const AVCodec* codec = nullptr;
  if (codec_name && codec_name[0]) codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) codec = avcodec_find_encoder_by_name("libx264");
  if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!codec) return fail("no encoder");

  AVStream* st = avformat_new_stream(oc, nullptr);
  AVCodecContext* c = avcodec_alloc_context3(codec);
  c->width = w;
  c->height = h;
  c->time_base = AVRational{1000, (int)(fps * 1000 + 0.5)};
  st->time_base = c->time_base;
  c->framerate = AVRational{(int)(fps * 1000 + 0.5), 1000};
  c->pix_fmt = AV_PIX_FMT_YUV420P;
  c->gop_size = 12;
  c->bit_rate = (int64_t)w * h * 4 * (int)fps;  // generous
  if (oc->oformat->flags & AVFMT_GLOBALHEADER)
    c->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(c, codec, nullptr) < 0) {
    avcodec_free_context(&c);
    avformat_free_context(oc);
    return fail("open encoder");
  }
  avcodec_parameters_from_context(st->codecpar, c);

  if (!(oc->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) {
      avcodec_free_context(&c);
      avformat_free_context(oc);
      return fail("cannot open output file");
    }
  }
  if (avformat_write_header(oc, nullptr) < 0) {
    avcodec_free_context(&c);
    avformat_free_context(oc);
    return fail("write header");
  }

  SwsContext* sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h,
                                   AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr,
                                   nullptr, nullptr);
  AVFrame* fr = av_frame_alloc();
  fr->format = AV_PIX_FMT_YUV420P;
  fr->width = w;
  fr->height = h;
  av_frame_get_buffer(fr, 0);
  AVPacket* pkt = av_packet_alloc();

  auto drain = [&](bool flush) -> int {
    if (avcodec_send_frame(c, flush ? nullptr : fr) < 0) return -1;
    while (true) {
      int r = avcodec_receive_packet(c, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
      if (r < 0) return -1;
      av_packet_rescale_ts(pkt, c->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(oc, pkt);
      av_packet_unref(pkt);
    }
    return 0;
  };

  int rc = 0;
  for (int i = 0; i < t && rc == 0; i++) {
    av_frame_make_writable(fr);
    const uint8_t* src[1] = {frames + (size_t)i * w * h * 3};
    int src_stride[1] = {w * 3};
    sws_scale(sws, src, src_stride, 0, h, fr->data, fr->linesize);
    fr->pts = i;
    rc = drain(false);
  }
  if (rc == 0) rc = drain(true);
  av_write_trailer(oc);

  sws_freeContext(sws);
  av_frame_free(&fr);
  av_packet_free(&pkt);
  avcodec_free_context(&c);
  if (!(oc->oformat->flags & AVFMT_NOFILE)) avio_closep(&oc->pb);
  avformat_free_context(oc);
  return rc == 0 ? 0 : fail("encode failed");
}

// Audio decode --------------------------------------------------------------
//
// Native replacement for the reference's torchaudio-based AudioDecoder
// (data/dataloader/audio_decode.py:17-49): decode an in-memory audio blob
// (the webdataset tar member — wav/flac/mp3/m4a), resample to target_rate,
// and write up to max_samples float32 samples per channel, planar [C, S].
// Padding/pad-mask policy stays host-side in Python (data/audioio.py), where
// the reference keeps it too.

namespace {

struct MemBuf {
  const uint8_t* p;
  int64_t size;
  int64_t pos;
};

int mem_read(void* opaque, uint8_t* buf, int buf_size) {
  MemBuf* m = static_cast<MemBuf*>(opaque);
  int64_t left = m->size - m->pos;
  if (left <= 0) return AVERROR_EOF;
  int n = (int)std::min<int64_t>(buf_size, left);
  std::memcpy(buf, m->p + m->pos, n);
  m->pos += n;
  return n;
}

int64_t mem_seek(void* opaque, int64_t offset, int whence) {
  MemBuf* m = static_cast<MemBuf*>(opaque);
  if (whence == AVSEEK_SIZE) return m->size;
  int64_t base = (whence == SEEK_CUR) ? m->pos
               : (whence == SEEK_END) ? m->size
                                      : 0;
  int64_t pos = base + offset;
  if (pos < 0 || pos > m->size) return AVERROR(EINVAL);
  m->pos = pos;
  return pos;
}

}  // namespace

// Decodes audio from `data[:size]`. out must hold max_channels*max_samples
// floats (planar: channel c occupies out[c*max_samples : c*max_samples+S]).
// n_channels==0 keeps the stream's channel count; n_channels==1 downmixes
// to mono. Writes the stream's native rate to *src_rate and the produced
// channel count to *out_channels. Returns samples written per channel
// (<= max_samples; decoding stops once the buffer is full), -1 on error,
// or -2 if the stream has more channels than max_channels (out untouched;
// *out_channels holds the real count so the caller can re-allocate).
int64_t vio_decode_audio(const uint8_t* data, int64_t size, int target_rate,
                         int n_channels, int max_channels,
                         int64_t max_samples, float* out, int* out_channels,
                         int* src_rate) {
  MemBuf mem{data, size, 0};
  constexpr int kIoBuf = 1 << 16;
  uint8_t* iobuf = (uint8_t*)av_malloc(kIoBuf);
  AVIOContext* avio =
      avio_alloc_context(iobuf, kIoBuf, 0, &mem, mem_read, nullptr, mem_seek);
  if (!avio) {
    av_free(iobuf);
    return fail("alloc avio");
  }
  FmtCtx fmt;
  fmt.p = avformat_alloc_context();
  fmt.p->pb = avio;
  // avformat_close_input does not free a custom pb; do it ourselves at exit
  struct AvioGuard {
    AVIOContext* p;
    ~AvioGuard() {
      if (p) {
        av_freep(&p->buffer);
        avio_context_free(&p);
      }
    }
  } avio_guard{avio};

  if (avformat_open_input(&fmt.p, nullptr, nullptr, nullptr) < 0)
    return fail("cannot open audio buffer");
  if (avformat_find_stream_info(fmt.p, nullptr) < 0)
    return fail("no stream info");
  const AVCodec* codec = nullptr;
  int idx = av_find_best_stream(fmt.p, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
  if (idx < 0 || !codec) return fail("no audio stream");
  CodecCtx dec;
  dec.p = avcodec_alloc_context3(codec);
  if (!dec.p) return fail("alloc codec ctx");
  avcodec_parameters_to_context(dec.p, fmt.p->streams[idx]->codecpar);
  if (avcodec_open2(dec.p, codec, nullptr) < 0) return fail("open codec");
  if (dec.p->ch_layout.nb_channels <= 0)
    av_channel_layout_default(&dec.p->ch_layout, 1);

  int nch = (n_channels > 0) ? n_channels : dec.p->ch_layout.nb_channels;
  if (target_rate <= 0) target_rate = dec.p->sample_rate;
  *out_channels = nch;
  *src_rate = dec.p->sample_rate;
  if (nch > max_channels) {
    fail("stream channel count exceeds the output allocation");
    return -2;
  }

  AVChannelLayout out_layout;
  av_channel_layout_default(&out_layout, nch);
  SwrContext* swr = nullptr;
  int ret = swr_alloc_set_opts2(&swr, &out_layout, AV_SAMPLE_FMT_FLTP,
                                target_rate, &dec.p->ch_layout,
                                dec.p->sample_fmt, dec.p->sample_rate, 0,
                                nullptr);
  if (ret < 0 || !swr || swr_init(swr) < 0) {
    if (swr) swr_free(&swr);
    return fail("swr init");
  }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t written = 0;
  std::vector<uint8_t*> planes(nch);

  auto convert = [&](AVFrame* f) {
    while (written < max_samples) {
      int64_t room = max_samples - written;
      for (int c = 0; c < nch; c++)
        planes[c] = (uint8_t*)(out + (int64_t)c * max_samples + written);
      int got = swr_convert(swr, planes.data(), (int)std::min<int64_t>(room, INT32_MAX),
                            f ? (const uint8_t**)f->data : nullptr,
                            f ? f->nb_samples : 0);
      if (got <= 0) break;
      written += got;
      if (f) break;  // non-flush: one call consumes the whole input frame
    }
  };

  while (written < max_samples && av_read_frame(fmt.p, pkt) >= 0) {
    if (pkt->stream_index == idx && avcodec_send_packet(dec.p, pkt) == 0) {
      while (written < max_samples &&
             avcodec_receive_frame(dec.p, frame) == 0)
        convert(frame);
    }
    av_packet_unref(pkt);
  }
  if (written < max_samples) {  // flush decoder, then the resampler
    avcodec_send_packet(dec.p, nullptr);
    while (written < max_samples && avcodec_receive_frame(dec.p, frame) == 0)
      convert(frame);
    convert(nullptr);
  }

  swr_free(&swr);
  av_channel_layout_uninit(&out_layout);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (written == 0) return fail("decoded zero audio samples");
  return written;
}

}  // extern "C"
