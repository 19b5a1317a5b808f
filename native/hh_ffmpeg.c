// hh_ffmpeg — a genuine libavformat/libavcodec/libswscale decoder that
// implements exactly the ffmpeg CLI subset the native clip pipe invokes
// (native/hh_dataio.cpp:173-175, the decord/PyAV replacement for the
// reference's base/base_dataset.py:274-323 production decode):
//
//     ffmpeg -nostdin -loglevel error -ss S -t T -i PATH
//         -vf fps=F,scale=W:H -f rawvideo -pix_fmt rgb24 -
//
// Unlike data/ffmpeg_shim.py (a Python front-end over cv2's bundled
// FFmpeg, shipped for dev/CI images), this is a native binary speaking
// the real libav* C API end to end: libavformat demux, libavcodec
// decode, libswscale bilinear scale + RGB24 conversion, rawvideo on
// stdout. Installing it as `ffmpeg` on PATH (cli.extract_clips
// --install-hh-ffmpeg, docs/DATA.md) makes data.native.has_ffmpeg()
// true and routes the C++ popen pipe through it with zero Python in the
// decode path.
//
// Frame-timing semantics match ffmpeg (and the shim's pinned subset):
//  - input-side -ss S is an accurate seek: demuxer seeks to the nearest
//    keyframe at or before S, decodes forward, DROPS frames with
//    pts < S, and rebases output timestamps so the first kept instant
//    is 0 (rel = pts - S).
//  - -t T keeps frames with rel < T.
//  - fps=F emits one frame per output tick n/F: the latest kept input
//    frame with rel <= tick (floor selection, ties to the frame). At
//    EOF the final frame persists while tick < last_rel + 1/fps_in —
//    i.e. ~ceil(duration * F) frames total, like ffmpeg's fps filter.
//  - scale=W:H is a bilinear squash (SWS_BILINEAR, ffmpeg's default
//    scaler family; no aspect preservation, exactly `scale=W:H`).
//
// Any argument outside the subset is an error (exit 2), so the binary
// never silently accepts a command line it does not implement; open /
// decode failures exit 1. A closed reader (the pipe's max_frames
// truncation triggers EPIPE/SIGPIPE) is a clean exit 0, matching
// ffmpeg's pipe behaviour as consumed by hh_decode_clip_ffmpeg.
//
// Build: make hh_ffmpeg (links -lavformat -lavcodec -lswscale -lavutil).

#include <errno.h>
#include <signal.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>

typedef struct {
    double ss;       // -ss seconds (0 when absent)
    double t;        // -t seconds (<0 when absent)
    double fps;      // fps= filter value (<0 when absent)
    int w, h;        // scale= filter (0 when absent)
    const char *in;  // -i path
} Opts;

static int die(const char *msg, const char *detail, int code) {
    fprintf(stderr, "hh_ffmpeg: %s%s%s\n", msg, detail ? " " : "",
            detail ? detail : "");
    return code;
}

// Parse the supported subset; exit 2 on anything else (mirrors
// data/ffmpeg_shim.py::parse_args so both front-ends reject identically).
static int parse_args(int argc, char **argv, Opts *o) {
    o->ss = 0.0;
    o->t = -1.0;
    o->fps = -1.0;
    o->w = o->h = 0;
    o->in = NULL;
    int saw_rawvideo = 0, saw_rgb24 = 0, saw_out = 0;
    for (int i = 1; i < argc;) {
        const char *a = argv[i];
        if (!strcmp(a, "-nostdin")) {
            i += 1;
        } else if (!strcmp(a, "-loglevel") && i + 1 < argc) {
            i += 2;
        } else if (!strcmp(a, "-ss") && i + 1 < argc) {
            o->ss = atof(argv[i + 1]);
            i += 2;
        } else if (!strcmp(a, "-t") && i + 1 < argc) {
            o->t = atof(argv[i + 1]);
            i += 2;
        } else if (!strcmp(a, "-i") && i + 1 < argc) {
            o->in = argv[i + 1];
            i += 2;
        } else if (!strcmp(a, "-vf") && i + 1 < argc) {
            char *vf = argv[i + 1];
            for (char *f = strtok(vf, ","); f; f = strtok(NULL, ",")) {
                if (!strncmp(f, "fps=", 4)) {
                    o->fps = atof(f + 4);
                } else if (!strncmp(f, "scale=", 6)) {
                    if (sscanf(f + 6, "%d:%d", &o->w, &o->h) != 2)
                        return die("bad scale filter", f, 2);
                } else {
                    return die("unsupported filter", f, 2);
                }
            }
            i += 2;
        } else if (!strcmp(a, "-f") && i + 1 < argc) {
            if (strcmp(argv[i + 1], "rawvideo"))
                return die("unsupported muxer", argv[i + 1], 2);
            saw_rawvideo = 1;
            i += 2;
        } else if (!strcmp(a, "-pix_fmt") && i + 1 < argc) {
            if (strcmp(argv[i + 1], "rgb24"))
                return die("unsupported pix_fmt", argv[i + 1], 2);
            saw_rgb24 = 1;
            i += 2;
        } else if (!strcmp(a, "-") && i == argc - 1) {
            saw_out = 1;
            i += 1;
        } else {
            return die("unsupported argument", a, 2);
        }
    }
    if (!o->in) return die("no -i input", NULL, 2);
    if (!saw_rawvideo || !saw_rgb24 || !saw_out)
        return die("only `-f rawvideo -pix_fmt rgb24 -` output is supported",
                   NULL, 2);
    return 0;
}

typedef struct {
    struct SwsContext *sws;
    uint8_t *buf;       // one packed RGB24 frame
    int ow, oh;         // output dims
    int sw, sh;         // source dims the ctx was built for
    enum AVPixelFormat sfmt;
} Scaler;

static int emit_frame(Scaler *sc, const AVFrame *fr) {
    if (!sc->sws || sc->sw != fr->width || sc->sh != fr->height ||
        sc->sfmt != fr->format) {
        sws_freeContext(sc->sws);
        sc->sws = sws_getContext(fr->width, fr->height, fr->format, sc->ow,
                                 sc->oh, AV_PIX_FMT_RGB24, SWS_BILINEAR, NULL,
                                 NULL, NULL);
        if (!sc->sws) return -1;
        sc->sw = fr->width;
        sc->sh = fr->height;
        sc->sfmt = fr->format;
    }
    uint8_t *dst[4] = {sc->buf, NULL, NULL, NULL};
    int dst_ls[4] = {sc->ow * 3, 0, 0, 0};
    sws_scale(sc->sws, (const uint8_t *const *)fr->data, fr->linesize, 0,
              fr->height, dst, dst_ls);
    size_t nb = (size_t)sc->ow * sc->oh * 3;
    if (fwrite(sc->buf, 1, nb, stdout) != nb)
        return errno == EPIPE ? 1 : -1;  // reader closed: clean stop
    return 0;
}

int main(int argc, char **argv) {
    signal(SIGPIPE, SIG_IGN);  // max_frames truncation closes the pipe
    Opts o;
    int rc = parse_args(argc, argv, &o);
    if (rc) return rc;
    av_log_set_level(AV_LOG_ERROR);

    AVFormatContext *fmt = NULL;
    if (avformat_open_input(&fmt, o.in, NULL, NULL) < 0)
        return die("cannot open", o.in, 1);
    if (avformat_find_stream_info(fmt, NULL) < 0)
        return die("no stream info in", o.in, 1);
    const AVCodec *dec = NULL;
    int vs = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
    if (vs < 0 || !dec) return die("no video stream in", o.in, 1);
    AVStream *st = fmt->streams[vs];

    AVCodecContext *ctx = avcodec_alloc_context3(dec);
    if (!ctx || avcodec_parameters_to_context(ctx, st->codecpar) < 0 ||
        avcodec_open2(ctx, dec, NULL) < 0)
        return die("cannot open decoder for", o.in, 1);

    // input frame rate for the fps filter's terminal hold (see header)
    AVRational fr_q = av_guess_frame_rate(fmt, st, NULL);
    double fps_in = (fr_q.num > 0 && fr_q.den > 0)
                        ? (double)fr_q.num / fr_q.den
                        : 30.0;
    double fps_out = o.fps > 0 ? o.fps : fps_in;
    double tb = av_q2d(st->time_base);

    // accurate seek: keyframe at/before ss, decode forward, drop rel < 0
    if (o.ss > 0) {
        int64_t ts = (int64_t)(o.ss / tb);
        if (st->start_time != AV_NOPTS_VALUE) ts += st->start_time;
        av_seek_frame(fmt, vs, ts, AVSEEK_FLAG_BACKWARD);
    }
    double start_rel =
        st->start_time != AV_NOPTS_VALUE ? st->start_time * tb : 0.0;

    Scaler sc = {0};
    AVPacket *pkt = av_packet_alloc();
    AVFrame *fr = av_frame_alloc();
    AVFrame *last = av_frame_alloc();  // latest kept frame (fps hold)
    int have_last = 0;
    long n_out = 0;
    double last_rel = 0.0;
    const double eps = 1e-6;
    int stop = 0;  // 1 = clean stop (EPIPE / -t reached), <0 = error

    while (!stop && av_read_frame(fmt, pkt) >= 0) {
        if (pkt->stream_index != vs) {
            av_packet_unref(pkt);
            continue;
        }
        if (avcodec_send_packet(ctx, pkt) < 0) {
            av_packet_unref(pkt);
            break;
        }
        av_packet_unref(pkt);
        while (!stop && avcodec_receive_frame(ctx, fr) == 0) {
            int64_t pts = fr->best_effort_timestamp;
            double rel = (pts == AV_NOPTS_VALUE)
                             ? (have_last ? last_rel + 1.0 / fps_in : 0.0)
                             : pts * tb - start_rel - o.ss;
            if (rel < -eps) continue;            // before -ss: drop
            if (o.t >= 0 && rel >= o.t - 1e-9) {  // past -t: done
                stop = 1;
                break;
            }
            if (!sc.buf) {  // first kept frame fixes output geometry
                sc.ow = o.w > 0 ? o.w : fr->width;
                sc.oh = o.h > 0 ? o.h : fr->height;
                sc.buf = malloc((size_t)sc.ow * sc.oh * 3);
                if (!sc.buf) return die("oom", NULL, 1);
            }
            // ticks strictly before this frame belong to the PREVIOUS one
            while (have_last && (double)n_out / fps_out < rel - eps) {
                int e = emit_frame(&sc, last);
                if (e) { stop = e; break; }
                n_out++;
            }
            if (stop) break;
            av_frame_unref(last);
            av_frame_ref(last, fr);
            have_last = 1;
            last_rel = rel;
        }
    }
    // flush the decoder for trailing frames (B-frame reorder tails)
    if (!stop && avcodec_send_packet(ctx, NULL) == 0) {
        while (!stop && avcodec_receive_frame(ctx, fr) == 0) {
            int64_t pts = fr->best_effort_timestamp;
            double rel = (pts == AV_NOPTS_VALUE) ? last_rel + 1.0 / fps_in
                                                 : pts * tb - start_rel - o.ss;
            if (rel < -eps) continue;
            if (o.t >= 0 && rel >= o.t - 1e-9) { stop = 1; break; }
            if (!sc.buf) {
                sc.ow = o.w > 0 ? o.w : fr->width;
                sc.oh = o.h > 0 ? o.h : fr->height;
                sc.buf = malloc((size_t)sc.ow * sc.oh * 3);
                if (!sc.buf) return die("oom", NULL, 1);
            }
            while (have_last && (double)n_out / fps_out < rel - eps) {
                int e = emit_frame(&sc, last);
                if (e) { stop = e; break; }
                n_out++;
            }
            if (stop) break;
            av_frame_unref(last);
            av_frame_ref(last, fr);
            have_last = 1;
            last_rel = rel;
        }
    }
    // terminal hold: the last frame covers ticks < last_rel + 1/fps_in
    if (stop >= 0 && have_last) {
        double end = last_rel + 1.0 / fps_in;
        if (o.t >= 0 && end > o.t) end = o.t;
        while ((double)n_out / fps_out < end - eps) {
            int e = emit_frame(&sc, last);
            if (e) { stop = e > 0 ? 1 : e; break; }
            n_out++;
        }
    }
    fflush(stdout);

    av_frame_free(&fr);
    av_frame_free(&last);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    sws_freeContext(sc.sws);
    free(sc.buf);
    return stop < 0 ? 1 : 0;
}
