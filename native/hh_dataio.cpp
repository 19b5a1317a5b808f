// hh_dataio: host-side native decode stage for the TPU data pipeline.
//
// TPU-native replacement for the reference's decord/OpenCV/PyAV wheel
// stack (reference: base/base_dataset.py video_reader registry). The
// pipeline contract: this stage produces raw uint8 RGB frames on the
// host; resize/normalise run fused on-device (ops/preprocess.py).
//
// Components:
//  - JPEG decode (libjpeg) with optional bilinear resize — Epic-Kitchens
//    frame directories (reference read_frames_cv2_epic).
//  - batched multi-threaded JPEG decode (pthread pool) to keep TPU fed.
//  - mp4/chunk clip decode by piping rawvideo out of an ffmpeg CLI
//    process (gated: returns -2 when ffmpeg is absent). One process per
//    clip span; frames are selected host-side, so 600 s chunk files are
//    only decoded over [start, end).
//
// Exposed as a C ABI consumed via ctypes (data/native.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <thread>
#include <atomic>

#include <jpeglib.h>
#include <csetjmp>

extern "C" {

struct ErrMgr {
    jpeg_error_mgr pub;
    jmp_buf jmp;
};

static void err_exit(j_common_ptr cinfo) {
    ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
    longjmp(e->jmp, 1);
}

// Decode one JPEG file to RGB. If out_h/out_w > 0, bilinearly resize into
// (out_h, out_w); otherwise the caller must have sized `out` to the
// native dims (query with jpeg_dims). Returns 0 on success.
static int decode_jpeg_impl(const char* path, uint8_t* out, int out_h, int out_w,
                            int* native_h, int* native_w) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = err_exit;
    if (setjmp(jerr.jmp)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -3;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int h = cinfo.output_height, w = cinfo.output_width, c = cinfo.output_components;
    if (native_h) *native_h = h;
    if (native_w) *native_w = w;
    std::vector<uint8_t> buf;
    uint8_t* dst = out;
    bool need_resize = out_h > 0 && out_w > 0 && (out_h != h || out_w != w);
    if (need_resize) {
        buf.resize(static_cast<size_t>(h) * w * 3);
        dst = buf.data();
    }
    std::vector<uint8_t> row(static_cast<size_t>(w) * c);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* rp = dst + static_cast<size_t>(cinfo.output_scanline) * w * 3;
        JSAMPROW rows[1] = {rp};
        jpeg_read_scanlines(&cinfo, rows, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    if (need_resize) {
        // bilinear resize (align_corners=false convention)
        for (int y = 0; y < out_h; ++y) {
            float sy = (y + 0.5f) * h / out_h - 0.5f;
            int y0 = sy < 0 ? 0 : static_cast<int>(sy);
            int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
            float fy = sy - y0;
            if (fy < 0) fy = 0;
            for (int x = 0; x < out_w; ++x) {
                float sx = (x + 0.5f) * w / out_w - 0.5f;
                int x0 = sx < 0 ? 0 : static_cast<int>(sx);
                int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
                float fx = sx - x0;
                if (fx < 0) fx = 0;
                for (int ch = 0; ch < 3; ++ch) {
                    float a = buf[(static_cast<size_t>(y0) * w + x0) * 3 + ch];
                    float b = buf[(static_cast<size_t>(y0) * w + x1) * 3 + ch];
                    float cpx = buf[(static_cast<size_t>(y1) * w + x0) * 3 + ch];
                    float d = buf[(static_cast<size_t>(y1) * w + x1) * 3 + ch];
                    float v = a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx +
                              cpx * fy * (1 - fx) + d * fy * fx;
                    out[(static_cast<size_t>(y) * out_w + x) * 3 + ch] =
                        static_cast<uint8_t>(v + 0.5f);
                }
            }
        }
    }
    return 0;
}

int hh_jpeg_dims(const char* path, int* h, int* w) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = err_exit;
    if (setjmp(jerr.jmp)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -3;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

int hh_decode_jpeg(const char* path, uint8_t* out, int out_h, int out_w) {
    return decode_jpeg_impl(path, out, out_h, out_w, nullptr, nullptr);
}

// Decode n JPEGs into out (n, out_h, out_w, 3) with a thread pool.
// Returns number of failures (failed slots are zero-filled).
int hh_decode_jpeg_batch(const char** paths, int n, uint8_t* out, int out_h,
                         int out_w, int num_threads) {
    if (num_threads < 1) num_threads = 1;
    std::atomic<int> next(0), failures(0);
    const size_t stride = static_cast<size_t>(out_h) * out_w * 3;
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            uint8_t* dst = out + stride * i;
            if (decode_jpeg_impl(paths[i], dst, out_h, out_w, nullptr, nullptr) != 0) {
                memset(dst, 0, stride);
                failures.fetch_add(1);
            }
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return failures.load();
}

// Decode a clip span [start_sec, start_sec + duration) from a video file
// by piping rgb24 rawvideo out of ffmpeg at `fps` frames/sec scaled to
// (w, h). Writes up to max_frames frames into out; returns the number of
// frames decoded, -2 if ffmpeg is unavailable, <0 on other failures.
int hh_decode_clip_ffmpeg(const char* path, double start_sec, double duration,
                          double fps, int w, int h, int max_frames,
                          uint8_t* out) {
    if (system("command -v ffmpeg > /dev/null 2>&1") != 0) return -2;
    char cmd[4096];
    snprintf(cmd, sizeof(cmd),
             "ffmpeg -nostdin -loglevel error -ss %.4f -t %.4f -i '%s' "
             "-vf 'fps=%.6f,scale=%d:%d' -f rawvideo -pix_fmt rgb24 - 2>/dev/null",
             start_sec, duration, path, fps, w, h);
    FILE* p = popen(cmd, "r");
    if (!p) return -1;
    const size_t frame_bytes = static_cast<size_t>(w) * h * 3;
    int count = 0;
    while (count < max_frames) {
        size_t got = fread(out + frame_bytes * count, 1, frame_bytes, p);
        if (got < frame_bytes) break;
        ++count;
    }
    pclose(p);
    return count;
}

int hh_has_ffmpeg() {
    return system("command -v ffmpeg > /dev/null 2>&1") == 0 ? 1 : 0;
}

}  // extern "C"
