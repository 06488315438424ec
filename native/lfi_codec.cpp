// Native image codec for bulk light-field ingest.
//
// Role-equivalent of the reference's vendored stb_image / stb_image_write
// (reference: src/lfLoader.cpp:36, src/interpolator.cu:313), built fresh on
// libpng + libjpeg (the reference's own example input is JPEG,
// src/main.cpp:17). Exposed through a tiny C ABI consumed via ctypes
// (lfinterpolator_tpu/io/codec.py). Decode always yields RGBA8, matching the
// loader contract (STBI_rgb_alpha semantics).

#include <cstddef>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>

#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>  // needs <cstddef>/<cstdio> first (size_t, FILE)
#include <png.h>

extern "C" {

// Decode a PNG file to RGBA8. Returns 0 on success; *out receives a malloc'd
// buffer of width*height*4 bytes (caller frees with lfi_free).
int lfi_decode_png_rgba(const char *path, int *width, int *height,
                        unsigned char **out) {
    *out = nullptr;
    FILE *fp = std::fopen(path, "rb");
    if (!fp) return 1;

    png_byte header[8];
    if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
        std::fclose(fp);
        return 2;
    }

    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) {
        std::fclose(fp);
        return 3;
    }
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        std::fclose(fp);
        return 3;
    }

    // volatile: modified between setjmp and longjmp, so the error path must
    // not read stale register copies (C11 7.13.2.1).
    unsigned char *volatile buf = nullptr;
    png_bytep *volatile rows = nullptr;
    if (setjmp(png_jmpbuf(png))) {  // libpng error handling
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        std::free(buf);
        std::free(rows);
        return 4;
    }

    png_init_io(png, fp);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);

    const png_uint_32 w = png_get_image_width(png, info);
    const png_uint_32 h = png_get_image_height(png, info);
    const int color_type = png_get_color_type(png, info);
    const int bit_depth = png_get_bit_depth(png, info);

    // Normalize every input to 8-bit RGBA.
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color_type == PNG_COLOR_TYPE_RGB || color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_PALETTE)
        png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    png_read_update_info(png, info);

    buf = static_cast<unsigned char *>(std::malloc((size_t)w * h * 4));
    rows = static_cast<png_bytep *>(std::malloc(sizeof(png_bytep) * h));
    if (!buf || !rows) longjmp(png_jmpbuf(png), 1);
    for (png_uint_32 y = 0; y < h; y++) rows[y] = buf + (size_t)y * w * 4;
    png_read_image(png, rows);
    png_read_end(png, nullptr);

    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    std::free(rows);
    *width = (int)w;
    *height = (int)h;
    *out = buf;
    return 0;
}

// Encode an RGBA8 (channels must be 4) buffer to a PNG file. Returns 0 on
// success.
int lfi_encode_png_rgba(const char *path, int width, int height, int channels,
                        const unsigned char *data) {
    if (channels != 4 || width <= 0 || height <= 0 || !data) return 1;
    FILE *fp = std::fopen(path, "wb");
    if (!fp) return 1;

    png_structp png =
        png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) {
        std::fclose(fp);
        return 3;
    }
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_write_struct(&png, nullptr);
        std::fclose(fp);
        return 3;
    }
    png_bytep *volatile rows = nullptr;
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_write_struct(&png, &info);
        std::fclose(fp);
        std::free(rows);
        return 4;
    }

    png_init_io(png, fp);
    png_set_IHDR(png, info, width, height, 8, PNG_COLOR_TYPE_RGBA,
                 PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                 PNG_FILTER_TYPE_DEFAULT);
    // Favor speed: bulk dataset writes dominate; ratio matters less.
    png_set_compression_level(png, 3);
    png_write_info(png, info);

    rows = static_cast<png_bytep *>(std::malloc(sizeof(png_bytep) * height));
    if (!rows) longjmp(png_jmpbuf(png), 1);
    for (int y = 0; y < height; y++)
        rows[y] = const_cast<png_bytep>(data + (size_t)y * width * 4);
    png_write_image(png, rows);
    png_write_end(png, nullptr);

    png_destroy_write_struct(&png, &info);
    std::fclose(fp);
    std::free(rows);
    return 0;
}

namespace {

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    longjmp(reinterpret_cast<JpegErr *>(cinfo->err)->jump, 1);
}

}  // namespace

// Decode a JPEG file to RGBA8. Returns 0 on success; *out receives a malloc'd
// buffer of width*height*4 bytes (caller frees with lfi_free).
int lfi_decode_jpeg_rgba(const char *path, int *width, int *height,
                         unsigned char **out) {
    *out = nullptr;
    FILE *fp = std::fopen(path, "rb");
    if (!fp) return 1;

    jpeg_decompress_struct cinfo;
    JpegErr err;
    cinfo.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = jpeg_err_exit;

    // volatile: modified between setjmp and longjmp (C11 7.13.2.1).
    unsigned char *volatile buf = nullptr;
    if (setjmp(err.jump)) {  // libjpeg fatal error
        jpeg_destroy_decompress(&cinfo);
        std::fclose(fp);
        std::free(buf);
        return 4;
    }

    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, fp);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK)
        longjmp(err.jump, 1);
#ifdef JCS_EXTENSIONS
    // libjpeg-turbo writes RGBA directly -- no repack pass.
    cinfo.out_color_space = JCS_EXT_RGBA;
    const int ch = 4;
#else
    cinfo.out_color_space = JCS_RGB;
    const int ch = 3;
#endif
    jpeg_start_decompress(&cinfo);
    const JDIMENSION w = cinfo.output_width;
    const JDIMENSION h = cinfo.output_height;
    buf = static_cast<unsigned char *>(std::malloc((size_t)w * h * 4));
    if (!buf) longjmp(err.jump, 1);
    while (cinfo.output_scanline < h) {
        JSAMPROW row = buf + (size_t)cinfo.output_scanline * w * ch;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
#ifndef JCS_EXTENSIONS
    // Expand packed RGB -> RGBA in place, back to front (read the triple
    // before writing: source and destination overlap for the first pixels).
    for (size_t i = (size_t)w * h; i-- > 0;) {
        const unsigned char r = buf[i * 3 + 0], g = buf[i * 3 + 1],
                            b = buf[i * 3 + 2];
        buf[i * 4 + 0] = r;
        buf[i * 4 + 1] = g;
        buf[i * 4 + 2] = b;
        buf[i * 4 + 3] = 0xFF;
    }
#endif
    *width = (int)w;
    *height = (int)h;
    *out = buf;
    return 0;
}

void lfi_free(unsigned char *p) { std::free(p); }

// Decode `n` files (PNG or JPEG, sniffed by signature) into a caller-owned
// contiguous RGBA8 stack `out` of n*height*width*4 bytes -- the native
// equivalent of the reference loader's bulk ingest loop
// (reference: src/lfLoader.cpp:59-66), parallel over a std::thread pool.
// Every image must decode to exactly (width, height). Returns 0 on success;
// otherwise the number of failures, with the first failing file's index in
// *err_index and its codec error in *err_code (-1 = resolution mismatch,
// -2 = unreadable/unknown signature).
int lfi_decode_batch_rgba(const char *const *paths, int n, int width,
                          int height, unsigned char *out, int threads,
                          int *err_index, int *err_code) {
    if (err_index) *err_index = -1;
    if (err_code) *err_code = 0;
    if (n == 0) return 0;
    if (n < 0 || width <= 0 || height <= 0 || !out) {
        if (err_code) *err_code = -3;  // invalid arguments, no file examined
        return 1;
    }
    std::atomic<int> next(0), failures(0);
    // lowest failing index + its code, packed so the pair updates atomically
    std::atomic<long long> first_fail(-1);
    const size_t frame = (size_t)width * height * 4;

    auto record = [&](int i, int code) {
        failures.fetch_add(1);
        const long long packed =
            ((long long)i << 32) | (unsigned int)code;
        long long cur = first_fail.load();
        while ((cur == -1 || i < (int)(cur >> 32)) &&
               !first_fail.compare_exchange_weak(cur, packed)) {
        }
    };

    auto worker = [&]() {
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) return;
            unsigned char sig[2] = {0, 0};
            FILE *fp = std::fopen(paths[i], "rb");
            if (!fp) { record(i, -2); continue; }
            const size_t got = std::fread(sig, 1, 2, fp);
            std::fclose(fp);
            int w = 0, h = 0, rc;
            unsigned char *buf = nullptr;
            if (got == 2 && sig[0] == 0x89 && sig[1] == 'P')
                rc = lfi_decode_png_rgba(paths[i], &w, &h, &buf);
            else if (got == 2 && sig[0] == 0xFF && sig[1] == 0xD8)
                rc = lfi_decode_jpeg_rgba(paths[i], &w, &h, &buf);
            else { record(i, -2); continue; }
            if (rc != 0) { record(i, rc); continue; }
            if (w != width || h != height) {
                std::free(buf);
                record(i, -1);
                continue;
            }
            std::memcpy(out + (size_t)i * frame, buf, frame);
            std::free(buf);
        }
    };

    int nt = threads < 1 ? 1 : threads;
    if (nt > n) nt = n;
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int t = 0; t < nt; t++) pool.emplace_back(worker);
    for (auto &th : pool) th.join();
    const long long ff = first_fail.load();
    if (err_index) *err_index = ff == -1 ? -1 : (int)(ff >> 32);
    if (err_code) *err_code = ff == -1 ? 0 : (int)(ff & 0xffffffff);
    return failures.load();
}

// Encode `n` RGBA8 frames from a contiguous stack `data` (n*height*width*4
// bytes) to per-frame PNG files, parallel over a std::thread pool -- the
// write-side sibling of lfi_decode_batch_rgba (reference result loop:
// src/interpolator.cu:299-316 writes frames one by one). Each frame is
// staged to "<path>.tmp" and renamed into place, so partially written
// frames never appear under a final name. Returns 0 on success; otherwise
// the number of failures, with the first failing frame's index in
// *err_index and its error in *err_code (codec error, or -5 = rename
// failed, -6 = path too long / out of memory).
int lfi_encode_batch_png(const char *const *paths, int n, int width,
                         int height, const unsigned char *data, int threads,
                         int *err_index, int *err_code) {
    if (err_index) *err_index = -1;
    if (err_code) *err_code = 0;
    if (n == 0) return 0;
    if (n < 0 || width <= 0 || height <= 0 || !data) {
        if (err_code) *err_code = -3;  // invalid arguments, no file written
        return 1;
    }
    std::atomic<int> next(0), failures(0);
    std::atomic<long long> first_fail(-1);
    const size_t frame = (size_t)width * height * 4;

    auto record = [&](int i, int code) {
        failures.fetch_add(1);
        const long long packed = ((long long)i << 32) | (unsigned int)code;
        long long cur = first_fail.load();
        while ((cur == -1 || i < (int)(cur >> 32)) &&
               !first_fail.compare_exchange_weak(cur, packed)) {
        }
    };

    auto worker = [&]() {
        std::vector<char> tmp;
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) return;
            const size_t len = std::strlen(paths[i]);
            tmp.resize(len + 5);
            std::memcpy(tmp.data(), paths[i], len);
            std::memcpy(tmp.data() + len, ".tmp", 5);
            const int rc = lfi_encode_png_rgba(
                tmp.data(), width, height, 4, data + (size_t)i * frame);
            if (rc != 0) { record(i, rc); continue; }
            if (std::rename(tmp.data(), paths[i]) != 0) {
                std::remove(tmp.data());
                record(i, -5);
            }
        }
    };

    int nt = threads < 1 ? 1 : threads;
    if (nt > n) nt = n;
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int t = 0; t < nt; t++) pool.emplace_back(worker);
    for (auto &th : pool) th.join();
    const long long ff = first_fail.load();
    if (err_index) *err_index = ff == -1 ? -1 : (int)(ff >> 32);
    if (err_code) *err_code = ff == -1 ? 0 : (int)(ff & 0xffffffff);
    return failures.load();
}

}  // extern "C"
