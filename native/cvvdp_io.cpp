// cvvdp_io: native IO helpers for colorvideovdp_tpu.
//
// Implements the hot loops of the OpenEXR scanline codec (the byte-split +
// delta predictor transform around zlib, per ImfZip.cpp semantics) and a
// frame-block packer used by the host-side video sources. Exposed via a
// plain C ABI consumed through ctypes (no pybind11 in this environment).
//
// Build:  make -C native         (produces libcvvdp_io.so)

#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

extern "C" {

// Forward transform: split bytes into two alternating halves, then delta-
// predict over the whole buffer, then deflate. Returns compressed size, or
// -1 on error, or 0 if the compressed form would not be smaller (caller
// should store raw).
long exr_zip_compress(const uint8_t* src, long n, uint8_t* dst,
                      long dst_cap) {
    std::vector<uint8_t> buf(n);
    const long half = (n + 1) / 2;
    // reorder: even-indexed bytes -> first half, odd -> second half
    {
        uint8_t* t1 = buf.data();
        uint8_t* t2 = buf.data() + half;
        const uint8_t* s = src;
        const uint8_t* end = src + n;
        while (true) {
            if (s < end) *t1++ = *s++; else break;
            if (s < end) *t2++ = *s++; else break;
        }
    }
    // delta predictor (in place, keeps buf[0])
    {
        uint8_t prev = buf[0];
        for (long i = 1; i < n; ++i) {
            const uint8_t cur = buf[i];
            buf[i] = static_cast<uint8_t>(static_cast<int>(cur) -
                                          static_cast<int>(prev) + 128 + 256);
            prev = cur;
        }
    }
    uLongf out_len = static_cast<uLongf>(dst_cap);
    if (compress2(dst, &out_len, buf.data(), static_cast<uLong>(n),
                  Z_DEFAULT_COMPRESSION) != Z_OK) {
        return -1;
    }
    if (static_cast<long>(out_len) >= n) return 0;
    return static_cast<long>(out_len);
}

// Inverse transform: inflate, undo the delta predictor, undo the byte
// split. Returns 0 on success.
int exr_zip_decompress(const uint8_t* src, long n_src, uint8_t* dst,
                       long n_raw) {
    std::vector<uint8_t> buf(n_raw);
    uLongf out_len = static_cast<uLongf>(n_raw);
    if (uncompress(buf.data(), &out_len, src, static_cast<uLong>(n_src))
            != Z_OK || static_cast<long>(out_len) != n_raw) {
        return -1;
    }
    // undo predictor
    {
        uint8_t prev = buf[0];
        for (long i = 1; i < n_raw; ++i) {
            prev = static_cast<uint8_t>(static_cast<int>(buf[i]) +
                                        static_cast<int>(prev) - 128);
            buf[i] = prev;
        }
    }
    // undo split
    {
        const long half = (n_raw + 1) / 2;
        const uint8_t* t1 = buf.data();
        const uint8_t* t2 = buf.data() + half;
        uint8_t* d = dst;
        uint8_t* end = dst + n_raw;
        while (true) {
            if (d < end) *d++ = *t1++; else break;
            if (d < end) *d++ = *t2++; else break;
        }
    }
    return 0;
}

// Gather a block of frames into one contiguous buffer, repeating the last
// available frame to pad short tails (the video sources' raw-block
// protocol). Runs without the GIL (ctypes releases it for the call).
void pack_frame_block(const uint8_t* src, long frame_bytes, long n_frames,
                      long start, long count, uint8_t* dst) {
    for (long i = 0; i < count; ++i) {
        long idx = start + i;
        if (idx >= n_frames) idx = n_frames - 1;
        std::memcpy(dst + i * frame_bytes, src + idx * frame_bytes,
                    static_cast<size_t>(frame_bytes));
    }
}

}  // extern "C"
