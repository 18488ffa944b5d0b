// FLAC decoder (from scratch, per the public format spec — RFC 9639).
//
// Closes the reference's dependency on the ffmpeg binary for compressed
// corpora (reference decodes everything by subprocess:
// yoho/src/preprocessing/audio.py:11-18; its corpora are compressed:
// train/utils/dataloaders.py:53, experiments/decoding_benchmark.py:50-70).
// FLAC is the framework's native lossless cache format: ~50-60% of WAV
// size with exact int PCM round-trip (encoder: yoho_tpu/audio/flac.py,
// which doubles as the readable spec + pure-Python fallback decoder).
//
// Supports: 1-8 channels, 4-32 bps, all blocksize/sample-rate codes,
// constant/verbatim/fixed(0-4)/LPC subframes, both Rice methods incl.
// escapes, wasted bits, left/right/mid-side decorrelation, CRC-8/16
// verification.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t size;     // bytes
    size_t pos;      // bit position
    bool error = false;

    BitReader(const uint8_t* d, size_t n) : data(d), size(n), pos(0) {}

    size_t byte_pos() const { return pos >> 3; }
    bool aligned() const { return (pos & 7) == 0; }
    void align() { pos = (pos + 7) & ~size_t(7); }

    uint32_t bits(int n) {  // n in [0, 32], MSB first
        uint32_t v = 0;
        for (int i = 0; i < n; i++) {
            size_t byte = pos >> 3;
            if (byte >= size) { error = true; return 0; }
            v = (v << 1) | ((data[byte] >> (7 - (pos & 7))) & 1);
            pos++;
        }
        return v;
    }

    uint64_t bits64(int n) {
        uint64_t v = 0;
        if (n > 32) { v = bits(n - 32); n = 32; }
        return (v << n) | bits(n);
    }

    int32_t sbits(int n) {  // signed, two's complement
        uint32_t v = bits(n);
        if (n == 0 || n == 32) return (int32_t)v;
        if (v & (1u << (n - 1))) v |= ~((1u << n) - 1);
        return (int32_t)v;
    }

    uint32_t unary() {  // count 0-bits until a 1-bit
        uint32_t q = 0;
        for (;;) {
            size_t byte = pos >> 3;
            if (byte >= size) { error = true; return 0; }
            if ((data[byte] >> (7 - (pos & 7))) & 1) { pos++; return q; }
            pos++; q++;
        }
    }
};

uint8_t crc8(const uint8_t* d, size_t n) {  // poly 0x07, init 0
    uint8_t crc = 0;
    for (size_t i = 0; i < n; i++) {
        crc ^= d[i];
        for (int b = 0; b < 8; b++)
            crc = (crc & 0x80) ? (uint8_t)((crc << 1) ^ 0x07) : (uint8_t)(crc << 1);
    }
    return crc;
}

uint16_t crc16(const uint8_t* d, size_t n) {  // poly 0x8005, init 0
    uint16_t crc = 0;
    for (size_t i = 0; i < n; i++) {
        crc ^= (uint16_t)d[i] << 8;
        for (int b = 0; b < 8; b++)
            crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x8005) : (uint16_t)(crc << 1);
    }
    return crc;
}

// UTF-8-style coded number (frame/sample index), up to 36 bits / 7 bytes.
bool read_coded_number(BitReader& br, uint64_t* out) {
    uint32_t b0 = br.bits(8);
    if (br.error) return false;
    int extra;
    uint64_t v;
    if ((b0 & 0x80) == 0x00) { *out = b0; return true; }
    else if ((b0 & 0xE0) == 0xC0) { extra = 1; v = b0 & 0x1F; }
    else if ((b0 & 0xF0) == 0xE0) { extra = 2; v = b0 & 0x0F; }
    else if ((b0 & 0xF8) == 0xF0) { extra = 3; v = b0 & 0x07; }
    else if ((b0 & 0xFC) == 0xF8) { extra = 4; v = b0 & 0x03; }
    else if ((b0 & 0xFE) == 0xFC) { extra = 5; v = b0 & 0x01; }
    else if (b0 == 0xFE) { extra = 6; v = 0; }
    else return false;
    for (int i = 0; i < extra; i++) {
        uint32_t b = br.bits(8);
        if (br.error || (b & 0xC0) != 0x80) return false;
        v = (v << 6) | (b & 0x3F);
    }
    *out = v;
    return true;
}

const int FIXED_ORDER_COEFS[5][4] = {
    {},                 // order 0
    {1},                // order 1
    {2, -1},            // order 2
    {3, -3, 1},         // order 3
    {4, -6, 4, -1},     // order 4
};

// Decode one residual section into out[pred_order..blocksize).
bool decode_residual(BitReader& br, int blocksize, int pred_order,
                     int64_t* out) {
    uint32_t method = br.bits(2);
    if (method > 1) return false;
    int plen = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 15 : 31;
    uint32_t porder = br.bits(4);
    uint32_t nparts = 1u << porder;
    if (blocksize % nparts) return false;
    int idx = pred_order;
    for (uint32_t p = 0; p < nparts; p++) {
        int count = blocksize >> porder;
        if (p == 0) count -= pred_order;
        if (count < 0) return false;
        uint32_t param = br.bits(plen);
        if (param == escape) {
            uint32_t raw = br.bits(5);
            for (int i = 0; i < count; i++) {
                out[idx++] = raw == 0 ? 0 : br.sbits(raw);
            }
        } else {
            for (int i = 0; i < count; i++) {
                uint32_t q = br.unary();
                uint32_t u = (q << param) | br.bits(param);
                out[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
            }
        }
        if (br.error) return false;
    }
    return true;
}

// Decode one subframe into buf[0..blocksize). bps already includes the
// channel-assignment +1 for side channels.
bool decode_subframe(BitReader& br, int blocksize, int bps, int64_t* buf) {
    if (br.bits(1) != 0) return false;  // mandatory zero pad bit
    uint32_t type = br.bits(6);
    int wasted = 0;
    if (br.bits(1)) wasted = (int)br.unary() + 1;
    if (br.error) return false;
    int ebps = bps - wasted;
    if (ebps <= 0 || ebps > 32) return false;

    if (type == 0) {  // CONSTANT
        int64_t v = br.sbits(ebps);
        for (int i = 0; i < blocksize; i++) buf[i] = v;
    } else if (type == 1) {  // VERBATIM
        for (int i = 0; i < blocksize; i++) buf[i] = br.sbits(ebps);
    } else if ((type & 0x38) == 0x08 && (type & 7) <= 4) {  // FIXED
        int order = type & 7;
        for (int i = 0; i < order; i++) buf[i] = br.sbits(ebps);
        if (!decode_residual(br, blocksize, order, buf)) return false;
        for (int i = order; i < blocksize; i++) {
            int64_t pred = 0;
            for (int j = 0; j < order; j++)
                pred += (int64_t)FIXED_ORDER_COEFS[order][j] * buf[i - 1 - j];
            buf[i] += pred;
        }
    } else if (type & 0x20) {  // LPC
        int order = (int)(type & 0x1F) + 1;
        for (int i = 0; i < order; i++) buf[i] = br.sbits(ebps);
        uint32_t prec = br.bits(4);
        if (prec == 15) return false;  // invalid
        prec += 1;
        int shift = br.sbits(5);
        if (shift < 0) return false;
        int32_t coef[32];
        for (int i = 0; i < order; i++) coef[i] = br.sbits(prec);
        if (!decode_residual(br, blocksize, order, buf)) return false;
        for (int i = order; i < blocksize; i++) {
            int64_t pred = 0;
            for (int j = 0; j < order; j++)
                pred += (int64_t)coef[j] * buf[i - 1 - j];
            buf[i] += pred >> shift;
        }
    } else {
        return false;  // reserved type
    }
    if (br.error) return false;
    if (wasted)
        for (int i = 0; i < blocksize; i++) buf[i] <<= wasted;
    return true;
}

const int BLOCKSIZES[16] = {-1, 192, 576, 1152, 2304, 4608, -6, -7,
                            256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
const int SAMPLE_RATES[12] = {0, 88200, 176400, 192000, 8000, 16000, 22050,
                              24000, 32000, 44100, 48000, 96000};
const int SAMPLE_SIZES[8] = {0, 8, 12, -1, 16, 20, 24, 32};

}  // namespace

extern "C" {

void yoho_free(void* p);  // defined in wav.cpp

// Decode a FLAC stream held in memory.
//   out:  malloc'd interleaved int32 samples (n_samples * channels)
//   returns n_samples (per channel), or -1 on any parse/CRC error.
int64_t yoho_flac_decode(const uint8_t* data, int64_t size,
                         int32_t** out, int32_t* out_sr,
                         int32_t* out_channels, int32_t* out_bps) {
    if (size < 8 || memcmp(data, "fLaC", 4) != 0) return -1;
    BitReader br(data, (size_t)size);
    br.pos = 32;

    // --- metadata blocks; need STREAMINFO (type 0, first, mandatory)
    int stream_sr = 0, stream_ch = 0, stream_bps = 0;
    bool have_streaminfo = false;
    for (;;) {
        uint32_t last = br.bits(1);
        uint32_t type = br.bits(7);
        uint32_t len = br.bits(24);
        if (br.error) return -1;
        if (type == 0) {
            if (len < 34) return -1;
            br.bits(16); br.bits(16);      // min/max blocksize
            br.bits(24); br.bits(24);      // min/max framesize
            stream_sr = (int)br.bits(20);
            stream_ch = (int)br.bits(3) + 1;
            stream_bps = (int)br.bits(5) + 1;
            br.bits64(36);                 // total samples (trust frames)
            for (int i = 0; i < 16; i++) br.bits(8);  // MD5
            for (uint32_t i = 34; i < len; i++) br.bits(8);
            have_streaminfo = true;
        } else {
            for (uint32_t i = 0; i < len; i++) br.bits(8);
        }
        if (br.error) return -1;
        if (last) break;
    }
    if (!have_streaminfo || stream_sr == 0) return -1;
    if (stream_ch < 1 || stream_ch > 8) return -1;

    std::vector<int32_t> pcm;
    std::vector<int64_t> ch_buf[8];

    // --- frames
    for (;;) {
        br.align();
        if (br.byte_pos() >= br.size) break;  // clean EOF
        size_t frame_start = br.byte_pos();
        uint32_t sync = br.bits(14);
        if (br.error) break;  // trailing garbage < 2 bytes
        if (sync != 0x3FFE) return -1;
        br.bits(1);                        // reserved
        br.bits(1);                        // blocking strategy
        uint32_t bs_code = br.bits(4);
        uint32_t sr_code = br.bits(4);
        uint32_t ch_code = br.bits(4);
        uint32_t ss_code = br.bits(3);
        if (br.bits(1) != 0) return -1;    // reserved
        uint64_t coded_no;
        if (!read_coded_number(br, &coded_no)) return -1;

        int blocksize;
        if (bs_code == 0) return -1;
        else if (bs_code == 6) blocksize = (int)br.bits(8) + 1;
        else if (bs_code == 7) blocksize = (int)br.bits(16) + 1;
        else blocksize = BLOCKSIZES[bs_code];

        int sr = stream_sr;
        if (sr_code == 12) sr = (int)br.bits(8) * 1000;
        else if (sr_code == 13) sr = (int)br.bits(16);
        else if (sr_code == 14) sr = (int)br.bits(16) * 10;
        else if (sr_code == 15) return -1;
        else if (sr_code != 0) sr = SAMPLE_RATES[sr_code];

        int bps = stream_bps;
        if (ss_code != 0) {
            if (SAMPLE_SIZES[ss_code] < 0) return -1;
            bps = SAMPLE_SIZES[ss_code];
        }

        // header CRC-8 (sync byte .. last header byte)
        size_t crc8_pos = br.byte_pos();
        uint32_t want8 = br.bits(8);
        if (br.error) return -1;
        if (crc8(data + frame_start, crc8_pos - frame_start) != want8) return -1;

        int nch = ch_code < 8 ? (int)ch_code + 1 : 2;
        if (ch_code > 10) return -1;
        if (nch != stream_ch) return -1;   // spec allows per-frame, we don't
        if (blocksize <= 0 || blocksize > 65536) return -1;

        for (int c = 0; c < nch; c++) {
            int sub_bps = bps;
            // side channel carries one extra bit:
            // 8=left/side: ch1; 9=right(side first)=ch0; 10=mid/side: ch1
            if ((ch_code == 8 && c == 1) || (ch_code == 9 && c == 0) ||
                (ch_code == 10 && c == 1))
                sub_bps += 1;
            ch_buf[c].assign((size_t)blocksize, 0);
            if (!decode_subframe(br, blocksize, sub_bps, ch_buf[c].data()))
                return -1;
        }

        br.align();
        size_t crc16_pos = br.byte_pos();
        uint32_t want16 = br.bits(16);
        if (br.error) return -1;
        if (crc16(data + frame_start, crc16_pos - frame_start) != (uint16_t)want16)
            return -1;

        // undo inter-channel decorrelation
        if (ch_code == 8) {          // left/side -> right = left - side
            for (int i = 0; i < blocksize; i++)
                ch_buf[1][i] = ch_buf[0][i] - ch_buf[1][i];
        } else if (ch_code == 9) {   // side/right -> left = right + side
            for (int i = 0; i < blocksize; i++)
                ch_buf[0][i] = ch_buf[1][i] + ch_buf[0][i];
        } else if (ch_code == 10) {  // mid/side
            for (int i = 0; i < blocksize; i++) {
                int64_t mid = ch_buf[0][i], side = ch_buf[1][i];
                mid = (mid << 1) | (side & 1);
                ch_buf[0][i] = (mid + side) >> 1;
                ch_buf[1][i] = (mid - side) >> 1;
            }
        }

        size_t base = pcm.size();
        pcm.resize(base + (size_t)blocksize * nch);
        for (int i = 0; i < blocksize; i++)
            for (int c = 0; c < nch; c++)
                pcm[base + (size_t)i * nch + c] = (int32_t)ch_buf[c][i];
        (void)sr; (void)coded_no;
    }

    int64_t n_samples = (int64_t)(pcm.size() / stream_ch);
    int32_t* buf = (int32_t*)malloc(pcm.size() * sizeof(int32_t) + 1);
    if (!buf) return -1;
    memcpy(buf, pcm.data(), pcm.size() * sizeof(int32_t));
    *out = buf;
    *out_sr = stream_sr;
    *out_channels = stream_ch;
    *out_bps = stream_bps;
    return n_samples;
}

}  // extern "C"
