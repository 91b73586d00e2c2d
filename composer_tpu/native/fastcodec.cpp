// Native accelerators for the host-side data path.
//
// The TPU compute path is JAX/XLA/Pallas; this shared library accelerates the
// host runtime around it (the reference's host hot loops were pure Python:
// per-event struct.unpack in sequence.py:1686-1692 and a byte-at-a-time CRC
// would otherwise bottleneck TFRecord export):
//
//   * crc32c  — slice-by-8 Castagnoli CRC for TFRecord framing
//   * decode_event_ids — bulk (type, value) int16 pairs -> int32 vocab ids
//   * encode_event_pairs — bulk int32 vocab ids -> (type, value) int16 pairs
//
// Built with: g++ -O3 -march=native -shared -fPIC fastcodec.cpp -o libfastcodec.so
// Bound via ctypes (composer_tpu/native/loader.py).

#include <cstdint>
#include <cstddef>

namespace {

constexpr uint32_t kCrc32cPoly = 0x82F63B78u;

struct Crc32cTables {
    uint32_t table[8][256];
    Crc32cTables() {
        for (uint32_t i = 0; i < 256; ++i) {
            uint32_t crc = i;
            for (int bit = 0; bit < 8; ++bit) {
                crc = (crc >> 1) ^ ((crc & 1) ? kCrc32cPoly : 0);
            }
            table[0][i] = crc;
        }
        for (uint32_t i = 0; i < 256; ++i) {
            uint32_t crc = table[0][i];
            for (int slice = 1; slice < 8; ++slice) {
                crc = table[0][crc & 0xFF] ^ (crc >> 8);
                table[slice][i] = crc;
            }
        }
    }
};

const Crc32cTables kTables;

}  // namespace

extern "C" {

// CRC32-C of `size` bytes. Slice-by-8: processes 8 bytes per iteration.
uint32_t composer_crc32c(const uint8_t* data, size_t size) {
    uint32_t crc = 0xFFFFFFFFu;
    const uint8_t* p = data;

    while (size >= 8) {
        uint32_t low;
        uint32_t high;
        __builtin_memcpy(&low, p, 4);
        __builtin_memcpy(&high, p + 4, 4);
        low ^= crc;
        crc = kTables.table[7][low & 0xFF] ^
              kTables.table[6][(low >> 8) & 0xFF] ^
              kTables.table[5][(low >> 16) & 0xFF] ^
              kTables.table[4][low >> 24] ^
              kTables.table[3][high & 0xFF] ^
              kTables.table[2][(high >> 8) & 0xFF] ^
              kTables.table[1][(high >> 16) & 0xFF] ^
              kTables.table[0][high >> 24];
        p += 8;
        size -= 8;
    }
    while (size--) {
        crc = kTables.table[0][(crc ^ *p++) & 0xFF] ^ (crc >> 8);
    }
    return crc ^ 0xFFFFFFFFu;
}

// Event-id vocabulary layout (must match composer_tpu/midi/vocab.py):
//   NOTE_ON(1)->value, NOTE_OFF(2)->128+value, VELOCITY(4)->256+value,
//   TIME_SHIFT(3)->256+B+value-1, SUSTAIN_ON(5)/OFF(6)->256+B+M (+1).
// Returns 0 on success, 1 if an unknown event type was encountered.
int composer_decode_event_ids(
    const int16_t* pairs,   // interleaved (type, value), length 2*count
    size_t count,
    int32_t velocity_bins,
    int32_t max_time_steps,
    int32_t* out_ids) {
    const int32_t velocity_offset = 256;
    const int32_t time_shift_offset = 256 + velocity_bins;
    const int32_t sustain_on_id = time_shift_offset + max_time_steps;
    int status = 0;
    for (size_t i = 0; i < count; ++i) {
        const int16_t type = pairs[2 * i];
        const int16_t value = pairs[2 * i + 1];
        int32_t id;
        switch (type) {
            case 1: id = value; break;                            // NOTE_ON
            case 2: id = 128 + value; break;                      // NOTE_OFF
            case 3: id = time_shift_offset + value - 1; break;    // TIME_SHIFT
            case 4: id = velocity_offset + value; break;          // VELOCITY
            case 5: id = sustain_on_id; break;                    // SUSTAIN_ON
            case 6: id = sustain_on_id + 1; break;                // SUSTAIN_OFF
            default: id = 0; status = 1; break;
        }
        out_ids[i] = id;
    }
    return status;
}

// Inverse of composer_decode_event_ids. value -1 encodes None.
int composer_encode_event_pairs(
    const int32_t* ids,
    size_t count,
    int32_t velocity_bins,
    int32_t max_time_steps,
    int16_t* out_pairs) {
    const int32_t velocity_offset = 256;
    const int32_t time_shift_offset = 256 + velocity_bins;
    const int32_t sustain_on_id = time_shift_offset + max_time_steps;
    int status = 0;
    for (size_t i = 0; i < count; ++i) {
        const int32_t id = ids[i];
        int16_t type;
        int16_t value;
        if (id < 0) { type = 0; value = 0; status = 1; }
        else if (id < 128) { type = 1; value = static_cast<int16_t>(id); }
        else if (id < 256) { type = 2; value = static_cast<int16_t>(id - 128); }
        else if (id < time_shift_offset) { type = 4; value = static_cast<int16_t>(id - velocity_offset); }
        else if (id < sustain_on_id) { type = 3; value = static_cast<int16_t>(id - time_shift_offset + 1); }
        else if (id == sustain_on_id) { type = 5; value = -1; }
        else if (id == sustain_on_id + 1) { type = 6; value = -1; }
        else { type = 0; value = 0; status = 1; }
        out_pairs[2 * i] = type;
        out_pairs[2 * i + 1] = value;
    }
    return status;
}

}  // extern "C"
