// pheniqs-tpu native host runtime: high-throughput FASTQ ingest.
//
// The TPU-native equivalent of the reference's htslib feed layer
// (reference fastq.h:30-456, feed.h:281-456): where the reference runs one
// pthread per feed filling ring buffers of Segment objects, this library
// parses (optionally gzip-compressed, via zlib) FASTQ streams directly
// into caller-provided SoA batch buffers — BAM 4-bit nucleotide codes,
// phred qualities, lengths, names, and the Illumina comment QC-fail flag —
// which the Python engine hands to the device as tensors.
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in the
// image). All functions are thread-compatible: one handle per stream, no
// shared state.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

#include <zlib.h>

namespace {

// ASCII -> BAM 4-bit nucleotide code ('=' 0, A 1, C 2, M 3, G 4, ... N 15),
// unknown bytes -> 15; mirrors pheniqs_tpu.iupac.ASCII_TO_BAM.
struct AsciiToBam {
    uint8_t table[256];
    AsciiToBam() {
        const char* alphabet = "=ACMGRSVTWYHKDBN";
        for (int i = 0; i < 256; ++i) table[i] = 15;
        for (int code = 0; code < 16; ++code) {
            unsigned char upper = static_cast<unsigned char>(alphabet[code]);
            table[upper] = static_cast<uint8_t>(code);
            table[std::tolower(upper)] = static_cast<uint8_t>(code);
        }
        table[static_cast<unsigned char>('=')] = 0;
        table[static_cast<unsigned char>('U')] = 8;
        table[static_cast<unsigned char>('u')] = 8;
    }
};
const AsciiToBam kAsciiToBam;

constexpr size_t kChunk = 1 << 20;

struct Reader {
    gzFile file = nullptr;
    std::string buffer;   // decompressed carry-over
    size_t position = 0;  // consume offset into buffer
    bool eof = false;
    std::string error;
    int phred_offset = 33;

    // Refill so that at least one full line is available; returns false on
    // EOF with an empty remainder.
    bool fill() {
        if (eof) return position < buffer.size();
        if (position > 0) {
            buffer.erase(0, position);
            position = 0;
        }
        size_t old = buffer.size();
        buffer.resize(old + kChunk);
        int got = gzread(file, &buffer[old], static_cast<unsigned>(kChunk));
        if (got < 0) {
            int errnum = 0;
            const char* message = gzerror(file, &errnum);
            error = message ? message : "gzread failed";
            buffer.resize(old);
            eof = true;
            return false;
        }
        buffer.resize(old + static_cast<size_t>(got));
        if (static_cast<size_t>(got) < kChunk) eof = true;
        return buffer.size() > position;
    }

    // Returns pointer+length of the next line (without terminator), or
    // false at EOF. The returned span stays valid until the next fill().
    bool line(const char** out, size_t* length) {
        while (true) {
            size_t nl = buffer.find('\n', position);
            if (nl != std::string::npos) {
                size_t start = position;
                size_t len = nl - start;
                if (len > 0 && buffer[start + len - 1] == '\r') --len;
                position = nl + 1;
                *out = buffer.data() + start;
                *length = len;
                return true;
            }
            if (eof) {
                if (position < buffer.size()) {
                    size_t start = position;
                    size_t len = buffer.size() - start;
                    if (len > 0 && buffer[start + len - 1] == '\r') --len;
                    position = buffer.size();
                    *out = buffer.data() + start;
                    *length = len;
                    return true;
                }
                return false;
            }
            if (!fill() && eof && position >= buffer.size()) return false;
        }
    }
};

}  // namespace

extern "C" {

void* pq_fastq_open(const char* path, int phred_offset) {
    Reader* reader = new Reader();
    reader->phred_offset = phred_offset;
    reader->file = gzopen(path, "rb");
    if (reader->file == nullptr) {
        delete reader;
        return nullptr;
    }
    gzbuffer(reader->file, 1 << 20);
    return reader;
}

const char* pq_fastq_error(void* handle) {
    if (handle == nullptr) return "invalid handle";
    return static_cast<Reader*>(handle)->error.c_str();
}

void pq_fastq_close(void* handle) {
    if (handle == nullptr) return;
    Reader* reader = static_cast<Reader*>(handle);
    if (reader->file != nullptr) gzclose(reader->file);
    delete reader;
}

// Parse up to `max_records` records.
//   code, qual        : (max_records, max_length) row-major uint8
//   length            : (max_records,) int32 — sequence lengths (clipped to
//                       max_length when longer; full length reported)
//   qcfail            : (max_records,) uint8 — Illumina comment filter flag
//   names             : byte arena receiving concatenated read names
//   name_offset       : (max_records + 1,) int64 prefix offsets into names
// Returns number parsed; 0 at EOF; -1 on malformed input (see
// pq_fastq_error); -2 when the names arena is exhausted.
int32_t pq_fastq_read_batch(
    void* handle,
    int32_t max_records,
    int32_t max_length,
    uint8_t* code,
    uint8_t* qual,
    int32_t* length,
    uint8_t* qcfail,
    char* names,
    int64_t names_capacity,
    int64_t* name_offset
) {
    Reader* reader = static_cast<Reader*>(handle);
    int32_t count = 0;
    int64_t names_used = 0;
    name_offset[0] = 0;
    const int offset = reader->phred_offset;

    while (count < max_records) {
        // reserve generous headroom so the name copy below cannot overflow
        if (names_capacity - names_used < 4096) {
            return count > 0 ? count : -2;
        }
        const char* header;
        size_t header_length;
        if (!reader->line(&header, &header_length)) break;  // EOF
        if (header_length == 0) continue;                   // skip blank lines
        if (header[0] != '@') {
            reader->error = "corrupt FASTQ header: ";
            reader->error.append(header, std::min<size_t>(header_length, 64));
            return -1;
        }
        size_t name_end = 1;
        while (name_end < header_length && header[name_end] != ' ') ++name_end;
        size_t name_length = std::min<size_t>(name_end - 1, 4000);
        // copy the name into the arena NOW — later line() calls may
        // invalidate the header span
        std::memcpy(names + names_used, header + 1, name_length);
        // Illumina comment: "<segment>:<filter Y/N>:<control>:<barcode>"
        uint8_t fail = 0;
        if (name_end < header_length) {
            const char* comment = header + name_end + 1;
            size_t comment_length = header_length - name_end - 1;
            size_t first_colon = 0;
            while (first_colon < comment_length && comment[first_colon] != ':')
                ++first_colon;
            if (first_colon + 1 < comment_length) {
                size_t second_colon = first_colon + 1;
                while (second_colon < comment_length && comment[second_colon] != ':')
                    ++second_colon;
                if (second_colon - first_colon == 2 &&
                    comment[first_colon + 1] == 'Y') {
                    fail = 1;
                }
            }
        }

        const char* sequence;
        size_t sequence_length;
        if (!reader->line(&sequence, &sequence_length)) {
            reader->error = "truncated FASTQ record (missing sequence)";
            return -1;
        }
        // encode the sequence into its row immediately, before the span can
        // be invalidated
        uint8_t* code_row = code + static_cast<int64_t>(count) * max_length;
        uint8_t* qual_row = qual + static_cast<int64_t>(count) * max_length;
        size_t keep = sequence_length;
        if (keep > static_cast<size_t>(max_length)) keep = max_length;
        for (size_t i = 0; i < keep; ++i) {
            code_row[i] = kAsciiToBam.table[
                static_cast<unsigned char>(sequence[i])];
        }
        std::memset(code_row + keep, 0, max_length - keep);

        const char* separator;
        size_t separator_length;
        if (!reader->line(&separator, &separator_length) ||
            separator_length == 0 || separator[0] != '+') {
            reader->error = "corrupt FASTQ separator";
            return -1;
        }

        const char* quality;
        size_t quality_length;
        if (!reader->line(&quality, &quality_length)) {
            reader->error = "truncated FASTQ record (missing quality)";
            return -1;
        }
        if (quality_length != sequence_length) {
            reader->error = "sequence/quality length mismatch for ";
            reader->error.append(names + names_used, name_length);
            return -1;
        }
        for (size_t i = 0; i < keep; ++i) {
            int q = static_cast<unsigned char>(quality[i]) - offset;
            qual_row[i] = static_cast<uint8_t>(q < 0 ? 0 : q);
        }
        std::memset(qual_row + keep, 0, max_length - keep);

        length[count] = static_cast<int32_t>(sequence_length);
        qcfail[count] = fail;
        names_used += static_cast<int64_t>(name_length);
        name_offset[count + 1] = names_used;
        ++count;
    }
    return count;
}

// BAM nibble -> IUPAC ASCII (mirrors pheniqs_tpu.iupac.BAM_TO_ASCII)
static const char kBamToAscii[17] = "=ACMGRSVTWYHKDBN";

// Format a batch of SAM alignment lines into `out`.
//   names / name_offset : NUL-free name arena with (n+1) prefix offsets
//   flag                : per-record SAM flags
//   code, qual          : (n, width) row-major BAM codes / phred values
//   length              : per-record sequence lengths
//   tags / tag_offset   : per-record pre-rendered aux suffix (may be empty)
//   line_offset         : (n+1) output prefix offsets
// Returns bytes written, or -(bytes required) when out_capacity is too
// small (caller grows and retries).
int64_t pq_sam_format_batch(
    int32_t n,
    const char* names,
    const int64_t* name_offset,
    const int32_t* flag,
    const uint8_t* code,
    const uint8_t* qual,
    const int32_t* length,
    int32_t width,
    int32_t phred_offset,
    const char* tags,
    const int64_t* tag_offset,
    char* out,
    int64_t out_capacity,
    int64_t* line_offset
) {
    // worst-case size estimate
    int64_t required = 0;
    for (int32_t r = 0; r < n; ++r) {
        int64_t name_length = name_offset[r + 1] - name_offset[r];
        int64_t tag_length = tag_offset[r + 1] - tag_offset[r];
        int64_t l = length[r] > 0 ? length[r] : 1;
        required += name_length + 32 + 2 * l + tag_length + 2;
    }
    if (required > out_capacity) return -required;

    char* cursor = out;
    line_offset[0] = 0;
    for (int32_t r = 0; r < n; ++r) {
        int64_t name_length = name_offset[r + 1] - name_offset[r];
        std::memcpy(cursor, names + name_offset[r], name_length);
        cursor += name_length;
        cursor += std::sprintf(cursor, "\t%d\t*\t0\t0\t*\t*\t0\t0\t", flag[r]);
        int32_t l = length[r];
        const uint8_t* code_row = code + static_cast<int64_t>(r) * width;
        const uint8_t* qual_row = qual + static_cast<int64_t>(r) * width;
        if (l <= 0) {
            *cursor++ = '*';
            *cursor++ = '\t';
            *cursor++ = '*';
        } else {
            for (int32_t i = 0; i < l; ++i) {
                cursor[i] = kBamToAscii[code_row[i] & 0xF];
            }
            cursor += l;
            *cursor++ = '\t';
            for (int32_t i = 0; i < l; ++i) {
                cursor[i] = static_cast<char>(qual_row[i] + phred_offset);
            }
            cursor += l;
        }
        int64_t tag_length = tag_offset[r + 1] - tag_offset[r];
        if (tag_length > 0) {
            *cursor++ = '\t';
            std::memcpy(cursor, tags + tag_offset[r], tag_length);
            cursor += tag_length;
        }
        *cursor++ = '\n';
        line_offset[r + 1] = cursor - out;
    }
    return cursor - out;
}

// Format a batch of SAM lines with tag columns rendered natively.
//
// Column kinds:
//   0 SPAN  — per-read byte span: buffers[k] + starts[k][r] + lens[k][r];
//             emitted as "\t<prefix><bytes>" when lens[k][r] > 0
//   1 FLOAT — floats[k][r] printed with %g (float32 semantics, like
//             htslib) when masks[k][r] != 0
//   2 CONST — buffers[k] (prefix_len bytes in prefixes[k]) emitted for
//             every read; used for per-segment FI/TC tags
int64_t pq_sam_format_full(
    int32_t n,
    const char* names,
    const int64_t* name_offset,
    const int32_t* flag,
    const uint8_t* code,
    const uint8_t* qual,
    const int32_t* length,
    int32_t width,
    int32_t phred_offset,
    int32_t n_columns,
    const uint8_t* kinds,
    const char* const* prefixes,
    const int32_t* prefix_lens,
    const char* const* buffers,
    const int64_t* const* starts,
    const int32_t* const* lens,
    const float* const* floats,
    const uint8_t* const* masks,
    char* out,
    int64_t out_capacity,
    int64_t* line_offset
) {
    // worst-case estimate
    int64_t required = 0;
    for (int32_t r = 0; r < n; ++r) {
        int64_t l = length[r] > 0 ? length[r] : 1;
        required += (name_offset[r + 1] - name_offset[r]) + 34 + 2 * l;
    }
    for (int32_t k = 0; k < n_columns; ++k) {
        if (kinds[k] == 0) {
            for (int32_t r = 0; r < n; ++r) {
                if (lens[k][r] > 0) {
                    required += 1 + prefix_lens[k] + lens[k][r];
                }
            }
        } else if (kinds[k] == 1) {
            required += static_cast<int64_t>(n) * (1 + prefix_lens[k] + 16);
        } else {
            required += static_cast<int64_t>(n) * (1 + prefix_lens[k]);
        }
    }
    if (required > out_capacity) return -required;

    char* cursor = out;
    line_offset[0] = 0;
    for (int32_t r = 0; r < n; ++r) {
        int64_t name_length = name_offset[r + 1] - name_offset[r];
        std::memcpy(cursor, names + name_offset[r], name_length);
        cursor += name_length;
        cursor += std::sprintf(cursor, "\t%d\t*\t0\t0\t*\t*\t0\t0\t", flag[r]);
        int32_t l = length[r];
        const uint8_t* code_row = code + static_cast<int64_t>(r) * width;
        const uint8_t* qual_row = qual + static_cast<int64_t>(r) * width;
        if (l <= 0) {
            *cursor++ = '*';
            *cursor++ = '\t';
            *cursor++ = '*';
        } else {
            for (int32_t i = 0; i < l; ++i) {
                cursor[i] = kBamToAscii[code_row[i] & 0xF];
            }
            cursor += l;
            *cursor++ = '\t';
            for (int32_t i = 0; i < l; ++i) {
                cursor[i] = static_cast<char>(qual_row[i] + phred_offset);
            }
            cursor += l;
        }
        for (int32_t k = 0; k < n_columns; ++k) {
            switch (kinds[k]) {
                case 0: {
                    int32_t span = lens[k][r];
                    if (span > 0) {
                        *cursor++ = '\t';
                        std::memcpy(cursor, prefixes[k], prefix_lens[k]);
                        cursor += prefix_lens[k];
                        std::memcpy(cursor, buffers[k] + starts[k][r], span);
                        cursor += span;
                    }
                    break;
                }
                case 1: {
                    if (masks[k][r]) {
                        *cursor++ = '\t';
                        std::memcpy(cursor, prefixes[k], prefix_lens[k]);
                        cursor += prefix_lens[k];
                        cursor += std::sprintf(
                            cursor, "%g", static_cast<double>(floats[k][r]));
                    }
                    break;
                }
                default: {
                    *cursor++ = '\t';
                    std::memcpy(cursor, prefixes[k], prefix_lens[k]);
                    cursor += prefix_lens[k];
                    break;
                }
            }
        }
        *cursor++ = '\n';
        line_offset[r + 1] = cursor - out;
    }
    return cursor - out;
}

// Concatenate spans from up to 255 arenas into `out` in piece order.
// Returns bytes written, or -(bytes required) when capacity is too small.
int64_t pq_concat_spans(
    int64_t n_pieces,
    const char* const* arenas,
    const uint8_t* piece_arena,
    const int64_t* piece_start,
    const int32_t* piece_len,
    char* out,
    int64_t out_capacity
) {
    int64_t required = 0;
    for (int64_t i = 0; i < n_pieces; ++i) required += piece_len[i];
    if (required > out_capacity) return -required;
    char* cursor = out;
    for (int64_t i = 0; i < n_pieces; ++i) {
        std::memcpy(cursor, arenas[piece_arena[i]] + piece_start[i], piece_len[i]);
        cursor += piece_len[i];
    }
    return cursor - out;
}

// Format a batch of FASTQ records: '@name[ <seg>:<Y|N>:0:<BC>]\nSEQ\n+\nQUAL\n'.
// bc_* may be null (empty barcode spans). Returns bytes written or
// -(required).
int64_t pq_fastq_format_batch(
    int32_t n,
    const char* names,
    const int64_t* name_offset,
    const uint8_t* qcfail,
    int32_t segment_number,   // 1-based; 0 = omit the comment entirely
    const uint8_t* code,
    const uint8_t* qual,
    const int32_t* length,
    int32_t width,
    int32_t phred_offset,
    const char* bc_buffer,
    const int64_t* bc_start,
    const int32_t* bc_len,
    char* out,
    int64_t out_capacity,
    int64_t* rec_offset
) {
    int64_t required = 0;
    for (int32_t r = 0; r < n; ++r) {
        required += (name_offset[r + 1] - name_offset[r]) + 24 + 2 * length[r];
        if (bc_len != nullptr) required += bc_len[r];
    }
    if (required > out_capacity) return -required;
    char* cursor = out;
    rec_offset[0] = 0;
    for (int32_t r = 0; r < n; ++r) {
        *cursor++ = '@';
        int64_t name_length = name_offset[r + 1] - name_offset[r];
        std::memcpy(cursor, names + name_offset[r], name_length);
        cursor += name_length;
        if (segment_number > 0) {
            cursor += std::sprintf(cursor, " %d:%c:0:", segment_number,
                                   qcfail[r] ? 'Y' : 'N');
            if (bc_len != nullptr && bc_len[r] > 0) {
                std::memcpy(cursor, bc_buffer + bc_start[r], bc_len[r]);
                cursor += bc_len[r];
            }
        }
        *cursor++ = '\n';
        int32_t l = length[r];
        const uint8_t* code_row = code + static_cast<int64_t>(r) * width;
        const uint8_t* qual_row = qual + static_cast<int64_t>(r) * width;
        for (int32_t i = 0; i < l; ++i) {
            cursor[i] = kBamToAscii[code_row[i] & 0xF];
        }
        cursor += l;
        *cursor++ = '\n';
        *cursor++ = '+';
        *cursor++ = '\n';
        for (int32_t i = 0; i < l; ++i) {
            cursor[i] = static_cast<char>(qual_row[i] + phred_offset);
        }
        cursor += l;
        *cursor++ = '\n';
        rec_offset[r + 1] = cursor - out;
    }
    return cursor - out;
}

}  // extern "C"
