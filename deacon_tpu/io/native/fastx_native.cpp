// Native FASTX loader/writer for deacon-tpu.
//
// Plays the role of the reference's needletail/paraseq/niffler stack
// (ref: src/local_filter.rs:41-55, src/index.rs:14) as a C library consumed
// via ctypes: streaming FASTA/FASTQ parsing with gzip/zstd/xz/bzip2-less
// auto-detection, batch record extraction into caller-provided arenas, 2-bit
// packing, and compressed output encoding. Built with `make` (see Makefile);
// deacon_tpu/io/fastx.py is the pure-Python fallback and correctness oracle.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <lzma.h>
#include <zlib.h>
#include <zstd.h>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

constexpr size_t kBufSize = 1 << 20;

enum class Codec : int { kPlain = 0, kGzip = 1, kZstd = 2, kXz = 3 };

// Streaming decompressing source over a FILE*. All codecs use the same
// raw-input buffer machinery so sniffed magic bytes can be replayed.
struct Source {
  FILE* raw = nullptr;
  Codec codec = Codec::kPlain;
  bool raw_eof = false;
  std::vector<uint8_t> in_buf;
  size_t in_pos = 0, in_len = 0;

  z_stream zs{};
  bool zs_init = false;
  ZSTD_DStream* zds = nullptr;
  lzma_stream lz = LZMA_STREAM_INIT;
  bool lz_init = false;

  ~Source() {
    if (zs_init) inflateEnd(&zs);
    if (zds) ZSTD_freeDStream(zds);
    if (lz_init) lzma_end(&lz);
    if (raw && raw != stdin) fclose(raw);
  }

  void init(FILE* f, Codec c, const uint8_t* magic, size_t magic_len) {
    raw = f;
    codec = c;
    in_buf.resize(kBufSize);
    if (magic_len) memcpy(in_buf.data(), magic, magic_len);
    in_len = magic_len;
    in_pos = 0;
    switch (codec) {
      case Codec::kPlain:
        break;
      case Codec::kGzip:
        inflateInit2(&zs, 16 + MAX_WBITS);
        zs_init = true;
        break;
      case Codec::kZstd:
        zds = ZSTD_createDStream();
        ZSTD_initDStream(zds);
        break;
      case Codec::kXz:
        lzma_stream_decoder(&lz, UINT64_MAX, LZMA_CONCATENATED);
        lz_init = true;
        break;
    }
  }

  bool fill_raw() {
    if (raw_eof) return false;
    in_len = fread(in_buf.data(), 1, in_buf.size(), raw);
    in_pos = 0;
    if (in_len < in_buf.size() && (feof(raw) || ferror(raw))) raw_eof = true;
    return in_len > 0;
  }

  // Returns decompressed bytes read into dst (0 = EOF, -1 = error).
  int64_t read(uint8_t* dst, size_t n) {
    switch (codec) {
      case Codec::kPlain: {
        size_t out = 0;
        // replay sniffed magic first
        if (in_pos < in_len) {
          size_t take = in_len - in_pos;
          if (take > n) take = n;
          memcpy(dst, in_buf.data() + in_pos, take);
          in_pos += take;
          out = take;
        }
        if (out < n) {
          size_t got = fread(dst + out, 1, n - out, raw);
          if (got == 0 && ferror(raw)) return -1;
          out += got;
        }
        return (int64_t)out;
      }
      case Codec::kGzip: {
        zs.next_out = dst;
        zs.avail_out = (uInt)n;
        while (zs.avail_out > 0) {
          if (zs.avail_in == 0) {
            if (in_pos >= in_len && !fill_raw()) break;
            zs.next_in = in_buf.data() + in_pos;
            zs.avail_in = (uInt)(in_len - in_pos);
            in_pos = in_len;
          }
          int r = inflate(&zs, Z_NO_FLUSH);
          if (r == Z_STREAM_END) {
            // support concatenated gzip members
            if (zs.avail_in == 0 && in_pos >= in_len && raw_eof) break;
            inflateReset(&zs);
            continue;
          }
          if (r != Z_OK && r != Z_BUF_ERROR) return -1;
          if (r == Z_BUF_ERROR && zs.avail_in == 0 && in_pos >= in_len &&
              raw_eof)
            break;
        }
        return (int64_t)(n - zs.avail_out);
      }
      case Codec::kZstd: {
        size_t out_total = 0;
        while (out_total < n) {
          if (in_pos >= in_len) {
            if (!fill_raw()) break;
          }
          ZSTD_inBuffer ib{in_buf.data(), in_len, in_pos};
          ZSTD_outBuffer ob{dst, n, out_total};
          size_t rc = ZSTD_decompressStream(zds, &ob, &ib);
          if (ZSTD_isError(rc)) return -1;
          in_pos = ib.pos;
          size_t produced = ob.pos - out_total;
          out_total = ob.pos;
          if (produced == 0 && in_pos >= in_len && raw_eof) break;
        }
        return (int64_t)out_total;
      }
      case Codec::kXz: {
        lz.next_out = dst;
        lz.avail_out = n;
        while (lz.avail_out > 0) {
          lzma_action action = LZMA_RUN;
          if (lz.avail_in == 0) {
            if (in_pos >= in_len && !fill_raw()) {
              action = LZMA_FINISH;
            } else {
              lz.next_in = in_buf.data() + in_pos;
              lz.avail_in = in_len - in_pos;
              in_pos = in_len;
            }
          }
          lzma_ret r = lzma_code(&lz, action);
          if (r == LZMA_STREAM_END) break;
          if (r != LZMA_OK) {
            if (lz.avail_out < n) break;  // return what we have
            return -1;
          }
          if (action == LZMA_FINISH && lz.avail_out > 0) break;
        }
        return (int64_t)(n - lz.avail_out);
      }
    }
    return -1;
  }
};

struct Record {
  std::vector<uint8_t> id, seq, qual;
  bool valid = false;
};

struct DxReader {
  Source src;
  std::vector<uint8_t> buf;
  size_t pos = 0, len = 0;
  bool eof = false;
  int is_fastq = -1;
  std::string error;
  std::vector<uint8_t> line;
  std::vector<uint8_t> pending;  // pushed-back header line
  bool has_pending = false;
  Record overflow;  // record parsed but not yet delivered (arena full)

  bool refill() {
    if (eof) return false;
    int64_t got = src.read(buf.data(), buf.size());
    if (got < 0) {
      error = "decompression/read error";
      eof = true;
      return false;
    }
    if (got == 0) {
      eof = true;
      return false;
    }
    pos = 0;
    len = (size_t)got;
    return true;
  }

  bool getline() {
    line.clear();
    if (has_pending) {
      line.swap(pending);
      has_pending = false;
      return true;
    }
    bool any = false;
    while (true) {
      if (pos >= len && !refill()) return any || !line.empty();
      any = true;
      uint8_t* start = buf.data() + pos;
      uint8_t* nl = (uint8_t*)memchr(start, '\n', len - pos);
      if (nl) {
        line.insert(line.end(), start, nl);
        pos = (size_t)(nl - buf.data()) + 1;
        if (!line.empty() && line.back() == '\r') line.pop_back();
        return true;
      }
      line.insert(line.end(), start, buf.data() + len);
      pos = len;
    }
  }

  // Parse one record into rec; returns 1 ok, 0 eof, -1 error.
  int parse_record(Record& rec) {
    rec.id.clear();
    rec.seq.clear();
    rec.qual.clear();
    rec.valid = false;
    // find non-empty header line
    while (true) {
      if (!getline()) return 0;
      if (!line.empty()) break;
    }
    uint8_t marker = line[0];
    if (is_fastq == -1) {
      if (marker == '>') is_fastq = 0;
      else if (marker == '@') is_fastq = 1;
      else {
        error = "Unrecognized FASTX record start";
        return -1;
      }
    }
    if ((is_fastq == 1 && marker != '@') || (is_fastq == 0 && marker != '>')) {
      error = "Record marker mismatch";
      return -1;
    }
    rec.id.assign(line.begin() + 1, line.end());
    if (is_fastq == 1) {
      if (!getline()) {
        error = "Truncated FASTQ record";
        return -1;
      }
      rec.seq = line;
      if (!getline() || line.empty() || line[0] != '+') {
        error = "Expected '+' separator";
        return -1;
      }
      if (!getline()) {
        error = "Truncated FASTQ record (missing quality)";
        return -1;
      }
      rec.qual = line;
      if (rec.qual.size() != rec.seq.size()) {
        error = "Quality length != sequence length";
        return -1;
      }
    } else {
      while (true) {
        size_t save_pos = pos;
        if (!getline()) break;
        if (!line.empty() && line[0] == '>') {
          pending = line;
          has_pending = true;
          (void)save_pos;
          break;
        }
        rec.seq.insert(rec.seq.end(), line.begin(), line.end());
      }
    }
    rec.valid = true;
    return 1;
  }
};

struct DxWriter {
  FILE* file = nullptr;
  Codec codec = Codec::kPlain;
  z_stream zs{};
  bool zs_init = false;
  ZSTD_CStream* zcs = nullptr;
  lzma_stream lz = LZMA_STREAM_INIT;
  bool lz_init = false;
  std::vector<uint8_t> out_buf;
};

}  // namespace

extern "C" {

DxReader* dx_open(const char* path) {
  FILE* f = (!path || strcmp(path, "-") == 0) ? stdin : fopen(path, "rb");
  if (!f) return nullptr;
  uint8_t magic[6] = {0};
  size_t got = fread(magic, 1, sizeof(magic), f);
  Codec codec = Codec::kPlain;
  if (got >= 2 && magic[0] == 0x1f && magic[1] == 0x8b) codec = Codec::kGzip;
  else if (got >= 4 && magic[0] == 0x28 && magic[1] == 0xb5 &&
           magic[2] == 0x2f && magic[3] == 0xfd)
    codec = Codec::kZstd;
  else if (got >= 6 && magic[0] == 0xfd && memcmp(magic + 1, "7zXZ", 4) == 0)
    codec = Codec::kXz;

  auto* r = new DxReader();
  r->buf.resize(kBufSize);
  r->src.init(f, codec, magic, got);
  return r;
}

void dx_close(DxReader* r) { delete r; }
int dx_is_fastq(DxReader* r) { return r->is_fastq; }
const char* dx_error(DxReader* r) { return r->error.c_str(); }

// Parse up to max_rec records into arena + meta (6 int64 per record:
// id_off,id_len,seq_off,seq_len,qual_off,qual_len; qual_off = -1 for FASTA).
// Returns #records (0 = EOF), -1 = parse error, -2 = arena too small for
// even one record (caller must grow and retry; no data lost).
int64_t dx_next_batch(DxReader* r, int64_t max_rec, uint8_t* arena,
                      int64_t arena_cap, int64_t* meta) {
  int64_t n = 0;
  int64_t used = 0;
  while (n < max_rec) {
    Record rec;
    if (r->overflow.valid) {
      rec = std::move(r->overflow);
      r->overflow.valid = false;
    } else {
      int rc = r->parse_record(rec);
      if (rc == 0) break;
      if (rc < 0) return -1;
    }
    int64_t need = (int64_t)(rec.id.size() + rec.seq.size() + rec.qual.size());
    if (used + need > arena_cap) {
      r->overflow = std::move(rec);
      r->overflow.valid = true;
      return n == 0 ? -2 : n;
    }
    int64_t* m = meta + 6 * n;
    m[0] = used;
    m[1] = (int64_t)rec.id.size();
    memcpy(arena + used, rec.id.data(), rec.id.size());
    used += (int64_t)rec.id.size();
    m[2] = used;
    m[3] = (int64_t)rec.seq.size();
    memcpy(arena + used, rec.seq.data(), rec.seq.size());
    used += (int64_t)rec.seq.size();
    if (r->is_fastq == 1) {
      m[4] = used;
      m[5] = (int64_t)rec.qual.size();
      memcpy(arena + used, rec.qual.data(), rec.qual.size());
      used += (int64_t)rec.qual.size();
    } else {
      m[4] = -1;
      m[5] = 0;
    }
    n++;
  }
  return n;
}

// ---------------------------------------------------------------------------
// Writer (codec: 0 plain, 1 gzip, 2 zstd, 3 xz)
// ---------------------------------------------------------------------------

DxWriter* dx_writer_open(const char* path, int codec, int level) {
  auto* w = new DxWriter();
  w->codec = (Codec)codec;
  w->file = (strcmp(path, "-") == 0) ? stdout : fopen(path, "wb");
  if (!w->file) {
    delete w;
    return nullptr;
  }
  switch (w->codec) {
    case Codec::kPlain:
      break;
    case Codec::kGzip:
      if (deflateInit2(&w->zs, level, Z_DEFLATED, 16 + MAX_WBITS, 8,
                       Z_DEFAULT_STRATEGY) != Z_OK) {
        if (w->file != stdout) fclose(w->file);
        delete w;
        return nullptr;
      }
      w->zs_init = true;
      w->out_buf.resize(kBufSize);
      break;
    case Codec::kZstd:
      w->zcs = ZSTD_createCStream();
      ZSTD_initCStream(w->zcs, level);
      w->out_buf.resize(ZSTD_CStreamOutSize());
      break;
    case Codec::kXz:
      if (lzma_easy_encoder(&w->lz, (uint32_t)level, LZMA_CHECK_CRC64) !=
          LZMA_OK) {
        if (w->file != stdout) fclose(w->file);
        delete w;
        return nullptr;
      }
      w->lz_init = true;
      w->out_buf.resize(kBufSize);
      break;
  }
  return w;
}

int dx_writer_write(DxWriter* w, const uint8_t* data, int64_t len) {
  switch (w->codec) {
    case Codec::kPlain:
      return fwrite(data, 1, (size_t)len, w->file) == (size_t)len ? 0 : -1;
    case Codec::kGzip: {
      w->zs.next_in = const_cast<uint8_t*>(data);
      w->zs.avail_in = (uInt)len;
      while (w->zs.avail_in > 0) {
        w->zs.next_out = w->out_buf.data();
        w->zs.avail_out = (uInt)w->out_buf.size();
        if (deflate(&w->zs, Z_NO_FLUSH) != Z_OK) return -1;
        size_t got = w->out_buf.size() - w->zs.avail_out;
        if (got && fwrite(w->out_buf.data(), 1, got, w->file) != got)
          return -1;
      }
      return 0;
    }
    case Codec::kZstd: {
      ZSTD_inBuffer ib{data, (size_t)len, 0};
      while (ib.pos < ib.size) {
        ZSTD_outBuffer ob{w->out_buf.data(), w->out_buf.size(), 0};
        size_t rc = ZSTD_compressStream(w->zcs, &ob, &ib);
        if (ZSTD_isError(rc)) return -1;
        if (ob.pos && fwrite(w->out_buf.data(), 1, ob.pos, w->file) != ob.pos)
          return -1;
      }
      return 0;
    }
    case Codec::kXz: {
      w->lz.next_in = data;
      w->lz.avail_in = (size_t)len;
      while (w->lz.avail_in > 0) {
        w->lz.next_out = w->out_buf.data();
        w->lz.avail_out = w->out_buf.size();
        if (lzma_code(&w->lz, LZMA_RUN) != LZMA_OK) return -1;
        size_t got = w->out_buf.size() - w->lz.avail_out;
        if (got && fwrite(w->out_buf.data(), 1, got, w->file) != got)
          return -1;
      }
      return 0;
    }
  }
  return -1;
}

int dx_writer_close(DxWriter* w) {
  int rc = 0;
  switch (w->codec) {
    case Codec::kPlain:
      break;
    case Codec::kGzip: {
      int r;
      do {
        w->zs.next_out = w->out_buf.data();
        w->zs.avail_out = (uInt)w->out_buf.size();
        r = deflate(&w->zs, Z_FINISH);
        size_t got = w->out_buf.size() - w->zs.avail_out;
        if (got && fwrite(w->out_buf.data(), 1, got, w->file) != got) rc = -1;
      } while (r == Z_OK);
      if (r != Z_STREAM_END) rc = -1;
      deflateEnd(&w->zs);
      w->zs_init = false;
      break;
    }
    case Codec::kZstd: {
      size_t remaining;
      do {
        ZSTD_outBuffer ob{w->out_buf.data(), w->out_buf.size(), 0};
        remaining = ZSTD_endStream(w->zcs, &ob);
        if (ZSTD_isError(remaining)) {
          rc = -1;
          break;
        }
        if (ob.pos) fwrite(w->out_buf.data(), 1, ob.pos, w->file);
      } while (remaining > 0);
      ZSTD_freeCStream(w->zcs);
      w->zcs = nullptr;
      break;
    }
    case Codec::kXz: {
      lzma_ret r;
      do {
        w->lz.next_out = w->out_buf.data();
        w->lz.avail_out = w->out_buf.size();
        r = lzma_code(&w->lz, LZMA_FINISH);
        size_t got = w->out_buf.size() - w->lz.avail_out;
        if (got) fwrite(w->out_buf.data(), 1, got, w->file);
      } while (r == LZMA_OK);
      if (r != LZMA_STREAM_END) rc = -1;
      lzma_end(&w->lz);
      w->lz_init = false;
      break;
    }
  }
  if (w->file && w->file != stdout) {
    if (fclose(w->file)) rc = -1;
  } else if (w->file) {
    fflush(w->file);
  }
  w->file = nullptr;
  delete w;
  return rc;
}

// 2-bit pack + validity (packed-seq analogue: code = (byte >> 1) & 3;
// ref: src/filter_common.rs:238).
void dx_pack_codes(const uint8_t* seq, int64_t n, uint8_t* codes,
                   uint8_t* valid) {
  for (int64_t i = 0; i < n; i++) {
    uint8_t b = seq[i];
    codes[i] = (b >> 1) & 3;
    uint8_t u = b & 0xDF;
    valid[i] = (u == 'A' || u == 'C' || u == 'G' || u == 'T') ? 1 : 0;
  }
}

// Pack row byte-slices of an arena straight into the device tile layout:
// codes4 (R x L/4): base j of a row at bits 2*(j%4) of byte j/4;
// valid8 (R x L/8): validity bit of base j at bit j%8 of byte j/8.
// Bit order matches the engine's on-device unpack (little-bit-order), i.e.
// the native equivalent of engine.pack_rows + engine.host_pack_bits.
// L must be a multiple of 8; rows beyond n_rows stay zero.
void dx_pack_tile(const uint8_t* arena, const int64_t* starts,
                  const int64_t* lens, int64_t n_rows, int64_t R, int64_t L,
                  uint8_t* codes4, uint8_t* valid8) {
  const int64_t cw = L / 4, vw = L / 8;
  memset(codes4, 0, (size_t)(R * cw));
  memset(valid8, 0, (size_t)(R * vw));
  // validity lookup: A/C/G/T upper or lower case
  static uint8_t vtab[256];
  static bool vinit = false;
  if (!vinit) {
    memset(vtab, 0, sizeof(vtab));
    vtab[(int)'A'] = vtab[(int)'C'] = vtab[(int)'G'] = vtab[(int)'T'] = 1;
    vtab[(int)'a'] = vtab[(int)'c'] = vtab[(int)'g'] = vtab[(int)'t'] = 1;
    vinit = true;
  }
  for (int64_t r = 0; r < n_rows; r++) {
    const uint8_t* s = arena + starts[r];
    const int64_t n = lens[r];
    uint8_t* crow = codes4 + r * cw;
    uint8_t* vrow = valid8 + r * vw;
    int64_t j = 0;
    for (; j + 8 <= n; j += 8) {
      uint8_t c0 = (uint8_t)(((s[j + 0] >> 1) & 3) | (((s[j + 1] >> 1) & 3) << 2) |
                             (((s[j + 2] >> 1) & 3) << 4) | (((s[j + 3] >> 1) & 3) << 6));
      uint8_t c1 = (uint8_t)(((s[j + 4] >> 1) & 3) | (((s[j + 5] >> 1) & 3) << 2) |
                             (((s[j + 6] >> 1) & 3) << 4) | (((s[j + 7] >> 1) & 3) << 6));
      crow[j / 4] = c0;
      crow[j / 4 + 1] = c1;
      uint8_t v = 0;
      for (int t = 0; t < 8; t++) v |= (uint8_t)(vtab[s[j + t]] << t);
      vrow[j / 8] = v;
    }
    for (; j < n; j++) {
      crow[j / 4] |= (uint8_t)(((s[j] >> 1) & 3) << (2 * (j % 4)));
      vrow[j / 8] |= (uint8_t)(vtab[s[j]] << (j % 8));
    }
  }
}

// ---------------------------------------------------------------------------
// bincode-standard varint u64 array codec (index file format;
// ref: src/index.rs:130-164). Unsigned ints: <251 one raw byte; 251 + u16LE;
// 252 + u32LE; 253 + u64LE.
// ---------------------------------------------------------------------------

// Decode `count` varints from buf[0..len) into out. Returns bytes consumed,
// or -1 on truncated/malformed input.
int64_t dx_decode_u64_varint(const uint8_t* buf, int64_t len, int64_t count,
                             uint64_t* out) {
  int64_t pos = 0;
  for (int64_t i = 0; i < count; i++) {
    // dominant case first: for hash data ~100% of records are 0xFD+u64LE.
    // Unrolled run of 4 keeps the branch predictor and load unit busy.
    while (count - i >= 4 && len - pos >= 36 && buf[pos] == 253 &&
           buf[pos + 9] == 253 && buf[pos + 18] == 253 && buf[pos + 27] == 253) {
      uint64_t v0, v1, v2, v3;
      memcpy(&v0, buf + pos + 1, 8);
      memcpy(&v1, buf + pos + 10, 8);
      memcpy(&v2, buf + pos + 19, 8);
      memcpy(&v3, buf + pos + 28, 8);
      out[i] = v0;
      out[i + 1] = v1;
      out[i + 2] = v2;
      out[i + 3] = v3;
      i += 4;
      pos += 36;
    }
    if (i >= count) break;
    if (pos >= len) return -1;
    uint8_t first = buf[pos];
    if (first == 253) {
      if (pos + 9 > len) return -1;
      uint64_t v;
      memcpy(&v, buf + pos + 1, 8);
      out[i] = v;
      pos += 9;
    } else if (first <= 250) {
      out[i] = first;
      pos += 1;
    } else if (first == 251) {
      if (pos + 3 > len) return -1;
      uint16_t v;
      memcpy(&v, buf + pos + 1, 2);
      out[i] = v;
      pos += 3;
    } else if (first == 252) {
      if (pos + 5 > len) return -1;
      uint32_t v;
      memcpy(&v, buf + pos + 1, 4);
      out[i] = v;
      pos += 5;
    } else {
      return -1;  // 254 (u128) unsupported for u64 arrays; 255 invalid
    }
  }
  return pos;
}

// Encode `count` u64s into out (caller allocates >= 9*count). Returns bytes
// written.
int64_t dx_encode_u64_varint(const uint64_t* vals, int64_t count,
                             uint8_t* out) {
  int64_t pos = 0;
  for (int64_t i = 0; i < count; i++) {
    uint64_t v = vals[i];
    if (v <= 250) {
      out[pos++] = (uint8_t)v;
    } else if (v <= 0xFFFF) {
      out[pos] = 251;
      uint16_t x = (uint16_t)v;
      memcpy(out + pos + 1, &x, 2);
      pos += 3;
    } else if (v <= 0xFFFFFFFFULL) {
      out[pos] = 252;
      uint32_t x = (uint32_t)v;
      memcpy(out + pos + 1, &x, 4);
      pos += 5;
    } else {
      out[pos] = 253;
      memcpy(out + pos + 1, &v, 8);
      pos += 9;
    }
  }
  return pos;
}

// 1 if strictly increasing (sorted + unique), else 0.
int dx_u64_sorted_unique(const uint64_t* vals, int64_t count) {
  for (int64_t i = 1; i < count; i++)
    if (vals[i] <= vals[i - 1]) return 0;
  return 1;
}

// ---------------------------------------------------------------------------
// Bucketed membership probe over a sorted u64 array (the host-side analogue
// of the device engine's HBM probe; plays the reference's FxHashSet role,
// ref: src/index.rs:98, src/filter_common.rs:129-155).
//
// A 2^16-entry offset table over the keys' high 16 bits narrows each binary
// search to ~n/65536 entries (a few cache lines), vs 26 random DRAM reads
// for a full binary search (np.searchsorted measured 17 us/query on a
// 50M-entry index; this probe ~0.1 us).
// ---------------------------------------------------------------------------

}  // extern "C"

namespace {

// Bucket table over the high `bits` bits of each key; sized so the average
// bucket fits in ~1-2 cache lines (bits grows with n, capped at 26 =>
// 256 MiB of u32 offsets for a panhuman-scale 4.1e8-key index, ~6 keys
// per bucket). Queries are software-pipelined: the offset-table line is
// prefetched kAheadOff iterations out, the key range kAheadKeys out, so the
// two dependent DRAM reads per probe overlap across iterations.
struct ProbeTable {
  std::vector<uint32_t> off;  // 2^bits + 1 offsets (n < 2^32 always: max
                              // observed index is ~5.5e8 minimizers)
  int shift = 48;             // 64 - bits
};

inline int probe_bits_for(int64_t n) {
  int bits = 16;
  while (bits < 26 && (n >> (bits + 3)) > 0) bits++;  // ~8 keys per bucket
  return bits;
}

inline bool probe_lookup(const ProbeTable& t, const uint64_t* keys,
                         uint64_t v) {
  uint64_t b = v >> t.shift;
  int64_t lo = t.off[b], hi = t.off[b + 1];
  int64_t end = hi;
  while (lo < hi) {
    int64_t mid = (lo + hi) >> 1;
    if (keys[mid] < v) lo = mid + 1;
    else hi = mid;
  }
  return lo < end && keys[lo] == v;
}

constexpr int kAheadOff = 16, kAheadKeys = 6;

}  // namespace

extern "C" {

// Builds the bucket offset table for a sorted unique array. The caller
// keeps `keys` alive and unchanged for the lifetime of the handle.
void* dx_probe_build(const uint64_t* keys, int64_t n) {
  auto* t = new ProbeTable();
  int bits = probe_bits_for(n);
  t->shift = 64 - bits;
  int64_t nb = (int64_t)1 << bits;
  t->off.resize(nb + 1);
  int64_t pos = 0;
  for (int64_t b = 0; b < nb; b++) {
    t->off[b] = (uint32_t)pos;
    uint64_t limit_hi = (uint64_t)b;
    while (pos < n && (keys[pos] >> t->shift) <= limit_hi) pos++;
  }
  t->off[nb] = (uint32_t)n;
  return t;
}

void dx_probe_free(void* handle) {
  delete static_cast<ProbeTable*>(handle);
}

// out[i] = 1 if q[i] is in keys, else 0.
void dx_probe_query(void* handle, const uint64_t* keys, const uint64_t* q,
                    int64_t nq, uint8_t* out) {
  const ProbeTable& t = *static_cast<ProbeTable*>(handle);
  for (int64_t i = 0; i < nq; i++) {
    if (i + kAheadOff < nq)
      __builtin_prefetch(&t.off[q[i + kAheadOff] >> t.shift]);
    if (i + kAheadKeys < nq)
      __builtin_prefetch(&keys[t.off[q[i + kAheadKeys] >> t.shift]]);
    out[i] = probe_lookup(t, keys, q[i]) ? 1 : 0;
  }
}

}  // extern "C"

// ===========================================================================
// Host minimizer-extraction engine
//
// The C++ twin of the NumPy oracle (deacon_tpu/ops/minimizers_np.py) and the
// JAX device engine: identical scheme, bit-identical outputs (enforced by
// tests/test_native_extract.py). Used as the fast host fallback path where
// no accelerator is attached — the analogue of the reference's
// simd-minimizers CPU path (ref: src/minimizers.rs:125-191,
// src/filter_common.rs:211-310).
// ===========================================================================

namespace {

// ---- XXH3-64 small-input paths (seed 0, default secret), matching
// deacon_tpu/utils/xxh3.py bit-for-bit ----
// secret[8..16]^secret[16..24] etc. of the upstream kSecret, seed 0;
// values cross-checked against deacon_tpu/utils/xxh3.py
constexpr uint64_t kBitflip4to8 = 0xc73ab174c5ecd5a2ULL;
constexpr uint64_t kBitflipLo9to16 = 0x6782737bea4239b9ULL;
constexpr uint64_t kBitflipHi9to16 = 0xaf56bc3b0996523aULL;
constexpr uint64_t kPrimeMx2 = 0x9FB21C651E98DF25ULL;
constexpr uint64_t kPrime64_3 = 0x165667919E3779F9ULL;

static inline uint64_t rotl64(uint64_t x, int n) {
  return (x << n) | (x >> (64 - n));
}

static inline uint64_t xxh3_u64(uint64_t v) {
  uint64_t lo32 = v & 0xFFFFFFFFULL, hi32 = v >> 32;
  uint64_t input64 = hi32 | (lo32 << 32);
  uint64_t h = input64 ^ kBitflip4to8;
  h ^= rotl64(h, 49) ^ rotl64(h, 24);
  h *= kPrimeMx2;
  h ^= (h >> 35) + 8ULL;
  h *= kPrimeMx2;
  return h ^ (h >> 28);
}

static inline uint64_t xxh3_u128(uint64_t lo, uint64_t hi) {
  uint64_t il = lo ^ kBitflipLo9to16;
  uint64_t ih = hi ^ kBitflipHi9to16;
  unsigned __int128 m = (unsigned __int128)il * ih;
  uint64_t fold = (uint64_t)m ^ (uint64_t)(m >> 64);
  uint64_t acc = 16ULL + __builtin_bswap64(il) + ih + fold;
  acc ^= acc >> 37;
  acc *= kPrime64_3;
  return acc ^ (acc >> 32);
}

static inline uint32_t fmix32(uint32_t x) {
  x ^= x >> 16;
  x *= 0x85EBCA6BU;
  x ^= x >> 13;
  x *= 0xC2B2AE35U;
  x ^= x >> 16;
  return x;
}

// IUPAC->ACGT canonicalisation (index side; ref: src/minimizers.rs:24-43)
struct IupacTable {
  uint8_t map[256];
  IupacTable() {
    for (int i = 0; i < 256; i++) map[i] = 'C';
    auto set = [&](const char* src, char dst) {
      for (const char* p = src; *p; p++) map[(uint8_t)*p] = (uint8_t)dst;
    };
    set("Aa", 'A'); set("Cc", 'C'); set("Gg", 'G'); set("Tt", 'T');
    set("Rr", 'G'); set("Yy", 'C'); set("Ss", 'G'); set("Ww", 'A');
    set("Kk", 'G'); set("Mm", 'C'); set("Bb", 'C'); set("Dd", 'G');
    set("Hh", 'C'); set("Vv", 'G'); set("Nn", 'C');
  }
};
static const IupacTable kIupac;

static inline bool valid_base(uint8_t b) {
  uint8_t u = b & 0xDF;
  return u == 'A' || u == 'C' || u == 'G' || u == 'T';
}

// Scaled Shannon entropy of a k-mer's ACGT composition, float32 math to
// mirror the oracle (ref: src/minimizers.rs:73-121). k < 10 always passes.
static inline float scaled_entropy(const uint8_t* win, int k) {
  float counts[4] = {0, 0, 0, 0};
  float total = 0;
  for (int j = 0; j < k; j++) {
    switch (win[j] & 0xDF) {
      case 'A': counts[0] += 1.0f; total += 1.0f; break;
      case 'C': counts[1] += 1.0f; total += 1.0f; break;
      case 'G': counts[2] += 1.0f; total += 1.0f; break;
      case 'T': counts[3] += 1.0f; total += 1.0f; break;
      default: break;
    }
  }
  if (total <= 0.0f) return 1.0f;
  float acc = 0.0f;
  for (int c = 0; c < 4; c++) {
    if (counts[c] > 0.0f) {
      float p = counts[c] / total;
      acc += p * log2f(p);
    }
  }
  return -acc / 2.0f;
}

// Per-worker scratch for extract_one: reused across records to avoid
// allocation churn in the hot loop.
struct ExtractScratch {
  std::vector<uint32_t> keys;   // selection key per position
  std::vector<uint32_t> pos;    // selected (deduped) window-argmin positions
  std::vector<uint64_t> sfx;    // van Herk block suffix minima
  std::vector<uint64_t> vals;   // canonical k-mer value per position (k<=32)
  std::vector<uint8_t> valid;   // 1 = no non-ACGT byte in the k-mer (k<=32)
};

// code tables: byte -> 2-bit code; filter side packs raw bytes, index side
// IUPAC-canonicalises first (ref: src/minimizers.rs:143-148 vs
// src/filter_common.rs:238). kBadTable: 1 for non-ACGT bytes.
struct CodeTables {
  uint8_t filter[256];
  uint8_t index[256];
  uint8_t bad[256];
  CodeTables() {
    for (int b = 0; b < 256; b++) {
      filter[b] = (uint8_t)((b >> 1) & 3);
      index[b] = (uint8_t)((kIupac.map[b] >> 1) & 3);
      bad[b] = valid_base((uint8_t)b) ? 0 : 1;
    }
  }
};
static const CodeTables kCodes;

// Extract minimizers of one sequence. Appends (hash, position) pairs.
// Returns count appended, or -1 if out capacity would be exceeded.
// index_mode: IUPAC-canonicalise before selection, validity+entropy on the
// original bytes.
static int64_t extract_one(const uint8_t* seq, int64_t n, int k, int w,
                           bool index_mode, float entropy_threshold,
                           ExtractScratch& scr, uint64_t* out_h,
                           uint32_t* out_p, int64_t cap) {
  if (n < k) return 0;
  const int64_t m = n - k + 1;
  scr.keys.resize(m);
  const int shift_top = 2 * (k - 1);
  const bool wide = k > 32;
  const uint8_t* codes = index_mode ? kCodes.index : kCodes.filter;
  const uint8_t* bad_tab = kCodes.bad;

  // Pass 1: rolling canonical values + selection keys at every position.
  // fwd = sum code[p+j] << 2j ; rc = sum (code[p+k-1-j]^2) << 2j.
  // The serial recurrence has a ~2-cycle dependency chain and measures
  // ~375 Mbp/s scalar — FASTER than an 8-lane AVX-512 rewrite on this
  // host (163 Mbp/s: cvt/transpose overhead + vector downclock), so it
  // stays scalar. Canonical values and a rolling non-ACGT counter are
  // recorded per position so the selected-position pass below is a pure
  // table lookup (recomputing each selected k-mer measured 1/96 of the
  // per-base budget; buffering costs only a streaming 9 B/base write).
  if (!wide) {
    scr.vals.resize(m);
    scr.valid.resize(m);
    const uint64_t mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
    uint64_t fwd = 0, rc = 0;
    int bad = 0;
    for (int j = 0; j < k - 1; j++) {
      uint8_t b = seq[j];
      uint64_t c = codes[b];
      fwd |= c << (2 * j);
      rc = (rc << 2) | (c ^ 2);
      bad += bad_tab[b];
    }
    for (int64_t p = 0; p < m; p++) {
      uint8_t b = seq[p + k - 1];
      uint64_t c = codes[b];
      fwd = (p ? (fwd >> 2) : fwd) | (c << shift_top);
      rc = ((rc << 2) & mask) | (c ^ 2);
      bad += bad_tab[b];
      uint64_t v = fwd <= rc ? fwd : rc;
      scr.vals[p] = v;
      scr.valid[p] = (uint8_t)(bad == 0);
      bad -= bad_tab[seq[p]];  // k-mer at p+1 drops seq[p]
      scr.keys[p] = (uint32_t)v ^ (uint32_t)(v >> 32);
    }
  } else {
    unsigned __int128 fwd = 0, rc = 0;
    const unsigned __int128 mask =
        (((unsigned __int128)1) << (2 * k)) - 1;  // k <= 57 < 64
    for (int j = 0; j < k - 1; j++) {
      unsigned __int128 c = codes[seq[j]];
      fwd |= c << (2 * j);
      rc = (rc << 2) | (c ^ 2);
    }
    for (int64_t p = 0; p < m; p++) {
      unsigned __int128 c = codes[seq[p + k - 1]];
      fwd = (p ? (fwd >> 2) : fwd) | (c << shift_top);
      rc = ((rc << 2) & mask) | (c ^ 2);
      unsigned __int128 v = fwd <= rc ? fwd : rc;
      uint64_t lo = (uint64_t)v, hi = (uint64_t)(v >> 64);
      scr.keys[p] =
          (uint32_t)lo ^ (uint32_t)(lo >> 32) ^ (uint32_t)hi ^ (uint32_t)(hi >> 32);
    }
  }
  for (int64_t p = 0; p < m; p++) {  // vectorizable finalizer pass
    uint32_t x = scr.keys[p];
    x ^= x >> 16;
    x *= 0x85EBCA6BU;
    x ^= x >> 13;
    x *= 0xC2B2AE35U;
    x ^= x >> 16;
    scr.keys[p] = x & 0xFFFF0000U;
  }
  const uint32_t* keys_buf = scr.keys.data();

  // Window argmin with leftmost tie-break, deduplicated. van Herk/
  // Gil-Werman block minima over (key << 32 | pos) packed u64s: a smaller
  // pos wins key ties automatically, every loop is branch-light (a monotone
  // deque measured ~55 MB/s on mispredicts). Both scans walk blocks
  // explicitly — a j % w in the hot loop costs an integer divide per
  // position and halved throughput.
  scr.pos.clear();
  if (m <= w) {
    uint32_t best = 0;
    for (int64_t p = 1; p < m; p++)
      if (keys_buf[p] < keys_buf[best]) best = (uint32_t)p;
    scr.pos.push_back(best);
  } else {
    scr.sfx.resize(m);
    for (int64_t bs = 0; bs < m; bs += w) {
      int64_t be = bs + w < m ? bs + w : m;
      uint64_t run = ~0ULL;
      for (int64_t j = be - 1; j >= bs; j--) {
        uint64_t pk = ((uint64_t)keys_buf[j] << 32) | (uint32_t)j;
        run = pk < run ? pk : run;
        scr.sfx[j] = run;
      }
    }
    int64_t last = -1;
    for (int64_t bs = 0; bs < m; bs += w) {
      int64_t be = bs + w < m ? bs + w : m;
      uint64_t pfx = ~0ULL;
      for (int64_t j = bs; j < be; j++) {
        uint64_t pk = ((uint64_t)keys_buf[j] << 32) | (uint32_t)j;
        pfx = pk < pfx ? pk : pfx;
        if (j >= w - 1) {
          uint64_t s = scr.sfx[j - w + 1];
          uint64_t win = s < pfx ? s : pfx;
          int64_t p = (uint32_t)win;
          if (p != last) {
            last = p;
            scr.pos.push_back((uint32_t)p);
          }
        }
      }
    }
  }

  // Selected positions: validity (no non-ACGT byte in the ORIGINAL k-mer),
  // entropy, hash. k<=32 reads the buffered value/validity; k>32 (rare)
  // recomputes directly.
  int64_t cnt = 0;
  for (uint32_t p : scr.pos) {
    if (!wide) {
      if (!scr.valid[p]) continue;
      if (index_mode && entropy_threshold != 0.0f && k >= 10 &&
          scaled_entropy(seq + p, k) < entropy_threshold)
        continue;
      if (cnt >= cap) return -1;
      out_h[cnt] = xxh3_u64(scr.vals[p]);
      out_p[cnt] = p;
      cnt++;
    } else {
      bool ok = true;
      for (int j = 0; j < k; j++) {
        if (!valid_base(seq[p + j])) { ok = false; break; }
      }
      if (!ok) continue;
      if (index_mode && entropy_threshold != 0.0f && k >= 10 &&
          scaled_entropy(seq + p, k) < entropy_threshold)
        continue;
      if (cnt >= cap) return -1;
      unsigned __int128 fwd = 0, rc = 0;
      for (int j = 0; j < k; j++) {
        unsigned __int128 c = index_mode ? ((kIupac.map[seq[p + j]] >> 1) & 3)
                                         : ((seq[p + j] >> 1) & 3);
        fwd |= c << (2 * j);
        rc = (rc << 2) | (c ^ 2);
      }
      unsigned __int128 v = fwd <= rc ? fwd : rc;
      out_h[cnt] = xxh3_u128((uint64_t)v, (uint64_t)(v >> 64));
      out_p[cnt] = p;
      cnt++;
    }
  }
  return cnt;
}

}  // namespace

extern "C" {

// Batched minimizer extraction over an arena of sequences.
// index_mode=1: IUPAC canonicalisation + entropy filter (index build side,
// ref: src/minimizers.rs:125-191); 0: filter side (raw 2-bit packing,
// ref: src/filter_common.rs:211-310). Caller handles prefix truncation and
// trailing-newline stripping via starts/lens.
// Outputs: out_hashes/out_pos (capacity cap), out_counts per sequence.
// Returns total minimizer count, or -1 if cap was insufficient.
int64_t dx_extract_batch(const uint8_t* arena, const int64_t* starts,
                         const int64_t* lens, int64_t n_seqs, int32_t k,
                         int32_t w, int32_t index_mode,
                         float entropy_threshold, uint64_t* out_hashes,
                         uint32_t* out_pos, int64_t* out_counts,
                         int64_t cap, int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  int hw = (int)std::thread::hardware_concurrency();
  if (hw > 0 && n_threads > hw) n_threads = hw;
  if ((int64_t)n_threads > n_seqs) n_threads = (int32_t)(n_seqs ? n_seqs : 1);

  if (n_threads == 1) {
    ExtractScratch scr;
    int64_t total = 0;
    for (int64_t i = 0; i < n_seqs; i++) {
      int64_t c = extract_one(arena + starts[i], lens[i], k, w,
                              index_mode != 0, entropy_threshold, scr,
                              out_hashes + total,
                              out_pos + total, cap - total);
      if (c < 0) return -1;
      out_counts[i] = c;
      total += c;
    }
    return total;
  }

  // Multi-threaded: contiguous sequence ranges balanced by total bases;
  // each worker fills private buffers, then results are packed in order
  // (the reference parallelizes identically with rayon par_iter over
  // record batches; ref: src/remote_filter.rs:762-774).
  std::vector<int64_t> cuts(n_threads + 1, 0);
  int64_t total_bases = 0;
  for (int64_t i = 0; i < n_seqs; i++) total_bases += lens[i];
  {
    int64_t acc = 0, t = 1;
    for (int64_t i = 0; i < n_seqs && t < n_threads; i++) {
      acc += lens[i];
      if (acc * n_threads >= total_bases * t) cuts[t++] = i + 1;
    }
    for (int64_t t2 = 1; t2 < n_threads; t2++)
      if (cuts[t2] == 0) cuts[t2] = cuts[t2 - 1];
    cuts[n_threads] = n_seqs;
  }
  struct Part {
    std::vector<uint64_t> h;
    std::vector<uint32_t> p;
    bool overflow = false;
  };
  std::vector<Part> parts(n_threads);
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; t++) {
    threads.emplace_back([&, t]() {
      Part& part = parts[t];
      ExtractScratch scr;
      std::vector<uint64_t> h1;
      std::vector<uint32_t> p1;
      for (int64_t i = cuts[t]; i < cuts[t + 1]; i++) {
        int64_t max_m = lens[i] >= k ? lens[i] - k + 1 : 0;
        h1.resize(max_m);
        p1.resize(max_m);
        int64_t c = extract_one(arena + starts[i], lens[i], k, w,
                                index_mode != 0, entropy_threshold, scr,
                                h1.data(), p1.data(), max_m);
        if (c < 0) { part.overflow = true; return; }  // cannot happen: cap=m
        out_counts[i] = c;
        part.h.insert(part.h.end(), h1.begin(), h1.begin() + c);
        part.p.insert(part.p.end(), p1.begin(), p1.begin() + c);
      }
    });
  }
  for (auto& th : threads) th.join();
  int64_t total = 0;
  for (auto& part : parts) total += (int64_t)part.h.size();
  if (total > cap) return -1;
  int64_t off = 0;
  for (auto& part : parts) {
    memcpy(out_hashes + off, part.h.data(), part.h.size() * 8);
    memcpy(out_pos + off, part.p.data(), part.p.size() * 4);
    off += (int64_t)part.h.size();
  }
  return total;
}

}  // extern "C"

// ===========================================================================
// Fully native streaming filter pipeline
//
// The C++ twin of deacon_tpu/filter/engine.py's host path: a reader thread
// parses records into batches, a worker pool extracts minimizers + probes
// the index + applies thresholds, and an ordered writer thread formats and
// writes kept records (the paraseq reader / rayon workers / locked writer
// architecture of the reference, ref: src/local_filter.rs:153-187,345-573,
// re-expressed as an explicit pipeline). Semantics (distinct-hit counting,
// pair-union, threshold math, rename numbering, stats) are bit-identical to
// the Python engine; tests/test_native_pipeline.py enforces it.
// ===========================================================================

namespace {

struct FBatch {
  int64_t seq_no = 0;
  int64_t n_units = 0;  // records (single) or pairs (paired)
  bool paired = false;
  std::vector<uint8_t> arena;
  std::vector<int64_t> meta;  // 6 per record: id_off,id_len,seq_off,seq_len,qual_off,qual_len
  std::vector<uint8_t> keep;  // per unit (worker output)
};

struct FQueue {
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::deque<FBatch*> q;
  size_t cap;
  bool closed = false;
  explicit FQueue(size_t c) : cap(c) {}
  bool push(FBatch* b) {
    std::unique_lock<std::mutex> lk(mu);
    cv_push.wait(lk, [&] { return q.size() < cap || closed; });
    if (closed) return false;
    q.push_back(b);
    cv_pop.notify_one();
    return true;
  }
  bool pop(FBatch*& out) {
    std::unique_lock<std::mutex> lk(mu);
    cv_pop.wait(lk, [&] { return !q.empty() || closed; });
    if (q.empty()) return false;
    out = q.front();
    q.pop_front();
    cv_push.notify_one();
    return true;
  }
  void close() {
    std::lock_guard<std::mutex> lk(mu);
    closed = true;
    cv_push.notify_all();
    cv_pop.notify_all();
  }
};

struct FilterJob {
  // index
  const uint64_t* keys = nullptr;
  const ProbeTable* probe = nullptr;  // from dx_probe_build
  // params
  int k = 31, w = 15;
  int64_t prefix_len = 0;
  int64_t abs_threshold = 2;
  double rel_threshold = 0.01;
  bool deplete = false, rename = false;
  // io
  DxWriter* w1 = nullptr;
  DxWriter* w2 = nullptr;
  // pipeline
  FQueue work{4};
  std::mutex done_mu;
  std::condition_variable done_cv;
  std::map<int64_t, FBatch*> done;
  int64_t next_write = 0;
  std::atomic<int64_t> total_batches{-1};
  std::atomic<bool> failed{false};
  std::mutex err_mu;
  std::string err;
  // stats (writer-thread-owned; mirrored into `progress` for live polling)
  int64_t total_seqs = 0, filtered_seqs = 0, total_bp = 0;
  int64_t output_bp = 0, filtered_bp = 0, out_counter = 0;
  int64_t* progress = nullptr;  // [6]

  void fail(const std::string& m) {
    {
      std::lock_guard<std::mutex> lk(err_mu);
      if (err.empty()) err = m;
    }
    failed.store(true);
    work.close();
    done_cv.notify_all();
  }
};

// distinct index hits among `hashes` (seen-set semantics,
// ref: src/filter_common.rs:129-155): collect matches, sort, count unique.
static int64_t count_distinct_hits(const FilterJob& J, const uint64_t* hashes,
                                   int64_t n, std::vector<uint64_t>& scratch) {
  scratch.clear();
  const ProbeTable& t = *J.probe;
  for (int64_t i = 0; i < n; i++) {
    if (i + kAheadOff < n)
      __builtin_prefetch(&t.off[hashes[i + kAheadOff] >> t.shift]);
    if (i + kAheadKeys < n)
      __builtin_prefetch(&J.keys[t.off[hashes[i + kAheadKeys] >> t.shift]]);
    if (probe_lookup(t, J.keys, hashes[i])) scratch.push_back(hashes[i]);
  }
  if (scratch.empty()) return 0;
  std::sort(scratch.begin(), scratch.end());
  int64_t distinct = 1;
  for (size_t i = 1; i < scratch.size(); i++)
    if (scratch[i] != scratch[i - 1]) distinct++;
  return distinct;
}

// keep decision (ref: src/filter_common.rs:84-112; Rust f64::round is
// half-away-from-zero and rel >= 0, so floor(x + 0.5))
static inline bool keep_decision(const FilterJob& J, int64_t hits,
                                 int64_t total) {
  int64_t rel_req =
      total == 0
          ? 0
          : std::max<int64_t>(
                1, (int64_t)std::floor(J.rel_threshold * (double)total + 0.5));
  int64_t required = std::max(J.abs_threshold, rel_req);
  return J.deplete ? hits < required : hits >= required;
}

static void filter_worker(FilterJob& J) {
  ExtractScratch scr;
  std::vector<uint64_t> hashes, scratch;
  std::vector<uint32_t> posv;
  FBatch* b;
  while (J.work.pop(b)) {
    if (J.failed.load()) {
      delete b;
      continue;
    }
    b->keep.resize(b->n_units);
    const int recs_per_unit = b->paired ? 2 : 1;
    for (int64_t u = 0; u < b->n_units; u++) {
      hashes.clear();
      for (int r = 0; r < recs_per_unit; r++) {
        const int64_t* m = b->meta.data() + 6 * (u * recs_per_unit + r);
        int64_t len = m[3];
        if (J.prefix_len > 0 && len > J.prefix_len) len = J.prefix_len;
        int64_t max_m = len >= J.k ? len - J.k + 1 : 0;
        if (max_m <= 0) continue;
        size_t base = hashes.size();
        hashes.resize(base + max_m);
        posv.resize(max_m);
        int64_t c = extract_one(b->arena.data() + m[2], len, J.k, J.w,
                                /*index_mode=*/false, 0.0f, scr,
                                hashes.data() + base, posv.data(), max_m);
        hashes.resize(base + (c > 0 ? c : 0));
      }
      int64_t total = (int64_t)hashes.size();
      int64_t hits =
          count_distinct_hits(J, hashes.data(), total, scratch);
      b->keep[u] = keep_decision(J, hits, total) ? 1 : 0;
    }
    {
      std::lock_guard<std::mutex> lk(J.done_mu);
      J.done[b->seq_no] = b;
    }
    J.done_cv.notify_all();
  }
}

static void append_bytes(std::vector<uint8_t>& dst, const uint8_t* p,
                         int64_t n) {
  dst.insert(dst.end(), p, p + n);
}

// format one record (ref: src/remote_filter.rs:1402-1443); identical bytes
// to io/writers.py format_record
static void emit_record(std::vector<uint8_t>& dst, const FBatch& b,
                        const int64_t* m, bool rename, int64_t seqnum) {
  bool is_fq = m[4] >= 0;
  dst.push_back(is_fq ? '@' : '>');
  if (rename) {
    char tmp[24];
    int n = snprintf(tmp, sizeof(tmp), "%lld", (long long)seqnum);
    append_bytes(dst, (const uint8_t*)tmp, n);
  } else {
    append_bytes(dst, b.arena.data() + m[0], m[1]);
  }
  dst.push_back('\n');
  append_bytes(dst, b.arena.data() + m[2], m[3]);
  if (is_fq) {
    dst.push_back('\n');
    dst.push_back('+');
    dst.push_back('\n');
    append_bytes(dst, b.arena.data() + m[4], m[5]);
  }
  dst.push_back('\n');
}

static void filter_writer(FilterJob& J) {
  std::vector<uint8_t> buf, buf2;
  while (true) {
    FBatch* b = nullptr;
    {
      std::unique_lock<std::mutex> lk(J.done_mu);
      J.done_cv.wait(lk, [&] {
        return J.failed.load() || J.done.count(J.next_write) ||
               (J.total_batches.load() >= 0 &&
                J.next_write >= J.total_batches.load());
      });
      if (J.failed.load()) return;
      if (J.total_batches.load() >= 0 &&
          J.next_write >= J.total_batches.load() &&
          !J.done.count(J.next_write))
        return;
      auto it = J.done.find(J.next_write);
      b = it->second;
      J.done.erase(it);
      J.next_write++;
    }
    buf.clear();
    buf2.clear();
    const int recs_per_unit = b->paired ? 2 : 1;
    for (int64_t u = 0; u < b->n_units; u++) {
      const int64_t* m1 = b->meta.data() + 6 * u * recs_per_unit;
      if (b->paired) {
        const int64_t* m2 = m1 + 6;
        int64_t pair_bp = m1[3] + m2[3];
        J.total_seqs += 2;
        J.total_bp += pair_bp;
        if (b->keep[u]) {
          J.output_bp += pair_bp;
          J.out_counter += 2;
          emit_record(buf, *b, m1, J.rename, J.out_counter - 1);
          emit_record(J.w2 ? buf2 : buf, *b, m2, J.rename, J.out_counter);
        } else {
          J.filtered_seqs += 2;
          J.filtered_bp += pair_bp;
        }
      } else {
        J.total_seqs += 1;
        J.total_bp += m1[3];
        if (b->keep[u]) {
          J.output_bp += m1[3];
          J.out_counter += 1;
          emit_record(buf, *b, m1, J.rename, J.out_counter);
        } else {
          J.filtered_seqs += 1;
          J.filtered_bp += m1[3];
        }
      }
    }
    delete b;
    if (!buf.empty() && dx_writer_write(J.w1, buf.data(), buf.size()) != 0) {
      J.fail("write failed");
      return;
    }
    if (J.w2 && !buf2.empty() &&
        dx_writer_write(J.w2, buf2.data(), buf2.size()) != 0) {
      J.fail("write failed");
      return;
    }
    if (J.progress) {
      __atomic_store_n(&J.progress[0], J.total_seqs, __ATOMIC_RELAXED);
      __atomic_store_n(&J.progress[1], J.filtered_seqs, __ATOMIC_RELAXED);
      __atomic_store_n(&J.progress[2], J.total_bp, __ATOMIC_RELAXED);
      __atomic_store_n(&J.progress[3], J.output_bp, __ATOMIC_RELAXED);
      __atomic_store_n(&J.progress[4], J.filtered_bp, __ATOMIC_RELAXED);
      __atomic_store_n(&J.progress[5], J.out_counter, __ATOMIC_RELAXED);
    }
  }
}

constexpr int64_t kBatchRecords = 10000;  // ref: src/remote_filter.rs:727
constexpr int64_t kBatchArena = 8 << 20;

static bool append_record(FBatch* b, const Record& rec, bool is_fastq) {
  int64_t used = (int64_t)b->arena.size();
  b->meta.push_back(used);
  b->meta.push_back((int64_t)rec.id.size());
  b->arena.insert(b->arena.end(), rec.id.begin(), rec.id.end());
  used += (int64_t)rec.id.size();
  b->meta.push_back(used);
  b->meta.push_back((int64_t)rec.seq.size());
  b->arena.insert(b->arena.end(), rec.seq.begin(), rec.seq.end());
  used += (int64_t)rec.seq.size();
  if (is_fastq) {
    b->meta.push_back(used);
    b->meta.push_back((int64_t)rec.qual.size());
    b->arena.insert(b->arena.end(), rec.qual.begin(), rec.qual.end());
  } else {
    b->meta.push_back(-1);
    b->meta.push_back(0);
  }
  return (int64_t)b->arena.size() >= kBatchArena;
}

// reader thread body; mode: 0 single, 1 paired (two readers), 2 interleaved
static void filter_reader(FilterJob& J, DxReader* r1, DxReader* r2, int mode) {
  int64_t seq_no = 0;
  int64_t interleaved_count = 0;
  bool eof = false;
  while (!eof && !J.failed.load()) {
    FBatch* b = new FBatch();
    b->seq_no = seq_no;
    b->paired = mode != 0;
    b->arena.reserve(kBatchArena + 65536);
    Record rec1, rec2;
    while (b->n_units < kBatchRecords) {
      int rc = r1->parse_record(rec1);
      if (rc < 0) {
        J.fail(r1->error);
        delete b;
        return;
      }
      if (rc == 0) {
        eof = true;
        break;
      }
      if (mode == 0) {
        b->n_units++;
        if (append_record(b, rec1, r1->is_fastq == 1)) break;
      } else {
        if (mode == 2) interleaved_count++;
        DxReader* rr = mode == 1 ? r2 : r1;
        int rc2 = rr->parse_record(rec2);
        if (rc2 < 0) {
          J.fail(rr->error);
          delete b;
          return;
        }
        if (rc2 == 0) {
          if (mode == 2) {
            char msg[96];
            snprintf(msg, sizeof(msg),
                     "Uneven number of interleaved sequence pairs. Found "
                     "%lld records.",
                     (long long)interleaved_count);
            J.fail(msg);
            delete b;
            return;
          }
          // paired files: stop at the shorter input
          // (ref: src/remote_filter.rs:931-955)
          eof = true;
          break;
        }
        if (mode == 2) interleaved_count++;
        b->n_units++;
        bool full = append_record(b, rec1, r1->is_fastq == 1);
        full |= append_record(b, rec2, rr->is_fastq == 1);
        if (full) break;
      }
    }
    if (b->n_units == 0) {
      delete b;
      break;
    }
    seq_no++;
    if (!J.work.push(b)) {
      delete b;
      return;
    }
  }
  J.total_batches.store(seq_no);
  J.work.close();
  J.done_cv.notify_all();
}

}  // namespace

extern "C" {

// Run the full native filter pipeline. Returns 0 on success, -1 on error
// (message in errbuf). `progress` is int64[6]: total_seqs, filtered_seqs,
// total_bp, output_bp, filtered_bp, output_seq_counter — updated atomically
// per batch for live polling; final values are the exact run totals.
// mode: 0 single (input), 1 paired (input+input2), 2 interleaved (input).
int dx_filter_run(const char* input, const char* input2, const char* output,
                  const char* output2, int out_codec, int out_level,
                  int out2_codec, int out2_level, const uint64_t* index_keys,
                  void* probe_handle, int32_t k, int32_t w,
                  int64_t prefix_len, int64_t abs_threshold,
                  double rel_threshold, int32_t deplete, int32_t rename,
                  int32_t n_threads, int64_t* progress, char* errbuf,
                  int64_t errbuf_cap) {
  auto set_err = [&](const std::string& m) {
    if (errbuf && errbuf_cap > 0)
      snprintf(errbuf, (size_t)errbuf_cap, "%s", m.c_str());
  };
  int mode = input2 == nullptr ? 0
             : (strcmp(input, "-") == 0 && strcmp(input2, "-") == 0) ? 2
                                                                     : 1;
  DxReader* r1 = dx_open(input);
  if (!r1) {
    set_err(std::string("Failed to open ") + input);
    return -1;
  }
  DxReader* r2 = nullptr;
  if (mode == 1) {
    r2 = dx_open(input2);
    if (!r2) {
      dx_close(r1);
      set_err(std::string("Failed to open ") + input2);
      return -1;
    }
  }
  FilterJob J;
  J.keys = index_keys;
  J.probe = static_cast<ProbeTable*>(probe_handle);
  J.k = k;
  J.w = w;
  J.prefix_len = prefix_len;
  J.abs_threshold = abs_threshold;
  J.rel_threshold = rel_threshold;
  J.deplete = deplete != 0;
  J.rename = rename != 0;
  J.progress = progress;
  J.w1 = dx_writer_open(output, out_codec, out_level);
  if (!J.w1) {
    dx_close(r1);
    if (r2) dx_close(r2);
    set_err(std::string("Failed to create output file: ") + output);
    return -1;
  }
  if (output2) {
    J.w2 = dx_writer_open(output2, out2_codec, out2_level);
    if (!J.w2) {
      dx_writer_close(J.w1);
      dx_close(r1);
      if (r2) dx_close(r2);
      set_err(std::string("Failed to create output file: ") + output2);
      return -1;
    }
  }

  if (n_threads < 1) {
    int hw = (int)std::thread::hardware_concurrency();
    n_threads = hw > 0 ? hw : 1;
  }

  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; t++)
    workers.emplace_back([&J] { filter_worker(J); });
  std::thread writer_th([&J] { filter_writer(J); });
  std::thread reader_th([&] { filter_reader(J, r1, r2, mode); });

  reader_th.join();
  for (auto& th : workers) th.join();
  J.done_cv.notify_all();
  writer_th.join();

  // free any batches stranded by a failure
  for (auto& kv : J.done) delete kv.second;
  J.done.clear();

  dx_close(r1);
  if (r2) dx_close(r2);
  int rc1 = dx_writer_close(J.w1);
  int rc2 = J.w2 ? dx_writer_close(J.w2) : 0;

  if (J.failed.load()) {
    std::lock_guard<std::mutex> lk(J.err_mu);
    set_err(J.err);
    return -1;
  }
  if (rc1 != 0 || rc2 != 0) {
    set_err("native write failed while finishing output");
    return -1;
  }
  if (progress) {
    progress[0] = J.total_seqs;
    progress[1] = J.filtered_seqs;
    progress[2] = J.total_bp;
    progress[3] = J.output_bp;
    progress[4] = J.filtered_bp;
    progress[5] = J.out_counter;
  }
  return 0;
}

}  // extern "C"
