// Native TIFF codec + tile extractor for the data loader hot path.
//
// The reference leans on tifffile's C extensions for fast decode
// (reference: pssr/data.py:566-577); this framework's equivalent is this
// small C++ library, exposed through ctypes (pssr2_tpu/data/native.py):
//
//   - tiff_probe:  tag-only scan -> (pages, height, width, dtype) without
//                  touching pixel data
//   - tiff_decode: classic TIFF, little/big endian, grayscale 1-sample,
//                  uint8/uint16/int16/float32, strip layout, compression
//                  none/PackBits/LZW, multi-page stacks
//   - tiff_encode: uncompressed little-endian pages (one per 2-D plane)
//   - extract_tiles_u8: batched sliding-window tile gather from a preloaded
//                  sheet into a contiguous output batch (the PatchLoader
//                  inner loop), parallelized over tiles
//
// Build: g++ -O3 -shared -fPIC -std=c++17 (see pssr2_tpu/data/native.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <thread>

namespace {

struct Reader {
  const uint8_t* data;
  size_t size;
  bool big_endian;
  bool bigtiff;  // BigTIFF (magic 43): 8-byte offsets/counts

  uint16_t u16(size_t off) const {
    if (off + 2 > size) return 0;
    return big_endian ? (data[off] << 8) | data[off + 1]
                      : (data[off + 1] << 8) | data[off];
  }
  uint32_t u32(size_t off) const {
    if (off + 4 > size) return 0;
    return big_endian
               ? ((uint32_t)data[off] << 24) | ((uint32_t)data[off + 1] << 16) |
                     ((uint32_t)data[off + 2] << 8) | data[off + 3]
               : ((uint32_t)data[off + 3] << 24) | ((uint32_t)data[off + 2] << 16) |
                     ((uint32_t)data[off + 1] << 8) | data[off];
  }
  uint64_t u64(size_t off) const {
    if (off + 8 > size) return 0;
    uint64_t v = 0;
    if (big_endian) {
      for (int i = 0; i < 8; i++) v = (v << 8) | data[off + i];
    } else {
      for (int i = 7; i >= 0; i--) v = (v << 8) | data[off + i];
    }
    return v;
  }
};

// sizes for TIFF types 0..18 (16..18 are the BigTIFF LONG8/SLONG8/IFD8)
constexpr int kTypeSizes[19] = {0, 1, 1, 2, 4, 8, 1, 1, 2, 4, 8, 4, 8, 4, 0, 0, 8, 8, 8};

struct Tag {
  uint16_t id;
  uint16_t type;
  uint64_t count;
  size_t value_off;  // offset of inline value or pointed data
};

struct Page {
  uint32_t width = 0, height = 0;
  uint16_t bits = 8, compression = 1, spp = 1, sample_format = 1;
  std::vector<uint64_t> strip_offsets, strip_counts;
};

bool parse_tags(const Reader& r, size_t ifd, std::vector<Tag>* tags, size_t* next) {
  if (r.bigtiff) {
    uint64_t count = r.u64(ifd);
    if (count > 1 << 16) return false;
    size_t pos = ifd + 8;
    for (uint64_t i = 0; i < count; i++) {
      Tag t;
      t.id = r.u16(pos);
      t.type = r.u16(pos + 2);
      t.count = r.u64(pos + 4);
      int tsz = t.type < 19 ? kTypeSizes[t.type] : 1;
      uint64_t bytes = (uint64_t)tsz * t.count;
      t.value_off = bytes <= 8 ? pos + 12 : (size_t)r.u64(pos + 12);
      tags->push_back(t);
      pos += 20;
    }
    *next = (size_t)r.u64(pos);
    return true;
  }
  uint16_t count = r.u16(ifd);
  size_t pos = ifd + 2;
  for (int i = 0; i < count; i++) {
    Tag t;
    t.id = r.u16(pos);
    t.type = r.u16(pos + 2);
    t.count = r.u32(pos + 4);
    int tsz = t.type < 19 ? kTypeSizes[t.type] : 1;
    size_t bytes = (size_t)tsz * t.count;
    t.value_off = bytes <= 4 ? pos + 8 : r.u32(pos + 8);
    tags->push_back(t);
    pos += 12;
  }
  *next = r.u32(pos);
  return true;
}

uint64_t tag_value(const Reader& r, const Tag& t, uint64_t idx) {
  int tsz = t.type < 19 ? kTypeSizes[t.type] : 1;
  size_t off = t.value_off + (size_t)idx * tsz;
  switch (t.type) {
    case 1: return off < r.size ? r.data[off] : 0;
    case 3: return r.u16(off);
    case 4: return r.u32(off);
    case 16:
    case 17:
    case 18: return r.u64(off);
    default: return r.u32(off);
  }
}

bool parse_page(const Reader& r, const std::vector<Tag>& tags, Page* p) {
  for (const Tag& t : tags) {
    switch (t.id) {
      case 256: p->width = (uint32_t)tag_value(r, t, 0); break;
      case 257: p->height = (uint32_t)tag_value(r, t, 0); break;
      case 258: p->bits = (uint16_t)tag_value(r, t, 0); break;
      case 259: p->compression = (uint16_t)tag_value(r, t, 0); break;
      case 277: p->spp = (uint16_t)tag_value(r, t, 0); break;
      case 339: p->sample_format = (uint16_t)tag_value(r, t, 0); break;
      case 273:
        for (uint64_t i = 0; i < t.count; i++) p->strip_offsets.push_back(tag_value(r, t, i));
        break;
      case 279:
        for (uint64_t i = 0; i < t.count; i++) p->strip_counts.push_back(tag_value(r, t, i));
        break;
    }
  }
  return p->width && p->height && !p->strip_offsets.empty();
}

// dtype codes shared with python: 0=u8 1=u16 2=i16 3=f32
int dtype_code(const Page& p) {
  if (p.sample_format == 3 && p.bits == 32) return 3;
  if (p.sample_format == 2 && p.bits == 16) return 2;
  if (p.bits == 16) return 1;
  if (p.bits == 8) return 0;
  return -1;
}

int dtype_size(int code) { return code == 0 ? 1 : code == 3 ? 4 : 2; }

// --- decompressors ------------------------------------------------------

// PackBits (compression 32773)
bool unpackbits(const uint8_t* src, size_t n, uint8_t* dst, size_t cap, size_t* written) {
  size_t i = 0, o = 0;
  while (i < n) {
    int8_t h = (int8_t)src[i++];
    if (h >= 0) {
      size_t len = (size_t)h + 1;
      if (i + len > n || o + len > cap) return false;
      memcpy(dst + o, src + i, len);
      i += len;
      o += len;
    } else if (h != -128) {
      size_t len = (size_t)(-h) + 1;
      if (i >= n || o + len > cap) return false;
      memset(dst + o, src[i++], len);
      o += len;
    }
  }
  *written = o;
  return true;
}

// TIFF LZW (compression 5, MSB-first codes, early change)
bool unlzw(const uint8_t* src, size_t n, uint8_t* dst, size_t cap, size_t* written) {
  constexpr int kClear = 256, kEoi = 257;
  std::vector<std::pair<int, uint8_t>> table;  // (prefix, last byte)
  auto reset = [&]() {
    table.clear();
    table.reserve(4096);
    for (int i = 0; i < 258; i++) table.push_back({-1, (uint8_t)i});
  };
  reset();

  size_t bitpos = 0;
  int code_width = 9;
  int prev = -1;
  size_t o = 0;
  std::vector<uint8_t> scratch;
  scratch.reserve(4096);

  auto emit = [&](int code) -> bool {
    scratch.clear();
    int c = code;
    while (c >= 0) {
      if (c >= (int)table.size()) return false;
      scratch.push_back(table[c].second);
      c = table[c].first;
    }
    if (o + scratch.size() > cap) return false;
    for (size_t k = 0; k < scratch.size(); k++) dst[o + k] = scratch[scratch.size() - 1 - k];
    o += scratch.size();
    return true;
  };
  auto first_byte = [&](int code) -> uint8_t {
    int c = code;
    while (table[c].first >= 0) c = table[c].first;
    return table[c].second;
  };

  while (bitpos + code_width <= n * 8) {
    size_t byte = bitpos >> 3;
    int shift = (int)(bitpos & 7);
    uint32_t window = 0;
    for (int k = 0; k < 4; k++) window = (window << 8) | (byte + k < n ? src[byte + k] : 0);
    int code = (int)((window >> (32 - code_width - shift)) & ((1u << code_width) - 1));
    bitpos += code_width;

    if (code == kEoi) break;
    if (code == kClear) {
      reset();
      code_width = 9;
      prev = -1;
      continue;
    }
    if (prev < 0) {
      if (!emit(code)) return false;
      prev = code;
    } else {
      if (code < (int)table.size()) {
        if (!emit(code)) return false;
        table.push_back({prev, first_byte(code)});
      } else if (code == (int)table.size()) {
        table.push_back({prev, first_byte(prev)});
        if (!emit(code)) return false;
      } else {
        return false;
      }
      prev = code;
    }
    // TIFF early change: widen one code early
    if ((int)table.size() >= (1 << code_width) - 1 && code_width < 12) code_width++;
  }
  *written = o;
  return true;
}

void byteswap16(uint8_t* buf, size_t n_elems) {
  for (size_t i = 0; i < n_elems; i++) std::swap(buf[2 * i], buf[2 * i + 1]);
}
void byteswap32(uint8_t* buf, size_t n_elems) {
  for (size_t i = 0; i < n_elems; i++) {
    std::swap(buf[4 * i], buf[4 * i + 3]);
    std::swap(buf[4 * i + 1], buf[4 * i + 2]);
  }
}

std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize(sz);
  if (fread(out.data(), 1, sz, f) != (size_t)sz) out.clear();
  fclose(f);
  return out;
}

bool open_reader(const std::vector<uint8_t>& buf, Reader* r, size_t* first_ifd) {
  if (buf.size() < 8) return false;
  bool big;
  if (buf[0] == 'I' && buf[1] == 'I') big = false;
  else if (buf[0] == 'M' && buf[1] == 'M') big = true;
  else return false;
  r->data = buf.data();
  r->size = buf.size();
  r->big_endian = big;
  uint16_t magic = r->u16(2);
  if (magic == 42) {
    r->bigtiff = false;
    *first_ifd = r->u32(4);
    return true;
  }
  if (magic == 43) {  // BigTIFF: [offsetsize=8][0][first IFD offset u64]
    if (r->u16(4) != 8 || r->u16(6) != 0) return false;
    r->bigtiff = true;
    *first_ifd = (size_t)r->u64(8);
    return true;
  }
  return false;
}

}  // namespace

extern "C" {

// -> 0 on success; shape_out = {pages, height, width}; dtype_out = code
int tiff_probe(const char* path, int64_t* shape_out, int* dtype_out) {
  std::vector<uint8_t> buf = read_file(path);
  Reader r;
  size_t ifd;
  if (!open_reader(buf, &r, &ifd)) return -1;

  int64_t pages = 0;
  Page first;
  while (ifd) {
    std::vector<Tag> tags;
    size_t next;
    if (!parse_tags(r, ifd, &tags, &next)) return -2;
    if (pages == 0 && !parse_page(r, tags, &first)) return -3;
    pages++;
    ifd = next;
    if (pages > 1 << 20) return -4;
  }
  shape_out[0] = pages;
  shape_out[1] = first.height;
  shape_out[2] = first.width;
  *dtype_out = dtype_code(first);
  return 0;
}

// Decode all pages into out (caller-allocated, pages*h*w*dtype_size bytes,
// native little-endian element order). -> 0 on success.
int tiff_decode(const char* path, uint8_t* out, int64_t out_cap) {
  std::vector<uint8_t> buf = read_file(path);
  Reader r;
  size_t ifd;
  if (!open_reader(buf, &r, &ifd)) return -1;

  size_t out_pos = 0;
  while (ifd) {
    std::vector<Tag> tags;
    size_t next;
    if (!parse_tags(r, ifd, &tags, &next)) return -2;
    Page p;
    if (!parse_page(r, tags, &p)) return -3;
    if (p.spp != 1) return -5;
    int code = dtype_code(p);
    if (code < 0) return -6;
    size_t elem = dtype_size(code);
    size_t page_bytes = (size_t)p.width * p.height * elem;
    if (out_pos + page_bytes > (size_t)out_cap) return -7;

    uint8_t* dst = out + out_pos;
    size_t written_total = 0;
    for (size_t s = 0; s < p.strip_offsets.size(); s++) {
      uint64_t off = p.strip_offsets[s];
      uint64_t cnt = s < p.strip_counts.size() ? p.strip_counts[s] : page_bytes;
      if (off + cnt > r.size) return -8;
      const uint8_t* src = r.data + off;
      size_t cap = page_bytes - written_total;
      size_t written = 0;
      bool ok;
      switch (p.compression) {
        case 1:
          written = cnt < cap ? cnt : cap;
          memcpy(dst + written_total, src, written);
          ok = true;
          break;
        case 5:
          ok = unlzw(src, cnt, dst + written_total, cap, &written);
          break;
        case 32773:
          ok = unpackbits(src, cnt, dst + written_total, cap, &written);
          break;
        default:
          return -9;
      }
      if (!ok) return -10;
      written_total += written;
    }
    if (r.big_endian && elem == 2) byteswap16(dst, page_bytes / 2);
    if (r.big_endian && elem == 4) byteswap32(dst, page_bytes / 4);
    out_pos += page_bytes;
    ifd = next;
  }
  return 0;
}

// Write uncompressed little-endian pages. dtype codes as above.
int tiff_encode(const char* path, const uint8_t* data, int64_t pages, int64_t h, int64_t w, int dtype) {
  int elem = dtype_size(dtype);
  int bits = elem * 8;
  int sample_format = dtype == 3 ? 3 : dtype == 2 ? 2 : 1;

  FILE* f = fopen(path, "wb");
  if (!f) return -1;

  const int n_entries = 10;
  const int ifd_size = 2 + n_entries * 12 + 4;
  const int64_t data_start = 8 + pages * ifd_size;
  const int64_t strip = h * w * elem;

  uint8_t header[8] = {'I', 'I', 42, 0, 8, 0, 0, 0};
  fwrite(header, 1, 8, f);

  auto w16 = [&](uint16_t v) { fwrite(&v, 2, 1, f); };
  auto w32 = [&](uint32_t v) { fwrite(&v, 4, 1, f); };
  auto entry = [&](uint16_t tag, uint16_t type, uint32_t count, uint32_t value) {
    w16(tag); w16(type); w32(count); w32(value);
  };

  for (int64_t i = 0; i < pages; i++) {
    w16(n_entries);
    entry(256, 4, 1, (uint32_t)w);
    entry(257, 4, 1, (uint32_t)h);
    entry(258, 3, 1, bits);
    entry(259, 3, 1, 1);
    entry(262, 3, 1, 1);
    entry(273, 4, 1, (uint32_t)(data_start + i * strip));
    entry(277, 3, 1, 1);
    entry(278, 4, 1, (uint32_t)h);
    entry(279, 4, 1, (uint32_t)strip);
    entry(339, 3, 1, sample_format);
    w32(i + 1 < pages ? (uint32_t)(8 + (i + 1) * ifd_size) : 0);
  }
  fwrite(data, 1, pages * strip, f);
  fclose(f);
  return 0;
}

// Gather n tiles of (frames, size, size) from a (C, H, W) uint8 sheet into
// out (n, frames, size, size); coords = n * {frame0, y0, x0}.  Parallel
// over tiles (the PatchLoader inner loop).
int extract_tiles_u8(const uint8_t* sheet, int64_t C, int64_t H, int64_t W,
                     const int64_t* coords, int64_t n, int64_t frames, int64_t size,
                     uint8_t* out) {
  for (int64_t t = 0; t < n; t++) {
    if (coords[t * 3] + frames > C || coords[t * 3 + 1] + size > H || coords[t * 3 + 2] + size > W)
      return -1;
  }
  int n_threads = (int)std::min<int64_t>(n, std::thread::hardware_concurrency());
  n_threads = n_threads > 0 ? n_threads : 1;
  auto work = [&](int tid) {
    for (int64_t t = tid; t < n; t += n_threads) {
      int64_t f0 = coords[t * 3], y0 = coords[t * 3 + 1], x0 = coords[t * 3 + 2];
      uint8_t* dst = out + t * frames * size * size;
      for (int64_t fr = 0; fr < frames; fr++) {
        const uint8_t* plane = sheet + (f0 + fr) * H * W;
        for (int64_t row = 0; row < size; row++) {
          memcpy(dst + (fr * size + row) * size, plane + (y0 + row) * W + x0, size);
        }
      }
    }
  };
  if (n_threads == 1) {
    work(0);
  } else {
    std::vector<std::thread> threads;
    for (int i = 0; i < n_threads; i++) threads.emplace_back(work, i);
    for (auto& th : threads) th.join();
  }
  return 0;
}

}  // extern "C"
