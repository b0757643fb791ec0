// zf_native — C++ host runtime for zigflac_tpu.
//
// The TPU owns the compute path (analysis, bit packing, CRC-16 of frames);
// this extension owns the serial host-side runtime around it, the pieces the
// reference implements natively in Zig:
//   * MD5 over the raw PCM byte stream (reference: src/Md5.zig — optionally
//     OpenSSL; here: a self-contained implementation)
//   * CRC-8/SMBUS + CRC-16/UMTS (reference: libFLAC/Crc16.zig + std tables)
//   * WAV byte de-interleave / sign-extension into planar int32
//     (reference: src/WavReader.zig:173-245)
//   * frame-stream assembly: slicing packed frame words + CRC footers into
//     one contiguous FLAC byte stream (replaces a per-frame Python loop)
//
// Built as a plain CPython extension (no pybind11) via native/setup.py.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

// ---------------------------------------------------------------------------
// MD5 (RFC 1321)
// ---------------------------------------------------------------------------

namespace md5impl {

struct Ctx {
  uint32_t a, b, c, d;
  uint64_t nbytes;
  uint8_t buf[64];
};

static const uint32_t K[64] = {
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee, 0xf57c0faf, 0x4787c62a,
    0xa8304613, 0xfd469501, 0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821, 0xf61e2562, 0xc040b340,
    0x265e5a51, 0xe9b6c7aa, 0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed, 0xa9e3e905, 0xfcefa3f8,
    0x676f02d9, 0x8d2a4c8a, 0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70, 0x289b7ec6, 0xeaa127fa,
    0xd4ef3085, 0x04881d05, 0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039, 0x655b59c3, 0x8f0ccc92,
    0xffeff47d, 0x85845dd1, 0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391};

static const int S[64] = {7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
                          7, 12, 17, 22, 5, 9,  14, 20, 5, 9,  14, 20,
                          5, 9,  14, 20, 5, 9,  14, 20, 4, 11, 16, 23,
                          4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
                          6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21,
                          6, 10, 15, 21};

static inline uint32_t rotl(uint32_t x, int c) {
  return (x << c) | (x >> (32 - c));
}

static void init(Ctx* c) {
  c->a = 0x67452301;
  c->b = 0xefcdab89;
  c->c = 0x98badcfe;
  c->d = 0x10325476;
  c->nbytes = 0;
}

static void block(Ctx* ctx, const uint8_t* p) {
  uint32_t m[16];
  std::memcpy(m, p, 64);  // little-endian hosts only (x86/arm64)
  uint32_t a = ctx->a, b = ctx->b, c = ctx->c, d = ctx->d;
  for (int i = 0; i < 64; i++) {
    uint32_t f;
    int g;
    if (i < 16) {
      f = (b & c) | (~b & d);
      g = i;
    } else if (i < 32) {
      f = (d & b) | (~d & c);
      g = (5 * i + 1) & 15;
    } else if (i < 48) {
      f = b ^ c ^ d;
      g = (3 * i + 5) & 15;
    } else {
      f = c ^ (b | ~d);
      g = (7 * i) & 15;
    }
    uint32_t tmp = d;
    d = c;
    c = b;
    b = b + rotl(a + f + K[i] + m[g], S[i]);
    a = tmp;
  }
  ctx->a += a;
  ctx->b += b;
  ctx->c += c;
  ctx->d += d;
}

static void update(Ctx* c, const uint8_t* data, size_t len) {
  size_t fill = c->nbytes & 63;
  c->nbytes += len;
  if (fill) {
    size_t take = 64 - fill;
    if (take > len) take = len;
    std::memcpy(c->buf + fill, data, take);
    data += take;
    len -= take;
    if (fill + take == 64) block(c, c->buf);
    else return;
  }
  while (len >= 64) {
    block(c, data);
    data += 64;
    len -= 64;
  }
  if (len) std::memcpy(c->buf, data, len);
}

static void final(Ctx* c, uint8_t out[16]) {
  uint64_t bits = c->nbytes * 8;
  uint8_t pad[72] = {0x80};
  size_t fill = c->nbytes & 63;
  size_t padlen = (fill < 56) ? 56 - fill : 120 - fill;
  update(c, pad, padlen);
  uint8_t lenb[8];
  for (int i = 0; i < 8; i++) lenb[i] = (uint8_t)(bits >> (8 * i));
  update(c, lenb, 8);
  uint32_t w[4] = {c->a, c->b, c->c, c->d};
  std::memcpy(out, w, 16);
}

}  // namespace md5impl

// ---------------------------------------------------------------------------
// CRC tables
// ---------------------------------------------------------------------------

static uint16_t crc16_table[8][256];
static uint8_t crc8_table[256];

static void init_crc_tables() {
  for (int b = 0; b < 256; b++) {
    uint16_t crc = (uint16_t)(b << 8);
    for (int i = 0; i < 8; i++)
      crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x8005) : (uint16_t)(crc << 1);
    crc16_table[0][b] = crc;
    uint8_t c8 = (uint8_t)b;
    for (int i = 0; i < 8; i++)
      c8 = (c8 & 0x80) ? (uint8_t)((c8 << 1) ^ 0x07) : (uint8_t)(c8 << 1);
    crc8_table[b] = c8;
  }
  // slice-by-8 derivation
  for (int t = 1; t < 8; t++)
    for (int b = 0; b < 256; b++) {
      uint16_t c = crc16_table[t - 1][b];
      crc16_table[t][b] =
          (uint16_t)(crc16_table[0][(c >> 8) & 0xFF] ^ (uint16_t)(c << 8));
    }
}

static inline uint16_t crc16_update(uint16_t crc, const uint8_t* p, size_t n) {
  // slice-by-8 over the non-reflected CRC-16/UMTS
  while (n >= 8) {
    uint16_t x = crc;
    crc = (uint16_t)(crc16_table[7][p[0] ^ (x >> 8)] ^
                     crc16_table[6][p[1] ^ (x & 0xFF)] ^
                     crc16_table[5][p[2]] ^ crc16_table[4][p[3]] ^
                     crc16_table[3][p[4]] ^ crc16_table[2][p[5]] ^
                     crc16_table[1][p[6]] ^ crc16_table[0][p[7]]);
    p += 8;
    n -= 8;
  }
  while (n--) crc = (uint16_t)(crc16_table[0][((crc >> 8) ^ *p++) & 0xFF] ^
                               (uint16_t)(crc << 8));
  return crc;
}

// ---------------------------------------------------------------------------
// Python bindings
// ---------------------------------------------------------------------------

static PyObject* py_md5(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  md5impl::Ctx c;
  md5impl::init(&c);
  uint8_t out[16];
  Py_BEGIN_ALLOW_THREADS
  md5impl::update(&c, (const uint8_t*)buf.buf, (size_t)buf.len);
  md5impl::final(&c, out);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  return PyBytes_FromStringAndSize((const char*)out, 16);
}

// Streaming MD5: the context travels as opaque bytes so the Python side can
// hold it without a capsule lifetime dance (Ctx is POD). Mirrors the
// reference's incremental Md5.update over streamed WAV blocks
// (src/Md5.zig + src/wav2flac.zig:64-75).
static PyObject* py_md5_init(PyObject*, PyObject*) {
  md5impl::Ctx c;
  md5impl::init(&c);
  return PyBytes_FromStringAndSize((const char*)&c, sizeof(c));
}

static PyObject* py_md5_update(PyObject*, PyObject* args) {
  Py_buffer ctxb, buf;
  if (!PyArg_ParseTuple(args, "y*y*", &ctxb, &buf)) return nullptr;
  if ((size_t)ctxb.len != sizeof(md5impl::Ctx)) {
    PyBuffer_Release(&ctxb);
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "bad md5 context size");
    return nullptr;
  }
  md5impl::Ctx c;
  memcpy(&c, ctxb.buf, sizeof(c));
  Py_BEGIN_ALLOW_THREADS
  md5impl::update(&c, (const uint8_t*)buf.buf, (size_t)buf.len);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&ctxb);
  PyBuffer_Release(&buf);
  return PyBytes_FromStringAndSize((const char*)&c, sizeof(c));
}

static PyObject* py_md5_final(PyObject*, PyObject* args) {
  Py_buffer ctxb;
  if (!PyArg_ParseTuple(args, "y*", &ctxb)) return nullptr;
  if ((size_t)ctxb.len != sizeof(md5impl::Ctx)) {
    PyBuffer_Release(&ctxb);
    PyErr_SetString(PyExc_ValueError, "bad md5 context size");
    return nullptr;
  }
  md5impl::Ctx c;
  memcpy(&c, ctxb.buf, sizeof(c));
  uint8_t out[16];
  md5impl::final(&c, out);
  PyBuffer_Release(&ctxb);
  return PyBytes_FromStringAndSize((const char*)out, 16);
}

static PyObject* py_crc16(PyObject*, PyObject* args) {
  Py_buffer buf;
  unsigned int init = 0;
  if (!PyArg_ParseTuple(args, "y*|I", &buf, &init)) return nullptr;
  uint16_t crc;
  Py_BEGIN_ALLOW_THREADS
  crc = crc16_update((uint16_t)init, (const uint8_t*)buf.buf, (size_t)buf.len);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  return PyLong_FromUnsignedLong(crc);
}

static PyObject* py_crc8(PyObject*, PyObject* args) {
  Py_buffer buf;
  unsigned int init = 0;
  if (!PyArg_ParseTuple(args, "y*|I", &buf, &init)) return nullptr;
  uint8_t crc = (uint8_t)init;
  const uint8_t* p = (const uint8_t*)buf.buf;
  for (Py_ssize_t i = 0; i < buf.len; i++) crc = crc8_table[crc ^ p[i]];
  PyBuffer_Release(&buf);
  return PyLong_FromUnsignedLong(crc);
}

// deinterleave(data, channels, bytes_per_sample, bit_depth) -> bytes (planar
// int32, [channels][n] C-order), replicating src/WavReader.zig:44-93
// semantics: little-endian bytes top-justified in i32, 1-byte samples get
// `-= 128 >> (8-depth)` before sign extension, then arithmetic shift by
// (32 - depth) unless depth == 32.
static PyObject* py_deinterleave(PyObject*, PyObject* args) {
  Py_buffer buf;
  int channels, nb, depth;
  if (!PyArg_ParseTuple(args, "y*iii", &buf, &channels, &nb, &depth))
    return nullptr;
  size_t frame = (size_t)channels * nb;
  size_t n = (size_t)buf.len / frame;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)(n * channels * 4));
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  int32_t* dst = (int32_t*)PyBytes_AS_STRING(out);
  const uint8_t* src = (const uint8_t*)buf.buf;
  const int shift = 32 - depth;
  const int32_t sub = (nb == 1) ? (int32_t)(128 >> (8 - depth)) : 0;
  Py_BEGIN_ALLOW_THREADS
  for (int ch = 0; ch < channels; ch++) {
    int32_t* d = dst + (size_t)ch * n;
    const uint8_t* s = src + (size_t)ch * nb;
    for (size_t i = 0; i < n; i++) {
      uint32_t v = 0;
      const uint8_t* q = s + i * frame;
      for (int b = 0; b < nb; b++) v |= ((uint32_t)q[b]) << (8 * (4 - nb + b));
      int32_t x = (int32_t)v;
      x -= sub;
      if (depth != 32) x >>= shift;
      d[i] = x;
    }
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  return out;
}

// assemble(words_be_bytes, stride_bytes, byte_lens_i64, crcs_u32) -> bytes
// Concatenates per-frame byte slices out of the padded word buffer and
// appends each frame's CRC-16 footer.
static PyObject* py_assemble(PyObject*, PyObject* args) {
  Py_buffer words, lens, crcs;
  Py_ssize_t stride;
  if (!PyArg_ParseTuple(args, "y*ny*y*", &words, &stride, &lens, &crcs))
    return nullptr;
  size_t nframes = (size_t)lens.len / 8;
  const int64_t* L = (const int64_t*)lens.buf;
  const uint32_t* C = (const uint32_t*)crcs.buf;
  size_t total = 0;
  for (size_t i = 0; i < nframes; i++) total += (size_t)L[i] + 2;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)total);
  if (!out) goto fail;
  {
    uint8_t* dst = (uint8_t*)PyBytes_AS_STRING(out);
    const uint8_t* src = (const uint8_t*)words.buf;
    Py_BEGIN_ALLOW_THREADS
    for (size_t i = 0; i < nframes; i++) {
      size_t len = (size_t)L[i];
      std::memcpy(dst, src + i * (size_t)stride, len);
      dst += len;
      *dst++ = (uint8_t)(C[i] >> 8);
      *dst++ = (uint8_t)(C[i] & 0xFF);
    }
    Py_END_ALLOW_THREADS
  }
  PyBuffer_Release(&words);
  PyBuffer_Release(&lens);
  PyBuffer_Release(&crcs);
  return out;
fail:
  PyBuffer_Release(&words);
  PyBuffer_Release(&lens);
  PyBuffer_Release(&crcs);
  return nullptr;
}

// assemble_ranges(stream_bytes, word_offsets_i64, byte_lens_i64) -> bytes
// Tightens a word-aligned concatenated frame stream: frame f's bytes start
// at stream[4*woff[f]] and run byte_lens[f]; drop the <=3 pad bytes between.
static PyObject* py_assemble_ranges(PyObject*, PyObject* args) {
  Py_buffer stream, offs, lens;
  if (!PyArg_ParseTuple(args, "y*y*y*", &stream, &offs, &lens)) return nullptr;
  size_t nframes = (size_t)lens.len / 8;
  const int64_t* O = (const int64_t*)offs.buf;
  const int64_t* L = (const int64_t*)lens.buf;
  size_t total = 0;
  for (size_t i = 0; i < nframes; i++) total += (size_t)L[i];
  PyObject* out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)total);
  if (!out) {
    PyBuffer_Release(&stream);
    PyBuffer_Release(&offs);
    PyBuffer_Release(&lens);
    return nullptr;
  }
  uint8_t* dst = (uint8_t*)PyBytes_AS_STRING(out);
  const uint8_t* src = (const uint8_t*)stream.buf;
  Py_BEGIN_ALLOW_THREADS
  for (size_t i = 0; i < nframes; i++) {
    std::memcpy(dst, src + 4 * (size_t)O[i], (size_t)L[i]);
    dst += (size_t)L[i];
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&stream);
  PyBuffer_Release(&offs);
  PyBuffer_Release(&lens);
  return out;
}

static PyMethodDef methods[] = {
    {"assemble_ranges", py_assemble_ranges, METH_VARARGS,
     "tighten a word-aligned frame stream into exact concatenation"},
    {"md5", py_md5, METH_VARARGS, "MD5 digest of a byte buffer"},
    {"md5_init", py_md5_init, METH_NOARGS, "new streaming MD5 context (bytes)"},
    {"md5_update", py_md5_update, METH_VARARGS,
     "md5_update(ctx, data) -> updated ctx"},
    {"md5_final", py_md5_final, METH_VARARGS, "md5_final(ctx) -> 16-byte digest"},
    {"crc16", py_crc16, METH_VARARGS, "CRC-16/UMTS (poly 0x18005, init 0)"},
    {"crc8", py_crc8, METH_VARARGS, "CRC-8/SMBUS (poly 0x07, init 0)"},
    {"deinterleave", py_deinterleave, METH_VARARGS,
     "WAV bytes -> planar int32 (reference WavReader semantics)"},
    {"assemble", py_assemble, METH_VARARGS,
     "concatenate frame slices + CRC footers into one stream"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_zf_native",
                                       "zigflac_tpu native host runtime",
                                       -1, methods};

PyMODINIT_FUNC PyInit__zf_native(void) {
  init_crc_tables();
  return PyModule_Create(&moduledef);
}
