// LASzip-compatible LAZ codec (pointwise chunked, item versions 2).
//
// TPU-native replacement for the PDAL/LASzip dependency the reference uses
// for compressed LiDAR input (reference myria3d/pctl/dataset/utils.py:76-93
// `get_pdal_reader`; production CI globs *.laz). Implements the published
// LASzip format (laszip.org specification / "LASzip: lossless compression of
// LiDAR data"): the Said/FastAC-style arithmetic coder, the k-bit corrector
// IntegerCompressor, streaming-median-of-5 coordinate prediction, and the
// POINT10 / GPSTIME11 / RGB12 / BYTE item codecs at version 2 — both
// directions, plus the chunked container and compressed chunk table.
//
// Exposed as a small C ABI driven from Python ctypes (pctl/io/las.py).

#include <cstdint>
#include <cstring>
#include <vector>

typedef uint8_t U8;
typedef uint16_t U16;
typedef uint32_t U32;
typedef uint64_t U64;
typedef int8_t I8;
typedef int16_t I16;
typedef int32_t I32;
typedef int64_t I64;

// ---------------------------------------------------------------------------
// Arithmetic coder (FastAC variant as specified for LASzip)
// ---------------------------------------------------------------------------

static const U32 AC_MIN_LENGTH = 0x01000000u;
static const U32 AC_MAX_LENGTH = 0xFFFFFFFFu;
static const U32 BM_LENGTH_SHIFT = 13;
static const U32 BM_MAX_COUNT = 1u << BM_LENGTH_SHIFT;
static const U32 DM_LENGTH_SHIFT = 15;
static const U32 DM_MAX_COUNT = 1u << DM_LENGTH_SHIFT;

struct BitModel {
  U32 bit_0_count, bit_count, bit_0_prob, update_cycle, bits_until_update;
  BitModel() { init(); }
  void init() {
    bit_0_count = 1;
    bit_count = 2;
    bit_0_prob = 1u << (BM_LENGTH_SHIFT - 1);
    update_cycle = bits_until_update = 4;
  }
  void update() {
    if ((bit_count += update_cycle) > BM_MAX_COUNT) {
      bit_count = (bit_count + 1) >> 1;
      bit_0_count = (bit_0_count + 1) >> 1;
      if (bit_0_count == bit_count) ++bit_count;
    }
    bit_0_prob = (bit_0_count << BM_LENGTH_SHIFT) / bit_count;
    update_cycle = (5 * update_cycle) >> 2;
    if (update_cycle > 64) update_cycle = 64;
    bits_until_update = update_cycle;
  }
};

struct SymbolModel {
  U32 symbols = 0;
  bool for_encoder = false;
  std::vector<U32> distribution, symbol_count, decoder_table;
  U32 total_count = 0, update_cycle = 0, symbols_until_update = 0;
  U32 table_size = 0, table_shift = 0, last_symbol = 0;

  void create(U32 n, bool encoder) {
    symbols = n;
    for_encoder = encoder;
    last_symbol = n - 1;
    if (!encoder && symbols > 16) {
      U32 table_bits = 3;
      while (symbols > (1u << (table_bits + 2))) ++table_bits;
      table_size = 1u << table_bits;
      table_shift = DM_LENGTH_SHIFT - table_bits;
      decoder_table.assign(table_size + 2, 0);
    } else {
      table_size = table_shift = 0;
      decoder_table.clear();
    }
    distribution.assign(symbols, 0);
    symbol_count.assign(symbols, 0);
    init();
  }
  void init() {
    total_count = 0;
    update_cycle = symbols;
    for (U32 n = 0; n < symbols; ++n) symbol_count[n] = 1;
    update();
    symbols_until_update = update_cycle = (symbols + 6) >> 1;
  }
  void update() {
    if ((total_count += update_cycle) > DM_MAX_COUNT) {
      total_count = 0;
      for (U32 n = 0; n < symbols; ++n)
        total_count += (symbol_count[n] = (symbol_count[n] + 1) >> 1);
    }
    U32 sum = 0, s = 0;
    U32 scale = 0x80000000u / total_count;
    if (for_encoder || table_size == 0) {
      for (U32 k = 0; k < symbols; ++k) {
        distribution[k] = (scale * sum) >> (31 - DM_LENGTH_SHIFT);
        sum += symbol_count[k];
      }
    } else {
      for (U32 k = 0; k < symbols; ++k) {
        distribution[k] = (scale * sum) >> (31 - DM_LENGTH_SHIFT);
        sum += symbol_count[k];
        U32 w = distribution[k] >> table_shift;
        while (s < w) decoder_table[++s] = k - 1;
      }
      decoder_table[0] = 0;
      while (s <= table_size) decoder_table[++s] = symbols - 1;
    }
    update_cycle = (5 * update_cycle) >> 2;
    U32 max_cycle = (symbols + 6) << 3;
    if (update_cycle > max_cycle) update_cycle = max_cycle;
    symbols_until_update = update_cycle;
  }
};

struct Encoder {
  std::vector<U8>* out = nullptr;
  size_t start = 0;
  U32 base = 0, length = AC_MAX_LENGTH;

  void init(std::vector<U8>* o) {
    out = o;
    start = o->size();
    base = 0;
    length = AC_MAX_LENGTH;
  }
  void propagate_carry() {
    size_t p = out->size();
    while (p > start && (*out)[p - 1] == 0xFF) {
      (*out)[p - 1] = 0;
      --p;
    }
    if (p > start) ++(*out)[p - 1];
  }
  void renorm() {
    while (length < AC_MIN_LENGTH) {
      out->push_back((U8)(base >> 24));
      base <<= 8;
      length <<= 8;
    }
  }
  void encodeBit(BitModel& m, U32 bit) {
    U32 x = m.bit_0_prob * (length >> BM_LENGTH_SHIFT);
    if (!bit) {
      length = x;
      ++m.bit_0_count;
    } else {
      U32 init_base = base;
      base += x;
      length -= x;
      if (init_base > base) propagate_carry();
    }
    if (length < AC_MIN_LENGTH) renorm();
    if (--m.bits_until_update == 0) m.update();
  }
  void encodeSymbol(SymbolModel& m, U32 sym) {
    U32 x, init_base = base;
    if (sym == m.last_symbol) {
      x = m.distribution[sym] * (length >> DM_LENGTH_SHIFT);
      base += x;
      length -= x;
    } else {
      x = m.distribution[sym] * (length >>= DM_LENGTH_SHIFT);
      base += x;
      length = m.distribution[sym + 1] * length - x;
    }
    if (init_base > base) propagate_carry();
    if (length < AC_MIN_LENGTH) renorm();
    ++m.symbol_count[sym];
    if (--m.symbols_until_update == 0) m.update();
  }
  void writeShort(U32 sym) {
    U32 init_base = base;
    base += sym * (length >>= 16);
    if (init_base > base) propagate_carry();
    if (length < AC_MIN_LENGTH) renorm();
  }
  void writeBits(U32 bits, U32 sym) {
    if (bits > 19) {
      writeShort(sym & 0xFFFF);
      sym >>= 16;
      bits -= 16;
    }
    U32 init_base = base;
    base += sym * (length >>= bits);
    if (init_base > base) propagate_carry();
    if (length < AC_MIN_LENGTH) renorm();
  }
  void writeInt(U32 sym) { writeBits(32, sym); }
  void done() {
    U32 init_base = base;
    if (length > 2 * AC_MIN_LENGTH) {
      base += AC_MIN_LENGTH;
      length = AC_MIN_LENGTH >> 1;
    } else {
      base += AC_MIN_LENGTH >> 1;
      length = AC_MIN_LENGTH >> 9;
    }
    if (init_base > base) propagate_carry();
    renorm();
  }
};

struct Decoder {
  const U8* p = nullptr;
  const U8* end = nullptr;
  U32 value = 0, length = 0;

  U8 getByte() { return (p < end) ? *p++ : 0; }
  void init(const U8* data, const U8* data_end) {
    p = data;
    end = data_end;
    value = ((U32)getByte() << 24) | ((U32)getByte() << 16) |
            ((U32)getByte() << 8) | (U32)getByte();
    length = AC_MAX_LENGTH;
  }
  void renorm() {
    while (length < AC_MIN_LENGTH) {
      value = (value << 8) | getByte();
      length <<= 8;
    }
  }
  U32 decodeBit(BitModel& m) {
    U32 x = m.bit_0_prob * (length >> BM_LENGTH_SHIFT);
    U32 sym = (value >= x);
    if (!sym) {
      length = x;
      ++m.bit_0_count;
    } else {
      value -= x;
      length -= x;
    }
    if (length < AC_MIN_LENGTH) renorm();
    if (--m.bits_until_update == 0) m.update();
    return sym;
  }
  U32 decodeSymbol(SymbolModel& m) {
    U32 n, sym, x, y = length;
    if (!m.decoder_table.empty()) {
      U32 dv = value / (length >>= DM_LENGTH_SHIFT);
      U32 t = dv >> m.table_shift;
      sym = m.decoder_table[t];
      n = m.decoder_table[t + 1] + 1;
      while (n > sym + 1) {
        U32 k = (sym + n) >> 1;
        if (m.distribution[k] > dv)
          n = k;
        else
          sym = k;
      }
      x = m.distribution[sym] * length;
      if (sym != m.last_symbol) y = m.distribution[sym + 1] * length;
    } else {
      x = sym = 0;
      length >>= DM_LENGTH_SHIFT;
      U32 k = (n = m.symbols) >> 1;
      do {
        U32 z = length * m.distribution[k];
        if (z > value) {
          n = k;
          y = z;
        } else {
          sym = k;
          x = z;
        }
      } while ((k = (sym + n) >> 1) != sym);
    }
    value -= x;
    length = y - x;
    if (length < AC_MIN_LENGTH) renorm();
    ++m.symbol_count[sym];
    if (--m.symbols_until_update == 0) m.update();
    return sym;
  }
  U32 readShort() {
    U32 sym = value / (length >>= 16);
    value -= length * sym;
    if (length < AC_MIN_LENGTH) renorm();
    return sym;
  }
  U32 readBits(U32 bits) {
    if (bits > 19) {
      U32 lo = readShort();
      U32 hi = readBits(bits - 16) << 16;
      return hi | lo;
    }
    U32 sym = value / (length >>= bits);
    value -= length * sym;
    if (length < AC_MIN_LENGTH) renorm();
    return sym;
  }
  U32 readInt() { return readBits(32); }
};

// ---------------------------------------------------------------------------
// IntegerCompressor (k-bit corrector coding)
// ---------------------------------------------------------------------------

struct IntegerCompressor {
  U32 bits = 32, contexts = 1, bits_high = 8;
  U32 corr_bits = 32, corr_range = 0;
  I32 corr_min = (I32)0x80000000, corr_max = 0x7FFFFFFF;
  U32 k = 0;
  std::vector<SymbolModel> mBits;        // contexts models of corr_bits+1 syms
  BitModel mCorrector0;
  std::vector<SymbolModel> mCorrector;   // [1..corr_bits]

  void setup(U32 bits_, U32 contexts_, U32 bits_high_ = 8) {
    bits = bits_;
    contexts = contexts_;
    bits_high = bits_high_;
    if (bits && bits < 32) {
      corr_bits = bits;
      corr_range = 1u << bits;
      corr_min = -(I32)(corr_range / 2);
      corr_max = corr_min + (I32)corr_range - 1;
    } else {
      corr_bits = 32;
      corr_range = 0;
      corr_min = (I32)0x80000000;
      corr_max = 0x7FFFFFFF;
    }
    k = 0;
  }
  void init(bool encoder) {
    mBits.resize(contexts);
    for (U32 c = 0; c < contexts; ++c) mBits[c].create(corr_bits + 1, encoder);
    mCorrector0.init();
    mCorrector.resize(corr_bits + 1);
    for (U32 i = 1; i <= corr_bits; ++i)
      mCorrector[i].create(i <= bits_high ? (1u << i) : (1u << bits_high),
                           encoder);
  }

  void writeCorrector(Encoder& enc, I32 c, SymbolModel& model) {
    // find the tightest interval [-(2^k - 1), +2^k] containing c
    U32 c1 = (U32)(c <= 0 ? -c : c - 1);
    k = 0;
    while (c1) {
      c1 >>= 1;
      ++k;
    }
    enc.encodeSymbol(model, k);
    if (k) {
      if (k < 32) {
        // map c into [0, 2^k - 1]: negatives to the low half
        if (c >= 0)
          c -= 1;                      // [2^(k-1), 2^k - 1]
        else
          c += (I32)((1u << k) - 1);   // [0, 2^(k-1) - 1]
        if (k <= bits_high) {
          enc.encodeSymbol(mCorrector[k], (U32)c);
        } else {
          U32 k1 = k - bits_high;
          U32 lo = (U32)c & ((1u << k1) - 1);
          enc.encodeSymbol(mCorrector[k], (U32)c >> k1);
          enc.writeBits(k1, lo);
        }
      }
      // k == 32: c must be corr_min — the symbol alone encodes it
    } else {
      enc.encodeBit(mCorrector0, (U32)c);  // c is 0 or 1
    }
  }
  I32 readCorrector(Decoder& dec, SymbolModel& model) {
    I32 c;
    k = dec.decodeSymbol(model);
    if (k) {
      if (k < 32) {
        if (k <= bits_high) {
          c = (I32)dec.decodeSymbol(mCorrector[k]);
        } else {
          U32 k1 = k - bits_high;
          U32 hi = dec.decodeSymbol(mCorrector[k]);
          U32 lo = dec.readBits(k1);
          c = (I32)((hi << k1) | lo);
        }
        if (c >= (I32)(1u << (k - 1)))
          c += 1;                          // positive half
        else
          c -= (I32)((1u << k) - 1);       // negative half
      } else {
        c = corr_min;
      }
    } else {
      c = (I32)dec.decodeBit(mCorrector0);
    }
    return c;
  }

  void compress(Encoder& enc, I32 pred, I32 real, U32 context = 0) {
    I32 corr = real - pred;
    if (corr_range) {
      if (corr < corr_min)
        corr += (I32)corr_range;
      else if (corr > corr_max)
        corr -= (I32)corr_range;
    }
    writeCorrector(enc, corr, mBits[context]);
  }
  I32 decompress(Decoder& dec, I32 pred, U32 context = 0) {
    I32 real = pred + readCorrector(dec, mBits[context]);
    if (corr_range) {
      if (real < corr_min)
        real += (I32)corr_range;
      else if (real > corr_max)
        real -= (I32)corr_range;
    }
    return real;
  }
  U32 getK() const { return k; }
};

// ---------------------------------------------------------------------------
// Streaming median of five (coordinate-difference predictor)
// ---------------------------------------------------------------------------

struct StreamingMedian5 {
  I32 v[5];
  bool high;
  void init() {
    v[0] = v[1] = v[2] = v[3] = v[4] = 0;
    high = true;
  }
  void add(I32 x) {
    if (high) {
      if (x < v[2]) {
        v[4] = v[3];
        v[3] = v[2];
        if (x < v[0]) {
          v[2] = v[1];
          v[1] = v[0];
          v[0] = x;
        } else if (x < v[1]) {
          v[2] = v[1];
          v[1] = x;
        } else {
          v[2] = x;
        }
      } else {
        if (x < v[3]) {
          v[4] = v[3];
          v[3] = x;
        } else {
          v[4] = x;
        }
        high = false;
      }
    } else {
      if (v[2] < x) {
        v[0] = v[1];
        v[1] = v[2];
        if (v[4] < x) {
          v[2] = v[3];
          v[3] = v[4];
          v[4] = x;
        } else if (v[3] < x) {
          v[2] = v[3];
          v[3] = x;
        } else {
          v[2] = x;
        }
      } else {
        if (v[1] < x) {
          v[0] = v[1];
          v[1] = x;
        } else {
          v[0] = x;
        }
        high = true;
      }
    }
  }
  I32 get() const { return v[2]; }
};

// ---------------------------------------------------------------------------
// Shared helpers
// ---------------------------------------------------------------------------

static inline U8 u8_fold(I32 n) { return (U8)(n & 0xFF); }
static inline U8 u8_clamp(I32 n) {
  return (U8)(n < 0 ? 0 : (n > 255 ? 255 : n));
}
static inline I32 rd_i32(const U8* p) {
  I32 v;
  std::memcpy(&v, p, 4);
  return v;
}
static inline void wr_i32(U8* p, I32 v) { std::memcpy(p, &v, 4); }
static inline U16 rd_u16(const U8* p) {
  U16 v;
  std::memcpy(&v, p, 2);
  return v;
}
static inline void wr_u16(U8* p, U16 v) { std::memcpy(p, &v, 2); }
static inline U64 rd_u64(const U8* p) {
  U64 v;
  std::memcpy(&v, p, 8);
  return v;
}
static inline void wr_u64(U8* p, U64 v) { std::memcpy(p, &v, 8); }

static const U8 NUMBER_RETURN_MAP[8][8] = {
    {15, 14, 13, 12, 11, 10, 9, 8},  {14, 0, 1, 3, 6, 10, 10, 9},
    {13, 1, 2, 4, 7, 11, 11, 10},    {12, 3, 4, 5, 8, 12, 12, 11},
    {11, 6, 7, 8, 9, 13, 13, 12},    {10, 10, 11, 12, 13, 14, 14, 13},
    {9, 10, 11, 12, 13, 14, 15, 14}, {8, 9, 10, 11, 12, 13, 14, 15}};

static const U8 NUMBER_RETURN_LEVEL[8][8] = {
    {0, 1, 2, 3, 4, 5, 6, 7}, {1, 0, 1, 2, 3, 4, 5, 6},
    {2, 1, 0, 1, 2, 3, 4, 5}, {3, 2, 1, 0, 1, 2, 3, 4},
    {4, 3, 2, 1, 0, 1, 2, 3}, {5, 4, 3, 2, 1, 0, 1, 2},
    {6, 5, 4, 3, 2, 1, 0, 1}, {7, 6, 5, 4, 3, 2, 1, 0}};

// ---------------------------------------------------------------------------
// Item codecs (version 2)
// ---------------------------------------------------------------------------

struct ItemCodec {
  virtual ~ItemCodec() {}
  virtual void init_item(const U8* first, bool encoder) = 0;
  virtual void read(Decoder& dec, U8* item) = 0;
  virtual void write(Encoder& enc, const U8* item) = 0;
  virtual U32 size() const = 0;
};

// ---- POINT10 v2 (20 bytes) ----
// layout: x i32 @0, y i32 @4, z i32 @8, intensity u16 @12, bit_byte u8 @14
// (ret 0-2, #ret 3-5, dir 6, edge 7), classification @15, scan_angle i8 @16,
// user_data @17, point_source_id u16 @18.
struct Point10v2 : ItemCodec {
  SymbolModel m_changed_values;
  IntegerCompressor ic_intensity, ic_point_source_id, ic_dx, ic_dy, ic_z;
  SymbolModel m_scan_angle_rank[2];
  SymbolModel m_bit_byte[256], m_classification[256], m_user_data[256];
  bool bit_byte_init[256], classification_init[256], user_data_init[256];
  bool encoder_side = false;

  U8 last_item[20];
  U16 last_intensity[16];
  StreamingMedian5 last_x_diff_median5[16], last_y_diff_median5[16];
  I32 last_height[8];

  U32 size() const override { return 20; }

  void init_item(const U8* first, bool encoder) override {
    encoder_side = encoder;
    m_changed_values.create(64, encoder);
    ic_intensity.setup(16, 4);
    ic_intensity.init(encoder);
    m_scan_angle_rank[0].create(256, encoder);
    m_scan_angle_rank[1].create(256, encoder);
    ic_point_source_id.setup(16, 1);
    ic_point_source_id.init(encoder);
    for (int i = 0; i < 256; ++i)
      bit_byte_init[i] = classification_init[i] = user_data_init[i] = false;
    ic_dx.setup(32, 2);
    ic_dx.init(encoder);
    ic_dy.setup(32, 22);
    ic_dy.init(encoder);
    ic_z.setup(32, 20);
    ic_z.init(encoder);
    for (int i = 0; i < 16; ++i) {
      last_x_diff_median5[i].init();
      last_y_diff_median5[i].init();
      last_intensity[i] = 0;
    }
    for (int i = 0; i < 8; ++i) last_height[i] = 0;
    std::memcpy(last_item, first, 20);
    last_item[12] = 0;  // spec: last intensity starts at zero
    last_item[13] = 0;
  }

  SymbolModel& lazy(SymbolModel* arr, bool* flags, U8 idx) {
    if (!flags[idx]) {
      arr[idx].create(256, encoder_side);
      flags[idx] = true;
    }
    return arr[idx];
  }

  void read(Decoder& dec, U8* item) override {
    U32 r, n, m, l, k_bits;
    I32 median, diff;
    U32 changed_values = dec.decodeSymbol(m_changed_values);
    if (changed_values) {
      if (changed_values & 32)
        last_item[14] =
            (U8)dec.decodeSymbol(lazy(m_bit_byte, bit_byte_init, last_item[14]));
      r = last_item[14] & 0x07;
      n = (last_item[14] >> 3) & 0x07;
      m = NUMBER_RETURN_MAP[n][r];
      l = NUMBER_RETURN_LEVEL[n][r];
      if (changed_values & 16) {
        U16 intensity = (U16)ic_intensity.decompress(
            dec, last_intensity[m], (m < 3 ? m : 3));
        wr_u16(last_item + 12, intensity);
        last_intensity[m] = intensity;
      } else {
        wr_u16(last_item + 12, last_intensity[m]);
      }
      if (changed_values & 8)
        last_item[15] = (U8)dec.decodeSymbol(
            lazy(m_classification, classification_init, last_item[15]));
      if (changed_values & 4) {
        U32 val = dec.decodeSymbol(m_scan_angle_rank[(last_item[14] >> 6) & 1]);
        last_item[16] = u8_fold((I32)val + (I32)last_item[16]);
      }
      if (changed_values & 2)
        last_item[17] =
            (U8)dec.decodeSymbol(lazy(m_user_data, user_data_init, last_item[17]));
      if (changed_values & 1) {
        U16 psid = (U16)ic_point_source_id.decompress(
            dec, (I32)rd_u16(last_item + 18), 0);
        wr_u16(last_item + 18, psid);
      }
    } else {
      r = last_item[14] & 0x07;
      n = (last_item[14] >> 3) & 0x07;
      m = NUMBER_RETURN_MAP[n][r];
      l = NUMBER_RETURN_LEVEL[n][r];
      wr_u16(last_item + 12, last_intensity[m]);
    }
    // x
    median = last_x_diff_median5[m].get();
    diff = ic_dx.decompress(dec, median, n == 1);
    wr_i32(last_item + 0, rd_i32(last_item + 0) + diff);
    last_x_diff_median5[m].add(diff);
    // y
    median = last_y_diff_median5[m].get();
    k_bits = ic_dx.getK();
    diff = ic_dy.decompress(
        dec, median, (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20));
    wr_i32(last_item + 4, rd_i32(last_item + 4) + diff);
    last_y_diff_median5[m].add(diff);
    // z
    k_bits = (ic_dx.getK() + ic_dy.getK()) / 2;
    I32 z = ic_z.decompress(dec, last_height[l],
                            (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18));
    wr_i32(last_item + 8, z);
    last_height[l] = z;
    std::memcpy(item, last_item, 20);
  }

  void write(Encoder& enc, const U8* item) override {
    U32 r = item[14] & 0x07;
    U32 n = (item[14] >> 3) & 0x07;
    U32 m = NUMBER_RETURN_MAP[n][r];
    U32 l = NUMBER_RETURN_LEVEL[n][r];
    U16 intensity = rd_u16(item + 12);
    U32 changed_values =
        (((U32)(last_item[14] != item[14])) << 5) |
        (((U32)(last_intensity[m] != intensity)) << 4) |
        (((U32)(last_item[15] != item[15])) << 3) |
        (((U32)(last_item[16] != item[16])) << 2) |
        (((U32)(last_item[17] != item[17])) << 1) |
        ((U32)(rd_u16(last_item + 18) != rd_u16(item + 18)));
    enc.encodeSymbol(m_changed_values, changed_values);
    if (changed_values & 32)
      enc.encodeSymbol(lazy(m_bit_byte, bit_byte_init, last_item[14]), item[14]);
    if (changed_values & 16) {
      ic_intensity.compress(enc, last_intensity[m], intensity, (m < 3 ? m : 3));
      last_intensity[m] = intensity;
    }
    if (changed_values & 8)
      enc.encodeSymbol(lazy(m_classification, classification_init, last_item[15]),
                       item[15]);
    if (changed_values & 4)
      enc.encodeSymbol(m_scan_angle_rank[(item[14] >> 6) & 1],
                       u8_fold((I32)item[16] - (I32)last_item[16]));
    if (changed_values & 2)
      enc.encodeSymbol(lazy(m_user_data, user_data_init, last_item[17]),
                       item[17]);
    if (changed_values & 1)
      ic_point_source_id.compress(enc, (I32)rd_u16(last_item + 18),
                                  (I32)rd_u16(item + 18), 0);
    // x
    I32 median = last_x_diff_median5[m].get();
    I32 diff = rd_i32(item + 0) - rd_i32(last_item + 0);
    ic_dx.compress(enc, median, diff, n == 1);
    last_x_diff_median5[m].add(diff);
    // y
    median = last_y_diff_median5[m].get();
    U32 k_bits = ic_dx.getK();
    diff = rd_i32(item + 4) - rd_i32(last_item + 4);
    ic_dy.compress(enc, median, diff,
                   (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20));
    last_y_diff_median5[m].add(diff);
    // z
    k_bits = (ic_dx.getK() + ic_dy.getK()) / 2;
    ic_z.compress(enc, last_height[l], rd_i32(item + 8),
                  (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18));
    last_height[l] = rd_i32(item + 8);
    std::memcpy(last_item, item, 20);
  }
};

// ---- GPSTIME11 v2 (8 bytes, an f64 treated as i64) ----
static const I32 GPSTIME_MULTI = 500;
static const I32 GPSTIME_MULTI_MINUS = -10;
static const I32 GPSTIME_MULTI_UNCHANGED =
    GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 1;  // 511
static const I32 GPSTIME_MULTI_CODE_FULL =
    GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 2;  // 512
static const I32 GPSTIME_MULTI_TOTAL =
    GPSTIME_MULTI - GPSTIME_MULTI_MINUS + 6;  // 516

struct Gpstime11v2 : ItemCodec {
  SymbolModel m_gpstime_multi, m_gpstime_0diff;
  IntegerCompressor ic_gpstime;
  U32 last = 0, next = 0;
  U64 last_gpstime[4];
  I32 last_gpstime_diff[4];
  I32 multi_extreme_counter[4];

  U32 size() const override { return 8; }

  void init_item(const U8* first, bool encoder) override {
    m_gpstime_multi.create(GPSTIME_MULTI_TOTAL, encoder);
    m_gpstime_0diff.create(6, encoder);
    ic_gpstime.setup(32, 9);
    ic_gpstime.init(encoder);
    last = next = 0;
    for (int i = 0; i < 4; ++i) {
      last_gpstime[i] = 0;
      last_gpstime_diff[i] = 0;
      multi_extreme_counter[i] = 0;
    }
    last_gpstime[0] = rd_u64(first);
  }

  void read(Decoder& dec, U8* item) override {
    I32 multi;
    if (last_gpstime_diff[last] == 0) {
      multi = (I32)dec.decodeSymbol(m_gpstime_0diff);
      if (multi == 1) {  // difference fits in 32 bits
        last_gpstime_diff[last] = ic_gpstime.decompress(dec, 0, 0);
        last_gpstime[last] =
            (U64)((I64)last_gpstime[last] + last_gpstime_diff[last]);
        multi_extreme_counter[last] = 0;
      } else if (multi == 2) {  // huge difference: new sequence
        next = (next + 1) & 3;
        U64 hi = (U64)(U32)ic_gpstime.decompress(
            dec, (I32)(last_gpstime[last] >> 32), 8);
        last_gpstime[next] = (hi << 32) | (U64)dec.readInt();
        last = next;
        last_gpstime_diff[last] = 0;
        multi_extreme_counter[last] = 0;
      } else if (multi > 2) {  // switch to another sequence
        last = (last + (U32)multi - 2) & 3;
        read(dec, item);
        return;
      }
    } else {
      multi = (I32)dec.decodeSymbol(m_gpstime_multi);
      if (multi == 1) {
        last_gpstime[last] = (U64)((I64)last_gpstime[last] +
                                   ic_gpstime.decompress(
                                       dec, last_gpstime_diff[last], 1));
        multi_extreme_counter[last] = 0;
      } else if (multi < GPSTIME_MULTI_UNCHANGED) {
        I32 gpstime_diff;
        if (multi == 0) {
          gpstime_diff = ic_gpstime.decompress(dec, 0, 7);
          multi_extreme_counter[last]++;
          if (multi_extreme_counter[last] > 3) {
            last_gpstime_diff[last] = gpstime_diff;
            multi_extreme_counter[last] = 0;
          }
        } else if (multi < GPSTIME_MULTI) {
          gpstime_diff = ic_gpstime.decompress(
              dec, multi * last_gpstime_diff[last], (multi < 10) ? 2 : 3);
        } else if (multi == GPSTIME_MULTI) {
          gpstime_diff = ic_gpstime.decompress(
              dec, GPSTIME_MULTI * last_gpstime_diff[last], 4);
          multi_extreme_counter[last]++;
          if (multi_extreme_counter[last] > 3) {
            last_gpstime_diff[last] = gpstime_diff;
            multi_extreme_counter[last] = 0;
          }
        } else {  // negative multipliers
          multi = GPSTIME_MULTI - multi;
          if (multi > GPSTIME_MULTI_MINUS) {
            gpstime_diff = ic_gpstime.decompress(
                dec, multi * last_gpstime_diff[last], 5);
          } else {
            gpstime_diff = ic_gpstime.decompress(
                dec, GPSTIME_MULTI_MINUS * last_gpstime_diff[last], 6);
            multi_extreme_counter[last]++;
            if (multi_extreme_counter[last] > 3) {
              last_gpstime_diff[last] = gpstime_diff;
              multi_extreme_counter[last] = 0;
            }
          }
        }
        last_gpstime[last] = (U64)((I64)last_gpstime[last] + gpstime_diff);
      } else if (multi == GPSTIME_MULTI_CODE_FULL) {
        next = (next + 1) & 3;
        U64 hi = (U64)(U32)ic_gpstime.decompress(
            dec, (I32)(last_gpstime[last] >> 32), 8);
        last_gpstime[next] = (hi << 32) | (U64)dec.readInt();
        last = next;
        last_gpstime_diff[last] = 0;
        multi_extreme_counter[last] = 0;
      } else if (multi > GPSTIME_MULTI_CODE_FULL) {
        last = (last + (U32)multi - GPSTIME_MULTI_CODE_FULL) & 3;
        read(dec, item);
        return;
      }
      // multi == GPSTIME_MULTI_UNCHANGED: value repeats, nothing to do
    }
    wr_u64(item, last_gpstime[last]);
  }

  void write(Encoder& enc, const U8* item) override {
    U64 this_gpstime = rd_u64(item);
    if (last_gpstime_diff[last] == 0) {
      if (this_gpstime == last_gpstime[last]) {
        enc.encodeSymbol(m_gpstime_0diff, 0);
        return;
      }
      I64 diff64 = (I64)this_gpstime - (I64)last_gpstime[last];
      I32 diff = (I32)diff64;
      if (diff64 == (I64)diff) {
        enc.encodeSymbol(m_gpstime_0diff, 1);
        ic_gpstime.compress(enc, 0, diff, 0);
        last_gpstime_diff[last] = diff;
        multi_extreme_counter[last] = 0;
      } else {
        // maybe it belongs to another sequence
        for (U32 i = 1; i < 4; ++i) {
          I64 other64 =
              (I64)this_gpstime - (I64)last_gpstime[(last + i) & 3];
          if (other64 == (I64)(I32)other64) {
            enc.encodeSymbol(m_gpstime_0diff, i + 2);
            last = (last + i) & 3;
            write(enc, item);
            return;
          }
        }
        enc.encodeSymbol(m_gpstime_0diff, 2);
        ic_gpstime.compress(enc, (I32)(last_gpstime[last] >> 32),
                            (I32)(this_gpstime >> 32), 8);
        enc.writeInt((U32)this_gpstime);
        next = (next + 1) & 3;
        last = next;
        last_gpstime_diff[last] = 0;
        multi_extreme_counter[last] = 0;
      }
      last_gpstime[last] = this_gpstime;
    } else {
      if (this_gpstime == last_gpstime[last]) {
        enc.encodeSymbol(m_gpstime_multi, GPSTIME_MULTI_UNCHANGED);
        return;
      }
      I64 diff64 = (I64)this_gpstime - (I64)last_gpstime[last];
      I32 diff = (I32)diff64;
      if (diff64 == (I64)diff) {
        double multi_f = (double)diff / (double)last_gpstime_diff[last];
        I32 multi = (I32)(multi_f >= 0 ? multi_f + 0.5 : multi_f - 0.5);
        if (multi == 1) {
          enc.encodeSymbol(m_gpstime_multi, 1);
          ic_gpstime.compress(enc, last_gpstime_diff[last], diff, 1);
          multi_extreme_counter[last] = 0;
        } else if (multi > 0) {
          if (multi < GPSTIME_MULTI) {
            enc.encodeSymbol(m_gpstime_multi, (U32)multi);
            ic_gpstime.compress(enc, multi * last_gpstime_diff[last], diff,
                                (multi < 10) ? 2 : 3);
          } else {
            enc.encodeSymbol(m_gpstime_multi, GPSTIME_MULTI);
            ic_gpstime.compress(enc, GPSTIME_MULTI * last_gpstime_diff[last],
                                diff, 4);
            multi_extreme_counter[last]++;
            if (multi_extreme_counter[last] > 3) {
              last_gpstime_diff[last] = diff;
              multi_extreme_counter[last] = 0;
            }
          }
        } else if (multi < 0) {
          if (multi > GPSTIME_MULTI_MINUS) {
            enc.encodeSymbol(m_gpstime_multi, (U32)(GPSTIME_MULTI - multi));
            ic_gpstime.compress(enc, multi * last_gpstime_diff[last], diff, 5);
          } else {
            enc.encodeSymbol(
                m_gpstime_multi,
                (U32)(GPSTIME_MULTI - GPSTIME_MULTI_MINUS));
            ic_gpstime.compress(
                enc, GPSTIME_MULTI_MINUS * last_gpstime_diff[last], diff, 6);
            multi_extreme_counter[last]++;
            if (multi_extreme_counter[last] > 3) {
              last_gpstime_diff[last] = diff;
              multi_extreme_counter[last] = 0;
            }
          }
        } else {  // multi == 0
          enc.encodeSymbol(m_gpstime_multi, 0);
          ic_gpstime.compress(enc, 0, diff, 7);
          multi_extreme_counter[last]++;
          if (multi_extreme_counter[last] > 3) {
            last_gpstime_diff[last] = diff;
            multi_extreme_counter[last] = 0;
          }
        }
      } else {
        for (U32 i = 1; i < 4; ++i) {
          I64 other64 =
              (I64)this_gpstime - (I64)last_gpstime[(last + i) & 3];
          if (other64 == (I64)(I32)other64) {
            enc.encodeSymbol(m_gpstime_multi,
                             (U32)(GPSTIME_MULTI_CODE_FULL + (I32)i));
            last = (last + i) & 3;
            write(enc, item);
            return;
          }
        }
        enc.encodeSymbol(m_gpstime_multi, GPSTIME_MULTI_CODE_FULL);
        ic_gpstime.compress(enc, (I32)(last_gpstime[last] >> 32),
                            (I32)(this_gpstime >> 32), 8);
        enc.writeInt((U32)this_gpstime);
        next = (next + 1) & 3;
        last = next;
        last_gpstime_diff[last] = 0;
        multi_extreme_counter[last] = 0;
      }
      last_gpstime[last] = this_gpstime;
    }
  }
};

// ---- RGB12 v2 (6 bytes: r, g, b u16) ----
struct Rgb12v2 : ItemCodec {
  SymbolModel m_byte_used, m_rgb_diff[6];
  U16 last_r = 0, last_g = 0, last_b = 0;

  U32 size() const override { return 6; }

  void init_item(const U8* first, bool encoder) override {
    m_byte_used.create(128, encoder);
    for (int i = 0; i < 6; ++i) m_rgb_diff[i].create(256, encoder);
    last_r = rd_u16(first + 0);
    last_g = rd_u16(first + 2);
    last_b = rd_u16(first + 4);
  }

  void read(Decoder& dec, U8* item) override {
    U8 corr;
    I32 diff = 0;
    U32 sym = dec.decodeSymbol(m_byte_used);
    U16 r, g, b;
    if (sym & 1) {
      corr = (U8)dec.decodeSymbol(m_rgb_diff[0]);
      r = (U16)u8_fold((I32)corr + (last_r & 0xFF));
    } else {
      r = last_r & 0xFF;
    }
    if (sym & 2) {
      corr = (U8)dec.decodeSymbol(m_rgb_diff[1]);
      r |= ((U16)u8_fold((I32)corr + (last_r >> 8))) << 8;
    } else {
      r |= last_r & 0xFF00;
    }
    if (sym & 64) {
      diff = (I32)(r & 0xFF) - (I32)(last_r & 0xFF);
      if (sym & 4) {
        corr = (U8)dec.decodeSymbol(m_rgb_diff[2]);
        g = (U16)u8_fold((I32)corr + u8_clamp(diff + (last_g & 0xFF)));
      } else {
        g = last_g & 0xFF;
      }
      if (sym & 16) {
        corr = (U8)dec.decodeSymbol(m_rgb_diff[4]);
        diff = (diff + (I32)(g & 0xFF) - (I32)(last_g & 0xFF)) / 2;
        b = (U16)u8_fold((I32)corr + u8_clamp(diff + (last_b & 0xFF)));
      } else {
        b = last_b & 0xFF;
      }
      diff = (I32)(r >> 8) - (I32)(last_r >> 8);
      if (sym & 8) {
        corr = (U8)dec.decodeSymbol(m_rgb_diff[3]);
        g |= ((U16)u8_fold((I32)corr + u8_clamp(diff + (last_g >> 8)))) << 8;
      } else {
        g |= last_g & 0xFF00;
      }
      if (sym & 32) {
        corr = (U8)dec.decodeSymbol(m_rgb_diff[5]);
        diff = (diff + (I32)(g >> 8) - (I32)(last_g >> 8)) / 2;
        b |= ((U16)u8_fold((I32)corr + u8_clamp(diff + (last_b >> 8)))) << 8;
      } else {
        b |= last_b & 0xFF00;
      }
    } else {
      g = r;
      b = r;
    }
    wr_u16(item + 0, r);
    wr_u16(item + 2, g);
    wr_u16(item + 4, b);
    last_r = r;
    last_g = g;
    last_b = b;
  }

  void write(Encoder& enc, const U8* item) override {
    U16 r = rd_u16(item + 0), g = rd_u16(item + 2), b = rd_u16(item + 4);
    U32 sym = 0;
    if ((r & 0xFF) != (last_r & 0xFF)) sym |= 1;
    if ((r & 0xFF00) != (last_r & 0xFF00)) sym |= 2;
    bool gb_differ = ((g & 0xFF) != (r & 0xFF)) || ((b & 0xFF) != (r & 0xFF)) ||
                     ((g & 0xFF00) != (r & 0xFF00)) ||
                     ((b & 0xFF00) != (r & 0xFF00));
    if (gb_differ) {
      sym |= 64;
      if ((g & 0xFF) != (last_g & 0xFF)) sym |= 4;
      if ((g & 0xFF00) != (last_g & 0xFF00)) sym |= 8;
      if ((b & 0xFF) != (last_b & 0xFF)) sym |= 16;
      if ((b & 0xFF00) != (last_b & 0xFF00)) sym |= 32;
    }
    enc.encodeSymbol(m_byte_used, sym);
    I32 diff = 0;
    if (sym & 1)
      enc.encodeSymbol(m_rgb_diff[0],
                       u8_fold((I32)(r & 0xFF) - (I32)(last_r & 0xFF)));
    if (sym & 2)
      enc.encodeSymbol(m_rgb_diff[1], u8_fold((I32)(r >> 8) - (I32)(last_r >> 8)));
    if (sym & 64) {
      diff = (I32)(r & 0xFF) - (I32)(last_r & 0xFF);
      if (sym & 4)
        enc.encodeSymbol(
            m_rgb_diff[2],
            u8_fold((I32)(g & 0xFF) - u8_clamp(diff + (last_g & 0xFF))));
      if (sym & 16) {
        diff = (diff + (I32)(g & 0xFF) - (I32)(last_g & 0xFF)) / 2;
        enc.encodeSymbol(
            m_rgb_diff[4],
            u8_fold((I32)(b & 0xFF) - u8_clamp(diff + (last_b & 0xFF))));
      }
      diff = (I32)(r >> 8) - (I32)(last_r >> 8);
      if (sym & 8)
        enc.encodeSymbol(m_rgb_diff[3],
                         u8_fold((I32)(g >> 8) - u8_clamp(diff + (last_g >> 8))));
      if (sym & 32) {
        diff = (diff + (I32)(g >> 8) - (I32)(last_g >> 8)) / 2;
        enc.encodeSymbol(m_rgb_diff[5],
                         u8_fold((I32)(b >> 8) - u8_clamp(diff + (last_b >> 8))));
      }
    }
    last_r = r;
    last_g = g;
    last_b = b;
  }
};

// ---- BYTE v2 (n extra bytes, one adaptive model per byte) ----
struct Bytev2 : ItemCodec {
  U32 n = 0;
  std::vector<SymbolModel> m_byte;
  std::vector<U8> last_item;

  explicit Bytev2(U32 n_) : n(n_) {}
  U32 size() const override { return n; }

  void init_item(const U8* first, bool encoder) override {
    m_byte.resize(n);
    for (U32 i = 0; i < n; ++i) m_byte[i].create(256, encoder);
    last_item.assign(first, first + n);
  }
  void read(Decoder& dec, U8* item) override {
    for (U32 i = 0; i < n; ++i) {
      item[i] = u8_fold((I32)dec.decodeSymbol(m_byte[i]) + (I32)last_item[i]);
      last_item[i] = item[i];
    }
  }
  void write(Encoder& enc, const U8* item) override {
    for (U32 i = 0; i < n; ++i) {
      enc.encodeSymbol(m_byte[i], u8_fold((I32)item[i] - (I32)last_item[i]));
      last_item[i] = item[i];
    }
  }
};

// ---------------------------------------------------------------------------
// Container: chunked pointwise streams + compressed chunk table
// ---------------------------------------------------------------------------

// Item types in the laszip VLR
static const I32 ITEM_BYTE = 0;
static const I32 ITEM_POINT10 = 6;
static const I32 ITEM_GPSTIME11 = 7;
static const I32 ITEM_RGB12 = 8;

static bool make_codecs(const I32* item_types, const I32* item_sizes,
                        I32 n_items, std::vector<ItemCodec*>& codecs) {
  for (I32 i = 0; i < n_items; ++i) {
    switch (item_types[i]) {
      case ITEM_POINT10:
        if (item_sizes[i] != 20) return false;
        codecs.push_back(new Point10v2());
        break;
      case ITEM_GPSTIME11:
        if (item_sizes[i] != 8) return false;
        codecs.push_back(new Gpstime11v2());
        break;
      case ITEM_RGB12:
        if (item_sizes[i] != 6) return false;
        codecs.push_back(new Rgb12v2());
        break;
      case ITEM_BYTE:
        if (item_sizes[i] < 1) return false;
        codecs.push_back(new Bytev2((U32)item_sizes[i]));
        break;
      default:
        return false;
    }
  }
  return true;
}

static void free_codecs(std::vector<ItemCodec*>& codecs) {
  for (auto* c : codecs) delete c;
  codecs.clear();
}

extern "C" {

// Decompress a pointwise-chunked LAZ point block.
//   file/file_len: the whole .laz file bytes
//   point_offset: offset of point data (the 8-byte chunk table pointer)
//   num_points, chunk_size (from the laszip VLR; chunk_size <= 0 -> one chunk)
//   item_types/item_sizes/n_items: laszip VLR item list
//   out: num_points * sum(item_sizes) bytes
// Returns number of points decoded, or a negative error code.
int64_t laz_decompress(const uint8_t* file, int64_t file_len,
                       int64_t point_offset, int64_t num_points,
                       int32_t chunk_size, const int32_t* item_types,
                       const int32_t* item_sizes, int32_t n_items,
                       uint8_t* out) {
  if (num_points <= 0) return 0;
  std::vector<ItemCodec*> codecs;
  if (!make_codecs(item_types, item_sizes, n_items, codecs)) {
    free_codecs(codecs);
    return -1;  // unsupported item list
  }
  I64 point_size = 0;
  for (auto* c : codecs) point_size += c->size();

  // chunk layout
  std::vector<I64> chunk_starts;  // absolute offsets of each chunk
  I64 first_chunk = point_offset + 8;
  I64 n_chunks;
  if (chunk_size <= 0) {
    n_chunks = 1;
    chunk_size = (I32)num_points;
    first_chunk = point_offset;  // unchunked: no table pointer
    chunk_starts.push_back(first_chunk);
  } else {
    n_chunks = (num_points + chunk_size - 1) / chunk_size;
    if (point_offset + 8 > file_len) {
      free_codecs(codecs);
      return -2;
    }
    I64 table_off = (I64)rd_u64(file + point_offset);
    if (table_off <= 0 || table_off + 8 > file_len) {
      free_codecs(codecs);
      return -3;  // missing/garbled chunk table
    }
    U32 version;
    std::memcpy(&version, file + table_off, 4);
    U32 number_chunks;
    std::memcpy(&number_chunks, file + table_off + 4, 4);
    if (version != 0 || (I64)number_chunks < n_chunks) {
      free_codecs(codecs);
      return -4;
    }
    Decoder tdec;
    tdec.init(file + table_off + 8, file + file_len);
    IntegerCompressor tic;
    tic.setup(32, 2);
    tic.init(false);
    I64 pos = first_chunk;
    I32 prev = 0;
    for (I64 i = 0; i < n_chunks; ++i) {
      chunk_starts.push_back(pos);
      I32 sz = tic.decompress(tdec, prev, 1);
      prev = sz;
      pos += sz;
    }
  }

  I64 done_points = 0;
  for (I64 ci = 0; ci < (I64)chunk_starts.size() && done_points < num_points;
       ++ci) {
    I64 pts_in_chunk = num_points - done_points;
    if (pts_in_chunk > chunk_size) pts_in_chunk = chunk_size;
    const U8* p = file + chunk_starts[ci];
    if (chunk_starts[ci] + point_size > file_len) {
      free_codecs(codecs);
      return -5;
    }
    // first point raw
    U8* dst = out + done_points * point_size;
    std::memcpy(dst, p, (size_t)point_size);
    U8* q = dst;
    for (auto* c : codecs) {
      c->init_item(q, false);
      q += c->size();
    }
    p += point_size;
    if (pts_in_chunk > 1) {
      Decoder dec;
      dec.init(p, file + file_len);
      for (I64 i = 1; i < pts_in_chunk; ++i) {
        U8* item = out + (done_points + i) * point_size;
        for (auto* c : codecs) {
          c->read(dec, item);
          item += c->size();
        }
      }
    }
    done_points += pts_in_chunk;
  }
  free_codecs(codecs);
  return done_points;
}

// Compress raw point records into a pointwise-chunked LAZ point block
// (chunk-table pointer + chunks + chunk table), written to out.
//   point_offset: where this block will start in the final file (the chunk
//     table pointer is an absolute file offset)
// Returns bytes written, -1 on unsupported items, -6 if out_cap too small.
int64_t laz_compress(const uint8_t* raw, int64_t num_points,
                     int64_t point_offset, int32_t chunk_size,
                     const int32_t* item_types, const int32_t* item_sizes,
                     int32_t n_items, uint8_t* out, int64_t out_cap) {
  std::vector<ItemCodec*> codecs;
  if (!make_codecs(item_types, item_sizes, n_items, codecs)) {
    free_codecs(codecs);
    return -1;
  }
  I64 point_size = 0;
  for (auto* c : codecs) point_size += c->size();
  if (chunk_size <= 0) chunk_size = 50000;

  std::vector<U8> buf;
  buf.reserve((size_t)(num_points * point_size / 2 + 4096));
  buf.resize(8);  // chunk table pointer placeholder

  std::vector<U32> chunk_bytes;
  I64 done_points = 0;
  while (done_points < num_points) {
    I64 pts_in_chunk = num_points - done_points;
    if (pts_in_chunk > chunk_size) pts_in_chunk = chunk_size;
    size_t chunk_start = buf.size();
    const U8* first = raw + done_points * point_size;
    buf.insert(buf.end(), first, first + point_size);
    const U8* q = first;
    for (auto* c : codecs) {
      c->init_item(q, true);
      q += c->size();
    }
    if (pts_in_chunk > 1) {
      Encoder enc;
      enc.init(&buf);
      for (I64 i = 1; i < pts_in_chunk; ++i) {
        const U8* item = raw + (done_points + i) * point_size;
        for (auto* c : codecs) {
          c->write(enc, item);
          item += c->size();
        }
      }
      enc.done();
    }
    chunk_bytes.push_back((U32)(buf.size() - chunk_start));
    done_points += pts_in_chunk;
  }
  free_codecs(codecs);

  // chunk table: absolute offset recorded in the 8-byte pointer
  U64 table_abs = (U64)(point_offset + (I64)buf.size());
  wr_u64(buf.data(), table_abs);
  U32 version = 0, number_chunks = (U32)chunk_bytes.size();
  size_t t = buf.size();
  buf.resize(t + 8);
  std::memcpy(buf.data() + t, &version, 4);
  std::memcpy(buf.data() + t + 4, &number_chunks, 4);
  {
    Encoder enc;
    enc.init(&buf);
    IntegerCompressor tic;
    tic.setup(32, 2);
    tic.init(true);
    I32 prev = 0;
    for (U32 sz : chunk_bytes) {
      tic.compress(enc, prev, (I32)sz, 1);
      prev = (I32)sz;
    }
    enc.done();
  }

  if ((I64)buf.size() > out_cap) return -6;
  std::memcpy(out, buf.data(), buf.size());
  return (I64)buf.size();
}

}  // extern "C"
