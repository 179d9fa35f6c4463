// C API consumed by chimeralm_tpu.io.native via ctypes.
//
// The hot path is the streaming BAM -> token pipeline: BGZF blocks inflate on
// a worker pool, records are filtered to chimeric candidates
// (primary+mapped+SA, reference: chimeralm/data/bam.py:21-23), sequences are
// tokenized with the CharacterTokenizer contract (CLS=0 ... SEP=1, chars
// A,C,G,T,N -> 7..11, UNK=6, truncation to max_len-2) and packed into a flat
// int32 arena with per-read offsets plus the int8 [len, *ord] read-id sidecar
// (reference: chimeralm/data/tokenizer.py:108-113).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_set>

#include "bam.h"

using namespace chimera;

namespace {

struct TokenLut {
  int32_t lut[256];
  TokenLut() {
    for (int i = 0; i < 256; ++i) lut[i] = 6;  // UNK
    lut['A'] = 7;
    lut['C'] = 8;
    lut['G'] = 9;
    lut['T'] = 10;
    lut['N'] = 11;
  }
};
const TokenLut kLut;

struct TokenizerHandle {
  BamReader reader;
  int max_len;
  BamRecord pending;      // record read but not yet emitted (arena was full)
  bool has_pending = false;
  TokenizerHandle(const char* path, int max_len, int threads)
      : reader(path, threads), max_len(max_len) {}
};

}  // namespace

extern "C" {

void* cl_open_bam_tokenizer(const char* path, int max_len, int threads) {
  try {
    return new TokenizerHandle(path, max_len, threads);
  } catch (...) {
    return nullptr;
  }
}

void cl_close_bam_tokenizer(void* h) { delete static_cast<TokenizerHandle*>(h); }

// Fill up to max_reads tokenized reads.  offsets has max_reads+1 slots; read i
// occupies ids_arena[offsets[i]:offsets[i+1]].  sidecars is int8[max_reads*256].
// Returns reads filled (0 = EOF), -1 on error, -2 if cap_tokens too small for
// even one read.
long cl_next_tokenized_batch(void* hv, int max_reads, int32_t* ids_arena, long cap_tokens,
                             long* offsets, int8_t* sidecars) {
  auto* h = static_cast<TokenizerHandle*>(hv);
  try {
    long n = 0;
    long used = 0;
    offsets[0] = 0;
    BamRecord rec;
    while (n < max_reads) {
      if (h->has_pending) {
        rec = std::move(h->pending);
        h->has_pending = false;
      } else {
        if (!h->reader.Next(&rec)) break;
        if (!IsChimeric(rec)) continue;
      }
      int32_t lseq = rec.l_seq();
      int keep = lseq;
      if (h->max_len > 0 && keep > h->max_len - 2) keep = h->max_len - 2;
      long need = keep + 2;
      if (used + need > cap_tokens) {
        if (n == 0) return -2;
        h->pending = std::move(rec);   // emit on the next call
        h->has_pending = true;
        break;
      }
      // tokenize 4-bit nibbles straight to ids (no intermediate string)
      int32_t* out = ids_arena + used;
      out[0] = 0;  // CLS
      const uint8_t* p = rec.raw.data() + rec.seq_off();
      static const char* nib = "=ACMGRSVTWYHKDBN";
      for (int i = 0; i < keep; ++i) {
        uint8_t b = p[i / 2];
        char c = nib[(i % 2) ? (b & 0xF) : (b >> 4)];
        out[1 + i] = kLut.lut[static_cast<uint8_t>(c)];
      }
      out[keep + 1] = 1;  // SEP
      used += need;
      // sidecar
      std::string name = rec.name();
      int8_t* sc = sidecars + n * 256;
      std::memset(sc, 0, 256);
      size_t name_len = name.size();
      sc[0] = static_cast<int8_t>(name_len);  // int8 wrap matches reference
      size_t copy = std::min(name_len, static_cast<size_t>(255));
      for (size_t i = 0; i < copy; ++i) sc[1 + i] = static_cast<int8_t>(name[i]);
      ++n;
      offsets[n] = used;
    }
    return n;
  } catch (...) {
    return -1;
  }
}

// Rewrite a BAM dropping reads whose name is in drop_blob (NUL-separated).
// Returns kept count, -1 on error; *dropped_out receives the dropped count.
long cl_filter_bam(const char* in_path, const char* out_path, const char* drop_blob, long blob_len,
                   int threads, long* dropped_out) {
  try {
    std::unordered_set<std::string> drop;
    const char* p = drop_blob;
    const char* end = drop_blob + blob_len;
    while (p < end) {
      size_t l = strnlen(p, end - p);
      drop.emplace(p, l);
      p += l + 1;
    }
    BamReader reader(in_path, threads);
    BamWriter writer(out_path, reader.header(), threads);
    BamRecord rec;
    long kept = 0, dropped = 0;
    while (reader.Next(&rec)) {
      if (drop.count(rec.name())) {
        ++dropped;
        continue;
      }
      writer.Write(rec);
      ++kept;
    }
    writer.Close();
    if (dropped_out) *dropped_out = dropped;
    return kept;
  } catch (...) {
    return -1;
  }
}

// Extract chimeric reads (SA-tagged primaries) to a new BAM.
// Returns number written, -1 on error.
long cl_extract_sa(const char* in_path, const char* out_path, long max_reads, int threads) {
  try {
    BamReader reader(in_path, threads);
    BamWriter writer(out_path, reader.header(), threads);
    BamRecord rec;
    long n = 0;
    while (reader.Next(&rec)) {
      if (!IsChimeric(rec)) continue;
      if (max_reads > 0 && n >= max_reads) break;
      writer.Write(rec);
      ++n;
    }
    writer.Close();
    return n;
  } catch (...) {
    return -1;
  }
}

}  // extern "C"
