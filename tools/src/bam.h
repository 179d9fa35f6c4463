// BAM parsing/writing from the SAM spec §4, plus chimeric-event extraction.
// Replaces noodles bam + deepbiop::bam::chimeric (reference: src/bin/annotate.rs,
// extractsa.rs) and the pysam paths of chimeralm/data/bam.py.
#pragma once

#include <cstdint>
#include <memory>
#include <optional>
#include <string>
#include <vector>

#include "bgzf.h"

namespace chimera {

struct BamHeader {
  std::string text;
  std::vector<std::pair<std::string, int32_t>> refs;
  std::vector<uint8_t> ToBytes() const;
};

// One record's raw bytes (without the leading block_size int32).
struct BamRecord {
  std::vector<uint8_t> raw;

  int32_t ref_id() const;
  int32_t pos() const;
  uint8_t l_read_name() const;
  uint16_t flag() const;
  uint16_t n_cigar_op() const;
  int32_t l_seq() const;
  std::string name() const;
  std::string seq() const;  // decoded 4-bit nibbles
  // reference length consumed by CIGAR (M/D/N/=/X)
  int32_t ref_len() const;
  bool is_unmapped() const { return flag() & 0x4; }
  bool is_secondary() const { return flag() & 0x100; }
  bool is_supplementary() const { return flag() & 0x800; }
  // primary + mapped (is_retain_record) with an SA tag (is_chimeric_record)
  bool HasTag(const char tag[2]) const;
  std::optional<std::string> GetStringTag(const char tag[2]) const;

  size_t cigar_off() const { return 32 + l_read_name(); }
  size_t seq_off() const { return cigar_off() + 4 * n_cigar_op(); }
  size_t qual_off() const { return seq_off() + (l_seq() + 1) / 2; }
  size_t tag_off() const { return qual_off() + l_seq(); }
};

inline bool IsChimeric(const BamRecord& r) {
  const char sa[2] = {'S', 'A'};
  return !r.is_unmapped() && !r.is_secondary() && !r.is_supplementary() && r.HasTag(sa);
}

class BamReader {
 public:
  BamReader(const std::string& path, int threads = 4);
  const BamHeader& header() const { return header_; }
  // Returns false at EOF.
  bool Next(BamRecord* out);

 private:
  BgzfReader bgzf_;
  BamHeader header_;
};

class BamWriter {
 public:
  BamWriter(const std::string& path, const BamHeader& header, int threads = 4, int level = 6);
  void Write(const BamRecord& rec);
  void Close() { bgzf_.Close(); }

 private:
  BgzfWriter bgzf_;
};

// ---- chimeric events (deepbiop::bam::chimeric semantics) -------------------

struct GenomicInterval {
  std::string chr;
  int64_t start;  // 0-based
  int64_t end;    // exclusive
};

struct ChimericEvent {
  std::string name;
  std::vector<GenomicInterval> intervals;  // primary + each SA entry, sorted
};

// Reference length consumed by a SAM CIGAR string ("125S1219M..." etc).
int64_t CigarRefLen(const std::string& cigar);

// Build events for every chimeric read of a BAM: one interval for the primary
// alignment plus one per SA-tag entry; intervals sorted by (chr, start, end)
// (reference: annotate.rs:170-180).
std::vector<ChimericEvent> ChimericEventsFromBam(const std::string& path, int threads);

// Parse "chr1:100-200,chr2:5-7" (reference: compare.rs:41 parse_list_pos).
ChimericEvent ParseChimericEvent(const std::string& list, const std::string& name);

}  // namespace chimera
